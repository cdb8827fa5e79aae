package graft.plans

import graft.SparkSpec
import graft.operators.Dedup

/** simhashPairs' band self-join must COMPUTE THE SIGNATURES ONCE: the
  * native signature expression removed the aggregate boundary from the
  * subtree, so sharing now rests on (a) the explicit repartition on the
  * band key producing two canonically-identical Exchanges, and (b) the
  * source canonicalizing equal across the two branches. Both have
  * regressed silently before — (b) when ReplayScanBuilder was a plain
  * class and two identical scans never compared equal, disabling ALL
  * exchange/stage reuse above the replay source. This spec pins both,
  * with AQE off so reuse is visible in the static plan (with AQE the
  * same sharing happens at runtime via the shuffle-stage cache, or the
  * small side is broadcast, which recomputes a corpus cheap enough to
  * broadcast).
  */
class ExchangeReuseSpec extends SparkSpec {

  test("simhash pair self-join reuses one shuffle over a replay scan") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val docs = spark.read.format("graft.sources.ReplaySource")
        .option("rows", 2000L).option("partitions", 4).option("seed", 7).load()
        .selectExpr("event_id AS doc_id",
          "concat_ws(' ', event_type, props, cast(user_id % 50 AS STRING)) AS text")
      val pairs = Dedup.simhashPairs(docs, "text", "doc_id", 3)
      pairs.count() should be > 0L
      val p = pairs.queryExecution.executedPlan.toString
      withClue(p.take(2000)) {
        p should include("ReusedExchange")
        // exactly one signature-computing projection in the whole plan
        "simhash64_sig".r.findAllIn(
          p.linesIterator.filter(_.contains("Project")).mkString("\n"))
          .size should be <= 2 // one Project + possibly its argument echo
      }
    } finally conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("two loads of the same replay options canonicalize equal") {
    def load() = spark.read.format("graft.sources.ReplaySource")
      .option("rows", 100L).option("partitions", 2).option("seed", 3).load()
    val a = load().queryExecution.executedPlan
    val b = load().queryExecution.executedPlan
    a.sameResult(b) shouldBe true
  }
}
