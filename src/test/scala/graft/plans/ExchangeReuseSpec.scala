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

  test("prefixFilterPairs verification broadcasts the set table ONCE") {
    // Both verification sides consume the SAME per-doc hashed-unit
    // relation; since round 15 they join it through two subquery
    // aliases over one broadcast frame, so the two BHJ builds must
    // canonicalize equal and exchange reuse must materialize a single
    // copy — the earlier two-projection shape broadcast twice, holding
    // ~2x the size estimate on the driver and every executor at the
    // 1.5 GB cap (round-14 advisor finding). AQE off so the reuse is
    // visible in the static plan.
    val conf = spark.conf
    val saved = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val texts = Seq(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "the quick brown fox jumps over the lazy cat",
        3L -> "the quick brown fox leaps over a lazy dog",
        4L -> "completely unrelated text about database systems",
        5L -> "the quick brown fox jumps over the lazy dog")
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(texts.map { case (i, t) => Row(i, t) }),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val pairs = Dedup.prefixFilterPairs(d, "text", "doc_id", minJaccard = 0.5)
      pairs.count() should be > 0L
      val plan = pairs.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
      def carriesHs(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]) =
        out.exists(_.name == "hs")
      val built = plan.collect {
        case b: BroadcastExchangeExec if carriesHs(b.output) => b }
      val reused = plan.collect {
        case r: ReusedExchangeExec if carriesHs(r.output) => r }
      withClue(plan.toString.take(3000)) {
        built.size shouldBe 1
        reused.size shouldBe 1
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
