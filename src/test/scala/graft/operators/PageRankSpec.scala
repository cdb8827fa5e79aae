package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PageRankSpec extends SparkSpec {

  private def pairs(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("a regular graph is the integer fixpoint: every rank stays at unit") {
    // triangle: deg 2 everywhere; one round maps 1e6 ->
    // 150000 + 2*floor(1e6*85/200) = 1000000 exactly
    val out = collectRanks(PageRank.ranks(pairs(1L -> 2L, 2L -> 3L, 1L -> 3L)))
    out.keySet shouldBe Set(1L, 2L, 3L)
    for ((_, (deg, rank)) <- out) { deg shouldBe 2L; rank shouldBe 1000000L }
  }

  test("star center outranks leaves and collects their full damped mass") {
    val out = collectRanks(PageRank.ranks(pairs(1L -> 2L, 1L -> 3L, 1L -> 4L)))
    out(1L)._1 shouldBe 3L
    val leafRanks = Seq(2L, 3L, 4L).map(out(_)._2).distinct
    leafRanks should have size 1 // symmetry
    out(1L)._2 should be > leafRanks.head
    // closed form, replayed: r0 = 1e6 for all.
    var (c, l) = (1000000L, 1000000L)
    for (_ <- 1 to 5) {
      val nc = 150000L + 3L * (l * 85L / 100L)      // leaves have deg 1
      val nl = 150000L + (c * 85L / 100L) / 3L      // center deg 3, floor
      c = nc; l = nl
    }
    out(1L)._2 shouldBe c
    leafRanks.head shouldBe l
  }

  test("ranks are partitioning-independent") {
    val p = pairs(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 2L -> 5L)
    collectRanks(PageRank.ranks(p.repartition(7))) shouldBe
      collectRanks(PageRank.ranks(p.coalesce(1)))
  }

  test("total integer mass never exceeds the initial endowment") {
    val p = pairs(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 1L -> 3L)
    val out = collectRanks(PageRank.ranks(p))
    // floor-division distribution can only lose mass vs base + damp*unit
    out.values.map(_._2).sum should be <= out.size * 1000000L
  }

  private def wpairs(rows: (Long, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b, w) => Row(a, b, w) }),
      StructType(Seq(StructField("id_a", LongType),
        StructField("id_b", LongType), StructField("w", LongType))))

  test("weightedRanks with uniform weights equals unweighted ranks") {
    // w=1 everywhere: strength = deg, so the per-edge contribution
    // rank*85*1 div (100*strength) is the unweighted formula exactly
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 5L, 1L -> 4L)
    val unw = collectRanks(PageRank.ranks(pairs(es: _*), iterations = 3))
    val w = collectRanks(PageRank.weightedRanks(
      wpairs(es.map { case (a, b) => (a, b, 1L) }: _*), iterations = 3))
    w.view.mapValues(_._2).toMap shouldBe unw.view.mapValues(_._2).toMap
  }

  test("weight skew routes mass along the heavy edge") {
    // path 1-2-3 where edge 2-3 carries 9x the weight of 1-2: node 3
    // must end with more mass than node 1 (symmetric under w=1)
    val out = collectRanks(PageRank.weightedRanks(
      wpairs((1L, 2L, 1L), (2L, 3L, 9L)), iterations = 3))
    out(3L)._2 should be > out(1L)._2
  }

  private def seedDf(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.toDF("doc_id") // any column name: personalizedRanks takes head
  }

  private def collectPpr(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap

  test("personalizedRanks hand-computed path: mass stays near the seed") {
    // path 1-2-3, seed {1}, two rounds:
    //   r1: 1 -> 150000, 2 -> floor(1e6*85/100) = 850000, 3 -> 0
    //   r2: 1 -> 150000 + floor(850000*85/200) = 511250,
    //       2 -> floor(150000*85/100) = 127500, 3 -> 361250
    val out = collectPpr(PageRank.personalizedRanks(
      pairs(1L -> 2L, 2L -> 3L), seedDf(1L), iterations = 2))
    out(1L) shouldBe ((1L, true, 511250L))
    out(2L) shouldBe ((2L, false, 127500L))
    out(3L) shouldBe ((1L, false, 361250L))
  }

  test("personalizedRanks: no seeds in graph means zero mass everywhere") {
    val out = collectPpr(PageRank.personalizedRanks(
      pairs(1L -> 2L, 2L -> 3L), seedDf(99L), iterations = 3))
    out.values.map(_._3).toSet shouldBe Set(0L)
    out.values.map(_._2).toSet shouldBe Set(false)
  }

  test("personalizedRanks with ALL nodes seeded equals global ranks") {
    // restart mass to every node = the ordinary damped walk
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 5L, 1L -> 4L)
    val global = collectRanks(PageRank.ranks(pairs(es: _*), iterations = 3))
    val ppr = collectPpr(PageRank.personalizedRanks(
      pairs(es: _*), seedDf(1L, 2L, 3L, 4L, 5L), iterations = 3))
    ppr.view.mapValues(v => (v._1, v._3)).toMap shouldBe global
  }
}
