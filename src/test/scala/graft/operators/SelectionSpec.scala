package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SelectionSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("greedy picks maximize marginal coverage with (gain desc, id) ties") {
    // 1-shingles for hand-computation. Distinct token sets:
    //   d1 {a b c d}   (4)
    //   d2 {c d e}     (3, overlaps d1 by 2)
    //   d3 {x y z}     (3, disjoint)
    //   d4 {a b}       (2, subset of d1)
    // round 1: d1 (gain 4); round 2: d3 (gain 3 beats d2's 1);
    // round 3: d2 (gain 1, e); d4 would gain 0
    val d = Seq((1L, "a b c d"), (2L, "c d e"), (3L, "x y z"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Selection.greedyCoverage(d, "text", "doc_id", k = 4,
        shingleN = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe ((1L, 4L, 4L))
    out(2L) shouldBe ((3L, 3L, 7L))
    out(3L) shouldBe ((2L, 1L, 8L))
    out.size shouldBe 3 // round 4 stops early: best remaining gain is 0
  }

  test("equal gains break to the smaller doc id") {
    val d = Seq((7L, "p q"), (5L, "r s")).toDF("doc_id", "text")
    val out = Selection.greedyCoverage(d, "text", "doc_id", k = 2,
        shingleN = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 5L // both gain 2 -> min id first
    out(2L) shouldBe 7L
  }

  test("mmr trades relevance against redundancy with hand-computed rounds") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1.0f, 0.0f)), // query
        Row(1L, Seq(1.0f, 0.0f)), // rel 1.0
        Row(2L, Seq(0.6f, 0.8f)), // rel 0.6, cos to v1 = 0.6
        Row(3L, Seq(0.0f, 1.0f))), 2), // rel 0, cos to v2 = 0.8
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = Selection.mmr(emb.filter(col("vec_id") =!= 0),
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 3, lambda = 0.7)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // r1: v1 (rel 1.0); r2: v2 scores 0.7·0.6−0.3·0.6 = 0.24 beats
    // v3's 0; r3: v3 with max_sim = cos(v2,v3) = 0.8, score −0.24
    out(1L) shouldBe ((1L, 1.0, 0.0, 0.7))
    out(2L) shouldBe ((2L, 0.6, 0.6, 0.24))
    out(3L) shouldBe ((3L, 0.0, 0.8, -0.24))
  }

  test("mmr with lambda 1 reduces to pure relevance ranking") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1.0f, 0.0f)), Row(1L, Seq(0.9f, 0.1f)),
        Row(2L, Seq(0.9f, 0.11f)), Row(3L, Seq(0.0f, 1.0f))), 2),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val picks = Selection.mmr(emb.filter(col("vec_id") =!= 0),
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 3, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    picks shouldBe Seq(1L, 2L, 3L) // cos desc order, redundancy ignored
    // a corpus smaller than k stops early with |corpus| rows
    val short = Selection.mmr(emb.filter(col("vec_id").isin(1L, 2L)),
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5)
    short.count() shouldBe 2L
  }
}
