package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class RelationalSpec extends SparkSpec {

  private def kv(rows: (String, String)*) = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }),
      StructType(Seq(StructField("k", StringType), StructField("v", StringType))))
  }

  test("upsertKeepFirst: existing row wins over re-observed key") {
    val current = kv("a" -> "old", "b" -> "old")
    val incoming = kv("b" -> "new", "c" -> "new")
    val out = Relational.upsertKeepFirst(current, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out shouldBe Map("a" -> "old", "b" -> "old", "c" -> "new")
  }

  test("upsertDelta emits only never-seen keys") {
    val current = kv("a" -> "x", "b" -> "x")
    val incoming = kv("b" -> "y", "c" -> "y")
    val out = Relational.upsertDelta(incoming, current, Seq("k"))
      .collect().map(_.getString(0))
    out shouldBe Array("c")
  }

  test("upsertDelta on empty current passes everything through") {
    val out = Relational.upsertDelta(kv("a" -> "1"), kv(), Seq("k")).count()
    out shouldBe 1
  }

  test("positionalZip aligns by rank not key") {
    val a = kv("a1" -> "1", "a2" -> "2")
    val b = kv("b9" -> "9", "b8" -> "8")
    val out = Relational.positionalZip(
        a.select(col("k").as("ka"), col("v").as("va")), Seq(col("va").asc),
        b.select(col("k").as("kb"), col("v").as("vb")), Seq(col("vb").asc))
      .orderBy("rn").collect()
    out.map(r => (r.getAs[String]("ka"), r.getAs[String]("kb"))) shouldBe
      Array(("a1", "b8"), ("a2", "b9"))
  }

  test("positionalZip rejects frames over the maxRows bound") {
    import spark.implicits._
    val big = spark.range(21).select(col("id").cast("string").as("va"))
    val small = kv("b9" -> "9").select(col("v").as("vb"))
    val e = intercept[IllegalArgumentException] {
      Relational.positionalZip(big, Seq(col("va").asc),
        small, Seq(col("vb").asc), maxRows = 20)
    }
    e.getMessage should include("maxRows")
    // at or under the bound it still works
    Relational.positionalZip(big, Seq(col("va").asc),
      small, Seq(col("vb").asc), maxRows = 21).count() shouldBe 1
  }

  test("sentinelFill replaces null and empty only") {
    val d = kv("a" -> "", "b" -> "x").unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row("c", null))),
        StructType(Seq(StructField("k", StringType), StructField("v", StringType)))))
    val out = d.select(col("k"), Relational.sentinelFill(col("v"), "NA").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out shouldBe Map("a" -> "NA", "b" -> "x", "c" -> "NA")
  }

  test("cdcCompact keeps the last op per key and drops tombstoned keys") {
    import spark.implicits._
    val log = Seq(
      // key 1: upsert v=1, then upsert v=2 (same ts, higher seq wins)
      (1L, 10L, 1L, "up", 1.0), (1L, 10L, 2L, "up", 2.0),
      // key 2: upsert then delete -> absent
      (2L, 10L, 3L, "up", 5.0), (2L, 20L, 4L, "del", 0.0),
      // key 3: delete then upsert (delete is NOT last) -> present
      (3L, 10L, 5L, "del", 0.0), (3L, 20L, 6L, "up", 7.0))
      .toDF("k", "ts", "seq", "op", "v")
    val out = Relational.cdcCompact(log, "k",
        Seq(col("ts"), col("seq")), col("op") === "del")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    out shouldBe Map(1L -> ((2L, 2.0)), 3L -> ((6L, 7.0)))
  }
}
