package graft.streaming

import graft.SparkSpec
import graft.operators.Audit
import org.apache.spark.sql.functions.col

class StreamingKAnonymitySpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // classes: (a,x)x1, (a,y)x3, (b,x)x2, (b,NULL)x2 — NULL is a real class
  private def rows = Seq(
    (1L, Option("a"), Option("x")),
    (2L, Option("a"), Option("y")), (3L, Option("a"), Option("y")),
    (4L, Option("a"), Option("y")),
    (5L, Option("b"), Option("x")), (6L, Option("b"), Option("x")),
    (7L, Option("b"), Option.empty[String]),
    (8L, Option("b"), Option.empty[String])).toDF("id", "q1", "q2")

  private def classMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2))
      .toMap

  private def histMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("any batch split merges to the one-shot class-size table (incl. NULL classes)") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_skanon").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingKAnonymity.acceptBatch(
          rows.filter(col("id") % mod === b).drop("id"), Seq("q1", "q2"), st)
      val oneShot = rows.drop("id").groupBy(col("q1"), col("q2")).count()
        .select(col("q1"), col("q2"), col("count"))
      withClue(s"split mod $mod: ") {
        classMap(merged.select("q1", "q2", "n")) shouldBe classMap(oneShot)
      }
    }
  }

  test("the derived gate equals the batch kAnonymity card and degrades as data arrives") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_skanon2").toString + "/state"
    // batch 1: only the size-3 (a,y) class and one (b,x) row
    val b1 = rows.filter(col("id").isin(2L, 3L, 4L, 5L)).drop("id")
    val g1 = histMap(StreamingKAnonymity.kAnonymityView(
      StreamingKAnonymity.acceptBatch(b1, Seq("q1", "q2"), st), k = 2L))
    g1(1L)._3 shouldBe true // (b,x) size 1 violates
    g1(3L)._3 shouldBe false
    // batch 2 arrives: (a,x) mints a NEW sub-k class (the gate
    // degrades) while (b,x) grows out of violation
    val b2 = rows.filter(col("id").isin(1L, 6L, 7L, 8L)).drop("id")
    val merged = StreamingKAnonymity.acceptBatch(b2, Seq("q1", "q2"), st)
    val g2 = histMap(StreamingKAnonymity.kAnonymityView(merged, k = 2L))
    g2 shouldBe histMap(Audit.kAnonymity(rows.drop("id"), Seq("q1", "q2"), k = 2L))
    g2(1L) shouldBe ((1L, 1L, true)) // the fresh (a,x) singleton
    g2(2L)._3 shouldBe false // (b,x) and (b,NULL) now at k
  }

  test("failed-sink replay is idempotent; bookkeeping collisions are rejected") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_skanon3").toString + "/state"
    val b1 = rows.filter(col("id") <= 4L).drop("id")
    StreamingKAnonymity.acceptBatch(b1, Seq("q1", "q2"), st)
    // simulate a failed sink: mergeBatch ran but commit never did — the
    // retry (full acceptBatch) must count batch 2 exactly once
    val b2 = rows.filter(col("id") > 4L).drop("id")
    StreamingKAnonymity.mergeBatch(b2, Seq("q1", "q2"), st).count()
    val merged = StreamingKAnonymity.acceptBatch(b2, Seq("q1", "q2"), st)
    classMap(merged.select("q1", "q2", "n")) shouldBe
      classMap(rows.drop("id").groupBy(col("q1"), col("q2")).count())
    an[IllegalArgumentException] should be thrownBy
      StreamingKAnonymity.mergeBatch(rows.withColumnRenamed("q1", "n"),
        Seq("n", "q2"), st)
    an[IllegalArgumentException] should be thrownBy
      StreamingKAnonymity.mergeBatch(rows, Seq("q1", "Q1"), st)
  }
}
