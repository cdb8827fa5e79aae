package graft.operators

import graft.SparkSpec

class AuditSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("fkOrphans separates null keys from dangling keys") {
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)), // valid
      (3L, Some(99L)),                  // orphan: no parent 99
      (4L, None), (5L, None))           // null FK — NOT orphans
      .toDF("id", "fk")
    val parent = Seq((10L, "x"), (11L, "y")).toDF("pk", "name")
    val out = Audit.fkOrphans(Seq(("child.fk", child, "fk", parent, "pk")))
      .collect()
    out.length shouldBe 1
    val r = out(0)
    r.getString(0) shouldBe "child.fk"
    r.getLong(1) shouldBe 5L // n_child
    r.getLong(2) shouldBe 2L // n_null_keys
    r.getLong(3) shouldBe 1L // n_orphans (only key 99)
  }

  test("duplicate parent keys do not inflate orphan counts") {
    val child = Seq((1L, 7L), (2L, 8L)).toDF("id", "fk")
    val parent = Seq((7L, "a"), (7L, "b")).toDF("pk", "v") // dup parent key
    val r = Audit.fkOrphans(Seq(("c", child, "fk", parent, "pk"))).collect()(0)
    r.getLong(1) shouldBe 2L
    r.getLong(3) shouldBe 1L // only fk=8 dangles; the dup 7 counts once
  }
}
