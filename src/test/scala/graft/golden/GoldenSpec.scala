package graft.golden

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Golden tests replay the reference's checked-in snapshot chains
  * (reference data/twitch_project_*_layer, read-only) through our
  * transforms and require exact row-set equality with the reference's
  * own outputs.
  */
trait GoldenSpec extends SparkSpec {
  val refData = "/root/reference/data"

  /** Exact multiset equality on the common columns, order-free. */
  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    val cols = expected.columns.sorted.toSeq
    val a = actual.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val e = expected.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val extra = a.exceptAll(e).count()
    val missing = e.exceptAll(a).count()
    withClue(s"extra=$extra missing=$missing of ${e.count()} rows: ") {
      (extra, missing) shouldBe ((0L, 0L))
    }
  }
}
