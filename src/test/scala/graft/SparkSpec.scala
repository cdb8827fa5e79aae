package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM-wide session —
  * creation costs ~5s, so suites must not stop() it).
  */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session

  /** Shared ScalaCheck harness (seeded, 10 cases) — one policy for
    * every property spec instead of per-file copies that can drift.
    */
  protected lazy val scParams: org.scalacheck.Test.Parameters =
    org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(10)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))

  protected def check(prop: org.scalacheck.Prop): Unit = {
    val r = org.scalacheck.Test.check(scParams, prop)
    withClue(s"scalacheck: $r\n") { r.passed shouldBe true }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable artifacts (BucketingSpec) out of the repo dir
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
