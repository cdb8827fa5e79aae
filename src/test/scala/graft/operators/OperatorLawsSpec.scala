package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck laws for the operators whose contracts are algebraic —
  * random inputs, invariant assertions, seeded for reproducibility.
  * Ten cases per law keeps the Spark-job cost bounded while still
  * sweeping sizes and shapes no hand-written example covers.
  */
class OperatorLawsSpec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(10)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    withClue(s"scalacheck: $r\n") { r.passed shouldBe true }
  }

  test("sessionize partitions events: gaps within <= gap, sum of sessions = n") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      secs <- Gen.listOfN(n, Gen.choose(0L, 20000L))
    } yield secs
    check(Prop.forAll(gen) { secs =>
      val ev = secs.zipWithIndex.map { case (s, i) => (1L, i.toLong, s) }
        .toDF("user_id", "event_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val out = Sessionize.sessions(ev, "user_id", "ts", gapSeconds = 900)
        .collect().map(r => (r.getTimestamp(2).getTime / 1000,
          r.getTimestamp(3).getTime / 1000, r.getLong(4)))
      val sorted = secs.sorted
      // events are partitioned: session sizes sum to n
      val partitioned = out.map(_._3).sum == secs.length
      // session boundaries: consecutive sessions separated by > gap
      val bounds = out.sortBy(_._1)
      val separated = bounds.zip(bounds.drop(1)).forall {
        case ((_, e1, _), (s2, _, _)) => s2 - e1 > 900
      }
      // every session's span is covered by events with gaps <= gap
      val dense = bounds.forall { case (s, e, _) =>
        val inSess = sorted.filter(t => t >= s && t <= e)
        inSess.zip(inSess.drop(1)).forall { case (a, b) => b - a <= 900 }
      }
      partitioned && separated && dense
    })
  }

  test("dedupParagraphs: output paragraphs are globally distinct and kept counts add up") {
    val implicits = spark.implicits; import implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val para = Gen.listOfN(2, word).map(_.mkString(" "))
    val doc = Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, para).map(_.mkString("\n")))
    val gen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.dedupParagraphs(docs, "text", "doc_id", sep = "\n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val outParas = out.flatMap(_._2.split("\n"))
      val inDistinct = texts.flatMap(_.split("\n")).filter(_.trim.nonEmpty).distinct
      // every distinct input paragraph survives exactly once, globally
      outParas.sorted.toSeq == inDistinct.sorted &&
        // and per-doc counts match the reassembled text
        out.forall { case (_, t, k) => t.split("\n").length.toLong == k }
    })
  }

  test("shuffleRank is a contiguous permutation for arbitrary sizes and widths") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 400)
      p <- Gen.choose(1, 4)
    } yield (n, p)
    check(Prop.forAll(gen) { case (n, p) =>
      val df = (0L until n.toLong).map(i => (i, i)).toDF("id", "v")
      val ranks = Sampling.shuffleRank(df, "id", hexPrefix = p)
        .select("shuffle_rank").collect().map(_.getLong(0)).sorted
      ranks.toSeq == (0L until n.toLong)
    })
  }
}
