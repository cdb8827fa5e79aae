package graft.operators

import graft.SparkSpec

/** Hand-computed transition counts for the Markov operator. */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  // g1 ordered: a b a b  → (a,b) (b,a) (a,b)
  // g2 ordered: a a c    → (a,a) (a,c)
  // from a: (a,b)=2 (a,a)=1 (a,c)=1 of 4 → 5000/2500/2500 bp
  // from b: (b,a)=1 of 1 → 10000 bp
  test("transitions counts consecutive pairs within groups only") {
    val df = Seq(("g1", 1L, "a"), ("g1", 2L, "b"), ("g1", 3L, "a"),
      ("g1", 4L, "b"), ("g2", 1L, "a"), ("g2", 2L, "a"), ("g2", 3L, "c"))
      .toDF("g", "ord", "t")
    val r = Markov.transitions(df, Seq("g"), Seq("ord"), "t")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect().toSeq
    r shouldBe Seq(("a", "a", 1L, 2500L), ("a", "b", 2L, 5000L),
      ("a", "c", 1L, 2500L), ("b", "a", 1L, 10000L))
  }

  test("transitions never cross a group boundary and drop null types") {
    val df = Seq(("g1", 1L, "x"), ("g2", 2L, "y"))
      .toDF("g", "ord", "t")
    Markov.transitions(df, Seq("g"), Seq("ord"), "t").count() shouldBe 0L
    val withNull = Seq(("g", 1L, "x"), ("g", 2L, null), ("g", 3L, "y"))
      .toDF("g", "ord", "t")
    // null type rows are filtered BEFORE pairing: x pairs with y
    val r = Markov.transitions(withNull, Seq("g"), Seq("ord"), "t")
      .as[(String, String, Long, Long)].collect().toSeq
    r shouldBe Seq(("x", "y", 1L, 10000L))
  }

  test("prob_bp sums to ~10000 per from-type (floor-division deficit only)") {
    val df = Seq.tabulate(30)(i => ("g", i.toLong, s"t${i % 3}"))
      .toDF("g", "ord", "t")
    val sums = Markov.transitions(df, Seq("g"), Seq("ord"), "t")
      .groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("prob_bp").as("s"))
      .as[(String, Long)].collect()
    all(sums.map(_._2)) should (be <= 10000L and be > 9990L)
  }
}
