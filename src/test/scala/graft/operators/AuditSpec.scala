package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("latenessAudit buckets disorder against the running arrival max") {
    // arrival: ts seconds [100, 50, 200, 190, 210, 0]
    //  a1 t100 first          -> on_time
    //  a2 t50  prior 100 -> 50s  -> le_60s
    //  a3 t200 prior 100 -> 0   -> on_time
    //  a4 t190 prior 200 -> 10s -> le_60s
    //  a5 t210 prior 200 -> 0   -> on_time
    //  a6 t0   prior 210 -> 210s-> le_900s
    val ev = Seq((1L, 100L), (2L, 50L), (3L, 200L), (4L, 190L),
      (5L, 210L), (6L, 0L))
      .toDF("arrival", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    // bucketWidth=2 forces the cross-bucket prefix path (ids span 4
    // buckets); results must not depend on the bucketing
    for (bw <- Seq(2L, 65536L)) {
      val out = Audit.latenessAudit(ev, "ts", "arrival",
          boundsSeconds = Seq(60L, 900L), bucketWidth = bw)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      withClue(s"bucketWidth=$bw: ") {
        out shouldBe Map("on_time" -> 3L, "le_60s" -> 2L, "le_900s" -> 1L)
      }
    }
  }

  test("latenessAudit plans bucket-partitioned windows only") {
    val ev = Seq((1L, 10L)).toDF("arrival", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val plan = Audit.latenessAudit(ev, "ts", "arrival")
      .queryExecution.executedPlan.toString
    plan should not include "SinglePartition"
    an[IllegalArgumentException] should be thrownBy
      Audit.latenessAudit(ev, "ts", "arrival", boundsSeconds = Seq(900L, 60L))
  }

  test("cohenKappa matches the hand-computed 2x2 value; constant raters -> 0") {
    // g: a=3 b=1 c=1 d=5, n=10 -> num = 10*8 - (4*4 + 6*6) = 28,
    // den = 100 - 52 = 48, kappa = 28/48
    val g = Seq.fill(3)(("g", 1L, 1L)) ++ Seq(("g", 1L, 0L), ("g", 0L, 1L)) ++
      Seq.fill(5)(("g", 0L, 0L))
    // h: both raters constant -> pe = 1 -> den = 0 -> kappa 0 by contract
    val h = Seq.fill(2)(("h", 1L, 1L))
    val out = Audit.cohenKappa((g ++ h).toDF("src", "ra", "rb"), "src", "ra", "rb")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    out("g") shouldBe ((10L, 3L, 5L, 28.0 / 48.0))
    out("h") shouldBe ((2L, 2L, 0L, 0.0))
  }

  test("kAnonymity: class-size histogram with violation flags") {
    // classes: (a,x)x1, (a,y)x3, (b,x)x3, (b,y)x5 -> sizes 1,3,3,5
    val rows = Seq(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq.fill(3)(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    val out = Audit.kAnonymity(rows.toDF("q1", "q2"), Seq("q1", "q2"), k = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    out(1L) shouldBe ((1L, 1L, true))
    out(3L) shouldBe ((2L, 6L, false))
    out(5L) shouldBe ((1L, 5L, false))
    out.size shouldBe 3
  }

  test("lDiversity flags big-but-homogeneous classes") {
    // class (a): 4 rows, all sensitive 's1' -> diversity 1 (violates)
    // class (b): 3 rows, sensitive {s1,s2,s3} -> diversity 3 (ok)
    val rows = Seq.fill(4)(("a", "s1")) ++
      Seq(("b", "s1"), ("b", "s2"), ("b", "s3"))
    val out = Audit.lDiversity(rows.toDF("q", "sv"), Seq("q"), "sv", l = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    out((4L, 1L)) shouldBe ((1L, true))
    out((3L, 3L)) shouldBe ((1L, false))
    out.size shouldBe 2
  }

  test("lDiversity counts NULL as one distinct sensitive value (tCloseness-aligned)") {
    // class (a): all-NULL sensitive -> diversity 1 (homogeneous, NOT 0)
    // class (b): {s1, NULL} -> diversity 2: NULL is one observable value
    val rows = Seq(
      ("a", Option.empty[String]), ("a", Option.empty[String]),
      ("b", Option("s1")), ("b", Option.empty[String]))
    val out = Audit.lDiversity(rows.toDF("q", "sv"), Seq("q"), "sv", l = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    out((2L, 1L)) shouldBe true  // class a: size 2, diversity 1, violates
    out((2L, 2L)) shouldBe false // class b: size 2, diversity 2, ok
    out.size shouldBe 2
  }

  test("privacy trio rejects sensitiveCol inside quasiCols with a clear require") {
    val df = Seq(("a", "s1")).toDF("q", "sv")
    an[IllegalArgumentException] should be thrownBy
      Audit.lDiversity(df, Seq("q", "sv"), "sv", l = 2L)
    an[IllegalArgumentException] should be thrownBy
      Audit.tCloseness(df, Seq("q", "sv"), "sv", maxTv = 0.2)
  }

  test("tCloseness: matching distribution 0, all-mass-on-one-value skew flagged") {
    // global: s1 6/8, s2 2/8. a = {s1:2, s2:2}, b = {s1:4}:
    // p_a = (.5, .5) -> tv_a = .5*(|.5-.75|+|.5-.25|) = .25 (flagged)
    // p_b = (1, 0)   -> tv_b = .5*(|1-.75|+|0-.25|)  = .25 (flagged)
    val rows = Seq(("a", "s1"), ("a", "s1"), ("a", "s2"), ("a", "s2"),
      ("b", "s1"), ("b", "s1"), ("b", "s1"), ("b", "s1"))
    val out = Audit.tCloseness(rows.toDF("q", "sv"), Seq("q"), "sv",
        maxTv = 0.2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    out("a") shouldBe ((4L, 0.25, true))
    out("b") shouldBe ((4L, 0.25, true))
    // and a genuinely matching class is 0 and unflagged
    val uniform = Seq(("a", "s1"), ("a", "s2"), ("b", "s1"), ("b", "s2"))
    val out2 = Audit.tCloseness(uniform.toDF("q", "sv"), Seq("q"), "sv",
        maxTv = 0.2)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    out2("a") shouldBe ((0.0, false))
    out2("b") shouldBe ((0.0, false))
  }

  test("tCloseness treats NULL quasi and sensitive values as real keys") {
    // NULL-region class matches the global distribution exactly: its
    // counts must re-attach (null-safe join), so tv = 0, unflagged;
    // NULL sensitive values are a real distribution point in both
    val rows = Seq(
      (Option("a"), Option("s1")), (Option("a"), Option.empty[String]),
      (Option.empty[String], Option("s1")),
      (Option.empty[String], Option.empty[String]))
    val out = Audit.tCloseness(rows.toDF("q", "sv"), Seq("q"), "sv",
        maxTv = 0.2)
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    out(Some("a")) shouldBe ((0.0, false))
    out(None) shouldBe ((0.0, false))
  }

  test("fdStrength reports majority, g3 violations, and deterministic ties") {
    val df = Seq(
      ("s1", "a"), ("s1", "a"), ("s1", "a"), ("s1", "b"), // 3:1 -> a
      ("s2", "b"), ("s2", "b"), ("s2", "a"), ("s2", "a"), // tie -> a
      ("s3", "c")) // exact FD
      .toDF("src", "lang")
    val out = Audit.fdStrength(df, Seq("src"), "lang")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
      .toMap
    out("s1") shouldBe ((4L, 2L, "a", 3L, 1L, 7500L))
    out("s2") shouldBe ((4L, 2L, "a", 2L, 2L, 5000L))
    out("s3") shouldBe ((1L, 1L, "c", 1L, 0L, 10000L))
  }

  test("fdStrength drops NULLs and rejects bad column configs") {
    val df = Seq((Some("s1"), Some("a")), (Some("s1"), None),
      (None, Some("b"))).toDF("src", "lang")
    val r = Audit.fdStrength(df, Seq("src"), "lang").collect()
    r.length shouldBe 1
    r.head.getLong(1) shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      Audit.fdStrength(df, Seq("lang"), "lang")
    an[IllegalArgumentException] should be thrownBy
      Audit.fdStrength(df.withColumnRenamed("src", "n_rows"),
        Seq("n_rows"), "lang")
  }

  test("pChart flags the days outside hand-computed Shewhart limits") {
    // three 100-row days with k = 0 / 100 / 50 -> p-bar = 0.5,
    // sigma(n=100) = 0.05, limits 0.35 / 0.65 in micro-units
    val rows = (1 to 100).map(i => (1L, 0L)) ++
      (1 to 100).map(i => (2L, 1L)) ++
      (1 to 100).map(i => (3L, if (i <= 50) 1L else 0L))
    val out = Audit.pChart(rows.toDF("day", "bad"), "day", "bad")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    out(1L) shouldBe ((100L, 0L, 0L, 650000L, 350000L, true))
    out(2L) shouldBe ((100L, 100L, 1000000L, 650000L, 350000L, true))
    out(3L) shouldBe ((100L, 50L, 500000L, 650000L, 350000L, false))
  }

  test("pChart widens limits on thin days and clamps the LCL at zero") {
    // same p-bar = 0.5; a 4-row day has sigma = 0.25 -> raw limits
    // -0.25 / 1.25: LCL clamps to 0, UCL passes 10^6 (nothing can
    // trip on a day this thin)
    val rows = (1 to 48).map(i => (1L, if (i <= 24) 1L else 0L)) ++
      Seq((2L, 1L), (2L, 1L), (2L, 0L), (2L, 0L))
    val out = Audit.pChart(rows.toDF("day", "bad"), "day", "bad")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    out(2L)._1 shouldBe 1250000L
    out(2L)._2 shouldBe 0L
    out(2L)._3 shouldBe false
  }
}
