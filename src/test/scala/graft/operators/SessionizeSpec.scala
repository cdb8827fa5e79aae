package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, u, t) =>
        Row(id, u, Timestamp.valueOf(t)) }),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))

  test("gap larger than threshold starts a new session per key") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:30:00"), // session 1
      (3L, 1L, "2024-01-01 12:00:01"), // gap > 1h -> session 2
      (4L, 2L, "2024-01-01 10:00:00")) // other key -> own session 1
    val out = Sessionize.withSessionIds(d, "user_id", "ts", 3600)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L)
  }

  test("session summaries carry bounds, counts, duration") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:10:00"),
      (3L, 1L, "2024-01-01 13:00:00"))
    val out = Sessionize.sessions(d, "user_id", "ts", 3600)
      .orderBy("session_id").collect()
    out should have length 2
    out(0).getAs[Long]("n_events") shouldBe 2
    out(0).getAs[Long]("duration_s") shouldBe 600
    out(1).getAs[Long]("n_events") shouldBe 1
    out(1).getAs[Long]("duration_s") shouldBe 0
  }

  private def evT(rows: (Long, Long, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, u, t, a) =>
        Row(id, u, Timestamp.valueOf(t), a) }),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_type", StringType))))

  test("behaviorTrigrams never crosses a session boundary and ties break on event_id") {
    val d = evT(
      // session 1 of user 1: view,view,click,buy -> 2 trigrams
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:01:00", "view"),
      // tie ts: event_id orders click before buy
      (3L, 1L, "2024-01-01 10:02:00", "click"),
      (4L, 1L, "2024-01-01 10:02:00", "buy"),
      // session 2 (gap > 1h): would chain into the above if boundaries leaked
      (5L, 1L, "2024-01-01 13:00:00", "view"),
      (6L, 1L, "2024-01-01 13:01:00", "view"))
    val out = Sessionize.behaviorTrigrams(d, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 3600, k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("view>view>click" -> 1L, "view>click>buy" -> 1L)
  }

  test("behaviorTrigrams top-k head is deterministic under count ties") {
    val d = evT(
      (1L, 1L, "2024-01-01 10:00:00", "a"), (2L, 1L, "2024-01-01 10:01:00", "b"),
      (3L, 1L, "2024-01-01 10:02:00", "c"), (4L, 1L, "2024-01-01 10:03:00", "d"))
    // trigrams a>b>c and b>c>d, both count 1 — k=1 must pick the
    // lexicographically smaller one
    val out = Sessionize.behaviorTrigrams(d, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 3600, k = 1).collect()
    out should have length 1
    out(0).getString(0) shouldBe "a>b>c"
  }

  test("transitionMatrix counts within-session transitions with exact basis points") {
    val d = evT(
      // user 1, one session: a -> b -> a  (transitions a>b, b>a)
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (2L, 1L, "2024-01-01 10:01:00", "b"),
      (3L, 1L, "2024-01-01 10:02:00", "a"),
      // session break (> 1h) — a -> c in the new session; the boundary
      // pair (a @10:02 -> a @12:00) must NOT be counted
      (4L, 1L, "2024-01-01 12:00:00", "a"),
      (5L, 1L, "2024-01-01 12:05:00", "c"),
      // user 2: a -> b
      (6L, 2L, "2024-01-01 10:00:00", "a"),
      (7L, 2L, "2024-01-01 10:01:00", "b"))
    val out = Sessionize.transitionMatrix(d, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 3600)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from 'a': 3 transitions total — a>b twice (6666 bp), a>c once (3333 bp)
    out(("a", "b")) shouldBe ((2L, 6666L))
    out(("a", "c")) shouldBe ((1L, 3333L))
    out(("b", "a")) shouldBe ((1L, 10000L))
    out.keySet should not contain (("a", "a"))
  }

  test("transitionMatrix drops NULL actions before pairing (unknown bridges)") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        Row(2L, 1L, Timestamp.valueOf("2024-01-01 10:01:00"), null),
        Row(3L, 1L, Timestamp.valueOf("2024-01-01 10:02:00"), "b"))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_type", StringType))))
    val out = Sessionize.transitionMatrix(d, "user_id", "ts", "event_type",
        "event_id", gapSeconds = 3600)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // a, NULL, b pairs as one a->b transition; no NULL rows appear
    out shouldBe Map(("a", "b") -> 1L)
  }

  test("nextActionEntropy hand-computed per-state cards") {
    // one session A B A C: pairs A->B, B->A, A->C
    // H(next|A) = 2 * 0.5*log10(2) = log10(2); H(next|B) = 0
    val d = evT(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:00:10", "B"),
      (3L, 1L, "2024-01-01 10:00:20", "A"),
      (4L, 1L, "2024-01-01 10:00:30", "C"))
    val out = Sessionize.nextActionEntropy(d, "user_id", "ts",
        "event_type", "event_id", 3600)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out.keySet shouldBe Set("A", "B")
    out("A")._1 shouldBe 2L
    out("A")._2 shouldBe 2L
    out("A")._3 shouldBe 2 * graft.functions.Rounding.p6d(0.5 * math.log10(2.0))
    out("B") shouldBe ((1L, 1L, 0.0))
    // a session boundary breaks the pair: no output at all
    val split = evT(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 13:00:00", "B"))
    Sessionize.nextActionEntropy(split, "user_id", "ts",
      "event_type", "event_id", 3600).collect() shouldBe empty
  }

  test("hourEntropy: 0 for one-slot keys, labelEntropy sums otherwise") {
    import graft.functions.Rounding.p6d
    // user 1: both events in UTC hour 10; user 2: hours 10 and 11;
    // user 3: counts (2,1) over hours 10 and 22
    val d = evT(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:30:00", "A"),
      (3L, 2L, "2024-01-01 10:00:00", "A"),
      (4L, 2L, "2024-01-01 11:00:00", "A"),
      (5L, 3L, "2024-01-01 10:00:00", "A"),
      (6L, 3L, "2024-01-01 10:10:00", "A"),
      (7L, 3L, "2024-01-01 22:00:00", "A"))
    val out = Sessionize.hourEntropy(d, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((2L, 1L, 0.0))
    out(2L) shouldBe ((2L, 2L,
      (BigDecimal(p6d(0.5 * math.log10(2.0))) * 2).toDouble))
    out(3L) shouldBe ((3L, 2L,
      (BigDecimal(p6d((2.0 / 3.0) * math.log10(3.0 / 2.0))) +
        BigDecimal(p6d((1.0 / 3.0) * math.log10(3.0)))).toDouble))
  }

  test("streaks finds the longest run with deterministic tie-breaks") {
    val d = evT(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:00:01", "A"),
      (3L, 1L, "2024-01-01 10:00:02", "A"),
      (4L, 1L, "2024-01-01 10:00:03", "B"),
      (5L, 1L, "2024-01-01 10:00:04", "B"),
      (6L, 1L, "2024-01-01 10:00:05", "A"))
    val r = Sessionize.streaks(d, "user_id", "ts", "event_type",
      "event_id").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) shouldBe
      ((1L, 6L, 3L, "A"))
    // equal-length runs: the alphabetically-first action wins
    val tie = evT(
      (1L, 2L, "2024-01-01 10:00:00", "B"),
      (2L, 2L, "2024-01-01 10:00:01", "B"),
      (3L, 2L, "2024-01-01 10:00:02", "A"),
      (4L, 2L, "2024-01-01 10:00:03", "A"))
    val rt = Sessionize.streaks(tie, "user_id", "ts", "event_type",
      "event_id").collect().head
    (rt.getLong(2), rt.getString(3)) shouldBe ((2L, "A"))
  }
}
