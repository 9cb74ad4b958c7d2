package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the event-analytics operators (funnel,
  * retention cohorts). */
class EventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("events-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (u, e, t) => (u, e, ts(t)) }.toDF("user_id", "event_type", "ts")
  }

  test("funnel: ordering is enforced — a click before the first view does not convert") {
    val df = events(
      // user 1: full ordered funnel
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: clicked BEFORE viewing — stage 2 must not count them
      (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 09:30:00"),
      // user 3: view + click, no purchase
      (3L, "view", "2024-01-01 08:00:00"), (3L, "click", "2024-01-01 08:01:00"),
      // user 4: purchase only — never enters the funnel
      (4L, "purchase", "2024-01-01 07:00:00"))
    val out = Events.funnelCounts(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("step").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: first-touch semantics — a later re-view does not reopen the funnel") {
    val df = events(
      // first view at 10:00; click at 09:00 is before it; the second
      // view at 11:00 must NOT re-qualify the 09:00 click
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 11:00:00"))
    val out = Events.funnelCounts(df, "user_id", "event_type", "ts",
      Seq("view", "click")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("funnel with horizon: a step outside the window does not convert") {
    val df = events(
      // u1 clicks 10 min after viewing (inside 1h), u2 clicks 2h after
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 12:00:00"))
    val out = Events.funnelCounts(df, "user_id", "event_type", "ts",
      Seq("view", "click"), within = Some("1 HOUR")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L))
    // without the horizon both convert
    val open = Events.funnelCounts(df, "user_id", "event_type", "ts",
      Seq("view", "click")).orderBy("step").collect()
    assert(open.map(_.getLong(2)).toSeq === Seq(2L, 2L))
  }

  test("funnel: fractional seconds `within` is a valid interval term") {
    // Spark's interval syntax allows a fraction on the seconds term only
    val df = events(
      // u1 clicks 1h after viewing (inside 5400.5s), u2 clicks 2h after
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 12:00:00"))
    val out = Events.funnelCounts(df, "user_id", "event_type", "ts",
      Seq("view", "click"), within = Some("1 hour 1800.5 seconds")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L))
    // fractions on non-second units are rejected at the API boundary with
    // a clear message (Spark itself raises INVALID_FRACTION at plan time)
    val ex = intercept[IllegalArgumentException] {
      Events.funnelCounts(df, "user_id", "event_type", "ts",
        Seq("view", "click"), within = Some("1.5 hours"))
    }
    assert(ex.getMessage.contains("within"))
  }

  test("funnel: malformed `within` fails fast with a clear argument error") {
    val df = events((1L, "view", "2024-01-01 10:00:00"))
    val ex = intercept[IllegalArgumentException] {
      Events.funnelCounts(df, "user_id", "event_type", "ts",
        Seq("view", "click"), within = Some("1 hr"))
    }
    assert(ex.getMessage.contains("within"))
  }

  test("retention: cohort by first-seen date, periods in unitDays buckets") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"), // cohort 2024-01-01
      (1L, "view", "2024-01-05 10:00:00"), // period 0 (day 4)
      (1L, "view", "2024-01-09 10:00:00"), // period 1 (day 8)
      (2L, "view", "2024-01-01 12:00:00"), // same cohort
      (2L, "view", "2024-01-16 12:00:00"), // period 2 (day 15)
      (3L, "view", "2024-01-03 12:00:00")) // cohort 2024-01-03, period 0
    val out = Events.retentionCohorts(df, "user_id", "ts", unitDays = 7)
      .orderBy("cohort_date", "period").collect()
    val got = out.map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 2L), // both users active in week 0
      ("2024-01-01", 1, 1L),
      ("2024-01-01", 2, 1L),
      ("2024-01-03", 0, 1L)))
  }

  test("retention: null users are dropped, not emitted as zero-count cohorts") {
    // The pre-r13 agg⨝events plan dropped null users via its inner
    // equi-join; the window rewrite would KEEP null as a partition key
    // and emit (cohort, period) groups whose countDistinct(user) is 0
    // (r13 advisory). The output must stay join-identical.
    val s = spark
    import s.implicits._
    val df = Seq[(Option[Long], String, Timestamp)](
      (Some(1L), "view", ts("2024-01-01 10:00:00")),
      (None, "view", ts("2024-02-01 10:00:00")), // null-only cohort 2024-02-01
      (None, "view", ts("2024-02-09 10:00:00")),
      (Some(1L), "view", ts("2024-01-09 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Events.retentionCohorts(df, "user_id", "ts", unitDays = 7)
      .orderBy("cohort_date", "period").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq(("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L)),
      s"null users must not create cohorts: $got")
  }
}
