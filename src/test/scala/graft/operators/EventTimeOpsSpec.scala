package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.Pageview
import graft.operators.EventTimeOps._

/** Window bucketing edge cases (SURVEY.md §5.2): epoch alignment, half-open
  * `[start, end)` bounds (`WindowAggregate.scala:36-37`), boundary events,
  * generic folds, watermark gating.
  */
class EventTimeOpsSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("hour windows are epoch-aligned and half-open: boundary event goes to next window") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Pageview("a", ts("2016-02-01T09:59:59.999Z"), "1"),
      Pageview("a", ts("2016-02-01T10:00:00.000Z"), "2"),  // exactly on boundary
      Pageview("a", ts("2016-02-01T10:59:59.999Z"), "3")
    ).toDF()
    val out = df.countPerKeyPerWindow("ts", "1 hour", "url")
      .as[(Timestamp, Timestamp, String, Long)].collect().toSet
    assert(out == Set(
      (ts("2016-02-01T09:00:00Z"), ts("2016-02-01T10:00:00Z"), "a", 1L),
      (ts("2016-02-01T10:00:00Z"), ts("2016-02-01T11:00:00Z"), "a", 2L)))
  }

  test("count fold ignores element values; sum fold uses them (R: Numeric generality)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("k1", ts("2016-02-01T00:10:00Z"), 5.0),
      ("k1", ts("2016-02-01T00:20:00Z"), 7.0),
      ("k2", ts("2016-02-01T00:30:00Z"), 11.0)
    ).toDF("url", "ts", "v")
    import org.apache.spark.sql.functions._
    val out = df.aggPerKeyPerWindow("ts", "1 hour", Seq("url"),
        sum(col("v")).as("s"), count(lit(1)).as("c"))
      .select("url", "s", "c")
      .as[(String, Double, Long)].collect().toSet
    assert(out == Set(("k1", 12.0, 2L), ("k2", 11.0, 1L)))
  }

  test("windowsFiredBy keeps exactly the windows whose end <= watermark") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Pageview("a", ts("2016-02-01T00:30:00Z"), "1"),   // window ends 01:00 <= wm
      Pageview("a", ts("2016-02-01T00:59:59.999Z"), "2"), // same window
      Pageview("a", ts("2016-02-01T01:00:00Z"), "3")    // window ends 02:00 > wm
    ).toDF()
    val wm = ts("2016-02-01T01:00:00Z")
    val kept = df.windowsFiredBy("ts", "1 hour", wm).select("eventId")
      .as[String].collect().toSet
    assert(kept == Set("1", "2"))
  }
}
