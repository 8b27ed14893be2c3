package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Pageview

/** Streaming sliding windows under min-of-inputs watermark gating — the one
  * window family (q_window_sliding's shape) that tumbling and session specs
  * don't cover: every event lands in width/slide OVERLAPPING windows, and a
  * lagging input must hold back ALL of them, not just the window containing
  * its last event. */
class SlidingWindowStreamingSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("each event fires once per overlapping window, only past the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = MemoryStream[Pageview]
    val q = WatermarkPipeline.slidingCounts(Seq(m.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("slide_out").start()
    try {
      // one event at 00:10 → covered by [23:30,00:30) and [00:00,01:00)
      m.addData(Pageview("u", ts("2016-02-01T00:10:00Z"), "1"))
      q.processAllAvailable()
      assert(s.table("slide_out").count() == 0,
        "no window end has been passed by the watermark yet")

      // watermark jumps to 01:30: BOTH covering windows of the first
      // event end at or before it and must fire; the late event's own
      // covering windows ([01:00,02:00), [01:30,02:30)) stay open
      m.addData(Pageview("u", ts("2016-02-01T01:30:00Z"), "2"))
      q.processAllAvailable()
      val rows = s.table("slide_out").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString,
                   r.getTimestamp(1).toInstant.toString, r.getString(2), r.getLong(3)))
        .toSet
      assert(rows == Set(
        ("2016-01-31T23:30:00Z", "2016-02-01T00:30:00Z", "u", 1L),
        ("2016-02-01T00:00:00Z", "2016-02-01T01:00:00Z", "u", 1L)),
        s"expected exactly the two overlapping windows of event 1: $rows")
    } finally q.stop()
  }

  test("min-of-inputs watermark gates ALL overlapping windows; final output equals batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val (part0, part1) = graft.model.PageviewGen.skewedPartitions(step = 60000L)
    val m0 = MemoryStream[Pageview]
    val m1 = MemoryStream[Pageview]
    val q = WatermarkPipeline.slidingCounts(Seq(m0.toDS(), m1.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("slide_union_out").start()
    try {
      // phase 1 — O3b gating: stream 0 delivers its whole range
      // [day1, day3); stream 1 only [day2, day2T06). The union's
      // watermark is the MIN of the per-input maxima, so EVERY window
      // overlapping stream 1's horizon — both the one containing its
      // last event and the half-slide-shifted one — must be held back,
      // even though stream 0 is almost a day ahead.
      val horizon = ts("2016-02-02T06:00:00Z")
      m0.addData(part0: _*)
      m1.addData(part1.filter(_.ts.before(horizon)): _*)
      q.processAllAvailable()
      val early = s.table("slide_union_out").collect()
      assert(early.nonEmpty, "windows fully below the min watermark must have fired")
      val maxEnd = early.map(_.getTimestamp(1).getTime).max
      assert(maxEnd <= horizon.getTime,
        s"window ending ${new Timestamp(maxEnd).toInstant} emitted past the " +
          s"lagging stream's watermark — min-of-inputs gating is broken")
      // overlap coverage below the watermark: both 30m-phases are present
      // (windows starting on the hour AND on the half hour), i.e. the
      // expansion into overlapping windows survived the union+gating
      val phases = early.map(_.getTimestamp(0).getTime % 3600000L).toSet
      assert(phases == Set(0L, 1800000L),
        s"expected both sliding phases below the watermark, got $phases")

      // phase 2 — deliver the rest plus one far-future flush event per
      // stream: the min watermark passes every real window's end; the
      // flush events' own windows stay open, so the sink holds exactly
      // the real windows.
      val flush0 = Pageview("http://site.com/0", ts("2016-02-05T00:00:00Z"), "f0")
      val flush1 = Pageview("http://site.com/0", ts("2016-02-05T00:00:00Z"), "f1")
      m1.addData(part1.filterNot(_.ts.before(horizon)): _*)
      m0.addData(flush0); m1.addData(flush1)
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getString(2), r.getLong(3))
      val streamed = s.table("slide_union_out").collect().map(key).toSet
      val batch = WatermarkPipeline
        .slidingCountsBatch((part0 ++ part1).toDF()).collect().map(key).toSet
      assert(streamed == batch,
        s"streaming sliding windows diverge from batch replay: " +
          s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }
}
