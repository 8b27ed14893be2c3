package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Pageview

/** Streaming session windows: sessions merge while events arrive within the
  * gap, fire (append mode) once the watermark passes session end + gap, and
  * stay closed afterwards. */
class SessionWindowStreamingSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("session window fires once the watermark passes its end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = MemoryStream[Pageview]
    val out = m.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "10 minutes"), col("url"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("start"),
              col("session_window.end").as("end"), col("url"), col("cnt"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      // one session: events 4 minutes apart (< 10m gap)
      m.addData(
        Pageview("u", ts("2016-02-01T00:00:00Z"), "1"),
        Pageview("u", ts("2016-02-01T00:04:00Z"), "2"),
        Pageview("u", ts("2016-02-01T00:08:00Z"), "3"))
      q.processAllAvailable()
      assert(s.table("sess_out").count() == 0,
        "session still open: watermark has not passed end+gap")

      // an event far ahead closes the session (watermark jumps past end)
      m.addData(Pageview("u", ts("2016-02-01T01:00:00Z"), "4"))
      q.processAllAvailable()
      val rows = s.table("sess_out").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString,
                   r.getTimestamp(1).toInstant.toString, r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        ("2016-02-01T00:00:00Z", "2016-02-01T00:18:00Z", "u", 3L)),
        s"one merged session [first, last+gap): ${rows.toSeq}")
    } finally q.stop()
  }

  test("min-of-inputs watermark gates session emission; final output equals batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val (part0, part1) = graft.model.PageviewGen.skewedPartitions(step = 60000L)
    val m0 = MemoryStream[Pageview]
    val m1 = MemoryStream[Pageview]
    val q = WatermarkPipeline.sessionCounts(Seq(m0.toDS(), m1.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_union_out").start()
    try {
      // phase 1 — O3b gating: stream 0 delivers its whole range
      // [day1, day3); stream 1 only [day2, day2T06). The union's
      // watermark is the MIN of the per-input maxima, so no session past
      // stream 1's horizon may emit even though stream 0 is a day ahead.
      val horizon = ts("2016-02-02T06:00:00Z")
      m0.addData(part0: _*)
      m1.addData(part1.filter(_.ts.before(horizon)): _*)
      q.processAllAvailable()
      val early = s.table("sess_union_out").collect()
      assert(early.nonEmpty, "sessions below the min watermark must have fired")
      val maxEnd = early.map(_.getTimestamp(1).getTime).max
      assert(maxEnd <= horizon.getTime,
        s"session ending ${new Timestamp(maxEnd).toInstant} emitted past the " +
          s"lagging stream's watermark — min-of-inputs gating is broken")

      // phase 2 — deliver the rest plus a far-future flush event per
      // stream: the min watermark passes every real session's end. The
      // flush events' own sessions stay open (the watermark never passes
      // them), so the sink holds exactly the real sessions.
      val flush0 = Pageview("http://site.com/0", ts("2016-02-05T00:00:00Z"), "f0")
      val flush1 = Pageview("http://site.com/0", ts("2016-02-05T00:00:00Z"), "f1")
      m1.addData(part1.filterNot(_.ts.before(horizon)): _*)
      m0.addData(flush0); m1.addData(flush1)
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getString(2), r.getLong(3))
      val streamed = s.table("sess_union_out").collect().map(key).toSet
      val batch = WatermarkPipeline
        .sessionCountsBatch((part0 ++ part1).toDF()).collect().map(key).toSet
      assert(streamed == batch,
        s"streaming sessions diverge from batch replay: " +
          s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }
}
