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
}
