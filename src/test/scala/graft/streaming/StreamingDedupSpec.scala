package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model.Pageview

/** Streaming exact dedup by eventId — the reference's `Pageview.eventId`
  * exists "precisely to enable" dedup (SURVEY.md §7.5). Uses
  * `dropDuplicatesWithinWatermark` so dedup state is evicted once the
  * watermark passes (bounded state at 100 TB: state ~ events within the
  * watermark horizon, not the full history).
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("duplicate eventIds within the watermark horizon are suppressed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = MemoryStream[Pageview]
    val q = m.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("eventId")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .start()
    try {
      m.addData(
        Pageview("a", ts("2016-02-01T00:10:00Z"), "e1"),
        Pageview("a", ts("2016-02-01T00:10:00Z"), "e1"), // same-batch dup
        Pageview("b", ts("2016-02-01T00:20:00Z"), "e2"))
      q.processAllAvailable()
      m.addData(Pageview("a", ts("2016-02-01T00:15:00Z"), "e1")) // cross-batch dup
      m.addData(Pageview("c", ts("2016-02-01T00:30:00Z"), "e3"))
      q.processAllAvailable()
      val ids = s.table("dedup_out").select("eventId").as[String].collect().sorted
      assert(ids.toSeq == Seq("e1", "e2", "e3"),
        s"each eventId exactly once: ${ids.toSeq}")
    } finally q.stop()
  }
}
