package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model.Pageview

/** Stream-stream interval join under two independent watermarks: pairs
  * emit only when BOTH sides have arrived (a lagging input gates
  * emission), buffered state is evicted once the watermark passes a row's
  * joinable range, and the complete streaming output equals the batch
  * replay of the same predicate. */
class IntervalJoinStreamingSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("interval join: lagging side gates emission; complete output equals batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val probes = MemoryStream[Pageview]
    val views = MemoryStream[Pageview]
    val joined = WatermarkPipeline.intervalJoined(
      probes.toDS(), views.toDS(), lookbackSec = 1800)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    try {
      // probe at 01:00 arrives FIRST; its in-range views arrive later —
      // nothing may emit until the view side catches up
      probes.addData(Pageview("u0", ts("2016-02-01T01:00:00Z"), "p1"))
      q.processAllAvailable()
      assert(s.table("ij_out").count() == 0,
        "pairs emitted before the view side arrived")

      // views: two in the preceding 30 min (match), one 31 min early and
      // one on another url (no match)
      views.addData(
        Pageview("u0", ts("2016-02-01T00:29:00Z"), "v-early"),
        Pageview("u0", ts("2016-02-01T00:35:00Z"), "v1"),
        Pageview("u0", ts("2016-02-01T00:59:00Z"), "v2"),
        Pageview("u1", ts("2016-02-01T00:45:00Z"), "v-otherkey"))
      q.processAllAvailable()
      val afterViews = s.table("ij_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(afterViews == Set(("p1", "v1"), ("p1", "v2")),
        s"exactly the in-range same-url pairs: $afterViews")

      // advance both watermarks far past the first hour, then send a NEW
      // probe whose range covers the (now evicted) early rows: state for
      // them is gone, so only still-buffered views may pair
      probes.addData(Pageview("u0", ts("2016-02-01T06:00:00Z"), "p-adv"))
      views.addData(Pageview("u0", ts("2016-02-01T06:00:00Z"), "v-adv"))
      q.processAllAvailable()

      val all = s.table("ij_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(all((("p-adv"), ("v-adv"))))

      // complete streaming output == batch replay over the SAME events
      val probesAll = Seq(
        Pageview("u0", ts("2016-02-01T01:00:00Z"), "p1"),
        Pageview("u0", ts("2016-02-01T06:00:00Z"), "p-adv")).toDF()
      val viewsAll = Seq(
        Pageview("u0", ts("2016-02-01T00:29:00Z"), "v-early"),
        Pageview("u0", ts("2016-02-01T00:35:00Z"), "v1"),
        Pageview("u0", ts("2016-02-01T00:59:00Z"), "v2"),
        Pageview("u1", ts("2016-02-01T00:45:00Z"), "v-otherkey"),
        Pageview("u0", ts("2016-02-01T06:00:00Z"), "v-adv")).toDF()
      val batch = WatermarkPipeline
        .intervalJoinedBatch(probesAll, viewsAll, lookbackSec = 1800)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(all == batch,
        s"streaming complete output $all != batch replay $batch")

      // state is bounded: the store holds fewer buffered rows than were
      // ingested (eviction engaged once watermarks passed joinable ranges)
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      assert(st.map(_.numRowsTotal).sum < 7,
        s"state store still buffers every ingested row: ${st.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}
