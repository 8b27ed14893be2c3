package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Pageview

/** Stream-static join: a live stream enriched against a batch dimension
  * table — the standard lookup-enrichment shape (user profile, catalog).
  * Unlike stream-stream joins this keeps NO state: the static side is
  * (re)read and broadcast per micro-batch, so dimension updates between
  * batches are picked up and the stream side never buffers. */
class StreamStaticJoinSpec extends SparkSpec {

  private def pv(url: String, minute: Int): Pageview =
    Pageview(url, new Timestamp(minute * 60000L), s"e$minute-$url")

  test("stream enriched by a static dimension, inner and left outer") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dim = Seq(("u/0", "news"), ("u/1", "shop")).toDF("url", "category")
    val ms = MemoryStream[Pageview]
    val enriched = ms.toDS().toDF()
      .join(broadcast(dim), Seq("url"), "left_outer")
      .select("eventId", "url", "category")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      ms.addData(pv("u/0", 1), pv("u/1", 2), pv("u/9", 3))
      q.processAllAvailable()
      val rows = s.table("enriched").collect()
        .map(r => (r.getString(1), Option(r.getString(2)))).toSet
      assert(rows == Set(
        ("u/0", Some("news")), ("u/1", Some("shop")), ("u/9", None)),
        s"left-outer enrichment must keep unmatched stream rows: $rows")
    } finally q.stop()

    // inner variant: unmatched stream rows are DROPPED
    val ms2 = MemoryStream[Pageview]
    val inner = ms2.toDS().toDF()
      .join(broadcast(dim), Seq("url"))
      .select("eventId", "url", "category")
    val q2 = inner.writeStream.outputMode("append")
      .format("memory").queryName("enriched_inner").start()
    try {
      ms2.addData(pv("u/0", 4), pv("u/9", 5))
      q2.processAllAvailable()
      val rows = s.table("enriched_inner").collect()
        .map(r => (r.getString(1), r.getString(2))).toSet
      assert(rows == Set(("u/0", "news")),
        s"inner enrichment must drop unmatched stream rows: $rows")
    } finally q2.stop()
  }
}
