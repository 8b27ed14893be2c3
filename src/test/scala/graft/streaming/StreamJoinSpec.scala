package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream inner join with watermarks and a time-range condition —
  * the streaming analog of the relational join surface. State on both
  * sides is bounded by the watermark + range (SCALE.md: no unbounded
  * buffering).
  */
case class View(user: String, vts: Timestamp, page: String)
case class Buy(user: String, bts: Timestamp, amount: Double)

class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("views join purchases within 30 minutes, exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val views = MemoryStream[View]
    val buys = MemoryStream[Buy]

    val v = views.toDS().withWatermark("vts", "0 seconds").as("v")
    val b = buys.toDS().withWatermark("bts", "0 seconds").as("b")
    val j = v.join(b,
        col("v.user") === col("b.user") &&
          col("b.bts") >= col("v.vts") &&
          col("b.bts") <= col("v.vts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v.user"), col("v.page"), col("b.amount"))

    val q = j.writeStream.outputMode("append").format("memory")
      .queryName("join_out").start()
    try {
      views.addData(
        View("u1", ts("2016-02-01T00:00:00Z"), "home"),
        View("u2", ts("2016-02-01T00:05:00Z"), "search"))
      buys.addData(
        Buy("u1", ts("2016-02-01T00:10:00Z"), 5.0),   // within 30m of u1 view
        Buy("u2", ts("2016-02-01T01:00:00Z"), 7.0))   // 55m after u2 view: no match
      q.processAllAvailable()
      val rowsSeq = s.table("join_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rowsSeq == Seq(("u1", "home", 5.0)),
        s"only the in-range pair joins, emitted exactly once: $rowsSeq")

      // late-arriving purchase behind both watermarks is dropped
      buys.addData(Buy("u1", ts("2016-02-01T00:01:00Z"), 99.0))
      views.addData(View("u3", ts("2016-02-01T02:00:00Z"), "x"))
      buys.addData(Buy("u3", ts("2016-02-01T02:00:00Z"), 1.0))
      q.processAllAvailable()
      val rows2 = s.table("join_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(!rows2.contains(("u1", "home", 99.0)),
        s"late purchase behind the watermark must not join: $rows2")
    } finally q.stop()
  }
}
