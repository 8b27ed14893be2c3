package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfIndex
import graft.sources.Tables

/** Online ANN serving against the persisted IVF index: the foreachBatch
  * top-k path answers each micro-batch exactly like the batch probe, and
  * the stateless scored-candidate path runs with no state store at all. */
class StreamingAnnSpec extends SparkSpec {

  private lazy val queryRows: Array[(Long, Array[Float])] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  test("foreachBatch top-k serving equals the batch probe, across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StreamingAnn.serveTopK(
      s, sfDir, ms.toDF().toDF("vec_id", "embedding"), k = 5,
      sink = (df, _) => got.synchronized {
        got ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      },
      candidatePred = col("vec_id") >= 10)
    try {
      // two separate micro-batches: per-query answers must not depend on
      // which batch carried the query
      ms.addData(queryRows.take(4).toSeq)
      q.processAllAvailable()
      ms.addData(queryRows.drop(4).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val expect = IvfIndex.probe(
        s, sfDir, Tables.embeddings(s, sfDir).filter(col("vec_id") < 10),
        k = 5, candidatePred = col("vec_id") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet == expect,
      s"streaming top-k diverges from the batch probe: ${got.size} vs ${expect.size} rows")
  }

  test("foreachBatch PQ-funnel serving equals the batch funnel, with zero state operators") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StreamingAnn.servePqTopK(
      s, sfDir, ms.toDF().toDF("vec_id", "embedding"), k = 5, r = 20,
      sink = (df, _) => got.synchronized {
        got ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      },
      candidatePred = col("vec_id") >= 10)
    try {
      // answers must not depend on which micro-batch carried the query
      ms.addData(queryRows.take(4).toSeq)
      q.processAllAvailable()
      ms.addData(queryRows.drop(4).toSeq)
      q.processAllAvailable()
      // the online funnel is STATELESS: per-query top-k completes within
      // its batch, so the streaming plan carries no state operator
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected a stateless plan, got ${q.lastProgress.stateOperators.length} state operators")
    } finally q.stop()
    val expect = graft.operators.PqIndex.probeRerank(
        s, sfDir, Tables.embeddings(s, sfDir).filter(col("vec_id") < 10),
        k = 5, r = 20, candidatePred = col("vec_id") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet == expect,
      s"streaming PQ funnel diverges from the batch funnel: ${got.size} vs ${expect.size} rows")
  }

  test("scored-candidate stream is stateless and matches batch scoring") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val scored = StreamingAnn.scoredCandidates(
      s, sfDir, ms.toDF().toDF("vec_id", "embedding"),
      candidatePred = col("vec_id") >= 10)
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("ann_scored").start()
    try {
      ms.addData(queryRows.toSeq)
      q.processAllAvailable()
      // stateless: the streaming plan must carry NO state operator (no
      // watermark, no aggregation, no stream-stream join state)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected a stateless plan, got ${q.lastProgress.stateOperators.length} state operators")
    } finally q.stop()
    val got = s.table("ann_scored").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expect = StreamingAnn.scoredCandidates(
        s, sfDir, Tables.embeddings(s, sfDir).filter(col("vec_id") < 10),
        candidatePred = col("vec_id") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect,
      s"streaming scored candidates diverge from batch: ${got.size} vs ${expect.size} rows")
  }
}
