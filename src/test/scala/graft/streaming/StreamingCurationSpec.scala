package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

case class CurationDoc(doc_id: Long, text: String, lang: String, ts: Timestamp)

/** The curation pipeline (q_curation_pipeline's semantics) in STREAMING
  * form: quality gate at the scan, then watermark-bounded streaming dedup
  * on content — the shape a continuously-ingesting corpus pipeline runs.
  * State stays bounded by the watermark horizon (the batch pipeline's
  * groupBy(text) has no such bound). */
class StreamingCurationSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(m * 60000L)
  private val goodText = (1 to 25).map(i => s"w$i").mkString(" ")  // 25 distinct tokens
  private val goodText2 = (1 to 30).map(i => s"v$i").mkString(" ")
  private val shortText = "too short"                               // fails n_tokens >= 20
  private val repeatText = Seq.fill(40)("x").mkString(" ")          // fails distinct ratio

  test("streaming quality gate + watermark-bounded dedup keeps each text once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[CurationDoc]
    import graft.operators.CorpusOps._
    val curated = ms.toDS().toDF()
      .qualityFiltered()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("text")
      .select("doc_id", "lang")
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    try {
      ms.addData(
        CurationDoc(1, goodText, "en", ts(1)),
        CurationDoc(2, shortText, "en", ts(2)),   // quality-dropped
        CurationDoc(3, goodText, "en", ts(3)),    // duplicate within horizon
        CurationDoc(4, repeatText, "en", ts(4)),  // quality-dropped
        CurationDoc(5, goodText2, "de", ts(5)))
      q.processAllAvailable()
      val kept = s.table("curated").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 5L),
        s"quality failures and in-horizon duplicates must not survive: $kept")
    } finally q.stop()
  }

  test("full streaming curation: quality gate chains into NEAR-dup dedup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[CurationDoc]
    import graft.operators.CorpusOps._
    // the production composition: gate -> signature-level near-dup dedup
    // (StreamingNearDup), both watermark-bounded, one stream
    val curated = StreamingNearDup.dedupBySignature(
        ms.toDS().toDF().qualityFiltered(), "text", "ts", "10 minutes")
      .select("doc_id")
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated_near").start()
    try {
      // goodText + one appended token: passes the gate (26 tokens) and is
      // a signature-level near-dup of goodText (the extra trailing shingle
      // is no permutation's minimum for this fixture — asserted below)
      val nearDup = goodText + " tail"
      val sigOf = (t: String) => Seq(t).toDF("text")
        .select(graft.operators.MinHashLSH.rowSignature(col("text")).as("s"))
        .head().getSeq[Long](0)
      assert(sigOf(goodText) == sigOf(nearDup), "fixture must collide")
      ms.addData(
        CurationDoc(1, goodText, "en", ts(1)),
        CurationDoc(2, shortText, "en", ts(2)),  // gate-dropped
        CurationDoc(3, nearDup, "en", ts(3)),    // near-dup of 1 -> one survives
        CurationDoc(4, goodText2, "de", ts(4)))  // distinct -> kept
      q.processAllAvailable()
      val kept = s.table("curated_near").collect().map(_.getLong(0)).toSet
      // docs 1 and 3 share a signature and arrive in ONE batch: the
      // survivor among same-key rows is arbitrary (processing order), so
      // the invariant is "exactly one of them" — not which one
      assert(kept.contains(4L) && !kept.contains(2L),
        s"gate must drop 2 and keep 4: $kept")
      assert(Set(1L, 3L).intersect(kept).size == 1,
        s"exactly one of the near-dup pair must survive: $kept")
    } finally q.stop()
  }
}
