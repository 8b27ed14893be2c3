package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MinHashLSH

case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

/** The LSH family's streaming member: signature-keyed, watermark-bounded
  * near-dup dedup (StreamingNearDup). Two invariants matter:
  * (1) the per-row signature is BIT-EQUAL to the batch signature pipeline
  *     (same shingles, hash, permutations) — otherwise batch and stream
  *     would disagree on what "near-duplicate" means;
  * (2) state is bounded by the watermark horizon — entries evict once the
  *     watermark passes, so a forever-running stream holds rate*horizon
  *     signatures, not corpus-many. */
class StreamingMinHashDedupSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(m * 60000L)
  private val base = (1 to 30).map(i => s"w$i").mkString(" ")
  // appending "tail" adds one shingle ("w29 w30 tail") that is no
  // permutation's minimum, so the full signature is UNCHANGED — a true
  // near-duplicate under signature dedup (precondition-checked below)
  private val nearDup = base + " tail"
  private val unrelated = (1 to 30).map(i => s"v$i").mkString(" ")

  test("per-row signature is bit-equal to the batch signature pipeline") {
    val s = spark
    val docs = graft.sources.Tables.documents(s, sfDir)
    val sigCols = array((0 until 12).map(i => col(s"sig_$i")): _*)
    val batch = MinHashLSH.signatures(docs, "doc_id", "text", "lang", 3, 6, 2)
      .select(col("doc_id"), sigCols.as("bsig"))
    val row = docs.select(col("doc_id"),
      MinHashLSH.rowSignature(col("text")).as("rsig"))
    val joined = batch.join(row, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("bsig") =!= col("rsig")).count() == 0,
      "row and batch signatures diverged")
  }

  test("row and batch signatures agree on random documents (generative)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"v$i")
    // lengths 0..11 include the no-shingle edge; shingle-bearing docs
    // (>= 3 tokens) must agree bit-for-bit with the batch pipeline
    val docs = (0L until 120L).map { i =>
      val n = rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "x")
    }.toDF("doc_id", "text", "lang")
    val sigCols = array((0 until 12).map(i => col(s"sig_$i")): _*)
    val batch = MinHashLSH.signatures(docs, "doc_id", "text", "lang", 3, 6, 2)
      .select(col("doc_id"), sigCols.as("bsig"))
    val row = docs.select(col("doc_id"),
      MinHashLSH.rowSignature(col("text")).as("rsig"))
    val joined = batch.join(row, "doc_id")
    assert(joined.count() > 30, "fixture must generate enough shingled docs")
    assert(joined.filter(col("bsig") =!= col("rsig")).count() == 0,
      "row and batch signatures diverged on random input")
  }

  test("short docs fall back to exact-content signatures — no collision") {
    val s = spark
    import s.implicits._
    // docs under n tokens have no shingles: every permutation minimum
    // would be null and ALL short docs would share one signature — the
    // fallback keys them on exact content instead (unrelated shorts never
    // collide, identical shorts still dedup)
    val sigs = Seq("hello world", "totally different", "hello world")
      .toDF("text")
      .select(MinHashLSH.rowSignature(col("text")).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) != sigs(1), "unrelated short docs must not collide")
    assert(sigs(0) == sigs(2), "identical short docs must still collide")
    assert(sigs.forall(sg => sg.forall(_ != null)), "no null signature parts")
  }

  test("reserved _minhash_sig input column is rejected, not clobbered") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c", ts(1), 7L))
      .toDF("doc_id", "text", "ts", "_minhash_sig")
    val e = intercept[IllegalArgumentException] {
      StreamingNearDup.dedupBySignature(df, "text", "ts", "10 minutes")
    }
    assert(e.getMessage.contains("_minhash_sig"))
  }

  test("near-dup within the horizon is dropped; expired state evicts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // precondition: the fixture really is a signature-level near-dup
    val sigs = Seq(base, nearDup, unrelated).toDF("text")
      .select(MinHashLSH.rowSignature(col("text")).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1), "fixture must collide on the full signature")
    assert(sigs(0) != sigs(2), "unrelated text must not collide")

    val ms = MemoryStream[StreamDoc]
    val deduped = StreamingNearDup.dedupBySignature(
      ms.toDS().toDF(), "text", "ts", "10 minutes").select("doc_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream").start()
    try {
      ms.addData(
        StreamDoc(1, base, ts(1)),
        StreamDoc(2, nearDup, ts(2)),    // near-dup of 1 -> one survives
        StreamDoc(3, unrelated, ts(3)))  // distinct -> keep
      q.processAllAvailable()
      val kept = s.table("neardup_stream").collect().map(_.getLong(0)).toSet
      // 1 and 2 share a signature and arrive in ONE batch: the survivor
      // among same-key rows is arbitrary (processing order), so assert
      // "exactly one of the pair", not which one
      assert(kept.contains(3L), s"distinct doc must survive: $kept")
      assert(Set(1L, 2L).intersect(kept).size == 1,
        s"exactly one of the near-dup pair must survive: $kept")

      // advance the watermark far past the first batch's horizon, then one
      // more batch so eviction lands in lastProgress: only the recent
      // signatures may remain in state
      ms.addData(StreamDoc(9, unrelated + " zz", ts(120)))
      q.processAllAvailable()
      ms.addData(StreamDoc(10, (1 to 25).map(i => s"u$i").mkString(" "), ts(121)))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty, "expected a stateful dedup operator in progress")
      assert(st(0).numRowsTotal <= 3,
        s"expired signatures must evict, state rows = ${st(0).numRowsTotal}")
    } finally q.stop()
  }
}
