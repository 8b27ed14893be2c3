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

  test("streaming decontamination: stateless two-tier filter equals the batch exact rule") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.functions.expressions.{GramBloom, SortedLongSet, SpanHash}
    // Per-row decontamination is what a STREAM can express — the batch
    // form's verify join anti-joins against an aggregate of the corpus
    // itself, which no streaming query can do. Two plan-constant tiers
    // built from the STATIC eval suite: Bloom prefilter (cheap pass for
    // the overwhelmingly clean common case), exact sorted-hash-set
    // confirm (removes the bloom's false positives without a join). Both
    // stateless: no watermark, no state store, restart-trivial.
    val evalDocs = Seq(
      (0L, (1 to 25).map(i => s"e$i").mkString(" ")),
      (1L, (1 to 25).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val evalHashes = evalDocs
      .select(split(col("text"), " ").as("toks"))
      .select(explode(array_distinct(SpanHash.span_hashes(col("toks"), 3))).as("h"))
      .distinct()
    val (bits, m, k) = GramBloom.buildLong(evalHashes, "h", fpp = 1e-4)
    val exact = SortedLongSet.build(evalHashes, "h")
    // 25 distinct tokens (passes the gate); shares eval 3-gram "e7 e8 e9"
    val contaminated = (1 to 22).map(i => s"c$i").mkString(" ") + " e7 e8 e9"
    val clean = (1 to 25).map(i => s"k$i").mkString(" ")
    val ms = MemoryStream[CurationDoc]
    import graft.operators.CorpusOps._
    val hs = SpanHash.span_hashes(split(col("text"), " "), 3)
    val decon = ms.toDS().toDF()
      .qualityFiltered()
      .withColumn("_hs", hs)
      .filter(!(GramBloom.bloom_contains_any(bits, m, k)(col("_hs")) &&
                SortedLongSet.contains_any(exact)(col("_hs"))))
      .select("doc_id")
    val q = decon.writeStream.outputMode("append")
      .format("memory").queryName("decon").start()
    try {
      ms.addData(
        CurationDoc(10, clean, "en", ts(1)),
        CurationDoc(11, contaminated, "en", ts(2)), // shares an eval gram
        CurationDoc(12, goodText2, "de", ts(3)),
        CurationDoc(13, shortText, "en", ts(4)))    // gate-dropped
      q.processAllAvailable()
      val kept = s.table("decon").collect().map(_.getLong(0)).toSet
      assert(kept == Set(10L, 12L), s"survivors: $kept")
      // parity: the batch EXACT STRING rule over the same rows agrees
      val streamDocs = Seq((10L, clean), (11L, contaminated), (12L, goodText2))
        .toDF("doc_id", "text")
      val evalGrams = evalDocs.select(split(col("text"), " ").as("toks"))
        .select(explode(graft.operators.Dedup
          .shinglesFromTokens(col("toks"), 3)).as("gram")).distinct()
      val batchContaminated = streamDocs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(graft.operators.Dedup
          .shinglesFromTokens(col("toks"), 3)).as("gram"))
        .join(evalGrams, "gram").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(batchContaminated == Set(11L),
        s"batch exact rule must agree: $batchContaminated")
    } finally q.stop()
  }
}
