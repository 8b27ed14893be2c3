package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The 100 TB ingest shape demonstrated WHOLE (round-9 verdict item 6):
  * a directory of parquet files consumed incrementally as a stream,
  * through the curation chain (quality gate -> watermark-bounded exact
  * dedup), out to a parquet sink under a checkpoint — killed and
  * restarted mid-ingest — with the final sink contents equal to the
  * BATCH curation artifact (q_curation_pipeline) over the same data.
  *
  * The pieces were each spec'd separately (FileSourceSpec,
  * StreamingCurationSpec, CheckpointRecoverySpec, SinkModesSpec); this
  * spec composes them end to end, including the one semantic only the
  * composition exercises: a duplicate whose first copy arrives BEFORE
  * the restart and whose second copy arrives AFTER must still be
  * dropped, i.e. the dedup state survives the checkpoint round-trip.
  */
class StreamingIngestE2ESpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  test("parquet dir -> curation chain -> parquet sink, across a restart, equals the batch artifact") {
    val s = spark
    import s.implicits._
    // all four temp roots up front so one finally cleans them (review
    // finding: repeated runs were accumulating orphan directories)
    val batchDir = Files.createTempDirectory("ingest-batch").toString
    val streamDir = Files.createTempDirectory("ingest-stream").toString
    val ckpt = Files.createTempDirectory("ingest-ckpt").toString
    val outPath = Files.createTempDirectory("ingest-out").toString
    try {

    // ---- the corpus: the sf fixture plus one CONTROLLED duplicate pair
    // that straddles the restart boundary (one copy per ingest file), so
    // cross-restart dedup is exercised deterministically rather than
    // depending on where the fixture's own duplicates happen to fall.
    val fixture = graft.sources.Tables.documents(s, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val maxId = fixture.agg(max("doc_id")).head().getLong(0)
    val dupText = (1 to 25).map(i => s"ingest$i").mkString(" ") // passes the gate
    def synth(id: Long) = (id, dupText, "en", "synthetic", dupText.length)
    val synthA = synth(maxId + 1)
    val synthB = synth(maxId + 2)
    val extras = Seq(synthA, synthB)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val combined = fixture.unionByName(extras)

    // precondition that makes "streaming survivor == batch min-id
    // survivor" irrelevant to the compared artifact: every duplicate-text
    // group is lang-homogeneous (identical text already forces identical
    // n_tokens), so ANY survivor yields the same per-language report
    val mixedLangDups = combined.groupBy("text")
      .agg(countDistinct("lang").as("nl")).filter(col("nl") > 1).count()
    assert(mixedLangDups == 0, "fixture violates the lang-homogeneity precondition")

    // ---- batch side: the declared artifact over the combined corpus
    combined.write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    val batchArtifact = graft.SparkEntry.queries("q_curation_pipeline")(s, batchDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // ---- streaming side: same rows split into two ingest files, with a
    // synthetic event time (ts = epoch + id-derived seconds, range far
    // inside the 1-day horizon, so the watermark never drops a row and
    // dedup state spans the whole ingest — the batch-equivalence regime)
    def withTs(df: DataFrame): DataFrame =
      df.withColumn("ts", timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(10000L))))
    val splitId = maxId / 2
    withTs(fixture.filter(col("doc_id") <= splitId)
        .unionByName(Seq(synthA).toDF("doc_id", "text", "lang", "source", "n_chars")))
      .coalesce(1).write.parquet(s"$streamDir/a")
    val fileB = withTs(fixture.filter(col("doc_id") > splitId)
      .unionByName(Seq(synthB).toDF("doc_id", "text", "lang", "source", "n_chars")))

    val schema = s.read.parquet(s"$streamDir/a").schema
    import graft.operators.CorpusOps._
    def start() = s.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(streamDir)
      .qualityFiltered()
      .withColumn("n_tokens", TextFunctions.nTokens(col("text")).cast("long"))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("text")
      .select("doc_id", "lang", "n_tokens")
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outPath)
      .start()

    // run 1: only file A exists; its curated docs (incl. synthA) commit
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = s.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
    assert(afterRun1.contains(synthA._1) && !afterRun1.contains(synthB._1))
    assert(afterRun1.forall(id => id <= splitId || id == synthA._1))

    // run 2: file B lands, the query restarts FROM THE CHECKPOINT
    fileB.coalesce(1).write.parquet(s"$streamDir/b")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = s.read.parquet(outPath)
    val ids = out.select("doc_id").as[Long].collect()

    // exactly-once across the restart: no doc emitted twice
    assert(ids.length == ids.toSet.size, "duplicate emissions across restart")
    // the cross-restart duplicate was dropped by RECOVERED state: synthB's
    // text matched synthA's, first seen before the kill
    assert(!ids.contains(synthB._1), "dedup state did not survive the checkpoint")

    // and the composed artifact equals the batch curation report exactly
    val streamed = out.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchArtifact && batchArtifact.nonEmpty,
      s"streaming ingest artifact $streamed != batch artifact $batchArtifact")
    } finally
      Seq(batchDir, streamDir, ckpt, outPath).foreach(d => rm(new java.io.File(d)))
  }
}
