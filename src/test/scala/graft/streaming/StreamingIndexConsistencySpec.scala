package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ComponentIndex

/** Closes the loop between the streaming ingest and the index layer
  * (round-10 verdict item 4): a corpus ingested INCREMENTALLY — through
  * the curation chain, across a checkpoint restart — then indexed by
  * the persisted component map must serve the exact same curation
  * report as the batch-curated corpus indexed the same way. I.e. the
  * 100 TB shape end to end: stream → curate → land parquet → build the
  * snapshot index → serve dashboards from the store, with restart
  * tolerance in the middle.
  *
  * Survivor identity differs between the two sides (streaming keeps the
  * first-arriving copy of a duplicate text, batch keeps the min-id
  * copy), so the compared artifact must be survivor-INVARIANT: the
  * report aggregates (lang, text, n_chars)-derived quantities only, and
  * the preconditions assert every duplicate-text group is homogeneous
  * in lang and n_chars — identical text forces identical tokens, so any
  * survivor yields the same report.
  */
class StreamingIndexConsistencySpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  test("streamed corpus's ComponentIndex-served report equals the batch one after restart") {
    val s = spark
    import s.implicits._
    val streamSrc = Files.createTempDirectory("idxcons-src").toString
    val ckpt = Files.createTempDirectory("idxcons-ckpt").toString
    val streamIdx = Files.createTempDirectory("idxcons-stream").toString
    val batchIdx = Files.createTempDirectory("idxcons-batch").toString
    try {
      val fixture = graft.sources.Tables.documents(s, sfDir)
        .select("doc_id", "text", "lang", "source", "n_chars")

      // survivor-invariance preconditions (see class doc)
      val inhomogeneous = fixture.groupBy("text")
        .agg(countDistinct("lang").as("nl"), countDistinct("n_chars").as("nc"))
        .filter(col("nl") > 1 || col("nc") > 1).count()
      assert(inhomogeneous == 0, "fixture violates dup-group homogeneity")

      // ---- batch side: curated corpus landed as a fixture dir
      import graft.operators.CorpusOps._
      fixture.qualityFiltered().dedupedExact()
        .write.mode("overwrite").parquet(s"$batchIdx/documents.parquet")

      // ---- streaming side: same rows in two ingest files with a
      // restart between them; the sink dir IS the corpus dir (the
      // parquet sink writes documents.parquet's part files directly)
      val maxId = fixture.agg(max("doc_id")).head().getLong(0)
      val splitId = maxId / 2
      def withTs(df: DataFrame): DataFrame =
        df.withColumn("ts",
          timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(10000L))))
      withTs(fixture.filter(col("doc_id") <= splitId))
        .coalesce(1).write.parquet(s"$streamSrc/a")
      val schema = s.read.parquet(s"$streamSrc/a").schema
      def start() = s.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(streamSrc)
        .qualityFiltered()
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("text")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", s"$streamIdx/documents.parquet")
        .start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      withTs(fixture.filter(col("doc_id") > splitId))
        .coalesce(1).write.parquet(s"$streamSrc/b")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      // the two landed corpora carry the same curated content
      // (survivor ids aside): equal (text, lang, n_chars) multisets
      def content(dir: String) = graft.sources.Tables.documents(s, dir)
        .groupBy("text", "lang", "n_chars").count()
        .collect().map(_.toSeq).toSet
      assert(content(streamIdx) == content(batchIdx) && content(streamIdx).nonEmpty)

      // ---- the index layer over each landed corpus, serving the report
      def servedReport(dir: String) = graft.operators.CacheScope.withOperatorCaches {
        graft.SparkEntry.queries("q_corpus_report_indexed")(s, dir)
          .collect().map(_.toSeq).toSet
      }
      val streamed = servedReport(streamIdx)
      val batch = servedReport(batchIdx)
      assert(streamed == batch && streamed.nonEmpty,
        s"served report diverges: streamed=$streamed batch=$batch")
    } finally {
      ComponentIndex.drop(s, streamIdx)
      ComponentIndex.drop(s, batchIdx)
      Seq(streamSrc, ckpt, streamIdx, batchIdx).foreach(d => rm(new java.io.File(d)))
    }
  }
}
