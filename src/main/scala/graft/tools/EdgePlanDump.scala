package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ComponentIndex, MinHashLSH}
import graft.sources.Tables

/** Dev-only plan evidence for the corpus-dedup maintenance queries: their
  * FINAL plans collapse to the clustering checkpoint's ExistingRDD
  * (ConnectedComponents runs eagerly), so the optimization-relevant
  * subtree — the edge relation fed INTO the clustering — never appears in
  * a PlanDump of the query itself. This main explains that subtree for
  * q_corpus_dedup_edited / q_corpus_dedup_merged so the plans/rNN
  * evidence can show the persisted-store scan replacing the corpus-side
  * shingle+minhash recompute (round-20 verdict item 2).
  *
  * Run: sbt "runMain graft.tools.EdgePlanDump <outDir> <suffix>"
  */
object EdgePlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: EdgePlanDump <outDir> <suffix>")
    val Array(outDir, suffix) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[edgeplandump] wrote $outDir/${name}_$suffix.txt")
    }
    val docs = Tables.documents(s, dir)

    // q_corpus_dedup_edited's pre-clustering edge union, mirroring the
    // query body (DedupQueries) + ComponentIndex.editedFromBanded.
    locally {
      val isRemoved = pmod(col("doc_id"), lit(20L)) === 3L
      val isRewritten = pmod(col("doc_id"), lit(20L)) === 11L
      val baseMap = ComponentIndex.componentsFor(s, dir)
      val baseBanded = ComponentIndex.bandedFor(s, dir)
      val removedIds = docs.filter(isRemoved || isRewritten).select("doc_id")
      val added = docs.filter(isRewritten)
        .withColumn("text", concat(col("text"), lit(" "), col("text")))
      val liveStore = baseBanded.join(removedIds, Seq("doc_id"), "left_anti")
      val batchBanded = ComponentIndex.bandedSignatures(added)
      val affComps = baseMap.join(removedIds, Seq("doc_id"), "left_semi")
        .select("component_id").distinct()
      val affMembers = baseMap.join(affComps, Seq("component_id"), "left_semi")
      val affPairs = MinHashLSH.candidatesFromBanded(
        liveStore.join(affMembers.select("doc_id"), Seq("doc_id"), "left_semi"))
      val unaffEdges = baseMap.join(affComps, Seq("component_id"), "left_anti")
        .filter(col("doc_id") =!= col("component_id"))
        .select(col("doc_id").as("id_a"), col("component_id").as("id_b"))
      val internal = MinHashLSH.candidatesFromBanded(batchBanded)
      val cross = ComponentIndex.crossCandidates(liveStore, batchBanded)
      dump("q_corpus_dedup_edited_edges",
        affPairs.unionByName(unaffEdges).unionByName(internal)
          .unionByName(cross))
    }

    // q_corpus_dedup_merged's pre-clustering inputs: the base candidate
    // set (feeds the live base-map clustering) over the store scan.
    locally {
      val baseBanded = ComponentIndex.bandedFor(s, dir)
        .filter(col("doc_id") % 10 =!= 0)
      dump("q_corpus_dedup_merged_base_candidates",
        MinHashLSH.candidatesFromBanded(baseBanded))
    }
    s.stop()
  }
}
