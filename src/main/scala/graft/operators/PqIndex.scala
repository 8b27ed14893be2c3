package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.PqExpressions

/** The PERSISTED form of the trained IVFADC index — the artifact that
  * actually fits in memory at corpus scale: alongside [[IvfIndex]]'s
  * bucketed (vec_id, embedding, cell) table, this materializes
  *
  *  - `<stem>_pq_codes`: (vec_id, cell, codes) BUCKETED BY cell — 8 bytes
  *    of code payload per vector instead of 512 bytes of floats. At 100 TB
  *    of embeddings this table is ~1.6 TB: the difference between an ADC
  *    shortlist stage that runs from cluster memory and one that doesn't
  *    (Jegou et al. 2011's operating point).
  *  - `<stem>_pq_codebook`: (m, c, cvec) — M x C rows of model state, read
  *    back to build per-query lookup tables.
  *
  * Serving reads codes, never encodes: the resident corpus's residuals
  * are computed ONCE at index-build time ([[Pq.trainResidualForFixture]]'s
  * codebook, [[IvfIndex]]'s trained centroids — the two stages share one
  * k-means run per fixture, so index and probes can never disagree).
  * Probe cost is #queries x NProbe cells of code rows for the ADC stage,
  * plus #queries x R id-fetched vectors from the cells table for the
  * exact re-rank — both independent of corpus size
  * (q_sim_ivf_pq_trained's per-invocation training is the honest
  * per-query cost; this is the honest per-PIPELINE cost, the same split
  * as q_sim_ivf_kmeans vs q_sim_ivf_indexed).
  */
object PqIndex {

  private def stem(dir: String): String =
    "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build (or load) the code + codebook tables for the fixture; returns
    * (codesTable, cellsTable, coarse centroids, codebook). */
  def ensure(spark: SparkSession, dir: String)
      : (String, String, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val (cellsT, cents) = IvfIndex.ensureIndex(spark, dir)
    val codesT = s"${stem(dir)}_pq_codes"
    val cbT = s"${stem(dir)}_pq_codebook"
    if (!spark.catalog.tableExists(codesT) || !spark.catalog.tableExists(cbT)) {
      // same orphaned-warehouse-location hygiene as IvfIndex.ensureIndex
      Seq(codesT, cbT).foreach { t =>
        if (!spark.catalog.tableExists(t)) {
          val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          val loc = new java.io.File(wh, t.toLowerCase)
          if (loc.exists()) rm(loc)
        }
      }
      val e = graft.sources.Tables.embeddings(spark, dir)
      val cb = Pq.trainResidualForFixture(e, dir)
      // encode every resident vector's coarse residual once; the cells
      // table already carries the assignment, so reuse it rather than
      // recomputing the K dot products per row
      spark.table(cellsT)
        .select(col("vec_id"), col("cell"),
          PqExpressions.pq_encode(
            graft.functions.expressions.VectorExpressions
              .centroid_residual(col("embedding"), col("cell"), cents),
            cb).as("codes"))
        .write.mode("overwrite")
        .bucketBy(8, "cell").sortBy("cell")
        .saveAsTable(codesT)
      import spark.implicits._
      cb.zipWithIndex.flatMap { case (codes, m) =>
        codes.zipWithIndex.map { case (v, c) => (m, c, v) }
      }.toSeq.toDF("m", "c", "cvec")
        .write.mode("overwrite").saveAsTable(cbT)
    }
    (codesT, cellsT, cents, loadCodebook(spark, cbT))
  }

  private def loadCodebook(spark: SparkSession, cbT: String): Array[Array[Array[Double]]] = {
    val rows = spark.table(cbT).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val c = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Double]](m, c)
    rows.foreach { case (mi, ci, v) => cb(mi)(ci) = v }
    cb
  }

  /** Incremental ingest, paired with [[IvfIndex.append]]: the batch is
    * assigned to the existing centroids, appended to the cells table, and
    * its codes (encoded against the existing codebook) appended to the
    * codes table — both tables stay in sync at batch cost, model state
    * stays fixed, so append order never changes any probe's answer
    * (spec-pinned: append == rebuild-with-same-model). The retrain signal
    * is the same cell-occupancy skew check as the coarse index's. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val (codesT, _, cents, cb) = ensure(spark, dir)
    IvfIndex.append(spark, dir, batch, idCol, vecCol)
    batch
      .select(col(idCol).as("vec_id"),
        SimilarityIVF.cell(col(vecCol), cents).as("cell"), col(vecCol).as("v"))
      .select(col("vec_id"), col("cell"),
        PqExpressions.pq_encode(
          graft.functions.expressions.VectorExpressions
            .centroid_residual(col("v"), col("cell"), cents),
          cb).as("codes"))
      .write.mode("append")
      .bucketBy(8, "cell").sortBy("cell")
      .saveAsTable(codesT)
  }

  /** ADC top-k from the STORED codes: the candidate side is a scan of the
    * bucketed codes table — no residual, no encode, no vector anywhere on
    * the candidate path. Same result as
    * [[Pq.ivfAdcResidualTopK]] with the fixture-trained model
    * (spec-pinned), at index-read cost. */
  def probe(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
            idColQ: String = "vec_id", vecCol: String = "embedding",
            candidatePred: Column = lit(true)): DataFrame = {
    val (codesT, _, cents, cb) = ensure(spark, dir)
    val q = broadcast(queries
      .select(col(idColQ).as("query_id"),
              PqExpressions.pq_lut(col(vecCol), cb).as("lut"),
              explode(SimilarityIVF.probeCellsWithDot(col(vecCol), cents)).as("pc"))
      .select(col("query_id"), col("lut"),
              col("pc.cell").as("cell"), col("pc.cdot").as("cdot")))
    val c = spark.table(codesT).filter(candidatePred)
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes"))
    Pq.topKTail(c.join(q, Seq("cell"))
      .withColumn("score",
        col("cdot") + PqExpressions.pq_adc(col("lut"), col("codes"))), k)
  }

  /** The full persisted serving funnel: stored-code ADC shortlist of R,
    * exact-cosine re-rank to top-k with true vectors id-fetched from the
    * cells table. */
  def probeRerank(spark: SparkSession, dir: String, queries: DataFrame,
                  k: Int, r: Int,
                  idColQ: String = "vec_id", vecCol: String = "embedding",
                  candidatePred: Column = lit(true)): DataFrame = {
    val (_, cellsT, _, _) = ensure(spark, dir)
    val shortlist = probe(spark, dir, queries, r, idColQ, vecCol, candidatePred)
    Pq.exactRerank(queries,
      spark.table(cellsT).filter(candidatePred), shortlist, k,
      idColQ, "vec_id", vecCol)
  }
}
