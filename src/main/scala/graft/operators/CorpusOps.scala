package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fluent corpus-pipeline API — the document-side counterpart of
  * [[EventTimeOps]]'s implicit class: a user composes the training-data
  * verbs (quality gate → dedup → analyze) as method chains instead of
  * assembling operator calls by hand. Every verb delegates to the same
  * declarative operators the declared queries use, so chains inherit their
  * plan shapes (narrow quality/analysis stages at the scan, content-keyed
  * dedup shuffle) unchanged.
  *
  * Example — the q_curation_pipeline query as a chain:
  * {{{
  *   docs.qualityFiltered().dedupedExact().tokenBudget("lang")
  * }}}
  */
object CorpusOps {

  /** The standard curation gate — single source of truth for the
    * thresholds used by qualityFiltered, q_curation_pipeline and the
    * streaming curation spec. */
  val MinTokens = 20
  val MaxTokens = 90
  val MinDistinctRatio = 0.2

  implicit class DocumentCorpus(private val df: DataFrame) extends AnyVal {

    /** Append token-count/quality columns (narrow, codegen'd). */
    def withTextStats(textCol: String = "text"): DataFrame =
      df.withColumn("n_tokens", TextFunctions.nTokens(col(textCol)))
        .withColumn("distinct_ratio",
          TextFunctions.nDistinctTokens(col(textCol)).cast("double") /
            col("n_tokens"))

    /** Keep documents passing the standard curation gate. */
    def qualityFiltered(minTokens: Int = MinTokens, maxTokens: Int = MaxTokens,
                        minDistinctRatio: Double = MinDistinctRatio,
                        textCol: String = "text"): DataFrame = {
      val t = TextFunctions.nTokens(col(textCol))
      df.filter(t.between(minTokens, maxTokens) &&
        (TextFunctions.nDistinctTokens(col(textCol)).cast("double") / t) >=
          minDistinctRatio)
    }

    /** One row per distinct text; all non-text columns taken from the
      * min-id row (deterministic survivor). */
    def dedupedExact(idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
      val others = df.columns.filter(_ != textCol).toSeq
      df.groupBy(col(textCol))
        .agg(min(struct(col(idCol) +: others.filter(_ != idCol).map(col): _*)).as("_c"))
        .select(col(textCol) +: others.map(c => col(s"_c.$c").as(c)): _*)
    }

    /** Per-group document and token budget — the curation report. */
    def tokenBudget(groupCol: String, textCol: String = "text"): DataFrame =
      df.groupBy(groupCol)
        .agg(count(lit(1)).as("n_docs"),
             sum(TextFunctions.nTokens(col(textCol)).cast("long")).as("total_tokens"))

    /** Append the codegen rolling-hash fingerprint. */
    def fingerprinted(textCol: String = "text"): DataFrame =
      df.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))

    /** MinHash-LSH near-dup candidate pairs (see [[MinHashLSH]]). */
    def minhashCandidates(idCol: String = "doc_id", textCol: String = "text",
                          blockCol: String = "lang"): DataFrame =
      MinHashLSH.candidatePairs(df, idCol, textCol, blockCol)

    /** Near-dup clusters: candidate pairs → connected components →
      * (id, component_id) with the min id as canonical. */
    def dedupClusters(idCol: String = "doc_id", textCol: String = "text",
                      blockCol: String = "lang"): DataFrame =
      ConnectedComponents.components(
        minhashCandidates(idCol, textCol, blockCol), "id_a", "id_b")
  }
}
