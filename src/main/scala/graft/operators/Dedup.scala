package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale design: every variant avoids the O(n²) all-pairs trap —
  *  - exact: hash-groupBy on content (one shuffle keyed by the content
  *    hash; at 100 TB, group by a 64-bit content hash instead of the full
  *    text so shuffle rows are ~16 bytes);
  *  - n-gram Jaccard: inverted-index self-join on shingles (candidate pairs
  *    only materialize for documents sharing at least one shingle —
  *    the standard explode/join candidate generation);
  *  - MinHash-LSH (see [[MinHashLSH]]): constant-size signatures + banding
  *    so candidate generation is a join on (band, bandHash) buckets.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct value of `keyCols`,
    * carrying the canonical (minimum) id and the multiplicity. */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")

  /** Distinct word n-gram (shingle) set per document; empty for documents
    * shorter than n tokens (guard needed because Spark's `sequence(1, stop)`
    * DESCENDS when stop < 1 instead of producing an empty array). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard, generated via an
    * inverted-index join on shingles blocked by `blockCol` (e.g. language).
    *
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|); the intersection size is the join
    * match count, so no document pair that shares zero shingles is ever
    * materialized. The final division is one exact int/int IEEE op.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"), col(blockCol).as("block"),
                       shingles(col(textCol), n).as("grams"))
    val sizes = sh.select(col("doc_id"), size(col("grams")).as("sz"))
    val inv = sh.select(col("doc_id"), col("block"), explode(col("grams")).as("gram"))
    val pairs = inv.as("a")
      .join(inv.as("b"),
            col("a.gram") === col("b.gram") && col("a.block") === col("b.block") &&
              col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
