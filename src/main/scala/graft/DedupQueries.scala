package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Deduplication + similarity-search query surface (the training-data
  * pipeline extensions; SURVEY.md §7.5).
  */
object DedupQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: canonical id + multiplicity per distinct text.
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")),

    // Exact dedup on the event stream by natural key (event_id is the
    // reference's `Pageview.eventId` analog, added "precisely to enable"
    // dedup — Pageview.scala:11).
    "q_dedup_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))),

    // Near-dup candidate pairs by exact word-3-gram Jaccard via the
    // inverted-index shingle join, blocked by language.
    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", "lang", n = 3, threshold = 0.3)),

    // Embedding near-dup pairs: exact cosine over label-blocked pairs.
    "q_dedup_embedding" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
        .filter(col("cos") >= 0.3)
        .select("id_a", "id_b")
    }),

    // Brute-force cosine top-k: 10 query vectors against the rest.
    "q_sim_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.topK(
          e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 10)
        .select("query_id", "neighbor_id", "rank")
    }))

  /** Explicit sequential-fold dot product in DuckDB SQL — element order and
    * double promotion identical to [[Similarity.dot]], so scores are
    * bit-equal between engines. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, len($a)+1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  private def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)}) / sqrt((${sqlDot(a, a)}) * (${sqlDot(b, b)}))"

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    "q_dedup_events" ->
      """SELECT event_type, count(*) AS cnt FROM (
        |  SELECT event_type, row_number() OVER (PARTITION BY event_id) AS rn
        |  FROM events) WHERE rn = 1
        |GROUP BY event_type""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_distinct(
        |    list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2]))) AS gram
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.lang = b.lang
        |                    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n AS DOUBLE)/(sa.sz + sb.sz - n) AS jaccard
        |FROM inter
        |JOIN sizes sa ON id_a = sa.doc_id
        |JOIN sizes sb ON id_b = sb.doc_id
        |WHERE CAST(n AS DOUBLE)/(sa.sz + sb.sz - n) >= 0.3""".stripMargin,

    "q_dedup_embedding" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${sqlCosine("a.embedding", "b.embedding")} >= 0.3""".stripMargin,

    "q_sim_topk" ->
      s"""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCosine("q.embedding", "c.embedding")} DESC,
         |               c.vec_id ASC) AS rank
         |  FROM embeddings q CROSS JOIN embeddings c
         |  WHERE q.vec_id < 10 AND c.vec_id >= 10)
         |WHERE rank <= 10""".stripMargin)
}
