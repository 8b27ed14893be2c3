package graft.functions

import graft.SparkSpec

/** SQL surface of the custom Catalyst pieces registered through
  * GraftExtensions (dot_product scalar, top_k bounded-heap aggregate),
  * and equivalence of the heap-aggregate top-k with the window-rank
  * formulation it replaces.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("dot_product is callable from SQL and matches manual computation") {
    val s = spark
    val r = s.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // float arrays promote per-element
    val rf = s.sql(
      "SELECT dot_product(array(CAST(0.5 AS FLOAT), CAST(1.5 AS FLOAT)), array(2.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(rf == 0.5 * 2.0 + 1.5 * 4.0)
  }

  test("rolling_hash is callable from SQL and matches the column function") {
    val s = spark
    // "ab" -> (0*31+97)*31+98 = 3105
    assert(s.sql("SELECT rolling_hash('ab') AS h").head().getLong(0) == 3105L)
    val diff = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("rolling_hash(text) AS a", "text").select(
        org.apache.spark.sql.functions.col("a"),
        TextFunctions.fingerprint(org.apache.spark.sql.functions.col("text")).as("b"))
      // null-safe: a plain <> filter would silently drop null-vs-value rows
      .filter("NOT (a <=> b)").count()
    assert(diff == 0L)
  }

  test("z_order is callable from SQL and matches the kernel") {
    val s = spark
    // interleave(5, 3) = interleave(0b101, 0b011) = 0b011011 +
    //   shifted: even bits from x=101 -> 010001? compute via the kernel
    assert(s.sql("SELECT z_order(5L, 3L) AS z").head().getLong(0) ==
      graft.functions.expressions.ZOrder.zkey(5L, 3L))
    // matches the Column API over a table
    val diff = s.range(1000).selectExpr("z_order(id, id * 7) AS a", "id")
      .select(org.apache.spark.sql.functions.col("a"),
        graft.functions.expressions.ZOrderExpression.z_order(
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("id") * 7).as("b"))
      .filter("NOT (a <=> b)").count()
    assert(diff == 0L)
  }

  test("span_hashes is callable from SQL and matches the column function") {
    val s = spark
    // element 0 of w=2 spans of "a b c" == hash60("a b")
    assert(s.sql("SELECT span_hashes(split('a b c', ' '), 2)[0] AS h")
      .head().getLong(0) == graft.functions.PortableHash.hash60String("a b"))
    // null elements skip with their separator — array_join's contract —
    // instead of NPE-ing on SQL-surface arrays
    assert(s.sql(
        "SELECT span_hashes(array('a', CAST(NULL AS STRING), 'b'), 3)[0] AS h")
      .head().getLong(0) == graft.functions.PortableHash.hash60String("a b"))
    val diff = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("span_hashes(split(text, ' '), 3) AS a", "text")
      .select(org.apache.spark.sql.functions.col("a"),
        graft.functions.expressions.SpanHash.span_hashes(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "), 3).as("b"))
      .filter("NOT (a <=> b)").count()
    assert(diff == 0L)
  }

  test("winnow_hashes is callable from SQL and matches the column function") {
    val s = spark
    // 5 tokens, w=2 -> 4 span hashes; k=3 -> 2 window minima
    val row = s.sql(
      "SELECT winnow_hashes(split('a b c d e', ' '), 2, 3) AS hs").head()
    val spans = Seq("a b", "b c", "c d", "d e")
      .map(graft.functions.PortableHash.hash60String)
    assert(row.getSeq[Long](0) ==
      Seq(spans.slice(0, 3).min, spans.slice(1, 4).min))
  }

  test("bpe_count is callable from SQL and matches the column function") {
    val s = spark
    val diff = graft.sources.Tables.documents(s, sfDir)
      .selectExpr("bpe_count(text) AS a", "text")
      .select(org.apache.spark.sql.functions.col("a"),
        graft.functions.expressions.BpeCountExpression.bpe_count(
          org.apache.spark.sql.functions.col("text")).as("b"))
      .filter("NOT (a <=> b)").count()
    assert(diff == 0L)
  }

  test("top_k SQL aggregate returns (score desc, id asc) bounded arrays") {
    val s = spark
    s.sql(
      """SELECT * FROM VALUES
        |  (1L, 0.9D, 10L), (1L, 0.9D, 7L), (1L, 0.5D, 1L), (1L, 0.95D, 3L),
        |  (2L, 0.1D, 5L)
        |AS t(g, score, id)""".stripMargin).createOrReplaceTempView("scores")
    val rows = s.sql(
      "SELECT g, top_k(score, id, 2) AS tk FROM scores GROUP BY g ORDER BY g")
      .collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(g1 == Seq((0.95, 3L), (0.9, 7L)), s"ties break by id asc: $g1")
    val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(g2 == Seq((0.1, 5L)))
  }

  test("space_saving_topk SQL aggregate counts exactly under capacity") {
    val s = spark
    s.sql(
      """SELECT * FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('b'), ('c')
        |AS t(term)""".stripMargin).createOrReplaceTempView("terms")
    // capacity 8 > 3 distinct terms: the sketch degenerates to exact
    // counting with zero error, whatever the arrival order
    val rows = s.sql(
      "SELECT space_saving_topk(term, 8, 2) AS hh FROM terms")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows == Seq(("a", 3L, 0L), ("b", 2L, 0L)),
      s"under-capacity sketch must be exact: $rows")
  }

  test("heap-aggregate topK equals the window-rank formulation") {
    val s = spark
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(s, sfDir)
    val q = e.filter(col("vec_id") < 5)
    val c = e.filter(col("vec_id") >= 5)

    val viaHeap = graft.operators.Similarity.topK(q, c, k = 7)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val scored = c.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))))
      .withColumn("score", graft.operators.Similarity.cosine(col("q_vec"), col("c_vec")))
    val viaRank = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 7)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(viaHeap == viaRank)
  }
}
