package graft.operators

import graft.SparkSpec

/** The round-19 scan-spreading + footer-metadata contracts:
  *
  *  - [[Spread]] must widen a narrow (single-row-group) scan to the
  *    cluster's parallelism WITHOUT changing its rows, and must be a
  *    NO-OP on a frame that is already at least half as wide as the
  *    cluster — the condition that keeps it from injecting a
  *    full-corpus shuffle at production scan widths;
  *  - [[ParquetFooter.rowCount]] must agree with `df.count()` for both
  *    layouts the fixture state machines read (a single parquet file
  *    and a Spark-written directory of part files), since the state
  *    machines' entry decisions now ride on it. */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("Spread widens a narrow scan to defaultParallelism, rows unchanged") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assume(docs.rdd.getNumPartitions * 2 <=
      spark.sparkContext.defaultParallelism,
      "fixture scan must be narrow for this test to bite")
    val spreadK = Spread.byKey(docs, "doc_id")
    val spreadR = Spread.any(docs)
    assert(spreadK.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(spreadR.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // content identical (order-insensitive)
    assert(spreadK.orderBy("doc_id").collect()
      .sameElements(docs.orderBy("doc_id").collect()))
  }

  test("Spread is a no-op on an already-wide frame") {
    val n = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).repartition(n).toDF("doc_id")
    assert(Spread.byKey(wide, "doc_id") eq wide)
    assert(Spread.any(wide) eq wide)
  }

  test("plan-free width probe decides like the physical probe on scan-rooted frames") {
    val target = spark.sparkContext.defaultParallelism
    // single-file fixture scans (narrow), with and without narrow ops on top
    val frames = Seq(
      graft.sources.Tables.documents(spark, sfDir),
      graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text").filter($"doc_id" > 10),
      graft.sources.Tables.lineitem(spark, sfDir))
    frames.foreach { df =>
      val fast = Spread.byKey(df, df.columns.head)
      val physicalNarrow = df.rdd.getNumPartitions * 2 <= target
      // the fast path must fire the repartition exactly when the
      // physical probe would have
      assert((fast ne df) == physicalNarrow)
    }
    // a multi-file directory exercises the packing arm
    val dir = java.nio.file.Files.createTempDirectory("spread-width")
    try {
      spark.range(1000).toDF("doc_id").repartition(5)
        .write.mode("overwrite").parquet(dir.toString)
      val df = spark.read.parquet(dir.toString)
      val fast = Spread.byKey(df, "doc_id")
      assert((fast ne df) == (df.rdd.getNumPartitions * 2 <= target))
    } finally graft.streaming.StreamGate.deleteRecursively(dir)
  }

  test("ParquetFooter.rowCount matches df.count for file and directory layouts") {
    val file = s"$sfDir/documents.parquet"
    val expected = spark.read.parquet(file).count()
    assert(ParquetFooter.rowCount(file) == expected)
    val dir = java.nio.file.Files.createTempDirectory("footer-spec")
    try {
      // Spark-written dir: several part files plus a _SUCCESS marker
      spark.read.parquet(file).repartition(3)
        .write.mode("overwrite").parquet(dir.toString)
      assert(ParquetFooter.rowCount(dir.toString) == expected)
      // append lands more part files — the count must track them (the
      // ingest fixtures' staleness handshake rides on this)
      spark.read.parquet(file).limit(7)
        .write.mode("append").parquet(dir.toString)
      assert(ParquetFooter.rowCount(dir.toString) == expected + 7)
    } finally graft.streaming.StreamGate.deleteRecursively(dir)
  }
}
