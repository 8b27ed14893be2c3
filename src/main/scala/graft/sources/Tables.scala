package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference engine's only source is an in-memory parallel collection
  * (`/root/reference/src/main/scala/Main.scala:22`,
  * `SplittableIteratorFromSeqs.scala:8-15`); our engine's primary source is
  * columnar Parquet read through Spark's vectorized reader, which at 100 TB
  * is the right substrate: predicate pushdown, column pruning and partition
  * pruning all happen at the scan.
  *
  * Scale note: at cluster scale these reads are directory-partitioned; a
  * `local[32]` test reads a single file. Nothing here hard-codes
  * parallelism — Spark splits files by `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** The testdata's timestamp columns are parquet TIMESTAMP(MICROS)
    * without the adjusted-to-UTC flag, which Spark 4 infers as
    * TIMESTAMP_NTZ. Every engine surface (watermarks, window(), the
    * DuckDB oracles, specs reading `getTimestamp`) is defined over
    * session-UTC `TimestampType`, so normalize HERE — one load-time cast
    * (wall-clock-preserving under the UTC session timezone) instead of a
    * per-builder parquet-inference conf that external callers could miss. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark does not model;
    * read it as a nanos long (legacy conf, set here so callers need not
    * care) and convert to microsecond TimestampType. The sub-microsecond
    * digits are zero in the testdata, and the DuckDB oracles cast to
    * microsecond TIMESTAMP identically. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }

  /** The single definition of the ns→µs conversion (also applied by the
    * streaming file-source path): guarded on the column type so a move of
    * the testdata to native TIMESTAMP(MICROS) is absorbed here, not in
    * every caller. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
