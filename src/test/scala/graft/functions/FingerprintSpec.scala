package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The codegen RollingHashExpression must be bit-equal to the functions-API
  * fold it replaced (fingerprintHof) — the HOF formulation is the executable
  * spec of the fingerprint semantics the DuckDB oracle replays. */
class FingerprintSpec extends SparkSpec {

  test("codegen fingerprint equals the HOF fold on the real corpus") {
    val diff = Tables.documents(spark, sfDir)
      .select(
        TextFunctions.fingerprint(col("text")).as("fast"),
        TextFunctions.fingerprintHof(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
              col("fast").isNull =!= col("slow").isNull)
      .count()
    assert(diff == 0L)
  }

  test("codegen fingerprint equals the HOF fold on edge cases") {
    val s = spark
    import s.implicits._
    // empty, single char, ascii word, multi-byte (fallback path), mixed
    val rows = Seq("", "a", "ab", "hello world", "héllo ∑", "日本語 text")
      .toDF("text")
      .select(
        col("text"),
        TextFunctions.fingerprint(col("text")).as("fast"),
        TextFunctions.fingerprintHof(col("text")).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for ${r.getString(0)}")
    }
    // spot-check one value against the hand-computed fold: "ab" ->
    // (0*31+97)*31+98 = 3105 (matches DuckDB's list_reduce replay).
    assert(rows.find(_.getString(0) == "ab").get.getLong(1) == 3105L)
  }
}
