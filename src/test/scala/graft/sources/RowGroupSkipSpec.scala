package graft.sources

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for the SCALE.md scan story beyond PushedFilters: row-group
  * skipping actually ENGAGING. The 100 TB claim is that a range predicate
  * on a sort-on-write column touches only the row groups whose min/max
  * straddle the range — so a day's query over a year's table reads ~1/365
  * of the bytes. PushedFilters in the plan only proves the predicate
  * REACHED the scan; this spec measures what the reader then does with
  * it, using the same parquet-mr statistics filter Spark's parquet scan
  * applies (`ParquetFileFormat` hands the pushed predicate to
  * `ParquetFileReader`'s row-group filter).
  *
  * Two fixtures, same rows, same predicate:
  *  - sorted-by-key write  -> min/max per group are tight ranges -> most
  *    groups provably cannot match -> SKIPPED
  *  - shuffled write       -> every group's [min,max] spans ~the whole
  *    domain -> statistics prune nothing -> all groups read
  * The delta is the sort-on-write payoff, measured not asserted.
  */
class RowGroupSkipSpec extends SparkSpec {

  private val Rows = 200000L
  // range predicate covering 5% of the key domain
  private val Lo = 100000L
  private val Hi = 110000L

  /** (total row groups, row groups surviving the stats filter, per-group
    * [min,max] of `k`) across every parquet part file in `dir`. */
  private def rowGroupStats(dir: String): (Int, Int, Seq[(Long, Long)]) = {
    val conf = new Configuration()
    val filter = FilterCompat.get(
      FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("k"), java.lang.Long.valueOf(Lo)),
        FilterApi.ltEq(FilterApi.longColumn("k"), java.lang.Long.valueOf(Hi))))
    val parts = new File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    var total = 0
    var kept = 0
    val ranges = Seq.newBuilder[(Long, Long)]
    parts.foreach { f =>
      val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
      // unfiltered open: every group + its column statistics
      val all = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
      try {
        all.getFooter.getBlocks.forEach { b =>
          total += 1
          val col = b.getColumns.get(0) // k is written first
          assert(col.getPath.toDotString == "k", s"expected column k first, got ${col.getPath}")
          val st = col.getStatistics
          assert(st != null && st.hasNonNullValue, "writer must emit min/max stats for k")
          ranges += ((st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
        }
      } finally all.close()
      // filtered open: parquet-mr's RowGroupFilter drops groups whose
      // stats prove no row can match — exactly Spark's scan-side path
      val filtered = ParquetFileReader.open(in,
        ParquetReadOptions.builder().withRecordFilter(filter).useStatsFilter(true).build())
      try kept += filtered.getRowGroups.size()
      finally filtered.close()
    }
    (total, kept, ranges.result())
  }

  private def writeFixture(dir: String, sorted: Boolean): Unit = {
    val base = spark.range(Rows).select(
      col("id").as("k"),
      // payload wide enough that 200k rows span many 64 KiB row groups
      concat_ws("-", lit("payload"), col("id"), md5(col("id").cast("string"))).as("v"))
    val ordered =
      if (sorted) base.orderBy("k")
      // deterministic shuffle: order by a hash so every row group's k
      // range spans ~the whole domain
      else base.orderBy(md5(col("k").cast("string")))
    ordered.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(dir)
  }

  test("range predicate on a sorted-write column skips most row groups; shuffled write skips none") {
    val sortedDir = "/tmp/graft_rowgroups/sorted"
    val shuffledDir = "/tmp/graft_rowgroups/shuffled"
    writeFixture(sortedDir, sorted = true)
    writeFixture(shuffledDir, sorted = false)

    // the predicate must reach the scan in Spark's own plan
    val q = spark.read.parquet(sortedDir).where(col("k").between(Lo, Hi))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,") && plan.contains("LessThanOrEqual(k,"),
      s"range predicate not pushed to the parquet scan:\n$plan")
    assert(q.count() == Hi - Lo + 1)

    val (totS, keptS, rangesS) = rowGroupStats(sortedDir)
    val (totH, keptH, _) = rowGroupStats(shuffledDir)
    assert(totS >= 10, s"fixture produced only $totS row groups — shrink parquet.block.size")

    // sorted write: groups are tight, disjoint k-ranges; only the ones
    // straddling [Lo,Hi] survive the stats filter
    val expectKeptS = rangesS.count { case (mn, mx) => mx >= Lo && mn <= Hi }
    assert(keptS == expectKeptS, s"stats filter kept $keptS, stats say $expectKeptS")
    assert(keptS * 4 <= totS,
      s"sorted write: expected >=75% of $totS groups skipped, only ${totS - keptS} were")

    // shuffled write: same stats machinery, nothing provably prunable
    assert(keptH == totH,
      s"shuffled write should skip nothing (kept $keptH of $totH) — " +
        "if this starts skipping, the fixture is no longer worst-case")

    info(s"sorted: $keptS/$totS row groups read (${totS - keptS} skipped); " +
      s"shuffled: $keptH/$totH read")
  }
}
