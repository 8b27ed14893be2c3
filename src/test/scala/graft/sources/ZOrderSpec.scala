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
import graft.functions.expressions.{ZOrder, ZOrderExpression}

/** The multi-dimensional companion to RowGroupSkipSpec: a ONE-column sort
  * makes min/max row-group pruning selective for its leading column and
  * useless for every other; sorting by the Z-ORDER interleave of two
  * columns buys balanced pruning on BOTH. Same rows, same predicates,
  * three layouts — the deltas are measured from the parquet footers, and
  * the box query is additionally pushed through parquet-mr's own stats
  * filter (the reader path Spark's scan uses) to prove the groups are
  * actually dropped, not just provably droppable.
  *
  * This is the layout story at 100 TB: a corpus clustered by
  * z_order(domain_bucket, date_bucket) serves both per-domain and
  * per-date scans from a single copy of the data, where a date-sorted
  * table reads ~everything for a domain query.
  */
class ZOrderSpec extends SparkSpec {

  private val Rows = 200000L
  private val Dom = 1024L // per-dimension domain [0, 1024)
  // slab predicates covering 1/16 of each dimension
  private val Lo = 0L
  private val Hi = 63L

  /** Per-group [min,max] of columns `x` (index 0) and `y` (index 1) from
    * the footers of every part file in `dir`. */
  private def groupRanges(dir: String): Seq[((Long, Long), (Long, Long))] = {
    val conf = new Configuration()
    val parts = new File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val out = Seq.newBuilder[((Long, Long), (Long, Long))]
    parts.foreach { f =>
      val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
      val r = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
      try {
        r.getFooter.getBlocks.forEach { b =>
          def mm(i: Int, name: String): (Long, Long) = {
            val c = b.getColumns.get(i)
            assert(c.getPath.toDotString == name, s"expected $name at $i, got ${c.getPath}")
            val st = c.getStatistics
            assert(st != null && st.hasNonNullValue, s"no stats for $name")
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
          out += ((mm(0, "x"), mm(1, "y")))
        }
      } finally r.close()
    }
    out.result()
  }

  private def intersects(r: (Long, Long)): Boolean = r._2 >= Lo && r._1 <= Hi

  /** Row groups surviving parquet-mr's stats filter for the 2-D box
    * predicate — the reader-side proof for the footer arithmetic. */
  private def keptByReader(dir: String): Int = {
    val conf = new Configuration()
    def range(c: String) = FilterApi.and(
      FilterApi.gtEq(FilterApi.longColumn(c), java.lang.Long.valueOf(Lo)),
      FilterApi.ltEq(FilterApi.longColumn(c), java.lang.Long.valueOf(Hi)))
    val filter = FilterCompat.get(FilterApi.and(range("x"), range("y")))
    new File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
      val r = ParquetFileReader.open(in,
        ParquetReadOptions.builder().withRecordFilter(filter).useStatsFilter(true).build())
      try r.getRowGroups.size() finally r.close()
    }.sum
  }

  /** 200k rows with two INDEPENDENT uniform dimensions (hash-derived, so
    * the fixture is deterministic), written in the given order. */
  private def writeFixture(dir: String, order: org.apache.spark.sql.Column): Unit =
    spark.range(Rows)
      .select(
        (conv(substring(md5(concat(lit("zx"), col("id"))), 1, 15), 16, 10)
          .cast("long") % Dom).as("x"),
        (conv(substring(md5(concat(lit("zy"), col("id"))), 1, 15), 16, 10)
          .cast("long") % Dom).as("y"),
        md5(col("id").cast("string")).as("v"))
      .orderBy(order)
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(dir)

  test("z-order layout prunes row groups on BOTH dimensions; one-column sort only on its own") {
    val xDir = "/tmp/graft_zorder/sort_x"
    val zDir = "/tmp/graft_zorder/sort_z"
    writeFixture(xDir, col("x"))
    writeFixture(zDir, ZOrderExpression.z_order(col("x"), col("y")))

    // same data either way
    val nx = spark.read.parquet(xDir).where(col("y").between(Lo, Hi)).count()
    val nz = spark.read.parquet(zDir).where(col("y").between(Lo, Hi)).count()
    assert(nx == nz && nx > 0)

    val rx = groupRanges(xDir)
    val rz = groupRanges(zDir)
    assert(rx.size >= 20, s"only ${rx.size} row groups — shrink parquet.block.size")

    val xSortKeptX = rx.count(g => intersects(g._1))
    val xSortKeptY = rx.count(g => intersects(g._2))
    val zSortKeptX = rz.count(g => intersects(g._1))
    val zSortKeptY = rz.count(g => intersects(g._2))

    // one-column sort: selective on x, blind on y (every group's y-range
    // spans ~the whole domain)
    assert(xSortKeptX * 4 <= rx.size,
      s"x-sort should skip >=75% for the x-slab (kept $xSortKeptX/${rx.size})")
    assert(xSortKeptY == rx.size,
      s"x-sort should prune NOTHING for the y-slab (kept $xSortKeptY/${rx.size})")

    // z-order: balanced pruning on both dimensions (the curve fragments a
    // 1/16 slab into quadtree cells ~1/8 of groups touch)
    assert(zSortKeptX * 2 <= rz.size,
      s"z-sort should skip >=50% for the x-slab (kept $zSortKeptX/${rz.size})")
    assert(zSortKeptY * 2 <= rz.size,
      s"z-sort should skip >=50% for the y-slab (kept $zSortKeptY/${rz.size})")

    // 2-D box on the z layout: both stats combine — and parquet-mr's own
    // reader-side stats filter (Spark's scan path) agrees with the footer
    // arithmetic
    val boxStats = rz.count(g => intersects(g._1) && intersects(g._2))
    val boxReader = keptByReader(zDir)
    assert(boxReader == boxStats,
      s"reader kept $boxReader groups, footer stats say $boxStats")
    assert(boxStats * 4 <= rz.size,
      s"z-sort box query should skip >=75% (kept $boxStats/${rz.size})")

    info(s"groups=${rx.size}: x-sort kept x-slab $xSortKeptX / y-slab $xSortKeptY; " +
      s"z-sort kept x-slab $zSortKeptX / y-slab $zSortKeptY / box $boxStats (reader $boxReader)")
  }

  test("zkey matches the bit-by-bit reference on full-range longs") {
    def reference(x: Long, y: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextLong(); val y = rnd.nextLong()
      assert(ZOrder.zkey(x, y) == reference(x, y), s"mismatch at ($x, $y)")
    }
    // monotone locality sanity: within an aligned 2x2 cell the four keys
    // are consecutive
    assert(Seq(ZOrder.zkey(4, 6), ZOrder.zkey(5, 6), ZOrder.zkey(4, 7),
      ZOrder.zkey(5, 7)).sorted == Seq.tabulate(4)(ZOrder.zkey(4, 6) + _))
  }
}
