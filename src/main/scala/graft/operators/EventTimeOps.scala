package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation — the reference engine's core
  * operator chain (keyBy → timeWindow → incremental fold → emit-with-window-
  * bounds; `/root/reference/src/main/scala/Main.scala:24-27`,
  * `WindowAggregate.scala:22-37`).
  *
  * Spark-first realization: `groupBy(window(ts, width), key...)` compiles to a
  * partial (map-side) HashAggregate → shuffle on (window, key) → final
  * HashAggregate, which IS the reference's incremental-fold-plus-merge
  * (`WindowAggregate.zero/count/plus`) executed as vectorized whole-stage
  * codegen. Windows are epoch-aligned, half-open `[start, end)` in both
  * engines (`WindowAggregate.scala:36-37`).
  *
  * This also realizes the convenience API the reference wanted but abandoned
  * (commented-out extension at `package.scala:5-8`: "hide this ugly thing in
  * a nice util method in an implicit class").
  *
  * Scale: the only shuffle is the aggregation exchange itself, keyed on
  * (window, key) — higher cardinality than key alone, so skew on a hot key is
  * diluted across windows. Map-side partial aggregation bounds shuffle volume
  * at (#distinct (window,key) per task), not #events.
  */
object EventTimeOps {

  /** Flatten Spark's `window` struct into explicit bound columns so results
    * are plain relational rows (the reference prints start/end the same way,
    * `WindowAggregate.scala:15-18`). */
  private def flatten(grouped: DataFrame): DataFrame =
    grouped
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  implicit class EventTimeDataFrame(private val df: DataFrame) extends AnyVal {

    /** Count per key per tumbling event-time window — the reference's exact
      * query shape (`Main.scala:24-26`). */
    def countPerKeyPerWindow(tsCol: String, width: String, keyCols: String*): DataFrame = {
      val g = df
        .groupBy(window(col(tsCol), width) +: keyCols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      flatten(g).select((Seq("window_start", "window_end") ++ keyCols :+ "cnt").map(col): _*)
    }

    /** Generic Numeric fold per key per window (the reference's
      * `R: Numeric` generality, `WindowAggregate.scala:22-31`), here as
      * arbitrary Spark aggregate expressions. */
    def aggPerKeyPerWindow(tsCol: String, width: String, keyCols: Seq[String],
                           aggs: Column*): DataFrame = {
      val g = df
        .groupBy(window(col(tsCol), width) +: keyCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      flatten(g)
    }

    /** Batch analog of the event-time watermark gate (O3/O8): keep only rows
      * whose window has been passed by the given watermark — i.e. windows
      * that would have fired. Half-open windows fire when
      * `watermark >= window_end` (`README.md:19-21`). */
    def windowsFiredBy(tsCol: String, width: String, watermark: java.sql.Timestamp): DataFrame =
      df.filter(window(col(tsCol), width)("end") <= lit(watermark))
  }
}
