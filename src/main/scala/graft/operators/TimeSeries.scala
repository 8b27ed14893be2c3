package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series similarity over event streams: featurize each entity's
  * (ts, value) series with Piecewise Aggregate Approximation — the
  * standard fixed-dimension time-series sketch (Keogh et al. 2001) — then
  * rank similar series with the engine's existing similarity stack
  * (codegen dot products + bounded-heap top-k). PAA is what makes
  * variable-length, irregularly-sampled series comparable at scale: every
  * series becomes `buckets` exact bucket-means over the global time
  * range, one narrow pass + one (id, bucket)-keyed aggregate.
  *
  * Engine portability: bucket assignment is pure INTEGER arithmetic on
  * epoch-microseconds (`(t - tmin) * buckets div span` — `div`, not
  * float division: floor(double)/`//` disagree at quotient boundaries),
  * and bucket means use the fixed-point exact-sum device (x 2^20,
  * truncate, long-sum, divide back), so vectors — and therefore
  * similarity ranks — replay bit-identically in DuckDB.
  *
  * Scale: the time range is a 1-row aggregate (broadcast by
  * construction); bucketing is narrow; the means aggregate is map-side
  * combined and keyed by (series, bucket) — at 100 TB of events this is
  * one shuffle bounded by #series x buckets, and the similarity stage
  * inherits the ANN stack's economics (broadcast query set, bounded-heap
  * rank).
  */
object TimeSeries {

  val Buckets = 16
  private val Scale = 1048576.0 // 2^20

  /** One PAA vector per series: (series_id, paa array<double>) with
    * missing buckets as 0.0 (an empty stretch contributes no signal). */
  def paaVectors(events: DataFrame, idCol: String, tsCol: String,
                 valCol: String, buckets: Int = Buckets): DataFrame = {
    val rng = events.agg(
      min(unix_micros(col(tsCol))).as("tmin"),
      (max(unix_micros(col(tsCol))) + lit(1L)).as("tend"))
    val means = events.crossJoin(broadcast(rng))
      .select(col(idCol).as("series_id"), unix_micros(col(tsCol)).as("mu"),
              col("tmin"), col("tend"), col(valCol).as("v"))
      .select(col("series_id"),
        expr(s"((mu - tmin) * $buckets) div (tend - tmin)").cast("int").as("b"),
        col("v"))
      .groupBy("series_id", "b")
      .agg((sum((col("v") * Scale).cast("long").cast("decimal(38,0)"))
        .cast("double") / Scale / count(lit(1))).as("m"))
    means.groupBy("series_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("m")))).as("mm"))
      .select(col("series_id"),
        transform(sequence(lit(0), lit(buckets - 1)),
          i => coalesce(element_at(col("mm"), i), lit(0.0))).as("paa"))
  }
}
