package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PAA featurization semantics on hand-built series: bucket assignment,
  * exact bucket means, missing-bucket zeros, and that the similarity
  * stack ranks an identical-shape series first. */
class TimeSeriesSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("PAA vectors: bucket means with missing buckets as zero") {
    val s = spark
    import s.implicits._
    // 16 minutes [0, 16): with tend = last-micros + 1, bucket = minute
    // for all but the LAST event, which lands in its own bucket edge
    val events = (
      (0 until 16).map(m => (1L, ts(m), (m * 2).toDouble)) ++     // full series
      Seq((2L, ts(0), 10.0), (2L, ts(0), 20.0), (2L, ts(15), 40.0)) // sparse
    ).toDF("user_id", "ts", "value")
    val vecs = TimeSeries.paaVectors(events, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    // user 1: events at minute m map to bucket floor((m*60e6)*16/span);
    // span = 15 min + 1 us, so bucket(m) ~ m * 16/15 truncated — derive
    // expected from the same integer arithmetic instead of hand-waving
    val tmin = ts(0).getTime * 1000L
    val tend = ts(15).getTime * 1000L + 1
    def bucket(m: Int) = (((ts(m).getTime * 1000L - tmin) * 16) / (tend - tmin)).toInt
    val expected1 = Array.fill(16)(List.empty[Double])
      .zipWithIndex.map { case (_, b) =>
        (0 until 16).filter(bucket(_) == b).map(m => (m * 2).toDouble) }
      .map(vs => if (vs.isEmpty) 0.0 else vs.sum / vs.length)
    assert(vecs(1L) == expected1.toSeq)

    // user 2: bucket 0 mean = 15.0 (10 and 20), bucket 15 = 40, rest 0
    val v2 = vecs(2L)
    assert(v2.head == 15.0 && v2(15) == 40.0)
    assert((1 until 15).forall(i => v2(i) == 0.0))
  }

  test("similarity ranks the identical-shape series first") {
    val s = spark
    import s.implicits._
    val shape = (0 until 16).map(m => (m % 4 + 1).toDouble)
    val events = (
      shape.zipWithIndex.map { case (v, m) => (0L, ts(m), v) } ++       // query
      shape.zipWithIndex.map { case (v, m) => (10L, ts(m), v * 2) } ++  // same direction
      shape.zipWithIndex.map { case (v, m) => (11L, ts(15 - m), v) }    // reversed
    ).toDF("user_id", "ts", "value")
    val vecs = TimeSeries.paaVectors(events, "user_id", "ts", "value")
    val top = Similarity.topK(
        vecs.filter(col("series_id") < 5), vecs.filter(col("series_id") >= 5),
        k = 1, idColQ = "series_id", idColC = "series_id", vecCol = "paa")
      .select("neighbor_id").head().getLong(0)
    // cosine is scale-invariant: the doubled copy of the same shape beats
    // the reversed one
    assert(top == 10L, s"expected the same-shape series, got $top")
  }
}
