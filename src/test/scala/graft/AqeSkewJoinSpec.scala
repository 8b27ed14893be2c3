package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Join-skew evidence (SCALE.md): aggregation skew is handled explicitly
  * (q_keyed_count_salted), JOIN skew is delegated to AQE's runtime
  * re-plan — this spec demonstrates that delegation actually fires, by
  * building a sort-merge join whose hot key dwarfs the median partition
  * and asserting the FINAL adaptive plan ran the join as a skew join
  * (hot partition split into sub-partitions, cold side replicated).
  * Thresholds are lowered to make a ~20 MB hot partition "skewed" at test
  * scale; at 100 TB the defaults (256 MB advisory / factor 5) play the
  * same role untouched. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime (isSkewJoin)") {
    val s = spark
    import s.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // a partition is skewed above max(threshold, factor * median): the
      // hot partition is ~20 MB, cold ones a few KB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // force the sort-merge path: a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // hot key 0 carries ~100k fat rows; 99 cold keys carry one each
      val left = s.range(110000).select(
        when($"id" < 100000L, 0L).otherwise($"id" % 100).as("k"),
        lpad($"id".cast("string"), 200, "0").as("pad"))
      val right = s.range(100).select(($"id" % 100).as("k"), lit(1L).as("w"))
      // length(pad) keeps the fat column alive through the join (column
      // pruning would otherwise slim the hot partition under the threshold)
      val agg = left.join(right, "k").agg(sum(length($"pad") * $"w"))
      agg.collect()
      val adaptive = agg.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no adaptive plan — AQE disabled?"))
      // the SMJ sits inside a materialized ShuffleQueryStage, which is a
      // LEAF to collect() — assert on the rendered final plan instead,
      // which nests through stages: SortMergeJoin(skew=true) plus the
      // skew-split shuffle read on the hot side
      val rendered = adaptive.executedPlan.toString
      assert(rendered.contains("SortMergeJoin(skew=true)"),
        s"expected a skew-split sort-merge join; final plan:\n$rendered")
      assert(rendered.contains("AQEShuffleRead coalesced and skewed") ||
             rendered.contains("AQEShuffleRead skewed"),
        s"expected a skewed shuffle read on the hot side; final plan:\n$rendered")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
