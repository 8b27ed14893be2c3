package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the AQE-era companion to static
  * predicate pushdown: when a fact-fact join's build side carries a
  * selective filter, Catalyst's InjectRuntimeFilter plants a
  * `might_contain(bloom_filter_agg(build_keys), probe_key)` predicate on
  * the PROBE side's scan, so fact rows that cannot join are dropped at
  * the scan instead of surviving to the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~join-selectivity fraction of it.
  *
  * The thresholds exist for production sizes (probe side must be large
  * enough to be worth a bloom pass); the spec lowers them to observe the
  * mechanism at fixture scale — the same knob a real deployment tunes.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective build side injects a bloom filter on the probe scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force shuffle joins (runtime filters only apply to them — a
      // broadcast join already prunes at the probe via the build's keys)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture-scale thresholds: any build side may create, any probe
      // side qualifies
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val li = graft.sources.Tables.lineitem(spark, sfDir)
      val orders = graft.sources.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom-filter predicate on the probe side:\n$optimized")

      // the filtered result is unchanged by the injected filter
      assert(joined.collect().length == 1)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
