package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Bucketing = the persisted form of co-located joins: both sides written
  * with `bucketBy(n, key)` hash-partition their FILES by the join key, so
  * a later equi-join reads matching buckets pairwise and never shuffles
  * either side — at 100 TB this is the difference between re-shuffling a
  * fact table on every join and shuffling it once at write time. */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs with zero shuffle exchanges") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.orders(s, sfDir).write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(s, sfDir).write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

      val joined = s.table("b_orders")
        .join(s.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_mktsegment")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.count()
      val direct = Tables.orders(s, sfDir)
        .join(Tables.customer(s, sfDir), col("o_custkey") === col("c_custkey"))
        .count()
      assert(viaBuckets == direct)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
