package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic main for the q_stream_join_hourly floor cost: prints each
  * micro-batch's duration breakdown and state-operator footprint so the
  * ~7 s bench time can be attributed (batch count × state-store count ×
  * per-store overhead, vs data volume — SCALE.md round 16). Not part of
  * any gate; run with
  * `sbt "runMain graft.tools.StreamJoinProbe /root/testdata/sf0.001"`. */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val parts = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.sources.Tables.streamEvents(
      spark, dir, graft.streaming.StreamGate.stagedEventsDir(dir))
    val p = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "0 seconds")
    val v = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "0 seconds")
    val agg = p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 30 minutes"))
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))

    val t0 = System.nanoTime()
    val q = agg.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory").queryName("join_probe")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROBE_CKPT_BASE",
            "/tmp")), "join-probe-ckpt").toString)
      .start()
    q.awaitTermination(600000L)
    val wall = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { pr =>
      println(s"[probe] batch=${pr.batchId} rows=${pr.numInputRows} " +
        s"durations=${pr.durationMs} " +
        s"stateOps=${pr.stateOperators.map(so => s"(rows=${so.numRowsTotal}, " +
          s"commitMs=${so.commitTimeMs}, mem=${so.memoryUsedBytes})").mkString("; ")}")
    }
    println(f"[probe] wall=$wall%.2f s, batches=${q.recentProgress.length}")
    spark.stop()
  }
}
