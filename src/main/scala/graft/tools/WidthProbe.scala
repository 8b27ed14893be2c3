package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the planned partition widths the Spread probe sees
  * under the bench session shape. Run: sbt "runMain graft.tools.WidthProbe" */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("documents", "events", "lineitem", "embeddings")) {
      val df = graft.sources.Tables.load(s, dir, t)
      val n = df.rdd.getNumPartitions
      val sz = new java.io.File(s"$dir/$t.parquet").length()
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => df.select("*").rdd.getNumPartitions)
      val probeMs = (System.nanoTime() - t0) / 5e6
      println(f"$t%-12s bytes=$sz%10d plannedParts=$n%3d probe=$probeMs%.1f ms " +
        f"defaultParallelism=${s.sparkContext.defaultParallelism}")
    }
    s.stop()
  }
}
