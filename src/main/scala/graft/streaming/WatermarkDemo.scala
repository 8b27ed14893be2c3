package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.PageviewGen

/** Runnable replica of the reference program (`Main.scala:9-30`): two
  * event-time-skewed pageview partitions, per-partition watermarks, hash
  * repartition by url, 1h tumbling windows, count fold, append emission to
  * console, plus execution-plan introspection (O9/O10 in SURVEY.md §2).
  *
  * `sbt "runMain graft.streaming.WatermarkDemo [stepMillis]"` — default step
  * 60000 (1 event/minute; the reference used 1000 = 1/second).
  */
object WatermarkDemo {
  def main(args: Array[String]): Unit = {
    val step = args.headOption.map(_.toLong).getOrElse(60000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-watermark-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val (p0, p1) = PageviewGen.skewedPartitions(step)
    val m1 = MemoryStream[graft.model.Pageview]
    val m2 = MemoryStream[graft.model.Pageview]
    val counts = WatermarkPipeline.windowedCounts(Seq(m1.toDS(), m2.toDS()))

    // O10: plan introspection (the reference prints the StreamGraph JSON).
    counts.explain("formatted")

    val q = counts.writeStream
      .outputMode("append")
      .format("console")
      .option("numRows", "20")
      .option("truncate", "false")
      .start()

    // Drip-feed chunks so watermarks advance mid-stream like the reference's
    // paced source; the console shows windows firing as the min watermark
    // passes them and day-3 windows staying pending (README.md:54-58).
    val chunkSize = math.max(1, p0.size / 4)
    val chunks = p0.grouped(chunkSize).toSeq.zipAll(
                 p1.grouped(chunkSize).toSeq, Seq.empty, Seq.empty)
    chunks.foreach { case (c0, c1) =>
      if (c0.nonEmpty) m1.addData(c0)
      if (c1.nonEmpty) m2.addData(c1)
      q.processAllAvailable()
    }
    q.stop()
    spark.stop()
  }
}
