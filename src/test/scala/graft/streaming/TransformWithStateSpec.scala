package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

import graft.SparkSpec

/** Running per-key count via the Spark 4 arbitrary-state API
  * (transformWithState + typed ValueState on the RocksDB provider) — the
  * successor surface to flatMapGroupsWithState (StatefulOps.milestones);
  * the engine supports both. */
class RunningCountProcessor extends StatefulProcessor[String, (String, Long), (String, Long)] {
  @transient private var countState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    countState = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                               timerValues: TimerValues): Iterator[(String, Long)] = {
    val prev = if (countState.exists()) countState.get() else 0L
    val next = prev + rows.size
    countState.update(next)
    Iterator.single((key, next))
  }
}

class TransformWithStateSpec extends SparkSpec {

  test("transformWithState keeps a typed running count per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(String, Long)]
    val out = ms.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
    val q = out.toDF("key", "cnt").writeStream
      .outputMode("update").format("memory").queryName("tws").start()
    try {
      ms.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      ms.addData(("a", 4L))
      q.processAllAvailable()
      val rows = s.table("tws").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      // batch 1 emits a->2, b->1; batch 2 emits a->3 (state carried over)
      assert(rows.contains(("a", 2L)) && rows.contains(("b", 1L)) && rows.contains(("a", 3L)),
        s"got $rows")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
