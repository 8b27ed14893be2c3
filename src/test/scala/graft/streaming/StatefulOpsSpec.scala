package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Custom keyed state via flatMapGroupsWithState: milestone emission with
  * one long of state per key, across micro-batch boundaries. */
class StatefulOpsSpec extends SparkSpec {

  test("milestones fire exactly when cumulative counts cross multiples, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = MemoryStream[(String, Long)]
    val q = StatefulOps.milestones(m.toDS(), every = 3)
      .writeStream.outputMode("append").format("memory").queryName("ms_out").start()
    try {
      m.addData(("a", 1L), ("a", 1L), ("b", 1L))          // a=2, b=1: nothing
      q.processAllAvailable()
      assert(s.table("ms_out").count() == 0)

      m.addData(("a", 1L), ("b", 1L), ("b", 1L))          // a=3 -> fire(3); b=3 -> fire(3)
      q.processAllAvailable()
      val after2 = s.table("ms_out").as[StatefulOps.Milestone].collect().toSet
      assert(after2 == Set(StatefulOps.Milestone("a", 3L), StatefulOps.Milestone("b", 3L)))

      m.addData(Seq.fill(7)(("a", 1L)): _*)               // a: 3 -> 10 crosses 6 and 9
      q.processAllAvailable()
      val after3 = s.table("ms_out").as[StatefulOps.Milestone].collect().toSet
      assert(after3 == after2 ++ Set(StatefulOps.Milestone("a", 6L), StatefulOps.Milestone("a", 9L)),
        s"multi-milestone batch must emit each crossed multiple once: $after3")
    } finally q.stop()
  }
}
