package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot diff: every classification branch on a synthetic pair, and
  * the declared query's classes matching the fixture's modular
  * derivation exactly. */
class SnapshotDiffSpec extends SparkSpec {

  test("added/removed/changed classified; unchanged dropped") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = SnapshotDiff.diff(prev, cur)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((2L, "changed"), (3L, "removed"), (4L, "added")),
      s"got $out")
  }

  test("presence classifies on id, not hash nullity: NULL content stays present") {
    val s = spark
    import s.implicits._
    // doc 1: NULL in both -> unchanged (dropped); doc 2: NULL -> text ->
    // changed; doc 3: text -> NULL -> changed; doc 4: NULL only in prev
    // -> removed (NOT misread as absent-from-prev)
    val prev = Seq((1L, null), (2L, null), (3L, "t"), (4L, null))
      .toDF("doc_id", "text")
    val cur = Seq((1L, null), (2L, "t"), (3L, null))
      .toDF("doc_id", "text")
    val out = SnapshotDiff.diff(prev, cur)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((2L, "changed"), (3L, "changed"), (4L, "removed")),
      s"got $out")
  }

  test("declared query's classes equal the fixture's modular derivation") {
    val s = spark
    val out = graft.SparkEntry.queries("q_snapshot_diff")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.nonEmpty)
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val ids = graft.sources.Tables.documents(s, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byStatus("added") == ids.filter(_ % 10 == 3))
    assert(byStatus("removed") == ids.filter(_ % 10 == 5))
    assert(byStatus("changed") == ids.filter(_ % 10 == 7))
    assert(byStatus.keySet == Set("added", "removed", "changed"))
  }

  test("diff plans one co-partitioned join over hash rows, no text in the exchange") {
    val s = spark
    val plan = graft.SparkEntry.queries("q_snapshot_diff")(s, sfDir)
      .queryExecution.executedPlan.toString
    // the shuffle carries (doc_id, h_*) — the projected text column must
    // not survive into any exchange
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"text column crossed an exchange:\n$plan")
  }
}
