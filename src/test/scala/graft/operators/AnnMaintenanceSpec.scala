package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The embeddings-snapshot → ANN-family maintenance composition: the
  * diff's classification must pick the cheapest sound action, and the
  * applied action must leave the live view equal to the frozen-centroid
  * assignment of the current snapshot. */
class AnnMaintenanceSpec extends SparkSpec {

  private def rm(path: String): Unit = {
    def loop(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete()
    }
    loop(new java.io.File(path))
  }

  test("maintain: append, edit, replay no-op, cold-start rebuild, auto-compaction") {
    val s = spark
    import s.implicits._
    def emb(id: Long, salt: Long) =
      Array.tabulate(64)(d => (((id * 29 + salt + d * 5) % 17) - 8) / 8.0f)
    def frame(rows: Seq[(Long, Long)]) =
      rows.map { case (id, salt) => (id, emb(id, salt), id % 10) }
        .toDF("vec_id", "embedding", "label")
    def land(rows: Seq[(Long, Long)], dir: String) =
      frame(rows).localCheckpoint(true)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("annmaint-e2e").toString
    val saved = sys.props.get("graft.index.compactAfter")
    try {
      val v0 = (0L until 40L).map((_, 0L))
      land(v0, dir)
      PqIndex.ensure(s, dir)
      val (_, cents) = IvfIndex.ensureIndex(s, dir)
      def expected(rows: Seq[(Long, Long)]) = frame(rows)
        .select(col("vec_id"),
          SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      def live() = IvfIndex.cellsFor(s, dir).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

      // version 1: 5 new vectors — the cheap append path
      val prev1 = graft.sources.Tables.embeddings(s, dir).localCheckpoint(true)
      val v1 = v0 ++ (100L until 105L).map((_, 0L))
      land(v1, dir)
      assert(AnnMaintenance.maintain(s, dir, prev1, batchId = 1L) == "appended")
      assert(live() == expected(v1))
      // version 2: vec 7 removed, vec 8 RE-EMBEDDED, vec 200 added —
      // the tombstone edit path (removed/changed go incremental)
      val prev2 = graft.sources.Tables.embeddings(s, dir).localCheckpoint(true)
      val v2 = v1.filterNot(_._1 == 7L).map {
        case (8L, _) => (8L, 777L)
        case other   => other
      } :+ (200L, 0L)
      land(v2, dir)
      assert(AnnMaintenance.maintain(s, dir, prev2, batchId = 2L) == "edited")
      assert(live() == expected(v2),
        "the live view must serve the edited snapshot under frozen centroids")
      // a committed batch replays as a no-op
      assert(AnnMaintenance.maintain(s, dir, prev2, batchId = 2L) == "no_change")
      // identical snapshots diff to nothing
      val prev3 = graft.sources.Tables.embeddings(s, dir).localCheckpoint(true)
      assert(AnnMaintenance.maintain(s, dir, prev3, batchId = 3L) == "no_change")
      // cold start: a family that covers nothing rebuilds instead of
      // appending into a full build
      IvfIndex.drop(s, dir)
      PqIndex.drop(s, dir)
      assert(AnnMaintenance.maintain(s, dir, prev3, batchId = 4L) == "rebuilt")
      assert(!IvfIndex.snapshotStale(s, dir))
      // the rebuild RETRAINED on the current (edited) content — the
      // fixture memo keys on the dir and would otherwise hand back the
      // centroids trained on v0 at the original build
      val persisted = IvfIndex.ensureIndex(s, dir)._2
      val fresh = KMeans.train(frame(v2), "embedding")
      assert(persisted.length == fresh.length &&
        persisted.zip(fresh).forall { case (a, b) => a.sameElements(b) },
        "a content-replacing rebuild must retrain, not reuse the memo")
      // auto-compaction: with the threshold at 2, the next committed
      // batch folds the family — ledger to one stamp, tombstones retired
      sys.props("graft.index.compactAfter") = "2"
      KMeans.clearModels()
      val cents2 = IvfIndex.ensureIndex(s, dir)._2
      val prev4 = graft.sources.Tables.embeddings(s, dir).localCheckpoint(true)
      val v3 = v2.filterNot(_._1 == 11L)
      land(v3, dir)
      assert(AnnMaintenance.maintain(s, dir, prev4, batchId = 5L)
        == "edited+compacted")
      assert(s.table(IvfIndex.metaTable(dir)).count() == 1,
        "the coarse ledger must fold to one stamp")
      assert(!s.catalog.tableExists(
        "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_tomb"),
        "the fold must retire the tombstone table")
      val liveNow = IvfIndex.cellsFor(s, dir).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expNow = frame(v3)
        .select(col("vec_id"),
          SimilarityIVF.cell(col("embedding"), cents2).as("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(liveNow == expNow,
        "answers must survive the auto-compaction fold")
    } finally {
      saved match {
        case Some(v) => sys.props("graft.index.compactAfter") = v
        case None => sys.props.remove("graft.index.compactAfter")
      }
      IvfIndex.drop(s, dir)
      PqIndex.drop(s, dir)
      KMeans.clearModels()
      rm(dir)
    }
  }
}
