package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The persisted IVF index (train once, serve probes from stored tables) —
  * the signature-store discipline applied to ANN serving. */
class IvfIndexSpec extends SparkSpec {

  /** Names derived from the ACTIVE fixture dir (round-5 advice: hardcoded
    * sf0.001 names silently no-op when SPARK_GRAFT_SF_DIR points
    * elsewhere, leaking appended index rows into later tests). */
  private def dropIndexTables(): Unit = {
    val stem = IvfIndex.tableStem(sfDir)
    Seq("cells", "centroids", "meta").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS ${stem}_$sfx"))
  }

  test("probe against the persisted index equals the retrained query") {
    val s = spark
    try {
      val e = Tables.embeddings(s, sfDir)
      val cents = KMeans.trainForFixture(e, sfDir)
      val retrained = SimilarityIVF.ivfTopK(
          e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5,
          cents = cents)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val indexed = IvfIndex.probe(s, sfDir, e.filter(col("vec_id") < 10),
          k = 5, candidatePred = col("vec_id") >= 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(retrained.nonEmpty && indexed == retrained)

      // second ensureIndex reuses the tables: the persisted centroids must
      // round-trip EXACTLY (bit-equal doubles), or a later session's probe
      // cells would drift from the training-session assignment
      val (_, reloaded) = IvfIndex.ensureIndex(s, sfDir)
      assert(reloaded.length == cents.length &&
        reloaded.zip(cents).forall { case (a, b) => a.sameElements(b) })
    } finally dropIndexTables()
  }

  test("append ingests a batch at batch cost and equals a full rebuild") {
    val s = spark
    try {
      val e = Tables.embeddings(s, sfDir)
      // resident index over vec_id >= 30; batch = [10, 30); queries < 10.
      // Build from a FILTERED corpus via a scratch fixture name so the
      // memoized full-fixture model is not disturbed: ensureIndex derives
      // centroids from the fixture dir, which here must be the resident
      // subset. Simpler: build the real index, then append a batch of
      // NEW ids and check the probe sees exactly the union.
      val (cellsT, cents) = IvfIndex.ensureIndex(s, sfDir)
      val resident = s.table(cellsT).count()
      val batch = e.filter(col("vec_id") >= 10 && col("vec_id") < 30)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      IvfIndex.append(s, sfDir, batch)
      assert(s.table(cellsT).count() == resident + batch.count())
      // appended rows carry the same cell assignment the resident build
      // would have given them (centroids fixed -> append == rebuild)
      val expected = batch
        .select(col("vec_id"), SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val got = s.table(cellsT).filter(col("vec_id") >= 1000000L)
        .select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == expected)
      // probes now see appended neighbors exactly as if they were resident
      val probed = IvfIndex.probe(s, sfDir, e.filter(col("vec_id") < 10),
          k = 5, candidatePred = col("vec_id") >= 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rebuilt = SimilarityIVF.ivfTopK(
          e.filter(col("vec_id") < 10),
          e.filter(col("vec_id") >= 10).select("vec_id", "embedding")
            .unionByName(batch), k = 5,
          cents = cents)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(probed.nonEmpty && probed == rebuilt)
    } finally dropIndexTables()
  }

  test("index-health stats register post-append occupancy shifts") {
    val s = spark
    try {
      val e = Tables.embeddings(s, sfDir)
      def occ(): Map[Int, Long] =
        graft.DedupQueries.queries("q_ann_index_stats")(s, sfDir)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val (_, cents) = IvfIndex.ensureIndex(s, sfDir)
      val before = occ()
      assert(before.values.sum == e.count())
      // ingest a batch of fresh ids; the health query must see the shift
      // immediately (it reads the live cells table, not a snapshot)
      val batch = e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      val expectedShift = batch
        .select(SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .groupBy("cell").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      IvfIndex.append(s, sfDir, batch)
      val after = occ()
      assert(after.values.sum == before.values.sum + batch.count())
      val shift = after.map { case (c, n) => c -> (n - before.getOrElse(c, 0L)) }
        .filter(_._2 != 0L)
      assert(shift == expectedShift, s"occupancy shift $shift != batch assignment $expectedShift")
      // the skew column is the max/mean ratio over the SAME live counts
      val skew = graft.DedupQueries.queries("q_ann_index_stats")(s, sfDir)
        .select("skew").head().getDouble(0)
      val expSkew = after.values.max.toDouble * after.size / after.values.sum
      assert(math.abs(skew - expSkew) < 1e-12)
    } finally dropIndexTables()
  }

  test("a non-broadcast probe batch joins the index with no shuffle on the index side") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val e = Tables.embeddings(s, sfDir)
      val (cellsT, cents) = IvfIndex.ensureIndex(s, sfDir)
      // a corpus-sized probe batch (every vector probes its own cells) —
      // the case where the index's bucketing earns its keep: the store
      // side reads its buckets in place, only the batch shuffles
      val batch = e.select(col("vec_id").as("query_id"),
        explode(SimilarityIVF.probeCells(col("embedding"), cents)).as("cell"))
      val joined = s.table(cellsT).as("ix")
        .join(batch.as("b"), col("ix.cell") === col("b.cell"))
        .select(col("b.query_id"), col("ix.vec_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell#".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"expected exactly one join-key shuffle (batch side only), got $cellExchanges:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"index scan is not bucket-aware:\n$plan")
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      dropIndexTables()
    }
  }

  test("cluster-balanced sample: <=k per trained cell, heap == window replay, deterministic") {
    val s = spark
    val out = graft.SparkEntry.queries("q_sample_cluster_balanced")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // per-cell cap and balance: every sampled cell carries exactly
    // min(k, cell size) members
    val e = Tables.embeddings(s, sfDir)
    val cents = KMeans.trainForFixture(e, sfDir)
    val assigned = e.select(
      SimilarityIVF.cell(col("embedding"), cents).cast("long").as("cell"),
      col("vec_id"))
    val cellSizes = assigned.groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCell = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCell.nonEmpty)
    perCell.foreach { case (cell, n) =>
      assert(n == math.min(5L, cellSizes(cell)),
        s"cell $cell sampled $n of ${cellSizes(cell)}")
    }
    // heap form equals the window bottom-k replay (same hash currency)
    val h = pmod(graft.functions.PortableHash.hash60(
      col("vec_id").cast("string")), lit(1125899906842624L)) // 2^50
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("h").asc, col("vec_id").asc)
    val windowed = assigned.withColumn("h", h)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("cell", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == windowed)
    // deterministic across runs
    val again = graft.SparkEntry.queries("q_sample_cluster_balanced")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == again)
  }

  test("append is crash-idempotent: kill between writes replays clean; committed batch no-ops") {
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    // own fixture dir: appended rows must not leak into the shared
    // fixture's index (the StreamingIndexMaintenanceSpec hygiene rule)
    val dir = java.nio.file.Files.createTempDirectory("ivfcrash-fixture").toString
    def vec(id: Long) = (id,
      Array.tabulate(64)(d => (((id * 31 + d * 7) % 19) - 9) / 9.0f), id % 10)
    def frame(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding", "label")
    try {
      frame(0L until 50L).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val (cellsT, cents) = IvfIndex.ensureIndex(s, dir)
      val batch = frame(100L until 120L)
      val batchId = 7L
      // --- KILL BETWEEN WRITES: the cells partition landed PARTIALLY
      // (torn), the ledger stamp never ran — the pre-ledger blind
      // mode("append") would have double-appended on retry
      SnapshotMeta.overwritePartition(s, cellsT, batchId,
        batch.limit(5).select(col("vec_id"), col("embedding"),
          SimilarityIVF.cell(col("embedding"), cents).as("cell")))
      assert(!SnapshotMeta.appliedBatch(s, IvfIndex.metaTable(dir), batchId),
        "a torn append must leave NO commit record")
      // re-run from the top: REPLACES the torn partition, then stamps
      IvfIndex.append(s, dir, batch, batchId, "vec_id", "embedding")
      val got = s.table(cellsT).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = frame((0L until 50L) ++ (100L until 120L))
        .select(col("vec_id"),
          SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected && got.size == 70,
        "replay after a torn cells write must equal the clean application")
      // --- COMMITTED BATCH REPLAYS AS A NO-OP: even a different frame
      // under the same committed id must not change state
      IvfIndex.append(s, dir, frame(900L until 905L), batchId,
        "vec_id", "embedding")
      assert(s.table(cellsT).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet == expected,
        "a committed batch id must replay as a no-op")
      // --- STALENESS CONTRACT: the ledger sum covers base ∪ batch, so
      // the index reads STALE until the caller lands the batch files
      // into the dir (the append contract), then FRESH
      assert(IvfIndex.snapshotStale(s, dir),
        "index must read stale while the dir lacks the appended batch")
      batch.write.mode("append").parquet(s"$dir/embeddings.parquet")
      assert(!IvfIndex.snapshotStale(s, dir),
        "index must read fresh once the dir holds base ∪ batch")
    } finally {
      IvfIndex.drop(s, dir)
      rm(new java.io.File(dir))
    }
  }

  test("delete tombstones vectors exactly: probes exclude them, replay no-ops, " +
       "compact applies them physically") {
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfdel-fixture").toString
    def vec(id: Long) = (id,
      Array.tabulate(64)(d => (((id * 37 + d * 11) % 23) - 11) / 11.0f), id % 10)
    def frame(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding", "label")
    try {
      frame(0L until 50L).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val (cellsT, _) = IvfIndex.ensureIndex(s, dir)
      val gone = Seq(15L, 25L, 35L)
      def probes() = IvfIndex.probe(s, dir, frame(0L until 5L), k = 5,
        candidatePred = col("vec_id") >= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the expected result is the SAME probe with the candidates
      // filtered — scoring is per-row, so exclusion is exact
      val expected = IvfIndex.probe(s, dir, frame(0L until 5L), k = 5,
        candidatePred = col("vec_id") >= 5 && !col("vec_id").isin(gone: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected != probes(), "fixture too small: deletes must matter")
      // KILL BETWEEN WRITES: a torn tombstone partition with no stamp —
      // the re-run must replace it and converge
      frame(Seq(15L)).select("vec_id").withColumn("batch_id", lit(2L))
        .write.partitionBy("batch_id")
        .saveAsTable("ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_tomb")
      IvfIndex.delete(s, dir, gone.toDF("vec_id"), batchId = 2L)
      assert(probes() == expected,
        "probes after delete must equal the candidate-filtered probe")
      val neigh = probes().map(_._2)
      assert(gone.forall(g => !neigh.contains(g)))
      // a committed batch replays as a NO-OP, even with different ids
      IvfIndex.delete(s, dir, Seq(40L).toDF("vec_id"), batchId = 2L)
      assert(probes() == expected, "a committed delete batch must no-op")
      // staleness contract: ledger sum = base − removed, so the index
      // reads STALE until the dir drops the removed vectors
      assert(IvfIndex.snapshotStale(s, dir))
      frame((0L until 50L).filterNot(gone.contains))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      assert(!IvfIndex.snapshotStale(s, dir))
      // compact: tombstones apply physically, the table retires, the
      // fold lands at the max committed id, probes are bit-identical
      IvfIndex.compact(s, dir)
      assert(!s.catalog.tableExists(
        "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_tomb"),
        "compact must retire the tombstone table")
      val stored = s.table(cellsT).select("vec_id", "batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(stored.map(_._2).toSet == Set(2L),
        "compact must fold into the max committed id")
      assert(!stored.map(_._1).exists(gone.contains),
        "dead rows must be physically gone after compact")
      assert(probes() == expected, "compaction changed probe answers")
    } finally {
      IvfIndex.drop(s, dir)
      rm(new java.io.File(dir))
    }
  }

  test("edit re-embeds a vector at churn cost: the live view serves the new assignment") {
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfedit-fixture").toString
    def vec(id: Long, salt: Long) = (id,
      Array.tabulate(64)(d => (((id * 37 + salt + d * 11) % 23) - 11) / 11.0f))
    try {
      (0L until 50L).map(vec(_, 0L)).toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val (_, cents) = IvfIndex.ensureIndex(s, dir)
      // vector 10 gets a NEW embedding (a refreshed encoder, say)
      val v10 = Seq(vec(10L, 999L)).toDF("vec_id", "embedding")
      IvfIndex.edit(s, dir, Seq(10L).toDF("vec_id"), v10, batchId = 4L)
      // the live view = old corpus minus 10, plus 10 assigned FROZEN
      val got = IvfIndex.cellsFor(s, dir).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = ((0L until 50L).filterNot(_ == 10L).map(vec(_, 0L))
        :+ vec(10L, 999L)).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          graft.operators.SimilarityIVF.cell(col("embedding"), cents).as("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected && got.size == 50,
        "the live view must hold the re-embedded assignment exactly")
    } finally {
      IvfIndex.drop(s, dir)
      rm(new java.io.File(dir))
    }
  }

  test("random ANN maintenance histories equal the frozen-centroid assignment (model-based)") {
    // the tombstone-visibility pin for the ANN family: an arbitrary
    // interleaving of vector adds, deletes, and re-embeddings — incl.
    // delete-then-re-add — must leave the live cells view equal to the
    // frozen-centroid assignment of the final model state.
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    def emb(id: Long, salt: Long) =
      Array.tabulate(64)(d => (((id * 53 + salt + d * 19) % 37) - 18) / 18.0f)
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed * 104729)
      val model = scala.collection.mutable.Map[Long, Long](
        (0L until 30L).map(_ -> 0L): _*)
      var nextId = 100L
      val dir = java.nio.file.Files
        .createTempDirectory(s"ivfrand$seed").toString
      def frame(rows: Seq[(Long, Long)]) =
        rows.map { case (id, salt) => (id, emb(id, salt)) }
          .toDF("vec_id", "embedding")
      try {
        frame(model.toSeq).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
        val (_, cents) = IvfIndex.ensureIndex(s, dir)
        for (batch <- 1 to 4) {
          val ids = model.keys.toVector.sorted
          val removedIds = rnd.shuffle(ids).take(rnd.nextInt(3))
          val reembedIds = rnd.shuffle(ids.diff(removedIds)).take(rnd.nextInt(3))
          val addedIds = (0 until rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val reembeds = reembedIds.map(id => (id, model(id) + 1000L))
          val adds = addedIds.map(id => (id, 0L))
          val removed = (removedIds ++ reembedIds).map((_, 0L))
          if (removed.isEmpty && adds.nonEmpty)
            IvfIndex.append(s, dir, frame(adds), batch.toLong,
              "vec_id", "embedding")
          else if (removed.nonEmpty || adds.nonEmpty)
            IvfIndex.edit(s, dir, frame(removed).select("vec_id"),
              frame(reembeds ++ adds), batch.toLong)
          removedIds.foreach(model.remove)
          (reembeds ++ adds).foreach { case (id, salt) => model(id) = salt }
        }
        val live = IvfIndex.cellsFor(s, dir).select("vec_id", "cell")
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        val expected = frame(model.toSeq)
          .select(col("vec_id"),
            SimilarityIVF.cell(col("embedding"), cents).as("cell"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        assert(live == expected && live.size == model.size,
          s"seed $seed: live cells view != frozen-centroid model assignment")
      } finally {
        IvfIndex.drop(s, dir)
        KMeans.clearModels()
        rm(new java.io.File(dir))
      }
    }
  }

  test("compact folds batch partitions, keeps centroids, preserves probes bit-exactly") {
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfcompact-fixture").toString
    def vec(id: Long) = (id,
      Array.tabulate(64)(d => (((id * 41 + d * 13) % 17) - 8) / 8.0f), id % 10)
    def frame(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding", "label")
    try {
      frame(0L until 50L).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val (cellsT, _) = IvfIndex.ensureIndex(s, dir)
      val batch = frame(100L until 130L)
      IvfIndex.append(s, dir, batch, 3L, "vec_id", "embedding")
      // stale (batch files not landed) → compaction must refuse
      assertThrows[IllegalArgumentException](IvfIndex.compact(s, dir))
      batch.write.mode("append").parquet(s"$dir/embeddings.parquet")
      def probes() = IvfIndex.probe(s, dir, frame(0L until 5L), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val before = probes()
      assert(s.table(IvfIndex.metaTable(dir)).count() == 2)
      IvfIndex.compact(s, dir)
      assert(s.table(IvfIndex.metaTable(dir)).count() == 1)
      val parts = s.table(cellsT).select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(parts == Set(3L),
        s"compact must fold into the max committed id (3), got: $parts")
      assert(probes() == before && before.nonEmpty,
        "compaction changed probe answers")
      assert(!IvfIndex.snapshotStale(s, dir))
    } finally {
      IvfIndex.drop(s, dir)
      rm(new java.io.File(dir))
    }
  }

  test("nprobe knob widens the served probe: at K the probe equals exact " +
       "top-k; invalid values are refused") {
    val s = spark
    val saved = sys.props.get("graft.ivf.nprobe")
    def setProp(v: Option[String]): Unit = v match {
      case Some(x) => sys.props("graft.ivf.nprobe") = x
      case None => sys.props.remove("graft.ivf.nprobe")
    }
    try {
      val e = Tables.embeddings(s, sfDir)
      val q = e.filter(col("vec_id") < 10)
      def probed() = IvfIndex.probe(s, sfDir, q, k = 5,
          candidatePred = col("vec_id") >= 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the boundary case that PROVES the knob reaches the plan: probing
      // every cell degenerates IVF to the exact scan, so the served
      // ranking must equal brute-force cosine top-k bit-for-bit
      setProp(Some(SimilarityIVF.K.toString))
      val allCells = probed()
      val exact = Similarity.topK(q, e.filter(col("vec_id") >= 10), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(allCells == exact && exact.nonEmpty,
        "nprobe = K must degenerate to the exact top-k")
      // width 1 is the cheap end: still k results per query (cells hold
      // >= k candidates at this fixture), possibly lower recall
      setProp(Some("1"))
      val narrow = probed()
      assert(narrow.map(_._1) == exact.map(_._1),
        "every query must still return results at nprobe = 1")
      // validation: out-of-range and garbage are refused loudly
      for (bad <- Seq("0", (SimilarityIVF.K + 1).toString, "abc")) {
        setProp(Some(bad))
        assertThrows[IllegalArgumentException](probed())
      }
    } finally {
      setProp(saved)
      dropIndexTables()
    }
  }

  test("a committed derived-id ANN batch whose ids were later tombstoned " +
       "replays as a no-op for both the coarse and the codes family") {
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfreplay-fixture").toString
    def vec(id: Long) = (id,
      Array.tabulate(64)(d => (((id * 41 + d * 13) % 17) - 8) / 8.0f), id % 10)
    def frame(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding", "label")
    try {
      frame(0L until 50L).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      PqIndex.ensure(s, dir) // builds cells + codes over the base
      // derived-id ingest of 100..110, then a durable delete tombstones
      // half of them
      val batch = frame(100L until 110L)
      PqIndex.append(s, dir, batch)
      IvfIndex.delete(s, dir,
        frame(100L until 105L).select("vec_id"), batchId = 1L)
      val cellsT = IvfIndex.ensureIndex(s, dir)._1
      val before = s.table(cellsT).count()
      // the replay (a restarted caller re-running its landed batch) must
      // NO-OP via the ledger check — refusing it would regress the
      // committed-batch replay contract (round-14 ADVICE); covers
      // IvfIndex.append and PqIndex.append derived overloads at once
      PqIndex.append(s, dir, batch)
      IvfIndex.append(s, dir, batch)
      assert(s.table(cellsT).count() == before,
        "the committed batch's replay must change nothing")
      // tombstoned ids stay hidden from probes after the replay
      val served = IvfIndex.probe(s, dir, frame(Seq(0L)), k = 200,
        candidatePred = col("vec_id") >= 0)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert((100L until 105L).forall(id => !served.contains(id)),
        "tombstoned ids must stay hidden after the replay")
    } finally {
      IvfIndex.drop(s, dir)
      PqIndex.drop(s, dir)
      rm(new java.io.File(dir))
    }
  }
}
