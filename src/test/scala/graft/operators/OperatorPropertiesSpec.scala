package graft.operators

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

/** Randomized ground-truth properties for the composite operators: the
  * distributed formulations must agree with trivially-correct driver-side
  * reference implementations on seeded random inputs. */
class OperatorPropertiesSpec extends SparkSpec {

  test("asof join equals the per-row argmax reference on random data") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // duplicate-ts collisions are likely on purpose: the tie rules are the
    // part a naive implementation gets wrong
    val probe = (1 to 300).map { i =>
      (i.toLong, new Timestamp(rnd.nextInt(50) * 1000L), s"k${rnd.nextInt(5)}")
    }
    val build = (1 to 120).map { i =>
      (1000L + i, new Timestamp(rnd.nextInt(50) * 1000L), s"k${rnd.nextInt(5)}",
       rnd.nextInt(100).toDouble)
    }
    val got = AsofJoin.lastValueAsOf(
        probe.toDF("event_id", "ts", "k"), build.toDF("bid", "ts", "k", "v"),
        keyCol = "k", timeCol = "ts", ordCol = "bid",
        valueCol = "v", outCol = "last_v")
      .select("event_id", "last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // reference: for each probe, the build row with max (ts, bid) among
    // those at-or-before it on the same key
    val expected = probe.map { case (id, ts, k) =>
      val cands = build.filter(b => b._3 == k && !b._2.after(ts))
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(b => (b._2.getTime, b._1))._4))
    }.toMap
    assert(got == expected)
  }

  test("sampleFrames emits no rows for empty payloads (matches the oracle's n_bytes > 0)") {
    val s = spark
    import s.implicits._
    val media = Seq(
      Multimodal.MediaItem(1L, "image", Array.emptyByteArray, "m", 0L),
      Multimodal.MediaItem(2L, "image", Array.fill[Byte](33)(7), "m", 33L))
      .toDS()
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(!frames.exists(_.media_id == 1L), "empty payload must yield no frames")
    // 33 bytes -> frames 0..2 (16, 16, 1 bytes); stride 4 keeps only idx 0
    assert(frames.filter(_.media_id == 2L).map(f => (f.frame_idx, f.frame_bytes)).toSeq
      == Seq((0L, 16L)))
  }

  test("connected components equal driver-side union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = (1 to 80).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1) // keep a < b, avoid self-loops
      }.distinct
      val got = ConnectedComponents.components(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("span-hash kernel equals hash60 of the joined span on random unicode token arrays") {
    val s = spark
    import s.implicits._
    import graft.functions.expressions.SpanHash
    val rnd = new Random(23)
    // token alphabet spans ASCII, multi-byte BMP, and supplementary
    // planes — the byte-level concat must equal string-level join on all
    val alphabet = Seq("cat", "héllo", "日本語", "x", "", "a b",
      new String(Character.toChars(0x1F600)), "Ωμέγα", "tok")
    def randTokens() = (0 until 2 + rnd.nextInt(12))
      .map(_ => alphabet(rnd.nextInt(alphabet.size)))
    val cases = (1 to 60).map(_ => randTokens())
    for (w <- Seq(2, 3, 5)) {
      val got = cases.map(t => (t, w)).toDF("toks", "w")
        .select(SpanHash.span_hashes(org.apache.spark.sql.functions.col("toks"), w).as("hs"))
        .as[Seq[Long]].collect().map(_.toList)
      val want = cases.map { t =>
        if (t.length < w) Nil
        else (0 to t.length - w).map(j =>
          graft.functions.PortableHash.hash60String(t.slice(j, j + w).mkString(" "))).toList
      }
      assert(got.toList == want.toList, s"w=$w")
    }
  }

  test("bloom long-kernel: no false negatives on random key sets, any fpp") {
    import graft.functions.expressions.GramBloom
    val rnd = new Random(91)
    for (trial <- 1 to 5) {
      val keys = (0 until 200 + rnd.nextInt(3000)).map(_ => rnd.nextLong()).distinct
      val fpp = Seq(0.1, 0.01, 1e-4)(trial % 3)
      val (m, k) = GramBloom.params(keys.size.toLong, fpp)
      val bits = new Array[Long](m >>> 6)
      keys.foreach(v => GramBloom.setLong(bits, m, k, v))
      assert(keys.forall(v => GramBloom.containsLong(bits, m, k, v)),
        s"trial $trial: an inserted key tested negative (breaks the exact-verify soundness)")
    }
  }

  test("snapshot diff equals the per-id reference classification on random snapshots") {
    val s = spark
    import s.implicits._
    val rnd = new Random(23)
    // overlapping id spaces with per-id random membership and mutation —
    // all four outcomes (added/removed/changed/unchanged) occur
    val ids = (1L to 200L)
    val prev = ids.filter(_ => rnd.nextInt(4) != 0)
      .map(i => (i, s"text-${i % 17}"))
    val curMut = ids.map(i => i -> (rnd.nextInt(4) == 0)).toMap
    val cur = ids.filter(_ => rnd.nextInt(4) != 0)
      .map(i => (i, if (curMut(i)) s"text-${i % 17}-v2" else s"text-${i % 17}"))
    val got = SnapshotDiff.diff(
        prev.toDF("doc_id", "text"), cur.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pm = prev.toMap
    val cm = cur.toMap
    val expected = ids.flatMap { i =>
      (pm.get(i), cm.get(i)) match {
        case (None, Some(_))              => Some(i -> "added")
        case (Some(_), None)              => Some(i -> "removed")
        case (Some(a), Some(b)) if a != b => Some(i -> "changed")
        case _                            => None
      }
    }.toMap
    assert(got == expected && expected.values.toSet.size == 3)
    // diff of a snapshot against itself is empty
    assert(SnapshotDiff.diff(
      prev.toDF("doc_id", "text"), prev.toDF("doc_id", "text")).count() == 0)
  }

  test("canonicalText is idempotent and case/punct/space-insensitive on random strings") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(41)
    val alphabet = "abcXYZ019 ,.!-_;:'\"\t"
    val base = (1 to 300).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(30)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = base.toDF("id", "t")
    val once = df.select(col("id"), Dedup.canonicalText(col("t")).as("c"))
    val twice = once.select(col("id"), Dedup.canonicalText(col("c")).as("c"))
    assert(once.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
           twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // surface variants collapse: uppercasing / extra punctuation / doubled
    // spaces never change the canonical form
    val variants = base.map { case (i, t) =>
      (i, t.toUpperCase + "!!", "  " + t.replace(" ", "   ") + " ,")
    }
    val vdf = variants.toDF("id", "up", "sp")
    val a = vdf.select(col("id"), Dedup.canonicalText(col("up")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = df.select(col("id"),
        Dedup.canonicalText(org.apache.spark.sql.functions.upper(col("t"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (i, c) =>
      // "up" adds only punctuation on top of uppercasing -> same canonical
      assert(c == b(i), s"id $i: '$c' vs '${b(i)}'")
    }
    val c1 = df.select(col("id"), Dedup.canonicalText(col("t")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val c2 = vdf.select(col("id"), Dedup.canonicalText(col("sp")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    c1.foreach { case (i, c) =>
      assert(c == c2(i), s"space-variant diverged for id $i: '$c' vs '${c2(i)}'")
    }
  }
}
