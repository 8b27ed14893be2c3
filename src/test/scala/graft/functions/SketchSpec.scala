package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Approximate aggregates (HLL++ via approx_count_distinct): engine-
  * specific sketches have no cross-engine oracle, so correctness is a
  * tolerance bound against the exact answer. */
class SketchSpec extends SparkSpec {

  test("q_approx_median_price is within the exact 45th-55th percentile band") {
    val s = spark
    val approx = graft.SparkEntry.queries("q_approx_median_price")(s, sfDir)
      .select(col("o_orderstatus"), col("approx_median"))
    val bounds = Tables.orders(s, sfDir)
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.45)").as("lo"),
           expr("percentile(o_totalprice, 0.55)").as("hi"))
    val rows = approx.join(bounds, "o_orderstatus").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(m >= lo && m <= hi,
        s"status=${r.getString(0)} approx=$m outside exact [$lo, $hi]")
    }
  }

  test("SpaceSaving invariants survive eviction and merge (vocabulary far over capacity)") {
    // the fixture's 31-term vocabulary never fills a 64-counter sketch, so
    // q_approx_top_terms alone leaves the eviction / merge-inflation /
    // truncation paths unexercised (review finding). This stream forces
    // all three: 203 distinct terms against capacity 16, spread over 8
    // partitions so every partial sketch evicts and the final merge
    // truncates. Deterministic construction; the asserted bounds are the
    // order-independent guarantees, valid under ANY partitioning.
    val s = spark
    import s.implicits._
    val stream: Seq[String] =
      Seq.fill(1200)("hot0") ++ Seq.fill(900)("hot1") ++ Seq.fill(700)("hot2") ++
        (0 until 2200).map(i => s"tail${i % 200}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val got = stream.toDF("term").repartition(8)
      .agg(graft.functions.expressions.SpaceSavingAggregate
        .space_saving_topk(col("term"), capacity = 16, k = 10).as("tops"))
      .select(explode(col("tops")).as("e"))
      .select(col("e.term"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 10)
    var sawInflation = false
    got.foreach { case (term, cnt, err) =>
      val t = exact(term)
      assert(cnt >= t, s"$term: reported $cnt < exact $t")
      assert(cnt - err <= t, s"$term: lower bound ${cnt - err} > exact $t")
      if (err > 0) sawInflation = true
    }
    assert(sawInflation,
      "no reported term carries error — the eviction/merge paths did not run")
    // unambiguous heavy hitters (far above the n/capacity = 312 noise
    // floor even after merge inflation) must surface
    Seq("hot0", "hot1", "hot2").foreach(h =>
      assert(got.exists(_._1 == h), s"missed heavy hitter $h in $got"))
  }

  test("q_approx_top_terms obeys the SpaceSaving bounds against exact counts") {
    val s = spark
    val exact = graft.SparkEntry.queries("q_text_termfreq")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val got = graft.SparkEntry.queries("q_approx_top_terms")(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20, s"expected 20 heavy hitters, got ${got.length}")
    // order-independent sketch invariants: every reported count
    // OVERestimates the true count, and cnt - err underestimates it
    got.foreach { case (rank, term, cnt, err) =>
      val t = exact(term)
      assert(cnt >= t, s"#$rank $term: reported $cnt < exact $t")
      assert(cnt - err <= t, s"#$rank $term: lower bound ${cnt - err} > exact $t")
    }
    // heavy-hitter coverage: with 64 counters the sketch cannot miss a
    // term whose true frequency clears the n/capacity noise floor by a
    // wide margin — the exact top 10 all do on this fixture
    val top10 = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val reported = got.map(_._2).toSet
    assert(top10.subsetOf(reported),
      s"missed exact-top-10 heavy hitters: ${top10 -- reported}")
    info(s"n=$n tokens, noise floor n/64=${n / 64}, " +
      s"top reported: ${got.take(3).map(g => s"${g._2}=${g._3}(+-${g._4})").mkString(", ")}")
  }

  test("q_approx_distinct_users is within 3x rsd of the exact distinct counts") {
    val s = spark
    val approx = graft.SparkEntry.queries("q_approx_distinct_users")(s, sfDir)
      .select(col("event_type"), col("approx_users"))
    val exact = Tables.events(s, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val rows = approx.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.15,
        s"event_type=${r.getString(0)} exact=$e approx=$a")
    }
  }

  test("approx_count_distinct is within 3x its default 5% rsd of exact counts") {
    val s = spark
    val docs = Tables.documents(s, sfDir)
      .select(explode(split(col("text"), " ")).as("term"), col("lang"))
    val rows = docs.groupBy("lang")
      .agg(countDistinct(col("term")).as("exact"),
           approx_count_distinct(col("term")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // rsd=0.05 is ONE standard deviation, not a hard bound — a 1-sigma
      // assertion would legitimately fail ~1/3 of regenerated fixtures.
      // 3 sigma states the actual statistical contract.
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"lang=${r.getString(0)} exact=$exact approx=$approx")
    }
  }
}
