package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Pageview
import graft.operators.EventTimeOps._

/** Property-based invariants (SURVEY.md §5.4) for the windowing core:
  * conservation (no event lost or duplicated by tumbling windows),
  * epoch alignment, and the tumbling/sliding multiplicity law.
  * (scalacheck generators sampled directly — the scalatest bridge module
  * isn't on the classpath.)
  */
class WindowPropertiesSpec extends SparkSpec {

  private val baseMillis = java.time.Instant.parse("2016-02-01T00:00:00Z").toEpochMilli

  private val eventsGen: Gen[List[Pageview]] = for {
    n <- Gen.choose(1, 200)
    offs <- Gen.listOfN(n, Gen.choose(0L, 3L * 24 * 3600 * 1000))
    urls <- Gen.listOfN(n, Gen.choose(0, 5))
  } yield offs.zip(urls).zipWithIndex.map { case ((off, u), i) =>
    Pageview(s"u/$u", new Timestamp(baseMillis + off), i.toString)
  }

  private def samples(k: Int): Seq[List[Pageview]] =
    (0 until k).flatMap(i => eventsGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("tumbling windows conserve events and are epoch-aligned") {
    val s = spark
    import s.implicits._
    samples(5).foreach { events =>
      val counts = events.toDF()
        .countPerKeyPerWindow("ts", "1 hour", "url")
        .collect()
      assert(counts.map(_.getLong(3)).sum == events.size, "conservation")
      counts.foreach { r =>
        val start = r.getTimestamp(0).getTime
        val end = r.getTimestamp(1).getTime
        assert(start % 3600000L == 0, s"window start $start not epoch-aligned")
        assert(end == start + 3600000L, "width")
      }
      // each (url, hour) of the input appears exactly once
      val expectedKeys = events.map(p => (p.url, p.ts.getTime / 3600000L)).toSet
      val gotKeys = counts.map(r => (r.getString(2), r.getTimestamp(0).getTime / 3600000L)).toSet
      assert(gotKeys == expectedKeys)
    }
  }

  test("sliding windows assign each event to exactly width/slide windows") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    samples(5).foreach { events =>
      val counts = s.createDataset(events).toDF()
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
      assert(counts.map(_.getLong(1)).sum == events.size * 4L,
        "every event belongs to width/slide = 4 sliding windows")
    }
  }
}
