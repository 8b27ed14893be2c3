package graft.model

import java.sql.Timestamp

/** The reference's event record (`Pageview.scala:8-11`: url, epoch-millis
  * timestamp, UUID eventId), with the timestamp as a proper `Timestamp` so
  * Spark's `window()`/`withWatermark()` operate on it natively.
  */
case class Pageview(url: String, ts: Timestamp, eventId: String)

/** Deterministic replica of the reference's workload generator
  * (`Main.scala:13-16`, `Pageview.scala:14-27`): one pageview per
  * `millisBetweenEvents` of event time across an interval, url uniform over
  * `http://site.com/0..urlCount-1`, strictly monotone timestamps within a
  * partition. Seeded instead of `Random`/`UUID.randomUUID` so tests can
  * snapshot exact per-window counts (FIXTURES.md §B).
  */
object PageviewGen {
  val UrlCount = 10

  def randomPageviews(startMillis: Long, endMillis: Long,
                      millisBetweenEvents: Long, seed: Long): Seq[Pageview] = {
    val rnd = new scala.util.Random(seed)
    (startMillis until endMillis by millisBetweenEvents).map { t =>
      Pageview(
        url = s"http://site.com/${rnd.nextInt(UrlCount)}",
        ts = new Timestamp(t),
        eventId = s"$seed-$t")
    }
  }

  /** The reference's exact two-partition skewed workload (`Main.scala:13-16`):
    * partition 0 covers [day1, day3), partition 1 covers [day2, day4) — event
    * time ranges overlap on day 2 and are skewed by one day. `step` scales the
    * event rate (reference: 1000 ms; tests use 60000 ms for speed). */
  def skewedPartitions(step: Long = 60000L): (Seq[Pageview], Seq[Pageview]) = {
    def utc(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    (randomPageviews(utc("2016-02-01T00:00:00Z"), utc("2016-02-03T00:00:00Z"), step, seed = 1L),
     randomPageviews(utc("2016-02-02T00:00:00Z"), utc("2016-02-04T00:00:00Z"), step, seed = 2L))
  }
}
