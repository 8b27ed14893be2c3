package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.Pageview

/** The reference's typed fold semantics (`WindowAggregate.scala:22-31`)
  * through Spark's Aggregator machinery, including the keyed-window shape
  * (`groupByKey` on (url, hour)). */
class NumericFoldSpec extends SparkSpec {

  private def ts(s: String) = new Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("count fold == WindowAggregate.count; sum fold == generic Numeric plus") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      Pageview("a", ts("2016-02-01T00:10:00Z"), "1"),
      Pageview("a", ts("2016-02-01T00:20:00Z"), "2"),
      Pageview("b", ts("2016-02-01T00:25:00Z"), "3"),
      Pageview("a", ts("2016-02-01T01:05:00Z"), "4")
    ).toDS()

    // keyed by (url, epoch-aligned hour) — the reference's FoldingState key.
    val counted = ds
      .groupByKey(p => (p.url, p.ts.getTime / 3600000L))
      .agg(NumericFold.countCol[Pageview])
      .collect().toSet
    // 2016-02-01T00:00Z = epoch-hour 403968
    assert(counted == Set(
      (("a", 403968L), 2L), (("b", 403968L), 1L), (("a", 403969L), 1L)))

    // generic Numeric sum over an extracted value (the numeric eventId)
    val summed = ds
      .groupByKey(_.url)
      .agg(NumericFold.sum[Pageview, Long](_.eventId.toLong).toColumn)
      .collect().toSet
    assert(summed == Set(("a", 7L), ("b", 3L)))
  }
}
