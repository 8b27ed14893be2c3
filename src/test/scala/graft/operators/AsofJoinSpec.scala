package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Edge semantics of the as-of join: inclusive at equal time, null before
  * the first build row, deterministic tie-break among equal-time builds. */
class AsofJoinSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("last-value-as-of: inclusive ties, pre-history nulls, max-ord tiebreak") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      (1L, ts(5), "k"),   // before any build -> null
      (2L, ts(10), "k"),  // equal to build at 10 -> inclusive, sees it
      (3L, ts(15), "k"),  // between builds -> build@10
      (4L, ts(20), "k"),  // two builds at 20 -> the one with max ord wins
      (5L, ts(10), "x"))  // other key, no builds -> null
      .toDF("event_id", "ts", "k")
    val build = Seq(
      (100L, ts(10), "k", 1.0),
      (101L, ts(20), "k", 2.0),
      (102L, ts(20), "k", 3.0)) // same ts as 101, higher ord -> survivor
      .toDF("bid", "ts", "k", "v")

    val out = AsofJoin.lastValueAsOf(probe, build,
        keyCol = "k", timeCol = "ts", ordCol = "bid",
        valueCol = "v", outCol = "last_v")
      .select("event_id", "last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(out == Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(1.0), 4L -> Some(3.0), 5L -> None))
  }

  test("reserved _asof_* input columns are rejected, not silently clobbered") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, ts(5), "k", 9L)).toDF("event_id", "ts", "k", "_asof_ord")
    val build = Seq((100L, ts(1), "k", 1.0)).toDF("bid", "ts", "k", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.lastValueAsOf(probe, build, "k", "ts", "bid", "v", "last_v")
    }
    assert(e.getMessage.contains("_asof_ord"))
  }

  test("multi-payload variant attaches every column from the same as-of row") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, ts(15), "k")).toDF("event_id", "ts", "k")
    val build = Seq(
      (100L, ts(10), "k", 1.0, "first"),
      (101L, ts(12), "k", 2.0, "second"))
      .toDF("bid", "ts", "k", "v", "tag")
    val row = AsofJoin.lastValuesAsOf(probe, build,
        keyCol = "k", timeCol = "ts", ordCol = "bid",
        payload = Map("v" -> "last_v", "tag" -> "last_tag"))
      .select("event_id", "last_v", "last_tag").head()
    // both payloads come from the SAME (latest) build row
    assert((row.getLong(0), row.getDouble(1), row.getString(2)) == (1L, 2.0, "second"))
  }

  test("a null payload FIELD in the as-of row does not tear columns across rows") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, ts(15), "k")).toDF("event_id", "ts", "k")
    // the latest build row has tag = null: last_tag must be null (from
    // THAT row), not "first" scavenged from the older row
    val build = Seq(
      (100L, ts(10), "k", Some(1.0), Some("first")),
      (101L, ts(12), "k", Some(2.0), None))
      .toDF("bid", "ts", "k", "v", "tag")
    val row = AsofJoin.lastValuesAsOf(probe, build,
        keyCol = "k", timeCol = "ts", ordCol = "bid",
        payload = Map("v" -> "last_v", "tag" -> "last_tag"))
      .select("last_v", "last_tag").head()
    assert(row.getDouble(0) == 2.0 && row.isNullAt(1),
      s"payload must come intact from the single as-of row: $row")
  }
}
