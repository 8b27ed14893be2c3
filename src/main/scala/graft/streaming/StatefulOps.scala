package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state beyond windowed folds — the
  * `flatMapGroupsWithState` surface (SURVEY.md §7: Spark's analog of
  * hand-rolled Flink state operators).
  *
  * `milestones` emits one record each time a key's cumulative event count
  * crosses a multiple of `every` — e.g. "every 100th pageview of a url".
  * State per key is a single long (bounded; no event buffering), the same
  * state-size discipline as the reference's FoldingState.
  */
object StatefulOps {

  case class Milestone(key: String, count: Long)

  def milestones(events: Dataset[(String, Long)], every: Long): Dataset[Milestone] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Milestone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val n = rows.size
          val next = prev + n
          state.update(next)
          // every multiple of `every` crossed in (prev, next]
          ((prev / every + 1) to (next / every)).map(m => Milestone(key, m * every)).iterator
      }
  }
}
