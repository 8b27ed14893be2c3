package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed incremental fold generic in the `Numeric` result — the direct
  * analog of the reference's `WindowAggregate[K, R: Numeric]` fold family
  * (`WindowAggregate.scala:22-31`: `zero` / `count` / `plus`), expressed as
  * Spark `Aggregator[IN, R, R]` so it runs as the same partial-aggregate +
  * merge pattern (zero ≅ zero, reduce ≅ count/add, merge ≅ plus) inside
  * Tungsten.
  *
  * Use with `Dataset.groupByKey(...).agg(NumericFold.count[T].toColumn)` or
  * inside `groupBy(window(...))` via `.agg(...)` on a KeyValueGroupedDataset.
  */
object NumericFold {

  /** Count fold: ignores the element value, adds one per element —
    * `WindowAggregate.count` (`WindowAggregate.scala:25-28`). */
  def count[IN]: Aggregator[IN, Long, Long] = new Aggregator[IN, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, a: IN): Long = acc + 1L
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Sum fold over an extracted numeric value — the generic `R: Numeric`
    * instantiation the reference supports but never exercises. */
  def sum[IN, R](f: IN => R)(implicit num: Numeric[R], enc: Encoder[R]): Aggregator[IN, R, R] =
    new Aggregator[IN, R, R] {
      override def zero: R = num.zero
      override def reduce(acc: R, a: IN): R = num.plus(acc, f(a))
      override def merge(a: R, b: R): R = num.plus(a, b)
      override def finish(r: R): R = r
      override def bufferEncoder: Encoder[R] = enc
      override def outputEncoder: Encoder[R] = enc
    }

  def countCol[IN]: TypedColumn[IN, Long] = count[IN].toColumn
}
