package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters (Metwally et al. 2005, "Efficient Computation
  * of Frequent and Top-k Elements in Data Streams") — the third
  * bounded-state sketch beside approx_percentile and HLL++ distinct
  * counting: top terms with CONSTANT state (`capacity` counters) per
  * group, where the exact formulation (q_text_termfreq) shuffles the whole
  * vocabulary.
  *
  * Per-counter invariants the sketch maintains under ANY arrival order and
  * any partition/merge plan (what SketchSpec asserts, since the exact
  * output is order-dependent and therefore not oracle-replayable):
  *  - `cnt` OVERestimates the term's true count: true <= cnt;
  *  - `err` bounds the overestimate: cnt - err <= true;
  *  - any term whose true count exceeds n/capacity occupies a counter
  *    (the classic guarantee; merging weakens the constant, not the
  *    shape).
  *
  * Merge treats a term absent from one side as having been evicted there:
  * it contributes that side's minimum counter value as both count and
  * error — the standard mergeable-summaries construction, which preserves
  * both bounds above. Eviction scans the `capacity` counters for the
  * minimum (O(capacity), a small constant); a production implementation
  * chasing per-row nanoseconds would keep the stream-summary linked
  * structure for O(1), changing nothing about state size or guarantees.
  *
  * Output: array<struct<term string, cnt long, err long>> — the k largest
  * counters by (cnt DESC, term ASC), deterministic GIVEN the final counter
  * map.
  */
case class SpaceSavingTopK(
    childExpr: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  // k > 0 also guards the eviction branch: with capacity 0 the update
  // path would minBy an empty counter map deep in an executor task
  require(k > 0 && capacity >= k,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (childExpr.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving_topk expects a STRING term, got ${childExpr.dataType.simpleString}")

  private def minEntry(buf: mutable.HashMap[String, (Long, Long)]): (String, (Long, Long)) =
    // deterministic tie-break (term asc) so a given counter map always
    // evicts the same victim, whatever HashMap iteration order does
    buf.minBy { case (t, (c, _)) => (c, t) }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = childExpr.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some((c, e)) => buf.update(term, (c + 1, e))
        case None if buf.size < capacity => buf.update(term, (1L, 0L))
        case None =>
          val (victim, (mc, _)) = minEntry(buf)
          buf.remove(victim)
          buf.update(term, (mc + 1, mc))
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
                     b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    if (b.isEmpty) return a
    if (a.isEmpty) { b.foreach { case (t, ce) => a.update(t, ce) }; return a }
    val minA = if (a.size < capacity) 0L else minEntry(a)._2._1
    val minB = if (b.size < capacity) 0L else minEntry(b)._2._1
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { t =>
      val (ca, ea) = a.getOrElse(t, (minA, minA))
      val (cb, eb) = b.getOrElse(t, (minB, minB))
      merged.update(t, (ca + cb, ea + eb))
    }
    a.clear()
    if (merged.size <= capacity) merged.foreach { case (t, ce) => a.update(t, ce) }
    else merged.toSeq
      .sortBy { case (t, (c, _)) => (-c, t) }
      .take(capacity)
      .foreach { case (t, ce) => a.update(t, ce) }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, (c, e)) =>
      InternalRow(UTF8String.fromString(t), c, e)
    })
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val entries = buf.toSeq.map { case (t, ce) =>
      (t.getBytes(StandardCharsets.UTF_8), ce)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 20).sum)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, (c, e)) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.update(new String(tb, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType),
    StructField("cnt", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(childExpr)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(childExpr = cs(0))
}

object SpaceSavingAggregate {
  /** Column API: SpaceSaving top-k heavy hitters with `capacity` counters
    * of state, as array<struct<term, cnt, err>>. */
  def space_saving_topk(term: Column, capacity: Int, k: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(term), capacity, k)
        .toAggregateExpression())
}
