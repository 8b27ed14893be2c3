package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score double, id long) pairs, ordered by
  * (score DESC, id ASC) — a `TypedImperativeAggregate` keeping a k-element
  * min-heap per aggregation state.
  *
  * Scale rationale (SURVEY.md §7.5): the window-rank formulation of top-k
  * (`row_number over (partition by query order by score)`) shuffles EVERY
  * scored candidate row to the rank stage. This aggregate does map-side
  * partial top-k: each task keeps at most k entries per group, the shuffle
  * carries k-sized serialized heaps, and merge is O(k log k). For a
  * similarity join scoring millions of candidates per query, shuffle volume
  * drops from #candidates to #groups x k.
  *
  * Output: array<struct<score double, id bigint>> sorted by (score desc,
  * id asc) — explode + posexplode to get ranks.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // PriorityQueue dequeues the MAX under its ordering; we need that to be
  // the WORST entry under our (score desc, id asc) ranking — i.e. lowest
  // score, ties broken toward the larger id. Reversing only the score
  // comparator achieves exactly that: max = (smallest score, largest id).
  // TotalOrdering ranks NaN above +Inf — the same "NaN is largest" rule
  // Spark's and DuckDB's ORDER BY use — and is transitive, so NaN scores
  // (e.g. cosine of a zero vector) rank deterministically first instead of
  // poisoning the heap.
  private val heapOrdering: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  // total order consistent with heapOrdering (a beats b <=> a < b there)
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    heapOrdering.compare(a, b) < 0

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k expects (score DOUBLE, id BIGINT), got " +
          s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      // normalize -0.0 to +0.0: SQL ORDER BY treats signed zeros equal
      // (tie-break by id), TotalOrdering does not
      val sv = s.asInstanceOf[Double]
      val cand = (if (sv == 0.0) 0.0 else sv, i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(cand)
      else if (beats(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { cand =>
      if (a.size < k) a.enqueue(cand)
      else if (beats(cand, a.head)) { a.dequeue(); a.enqueue(cand) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(beats)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKAggregate {
  /** Column API: top-k (score desc, id asc) as array<struct<score,id>>. */
  def top_k(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
