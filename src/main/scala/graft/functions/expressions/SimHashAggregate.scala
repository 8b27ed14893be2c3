package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Packed SimHash signature in ONE aggregate: per input token-hash, add
  * the +1/−1 vote of each of the `bits` low bits into a single long[bits]
  * buffer; eval packs bit j iff its vote sum is positive.
  *
  * Bit-identical to the 60-parallel-`sum` formulation it replaces (same
  * votes, same `> 0` packing — the DuckDB oracle still replays that form),
  * but the aggregation state is one buffer instead of 60 independent
  * sum slots, update is one tight loop instead of 60 generated aggregate
  * expressions, and the shuffle carries one 8*bits-byte blob per group.
  */
case class SimHashVotes(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_votes expects BIGINT token hashes, got ${child.dataType.simpleString}")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (((th >>> j) & 1L) * 2L) - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): SimHashVotes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashVotes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SimHashVotes =
    copy(child = cs(0))
}

object SimHashAggregate {
  /** Column API: packed simhash signature of a BIGINT token-hash column. */
  def simhash_votes(tokenHash: Column, bits: Int): Column =
    Bridge.column(SimHashVotes(Bridge.expression(tokenHash), bits)
      .toAggregateExpression())
}
