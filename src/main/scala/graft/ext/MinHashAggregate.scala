package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a single mergeable aggregate: `numHashes`
  * independent minima over a stream of 64-bit shingle hashes, kept in one
  * fixed `numHashes × 8`-byte buffer.
  *
  * Why a TypedImperativeAggregate: the column-per-hash formulation
  * (`agg(min(xxhash64(0, h)), min(xxhash64(1, h)), ...)`) carries 32
  * aggregate expressions through planning and codegen; here the whole
  * signature is ONE aggregate with an elementwise-min merge — the natural
  * shape for partial aggregation (map-side combine sends one 256-byte
  * buffer per (doc, partition)) and the same pattern any mergeable sketch
  * (HLL, CMS, t-digest) uses at 100 TB.
  *
  * Per-seed hashing is `XXH64.hashLong(h, seed)` — deterministic across
  * partitionings; downstream LSH banding only needs a consistent hash
  * family, not any specific one.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val m = XXH64.hashLong(h, i)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAggregate {
  /** Column-level minhash signature aggregate over a long hash column. */
  def minhashSig(hashCol: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashCol), numHashes)
        .toAggregateExpression())
}
