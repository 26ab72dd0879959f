package graft.functions

import graft.llm.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature as a native TypedImperativeAggregate: one pass over the
  * (doc, shingle-hash) stream, a fixed Array[Long] buffer per group,
  * elementwise-min merge — the canonical mergeable-sketch shape. Equivalent
  * to Dedup's 16-column min aggregation (spec-checked identical) but carries
  * the whole signature as ONE buffer: at 100 TB the shuffle rows are
  * (doc_id, 128-byte sketch) regardless of signature length, and the same
  * class extends to any mergeable sketch (HLL, KMV, reservoir).
  *
  * Buffer serialization is raw little-endian longs (driver/executor-stable).
  */
case class MinHashSigAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = Dedup.NumHashes

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val p = (Dedup.HashA(i) * h + Dedup.HashB(i)) % Dedup.Prime
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashAggregate {
  /** Aggregate a column of 28-bit shingle base-hashes into the k-long
    * MinHash signature array. */
  def minhashSig(hashCol: Column): Column =
    GraftColumnBridge.toColumn(
      MinHashSigAgg(GraftColumnBridge.toExpression(hashCol))
        .toAggregateExpression())
}
