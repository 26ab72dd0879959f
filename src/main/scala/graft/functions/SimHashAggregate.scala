package graft.functions

import graft.llm.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** SimHash as a TypedImperativeAggregate: per-group buffer = the SimBits
  * signed bit-sums; eval folds them to the packed simhash long.
  *
  * Exists for performance as much as semantics: the equivalent column
  * formulation (60 `sum(CASE ...)` aggregates) generates a whole-stage-
  * codegen class so large that Janino compilation dominates the query
  * (~8 s compile vs ~1.5 s of actual work at sf0.1). One imperative
  * aggregate keeps the generated code tiny and does the same single pass.
  * Bit semantics are identical to the DuckDB oracle's ±1 sums.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val bits = Dedup.SimBits

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (((h >> j) & 1L) * 2L) - 1L
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
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) >= 0) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bits)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAggregate {
  /** Aggregate a column of 60-bit token hashes into the packed simhash. */
  def simhash(hashCol: Column): Column =
    GraftColumnBridge.toColumn(
      SimHashAgg(GraftColumnBridge.toExpression(hashCol))
        .toAggregateExpression())
}
