package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Elementwise fixed-point vector sum aggregate: buffer(j) accumulates
  * Σ floor(x_j · 2^40) as int64 over all input arrays — the exact partial
  * sums the q37 centroid mirror defines, but WITHOUT exploding the corpus
  * by its dimensionality: `posexplode → groupBy(label, j)` multiplies a
  * 100 TB embedding table 64× through the exchange, while this aggregate
  * map-side-combines long-array partials and shuffles one buffer per
  * (group × partition). Same longs, same order-independence (integer
  * addition is associative), bit-identical downstream math.
  *
  * Input contract (ENFORCED, not assumed): every array is non-null,
  * every element is non-null, and all arrays in a group have one width.
  * Downstream centroid math divides by the per-group ROW count, which is
  * only correct under that contract — a null/ragged input would silently
  * diverge from the per-component COUNT(x) division of the SQL mirror,
  * so such inputs fail the task loudly instead. Empty groups evaluate to
  * NULL.
  *
  * Accepts `array<float>` natively (like [[FixedPointDot]]): the float
  * element widens exactly inside the update loop, so the raw embeddings
  * column feeds the aggregate without a per-row `cast(array<double>)`
  * allocation over the whole corpus. Values are bit-identical to the
  * cast form; other element types still implicit-cast to array<double>.
  */
case class FixedPointVectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  /** 2^40 — matches the q37 oracle mirror's floor(x * 1099511627776.0). */
  private val Scale = 1099511627776.0

  override def children: Seq[Expression] = Seq(child)

  private def isFloatChild: Boolean =
    child.resolved && (child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  override def inputTypes: Seq[DataType] =
    Seq(if (isFloatChild) ArrayType(FloatType) else ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fpvec_sum"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    require(v != null,
      "graft_fpvec_sum: NULL array in input — rows must carry complete " +
        "vectors (divide-by-row-count centroid math would silently diverge)")
    val n = v.numElements()
    // n > 0: an empty array would masquerade as the uninitialized buffer
    // (length 0), dodge the width check, AND still count in the
    // divide-by-row-count downstream — the same silent divergence
    require(n > 0, "graft_fpvec_sum: empty vector in input — rows must " +
      "carry complete vectors")
    require(buffer.length == 0 || buffer.length == n,
      s"graft_fpvec_sum: ragged vector widths in one group " +
        s"(${buffer.length} vs $n) — mixed dimensionality breaks the " +
        "elementwise sum contract")
    val b = if (buffer.length >= n) buffer else java.util.Arrays.copyOf(buffer, n)
    val fl = isFloatChild
    var j = 0
    while (j < n) {
      require(!v.isNullAt(j),
        s"graft_fpvec_sum: NULL element at index $j — vectors must be dense")
      val x = if (fl) v.getFloat(j).toDouble else v.getDouble(j)
      b(j) += math.floor(x * Scale).toLong
      j += 1
    }
    b
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    // cross-partition raggedness (consistent widths per partition, mixed
    // across them) is only visible here
    require(buffer.length == 0 || other.length == 0 ||
      buffer.length == other.length,
      s"graft_fpvec_sum: ragged vector widths across partitions " +
        s"(${buffer.length} vs ${other.length})")
    val (big, small) =
      if (buffer.length >= other.length) (buffer, other) else (other, buffer)
    var j = 0
    while (j < small.length) { big(j) += small(j); j += 1 }
    big
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedPointVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedPointVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FixedPointVectorSum =
    copy(child = newChildren.head)
}
