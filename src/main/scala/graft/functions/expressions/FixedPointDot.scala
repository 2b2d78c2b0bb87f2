package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fixed-point (2^58-scaled) dot product over two numeric-array columns:
  * Σ floor(a[i]·b[i]·2^58) as int64, codegen'd: higher-order functions run
  * interpreted per element, while this compiles to a tight primitive loop
  * inside whole-stage codegen.
  *
  * Accepts `array<float>` OR `array<double>` PER SIDE, natively: a
  * float element is widened per-element inside the loop
  * (`(double) getFloat(i)` — exact, like any float→double cast), so the
  * raw embeddings column feeds the loop directly. This matters at scale:
  * the previous `cast(embedding AS array<double>)` at every call site
  * materialized a fresh double array per ROW PER SIDE — ~10 GB of
  * transient allocations for the sf10 corpus ANN's 10M candidate pairs —
  * for values the loop could widen register-to-register. Other element
  * types still implicit-cast to array<double>: `inputTypes` mirrors a
  * resolved float-array child (so the analyzer inserts no cast) and
  * expects array<double> otherwise. (`TypeCollection` would express
  * this directly but is `private[sql]`.)
  *
  * Bit-identical to the zip_with + aggregate HOF formulation in
  * [[graft.functions.VectorFunctions]] for equal-length arrays with no
  * null elements — the embeddings-table contract. Semantics deliberately
  * DIVERGE outside that contract: the HOF form returns NULL when lengths
  * differ (zip_with pads with NULL, which poisons the aggregate) or any
  * element is NULL, whereas this expression truncates to the shorter
  * length and skips null elements, returning a number. Covered by
  * FunctionsSpec's divergent-case tests.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private def isFloatSide(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  override def inputTypes: Seq[DataType] = Seq(left, right).map { e =>
    if (isFloatSide(e)) ArrayType(FloatType) else ArrayType(DoubleType)
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fixed_dot"

  private final val Scale = 2.88230376151711744e17 // 2^58

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloatSide(left), isFloatSide(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        s += math.floor(xv * yv * Scale).toLong
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $s += (long) java.lang.Math.floor(
              ${get(a, isFloatSide(left))} * ${get(b, isFloatSide(right))}
                * 2.88230376151711744E17D);
          }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}
