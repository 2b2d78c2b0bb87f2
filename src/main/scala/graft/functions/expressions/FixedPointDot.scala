package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-point (2^58-scaled) dot product over two double-array columns:
  * Σ floor(a[i]·b[i]·2^58) as int64, codegen'd: higher-order functions run
  * interpreted per element, while this compiles to a tight primitive loop
  * inside whole-stage codegen.
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

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fixed_dot"

  private final val Scale = 2.88230376151711744e17 // 2^58

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += math.floor(x.getDouble(i) * y.getDouble(i) * Scale).toLong
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
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $s += (long) java.lang.Math.floor(
              $a.getDouble($i) * $b.getDouble($i) * 2.88230376151711744E17D);
          }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}
