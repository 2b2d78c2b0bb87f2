package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-gram shingles of a string column, compiled: `word = true`
  * yields space-joined n-token shingles over a single-space split,
  * `word = false` yields sliding character n-grams. Semantics are
  * bit-identical to the HOF formulation in
  * [[graft.functions.TextFunctions.shingles]] / `charNgrams` (first-
  * occurrence order from `array_distinct`, empty array below n
  * tokens/chars, empty array for NULL input — tested), but the per-
  * element work runs as compiled code instead of Catalyst's interpreted
  * lambda evaluator: `transform(sequence(...), ...)` walks an expression
  * tree per element and dominated LSH query execution (measured ~15 s
  * executor time at sf0.1 in q31 before this expression).
  *
  * Character positions use UTF8String code-point operations
  * (`numChars`/`substringSQL`) so multi-byte text matches Spark's
  * `length`/`substr` exactly.
  */
case class NgramShingles(child: Expression, n: Int, word: Boolean,
    distinct: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (word) { if (distinct) "graft_word_shingles" else "graft_word_ngrams_all" }
    else "graft_char_ngrams"

  // NULL input maps to an empty array (exactly like the HOF form, where
  // the `when` condition evaluates to NULL and falls through to the
  // empty-array branch), so the expression itself never returns NULL.
  override def nullable: Boolean = false

  private val space = UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String): ArrayData = {
    if (s == null) return empty
    // distinct = first-occurrence order (MinHash/LSH set semantics);
    // non-distinct = every occurrence in order (frequency analysis, e.g.
    // the q80 repetition filter) — a LinkedHashSet would silently drop
    // the duplicates the caller is there to count
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String]()
    if (word) {
      val toks = s.split(space, -1)
      if (toks.length < n) return empty
      var i = 0
      while (i + n <= toks.length) {
        val slice = new Array[UTF8String](n)
        System.arraycopy(toks, i, slice, 0, n)
        seen.add(UTF8String.concatWs(space, slice: _*))
        i += 1
      }
    } else {
      val len = s.numChars()
      if (len < n) return empty
      // ONE forward pass over the bytes, emitting zero-copy slices at
      // code-point boundaries. The obvious per-position substringSQL(i, n)
      // is O(i) per call (UTF8String seeks char offsets from the byte
      // start), i.e. O(chars²) per document — measured ~100 s of executor
      // time on a single 100 kB single-token doc in the unicode gate.
      // A ring of the last n+1 boundary offsets makes each gram O(1).
      val bytes = s.getBytes
      val starts = new Array[Int](n + 1)
      var b = 0 // byte offset of the next code point
      var c = 0 // code points consumed
      while (b < bytes.length) {
        starts(c % (n + 1)) = b
        b = math.min(b + UTF8String.numBytesForFirstByte(bytes(b)), bytes.length)
        c += 1
        if (c >= n) {
          val st = starts((c - n) % (n + 1))
          seen.add(UTF8String.fromBytes(bytes, st, b - st))
        }
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("ngrams", this, classOf[NgramShingles].getName)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.compute(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}
