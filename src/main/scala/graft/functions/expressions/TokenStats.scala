package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-document token statistics in ONE compiled pass: token count,
  * distinct-token count, distinct `shingleN`-token shingle count, and
  * occurrence counts against two fixed word lists (stopwords, language
  * markers). Field-for-field bit-identical to the HOF formulations in
  * [[graft.functions.TextFunctions]] —
  *   n_tokens   = size(split(text, " "))
  *   n_distinct = size(array_distinct(split(text, " ")))
  *   n_shingles = size(shingles(text, shingleN))   (0 below shingleN tokens)
  *   n_stop     = size(filter(tokens, t -> t IN stopwords))
  *   n_marker   = size(filter(tokens, t -> t IN markers))
  * — but as a single tokenization instead of five interpreted lambda
  * walks: Catalyst's `transform`/`filter` HOFs evaluate an expression tree
  * per element with no codegen, which made the text-stats queries the
  * hottest non-LSH scan path in the engine (the same compile-once
  * principle as the reference's pre-compiled regex scan path,
  * /root/reference/utils/regex.c:96-170).
  *
  * NULL text yields NULL (matching the built-ins, where every derived
  * stat of a NULL split is NULL).
  */
case class TokenStats(
    child: Expression,
    shingleN: Int,
    stopwords: Seq[String],
    markers: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(shingleN >= 1, s"shingle size must be >= 1, got $shingleN")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_marker", IntegerType, nullable = false)))
  override def prettyName: String = "graft_token_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    markers.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private val space = UTF8String.fromString(" ")

  def compute(s: UTF8String): GenericInternalRow = {
    val toks = s.split(space, -1)
    val distinct = new java.util.HashSet[UTF8String]()
    var nStop = 0
    var nMarker = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      if (stopSet.contains(t)) nStop += 1
      if (markerSet.contains(t)) nMarker += 1
      i += 1
    }
    var nShingles = 0
    if (toks.length >= shingleN) {
      val seen = new java.util.HashSet[UTF8String]()
      var j = 0
      while (j + shingleN <= toks.length) {
        val slice = new Array[UTF8String](shingleN)
        System.arraycopy(toks, j, slice, 0, shingleN)
        seen.add(UTF8String.concatWs(space, slice: _*))
        j += 1
      }
      nShingles = seen.size
    }
    new GenericInternalRow(
      Array[Any](toks.length, distinct.size, nShingles, nStop, nMarker))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokstats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** Per-document n-token-shingle repetition stats in ONE compiled pass:
  * struct(top_c, total_c) where total_c is the number of (overlapping,
  * duplicates kept) n-token shingles — max(tokens − n + 1, 0) — and
  * top_c is the multiplicity of the most frequent shingle (0 when the
  * doc is shorter than n tokens). top_c/total_c is the Gopher-style
  * most-frequent-n-gram share quality signal (q80).
  *
  * Replaces the corpus-shaped explode(wordShinglesAll) →
  * groupBy(doc_id, shingle) → groupBy(doc_id) pipeline: (doc_id,
  * shingle) is nearly unique, so partial aggregation cannot collapse the
  * exchange and the shuffle carries ~tokens-per-doc rows PER DOCUMENT —
  * measured superlinear in the sf1 soak from shuffle pressure alone.
  * The stat only ever depends on one row, so this computes it row-local:
  * zero shuffles, corpus scale irrelevant. Shingle identity matches the
  * explode form exactly — tokens cannot contain the space delimiter, so
  * adjacent-token equality is space-joined-string equality. NULL text
  * yields NULL (the explode form's join-miss is handled by the caller's
  * zero-guard, same as here). */
case class ShingleRepetition(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("top_c", IntegerType, nullable = false),
    StructField("total_c", IntegerType, nullable = false)))
  override def prettyName: String = "graft_shingle_rep"

  private val space = UTF8String.fromString(" ")

  def compute(s: UTF8String): GenericInternalRow = {
    val toks = s.split(space, -1)
    val total = math.max(toks.length - n + 1, 0)
    var top = 0
    if (total > 0) {
      val counts = new java.util.HashMap[UTF8String, Integer]()
      var j = 0
      while (j + n <= toks.length) {
        val slice = new Array[UTF8String](n)
        System.arraycopy(toks, j, slice, 0, n)
        val c = counts.merge(UTF8String.concatWs(space, slice: _*), 1,
          (a: Integer, b: Integer) => Integer.valueOf(a + b))
        if (c > top) top = c
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](top, total))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shrep", this, classOf[ShingleRepetition].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleRepetition =
    copy(child = newChild)
}

/** Order-sensitive rolling (polynomial) document fingerprint, compiled:
  * fold h -> (h*31 + (hash60(t) mod M)) mod M over the whitespace token
  * stream, seeded with 7, M = 2^31-1 — bit-identical to
  * [[graft.functions.TextFunctions.rollingFingerprint]]'s
  * `aggregate(transform(...))` HOF pair (hash60 values are non-negative,
  * so `pmod` and `%` agree, and the accumulator stays below 2^31 — the
  * product never overflows a long). One compiled loop per row instead of
  * two interpreted lambda walks per token. NULL text yields NULL (the HOF
  * form's aggregate over a NULL array is NULL). */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_rolling_fp"

  private val space = UTF8String.fromString(" ")
  private val suffix = ":0".getBytes("UTF-8")
  private val M = 2147483647L

  def compute(s: UTF8String): Long = {
    val toks = s.split(space, -1)
    var acc = 7L
    var i = 0
    while (i < toks.length) {
      acc = (acc * 31 + Md5Hash60.hash60(toks(i), suffix) % M) % M
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollfp", this, classOf[RollingFingerprint].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
