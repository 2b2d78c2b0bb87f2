package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{call_function, lit}
import graft.functions.expressions.{FixedPointDot, FixedPointVectorSum, HammingDistance, Md5Hash60, MinHashSlots, NgramShingles, SimHashBits}

/** Engine function registry: exposes custom Catalyst expressions to both
  * the SQL surface (`SELECT graft_hamming(a, b)`) and the Column API
  * ([[hamming]]). Registration is idempotent — call it on any session
  * before using the wrappers. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_hamming",
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_fixed_dot",
      (exprs: Seq[Expression]) => FixedPointDot(exprs(0), exprs(1)), "built-in")
    def foldedInt(e: Expression): Int = {
      require(e.foldable,
        s"graft function width/seed argument must be a literal, got: ${e.sql}")
      e.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft function width/seed argument must be integral, got: $other")
      }
    }
    reg.createOrReplaceTempFunction("graft_word_shingles",
      (exprs: Seq[Expression]) =>
        NgramShingles(exprs(0), foldedInt(exprs(1)), word = true), "built-in")
    reg.createOrReplaceTempFunction("graft_char_ngrams",
      (exprs: Seq[Expression]) =>
        NgramShingles(exprs(0), foldedInt(exprs(1)), word = false), "built-in")
    reg.createOrReplaceTempFunction("graft_hash64",
      (exprs: Seq[Expression]) =>
        Md5Hash60(exprs(0), foldedInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_slots",
      (exprs: Seq[Expression]) =>
        MinHashSlots(exprs(0), foldedInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      (exprs: Seq[Expression]) =>
        SimHashBits(exprs(0), foldedInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_fpvec_sum",
      (exprs: Seq[Expression]) =>
        FixedPointVectorSum(exprs(0)), "built-in")
  }

  /** Fixed-point (2^58) scaled dot product of two double-array columns
    * (codegen'd; same values as the HOF formulation). */
  def fixedDot(a: Column, b: Column): Column =
    call_function("graft_fixed_dot", a, b)

  /** Hamming distance of two int64 signature columns (codegen'd). */
  def hamming(a: Column, b: Column): Column =
    call_function("graft_hamming", a, b)

  /** Distinct space-joined n-token shingles (compiled; same semantics as
    * TextFunctions.shingles). */
  def wordShingles(text: Column, n: Int): Column =
    call_function("graft_word_shingles", text, lit(n))

  /** Distinct sliding character n-grams (compiled; same semantics as
    * TextFunctions.charNgrams). */
  def charNgrams(text: Column, n: Int): Column =
    call_function("graft_char_ngrams", text, lit(n))

  /** Portable 60-bit md5-derived hash (compiled; same values as
    * TextFunctions.hash64 and the DuckDB mirror). */
  def hash64c(v: Column, seed: Int): Column =
    call_function("graft_hash64", v, lit(seed))

  /** k-wide MinHash signature of a string-set column as ARRAY<BIGINT>
    * (compiled one-pass; NULL for empty sets — same family/values as the
    * explode form). */
  def minhashSlots(set: Column, k: Int): Column =
    call_function("graft_minhash_slots", set, lit(k))

  /** SimHash of a token-set column (compiled one-pass; same values as the
    * vote-sum form). */
  def simhashBits(set: Column, bits: Int): Column =
    call_function("graft_simhash", set, lit(bits))

  /** Elementwise Σ floor(x_j·2^40) aggregate over array columns — the
    * centroid partial sums without a dimension-explode (see
    * FixedPointVectorSum). */
  def fpVecSum(arr: Column): Column =
    call_function("graft_fpvec_sum", arr)
}
