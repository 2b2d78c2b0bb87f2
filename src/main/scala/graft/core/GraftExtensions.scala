package graft.core

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions injection point for cluster deployments: register
  * the engine's custom Catalyst expressions at session build time via
  *
  * {{{
  *   spark.sql.extensions=graft.core.GraftExtensions
  * }}}
  *
  * so every session — including ones the engine code never touches
  * (Thrift server, notebooks, spark-sql shell) — can call
  * `graft_hamming`, `graft_fixed_dot`, `graft_word_shingles`,
  * `graft_char_ngrams`, `graft_hash64`, `graft_minhash_slots`,
  * `graft_simhash` and `graft_fpvec_sum` from SQL. In-process callers
  * can keep using [[graft.functions.GraftFunctions.register]] (same
  * registrations, idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import graft.functions.expressions._
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
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

    ext.injectFunction((FunctionIdentifier("graft_hamming"), info("graft_hamming"),
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_fixed_dot"), info("graft_fixed_dot"),
      (exprs: Seq[Expression]) => FixedPointDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_word_shingles"), info("graft_word_shingles"),
      (exprs: Seq[Expression]) => NgramShingles(exprs(0), foldedInt(exprs(1)), word = true)))
    ext.injectFunction((FunctionIdentifier("graft_char_ngrams"), info("graft_char_ngrams"),
      (exprs: Seq[Expression]) => NgramShingles(exprs(0), foldedInt(exprs(1)), word = false)))
    ext.injectFunction((FunctionIdentifier("graft_hash64"), info("graft_hash64"),
      (exprs: Seq[Expression]) => Md5Hash60(exprs(0), foldedInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_slots"), info("graft_minhash_slots"),
      (exprs: Seq[Expression]) => MinHashSlots(exprs(0), foldedInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"), info("graft_simhash"),
      (exprs: Seq[Expression]) => SimHashBits(exprs(0), foldedInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_fpvec_sum"), info("graft_fpvec_sum"),
      (exprs: Seq[Expression]) => FixedPointVectorSum(exprs(0))))
  }
}
