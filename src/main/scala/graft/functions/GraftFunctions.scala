package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function
import graft.functions.expressions.HammingDistance

/** Engine function registry: exposes custom Catalyst expressions to both
  * the SQL surface (`SELECT graft_hamming(a, b)`) and the Column API
  * ([[hamming]]). Registration is idempotent — call it on any session
  * before using the wrappers. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_hamming",
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1)), "built-in")
  }

  /** Hamming distance of two int64 signature columns (codegen'd). */
  def hamming(a: Column, b: Column): Column =
    call_function("graft_hamming", a, b)
}
