package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions injection point for cluster deployments: register
  * the engine's custom Catalyst expressions at session build time via
  *
  * {{{
  *   spark.sql.extensions=graft.core.GraftExtensions
  * }}}
  *
  * so every session — including ones the engine code never touches
  * (Thrift server, notebooks, spark-sql shell) — can call the graft_*
  * functions from SQL. The function list is
  * [[graft.functions.GraftFunctions.builders]] — ONE table shared with
  * the in-process registration path, so the two can never drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), b))
    }
    // portable md5 composition → compiled Md5Hash60 (same Long, no hex
    // detour); see graft.plans.CompileHashRewrite
    ext.injectOptimizerRule(_ => graft.plans.CompileHashRewrite)
  }
}
