package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: name, DataFrame builder over an sf dir, and an
  * optional DuckDB-oracle SQL equivalent (SURVEY §5 t2 gate).
  *
  * Contract (driver compare): column names must match between the Spark
  * result and the oracle; rows are pinned with an ORDER BY on both sides;
  * double aggregates go through [[graft.functions.Num]] so they are
  * bit-identical across engines.
  */
final case class Q(
    name: String,
    oracle: Option[String]
)(val build: (SparkSession, String) => DataFrame)

trait QueryModule {
  def all: Seq[Q]
}
