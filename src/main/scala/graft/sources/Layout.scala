package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout writers (SURVEY §2.1 S9 adjunct): how a 100 TB table gets
  * WRITTEN decides what every later scan costs.
  */
object Layout {

  /** Range-clustered parquet layout for scan pruning: one range shuffle
    * (`repartitionByRange`) assigns each output file a narrow slice of
    * the cluster-column order, and the within-file sort tightens parquet
    * row-group min/max stats. Files then cover pairwise-disjoint ranges
    * of the leading cluster column (equal keys never split across
    * files), so a range predicate skips non-matching files wholesale from
    * footer stats alone — no data read. This composes with (and differs
    * from) directory partitioning: partition dirs prune on LOW-cardinality
    * columns; range clustering orders WITHIN them for high-cardinality
    * ones (the Z-order/liquid-clustering use case, one sort cheaper).
    *
    * `numFiles` sizes output files: target ~128 MB–1 GB each at scale —
    * row-group stats only help when files are big enough to be worth
    * skipping. The range shuffle samples the cluster columns to pick
    * balanced boundaries — but only up to per-key mass: equal keys never
    * split, so one value holding a large share of rows produces one
    * correspondingly oversized file. For such hot keys add a finer
    * trailing cluster column (or a hash-salt column) to subdivide. */
  def clusteredWrite(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "clusteredWrite needs at least one cluster column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}
