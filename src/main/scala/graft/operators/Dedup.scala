package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators (SURVEY §2.4 A2/A3 + U6 north-star ops).
  *
  * Scale notes (100 TB design point):
  *  - keepLatest / firstWins are single hash-shuffles on the dedup key;
  *    partial aggregation applies before the exchange.
  *  - minhashLshPairs never compares all pairs: candidates come from a
  *    self-equi-join on (band, bandKey) — the standard LSH bucket join —
  *    so cost is O(near-duplicates), not O(n²). The exact-Jaccard
  *    verification only runs on candidates.
  */
object Dedup {

  /** A3 REPLACE-WITH-LATEST: one row per key, the greatest by `order`. */
  def keepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A2 DISCARD: one row per key, the least by `order` (first wins). */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact duplicate clusters by a fingerprint expression: one row per
    * fingerprint with group size and representative (min) id. */
  def exactClusters(df: DataFrame, idCol: String, fingerprint: Column): DataFrame =
    df.groupBy(fingerprint.as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** MinHash+LSH near-duplicate pairs over a text column.
    *
    * shingle(n) → k-wide MinHash signature → `bands` bands of k/bands rows
    * → self-join on band key → exact shingle-Jaccard ≥ threshold.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    val sigs = df.select(
      (col(idCol).as("doc_id") +:
        shingles(col(textCol), shingleSize).as("sh") +:
        minhashSig(shingles(col(textCol), shingleSize), numHashes)): _*)

    // band key = concatenated minhash rows of that band
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("_", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
    }: _*)
    val banded = sigs.select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "bkey")))

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

    val sa = sigs.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }
}
