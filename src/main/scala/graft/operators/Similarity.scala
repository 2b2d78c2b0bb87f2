package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design (100 TB):
  *  - [[bruteForceTopK]] broadcasts the (small) query set against the full
  *    corpus — one pass over the big side, no shuffle of the corpus; the
  *    only exchange is the tiny per-query top-k window. This is the exact
  *    baseline.
  *  - [[lshTopK]] first maps every vector to a random-hyperplane bucket
  *    (a narrow projection), then joins queries to corpus *within buckets*
  *    — candidate count drops by ~2^planes, which is the path that holds
  *    when the corpus no longer fits a broadcast-side scan per query.
  */
object Similarity {

  /** Corpus with exact squared norms attached (computed once). Schema
    * contract shared by every operator here: columns `vec_id` and
    * `embedding` (rename upstream if needed). */
  def withNorm2(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.withColumn("n2", norm2Exact(col("embedding")))
  }

  /** Exact top-k cosine neighbors for each query row (queryPred selects
    * queries). Returns (qid, vid, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val e = withNorm2(emb)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine",
        cosineFrom(dotExact(col("q_emb"), col("embedding")), col("q_n2"), col("n2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("vid"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates from shared
    * random-hyperplane buckets (the scale path — no n² comparison), exact
    * fixed-point cosine verification. Returns (a, b, cosine), a < b. */
  def nearDupPairs(emb: DataFrame, planes: Int, dim: Int,
      threshold: Double): DataFrame = {
    // NOT persisted: both self-join sides shuffle on `bucket` over an
    // identical subtree, so ReusedExchange computes it once; a .persist()
    // here would leak cached blocks across invocations (nothing owns the
    // unpersist) — material memory pressure at corpus scale.
    val e = withNorm2(emb)
      .withColumn("bucket", lshBucket(col("embedding"), planes, dim))
      .select("vec_id", "embedding", "n2", "bucket")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("emb_a"),
      col("n2").as("n2_a"), col("bucket"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("emb_b"),
      col("n2").as("n2_b"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine",
        cosineFrom(dotExact(col("emb_a"), col("emb_b")), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** IVF-style ANN top-k (the inverted-file scale path next to
    * [[lshTopK]]): a coarse quantizer of `kCentroids` centroids, every
    * corpus vector assigned to its nearest centroid (one broadcast pass +
    * partially-aggregated argmin — no sort, no all-pairs), queries probe
    * their `nprobe` nearest cells and verify with exact fixed-point
    * cosine. Centroids are a deterministic corpus sample (the vectors
    * with `vec_id < kCentroids`) — FAISS-style IVF also trains its
    * quantizer on a sample; a deterministic sample keeps the DuckDB
    * oracle exact, and swapping in k-means centroids changes only the
    * `cents` frame.
    *
    * Unlike LSH buckets, each corpus vector lives in exactly one cell, so
    * (qid, vid) candidates are unique without a distinct. At scale:
    * assignment is corpus × k dot products, map-side only, followed by a
    * narrow (vec_id, cell) shuffle; probe cost per query is
    * nprobe · n / kCentroids — grow kCentroids ~ √n to balance the two.
    * Returns (qid, vid, cell, cosine, rank). */
  def ivfTopK(emb: DataFrame, queryPred: Column, kCentroids: Int, nprobe: Int,
      k: Int): DataFrame = {
    val e = withNorm2(emb)
    val cents = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        col("n2").as("c_n2"))
    // squared L2 from exact fixed-point parts: n2v + n2c − 2·dot — the
    // same few IEEE ops in both engines ⇒ bit-identical assignment
    val assign = e.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("n2") + col("c_n2") - lit(2.0) * dotExact(col("embedding"), col("c_emb")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cell"))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val wp = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("q_n2") + col("c_n2") - lit(2.0) * dotExact(col("q_emb"), col("c_emb")))
      .withColumn("pr", row_number().over(wp)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("q_emb"), col("q_n2"), col("cid").as("cell"))
    val ev = e.select(col("vec_id"), col("embedding").as("v_emb"), col("n2").as("v_n2"))
    val wr = Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("vec_id"))
    probes.join(assign, Seq("cell")).filter(col("vec_id") =!= col("qid"))
      .join(ev, Seq("vec_id"))
      .withColumn("cosine",
        cosineFrom(dotExact(col("q_emb"), col("v_emb")), col("q_n2"), col("v_n2")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("vid"), col("cell"), col("cosine"),
        col("rank"))
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's
    * random-hyperplane bucket. Returns (qid, vid, bucket, cosine, rank). */
  def lshTopK(emb: DataFrame, queryPred: Column, planes: Int, dim: Int, k: Int): DataFrame = {
    val e = withNorm2(emb).withColumn("bucket", lshBucket(col("embedding"), planes, dim))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("bucket").as("q_bucket"))
    val cand = e.join(broadcast(q),
      col("bucket") === col("q_bucket") && col("vec_id") =!= col("qid"))
    val scored = cand.withColumn("cosine",
      cosineFrom(dotExact(col("q_emb"), col("embedding")), col("q_n2"), col("n2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("vid"), col("bucket"), col("cosine"), col("rank"))
  }
}
