package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The end-to-end training-data curation chain as ONE public operator —
  * the pipeline q72 gates (language-ID → quality → PII redaction →
  * exact dedup → near-dup drop), parameterized, so a library user runs
  * the whole chain without re-assembling the steps:
  *
  * {{{
  *   val kept = Curation.curate(docs, "doc_id", "text")
  * }}}
  *
  * Per-stage shapes (each documented on its operator):
  *  - lang/quality gates: compiled per-row projections (TokenStats).
  *  - redaction: codegen'd regexp_replace.
  *  - exact dedup: ONE firstWins window pass on the content hash — a
  *    groupBy + semi-join back would diamond the filter→redact subtree.
  *  - near-dup drop: the greedy local-minima policy (drop any doc with a
  *    smaller-id near-duplicate, one anti-join). For transitive-cluster
  *    keep-one semantics run [[Dedup.nearDupClusters]] /
  *    [[Dedup.keepOneByPriority]] on [[Dedup.minhashLshPairs]] instead.
  *
  * Returns the surviving rows as (idCol, textCol) with redaction applied.
  */
object Curation {

  final case class Config(
      lang: String = "en",
      minQuality: Double = 0.5,
      redact: Boolean = true,
      nearDupThreshold: Double = 0.5,
      numHashes: Int = 8,
      bands: Int = 4,
      shingleSize: Int = 3)

  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    val gated = docs
      .filter(TextFunctions.langId(text) === cfg.lang &&
        TextFunctions.qualityScore(text) >= cfg.minQuality)
    val redacted =
      if (cfg.redact) gated.select(id, TextFunctions.redact(text).as(textCol))
      else gated.select(id, text)
    val kept = Dedup.firstWins(
        redacted.withColumn("__fp", md5(col(textCol))), Seq("__fp"), Seq(id))
      .drop("__fp")
    val pairs = Dedup.minhashLshPairs(kept, idCol, textCol,
      numHashes = cfg.numHashes, bands = cfg.bands,
      shingleSize = cfg.shingleSize, threshold = cfg.nearDupThreshold)
    kept.join(pairs.select(col("b").as(idCol)).distinct(), Seq(idCol),
      "left_anti")
  }
}
