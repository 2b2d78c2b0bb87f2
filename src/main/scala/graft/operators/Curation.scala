package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-stratum ADAPTIVE quality floor: instead of one global quality
    * cutoff (which over-prunes whole sources whose score distribution
    * sits low — e.g. forum text vs encyclopedia), each stratum keeps its
    * own top (100−pct)%: the floor is the EXACT pct-th percentile of
    * `scoreCol` within the stratum, picked by all-integer rank selection
    * (`ceil(pct·n/100)` via integer div, ties broken on `idCol`) so
    * every engine selects the identical element — no interpolation, no
    * float percentile arithmetic to drift. Emits the input rows plus
    * (score, floor, kept = score ≥ floor); kept rows INCLUDE every row
    * tied with the floor value.
    *
    * Scale: one shuffle on the strata columns + a per-stratum window
    * sort — exact per-group rank selection serializes per stratum, the
    * same deliberate trade as the winsorize bounds (q89): curation
    * strata (source × lang × …) are many and bounded, which is the
    * shape that parallelizes. For a single giant stratum use q68's
    * bounded-sketch approx_percentile to pick the floor instead. */
  def adaptiveQualityFloor(df: DataFrame, strata: Seq[String],
      scoreCol: Column, idCol: String, pct: Int = 10): DataFrame = {
    require(strata.nonEmpty, "adaptiveQualityFloor needs at least one stratum")
    require(pct >= 1 && pct <= 99, s"pct must be in [1, 99], got $pct")
    // fail fast: silently replacing caller columns would hand downstream
    // code the wrong values (same contract as stratifiedCap's rn guard)
    Seq("score", "floor", "kept").foreach(c =>
      require(!df.columns.contains(c),
        s"adaptiveQualityFloor emits a '$c' column; input already has one"))
    val byStratum = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
    // a NULL score would rank FIRST (Spark ASC NULLS FIRST, DuckDB
    // defaults NULLS LAST — the cross-engine parity this op promises
    // breaks), and a stratum whose floor rank lands on a NULL-score row
    // gets floor = NULL → kept = NULL for every row, silently dropping
    // the whole stratum through a kept-filter. Corrupt input for a
    // cutoff operator — fail loudly, wired through the ranked column so
    // every row passes the guard
    val ranked = df.withColumn("score",
        when(scoreCol.isNull, raise_error(concat(
          lit("adaptiveQualityFloor: NULL score for id "),
          col(idCol).cast("string"))))
        .otherwise(scoreCol))
      .withColumn("__rn", row_number()
        .over(byStratum.orderBy(col("score"), col(idCol))).cast("long"))
      .withColumn("__n", count(lit(1)).over(byStratum))
    ranked
      .withColumn("floor",
        max(when(col("__rn") === expr(s"($pct * __n + 99) div 100"),
          col("score"))).over(byStratum))
      .withColumn("kept", col("score") >= col("floor"))
      .drop("__rn", "__n")
  }
}
