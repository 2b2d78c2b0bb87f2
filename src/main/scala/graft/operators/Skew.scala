package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-handling joins (SURVEY §6 capacity design point).
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles most
  * runtime skew; explicit salting is the fallback when a single key is so
  * hot that even split shuffle blocks overwhelm a task — the classic
  * 100 TB failure mode. The hot fact side gets a deterministic salt in
  * [0, salts); the dimension side is replicated `salts` ways; the join
  * key becomes (key, salt), spreading one hot key across `salts` tasks.
  */
object Skew {

  /** Valid only for join types where replicating the dim side is harmless:
    * inner/left drop or null-extend unmatched fact rows per salted copy,
    * and left_semi keeps fact rows at most once. Under right/full_outer an
    * unmatched dim row would surface `salts` times, and right_anti/right
    * semantics break the same way — rejected up front. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts (pmod by 0 would " +
      "silently NULL every salt and the join would return no matches)")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(ok.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi, got '$joinType': the dim " +
        "side is replicated per salt, which multiplies unmatched dim rows")
    // Deterministic per-row salt (hash of the row's hashable columns —
    // hash() rejects MapType since Spark 3.0, and wide curation tables
    // often carry map columns): same key's rows scatter uniformly,
    // identical rows land together (harmless).
    val hashable = fact.schema.fields.collect {
      case f if !hasMap(f.dataType) => col(f.name)
    }.toSeq
    require(hashable.nonEmpty, "saltedJoin needs at least one non-map column")
    val salted = fact.withColumn("__salt", pmod(hash(hashable: _*), lit(salts)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew diagnostic: the top-K heaviest join keys with their share of
    * all rows and skew factor (rows-at-key ÷ average rows per key) — the
    * report that decides BEFORE a 100 TB join whether AQE's skew split
    * suffices or a [[saltedJoin]] (salts ≈ ceil(skew_factor)) is needed.
    *
    * Scale: one counted shuffle with map-side partials (the key-count
    * frame), a single-row totals aggregate broadcast back, top-K via
    * TakeOrdered — never a global sort. Ratios are ratio-of-ratios of
    * double casts (no integer product → no overflow at any row count).
    * At extreme key cardinality the exact count frame is itself large;
    * the sampling + count-min-sketch variant trades exactness for a
    * map-only pass — this exact form is one shuffle and always right.
    * Returns (key, cnt, share, skew_factor), heaviest first. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1)
    val k = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val tot = k.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    k.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        ((col("cnt").cast("double") / col("total").cast("double"))
          * col("n_keys").cast("double")).as("skew_factor"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }

  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case org.apache.spark.sql.types.ArrayType(et, _) => hasMap(et)
    case st: org.apache.spark.sql.types.StructType => st.fields.exists(f => hasMap(f.dataType))
    case _ => false
  }

  /** Top-n heavy-hitter keys with frequencies — the diagnostic used to
    * decide whether salting is needed. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(key)).limit(topN)
}
