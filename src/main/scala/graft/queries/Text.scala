package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + deduplication inventory over the `documents` table
  * (north-star LLM-pipeline ops; SURVEY §2.8 U6).
  *
  * All hashes are md5-derived so every op — including the full
  * MinHash+LSH near-duplicate pipeline — has an exact DuckDB oracle.
  */
object Text extends QueryModule {

  // the shared DuckDB-mirror hash derivations — one definition for every
  // query module (DkSql), so a parity fix reaches all oracles at once
  import DkSql.{dkHash, dkMix}

  /** DuckDB: distinct 3-token shingles of `text` (requires tk = tokens). */
  private val dkShingles =
    "list_distinct(list_transform(generate_series(1, len(tk)-2), i -> array_to_string(tk[i:i+2],' ')))"

  /** DuckDB: the full LSH near-dup pair pipeline as a CTE chain ending in
    * j(a, b, jaccard) over source relation `src` — shared by q31 (pairs),
    * q71 (clusters) and q72 (pipeline). */
  private def dkLshPairsFrom(src: String) = s"""sp AS (SELECT doc_id, string_split(text,' ') tk FROM $src),
      sh AS (SELECT doc_id, $dkShingles AS sh FROM sp),
      mh AS (SELECT doc_id, sh,
        ${(0 until 8).map(i =>
          s"list_min(list_transform(sh, t -> xor(${dkHash("t", 0)}, ${dkMix(i)}))) AS mh$i").mkString(",\n        ")}
      FROM sh),
      bands AS (
        ${(0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, CAST(mh${2 * b} AS VARCHAR)||'_'||CAST(mh${2 * b + 1} AS VARCHAR) AS bkey FROM mh")
          .mkString("\n        UNION ALL ")}),
      cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      j AS (SELECT c.a, c.b,
        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
        FROM cand c JOIN mh sa ON sa.doc_id = c.a JOIN mh sb ON sb.doc_id = c.b)"""

  private lazy val dkLshPairs = dkLshPairsFrom("documents")

  /** DuckDB: connected-component labels over the LSH pair list —
    * p(a, b) → lab(id, cluster = min id). Requires the dkLshPairs chain
    * (relation `j`) in scope and a RECURSIVE WITH; the ONE chain shared
    * by q71, q93 and q96 so a parity fix reaches every consumer. */
  private val dkClusters = """p AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
      edges AS (SELECT a AS src, b AS dst FROM p
                UNION ALL SELECT b, a FROM p),
      walk(id, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, w.lab FROM edges e JOIN walk w ON w.id = e.dst),
      lab AS (SELECT id, MIN(lab) AS cluster FROM walk GROUP BY id)"""

  /** DuckDB mirror of Sampling.assignSplit(id, seed = 42) — shared by
    * q95 and q96. */
  private def dkSplit(idExpr: String): String =
    s"""CASE WHEN ${dkHash(s"CAST($idExpr AS VARCHAR)", 42)} % 100 < 80 THEN 'train'
             WHEN ${dkHash(s"CAST($idExpr AS VARCHAR)", 42)} % 100 < 90 THEN 'val'
             ELSE 'test' END"""

  /** The sharded packing plan (q78) — also driven directly by the plan-
    * shape spec, which asserts no single-partition exchange survives. */
  def sqlPackingSharded(s: org.apache.spark.sql.SparkSession, d: String,
      shards: Int = 8, budget: Int = 256): org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.chunks(col("text"), 32, 8))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        pmod(graft.functions.GraftFunctions.hash64c(
          col("doc_id").cast("string"), 7), lit(shards.toLong)).as("shard"),
        size(split(col("chunk"), " ")).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .select(col("shard"),
        floor((col("cum") - col("nt")) / budget).cast("long").as("pack_id"),
        col("nt"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("nt")).as("n_tokens"))
      .orderBy("shard", "pack_id")
  }

  val all: Seq[Q] = Seq(

    // ---- PII-style redaction (training-data scrubbing) ----
    // Synthetic contact string exercises both patterns: the constructed
    // email masks to [EMAIL] (before its digits can match), and the
    // Customer#NNNNNNNNN digit run masks to [ID].
    Q("q70_redact", Some("""
      SELECT c_custkey,
        regexp_replace(c_name, '[0-9]{6,}', '[ID]', 'g') AS masked_name,
        regexp_replace(
          regexp_replace(lower(c_name) || '@example.com',
            '[A-Za-z0-9#._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '[0-9]{6,}', '[ID]', 'g') AS masked_contact
      FROM customer ORDER BY c_custkey""")) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]{6,}", "[ID]").as("masked_name"),
        redact(concat(lower(col("c_name")), lit("@example.com")))
          .as("masked_contact")
      ).orderBy("c_custkey")
    },

    // ---- token counting (U6 text stats) ----
    Q("q24_token_stats", Some("""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents)
      SELECT doc_id,
        CAST(len(tk) AS INT) AS n_tokens,
        CAST(len(list_distinct(tk)) AS INT) AS n_distinct_tokens,
        CAST(len(list_distinct(list_transform(generate_series(1, len(tk)-2),
          i -> array_to_string(tk[i:i+2],' ')))) AS INT) AS n_shingles
      FROM sp ORDER BY doc_id""")) { (s, d) =>
      // one compiled tokenization per row (TokenStats) — the three HOF
      // stats this replaces each walked the token array interpreted
      val st = tokenStatsOf(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        st.getField("n_tokens").as("n_tokens"),
        st.getField("n_distinct").as("n_distinct_tokens"),
        st.getField("n_shingles").as("n_shingles")
      ).orderBy("doc_id")
    },

    // ---- quality scoring ----
    Q("q25_text_quality", Some("""
      WITH f AS (
        SELECT doc_id,
          len(string_split(text,' ')) AS n,
          CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
            / len(string_split(text,' ')) AS atl,
          CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE)
            / len(string_split(text,' ')) AS swr
        FROM documents)
      SELECT doc_id, atl AS avg_token_len, swr AS stopword_ratio,
        least(1.0, CAST(n AS DOUBLE)/100.0)*0.5 + (1.0 - swr)*0.3
          + least(1.0, atl/8.0)*0.2 AS quality_score
      FROM f ORDER BY doc_id""")) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        avgTokenLen(col("text")).as("avg_token_len"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        qualityScore(col("text")).as("quality_score")
      ).orderBy("doc_id")
    },

    // ---- language-ID heuristic vs labels ----
    Q("q26_lang_id", Some("""
      WITH p AS (
        SELECT lang,
          CASE WHEN len(list_filter(string_split(text,' '),
            t -> t IN ('the','a','of','and','is'))) > 0
          THEN 'en' ELSE 'und' END AS pred
        FROM documents)
      SELECT lang, COUNT(*) AS n,
        CAST(SUM(CASE WHEN pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en
      FROM p GROUP BY lang ORDER BY lang""")) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("pred", langId(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === "en", 1L).otherwise(0L)).as("n_pred_en"))
        .orderBy("lang")
    },

    // ---- explode + global term frequencies, top-k ----
    Q("q27_token_freq", Some("""
      SELECT t AS token, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text,' ')) AS t FROM documents)
      GROUP BY t ORDER BY cnt DESC, token LIMIT 20""")) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token")).limit(20)
    },

    // ---- prefix-fingerprint dedup clusters ----
    // `WHERE text IS NOT NULL` mirrors exactClusters' NULL-fingerprint
    // exclusion (Dedup.scala): a NULL text has no content to fingerprint,
    // and grouping all NULL docs into one "duplicate cluster" would
    // wrongly collapse them to a single keep_id. Same guard on q29/q94.
    Q("q28_prefix_dedup", Some("""
      SELECT md5(array_to_string((string_split(text,' '))[1:5],' ')) AS fingerprint,
        COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      FROM documents WHERE text IS NOT NULL
      GROUP BY 1 ORDER BY fingerprint""")) { (s, d) =>
      Dedup.exactClusters(Tables.documents(s, d), "doc_id",
          md5(array_join(slice(tokens(col("text")), 1, 5), " ")))
        .orderBy("fingerprint")
    },

    // ---- exact dedup by full-content fingerprint ----
    Q("q29_exact_dedup", Some("""
      SELECT md5(text) AS fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      FROM documents WHERE text IS NOT NULL
      GROUP BY 1 ORDER BY fingerprint""")) { (s, d) =>
      Dedup.exactClusters(Tables.documents(s, d), "doc_id", md5(col("text")))
        .orderBy("fingerprint")
    },

    // ---- canonical (bag-of-words) fingerprint dedup ----
    // Normalize-before-fingerprint: the fingerprint is md5 of the SORTED
    // token stream (multiset — multiplicity kept), so documents that
    // differ only in token order collapse into one cluster. The general
    // pattern: any canonicalization (case-fold, punctuation strip,
    // unicode NFC) runs as a per-row projection in front of the same
    // one-shuffle exactClusters; this bag form is the strongest
    // order-insensitive member. Same plan shape as q29.
    Q("q94_bag_fingerprint_dedup", Some("""
      SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
          AS fingerprint,
        COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      FROM documents WHERE text IS NOT NULL
      GROUP BY 1 ORDER BY fingerprint""")) { (s, d) =>
      Dedup.exactClusters(Tables.documents(s, d), "doc_id",
          md5(array_join(array_sort(tokens(col("text"))), " ")))
        .orderBy("fingerprint")
    },

    // ---- MinHash signatures (8 seeds over 3-shingles) ----
    Q("q30_minhash_sig", Some(s"""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      sh AS (SELECT doc_id, $dkShingles AS sh FROM sp)
      SELECT doc_id,
        ${(0 until 8).map(i =>
          s"list_min(list_transform(sh, t -> xor(${dkHash("t", 0)}, ${dkMix(i)}))) AS mh$i").mkString(",\n        ")}
      FROM sh ORDER BY doc_id""")) { (s, d) =>
      Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text",
          numHashes = 8, shingleSize = 3)
        .orderBy("doc_id")
    },

    // ---- full MinHash+LSH near-duplicate pipeline (bucket join, no n²) ----
    Q("q31_lsh_near_dup", Some(s"""
      WITH $dkLshPairs
      SELECT a, b, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY a, b""")) { (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
        .orderBy("a", "b")
    },

    // ---- near-dup clusters + keep-one policy (connected components) ----
    // DuckDB mirror: recursive CTE propagates every reachable node id,
    // MIN per node = the component's canonical (minimum) id — identical
    // to the Spark side's min-label propagation fixpoint.
    Q("q71_near_dup_clusters", Some(s"""
      WITH RECURSIVE $dkLshPairs,
      $dkClusters
      SELECT id AS doc_id, cluster, (cluster = id) AS keep
      FROM lab ORDER BY doc_id""")) { (s, d) =>
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      Dedup.nearDupClusters(pairs)
        .select(col("id").as("doc_id"), col("cluster"),
          (col("cluster") === col("id")).as("keep"))
        .orderBy("doc_id")
    },

    // ---- policy keep-one: curated sources win duplicate clusters ----
    // q71 keeps min-id per cluster; real curation keeps the BEST copy —
    // here "curated" sources (src0–src4) outrank the rest, id breaks
    // ties. Same CC labels, one metadata join + windowed min_by on
    // (priority, id); the policy is a Column, so any ranking (quality
    // score, length, recency) slots in unchanged.
    Q("q93_priority_keep_one", Some(s"""
      WITH RECURSIVE $dkLshPairs,
      $dkClusters,
      m AS (SELECT l.id, l.cluster,
          CASE WHEN d.source IN ('src0','src1','src2','src3','src4')
            THEN 0 ELSE 1 END AS prio
        FROM lab l JOIN documents d ON d.doc_id = l.id),
      k AS (SELECT cluster, id AS keeper FROM (
        SELECT cluster, id,
          ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY prio, id) AS rn
        FROM m) WHERE rn = 1)
      SELECT m.id AS doc_id, m.cluster, k.keeper, (m.id = k.keeper) AS kept
      FROM m JOIN k ON k.cluster = m.cluster
      ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      val curated = Seq("src0", "src1", "src2", "src3", "src4")
      Dedup.keepOneByPriority(
          Dedup.nearDupClusters(pairs),
          docs.select("doc_id", "source"), "doc_id",
          when(col("source").isin(curated: _*), 0).otherwise(1))
        .select(col("id").as("doc_id"), col("cluster"), col("keeper"),
          col("kept"))
        .orderBy("doc_id")
    },

    // ---- end-to-end training-data pipeline (capstone) ----
    // lang-ID filter → quality gate → PII redaction → exact dedup
    // (keep min id per content hash) → near-dup drop. The near-dup
    // policy here is the greedy local-minima form (drop any doc with a
    // smaller near-duplicate — one anti-join); q71's connected components
    // is the exact-canonical alternative when transitive clusters matter.
    Q("q72_training_pipeline", Some(s"""
      WITH f AS (SELECT doc_id, text FROM documents
        WHERE len(list_filter(string_split(text,' '),
                t -> t IN ('the','a','of','and','is'))) > 0
          AND least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100.0)*0.5
            + (1.0 - CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE)
                / len(string_split(text,' ')))*0.3
            + least(1.0, (CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
                / len(string_split(text,' ')))/8.0)*0.2 >= 0.5),
      r AS (SELECT doc_id,
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9#._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '[0-9]{6,}', '[ID]', 'g') AS text FROM f),
      ex AS (SELECT MIN(doc_id) AS doc_id FROM r GROUP BY md5(text)),
      kept AS (SELECT r.doc_id, r.text FROM r JOIN ex ON r.doc_id = ex.doc_id),
      ${dkLshPairsFrom("kept")},
      p AS (SELECT a, b FROM j WHERE jaccard >= 0.5)
      SELECT k.doc_id,
        CAST(len(string_split(k.text,' ')) AS INT) AS n_tokens
      FROM kept k WHERE k.doc_id NOT IN (SELECT b FROM p)
      ORDER BY k.doc_id""")) { (s, d) =>
      // the whole chain is the public operator — this query gates it
      graft.operators.Curation.curate(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // ---- deterministic hash split (train/val/test curation) ----
    // Hash-percentile assignment is stable under repartitioning, retries
    // and row order — unlike RNG sample/randomSplit — and both engines
    // reproduce it exactly from md5. Counts per (lang, split) hash-gate
    // the whole assignment.
    Q("q74_hash_split", Some(s"""
      WITH h AS (SELECT lang,
        ${dkHash("CAST(doc_id AS VARCHAR)", 42)} % 100 AS b
        FROM documents)
      SELECT lang,
        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        COUNT(*) AS n
      FROM h GROUP BY 1, 2 ORDER BY lang, split""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("split",
          graft.operators.Sampling.assignSplit(col("doc_id"), seed = 42))
        .groupBy("lang", "split").agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },

    // ---- split-leakage audit: near-dup pairs crossing the hash split ----
    // The check that must run AFTER splitting and BEFORE training: a
    // train doc near-duplicating a test doc leaks the eval. Composes the
    // q31 LSH pair list with the q74 split assignment (same md5 hash,
    // seed 42) and counts pairs per (split_a, split_b) cell — nonzero
    // off-diagonal cells are leaks, and the standard remedies (drop the
    // train member, or split by cluster instead of doc) both start from
    // exactly this pair list. Scale: pair-list-sized joins against a
    // per-doc projection; nothing corpus².
    Q("q95_split_leakage", Some(s"""
      WITH $dkLshPairs,
      spl AS (SELECT doc_id, ${dkSplit("doc_id")} AS split FROM documents),
      p AS (SELECT a, b FROM j WHERE jaccard >= 0.5)
      SELECT sa.split AS split_a, sb.split AS split_b,
        COUNT(*) AS n_pairs, (sa.split <> sb.split) AS leak
      FROM p JOIN spl sa ON sa.doc_id = p.a JOIN spl sb ON sb.doc_id = p.b
      GROUP BY 1, 2 ORDER BY split_a, split_b""")) { (s, d) =>
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      val sp = Tables.documents(s, d).select(col("doc_id"),
        graft.operators.Sampling.assignSplit(col("doc_id"), seed = 42).as("split"))
      pairs
        .join(sp.select(col("doc_id").as("a"), col("split").as("split_a")), Seq("a"))
        .join(sp.select(col("doc_id").as("b"), col("split").as("split_b")), Seq("b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leak", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    },

    // ---- cluster-aware split: the q95 leak remedy ----
    // Assign splits by near-dup CLUSTER representative instead of doc id:
    // coalesce(cluster, doc_id) keys the hash split, so every member of a
    // duplicate cluster lands in the same split and LSH pairs can never
    // cross train/test by construction. `n_moved` counts docs whose split
    // changed vs the doc-keyed q74 assignment — the real, non-vacuous
    // measure of how much leakage the remedy removed. Scale: the cluster
    // frame is pair-list-sized; everything else is the q74 projection.
    Q("q96_cluster_split", Some(s"""
      WITH RECURSIVE $dkLshPairs,
      $dkClusters,
      rep AS (SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS rep
        FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
      spl AS (SELECT doc_id, ${dkSplit("rep")} AS split,
        ${dkSplit("doc_id")} AS doc_split
        FROM rep)
      SELECT split, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN split <> doc_split THEN 1 ELSE 0 END) AS BIGINT)
          AS n_moved
      FROM spl GROUP BY split ORDER BY split""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      val clusters = Dedup.nearDupClusters(pairs)
        .withColumnRenamed("id", "doc_id")
      docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("rep"))
        .select(
          graft.operators.Sampling.assignSplit(col("rep"), seed = 42).as("split"),
          graft.operators.Sampling.assignSplit(col("doc_id"), seed = 42)
            .as("doc_split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("split") =!= col("doc_split"), 1L).otherwise(0L))
            .as("n_moved"))
        .orderBy("split")
    },

    // ---- stratified cap-K sampling (corpus balancing) ----
    // Down-weight over-represented (source, lang) slices by keeping at
    // most 5 docs per stratum, chosen by smallest seeded id-hash — an
    // exact without-replacement uniform draw that is deterministic across
    // layout, retries and engines (the q74 rationale, per-stratum). One
    // shuffle on the stratum key; each window sorts only its stratum.
    Q("q83_stratified_sample", Some(s"""
      WITH t AS (SELECT source, lang, doc_id,
        ${dkHash("CAST(doc_id AS VARCHAR)", 7)} AS h FROM documents),
      r AS (SELECT source, lang, doc_id,
        ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rn
        FROM t)
      SELECT source, lang, doc_id, CAST(rn AS INT) AS rn
      FROM r WHERE rn <= 5 ORDER BY source, lang, rn""")) { (s, d) =>
      graft.operators.Sampling.stratifiedCap(
          Tables.documents(s, d).select("source", "lang", "doc_id"),
          strata = Seq("source", "lang"), idCol = "doc_id", cap = 5, seed = 7)
        .select(col("source"), col("lang"), col("doc_id"), col("rn"))
        .orderBy("source", "lang", "rn")
    },

    // ---- token-budget mixture sampling (materialize the data mix) ----
    // The step AFTER q104 decides per-source shares: within each source,
    // take docs in seeded-hash order until the source's token budget is
    // exhausted (Sampling.tokenBudgetSample). Budget here is a constant
    // 400 tokens per source (sized to CUT: sources carry ~1.4k tokens
    // each at gate scale); production joins the q104 weight table to
    // supply per-stratum budgets — the operator takes a Column. The cap
    // is by TOKENS (what an LM consumes), not documents, and the draw is
    // repartition/retry-stable because the order is a pure id hash.
    Q("q121_token_budget_sample", Some(s"""
      WITH t AS (SELECT doc_id, source,
          CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
          ${dkHash("CAST(doc_id AS VARCHAR)", 11)} AS h FROM documents),
      r AS (SELECT doc_id, source, nt,
          CAST(SUM(nt) OVER (PARTITION BY source ORDER BY h, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM t)
      SELECT doc_id, source, cum_tokens
      FROM r WHERE cum_tokens <= 400 ORDER BY doc_id""")) { (s, d) =>
      graft.operators.Sampling.tokenBudgetSample(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            tokenCount(col("text")).cast("long").as("nt")),
          strata = Seq("source"), idCol = "doc_id", tokens = col("nt"),
          budget = lit(400L), seed = 11)
        .select(col("doc_id"), col("source"), col("cum_tokens"))
        .orderBy("doc_id")
    },

    // ---- length-matched contrast sample (classifier training prep) ----
    // A curated-vs-crawl quality classifier must not cheat by reading
    // document LENGTH, so the training contrast set is matched: bucket
    // by n_chars//50, and within each bucket keep the same number of
    // curated (src0-4) and crawl docs — the smaller side's count — by
    // seeded-hash draw (Sampling.matchedSample). Kept sides then have
    // identical length histograms by construction; one-sided buckets
    // drop (nothing to match against).
    Q("q122_matched_contrast_sample", Some(s"""
      WITH t AS (SELECT doc_id,
          (source IN ('src0','src1','src2','src3','src4')) AS curated,
          CAST(n_chars // 50 AS BIGINT) AS bucket,
          ${dkHash("CAST(doc_id AS VARCHAR)", 13)} AS h FROM documents),
      c AS (SELECT bucket, curated, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
      m AS (SELECT bucket, MIN(cnt) AS cap, COUNT(*) AS nsides
        FROM c GROUP BY bucket),
      r AS (SELECT t.doc_id, t.curated, t.bucket,
          ROW_NUMBER() OVER (PARTITION BY t.bucket, t.curated
            ORDER BY t.h, t.doc_id) AS rn
        FROM t)
      SELECT r.doc_id, r.curated, r.bucket
      FROM r JOIN m ON m.bucket = r.bucket
      WHERE m.nsides = 2 AND r.rn <= m.cap
      ORDER BY doc_id""")) { (s, d) =>
      val curated = Seq("src0", "src1", "src2", "src3", "src4")
      graft.operators.Sampling.matchedSample(
          Tables.documents(s, d).select(col("doc_id"),
            col("source").isin(curated: _*).as("curated"),
            expr("n_chars div 50").cast("long").as("bucket")),
          sideCol = "curated", bucketCol = "bucket", idCol = "doc_id",
          nSides = 2, seed = 13)
        .select(col("doc_id"), col("curated"), col("bucket"))
        .orderBy("doc_id")
    },

    // ---- per-source signature terms (distinctive-vocabulary report) ----
    // Which tokens make each source LOOK like itself? Add-one smoothed
    // rate ratio of in-source vs rest-of-corpus usage — q116's drift
    // arithmetic pointed across slices instead of across time, so the
    // ranking is all-integer cross-products until one double division
    // (reduction-order independent). Top-5 risers per source; the
    // report a curator reads before trusting source labels, and the
    // feature list a cheap source classifier starts from. Shape: ONE
    // (source, token) count + per-token totals broadcast back, per-
    // source top-k window over the vocabulary-sized aggregate.
    Q("q123_source_signature_terms", Some(s"""
      WITH tk AS (SELECT source, unnest(string_split(text,' ')) AS t
        FROM documents),
      sc AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY source, t),
      tt AS (SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM sc GROUP BY t),
      st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM sc GROUP BY source),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS call,
        COUNT(DISTINCT t) AS v FROM sc),
      r AS (SELECT sc.source, sc.t AS token, CAST(sc.c AS BIGINT) AS cnt,
          CAST((sc.c + 1) * ((SELECT call FROM tot) - st.cs + (SELECT v FROM tot))
            AS DOUBLE)
          / CAST((tt.ct - sc.c + 1) * (st.cs + (SELECT v FROM tot)) AS DOUBLE)
            AS rate_ratio
        FROM sc JOIN tt ON tt.t = sc.t JOIN st ON st.source = sc.source),
      k AS (SELECT source, token, cnt, rate_ratio,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY rate_ratio DESC, token) AS rn
        FROM r)
      SELECT source, token, cnt, rate_ratio, CAST(rn AS INT) AS rank
      FROM k WHERE rn <= 5 ORDER BY source, rank""")) { (s, d) =>
      // sc feeds FOUR consumers (tt, st, tot, r) and each would re-run
      // the corpus tokenize+explode+agg from scratch (pruned columns
      // de-canonicalize the branches, so ReuseExchange never fires —
      // the plan showed 4 parquet scans). The frame is (source × term)
      // counts — vocabulary-scale, the q87 "df table" size class, NOT
      // corpus-scale — so pinning it executor-locally trades one
      // postings-table materialization for three corpus tokenization
      // passes (measured 0.84 → 0.73 s min-of-5 at sf0.1; at 100 TB
      // the trade only widens).
      val sc = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val tt = sc.groupBy("t").agg(sum(col("c")).as("ct"))
      val st = sc.groupBy("source").agg(sum(col("c")).as("cs"))
      val tot = sc.agg(sum(col("c")).as("call"),
        countDistinct(col("t")).as("v"))
      // The all-integer cross products are exact (and bit-identical to
      // the oracle) only while every factor product fits int64: factors
      // are ≤ call + v ≤ 2·call, so 2·call² < 2^63 ⇒ safe through
      // call ≤ 2e9 total token instances. Beyond that the guard fails
      // loudly (DuckDB's checked BIGINT multiply errors at the same
      // boundary) — at that scale rebuild the ratio from per-term
      // doubles, trading bit-parity for range.
      val r = sc.join(tt, "t").join(broadcast(st), "source")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("t").as("token"), col("c").as("cnt"),
          when(col("call") > 2000000000L, raise_error(concat(
              lit("q123: corpus has "), col("call").cast("string"),
              lit(" token instances > 2e9 — integer rate-ratio would " +
                "overflow; use the double path at this scale")))
            .cast("double"))
          .otherwise(
            ((col("c") + 1) * (col("call") - col("cs") + col("v"))).cast("double")
              / ((col("ct") - col("c") + 1) * (col("cs") + col("v")))
                .cast("double")).as("rate_ratio"))
      val w = Window.partitionBy("source")
        .orderBy(desc("rate_ratio"), asc("token"))
      r.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("source", "rank")
    },

    // ---- benchmark decontamination (shingle-overlap flagging) ----
    // The standard eval-contamination check: flag corpus docs sharing ≥ 2
    // distinct 3-token shingles with any benchmark doc (stand-in
    // benchmark: doc_id < 5). Scale shape: the benchmark side is tiny by
    // contract — its exploded shingle set broadcasts, the corpus side is
    // one scan + compiled shingling, and the overlap count is a partial
    // aggregation; no corpus self-join anywhere. Mirror verifies with
    // list_intersect over the same shingle definition.
    Q("q75_decontamination", Some(s"""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      sh AS (SELECT doc_id, $dkShingles AS sh FROM sp),
      b AS (SELECT doc_id AS bench_id, sh AS bsh FROM sh WHERE doc_id < 5),
      t AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 5)
      SELECT t.doc_id, b.bench_id,
        CAST(len(list_intersect(t.sh, b.bsh)) AS BIGINT) AS n_shared
      FROM t, b
      WHERE len(list_intersect(t.sh, b.bsh)) >= 2
      ORDER BY t.doc_id, b.bench_id""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val sh = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.GraftFunctions.wordShingles(col("text"), 3).as("sh"))
      val bench = sh.filter(col("doc_id") < 5)
        .select(col("doc_id").as("bench_id"), explode(col("sh")).as("t"))
      val train = sh.filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(col("sh")).as("t"))
      train.join(broadcast(bench), Seq("t"))
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy("doc_id", "bench_id")
    },

    // ---- token-window chunking (pre-training prep) ----
    // 32-token windows, 8-token overlap (stride 24); chunk text is
    // emitted with its ordinal and token count. ceil() on an exact
    // integer ratio is engine-portable; chunk strings hash-gate the
    // whole windowing.
    Q("q76_chunking", Some("""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      n AS (SELECT doc_id, tk,
        greatest(1, CAST(ceil(CAST(len(tk) - 8 AS DOUBLE) / 24.0) AS BIGINT)) AS nc
        FROM sp),
      e AS (SELECT doc_id, tk, unnest(generate_series(1, nc)) - 1 AS chunk_id FROM n),
      c AS (SELECT doc_id, chunk_id,
        array_to_string(tk[CAST(chunk_id * 24 + 1 AS INT) : CAST(chunk_id * 24 + 32 AS INT)], ' ') AS chunk
        FROM e)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, chunk,
        CAST(len(string_split(chunk, ' ')) AS INT) AS n_tokens
      FROM c ORDER BY doc_id, chunk_id""")) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.chunks(col("text"), 32, 8))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"), col("chunk"),
          size(split(col("chunk"), " ")).as("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    },

    // ---- sequential packing into fixed token budgets ----
    // The standard pre-training packing pass after chunking: take chunks
    // in deterministic (doc_id, chunk_id) order, accumulate token counts,
    // and cut a new pack every 256 tokens — bin = floor of the running
    // sum BEFORE the chunk, so a chunk straddling the boundary starts the
    // next pack. The unpartitioned window is the declared semantic
    // (globally sequential packs); at corpus scale you partition the
    // window by a hash-bucketed shard and namespace pack ids by shard —
    // packing is embarrassingly parallel across shards since packs never
    // span documents from different shards.
    Q("q77_packing", Some("""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      n AS (SELECT doc_id, tk,
        greatest(1, CAST(ceil(CAST(len(tk) - 8 AS DOUBLE) / 24.0) AS BIGINT)) AS nc
        FROM sp),
      e AS (SELECT doc_id, tk, unnest(generate_series(1, nc)) - 1 AS chunk_id FROM n),
      c AS (SELECT doc_id, chunk_id,
        len(string_split(array_to_string(
          tk[CAST(chunk_id * 24 + 1 AS INT) : CAST(chunk_id * 24 + 32 AS INT)], ' '), ' ')) AS nt
        FROM e),
      r AS (SELECT doc_id, chunk_id, nt,
        CAST(SUM(nt) OVER (ORDER BY doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM c)
      SELECT CAST(floor((cum - nt) / 256.0) AS BIGINT) AS pack_id,
        COUNT(*) AS n_chunks, CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM r GROUP BY 1 ORDER BY pack_id""")) { (s, d) =>
      val w = Window.orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.chunks(col("text"), 32, 8))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"),
          size(split(col("chunk"), " ")).cast("long").as("nt"))
        .withColumn("cum", sum(col("nt")).over(w))
        .select((floor((col("cum") - col("nt")) / 256)).cast("long").as("pack_id"),
          col("nt"))
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_chunks"), sum(col("nt")).as("n_tokens"))
        .orderBy("pack_id")
    },

    // ---- sharded sequential packing (the 100 TB form of q77) ----
    // q77's globally sequential packs need a single-partition window — at
    // corpus scale every chunk would flow through one task. Here docs are
    // hash-bucketed into shards first (md5-derived, deterministic and
    // engine-portable), the running-sum window partitions by shard, and
    // pack ids are namespaced by shard — packing is embarrassingly
    // parallel across shards because packs never span shards. A spec
    // asserts the plan contains NO single-partition exchange.
    Q("q78_packing_sharded", Some(s"""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      n AS (SELECT doc_id, tk,
        greatest(1, CAST(ceil(CAST(len(tk) - 8 AS DOUBLE) / 24.0) AS BIGINT)) AS nc
        FROM sp),
      e AS (SELECT doc_id, tk, unnest(generate_series(1, nc)) - 1 AS chunk_id FROM n),
      c AS (SELECT doc_id, chunk_id,
        ${dkHash("CAST(doc_id AS VARCHAR)", 7)} % 8 AS shard,
        len(string_split(array_to_string(
          tk[CAST(chunk_id * 24 + 1 AS INT) : CAST(chunk_id * 24 + 32 AS INT)], ' '), ' ')) AS nt
        FROM e),
      r AS (SELECT shard, nt,
        CAST(SUM(nt) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM c)
      SELECT shard, CAST(floor((cum - nt) / 256.0) AS BIGINT) AS pack_id,
        COUNT(*) AS n_chunks, CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM r GROUP BY 1, 2 ORDER BY shard, pack_id""")) { (s, d) =>
      sqlPackingSharded(s, d)
    },

    // ---- SimHash (16-bit) ----
    // The final LEFT JOIN keeps signature-table coverage = corpus
    // coverage: a NULL text gets a NULL signature ROW (Spark's per-row
    // projection semantics), not a silent disappearance — unnest of a
    // NULL token list would otherwise drop the doc entirely.
    Q("q32_simhash", Some(s"""
      WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS t
                   FROM documents),
      h AS (SELECT doc_id, ${dkHash("t", 0)} AS h FROM tok),
      votes AS (SELECT doc_id, g.b, SUM(((h >> g.b) & 1)*2 - 1) AS v
                FROM h, generate_series(0, 15) g(b) GROUP BY doc_id, g.b),
      sig AS (SELECT doc_id,
        CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
          AS simhash
        FROM votes GROUP BY doc_id)
      SELECT d.doc_id, sig.simhash
      FROM documents d LEFT JOIN sig ON sig.doc_id = d.doc_id
      ORDER BY d.doc_id""")) { (s, d) =>
      Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text", bits = 16)
        .orderBy("doc_id")
    },

    // ---- repetition/symbol quality rules (Gopher/C4-style filters) ----
    // Three per-doc signals a web-corpus pipeline filters on BEFORE
    // training: most-frequent-bigram share (boilerplate/template spam),
    // duplicate-token fraction (keyword stuffing), symbol ratio
    // (markup/code debris). Exact integer ratios ⇒ IEEE-identical
    // doubles in both engines. Single-token docs have no bigrams —
    // LEFT JOIN + 0.0, not dropped.
    Q("q80_repetition_filter", Some("""
      WITH sp AS (SELECT doc_id, text, string_split(text,' ') tk FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-1),
          i -> array_to_string(tk[i:i+1],' '))) AS sh FROM sp),
      bc AS (SELECT doc_id, sh, COUNT(*) AS c FROM bg GROUP BY doc_id, sh),
      rep AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_c FROM bc GROUP BY doc_id),
      base AS (SELECT s.doc_id,
        COALESCE(CAST(r.top_c AS DOUBLE)/r.total_c, 0.0) AS top_bigram_frac,
        1.0 - CAST(len(list_distinct(s.tk)) AS DOUBLE)/len(s.tk) AS dup_token_frac,
        COALESCE(CAST(length(regexp_replace(s.text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
          / NULLIF(length(s.text), 0), 0.0) AS symbol_ratio
        FROM sp s LEFT JOIN rep r ON r.doc_id = s.doc_id)
      SELECT doc_id, top_bigram_frac, dup_token_frac, symbol_ratio,
        (top_bigram_frac <= 0.2 AND dup_token_frac <= 0.5 AND symbol_ratio <= 0.3) AS keep
      FROM base ORDER BY doc_id""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val sp = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // the repetition stat depends on ONE row, so it is computed
      // row-local (compiled ShingleRepetition) — the earlier
      // explode(bigrams) → groupBy(doc_id, sh) → groupBy(doc_id)
      // pipeline shuffled ~one row PER TOKEN of the corpus ((doc_id,
      // bigram) is nearly unique, so partial aggregation collapsed
      // nothing) and measured superlinear in the sf1 soak; this plan has
      // zero shuffles before the final sort. The when-guard mirrors the
      // oracle's LEFT-JOIN-miss COALESCE: total_c = 0 (and NULL text) ⇒
      // 0.0, never a 0/0 NaN.
      val rep = graft.functions.GraftFunctions.shingleRep(col("text"), 2)
      val st = tokenStatsOf(col("text"))
      sp
        .select(col("doc_id"), col("text"),
          rep.getField("top_c").as("top_c"),
          rep.getField("total_c").as("total_c"))
        .select(col("doc_id"),
          when(col("total_c") > 0,
            col("top_c").cast("double") / col("total_c")).otherwise(lit(0.0))
            .as("top_bigram_frac"),
          (lit(1.0) - st.getField("n_distinct").cast("double")
            / st.getField("n_tokens")).as("dup_token_frac"),
          coalesce(length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
            .cast("double") / nullif(length(col("text")), lit(0)), lit(0.0))
            .as("symbol_ratio"))
        .withColumn("keep",
          col("top_bigram_frac") <= 0.2 && col("dup_token_frac") <= 0.5 &&
          col("symbol_ratio") <= 0.3)
        .orderBy("doc_id")
    },

    // ---- corpus composition + exact-dup rate per (source, lang) ----
    // The pipeline observability report: what a 100 TB crawl is made of
    // and how duplicated each slice is — drives source weighting and
    // dedup-policy decisions. ONE corpus scan: the total is a global
    // window over the already-grouped result (cardinality = sources ×
    // langs, so the single-partition window sees dozens of rows, never
    // the corpus — a second aggregate branch would re-scan the corpus,
    // since the distinct-fp rewrite prunes differently per consumer and
    // defeats exchange reuse).
    Q("q81_source_mix", Some("""
      WITH t AS (SELECT source, lang, md5(text) AS fp,
        len(string_split(text,' ')) AS nt FROM documents),
      tot AS (SELECT COUNT(*) AS total FROM t)
      SELECT source, lang,
        COUNT(*) AS n_docs,
        CAST(SUM(nt) AS BIGINT) AS n_tokens,
        CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_tokens,
        CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
        CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_rate,
        CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM tot) AS doc_share
      FROM t GROUP BY source, lang ORDER BY source, lang""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val st = tokenStatsOf(col("text"))
      val t = Tables.documents(s, d).select(col("source"), col("lang"),
        md5(col("text")).as("fp"), st.getField("n_tokens").cast("long").as("nt"))
      t.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          (sum("nt").cast("double") / count(lit(1))).as("avg_tokens"),
          (count(lit(1)) - count_distinct(col("fp"))).as("n_exact_dups"),
          ((count(lit(1)) - count_distinct(col("fp"))).cast("double")
            / count(lit(1))).as("dup_rate"))
        .withColumn("doc_share", col("n_docs").cast("double")
          / sum(col("n_docs")).over(Window.partitionBy()))
        .orderBy("source", "lang")
    },

    // ---- near-dup provenance (intra- vs cross-slice duplication) ----
    // Joins the verified LSH pair list back to both docs' (source, lang):
    // whether duplication is concentrated inside a source (re-crawl) or
    // spread across sources/langs (syndication, translated boilerplate)
    // decides which slice gets deduped vs dropped. Scale: the pair list
    // is output-sized (≪ corpus), so the two provenance joins shuffle
    // pairs + a narrow (doc_id, source, lang) projection — never corpus
    // × corpus.
    Q("q84_near_dup_provenance", Some(s"""
      WITH $dkLshPairs,
      m AS (SELECT a, b, jaccard FROM j WHERE jaccard >= 0.5)
      SELECT m.a, m.b, m.jaccard,
        da.source AS source_a, db.source AS source_b,
        da.lang AS lang_a, db.lang AS lang_b,
        (da.source <> db.source) AS cross_source,
        (da.lang <> db.lang) AS cross_lang
      FROM m JOIN documents da ON da.doc_id = m.a
        JOIN documents db ON db.doc_id = m.b
      ORDER BY m.a, m.b""")) { (s, d) =>
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      val meta = Tables.documents(s, d).select("doc_id", "source", "lang")
      pairs
        .join(meta.select(col("doc_id").as("a"), col("source").as("source_a"),
          col("lang").as("lang_a")), Seq("a"))
        .join(meta.select(col("doc_id").as("b"), col("source").as("source_b"),
          col("lang").as("lang_b")), Seq("b"))
        .select(col("a"), col("b"), col("jaccard"),
          col("source_a"), col("source_b"), col("lang_a"), col("lang_b"),
          (col("source_a") =!= col("source_b")).as("cross_source"),
          (col("lang_a") =!= col("lang_b")).as("cross_lang"))
        .orderBy("a", "b")
    },

    // ---- incremental (cross-batch) near-dup: new crawl vs corpus ----
    // The ingest-time shape: dedup each fresh batch (doc_id >= 250, the
    // stand-in "new crawl") against the existing corpus (doc_id < 250)
    // WITHOUT re-running the global self-join — band keys shared with
    // q31 make it a bucket join; at 100 TB the old side is a staged
    // signature table and per-batch cost is new-batch-sized. Oracle:
    // the q31 CTE chain already enumerates every banded pair with
    // a < b, and batches split on doc_id, so cross-batch pairs are
    // exactly the (a < 250 ≤ b) rows.
    Q("q85_incremental_dedup", Some(s"""
      WITH $dkLshPairs
      SELECT b AS doc_id, MIN(a) AS dup_of, MAX(jaccard) AS best_jaccard
      FROM j WHERE jaccard >= 0.5 AND a < 250 AND b >= 250
      GROUP BY b ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.incrementalNearDups(
          docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
          "doc_id", "text", numHashes = 8, bands = 4, shingleSize = 3,
          threshold = 0.5)
        .orderBy("doc_id")
    },

    // ---- staged-signature incremental dedup (stage once, probe cheap) ----
    // q85's production form: the corpus side's shingle+signature pipeline
    // is paid ONCE by Dedup.stageSignatures (bkey-clustered parquet, no
    // document text) and every ingest batch probes the staged table —
    // the per-batch plan scans documents exactly once (the new batch;
    // asserted in ScaleSpec) plus the signature table. Same verdicts as
    // q85 by construction, so the same oracle gates both: a staging
    // round-trip that altered any verdict would hash-mismatch here.
    Q("q112_staged_incremental_dedup", Some(s"""
      WITH $dkLshPairs
      SELECT b AS doc_id, MIN(a) AS dup_of, MAX(jaccard) AS best_jaccard
      FROM j WHERE jaccard >= 0.5 AND a < 250 AND b >= 250
      GROUP BY b ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      // content-addressed staging path: dataset + signature params + the
      // corpus parquet's (size, mtime) fingerprint. Staging is the ONCE-
      // per-snapshot cost, so skip the rewrite when the staged table for
      // this exact content already exists (the _SUCCESS marker commits
      // it) — repeat invocations (bench runs, the oracle run, the plan
      // spec) measure the cheap per-batch probe, which is the production
      // steady state, and concurrent runs over the same corpus share a
      // finished table instead of racing an overwrite against a reader.
      val src = new java.io.File(s"$d/documents.parquet")
      // v2s = stageSignatures' bkey-clustered parquet layout with the
      // HASHED shingle carry (sh: ARRAY<BIGINT> — see bandedSignatures)
      // PLUS the _graft_sig_format.json sidecar (r15): salting the key
      // with the format version means a format change (v1 carried sh as
      // ARRAY<STRING>; plain v2 lacked the sidecar the path-based probe
      // verifies) can never silently reuse an incompatible staged table
      // left in tmpdir.
      // Content enters via the per-file tree fingerprint — a top-level
      // (length, mtime) missed part-file rewrites in directory datasets
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v2s|$d|h=8|b=4|sh=3|${graft.core.Staging.contentFingerprint(src)}"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      val staged =
        s"${System.getProperty("java.io.tmpdir")}/graft_staged_sigs_$key"
      if (!new java.io.File(staged, "_SUCCESS").exists()) {
        // stage into a unique temp dir and rename into the keyed path
        // (the HttpIngest spool pattern): the rename is the commit, so
        // two concurrent first runs never interleave writes — the loser's
        // rename fails against the winner's directory and is discarded
        val tmp = s"$staged.tmp-${java.util.UUID.randomUUID()}"
        Dedup.stageSignatures(docs.filter(col("doc_id") < 250), "doc_id",
          "text", tmp, numHashes = 8, bands = 4, shingleSize = 3,
          numFiles = 4)
        try
          java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
            java.nio.file.Paths.get(staged),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileSystemException =>
            // a concurrent run committed first — use its table
            org.apache.commons.io.FileUtils
              .deleteDirectory(new java.io.File(tmp))
        }
      }
      // the PATH overload: sidecar-verified parameters + the persisted
      // measured text volume picks the corpus side's join regime — the
      // staged probe never re-scans the corpus to price it (r15)
      Dedup.incrementalNearDupsStaged(
          s, staged, docs.filter(col("doc_id") >= 250),
          "doc_id", "text", numHashes = 8, bands = 4, shingleSize = 3,
          threshold = 0.5, shingler = null)
        .orderBy("doc_id")
    },

    // ---- incremental connected-components update (per-ingest CC) ----
    // The clustering counterpart of q112's staged signatures: fold the
    // new batch's pair list into the EXISTING cluster labels
    // (Dedup.updateClusters) instead of re-running CC over every pair
    // ever seen — old clusters replay as star edges (member →
    // representative), so per-ingest CC input is labeled-nodes +
    // new-pairs sized. New pairs may MERGE old clusters; all members
    // re-canonicalize to the merged min id. Gate: the incremental result
    // must EQUAL the full recompute — the oracle runs CC over the whole
    // pair list (q71's recursive CTE) and over the old-only pairs (for
    // the changed flag), and the hash compare holds the Spark side's
    // incremental path to exactly that. In production the new pair list
    // comes from the staged probe (q112) — here both batches derive from
    // one LSH pass split on doc_id, the demo-scale stand-in.
    Q("q113_incremental_clusters", Some(s"""
      WITH RECURSIVE $dkLshPairs,
      $dkClusters,
      op AS (SELECT a, b FROM j WHERE jaccard >= 0.5 AND b < 250),
      oedges AS (SELECT a AS src, b AS dst FROM op
                 UNION ALL SELECT b, a FROM op),
      owalk(id, lab) AS (
        SELECT src, src FROM oedges
        UNION
        SELECT e.src, w.lab FROM oedges e JOIN owalk w ON w.id = e.dst),
      olab AS (SELECT id, MIN(lab) AS cluster FROM owalk GROUP BY id)
      SELECT l.id AS doc_id, l.cluster, (l.id >= 250) AS is_new_doc,
        (o.cluster IS NULL OR o.cluster <> l.cluster) AS cluster_changed
      FROM lab l LEFT JOIN olab o ON o.id = l.id
      ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      // materialize the pair list ONCE: both consumers (the old-labels CC
      // and the update) otherwise re-execute the whole LSH self-join —
      // in production the two pair sets arrive separately anyway (the
      // corpus's clusters are a stored table, the batch's pairs come
      // from the q112 staged probe)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
        .localCheckpoint(true)
      // a < b by contract, so b < 250 ⇔ both docs are in the old corpus
      val oldLabels = Dedup.nearDupClusters(pairs.filter(col("b") < 250))
      val updated = Dedup.updateClusters(
        oldLabels, pairs.filter(col("b") >= 250))
      updated
        .join(oldLabels.select(col("id"), col("cluster").as("old_cluster")),
          Seq("id"), "left")
        .select(col("id").as("doc_id"), col("cluster"),
          (col("id") >= 250).as("is_new_doc"),
          (col("old_cluster").isNull || col("old_cluster") =!= col("cluster"))
            .as("cluster_changed"))
        .orderBy("doc_id")
    },

    // ---- dedup yield curve (threshold tuning report) ----
    // Before committing to a jaccard cutoff, sweep it: for each
    // candidate threshold ≥ the LSH band design point (0.5 — candidates
    // above it are a superset, so ONE pair list serves the whole sweep),
    // how many pairs fire and how many docs would the greedy
    // drop-any-with-smaller-dup policy remove? One broadcast of the
    // 5-row threshold frame against the pair list — the pair list is
    // computed once, never per threshold.
    Q("q117_dedup_yield_curve", Some(s"""
      WITH $dkLshPairs,
      t AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS thr)
      SELECT t.thr AS threshold,
        CAST(COUNT(CASE WHEN j.jaccard >= t.thr THEN 1 END) AS BIGINT)
          AS n_pairs,
        CAST(COUNT(DISTINCT CASE WHEN j.jaccard >= t.thr THEN j.b END)
          AS BIGINT) AS n_dropped
      FROM t, j GROUP BY t.thr ORDER BY threshold""")) { (s, d) =>
      import s.implicits._
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id",
        "text", numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      val thr = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold")
      pairs.crossJoin(broadcast(thr))
        .groupBy("threshold")
        .agg(count(when(col("jaccard") >= col("threshold"), 1)).as("n_pairs"),
          countDistinct(when(col("jaccard") >= col("threshold"), col("b")))
            .as("n_dropped"))
        .orderBy("threshold")
    },

    // ---- cluster size histogram (dedup capacity report) ----
    // The shape of the duplicate mass: how many near-dup clusters exist
    // at each size, how many docs sit in them, and how many a
    // keep-one-per-cluster pass removes (size − 1 each). Pairs → CC
    // labels → two tiny aggregations; the histogram is cluster-count
    // sized. A heavy tail here (one giant cluster) is the signal to
    // inspect boilerplate before trusting keep-one.
    Q("q118_cluster_size_histogram", Some(s"""
      WITH RECURSIVE $dkLshPairs,
      $dkClusters,
      cs AS (SELECT cluster, COUNT(*) AS size FROM lab GROUP BY cluster)
      SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        CAST(SUM(size) AS BIGINT) AS n_docs,
        CAST(SUM(size - 1) AS BIGINT) AS n_dropped
      FROM cs GROUP BY size ORDER BY size""")) { (s, d) =>
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id",
        "text", numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
      Dedup.nearDupClusters(pairs)
        .groupBy("cluster").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"),
          sum(col("size")).as("n_docs"),
          sum(col("size") - 1).as("n_dropped"))
        .orderBy("size")
    },

    // ---- per-source adaptive quality floor (stratified curation) ----
    // One global quality cutoff over-prunes whole sources whose score
    // distribution sits low; Curation.adaptiveQualityFloor keeps each
    // stratum's own top 90% instead — floor = EXACT p10 of the q25
    // quality score within the source, by all-integer rank selection
    // (q89's winsorize pattern), ties kept. Report: per-source floor and
    // kept/dropped counts.
    Q("q114_adaptive_quality_floor", Some("""
      WITH q AS (SELECT doc_id, source,
          least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100.0)*0.5
          + (1.0 - CAST(len(list_filter(string_split(text,' '),
                t -> t IN ('the','a'))) AS DOUBLE)
              / len(string_split(text,' ')))*0.3
          + least(1.0, (CAST(length(text) - (len(string_split(text,' ')) - 1)
                AS DOUBLE) / len(string_split(text,' ')))/8.0)*0.2 AS score
        FROM documents),
      rk AS (SELECT source, score,
          row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS n
        FROM q),
      thr AS (SELECT source, MAX(n) AS n_docs,
          MAX(CASE WHEN rn = (10 * n + 99) // 100 THEN score END) AS floor10
        FROM rk GROUP BY source)
      SELECT t.source, t.n_docs, t.floor10,
        COUNT(CASE WHEN r.score < t.floor10 THEN 1 END) AS n_dropped,
        COUNT(CASE WHEN r.score >= t.floor10 THEN 1 END) AS n_kept
      FROM rk r JOIN thr t ON t.source = r.source
      GROUP BY t.source, t.n_docs, t.floor10
      ORDER BY t.source""")) { (s, d) =>
      graft.operators.Curation.adaptiveQualityFloor(
          Tables.documents(s, d), Seq("source"),
          qualityScore(col("text")), "doc_id", pct = 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), max(col("floor")).as("floor10"),
          count(when(!col("kept"), 1)).as("n_dropped"),
          count(when(col("kept"), 1)).as("n_kept"))
        .orderBy("source")
    },

    // ---- span novelty vs earlier corpus (memorization audit) ----
    // q86 counts duplicated spans regardless of order; this scores each
    // doc by how much of it is NEW relative to everything ingested
    // BEFORE it (doc_id = ingest order): novelty = share of its distinct
    // 8-token spans whose first owner (min doc_id over the corpus) is an
    // earlier doc. The low-novelty tail is re-crawl/boilerplate; eval
    // sets demand novelty ≈ 1. Shape: same map-only span hashing as q86,
    // ONE partial-aggregated min per span hash, one join back — the
    // ExactSubstr-style audit without a suffix array.
    Q("q115_span_novelty", Some(s"""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(tk) >= 8 THEN
          list_distinct(list_transform(generate_series(1, len(tk)-7),
            i -> array_to_string(tk[i:i+7],' ')))
        ELSE [] END AS sh FROM sp),
      ex AS (SELECT sh.doc_id, ${dkHash("s.s", 11)} AS h
        FROM sh, unnest(sh.sh) s(s)),
      own AS (SELECT h, MIN(doc_id) AS first_doc FROM ex GROUP BY h),
      st AS (SELECT e.doc_id,
          COUNT(CASE WHEN o.first_doc < e.doc_id THEN 1 END) AS n_seen
        FROM ex e JOIN own o USING (h) GROUP BY e.doc_id)
      SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_spans,
        COALESCE(st.n_seen, 0) AS n_seen_before,
        CASE WHEN len(s.sh) = 0 THEN 1.0
          ELSE 1.0 - CAST(COALESCE(st.n_seen, 0) AS DOUBLE) / len(s.sh) END
          AS novelty
      FROM sh s LEFT JOIN st ON st.doc_id = s.doc_id
      ORDER BY s.doc_id""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val sh = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.GraftFunctions.wordShingles(col("text"), 8).as("sh"))
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("sp"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.hash64c(col("sp"), 11).as("h"))
      val own = ex.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
      val st = ex.join(own, "h").groupBy("doc_id")
        .agg(count(when(col("first_doc") < col("doc_id"), 1)).as("n_seen"))
      sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_spans"))
        .join(st, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_seen"), lit(0L)).as("n_seen_before"),
          when(col("n_spans") === 0, lit(1.0))
            .otherwise(lit(1.0) - coalesce(col("n_seen"), lit(0L))
              .cast("double") / col("n_spans")).as("novelty"))
        .orderBy("doc_id")
    },

    // ---- token-distribution drift between snapshots (mix monitoring) ----
    // The ingest-time distribution check: which tokens' RATES moved most
    // from the old corpus (doc_id < 250) to the new batch? Add-one
    // smoothed rate ratio — numerator and denominator stay all-integer
    // ((cnt+1) × (total+V) cross-products) until ONE double division, so
    // the ranking is reduction-order-independent and bit-identical to
    // the oracle. Shape: two partial-aggregated token counts + one
    // narrow full-outer join + a one-row broadcast of the totals; top-20
    // risers by ratio.
    Q("q116_token_drift", Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS t
        FROM documents),
      oc AS (SELECT t, COUNT(*) AS c FROM tk WHERE doc_id < 250 GROUP BY t),
      nc AS (SELECT t, COUNT(*) AS c FROM tk WHERE doc_id >= 250 GROUP BY t),
      allt AS (SELECT COALESCE(oc.t, nc.t) AS token,
          CAST(COALESCE(oc.c, 0) AS BIGINT) AS cnt_old,
          CAST(COALESCE(nc.c, 0) AS BIGINT) AS cnt_new
        FROM oc FULL OUTER JOIN nc ON nc.t = oc.t),
      tot AS (SELECT CAST(SUM(cnt_old) AS BIGINT) AS tot_old,
          CAST(SUM(cnt_new) AS BIGINT) AS tot_new,
          COUNT(*) AS v FROM allt)
      SELECT token, cnt_old, cnt_new,
        CAST((cnt_new + 1) * (SELECT tot_old + v FROM tot) AS DOUBLE)
          / CAST((cnt_old + 1) * (SELECT tot_new + v FROM tot) AS DOUBLE)
          AS rate_ratio
      FROM allt ORDER BY rate_ratio DESC, token LIMIT 20""")) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      val oc = tk.filter(col("doc_id") < 250)
        .groupBy("t").agg(count(lit(1)).as("cnt_old"))
      val nc = tk.filter(col("doc_id") >= 250)
        .groupBy("t").agg(count(lit(1)).as("cnt_new"))
      // pinned: allt feeds tot AND the final scoring select — unpinned,
      // each re-runs both token-count branches from the scan (4 parquet
      // scans in the committed plan; 2 after). Vocabulary-sized narrow
      // frame — the q123/importanceWeights count-table precedent.
      // Median of 5 interleaved min-of-5 probes at sf0.1: 0.81 -> 0.71 s.
      val allt = oc.join(nc, Seq("t"), "full")
        .select(col("t").as("token"),
          coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
          coalesce(col("cnt_new"), lit(0L)).as("cnt_new"))
        .localCheckpoint()
      val tot = allt.agg(sum(col("cnt_old")).as("tot_old"),
        sum(col("cnt_new")).as("tot_new"), count(lit(1)).as("v"))
      // int64 exactness bound: v counts the UNION vocabulary, so with
      // S = tot_old + tot_new each factor is ≤ 2S and the cross product
      // ≤ 2S² — exact through S = 2e9 COMBINED token instances (2·(2e9)²
      // < 2^63); the q123-style per-side bound was too lax because there
      // v is counted within the side it is added to. Beyond the bound
      // fail loudly (DuckDB's checked BIGINT multiply errors too; Spark's
      // non-ANSI multiply would wrap silently)
      allt.crossJoin(broadcast(tot))
        .select(col("token"), col("cnt_old"), col("cnt_new"),
          when(col("tot_old") + col("tot_new") > 2000000000L,
            raise_error(lit("q116: the two sides exceed 2e9 combined " +
              "token instances — integer rate-ratio would overflow; use " +
              "the double path at this scale")).cast("double"))
          .otherwise(
            ((col("cnt_new") + 1) * (col("tot_old") + col("v"))).cast("double")
              / ((col("cnt_old") + 1) * (col("tot_new") + col("v")))
                .cast("double")).as("rate_ratio"))
        .orderBy(desc("rate_ratio"), asc("token")).limit(20)
    },

    // ---- Bloom-filter membership pre-filter (sketch-based dedup) ----
    // The cheap half of incremental exact dedup: a fixed-size bitmap
    // built once over the corpus (one pass, OR-merged partials) is
    // broadcast to every ingest batch, and each new doc probes k bits —
    // map-only, no join against the corpus at all. Flagged rows (a few %
    // false positives + every true duplicate) go on to the exact check;
    // the rest are admitted immediately. The oracle reproduces the filter
    // exactly: bit p is set ⟺ some corpus fingerprint hashes to p, so a
    // distinct-position set + left join IS the bitmap. Output carries the
    // ground truth column too — the no-false-negative invariant
    // (is_exact_dup ⇒ bloom_flagged) is inside the hashed compare.
    Q("q88_bloom_prefilter", Some(s"""
      WITH corpus AS (SELECT md5(text) AS fp FROM documents WHERE doc_id < 250),
      batch AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= 250),
      pos AS (SELECT DISTINCT p FROM (
        ${(0 until 3).map(j =>
          s"SELECT ${dkHash("fp", 101 + j)} % 131072 AS p FROM corpus")
          .mkString("\n        UNION ALL ")})),
      bp AS (
        ${(0 until 3).map(j =>
          s"SELECT doc_id, ${dkHash("fp", 101 + j)} % 131072 AS p FROM batch")
          .mkString("\n        UNION ALL ")}),
      hits AS (SELECT bp.doc_id, COUNT(pos.p) AS nh
        FROM bp LEFT JOIN pos ON pos.p = bp.p GROUP BY bp.doc_id)
      SELECT h.doc_id, CAST(h.nh AS INT) AS n_probe_hits,
        h.nh = 3 AS bloom_flagged,
        COALESCE(b.fp IN (SELECT fp FROM corpus WHERE fp IS NOT NULL), false)
          AS is_exact_dup
      FROM hits h JOIN batch b ON b.doc_id = h.doc_id
      ORDER BY h.doc_id""")) { (s, d) =>
      // is_exact_dup is a two-valued verdict: a NULL-text doc is a dup
      // of nothing (false, matching the Spark side's left-join +
      // coalesce(false)). Unguarded, SQL's three-valued IN turns EVERY
      // non-matching row NULL once the corpus holds one NULL fp
      // (caught by scripts/null_check.py).
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") < 250).select(md5(col("text")).as("fp"))
      val batch = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val bloom = Dedup.bloomBitmap(corpus, col("fp"))
      Dedup.bloomFlags(batch, bloom, col("fp"))
        .join(corpus.distinct().withColumn("__in", lit(true)), Seq("fp"), "left")
        .select(col("doc_id"), col("n_probe_hits"), col("bloom_flagged"),
          coalesce(col("__in"), lit(false)).as("is_exact_dup"))
        .orderBy("doc_id")
    },

    // ---- duplicated-span statistics (ExactSubstr-style, hashed) ----
    // The substring-level member of the dedup family: which docs carry
    // 8-token spans that also appear in OTHER docs (boilerplate sentences
    // survive doc-level dedup). Spans are hashed to int64 (compiled
    // md5-derived hash64), so the global span groupBy shuffles narrow
    // (hash, doc_id) pairs, never span text. The span-frequency table is
    // the op's real product — production stages it once
    // (Dedup.stageSpanStats) and each consumer probes it
    // (Dedup.dupSpanStatsStaged; suffix-array ExactSubstr is the
    // single-node analogue — hashed-span grouping is its shuffle-native
    // form).
    Q("q86_dup_spans", Some(s"""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(tk) >= 8 THEN
          list_distinct(list_transform(generate_series(1, len(tk)-7),
            i -> array_to_string(tk[i:i+7],' ')))
        ELSE [] END AS sh FROM sp),
      ex AS (SELECT sh.doc_id, ${dkHash("s.s", 11)} AS h
        FROM sh, unnest(sh.sh) s(s)),
      common AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) > 1),
      flag AS (SELECT e.doc_id, COUNT(*) AS n_dup
        FROM ex e JOIN common USING (h) GROUP BY e.doc_id)
      SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_spans,
        COALESCE(f.n_dup, 0) AS n_dup_spans,
        CASE WHEN len(s.sh) = 0 THEN 0.0
          ELSE CAST(COALESCE(f.n_dup, 0) AS DOUBLE) / len(s.sh) END
          AS dup_span_frac
      FROM sh s LEFT JOIN flag f ON f.doc_id = s.doc_id
      ORDER BY s.doc_id""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      // delegates to the operator so the oracle gates Dedup.dupSpanStats
      // (and, via the staged≡inline spec, dupSpanStatsStaged too)
      graft.operators.Dedup.dupSpanStats(
          Tables.documents(s, d), "doc_id", "text", span = 8, seed = 11)
        .orderBy("doc_id")
    },

    // ---- token-commonness / rare-token statistics (LM-proxy score) ----
    // The statistical cousin of the heuristic quality score (q25): how
    // generic is each doc's vocabulary against the corpus? mean document
    // frequency of its distinct tokens + the fraction that appear in no
    // other doc (df = 1). All-integer aggregates + one final division —
    // no logs, so both engines match bit-for-bit (a true LM perplexity
    // needs ln(); its portable stand-in is this df profile). Scale: the
    // df table is vocabulary-sized (broadcast in production). The shuffle
    // here carries (token, doc_id) pairs — token strings, not hashes;
    // tokens are short and vocabulary-bounded, but a corpus of long rare
    // tokens would hash them first exactly as q86 hashes its spans.
    Q("q87_token_commonness", Some(s"""
      WITH tok AS (SELECT doc_id,
        unnest(list_distinct(string_split(text,' '))) AS t FROM documents),
      df AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY t),
      j AS (SELECT tok.doc_id, df.df FROM tok JOIN df ON df.t = tok.t)
      SELECT doc_id, COUNT(*) AS n_distinct_tokens,
        CAST(SUM(df) AS BIGINT) AS sum_df,
        CAST(CAST(SUM(df) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_df,
        CAST(COUNT(*) FILTER (df = 1) AS DOUBLE) / COUNT(*) AS rare_frac
      FROM j GROUP BY doc_id ORDER BY doc_id""")) { (s, d) =>
      val tok = Tables.documents(s, d).select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      val df = tok.groupBy("t").agg(count(lit(1)).as("df"))
      tok.join(df, "t")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_tokens"),
          sum("df").as("sum_df"),
          (sum("df").cast("double") / count(lit(1))).as("mean_df"),
          (count(when(col("df") === 1, 1)).cast("double") / count(lit(1)))
            .as("rare_frac"))
        .orderBy("doc_id")
    },

    // ---- BPE-style merge candidates: corpus-wide bigram counts ----
    // The first step of BPE/WordPiece vocabulary training: count every
    // ADJACENT token pair with multiplicity (occurrences, not document
    // frequency — q86/q87 cover the distinct-set side) and rank the
    // top merge candidates. Compiled all-ngrams projection (no
    // interpreted HOF), one explode → one count shuffle with map-side
    // partial agg; top-K is TakeOrdered, never a global sort.
    Q("q91_bpe_merge_candidates", Some("""
      WITH bg AS (SELECT unnest(list_transform(generate_series(1, len(tk)-1),
          i -> array_to_string(tk[i:i+1], ' '))) AS bigram
        FROM (SELECT string_split(text, ' ') AS tk FROM documents))
      SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
      ORDER BY n DESC, bigram LIMIT 50""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select(explode(graft.functions.GraftFunctions.wordShinglesAll(
          col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(50)
    },

    // ---- vocabulary coverage / OOV-rate scoring ----
    // Close the vocab loop: induce a top-N token vocabulary from the
    // corpus (count → TakeOrdered top-N, deterministic count-then-token
    // tiebreak), then score every document's out-of-vocabulary token
    // fraction against it — the filter that catches
    // wrong-domain/garbage docs a per-doc heuristic can't see. The vocab
    // is vocabulary-sized (tiny) → broadcast; the per-doc pass is one
    // explode + broadcast-join + count, no corpus self-shuffle.
    Q("q92_vocab_coverage", Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents),
      cnt AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
      vocab AS (SELECT t FROM cnt ORDER BY n DESC, t LIMIT 10)
      SELECT tok.doc_id, COUNT(*) AS n_tokens,
        COUNT(CASE WHEN v.t IS NULL THEN 1 END) AS n_oov,
        CAST(COUNT(CASE WHEN v.t IS NULL THEN 1 END) AS DOUBLE) / COUNT(*)
          AS oov_frac
      FROM tok LEFT JOIN vocab v ON v.t = tok.t
      GROUP BY tok.doc_id ORDER BY tok.doc_id""")) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val vocab = tok.groupBy("t").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t")).limit(10)
        .select(col("t"), lit(true).as("__v"))
      tok.join(broadcast(vocab), Seq("t"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("__v").isNull, 1)).as("n_oov"),
          (count(when(col("__v").isNull, 1)).cast("double") / count(lit(1)))
            .as("oov_frac"))
        .orderBy("doc_id")
    },

    // ---- order-sensitive rolling-hash document fingerprint ----
    // NULL text ⇒ NULL fp, guarded explicitly: DuckDB's `[7] || NULL`
    // list-concat yields [7], which would silently report the bare seed
    // as a real fingerprint for NULL docs; Spark's compiled expression
    // (and any split-then-fold formulation) is NULL there.
    Q("q33_rolling_fingerprint", Some(s"""
      SELECT doc_id,
        CASE WHEN text IS NULL THEN NULL ELSE list_reduce(
          [CAST(7 AS BIGINT)] ||
            list_transform(string_split(text,' '), t -> ${dkHash("t", 0)} % 2147483647),
          (a, b) -> (a*31 + b) % 2147483647) END AS fp
      FROM documents ORDER BY doc_id""")) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // ---- DSIR-style importance weights (target-domain resampling) ----
    // Score every doc by how target-like its hashed-bigram bag is
    // (Sampling.importanceWeights; target = lang 'en'). The two
    // per-bucket count tables are bucket-bounded (8192) → broadcast;
    // all-integer sums until one final double division, so weights are
    // partitioning-independent and bit-identical to the oracle.
    Q("q102_dsir_weights", Some(s"""
      WITH sp AS (SELECT doc_id, lang, string_split(text,' ') tk FROM documents),
      f AS (SELECT t.doc_id, t.lang, ${dkHash("s.s", 7)} % 8192 AS h
        FROM (SELECT doc_id, lang, list_transform(generate_series(1, len(tk)-1),
            i -> array_to_string(tk[i:i+1],' ')) AS sh FROM sp) t,
          unnest(t.sh) s(s)),
      raw AS (SELECT h, COUNT(*) AS raw_cnt FROM f GROUP BY h),
      tgt AS (SELECT h, COUNT(*) AS tgt_cnt FROM f WHERE lang = 'en' GROUP BY h),
      tot AS (SELECT COUNT(*) AS tot_raw,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tot_tgt
        FROM f)
      SELECT f.doc_id, COUNT(*) AS n_feats,
        CAST(SUM(COALESCE(tgt.tgt_cnt, 0)) AS BIGINT) AS sum_tgt_cnt,
        CAST(SUM(raw.raw_cnt) AS BIGINT) AS sum_raw_cnt,
        CASE WHEN (SELECT tot_tgt FROM tot) = 0
          THEN error('importanceWeights: target slice has no feature instances')
          ELSE (CAST(CAST(SUM(COALESCE(tgt.tgt_cnt, 0)) AS BIGINT) AS DOUBLE)
             / CAST((SELECT tot_tgt FROM tot) AS DOUBLE))
            / (CAST(CAST(SUM(raw.raw_cnt) AS BIGINT) AS DOUBLE)
             / CAST((SELECT tot_raw FROM tot) AS DOUBLE)) END AS importance
      FROM f JOIN raw ON raw.h = f.h LEFT JOIN tgt ON tgt.h = f.h
      GROUP BY f.doc_id ORDER BY f.doc_id""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      graft.operators.Sampling.importanceWeights(
          Tables.documents(s, d), "doc_id",
          graft.functions.GraftFunctions.wordShinglesAll(col("text"), 2),
          col("lang") === "en", seed = 7, buckets = 8192)
        .orderBy("doc_id")
    },

    // ---- temperature-weighted domain mixing rates (α = 0.5) ----
    // The mixing step after the composition report (q81): per-source
    // resampling weights n_tokens^0.5 — sqrt flattens the source
    // distribution so head domains stop dominating (the standard
    // multilingual/multi-domain temperature trick; α=0.5 because IEEE
    // sqrt is correctly rounded, so both engines agree bit-for-bit
    // where a pow() would drift). Weights are floor-scaled to 2^20
    // fixed point BEFORE the cross-source total, so the normalizing
    // sum is an order-independent integer — no float reduction order
    // to disagree on. The window runs over the source-count-sized
    // aggregate (like q81's doc_share), never the corpus.
    Q("q104_domain_mix", Some("""
      WITH s AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      w AS (SELECT source, n_docs, n_tokens,
          CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1048576.0) AS BIGINT) AS wi
        FROM s)
      SELECT source, n_docs, n_tokens,
        CAST(wi AS DOUBLE) / 1048576.0 AS weight,
        CAST(wi AS DOUBLE) / CAST(CAST(SUM(wi) OVER () AS BIGINT) AS DOUBLE)
          AS mix_frac,
        (CAST(wi AS DOUBLE) / CAST(CAST(SUM(wi) OVER () AS BIGINT) AS DOUBLE))
          * CAST(CAST(SUM(n_docs) OVER () AS BIGINT) AS DOUBLE)
          / CAST(n_docs AS DOUBLE) AS upsample_factor
      FROM w ORDER BY source""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val st = tokenStatsOf(col("text"))
      val base = Tables.documents(s, d)
        .select(col("source"), st.getField("n_tokens").cast("long").as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .withColumn("wi",
          floor(sqrt(col("n_tokens").cast("double")) * lit(1048576.0)).cast("long"))
      val all = Window.partitionBy()
      val totW = sum(col("wi")).over(all).cast("double")
      val totD = sum(col("n_docs")).over(all).cast("double")
      base.select(col("source"), col("n_docs"), col("n_tokens"),
          (col("wi").cast("double") / lit(1048576.0)).as("weight"),
          (col("wi").cast("double") / totW).as("mix_frac"),
          ((col("wi").cast("double") / totW) * totD
            / col("n_docs").cast("double")).as("upsample_factor"))
        .orderBy("source")
    },

    // ---- sequence-length histogram + truncation-loss profile ----
    // The packing-planning statistic: token-count histogram in width-10
    // buckets, cumulative doc coverage, and the token mass a max_len=64
    // truncation would discard per bucket — how a context-length choice
    // trades docs kept vs tokens lost (pairs with q76 chunking / q78
    // packing, which act on the lengths this query profiles). Integer
    // counts end-to-end; the cumulative window runs over the ~10-row
    // bucket aggregate, not the corpus.
    Q("q105_length_histogram", Some("""
      WITH t AS (SELECT len(string_split(text,' ')) AS nt FROM documents),
      b AS (SELECT CAST(nt // 10 AS BIGINT) AS bucket, COUNT(*) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END) AS BIGINT)
            AS tokens_truncated
        FROM t GROUP BY 1)
      SELECT bucket, n_docs, n_tokens, tokens_truncated,
        CAST(SUM(n_docs) OVER (ORDER BY bucket NULLS FIRST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        CAST(CAST(SUM(n_docs) OVER (ORDER BY bucket NULLS FIRST
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
          / CAST(CAST(SUM(n_docs) OVER () AS BIGINT) AS DOUBLE) AS cum_doc_frac,
        CAST(tokens_truncated AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS trunc_frac
      FROM b ORDER BY bucket""")) { (s, d) =>
      // cumulative windows pin NULLS FIRST: the NULL bucket (docs with
      // no measurable length) sorts before bucket 0 in Spark's ASC
      // default but after the last bucket in DuckDB's — unpinned, every
      // cum_docs/cum_doc_frac cell shifts (caught by null_check.py)
      graft.functions.GraftFunctions.register(s)
      val st = tokenStatsOf(col("text"))
      // floor(nt/10) is exact for integer nt: the correctly-rounded
      // double quotient is ≥0.1 away from the next integer unless nt is
      // a multiple of 10, where it is exact.
      val b = Tables.documents(s, d)
        .select(st.getField("n_tokens").cast("long").as("nt"))
        .groupBy(floor(col("nt") / lit(10)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          sum(when(col("nt") > 64, col("nt") - 64).otherwise(0L))
            .as("tokens_truncated"))
      val cum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy()
      b.select(col("bucket"), col("n_docs"), col("n_tokens"),
          col("tokens_truncated"),
          sum(col("n_docs")).over(cum).as("cum_docs"),
          (sum(col("n_docs")).over(cum).cast("double")
            / sum(col("n_docs")).over(all).cast("double")).as("cum_doc_frac"),
          (col("tokens_truncated").cast("double")
            / col("n_tokens").cast("double")).as("trunc_frac"))
        .orderBy("bucket")
    },

    // ---- language-label audit (declared vs predicted confusion) ----
    // Cross-check the corpus's declared `lang` metadata against the
    // engine's n-gram language-ID (q26's compiled predictor): the
    // (declared, predicted) confusion counts with per-declared-lang
    // shares. `mismatch` marks cells where the en/not-en verdicts
    // disagree — mislabeled slices that would poison a lang-filtered
    // training mix. One scan + a lang-cardinality-sized aggregate.
    Q("q106_lang_audit", Some("""
      WITH p AS (SELECT lang, CASE WHEN len(list_filter(string_split(text,' '),
          t -> t IN ('the','a','of','and','is'))) > 0
        THEN 'en' ELSE 'und' END AS pred
        FROM documents)
      SELECT lang, pred, COUNT(*) AS n,
        CAST(COUNT(*) AS DOUBLE)
          / CAST(CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS BIGINT) AS DOUBLE)
          AS frac_of_lang,
        (lang = 'en') <> (pred = 'en') AS mismatch
      FROM p GROUP BY lang, pred ORDER BY lang, pred""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("pred", langId(col("text")))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .withColumn("frac_of_lang", col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy("lang")).cast("double"))
        .withColumn("mismatch", (col("lang") === "en") =!= (col("pred") === "en"))
        .orderBy("lang", "pred")
    },

    // ---- containment-scored pairs (partial-copy / quotation detector) ----
    // The asymmetric member of the dedup family (Dedup.containmentPairs):
    // |A∩B|/|A| and |A∩B|/|B| next to Jaccard over the SAME banded LSH
    // candidates — a short doc excerpted inside a long one scores high
    // containment while its Jaccard stays low. Pairs admitted when either
    // containment ≥ 0.5.
    Q("q108_containment_pairs", Some(s"""
      WITH $dkLshPairs,
      c AS (SELECT c.a, c.b,
          len(list_intersect(sa.sh, sb.sh)) AS inter,
          len(sa.sh) AS na, len(sb.sh) AS nb
        FROM cand c JOIN mh sa ON sa.doc_id = c.a JOIN mh sb ON sb.doc_id = c.b)
      SELECT a, b,
        CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard,
        CAST(inter AS DOUBLE) / na AS containment_a,
        CAST(inter AS DOUBLE) / nb AS containment_b
      FROM c
      WHERE greatest(CAST(inter AS DOUBLE) / na, CAST(inter AS DOUBLE) / nb) >= 0.5
      ORDER BY a, b""")) { (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          numHashes = 8, bands = 4, shingleSize = 3, threshold = 0.5)
        .orderBy("a", "b")
    },

    // ---- snapshot diff (corpus version audit) ----
    // Two simulated corpus versions (v1 = ids < 400; v2 = ids ≥ 100 with
    // ids 200-299 edited) classified added/removed/changed/unchanged by
    // content fingerprint (Dedup.snapshotDiff) — the audit that decides
    // what a versioned ingest re-processes. Narrow (id, fp) projections
    // meet in one full-outer equi-join; content never shuffles.
    Q("q109_snapshot_diff", Some("""
      WITH v1 AS (SELECT doc_id, md5(text) AS fp1, TRUE AS in1
        FROM documents WHERE doc_id < 400),
      v2 AS (SELECT doc_id, md5(CASE WHEN doc_id >= 200 AND doc_id < 300
          THEN text || ' edited' ELSE text END) AS fp2, TRUE AS in2
        FROM documents WHERE doc_id >= 100)
      SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        CASE WHEN v1.in1 IS NULL THEN 'added'
             WHEN v2.in2 IS NULL THEN 'removed'
             WHEN v1.fp1 IS DISTINCT FROM v2.fp2 THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
      ORDER BY doc_id""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") < 400)
      val v2 = docs.filter(col("doc_id") >= 100)
        .withColumn("text", when(col("doc_id") >= 200 && col("doc_id") < 300,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
      Dedup.snapshotDiff(v1, v2, "doc_id", md5(col("text")))
        .orderBy("doc_id")
    },

    // ---- vocabulary growth curve (Heaps'-law audit) ----
    // Docs bucketed into deciles of the id order (the ingest order
    // stand-in); per decile: docs, token instances, NEW types (tokens
    // whose first-ever occurrence falls in the decile) and the
    // cumulative vocabulary. A corpus whose curve flattens early is
    // repetitive/templated; one that keeps climbing is still adding
    // novelty — the cheap corpus-health read before committing a crawl
    // batch. Shape: one vocabulary-sized min(first-decile) aggregation
    // (the q87 profile, partial-agged map-side), everything after is
    // decile-sized; the cumulative window runs over TEN rows. All
    // integers, bucket arithmetic exact in both engines (quotients
    // ≥ 1/(max_id+1) away from integers — far beyond double rounding).
    Q("q126_vocab_growth", Some("""
      WITH mx AS (SELECT MAX(doc_id) AS mxid FROM documents),
      dd AS (SELECT doc_id, text,
        CAST(floor(doc_id * 10.0 / (mxid + 1)) AS BIGINT) AS decile
        FROM documents, mx),
      inst AS (SELECT decile, COUNT(*) AS docs,
        CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS instances
        FROM dd GROUP BY decile),
      fs AS (SELECT t, MIN(decile) AS fdec FROM (
          SELECT decile, unnest(string_split(text,' ')) AS t FROM dd)
        GROUP BY t),
      nw AS (SELECT fdec AS decile, CAST(COUNT(*) AS BIGINT) AS new_types
        FROM fs GROUP BY fdec)
      SELECT i.decile, i.docs, i.instances,
        COALESCE(nw.new_types, 0) AS new_types,
        CAST(SUM(COALESCE(nw.new_types, 0))
          OVER (ORDER BY i.decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS cum_types
      FROM inst i LEFT JOIN nw ON nw.decile = i.decile
      ORDER BY i.decile""")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val mx = docs.agg(max(col("doc_id")).as("mxid"))
      val dd = docs.crossJoin(broadcast(mx))
        .withColumn("decile",
          floor(col("doc_id") * lit(10.0) / (col("mxid") + 1)))
      val inst = dd.groupBy("decile").agg(count(lit(1)).as("docs"),
        sum(size(tokens(col("text"))).cast("long")).as("instances"))
      val news = dd.select(col("decile"), explode(tokens(col("text"))).as("t"))
        .groupBy("t").agg(min(col("decile")).as("fdec"))
        .groupBy(col("fdec").as("decile")).agg(count(lit(1)).as("new_types"))
      // ten-row frame: the unpartitioned cumulative window is decile-
      // sized by construction, never corpus-sized
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      inst.join(news, Seq("decile"), "left")
        .select(col("decile"), col("docs"), col("instances"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .withColumn("cum_types", sum(col("new_types")).over(w))
        .orderBy("decile")
    },

    // ---- pairwise source vocabulary overlap (corpus-mix diagnostic) ----
    // Exact Jaccard + overlap coefficient between every source pair's
    // DISTINCT token sets: near-identical vocabularies mean two
    // "sources" are really one distribution (double-counted in the mix);
    // near-disjoint ones mark genuine diversity. Shape: one distinct
    // (source, token) aggregation (vocab × sources rows), a token-keyed
    // self-join whose fan-out is bounded by sources² per token, and
    // partial-agged pair counts — sizes broadcast back; no corpus
    // self-join, no broadcast of anything vocabulary-sized.
    Q("q127_source_vocab_overlap", Some("""
      WITH st AS (SELECT DISTINCT source, t FROM (
        SELECT source, unnest(string_split(text,' ')) AS t FROM documents)),
      sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM st GROUP BY source),
      pr AS (SELECT a.source AS s1, b.source AS s2,
          CAST(COUNT(*) AS BIGINT) AS inter
        FROM st a JOIN st b ON b.t = a.t AND a.source < b.source
        GROUP BY a.source, b.source)
      SELECT pr.s1, pr.s2, pr.inter, x.n AS n1, y.n AS n2,
        CAST(pr.inter AS DOUBLE) / CAST(x.n + y.n - pr.inter AS DOUBLE)
          AS jaccard,
        CAST(pr.inter AS DOUBLE) / CAST(least(x.n, y.n) AS DOUBLE)
          AS overlap_coef
      FROM pr JOIN sz x ON x.source = pr.s1 JOIN sz y ON y.source = pr.s2
      ORDER BY s1, s2""")) { (s, d) =>
      // pinned: st feeds sz and BOTH self-join sides — unpinned, the
      // corpus tokenize + distinct re-ran per consumer (4 parquet scans
      // in the committed plan; 1 after). vocab × sources rows, the
      // documented "no corpus self-join" size class above. Median of 5
      // interleaved min-of-5 probes at sf0.1: 0.81 -> 0.68 s.
      val st = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .distinct()
        .localCheckpoint()
      val sz = st.groupBy("source").agg(count(lit(1)).as("n"))
      val pr = st.select(col("source").as("s1"), col("t"))
        .join(st.select(col("source").as("s2"), col("t")), Seq("t"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      pr
        .join(broadcast(sz.select(col("source").as("s1"), col("n").as("n1"))),
          Seq("s1"))
        .join(broadcast(sz.select(col("source").as("s2"), col("n").as("n2"))),
          Seq("s2"))
        .select(col("s1"), col("s2"), col("inter"), col("n1"), col("n2"),
          (col("inter").cast("double")
            / (col("n1") + col("n2") - col("inter")).cast("double"))
            .as("jaccard"),
          (col("inter").cast("double")
            / least(col("n1"), col("n2")).cast("double")).as("overlap_coef"))
        .orderBy("s1", "s2")
    },

    // ---- keyword search: integer-weighted TF-IDF top-k retrieval ----
    // Corpus search with a portable scoring function: score(doc) =
    // Σ_term tf(doc,term) · w(term), w = (10^6 · n_docs) DIV df — the
    // idf's monotone integer stand-in (exact in both engines; ln() is
    // not bit-portable, the same trade as q87's df profiles). Shape at
    // 100 TB: the token explode filters to the query terms MAP-SIDE
    // (predicate on the exploded token — candidate postings only ever
    // hold docs containing a query term), df/weights are a
    // query-term-sized frame (broadcast), and the global top-10 is
    // TakeOrderedAndProject (per-partition heaps, q02's shape) — no
    // global sort, no index needed. Repeated queries go scan-free via
    // the staged inverted index (operators.Postings.stagePostings /
    // searchStaged — bit-identical results, proven in ScaleSpec).
    Q("q129_keyword_search", Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      ft AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk
        WHERE tok IN ('vector','stream','filter','spark','customer') GROUP BY 1, 2),
      dfr AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tk
        WHERE tok IN ('vector','stream','filter','spark','customer') GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      w AS (SELECT tok, (1000000 * n_docs) // df AS w FROM dfr, nd),
      sc AS (SELECT f.doc_id, CAST(SUM(f.tf * w.w) AS BIGINT) AS score,
        COUNT(*) AS n_terms FROM ft f JOIN w ON w.tok = f.tok GROUP BY 1)
      SELECT doc_id, score, n_terms FROM sc
      ORDER BY score DESC, doc_id LIMIT 10""")) { (s, d) =>
      val terms = Seq("vector", "stream", "filter", "spark", "customer")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isInCollection(terms))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // df from tf (its rows are the distinct (doc_id, tok) pairs): same
      // value as COUNT(DISTINCT doc_id) over raw tokens without the
      // Expand row-multiplication through the shuffle (the q56 rationale;
      // here the distinct set is O(docs × |terms|) after the term filter)
      val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = dfr.crossJoin(nd)
        .select(col("tok"), expr("(1000000L * n_docs) DIV df").as("w"))
      tf.join(broadcast(w), Seq("tok"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("w")).as("score"), count(lit(1)).as("n_terms"))
        .orderBy(desc("score"), asc("doc_id")).limit(10)
    },

    // ---- generation-loop detector: longest repeated-token run ----
    // The degenerate-text filter n-gram stats miss: a model (or a broken
    // scraper) emitting "batch batch batch …" produces a long SAME-token
    // run. Gaps-and-islands over the exploded tokens: pos − row_number
    // within (doc, token) is constant exactly along a run, so one
    // grouped count measures every run; each doc reports its longest
    // (ties → earliest start, then token). Shape at 100 TB: the explode
    // is map-side, both windows partition by doc (q76/q100's per-doc
    // ordering contract — parallel across docs, sorts bounded by one
    // doc's tokens), and the report is one row per doc of partial-agg
    // output. `looped` (run ≥ 3) is the curation gate column.
    Q("q130_repeated_run", Some("""
      WITH sp AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      t AS (SELECT doc_id, pos, tk[pos] AS tok FROM
        (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS pos FROM sp)),
      r AS (SELECT doc_id, tok, pos,
        pos - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp FROM t),
      runs AS (SELECT doc_id, tok, grp, COUNT(*) AS run_len, MIN(pos) AS start_pos
        FROM r GROUP BY 1, 2, 3),
      best AS (SELECT doc_id, tok, run_len, start_pos,
        ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY run_len DESC, start_pos, tok) AS rn FROM runs)
      SELECT doc_id, tok AS run_token, CAST(run_len AS BIGINT) AS max_run,
        CAST(start_pos AS BIGINT) AS start_pos, run_len >= 3 AS looped
      FROM best WHERE rn = 1 ORDER BY doc_id""")) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
      val wRun = Window.partitionBy(col("doc_id"), col("tok")).orderBy(col("pos"))
      val runs = t
        .withColumn("grp", col("pos") - row_number().over(wRun))
        .groupBy(col("doc_id"), col("tok"), col("grp"))
        .agg(count(lit(1)).as("run_len"), min(col("pos")).as("start_pos"))
      val wBest = Window.partitionBy(col("doc_id"))
        .orderBy(desc("run_len"), asc("start_pos"), asc("tok"))
      runs.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("run_token"),
          col("run_len").as("max_run"), col("start_pos"),
          (col("run_len") >= 3).as("looped"))
        .orderBy("doc_id")
    },

    // ---- Count-Min Sketch heavy hitters ----
    // The bounded-state answer to "what are the frequent tokens" at
    // corpus scale: the exact groupBy (q27) shuffles a vocabulary-sized
    // table — fine until the vocabulary is itself huge (web-scale
    // n-grams, URLs, user-ids). The CM sketch replaces it with ONE
    // 32 KB mergeable buffer (CountMinAggregator: depth=4 md5-seeded
    // rows × width=1024 counters) built in a single scan with map-side
    // partial merge; estimation is then map-only against the broadcast
    // sketch row (array lookups + LEAST). Estimates only ever
    // OVER-count (collisions add; min-of-rows caps them), so a sketch
    // screen never loses a true heavy hitter. Here both sides run and
    // the gate pins the sketch's exact counter values against the
    // oracle's per-(row,bucket) sums — the estimate is deterministic
    // arithmetic, not an approximation contract, so it hash-matches.
    Q("q132_cms_heavy_hitters", Some(s"""
      WITH tok AS (SELECT unnest(string_split(text,' ')) AS t FROM documents),
      cnts AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
      buck AS (
        ${(0 until 4).map(j =>
          s"SELECT $j AS j, ${dkHash("t", 601 + j)} % 1024 AS b, SUM(cnt) AS s FROM cnts GROUP BY 2")
          .mkString("\n        UNION ALL ")}),
      topk AS (SELECT t, cnt FROM cnts ORDER BY cnt DESC, t LIMIT 20),
      tb AS (
        ${(0 until 4).map(j =>
          s"SELECT t, cnt, $j AS j, ${dkHash("t", 601 + j)} % 1024 AS b FROM topk")
          .mkString("\n        UNION ALL ")}),
      est AS (SELECT tb.t, tb.cnt, MIN(bu.s) AS cms_estimate
        FROM tb JOIN buck bu ON bu.j = tb.j AND bu.b = tb.b GROUP BY 1, 2)
      SELECT t AS token, cnt, CAST(cms_estimate AS BIGINT) AS cms_estimate,
        CAST(cms_estimate - cnt AS BIGINT) AS overcount
      FROM est ORDER BY cnt DESC, token""")) { (s, d) =>
      val W = 1024
      val depth = 4
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
      val cnts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      val topk = cnts.orderBy(desc("cnt"), asc("token")).limit(20)
      val sketch = toks.agg(
        udaf(new graft.functions.CountMinAggregator(W, depth, 601))
          .apply(col("token")).as("sk"))
      val probes = (0 until depth).map { j =>
        element_at(col("sk"),
          (lit(j * W) + pmod(hash64(col("token"), 601 + j), lit(W)) + 1).cast("int"))
      }
      topk.crossJoin(broadcast(sketch))
        .select(col("token"), col("cnt"), least(probes: _*).as("cms_estimate"))
        .withColumn("overcount", col("cms_estimate") - col("cnt"))
        .orderBy(desc("cnt"), asc("token"))
    },

    // ---- rare-token scrub: the CMS sketch USED in a pipeline ----
    // The production use of q132's sketch: gate each token on its
    // estimated corpus frequency WITHOUT materializing or joining a
    // vocabulary-sized count table. Pass 1 builds the 32 KB sketch;
    // pass 2 probes it per exploded token against the broadcast one-row
    // frame (array lookups + LEAST — map-only, whole-stage-codegen'd)
    // and counts per doc how many tokens clear the floor. Because CMS
    // only over-counts, a token scrubbed here is CERTAINLY below the
    // floor — the conservative direction for "drop noise tokens"
    // (typos, mojibake, leaked markup never kept by collision luck is
    // impossible; a rare token kept by collision is the tolerable
    // error). At corpus scale the vocabulary join this replaces is a
    // shuffle of every token against a billion-row count table; the
    // sketch probe is free.
    Q("q135_rare_token_scrub", Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      cnts AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
      buck AS (
        ${(0 until 4).map(j =>
          s"SELECT $j AS j, ${dkHash("t", 601 + j)} % 1024 AS b, SUM(cnt) AS s FROM cnts GROUP BY 2")
          .mkString("\n        UNION ALL ")}),
      tb AS (
        ${(0 until 4).map(j =>
          s"SELECT t, $j AS j, ${dkHash("t", 601 + j)} % 1024 AS b FROM (SELECT DISTINCT t FROM cnts)")
          .mkString("\n        UNION ALL ")}),
      est AS (SELECT tb.t, MIN(bu.s) AS est FROM tb
        JOIN buck bu ON bu.j = tb.j AND bu.b = tb.b GROUP BY 1)
      SELECT tok.doc_id, COUNT(*) AS n_tokens,
        COUNT(CASE WHEN e.est >= 500 THEN 1 END) AS n_kept,
        CAST(COUNT(*) - COUNT(CASE WHEN e.est >= 500 THEN 1 END) AS DOUBLE)
          / COUNT(*) AS scrub_frac
      FROM tok JOIN est e ON e.t = tok.t
      GROUP BY tok.doc_id ORDER BY tok.doc_id""")) { (s, d) =>
      val W = 1024
      val depth = 4
      val floorN = 500L
      val docs = Tables.documents(s, d)
      val sketch = docs
        .select(explode(split(col("text"), " ")).as("token"))
        .agg(udaf(new graft.functions.CountMinAggregator(W, depth, 601))
          .apply(col("token")).as("sk"))
      val probes = (0 until depth).map { j =>
        element_at(col("sk"),
          (lit(j * W) + pmod(hash64(col("token"), 601 + j), lit(W)) + 1).cast("int"))
      }
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .crossJoin(broadcast(sketch))
        .withColumn("est", least(probes: _*))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("est") >= floorN, 1)).as("n_kept"))
        .select(col("doc_id"), col("n_tokens"), col("n_kept"),
          ((col("n_tokens") - col("n_kept")).cast("double") / col("n_tokens"))
            .as("scrub_frac"))
        .orderBy("doc_id")
    },

    // ---- linear classifier gate over hashed bigram features ----
    // The INFERENCE shape of corpus curation (fastText-style quality
    // classifier, toxicity gate, domain scorer): a trained linear model
    // over hashing-trick features applied to every document. Features
    // are all bigram occurrences (compiled wordShinglesAll — map-side),
    // each hashed into one of 512 weight buckets; the doc score is one
    // partial-agg SUM of integer bucket weights and the gate is
    // score > 0. Here the 512-entry weight vector is md5-derived (the
    // deterministic test stand-in — a real model ships the same-shape
    // 512-row table and broadcasts it); everything downstream of
    // training is exactly this plan: no vocabulary join, no UDF, one
    // corpus pass, per-(source) roll-up of pass rates. Integer weights
    // keep both engines bit-identical (q129's idf trade).
    Q("q136_classifier_gate", Some(s"""
      WITH bg AS (SELECT doc_id, source,
          unnest(list_transform(generate_series(1, len(tk)-1),
            i -> array_to_string(tk[i:i+1], ' '))) AS g
        FROM (SELECT doc_id, source, string_split(text,' ') AS tk FROM documents)),
      sc AS (SELECT doc_id, source,
          SUM((${dkHash(s"CAST(${dkHash("g", 701)} % 512 AS VARCHAR)", 703)} % 2001) - 1000) AS score
        FROM bg GROUP BY 1, 2),
      ds AS (SELECT d.doc_id, d.source, COALESCE(sc.score, 0) AS score
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)
      SELECT source, COUNT(*) AS n_docs,
        COUNT(CASE WHEN score > 0 THEN 1 END) AS n_pass,
        CAST(COUNT(CASE WHEN score > 0 THEN 1 END) AS DOUBLE) / COUNT(*) AS pass_share,
        CAST(SUM(score) AS BIGINT) AS sum_score
      FROM ds GROUP BY source ORDER BY source""")) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val sc = docs
        .select(col("doc_id"), col("source"),
          explode(graft.functions.GraftFunctions.wordShinglesAll(col("text"), 2))
            .as("g"))
        .withColumn("b", hash64(col("g"), 701) % 512)
        .withColumn("w", (hash64(col("b").cast("string"), 703) % 2001) - 1000)
        .groupBy("doc_id", "source").agg(sum(col("w")).as("score"))
      docs.select(col("doc_id"), col("source"))
        .join(sc.select(col("doc_id"), col("score")), Seq("doc_id"), "left")
        .withColumn("score", coalesce(col("score"), lit(0L)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("score") > 0, 1)).as("n_pass"),
          sum(col("score")).as("sum_score"))
        .select(col("source"), col("n_docs"), col("n_pass"),
          (col("n_pass").cast("double") / col("n_docs")).as("pass_share"),
          col("sum_score"))
        .orderBy("source")
    },

    // ---- feature-hashing (hashing-trick) text embeddings ----
    // The deterministic text→vector bridge (Weinberger et al.'s hashing
    // trick): every token occurrence adds ±1 (md5-derived sign) to one
    // of 64 hashed dimensions, giving each doc a dense integer vector
    // whose dot products approximate token-bag similarity — the cheap
    // embedding that feeds the q34-q36/q48 vector ops when no model
    // embedding exists (classifier features, cold-start near-dup,
    // cluster seeding). One explode pass, one (doc, dim)-grouped sum
    // (≤64 rows per doc through the shuffle — narrower than the token
    // stream), then a per-doc map→dense-array assembly; NO vocabulary
    // is built or joined, which is the point of hashing features at
    // corpus scale. All-integer, so fvec/l2sq/nnz are bit-identical in
    // both engines (the oracle assembles the dense vector with a
    // grid LEFT JOIN — relational-only SQL has no map type; same rows).
    // The vector ships pipe-joined to a string — the q55 house pattern:
    // the driver's pandas compare can't hash a raw array cell.
    Q("q137_feature_hash_embed", Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      tv AS (SELECT doc_id, ${dkHash("t", 801)} % 64 AS d,
          CASE WHEN ${dkHash("t", 802)} % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM tok),
      dv AS (SELECT doc_id, d, CAST(SUM(s) AS BIGINT) AS sd FROM tv GROUP BY 1, 2),
      grid AS (SELECT dd.doc_id, g.i FROM (SELECT DISTINCT doc_id FROM documents) dd,
        generate_series(0, 63) g(i)),
      fv AS (SELECT grid.doc_id, grid.i, COALESCE(dv.sd, 0) AS sd
        FROM grid LEFT JOIN dv ON dv.doc_id = grid.doc_id AND dv.d = grid.i)
      SELECT doc_id,
        string_agg(CAST(sd AS VARCHAR), '|' ORDER BY i) AS fvec,
        CAST(SUM(sd * sd) AS BIGINT) AS l2sq,
        CAST(SUM(CASE WHEN sd <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz
      FROM fv GROUP BY doc_id ORDER BY doc_id""")) { (s, d) =>
      val tv = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("dm", (hash64(col("t"), 801) % 64).cast("int"))
        .withColumn("sg",
          when(hash64(col("t"), 802) % 2 === 0, lit(1L)).otherwise(lit(-1L)))
      val maps = tv.groupBy("doc_id", "dm").agg(sum(col("sg")).as("sd"))
        .groupBy("doc_id")
        .agg(map_from_arrays(collect_list(col("dm")), collect_list(col("sd")))
          .as("m"))
      // LEFT JOIN back onto the corpus = the oracle's doc_id grid:
      // explode of a NULL token list EMITS NO ROWS, so without it a
      // NULL-text doc silently vanishes from the feature table while
      // the oracle emits its zero vector (caught by null_check.py).
      // A feature table must cover the corpus; no-token docs embed as
      // the zero vector (the coalesce maps the missing map to all-0).
      Tables.documents(s, d).select(col("doc_id"))
        .join(maps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(63)),
            i => coalesce(element_at(col("m"), i), lit(0L))).as("fv"))
        .select(col("doc_id"),
          array_join(col("fv").cast("array<string>"), "|").as("fvec"),
          aggregate(col("fv"), lit(0L), (a, x) => a + x * x).as("l2sq"),
          aggregate(col("fv"), lit(0L),
            (a, x) => a + when(x =!= 0L, lit(1L)).otherwise(lit(0L))).as("nnz"))
        .orderBy("doc_id")
    },

    // ---- systematic PPS sampling by token mass ----
    // The token-weighted mixing draw (Sampling.systematicPps): docs laid
    // out per source in seeded-hash order, token weights accumulate,
    // keep exactly the rows whose weight span straddles a 300-token
    // boundary — each kept doc represents one 300-token block, so
    // inclusion probability ∝ n_tokens and each source's sample count ∝
    // its token mass (what an equal-count draw like q83 gets wrong for
    // token-budgeted mixtures, and what q121 doesn't answer — that's a
    // hard prefix, this is a rate). All-integer running sums in a
    // deterministic order: repartition/retry-stable, bit-identical in
    // both engines. The windows are sharded by hash-top-bits bucket
    // (exact two-pass prefix sum), so a dominant source never funnels
    // its whole stratum through one task's sort — the oracle's single
    // window per source IS the semantics; the sharding is plan-only.
    Q("q138_pps_sample", Some(s"""
      WITH w AS (SELECT doc_id, source, len(string_split(text,' ')) AS nt,
          ${dkHash("CAST(doc_id AS VARCHAR)", 901)} AS h
        FROM documents),
      c AS (SELECT doc_id, source, nt,
          SUM(nt) OVER (PARTITION BY source ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM w)
      SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens,
        CAST(cum AS BIGINT) AS cum
      FROM c WHERE cum // 300 > (cum - nt) // 300
      ORDER BY doc_id""")) { (s, d) =>
      graft.operators.Sampling.systematicPps(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).as("nt")),
          Seq("source"), "doc_id", col("nt"), step = 300L, seed = 901)
        .select(col("doc_id"), col("source"),
          col("nt").cast("long").as("n_tokens"), col("cum"))
        .orderBy("doc_id")
    }
  )
}
