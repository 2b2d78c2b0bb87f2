package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Num._
import graft.functions.GraftFunctions.charNgrams
import graft.operators.{Dedup, Similarity}

/** Additional training-data-pipeline ops: embedding-cosine near-dup,
  * character-n-gram Jaccard dedup, BPE-ish regex token counting, and the
  * SQL surface (GROUPING SETS via registered views). */
object Pipeline extends QueryModule {

  // the shared DuckDB-mirror hash derivations (DkSql)
  import DkSql.{dkHash, dkMix}

  val all: Seq[Q] = Seq(

    // ---- embedding-cosine near-duplicate pairs (LSH buckets + exact) ----
    // Corpus × corpus self-join ⇒ the SCALING.md occupancy rule applies
    // (planes grow with log2(n) to hold bucket occupancy — and with it
    // the n²/2^planes candidate count — near 128; fixed planes=4
    // measured superlinear in the sf1 soak). t=128 keeps planesUsed=4,
    // bit-identical output, at every driver gate SF (n <= 2000); the np
    // CTE derives the identical plane count integer-exactly from
    // COUNT(*).
    Q("q48_embedding_near_dup", Some(s"""
      WITH np AS (SELECT greatest(4,
          length(bin(greatest((COUNT(*) + 127) // 128 - 1, 0)))) AS p
        FROM embeddings),
      w AS (SELECT p.p, j.j,
        (CAST(CAST(('0x'||substr(md5('plane:'||p.p||':'||j.j),1,15)) AS BIGINT) AS DOUBLE)
          / 1152921504606846976.0) * 2.0 - 1.0 AS w
        FROM generate_series(0, 29) p(p), generate_series(1, 64) j(j), np
        WHERE p.p < np.p),
      pd AS (SELECT e.vec_id, w.p,
        CAST(CAST(SUM(CAST(floor((CAST(e.embedding[w.j] AS DOUBLE) * w.w) * 2.88230376151711744e17) AS BIGINT)) AS BIGINT) AS DOUBLE) / 2.88230376151711744e17 AS d
        FROM embeddings e, w GROUP BY e.vec_id, w.p),
      sig AS (SELECT vec_id,
        CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
        FROM pd GROUP BY vec_id),
      n2 AS (SELECT vec_id,
        CAST(CAST(SUM(CAST(floor((CAST(embedding[g.j] AS DOUBLE) * CAST(embedding[g.j] AS DOUBLE)) * 2.88230376151711744e17) AS BIGINT)) AS BIGINT) AS DOUBLE) / 2.88230376151711744e17 AS n2
        FROM embeddings, generate_series(1, 64) g(j) GROUP BY vec_id),
      cand AS (SELECT x.vec_id AS a, y.vec_id AS b
        FROM sig x JOIN sig y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
      dots AS (SELECT c.a, c.b,
        CAST(CAST(SUM(CAST(floor((CAST(ea.embedding[g.j] AS DOUBLE) * CAST(eb.embedding[g.j] AS DOUBLE)) * 2.88230376151711744e17) AS BIGINT)) AS BIGINT) AS DOUBLE) / 2.88230376151711744e17 AS dot
        FROM cand c JOIN embeddings ea ON ea.vec_id = c.a
          JOIN embeddings eb ON eb.vec_id = c.b, generate_series(1, 64) g(j)
        GROUP BY c.a, c.b)
      SELECT d.a, d.b, d.dot/(sqrt(na.n2)*sqrt(nb.n2)) AS cosine
      FROM dots d JOIN n2 na ON na.vec_id = d.a JOIN n2 nb ON nb.vec_id = d.b
      WHERE d.dot/(sqrt(na.n2)*sqrt(nb.n2)) >= 0.2 ORDER BY a, b""")) { (s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d),
          planes = 4, dim = 64, threshold = 0.2,
          targetOccupancy = Some(128L))
        .orderBy("a", "b")
    },

    // ---- character-n-gram Jaccard near-dup (MinHash+LSH, 8-grams) ----
    Q("q49_char_ngram_dedup", Some(s"""
      -- Overlapping char 8-grams as the UNION of 8 NON-overlapping
      -- regexp_extract_all scans (one per start offset): identical set
      -- to the per-position substr form (RE2 '.' = one code point,
      -- (?s) admits newlines), but O(8n) instead of O(n^2) — DuckDB's
      -- UTF-8-aware substr is O(position), so per-position substr over
      -- the unicode gate's 100 kB docs cost the oracle ~585 s
      -- (measured r14); this form runs the same docs in ~2 s.
      WITH sh AS (SELECT doc_id,
        CASE WHEN length(text) >= 8 THEN
          list_distinct(flatten([
            ${(1 to 8).map(k =>
              s"regexp_extract_all(substr(text, $k), '(?s).{8}')")
              .mkString(",\n            ")}]))
        ELSE [] END AS sh FROM documents),
      -- hash each shingle ONCE, then 8 cheap xor-min passes: same values
      -- as 8 independent md5 passes (xor distributes over the mix
      -- constants), 8x less md5 work
      hs AS (SELECT doc_id, sh,
        list_transform(sh, t -> ${dkHash("t", 0)}) AS hs FROM sh),
      mh AS (SELECT doc_id, sh,
        ${(0 until 8).map(i =>
          s"list_min(list_transform(hs, h -> xor(h, ${dkMix(i)}))) AS mh$i").mkString(",\n        ")}
      FROM hs),
      bands AS (
        ${(0 until 2).map(b =>
          s"SELECT doc_id, $b AS band, " +
            (0 until 4).map(r => s"CAST(mh${4 * b + r} AS VARCHAR)")
              .mkString("||'_'||") + " AS bkey FROM mh")
          .mkString("\n        UNION ALL ")}),
      cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      j AS (SELECT c.a, c.b,
        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
        FROM cand c JOIN mh sa ON sa.doc_id = c.a JOIN mh sb ON sb.doc_id = c.b)
      SELECT a, b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY a, b""")) { (s, d) =>
      // bands=2 × rows=4: collision P ≈ j⁴ — at the 0.8 threshold this
      // prunes weak-overlap candidates that 2-row bands let through
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          numHashes = 8, bands = 2, threshold = 0.8,
          shingler = charNgrams(_, 8))
        .orderBy("a", "b")
    },

    // ---- BPE-ish regex token counting ----
    Q("q50_bpe_tokens", Some("""
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
          AS n_bpe,
        CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INT)
          AS n_distinct_bpe
      FROM documents ORDER BY doc_id""")) { (s, d) =>
      val toks = expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(toks).as("n_bpe"),
        size(array_distinct(toks)).as("n_distinct_bpe")
      ).orderBy("doc_id")
    },

    // ---- SQL surface: GROUPING SETS over registered views ----
    // HAVING pins the empty-input contract (see q08): Spark emits no
    // rows over an empty relation, standard SQL emits the () row
    Q("q51_grouping_sets", Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ${sqlSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      HAVING COUNT(*) > 0
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(floor(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
            / 1000000.0 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }
  )
}
