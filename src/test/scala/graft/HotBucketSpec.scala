package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.GraftFunctions.charNgrams

/** Pair-identity proof for [[Dedup.candidatePairs]]' hot-bucket memory
  * bound: a fixture with a FORCED over-cap band-bucket (a viral-template
  * exact-dup pile — every pile row lands in the same bucket in every
  * band) must produce bit-identical pairs whether the bucket carries its
  * shingle sets through the join (cap above the pile) or buffers slim and
  * reassembles them from the mirrored orientation (cap below). This is
  * the spec the q49 scale fix hangs on: the bounded path is only correct
  * if it is INVISIBLE in the output.
  *
  * The capped machinery lives in the sort-merge regime — below the
  * broadcast threshold candidatePairs runs the plain broadcast-join fast
  * path where no group buffering exists (see its scaladoc) — so each
  * comparison here runs BOTH regimes: the uncapped reference under the
  * session default (broadcast) and the capped run with
  * autoBroadcastJoinThreshold disabled (forcing SMJ + window). That also
  * pins broadcast-vs-SMJ plan equivalence for the whole pair family.
  */
class HotBucketSpec extends SparkTestBase {
  import spark.implicits._

  /** Run `f` with broadcast joins disabled — forces the SMJ regime and
    * with it the window-bounded hot-bucket path. */
  private def forceSmj[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  /** 12 identical viral docs (one packed bucket), 2 near-dup pairs that
    * land in ordinary buckets, and isolated docs — so a mid-range cap
    * exercises BOTH paths in one run. */
  private def fixture = {
    val viral = (1L to 12L).map(i =>
      (i, "breaking viral template text shared by every repost of this story"))
    val nearA = Seq(
      (21L, "the quick brown fox jumps over the lazy dog tonight"),
      (22L, "the quick brown fox jumps over the lazy dog today"))
    val nearB = Seq(
      (31L, "spark engines shuffle partitions across the executor fleet"),
      (32L, "spark engines shuffle partitions across the executor fleet twice"))
    val solo = Seq(
      (41L, "completely unrelated content about gardening and soil quality"),
      (42L, "another isolated document concerning maritime navigation charts"))
    (viral ++ nearA ++ nearB ++ solo).toDF("doc_id", "text")
  }

  private val uncapped = Int.MaxValue

  test("minhashLshPairsWithSigs: capped output is bit-identical to uncapped on a forced hot bucket") {
    val df = fixture
    def run(cap: Int) =
      Dedup.minhashLshPairsWithSigs(df, "doc_id", "text",
          numHashes = 8, bands = 4, threshold = 0.3, hotBucketCap = cap)
        .collect().map(_.toSeq).toSet
    val fat = run(uncapped)
    // viral pile (12) is hot; near-dup buckets (2) cold
    val slim = forceSmj(run(4))
    assert(fat === slim)
    // sanity: the pile really produced its C(12,2) pairs at jaccard 1.0
    val pile = forceSmj(Dedup.minhashLshPairs(df, "doc_id", "text",
        numHashes = 8, bands = 4, threshold = 0.99, hotBucketCap = 4)
      .filter(col("a") <= 12 && col("b") <= 12).count())
    assert(pile === 66L, "expected all 66 viral-pile pairs through the bounded path")
  }

  test("minhashLshPairs: every-bucket-hot (cap=1) still pair-identical") {
    val df = fixture
    def run(cap: Int) =
      Dedup.minhashLshPairs(df, "doc_id", "text",
          numHashes = 8, bands = 2, threshold = 0.3, hotBucketCap = cap)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(uncapped) === forceSmj(run(1)))
  }

  test("containmentPairs (incl. asymmetric segment banding): capped identical to uncapped") {
    val long = (1 to 30).map(i => s"filler$i").mkString(" ") +
      " the exact quoted passage hides inside this very long host document " +
      (31 to 60).map(i => s"filler$i").mkString(" ")
    val docs = ((1L to 10L).map(i =>
        (i, "identical boilerplate disclaimer attached to every single message")) ++
      Seq((90L, "the exact quoted passage hides inside this very long host document"),
          (91L, long))).toDF("doc_id", "text")
    def run(cap: Int) =
      Dedup.containmentPairs(docs, "doc_id", "text",
          numHashes = 8, bands = 4, threshold = 0.5,
          segmentTokens = 12, hotBucketCap = cap)
        .collect().map(_.toSeq).toSet
    assert(run(uncapped) === forceSmj(run(3)))
  }

  test("char-ngram shingler (the q49 shape): capped identical to uncapped") {
    val df = fixture
    def run(cap: Int) =
      Dedup.minhashLshPairs(df, "doc_id", "text",
          numHashes = 8, bands = 2, threshold = 0.8,
          shingler = charNgrams(_, 8), hotBucketCap = cap)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(uncapped) === forceSmj(run(4)))
  }

  test("SMJ regime with NO hot bucket equals the broadcast fast path") {
    val df = fixture
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Long, Double)].collect().toSet
    val bc = run(Dedup.minhashLshPairs(df, "doc_id", "text", threshold = 0.3))
    val smj = forceSmj(run(
      Dedup.minhashLshPairs(df, "doc_id", "text", threshold = 0.3)))
    assert(bc === smj)
  }
}
