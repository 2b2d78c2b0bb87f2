package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment path: a session built ONLY with
  * `spark.sql.extensions=graft.core.GraftExtensions` (no in-process
  * GraftFunctions.register call) must expose every engine function to
  * SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions registers all engine functions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql("""
        SELECT
          graft_hamming(0L, 7L) AS h,
          graft_hash64('a', 0) AS hv,
          graft_word_shingles('a b c', 2) AS ws,
          graft_char_ngrams('abcd', 2) AS cs,
          graft_minhash_slots(array('a', 'b'), 4) AS mh,
          graft_simhash(array('a', 'b'), 16) AS sh
      """).head()
      assert(r.getAs[Int]("h") === 3)
      // same value as the md5-hex mirror
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest("a:0".getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15)
      assert(r.getAs[Long]("hv") === java.lang.Long.parseLong(hex, 16))
      assert(r.getAs[scala.collection.Seq[String]]("ws").toSeq === Seq("a b", "b c"))
      assert(r.getAs[scala.collection.Seq[String]]("cs").toSeq === Seq("ab", "bc", "cd"))
      assert(r.getAs[scala.collection.Seq[Long]]("mh").length === 4)
      // aggregate path
      val agg = spark.sql("""
        SELECT graft_fpvec_sum(v) AS s FROM VALUES
          (array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)
      """).head().getAs[scala.collection.Seq[Long]]("s").toSeq
      assert(agg === Seq(
        math.floor(1.0 * 1099511627776.0).toLong + math.floor(3.0 * 1099511627776.0).toLong,
        math.floor(2.0 * 1099511627776.0).toLong + math.floor(4.0 * 1099511627776.0).toLong))

      // the injected optimizer rule rewrites the portable md5 composition
      // (parquet source — a local relation would fold at optimize time)
      val plan = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr(
          "CAST(conv(substring(md5(concat(text, ':3')), 1, 15), 16, 10) AS BIGINT) AS h")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_hash64"), plan)
    } finally spark.stop()
  }
}
