package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** One-off diagnostic: band-bucket size distribution for the LSH dedup
  * family at a given sf dir — how many buckets exceed the hot cap, and
  * how big the hottest is, for the q49 (char 8-gram, 2×4) and default
  * (word 3-gram, 4×2 / 2×4) parameterizations. Drives the
  * [[graft.operators.Dedup.DefaultHotBucketCap]] choice. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, d)

    def probe(tag: String, numHashes: Int, bands: Int,
        mk: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val rows = numHashes / bands
      val sh = docs.select(col("doc_id"), mk(col("text")).as("sh"))
      val sigs = sh.select(col("doc_id"),
        GraftFunctions.minhashSlots(col("sh"), numHashes).as("m"))
      val bkeys = sigs.select(col("doc_id"), posexplode(array((0 until bands).map { b =>
        concat_ws("_", (0 until rows).map(r =>
          element_at(col("m"), b * rows + r + 1)): _*)
      }: _*)).as(Seq("band", "bkey")))
        .filter(length(col("bkey")) > 0)
      val sizes = bkeys.groupBy("band", "bkey").count()
      val agg = sizes.agg(
        count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
        sum(when(col("count") > 1024, 1).otherwise(0)).as("gt_1024"),
        sum(when(col("count") > 256, 1).otherwise(0)).as("gt_256"),
        sum(when(col("count") > 64, 1).otherwise(0)).as("gt_64"),
        expr("percentile(count, 0.999)").as("p999")).collect()(0)
      println(s"PROBE $tag: $agg")
    }

    probe("q49_char8_b2r4", 8, 2, GraftFunctions.charNgrams(_, 8))
    probe("default_word3_b4r2", 8, 4,
      GraftFunctions.wordShingles(_, 3))
    probe("word3_b2r4", 8, 2, GraftFunctions.wordShingles(_, 3))
    spark.stop()
  }
}
