package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f; f
      println(f"TIMING $tag ${(System.nanoTime() - t0) / 2e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()

    val raw = spark.read.parquet(s"$d/documents.parquet")
    val spreadDocs = graft.core.Tables.documents(spark, d)

    time("scan_only") { noop(raw) }
    time("spread_only") { noop(spreadDocs) }
    time("shingles_no_spread") {
      noop(raw.select(col("doc_id"), shingles(col("text"), 3).as("sh"))) }
    time("shingles_spread") {
      noop(spreadDocs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))) }
    def sigs(base: org.apache.spark.sql.DataFrame) = {
      val sh = base.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      def slot(s: Int) = min(col("g").bitwiseXOR(lit(mixConstant(s)))).as(s"mh$s")
      sh.select(col("doc_id"), explode(col("sh")).as("t"))
        .select(col("doc_id"), hash64(col("t"), 0).as("g"))
        .groupBy("doc_id").agg(slot(0), (1 until 8).map(slot): _*)
    }
    val shdf = spreadDocs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    time("explode_only") { noop(shdf.select(col("doc_id"), explode(col("sh")).as("t"))) }
    time("explode_hash") { noop(shdf.select(col("doc_id"), explode(col("sh")).as("t"))
      .select(col("doc_id"), hash64(col("t"), 0).as("g"))) }
    time("sigs_spread") { noop(sigs(spreadDocs)) }
    time("sigs_plus_orderby") { noop(sigs(spreadDocs).orderBy("doc_id")) }
    // materialize the shingle array via the exchange, THEN explode:
    // generator input becomes a plain attribute -> Generate stays in codegen
    val shFirst = raw.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .repartition(32)
    def slot2(s: Int) = min(col("g").bitwiseXOR(lit(mixConstant(s)))).as(s"mh$s")
    val sig2 = shFirst.select(col("doc_id"), explode(col("sh")).as("t"))
      .select(col("doc_id"), hash64(col("t"), 0).as("g"))
      .groupBy("doc_id").agg(slot2(0), (1 until 8).map(slot2): _*)
    time("sigs_sh_first") { noop(sig2) }
    time("sigs_sh_first_ordered") { noop(sig2.orderBy("doc_id")) }
    // same DataFrame object: planning happens once, so run2+ is pure execution
    val fixed = sigs(spreadDocs)
    fixed.collect()
    val t1 = System.nanoTime(); fixed.collect(); fixed.collect()
    println(f"TIMING sigs_reexecute_sameplan ${(System.nanoTime() - t1) / 2e9}%.2f s")
    val fresh = () => sigs(spreadDocs)
    fresh().collect()
    val t2 = System.nanoTime(); fresh().collect(); fresh().collect()
    println(f"TIMING sigs_fresh_plan_each ${(System.nanoTime() - t2) / 2e9}%.2f s")
    spark.stop()
  }
}
// appended variant probe
object MinhashProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val d = "/root/testdata/sf0.1"
    val docs = graft.core.Tables.documents(spark, d)
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def sigs() = {
      val sh = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      def slot(s: Int) = min(col("g").bitwiseXOR(lit(mixConstant(s)))).as(s"mh$s")
      sh.select(col("doc_id"), explode(col("sh")).as("t"))
        .select(col("doc_id"), hash64(col("t"), 0).as("g"))
        .groupBy("doc_id").agg(slot(0), (1 until 8).map(slot): _*)
    }
    noop(sigs())
    val t0 = System.nanoTime(); noop(sigs()); noop(sigs())
    println(f"TIMING sigs_no_aqe ${(System.nanoTime() - t0) / 2e9}%.2f s")
    spark.stop()
  }
}
