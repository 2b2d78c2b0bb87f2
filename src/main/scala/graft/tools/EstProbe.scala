package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: what the optimizer's sizeInBytes estimates say for
  * the LSH family's two plan-shape decisions (re-spread budget, broadcast
  * vs SMJ) at a given sf dir. */
object EstProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, d)
    val src0 = docs.select(col("doc_id").as("doc_id"), col("text").as("__text"))
    println(s"EST src0=${src0.queryExecution.optimizedPlan.stats.sizeInBytes} " +
      s"parts=${src0.rdd.getNumPartitions}")
    val sh = src0.select(col("doc_id"),
      graft.functions.GraftFunctions.hashedSet(
        graft.functions.GraftFunctions.charNgrams(col("__text"), 8)).as("sh"))
    println(s"EST sh=${sh.queryExecution.optimizedPlan.stats.sizeInBytes}")

    // which stage acquires the big execution-memory chunk?
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      })
    def measure(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      peak.set(0)
      df.write.format("noop").mode("overwrite").save()
      println(s"PEAK $tag ${peak.get}")
    }
    measure("sh_maponly")(sh)
    measure("sh_repart")(sh.repartition(32))
    import org.apache.spark.sql.expressions.Window
    measure("sh_window")(sh.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("doc_id")))))
    measure("plain_sort")(sh.select(col("doc_id")).orderBy("doc_id"))

    // the exact banded map stage: minhash + posexplode + band keys +
    // hash exchange on (band, bkey)
    val sigs = sh.select(col("doc_id"), col("sh"),
      graft.functions.GraftFunctions.minhashSlotsFromHashes(col("sh"), 8).as("__mh"))
      .select(col("doc_id") :: col("sh") ::
        (0 until 8).map(i => element_at(col("__mh"), i + 1).as(s"mh$i")).toList: _*)
    val bandKeys = array((0 until 2).map { b =>
      concat_ws("_", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*)
    }: _*)
    val banded = sigs.select(
      (col("doc_id") +: col("sh") +: (0 until 8).map(i => col(s"mh$i"))) :+
        posexplode(bandKeys).as(Seq("band", "bkey")): _*)
      .filter(length(col("bkey")) > 0)
    measure("banded_maponly")(banded)
    measure("banded_exchange")(banded.repartition(col("band"), col("bkey")))
    measure("banded_sigs_only")(sigs)
    measure("pairs")(graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", numHashes = 8, bands = 2, threshold = 0.8,
      shingler = graft.functions.GraftFunctions.charNgrams(_, 8)))
    measure("pairs_ordered")(graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", numHashes = 8, bands = 2, threshold = 0.8,
      shingler = graft.functions.GraftFunctions.charNgrams(_, 8))
      .orderBy("a", "b"))
    spark.stop()
  }
}
