package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Event, StatefulOps}

/** Measurement provenance for [[StreamLate]]'s interval-join pin: dumps
  * the join's per-batch stateOperators metrics (buffered/removed rows +
  * watermark) under the late-data schedule. Its run shows batch 1's 120
  * buffered rows removed at the END of batch 2 (`removed=120`) once the
  * watermark advanced past their match horizon — state removal is
  * prompt, not watermark-lagged — and the late row at batch 4 pairs with
  * nothing. */
object JoinStateProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val T0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(s: Long) = new Timestamp(T0 + s * 1000)
    def lev(off: Long): Event = Event(off, ts(off), off % 5, "l", 0.0)
    def rev(off: Long): Event = Event(off + 500000, ts(off), off % 5, "r", 0.0)
    val msL = MemoryStream[Event]; val msR = MemoryStream[Event]
    val q = StatefulOps.intervalJoin(msL.toDF(), msR.toDF(), "user_id",
        "900 seconds", "60 seconds", "60 seconds")
      .writeStream.format("memory").queryName("jsp")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jsp").toString)
      .start()
    def band(from: Long, n: Int, step: Long) = (0 until n).map(i => from + i * step)
    def report(tag: String): Unit = {
      val p = q.lastProgress
      if (p != null) {
        val so = p.stateOperators
        val wm = Option(p.eventTime.get("watermark")).getOrElse("-")
        println(s"[$tag] wm=$wm " + so.map(o =>
          s"rows=${o.numRowsTotal} removed=${o.numRowsRemoved}").mkString(","))
      }
    }
    msL.addData(band(0, 60, 10).map(lev)); msR.addData(band(30, 60, 10).map(rev))
    q.processAllAvailable(); report("b1")
    msL.addData(band(2700, 60, 10).map(lev)); msR.addData(band(2730, 60, 10).map(rev))
    q.processAllAvailable(); report("b2")
    msL.addData(band(3600, 60, 10).map(lev)); msR.addData(band(3630, 60, 10).map(rev))
    q.processAllAvailable(); report("b3")
    msL.addData(Seq(lev(500L)))
    q.processAllAvailable(); report("b4-late")
    val late = spark.table("jsp")
      .filter(org.apache.spark.sql.functions.col("event_id") === 500L).count()
    println(s"late pairs=$late")
    q.stop(); spark.stop()
  }
}
