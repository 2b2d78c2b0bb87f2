package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream sinks (SURVEY §2.1 S2/S9/S10, §2.7 T6).
  *
  * - [[partitionedParquet]] is the reference's "main DB + timestamp
  *   secondary index" (src/main.c:57-58) re-expressed as an event-date
  *   partitioned table: time-range scans become partition pruning.
  * - [[alerts]] is the email/notification sink (utils/email-sender*) as a
  *   `ForeachWriter`: the engine owns the operator; delivery transport is
  *   a pluggable [[Notifier]].
  */
object Sinks {

  /** Append stream to parquet partitioned by event date. */
  def partitionedParquet(events: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    events.withColumn("event_date", to_date(col("ts")))
      .writeStream
      .partitionBy("event_date")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming keep-latest upsert into a keyed parquet store (the
    * reference's "main DB" S9 write path). The store is partitioned by a
    * hash bucket of the key, so every key lives in exactly one partition;
    * each micro-batch keeps its newest row per key, merges with only the
    * buckets it touches, and dynamically overwrites those buckets. Work
    * per batch is bounded by the batch's key spread × bucket size — not
    * the store size. */
  def upsertParquet(events: DataFrame, path: String, checkpointDir: String,
      keys: Seq[String], seqCol: String, buckets: Int = 16): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val bucket = pmod(hash(keys.map(col): _*), lit(buckets))
        // Equal-seq ties break on the remaining columns (sorted by name)
        // so the winning row is a function of row CONTENT, not execution
        // order — a bare orderBy(seqCol) window picks an arbitrary winner
        // per run, and store content would differ across batch retries.
        val tieBreak = (batch.columns.toSet -- keys - seqCol).toSeq.sorted
        val order = col(seqCol) +: tieBreak.map(col)
        val latest = graft.operators.Dedup.keepLatest(batch, keys, order)
          .withColumn("part_bucket", bucket)
        // "Store not created yet" must be distinguished from real read
        // failures (those FAIL the batch so the checkpoint retries —
        // swallowing them would overwrite touched buckets with batch-only
        // rows). A bare directory-exists check is not enough: a crash
        // before the first commit can leave an empty/staging-only dir
        // that would wedge every retry on schema inference. The bucket
        // count is persisted and validated — remixing keys with a
        // different count would strand stale rows in old buckets.
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val metaPath = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
        val hasData = fs.exists(fsPath) && fs.listStatus(fsPath).exists { st =>
          val n = st.getPath.getName
          st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
        }
        val merged =
          if (hasData) {
            // Marker present → it is authoritative. Marker absent (a store
            // written before markers existed, or a lost marker) → adopt the
            // layout iff every data partition parses as part_bucket=k with
            // k < buckets; anything else is not a graft upsert store laid
            // out for this bucket count, and overwriting it would strand
            // keys (or destroy foreign data).
            val recorded: Int =
              if (fs.exists(metaPath)) {
                val in = fs.open(metaPath)
                try new String(
                  org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toInt
                finally in.close()
              } else {
                fs.listStatus(fsPath).foreach { st =>
                  val n = st.getPath.getName
                  if (st.isDirectory && !n.startsWith("_") && !n.startsWith(".")) {
                    val k = n.stripPrefix("part_bucket=").toIntOption
                    require(n.startsWith("part_bucket=") &&
                      k.exists(v => v >= 0 && v < buckets),
                      s"$path has data but no _graft_buckets marker and " +
                        s"partition '$n' does not fit a bucketed layout with " +
                        s"buckets=$buckets — not adoptable, refusing to overwrite")
                  }
                }
                buckets // adopted; the post-write marker records it
              }
            require(recorded == buckets,
              s"store at $path was written with buckets=$recorded, got $buckets — " +
                "a different count strands stale keys in unvisited buckets")
            val cur = spark.read.parquet(path)
              .join(latest.select("part_bucket").distinct(), Seq("part_bucket"),
                "left_semi")
            // Materialize the merge (bounded by touched buckets) BEFORE
            // overwriting: this cuts the lineage that reads the same path
            // the write replaces — a failure up to this point leaves the
            // store untouched, and the write job never scans files it is
            // deleting. (A transactional table format would subsume this;
            // out of scope with parquet-only deps.)
            graft.operators.Dedup.keepLatest(cur.unionByName(latest), keys, order)
              .localCheckpoint(true)
          } else latest
        merged.write.mode("overwrite")
          // per-write option — scoping this via session conf would leak
          // dynamic-overwrite semantics into concurrent queries
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("part_bucket").parquet(path)
        // (re)written after EVERY successful write: the marker describes
        // the data just committed, so a stale marker left beside an
        // emptied/adopted store can never wedge the next batch
        val out = fs.create(metaPath, true)
        try out.write(s"$buckets\n".getBytes("UTF-8")) finally out.close()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Alert delivery contract (SMTP in the reference; any transport here). */
  trait Notifier extends Serializable {
    def send(subject: String, body: String): Unit
  }

  /** Test/dev notifier that accumulates messages in a static buffer
    * (executor-side in local mode). */
  class BufferingNotifier extends Notifier {
    override def send(subject: String, body: String): Unit =
      BufferingNotifier.buffer.add(subject + "\n" + body)
  }
  object BufferingNotifier {
    val buffer = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  }

  /** Per-row alert sink: one notification per matching row. */
  def alerts(matches: DataFrame, notifier: Notifier,
      checkpointDir: String): StreamingQuery =
    matches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreach(new ForeachWriter[Row] {
        override def open(partitionId: Long, epochId: Long): Boolean = true
        override def process(row: Row): Unit =
          notifier.send(s"graft-alert", row.mkString(", "))
        override def close(errorOrNull: Throwable): Unit = ()
      })
      .start()
}
