package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Topic subscription registry (SURVEY §2.1 S3/S4, §2.7 T2).
  *
  * The reference keeps an ordered map of (broker, topic) → consumer
  * callback with upsert-on-subscribe semantics
  * (reference: src/events-agency.c:198-243). Here each subscription is a
  * Structured Streaming query: subscribe = start a `foreachBatch` query
  * (replacing any prior one for the key — A4 upsert), unsubscribe = stop
  * it. `spark.streams` remains the source of truth for liveness; this
  * registry owns the key → query mapping.
  */
final class TopicRegistry {

  private val queries = TrieMap.empty[(String, String), StreamingQuery]

  /** Upsert a continuous query for (broker, topic): any existing
    * subscription is stopped first, then the new one starts. */
  /** Broker/topic strings become filesystem path components for the
    * checkpoint; real broker lists ("host1:9092,host2:9092") contain
    * characters HDFS/S3 path segments reject, so each component is
    * sanitized with an md5 suffix preserving uniqueness. */
  private def pathSafe(raw: String): String =
    raw.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString

  def subscribe(
      broker: String,
      topic: String,
      stream: DataFrame,
      checkpointDir: String)(onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    synchronized {
      unsubscribe(broker, topic)
      val q = stream.writeStream
        .queryName(s"$broker/$topic")
        .option("checkpointLocation",
          s"$checkpointDir/${pathSafe(broker)}/${pathSafe(topic)}")
        .foreachBatch(onBatch)
        .start()
      queries.put((broker, topic), q)
      q
    }

  /** Stop and remove a subscription; true when one existed. Synchronized
    * with subscribe: an unsynchronized remove could race a concurrent
    * subscribe's stop-then-put window, reporting "nothing to remove" while
    * the fresh query lives on. */
  def unsubscribe(broker: String, topic: String): Boolean = synchronized {
    queries.remove((broker, topic)) match {
      case Some(q) => q.stop(); true
      case None    => false
    }
  }

  /** Registered and still-active subscriptions, key-sorted (the
    * reference's registry iterates in key order). */
  def active: Seq[(String, String)] =
    queries.toSeq.collect { case (k, q) if q.isActive => k }.sorted

  def stopAll(): Unit = synchronized {
    queries.keys.toSeq.foreach { case (b, t) => unsubscribe(b, t) }
  }
}
