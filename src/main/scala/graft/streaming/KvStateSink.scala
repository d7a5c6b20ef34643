package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import graft.agg.BloomDistinct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.jdk.CollectionConverters._

/** Minimal Redis-shaped KV surface — just the verbs the reference's
  * externalized-state jobs use (`set`/`get`/key scan over a prefix,
  * UvWithBloomFilter.scala:112-136). A production deployment implements
  * this over a real client (Redis, DynamoDB, …); tests and local mode use
  * [[KvStores]].
  */
trait KvStore {
  def put(key: String, value: Array[Byte]): Unit
  def get(key: String): Option[Array[Byte]]
  def keys(prefix: String): Seq[String]
}

/** Process-wide named in-memory KV stores. Executor-side code reaches a
  * store by *name* (a `String`, trivially serializable) and resolves it
  * inside the partition — the same connection-per-partition discipline a
  * Redis-backed [[KvStore]] needs on a real cluster, where this registry
  * would hand out pooled clients instead of shared maps. In `local[*]`
  * (and in tests) executors share the driver JVM, so the map written by
  * the sink is directly readable by the test.
  */
object KvStores {
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Array[Byte]]]()

  def apply(name: String): KvStore = new KvStore {
    private val m =
      stores.computeIfAbsent(name, _ => new ConcurrentHashMap[String, Array[Byte]]())
    override def put(key: String, value: Array[Byte]): Unit = m.put(key, value)
    override def get(key: String): Option[Array[Byte]] = Option(m.get(key))
    override def keys(prefix: String): Seq[String] =
      m.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }

  /** Drop a named store (test isolation). */
  def drop(name: String): Unit = stores.remove(name)
}

/** The reference's external-state write path, Spark-first. The reference
  * keeps the UV Bloom bitmap *in* Redis and probes it per element
  * (UvWithBloomFilter.scala:93-143: getbit → setbit → hincrBy on a
  * per-record FIRE_AND_PURGE trigger). Structured Streaming inverts the
  * ownership: the state store owns the bitmap (fault-tolerant,
  * checkpointed, per-key partitioned), and the KV store is a *serving
  * layer* that receives a snapshot per micro-batch — same externalized
  * artifacts (`uv:bitmap:<windowEnd>`, `uv:count:<windowEnd>`), without
  * the per-element network round-trip or the lost-update races of
  * probe-then-set over the wire.
  *
  * Idempotence: update mode re-emits a window's *latest* aggregate
  * whenever a batch touches it, and the sink blind-overwrites both keys,
  * so micro-batch replay after failure converges to the same KV contents.
  */
object KvStateSink {

  /** Per-hour Bloom-gated UV, continuously upserted into `KvStores(store)`.
    * One output row per touched window per micro-batch (the aggregate's
    * update stream is tiny — bounded by active windows, not by events), so
    * the per-partition writer holds one client and issues O(windows) puts.
    */
  def uvBloomToKvJob(
      events: DataFrame, store: String, delay: String = "1 minute"): StreamingQuery =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(BloomDistinct.bloomDistinctState(col("user_id")).as("s"))
      .select(
        unix_timestamp(col("w.end")).as("window_end"),
        col("s.count").as("uv"), col("s.bitmap").as("bitmap"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          val kv = KvStores(store) // per-partition client resolution
          rows.foreach { r =>
            val we = r.getAs[Long]("window_end")
            kv.put(s"uv:count:$we", r.getAs[Long]("uv").toString.getBytes("UTF-8"))
            kv.put(s"uv:bitmap:$we", r.getAs[Array[Byte]]("bitmap"))
          }
        }
      }
      .start()

  /** Count of set bits in a little-endian bitmap blob (read-side helper —
    * the serving layer's analog of the reference's `getbit` probes).
    */
  def popCount(bitmap: Array[Byte]): Long = {
    var i = 0; var n = 0L
    while (i < bitmap.length) { n += java.lang.Integer.bitCount(bitmap(i) & 0xff); i += 1 }
    n
  }

  /** Serving-side rate alerting: the
    * [[graft.ops.EventWindows.eventRateAnomaly]] screen maintained live —
    * hourly counts upserted from an update-mode windowed aggregate, spike
    * flags recomputed against the STORE's own trailing histogram after
    * every micro-batch (`rate:count:<hour>` / `rate:spike:<hour>`). The
    * flag pass re-walks all stored hours, which is CALENDAR-bounded
    * (8 760 keys/year however large the event volume — the same
    * boundedness argument as the batch form's window), so convergence to
    * the batch verdicts needs no ordering assumptions: the last batch
    * always recomputes every flag from the final counts. Parity-tested
    * flag-for-flag against the batch screen.
    */
  def rateAnomalyToKvJob(
      events: DataFrame, store: String, delay: String = "1 minute"): StreamingQuery =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("hour_start"), col("n"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          val kv = KvStores(store)
          rows.foreach { r =>
            kv.put(s"rate:count:${r.getAs[Long]("hour_start")}",
              r.getAs[Long]("n").toString.getBytes("UTF-8"))
          }
        }
        val kv = KvStores(store)
        val hours = kv.keys("rate:count:")
          .map { k =>
            k.stripPrefix("rate:count:").toLong ->
              new String(kv.get(k).get, "UTF-8").toLong
          }
          .sortBy(_._1).toIndexedSeq
        hours.indices.foreach { i =>
          val trail = hours.slice(math.max(0, i - 24), i).map(_._2)
          val spike = trail.length == 24 && hours(i)._2 * 24 > trail.sum * 2
          kv.put(s"rate:spike:${hours(i)._1}",
            (if (spike) "1" else "0").getBytes("UTF-8"))
        }
      }
      .start()

  /** Live inverted-index maintenance: the
    * [[graft.pipeline.Search.invertedIndex]] postings continuously
    * upserted into `KvStores(store)` from a document stream — the
    * serving-side form of the index build (a search tier reads postings
    * for a term with one prefix scan while the pipeline keeps ingesting).
    *
    * The stateful (term, doc) tf aggregate lives in the checkpointed state
    * store (vocabulary×df-bounded — Heaps' law, NOT corpus-bounded); update
    * mode emits only the pairs each micro-batch touched, and the sink
    * blind-overwrites `ix:<term>:<doc_id>` with the latest tf, so replay
    * after failure converges (same idempotence argument as
    * [[uvBloomToKvJob]]). Keys parse from the LAST ':' — terms are
    * whitespace-token strings and doc ids are digits.
    */
  def invertedIndexToKvJob(documents: DataFrame, store: String): StreamingQuery =
    documents
      .select(col("doc_id"),
        explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          val kv = KvStores(store)
          rows.foreach { r =>
            kv.put(s"ix:${r.getAs[String]("term")}:${r.getAs[Long]("doc_id")}",
              r.getAs[Long]("tf").toString.getBytes("UTF-8"))
          }
        }
      }
      .start()
}
