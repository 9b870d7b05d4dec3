package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.core.VdbStore

/** Structured Streaming extensions (SURVEY §7.2 step 8 — extension, not
  * core reference surface): continuous vector upsert and watermarked
  * event-window aggregation.
  */
object StreamingOps {

  /** Continuous upsert: every micro-batch merges into the store with the
    * same semantics as the batch `upsertDF` (batch rows win). The store
    * pointer swap is atomic, so concurrent readers keep snapshot
    * semantics mid-stream.
    *
    * `stream` needs columns (_id_ nullable string, vector array<float>,
    * meta string).
    */
  def upsertSink(stream: DataFrame, store: VdbStore): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { store.upsertDF(batch); () }
      }

  /** Continuous chunk->embed->upsert ingest: each micro-batch of
    * documents is chunked (overlapping token windows, deterministic
    * chunk ids — see [[graft.operators.TextChunk]]), embedded by the
    * caller-supplied column transform, and merged into the store. The
    * streaming twin of `TextChunk.chunkEmbedUpsert`: chunk ids are
    * stable, so a re-delivered document upserts over its own chunks
    * (at-least-once delivery folds to idempotent writes), and the
    * default stale-chunk prune deletes higher-index chunks when a
    * re-delivered document shrank — redelivery fully supersedes the
    * document's previous state.
    *
    * `stream` needs (idCol, textCol) columns.
    */
  def chunkIngestSink(stream: DataFrame, store: VdbStore,
                      idCol: String, textCol: String,
                      embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                      chunkSize: Int = 64, overlap: Int = 16,
                      pruneStale: Boolean = true): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // pruneStale costs one store-sized scan per micro-batch; an
          // append-only/high-frequency pipeline can pass false and
          // vacuum stale chunks offline instead
          graft.operators.TextChunk.chunkEmbedUpsert(store, batch, idCol,
            textCol, embed, chunkSize, overlap, pruneStale)
          ()
        }
      }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming twin of Queries.eventWindows. `ts` must be a
    * TimestampType column.
    */
  def windowedEventAgg(stream: DataFrame,
                       window_ : String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup with CUSTOM STATE: keyed by content hash,
    * `flatMapGroupsWithState` keeps one boolean of state per key and
    * emits only the FIRST occurrence of each distinct content across
    * the whole stream (the continuous twin of `Dedup.exact`). State is
    * per-key-partitioned, so it scales horizontally; at 100 TB the
    * state store holds one bit + key per distinct document.
    *
    * Input columns: (doc_id string, text string).
    * Output: (doc_id, text) of first-seen documents.
    */
  def dedupStream(stream: DataFrame): org.apache.spark.sql.Dataset[(String, String)] = {
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = stream
      .select(col("doc_id").cast("string"), col("text").cast("string"))
      .as[(String, String)]
      .groupByKey { case (_, text) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
    keyed.flatMapGroupsWithState[Boolean, (String, String)](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (_, rows, state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          // within one micro-batch, the smallest doc_id wins (deterministic)
          val first = rows.minBy(_._1)
          Iterator.single(first)
        }
    }
  }
}
