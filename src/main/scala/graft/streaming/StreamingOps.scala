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

  /** Continuous corpus hygiene — the streaming twin of
    * `CorpusClean.hygienePipeline`, same stage order (repetition gate
    * → decontaminate → exact dedup → stratified sample) with every
    * stage stateless except the dedup:
    *
    *  - repetition gate and sampling are codegen filters (zero state);
    *  - decontamination tests the doc's distinct `contamN`-gram array
    *    against the eval grams as a LITERAL array via `arrays_overlap`
    *    — eval sets are benchmark-sized, so they ride into the plan as
    *    a constant instead of a stream-static join (left_anti
    *    stream-static joins aren't supported, and a per-doc gram
    *    aggregation would need a watermark);
    *  - exact dedup is `flatMapGroupsWithState` keyed by content md5,
    *    one boolean per distinct content (first occurrence wins across
    *    the stream, smallest id within a micro-batch);
    *  - sampling thresholds ride in as a literal map
    *    (`element_at(map, strata)`), so strata absent from `rates`
    *    drop, matching the batch operator.
    *
    * Input columns (doc_id string, text string, source string);
    * output (doc_id, text, source) of surviving documents.
    */
  def hygieneStream(stream: DataFrame, evalGrams: Seq[String],
                    rates: Map[String, Double],
                    maxDupFrac: Double = 0.5, contamN: Int = 13,
                    repN: Int = 2): org.apache.spark.sql.Dataset[(String, String, String)] = {
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val toks = split(trim(col("text")), "\\s+")
    val gated = stream.filter(
      round(graft.functions.repetition_stats(toks, repN).getField("dup_frac"), 6)
        <= maxDupFrac)
    val decon =
      if (evalGrams.isEmpty) gated
      else gated.filter(!arrays_overlap(
        graft.functions.word_ngrams_distinct(toks, contamN),
        typedlit(evalGrams)))
    val keyed = decon
      .select(col("doc_id").cast("string"), col("text").cast("string"),
        col("source").cast("string"))
      .as[(String, String, String)]
      .groupByKey { case (_, text, _) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
    val deduped = keyed.flatMapGroupsWithState[Boolean, (String, String, String)](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (_, rows, state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          Iterator.single(rows.minBy(_._1))
        }
    }
    val thresholds = rates.map { case (s, r) =>
      s -> graft.operators.CorpusClean.sampleThresholdHex(r)
    }
    deduped.filter(
      substring(md5(col("_1").cast("binary")), 1, 8) <
        element_at(typedlit(thresholds), col("_3")))
      .as[(String, String, String)]
  }

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
