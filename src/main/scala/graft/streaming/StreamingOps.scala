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

  /** Watermarked gap-session aggregation — the streaming twin of
    * Queries.sessionizeEvents / operators.Sessionize (q53). Structured
    * Streaming's `session_window` implements the same cut rule
    * natively (a session extends while events arrive within `gap` of
    * the previous one) with state bounded by open sessions and closed
    * by the watermark; `ts` must be a TimestampType column. The batch
    * operator stays the oracle-checked surface — streaming sessions
    * close on watermark, so late data past it lands in NEW sessions by
    * design (the documented semantic difference).
    */
  def sessionEventAgg(stream: DataFrame,
                      gap: String = "30 minutes",
                      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Watermarked stream-stream range join — the streaming twin of
    * [[graft.operators.RangeJoin.selfWithin]] (q61), and deliberately
    * the one place the batch blocking trick is NOT needed: Structured
    * Streaming's stream-stream join natively supports time-interval
    * conditions and uses exactly the watermark to bound both join
    * states (each side buffers only rows within watermark + delta).
    * Self-join of an event stream: pairs of same-key events within
    * `delta`, each emitted once (`a.event_id < b.event_id`). `ts` must
    * be TimestampType; both watermarks must match for state cleanup.
    * Late data past the watermark silently misses pairs — the batch
    * operator remains the oracle-checked surface.
    */
  def rangeJoinStream(stream: DataFrame, delta: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val a = stream.select(col("user_id").as("a_user"),
        col("event_id").as("event_id_a"), col("ts").as("ts_a"))
      .withWatermark("ts_a", watermark)
    val b = stream.select(col("user_id").as("b_user"),
        col("event_id").as("event_id_b"), col("ts").as("ts_b"))
      .withWatermark("ts_b", watermark)
    a.join(b,
      col("a_user") === col("b_user") &&
        col("event_id_a") < col("event_id_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $delta") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $delta"))
      .select(col("a_user").as("user_id"), col("event_id_a"),
        col("event_id_b"),
        abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))).as("gap_us"))
  }

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
    val toks = split(trim(col("text")), "\\s+")
    val gated = stream.filter(
      round(graft.functions.repetition_stats(toks, repN).getField("dup_frac"), 6)
        <= maxDupFrac)
    val grams = graft.functions.word_ngrams_distinct(toks, contamN)
    val decon =
      if (evalGrams.isEmpty) gated
      else if (evalGrams.size <= LiteralGramsMax)
        // small eval set: ride into the plan as a codegen literal.
        // ArraysOverlap hashes the SMALLER side per row, so a large
        // literal would cost O(|evalGrams|) per clean row — hence the
        // broadcast path below past the threshold
        gated.filter(!arrays_overlap(grams, typedlit(evalGrams)))
      else {
        // large eval set: broadcast a Set once and probe the doc's own
        // grams — O(|doc grams|) per row. A deliberate UDF exception:
        // no built-in expression tests array membership against a
        // broadcast variable, and serializing a multi-MB literal into
        // every task beats codegen purity by losing
        val bc = stream.sparkSession.sparkContext.broadcast(evalGrams.toSet)
        val hit = udf((g: Seq[String]) => g != null && g.exists(bc.value.contains))
        gated.filter(!hit(grams))
      }
    val keyed = decon
      .select(col("doc_id").cast("string"), col("text").cast("string"),
        col("source").cast("string"))
      .as[(String, String, String)]
    val deduped = firstSeenByContent(keyed)(_._2, _._1)
    val thresholds = rates.map { case (s, r) =>
      s -> graft.operators.CorpusClean.sampleThresholdHex(r)
    }
    deduped.filter(
      substring(md5(col("_1").cast("binary")), 1, 8) <
        element_at(typedlit(thresholds), col("_3")))
      .as[(String, String, String)]
  }

  /** Above this many eval grams, [[hygieneStream]] switches from a
    * plan literal to a broadcast Set probe.
    */
  val LiteralGramsMax = 1000

  /** Shared first-seen-content state machine: key rows by the md5 of
    * `contentOf`, keep ONE boolean of state per distinct content, emit
    * only each content's first occurrence (ties within a micro-batch
    * broken by the smallest `idOf`). Both [[dedupStream]] and
    * [[hygieneStream]] route through this so the dedup rule (key
    * hash, tie-break, state protocol) cannot silently fork.
    */
  private def firstSeenByContent[T](rows: org.apache.spark.sql.Dataset[T])(
      contentOf: T => String, idOf: T => String)(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val strEnc = org.apache.spark.sql.Encoders.STRING
    implicit val boolEnc = org.apache.spark.sql.Encoders.scalaBoolean
    rows.groupByKey { t =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(contentOf(t).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(idOf))
          }
      }
  }

  /** Continuous dedup-cluster maintenance: each micro-batch of new
    * candidate pairs (a, b) folds into a running (node, cluster_id)
    * components table via [[graft.operators.Dedup.mergeComponents]] —
    * the hash-min fixpoint runs over each batch's QUOTIENT graph only
    * (new pairs contracted through the current labeling), never the
    * accumulated edge set, so per-batch cost tracks batch size while
    * the maintained table grows unbounded. The merged table is
    * materialized each batch (no cross-batch lineage) and handed to
    * `onUpdate` (write to a sink table, refresh a view, ...); read the
    * latest labeling any time via the returned `current` thunk.
    *
    * State note: the components table lives in THIS driver's lineage
    * (checkpointed per batch), not the streaming state store — restart
    * recovery means re-seeding from the last `onUpdate` sink, which is
    * why `onUpdate` receives every merged table (StreamingSpec runs
    * that recovery round-trip). `seed` starts the accumulator from an
    * existing labeling (e.g. a batch
    * [[graft.operators.Dedup.connectedComponents]] over the historical
    * corpus). With a reliable checkpoint dir configured, superseded
    * snapshot files are deleted with a ONE-generation grace window
    * (bounded disk, tools/StreamSoak-verified: at most two snapshot
    * dirs live) — a `current()` / `onUpdate` frame for batch k stays
    * readable through batch k+1 and is dropped when batch k+2
    * completes. `onUpdate` must therefore durably WRITE the frame it
    * receives, not retain it; the grace window only de-races consumers
    * that read promptly. The caller's own `seed` frame is never
    * touched.
    */
  final case class ComponentsSink(writer: DataStreamWriter[Row],
                                  current: () => DataFrame)

  def componentsSink(pairStream: DataFrame, seed: Option[DataFrame] = None,
                     onUpdate: DataFrame => Unit = _ => (),
                     aCol: String = "a", bCol: String = "b"): ComponentsSink = {
    // eager schema validation (ADVICE r7): a stream missing the pair
    // columns, or with mismatched endpoint types, used to surface as an
    // opaque analysis error inside the first micro-batch. Name lookup
    // uses the session's resolver (ADVICE r8): Spark analysis is
    // case-insensitive unless spark.sql.caseSensitive is set, so a
    // stream with columns 'A'/'B' must pass here exactly when col("a")
    // would resolve in the merge below.
    val spark = pairStream.sparkSession
    val resolver = spark.sessionState.analyzer.resolver
    val schema = pairStream.schema
    def fieldOf(c: String): org.apache.spark.sql.types.StructField = {
      val matches = schema.fields.filter(f => resolver(f.name, c))
      require(matches.nonEmpty,
        s"componentsSink: pair stream needs column '$c' (pass aCol/bCol " +
          s"for other names); stream has ${schema.fieldNames.mkString(", ")}")
      require(matches.length == 1,
        s"componentsSink: column '$c' is ambiguous in this stream " +
          s"(${matches.map(_.name).mkString(", ")} all resolve to it)")
      matches.head
    }
    val (ta, tb) = (fieldOf(aCol).dataType, fieldOf(bCol).dataType)
    require(ta == tb,
      s"componentsSink: pair endpoints '$aCol' ($ta) and '$bCol' ($tb) " +
        "must share one id type")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", ta),
        org.apache.spark.sql.types.StructField("cluster_id", ta))))
    @volatile var components: DataFrame = seed.getOrElse(empty)
    // snapshots THIS sink materialized (never the caller's seed) own
    // their reliable checkpoint; superseded snapshots are deleted so a
    // long-lived sink does not leak one rdd-N dir per micro-batch
    // (tools/StreamSoak caught exactly that in round 8). ONE superseded
    // generation is retained as a reader grace window (ADVICE r8: a
    // frame handed to onUpdate / obtained via current() for batch k got
    // its files deleted the moment batch k+1 completed, so a consumer
    // that retained it briefly hit FileNotFound): batch k's snapshot now
    // survives batch k+1 and is deleted when batch k+2 lands — disk
    // stays bounded at two snapshot dirs. Durable readers still consume
    // `onUpdate` (write, don't retain), documented on ComponentsSink.
    @volatile var ownsCurrent = false
    // the one owned snapshot superseded exactly once (grace window);
    // null when the previous frame was the caller's seed
    @volatile var grace: DataFrame = null
    val writer = pairStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val prev = components
          components =
            graft.operators.Dedup.mergeComponents(components, batch, aCol, bCol)
          onUpdate(components)
          // releaseResult, not dropResultCheckpoint: the latter frees
          // reliable-checkpoint FILES only, so in the default
          // localCheckpoint mode a long-lived sink retained one extra
          // generation of corpus-sized storage blocks until GC got
          // around to them (ADVICE r9). releaseResult unpersists blocks
          // AND deletes files — deterministic release under both
          // backings, same grace-window read guarantee.
          if (grace != null) graft.operators.Dedup.releaseResult(grace)
          grace = if (ownsCurrent) prev else null
          ownsCurrent = true
        }
      }
    ComponentsSink(writer, () => components)
  }

  /** Streaming point-in-time enrichment: the continuous twin of
    * [[graft.operators.AsOfJoin.backward]] (q60). Reference rows
    * (`kind == rightKind`) and probe rows (any other kind) arrive on
    * one keyed stream; `flatMapGroupsWithState` keeps ONE (time, id)
    * tuple per key — the latest reference row seen so far — and emits
    * each probe row enriched with it (-1 sentinels before the first
    * reference). Within a micro-batch rows are processed in event-time
    * order with references sorting before probes at equal times
    * (exactly the batch operator's inclusive `<=` + max-tieBreak
    * rule); ACROSS micro-batches the semantics are
    * latest-known-reference (processing order) — a reference arriving
    * a batch later than a probe does not retro-enrich it, and a probe
    * arriving after a newer reference is enriched with that newer one
    * even if its own event time is older (gap_us < 0 flags exactly
    * this). That is the standard streaming-enrichment contract; full
    * event-time retro-correction would need unbounded buffering.
    *
    * Scale: state is one tuple per key (vs the batch sort's full
    * per-key history), partitioned by the state store — the same
    * horizontal scaling story as [[dedupStream]].
    *
    * Input columns: (event_id long, user_id long, us long, kind
    * string). Output: (event_id, user_id, us, ref_id, gap_us).
    */
  def asofEnrichStream(stream: DataFrame, rightKind: String = "click")
    : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val rows = stream.select(col("event_id").cast("long"),
        col("user_id").cast("long"), col("us").cast("long"),
        col("kind").cast("string"))
      .as[(Long, Long, Long, String)]
    rows.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[(Long, Long)]) =>
          val sorted = it.toIndexedSeq.sortBy { case (id, _, us, kind) =>
            (us, if (kind == rightKind) 0 else 1, id)
          }
          var cur = state.getOption // (ref time, ref id), monotone per key
          val out = IndexedSeq.newBuilder[(Long, Long, Long, Long, Long)]
          sorted.foreach { case (id, u, us, kind) =>
            if (kind == rightKind) {
              if (cur.forall(c => c._1 < us || (c._1 == us && c._2 < id)))
                cur = Some((us, id))
            } else cur match {
              case Some((rus, rid)) => out += ((id, u, us, rid, us - rus))
              case None => out += ((id, u, us, -1L, -1L))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming per-group token-budget gate: the continuous twin of the
    * batch token-budget selection (q69 /
    * [[graft.operators.Select.budgetSelectDesc]]). Documents arrive
    * keyed by a group (source/domain); `flatMapGroupsWithState` keeps
    * ONE long of state per group — tokens admitted so far — and emits
    * a document iff its tokens still fit the group's budget
    * (first-fit in processing order; within a micro-batch, doc-id
    * order for determinism). Unlike the batch form there is no global
    * quality ranking — a stream cannot rank against documents it has
    * not seen — so the gate is the standard streaming-ingest
    * admission contract: cap each source's token contribution,
    * exactly (running + tokens <= budget), skip-and-continue so
    * smaller later docs may still fit.
    *
    * Scale: one long of state per group in the state store; documents
    * stream through their group's partition, nothing global.
    *
    * Input columns: (doc_id long, source string, n_tokens long).
    * Output: (doc_id, source, n_tokens, cum_tokens) of admitted docs.
    */
  def budgetGateStream(stream: DataFrame, budgetPerGroup: Long)
    : org.apache.spark.sql.Dataset[(Long, String, Long, Long)] = {
    require(budgetPerGroup >= 0, s"budget must be >= 0, got $budgetPerGroup")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val rows = stream.select(col("doc_id").cast("long"),
        col("source").cast("string"), col("n_tokens").cast("long"))
      .as[(Long, String, Long)]
    rows.groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = IndexedSeq.newBuilder[(Long, String, Long, Long)]
          it.toIndexedSeq.sortBy(_._1).foreach { case (id, src, tok) =>
            if (used + tok <= budgetPerGroup) {
              used += tok
              out += ((id, src, tok, used))
            }
          }
          state.update(used)
          out.result().iterator
      }
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
    val rows = stream
      .select(col("doc_id").cast("string"), col("text").cast("string"))
      .as[(String, String)]
    firstSeenByContent(rows)(_._2, _._1)
  }

  /** Continuous sharded-HNSW ingest: every micro-batch of (id, vector)
    * rows becomes a NEW index segment (graph construction touches only
    * the batch's rows — the [[graft.operators.HnswStore.append]]
    * pattern driven by a stream), folded back into slab-sized graphs
    * by the index's compaction threshold. Append-only by contract —
    * redelivered micro-batches are skipped by batch id (the standard
    * idempotent-foreachBatch rule), but two DIFFERENT batches carrying
    * the same id both land; route updates/deletes through a VdbStore
    * with `enableHnsw` instead, which rebuilds per version.
    *
    * `stream` needs (idCol, vecCol array<float>) columns.
    */
  def hnswSegmentSink(stream: DataFrame, index: HnswSegmentIndex,
                      idCol: String, vecCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) index.ingest(batchId, batch, idCol, vecCol)
      }
}

/** The continuously-maintained sharded-HNSW index behind
  * [[StreamingOps.hnswSegmentSink]]: micro-batches append segments,
  * `compactAtShards` bounds the query fan-out by folding them into
  * slab-sized graphs (Lucene's segment-merge discipline). Searches see
  * an atomic view: the `view` swap happens after the new segment (or
  * the compacted store) is materialized, so a concurrent reader scores
  * either the pre- or post-batch index, never a half-built one — and
  * folded-away segments are released one GENERATION late (next fold),
  * so a reader's in-flight pre-fold view never loses its cached
  * shards mid-query.
  *
  * `normalize=true` packs rows under the write-time L2 invariant (the
  * VdbStore convention); false keeps raw rows + cosine norms. Exact
  * mode results are segment-layout-free, so a streamed index
  * frame-equals a batch-built store (StreamingEquivalenceSpec).
  *
  * `persistDir` makes the index RESTART-DURABLE (the gap VERDICT r13/
  * r14 named): every ingested segment and every fold is written
  * through [[graft.operators.HnswIO]] into its own subdir, and a
  * pointer-flipped manifest records the live segment list +
  * `lastBatchId`. Constructing an index over a dir that already holds
  * a manifest RESUMES it: segments load with zero graph rebuilds, and
  * the restored `lastBatchId` keeps the batch-id idempotence rule
  * working across the restart (a replayed in-flight micro-batch is
  * skipped iff it landed before the crash). Durability ordering:
  * segment files complete before the manifest names them, and the
  * manifest flips before folded-away dirs are deleted — a crash at
  * any point leaves a loadable manifest whose lastBatchId admits
  * exactly the batches it lost. Unlike the sidecar-restore paths, a
  * corrupt persisted segment FAILS the resume loudly: the source
  * micro-batches that built it are gone, so degrading to a rebuild
  * would silently drop indexed rows.
  */
final class HnswSegmentIndex(
    spark: org.apache.spark.sql.SparkSession,
    normalize: Boolean,
    m: Int = 16,
    efConstruction: Int = 100,
    compactAtShards: Int = 64,
    persistDir: Option[String] = None) {
  import graft.operators.{HnswIO, HnswStore}

  private var segments: Vector[HnswStore[String]] = Vector.empty
  private var segDirs: Vector[String] = Vector.empty // aligned; persistDir only
  private var shardCounts: Vector[Int] = Vector.empty
  private var rowCounts: Vector[Long] = Vector.empty
  // one-generation reader grace window (the componentsSink discipline,
  // ADVICE r9): a fold must NOT unpersist segments a concurrent
  // reader's in-flight view may still be scoring — their lineage roots
  // in micro-batches that may no longer be replayable. Folded-away
  // segments retire here and are released on the NEXT fold (or close),
  // by which time any query that started against the pre-fold view has
  // long finished.
  private var retired: Vector[HnswStore[String]] = Vector.empty
  private var lastBatchId: Long = -1L
  // shard count right after the last fold: the compaction trigger is
  // GROWTH-based (shardCount > max(threshold, 2x last fold)), because
  // the folded count is outside our control — slab bounding or the
  // fold parallelism can leave it above compactAtShards, and a
  // threshold-only trigger would then recompact the whole index on
  // EVERY micro-batch (O(N) rebuild per batch, quadratic total; review
  // r13)
  private var lastCompactSize: Int = 0
  @volatile private var viewVar: HnswStore[String] = null
  @volatile private var compactionsVar: Int = 0
  @volatile private var resumedVar: Boolean = false

  // resume BEFORE any batch lands: a manifest under persistDir means a
  // previous session's segments are on disk — load them (no rebuilds)
  // and restore lastBatchId so replay dedup spans the restart
  persistDir.foreach(resumeFrom)

  /** The current queryable store, if any batch has landed. */
  def store: Option[HnswStore[String]] = Option(viewVar)
  def shardCount: Int = shardCounts.sum
  def rowCount: Long = rowCounts.sum
  def compactions: Int = compactionsVar
  /** True when this instance hydrated from a persisted manifest. */
  def resumed: Boolean = resumedVar

  private[streaming] def ingest(batchId: Long, batch: DataFrame,
                                idCol: String, vecCol: String): Unit =
    synchronized {
      // idempotent-foreachBatch rule: a replayed (failed-and-retried)
      // micro-batch reuses its batch id — appending it twice would
      // duplicate rows in an append-only index
      if (batchId <= lastBatchId) return
      lastBatchId = batchId
      import batch.sparkSession.implicits._
      val rdd = batch
        .select(col(idCol).cast("string"), col(vecCol))
        .as[(String, Array[Float])].rdd
      val seg = HnswStore.fromRDD(spark, rdd, normalize = normalize,
        m = m, efConstruction = efConstruction)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nrows, nsh) = seg.materialize()
      segments :+= seg
      shardCounts :+= nsh
      rowCounts :+= nrows
      persistDir.foreach { root =>
        val name = f"seg-$batchId%08d"
        HnswIO.saveInto(seg, new org.apache.hadoop.fs.Path(root, name).toString)
        segDirs :+= name
      }
      refreshView()
      if (shardCount > math.max(compactAtShards, 2 * lastCompactSize))
        compactNow()
      persistDir.foreach(writeManifest)
    }

  private def refreshView(): Unit =
    viewVar =
      if (segments.size == 1) segments.head
      else new HnswStore[String](spark,
        spark.sparkContext.union(segments.map(_.shards)),
        segments.head.normalized, m, efConstruction)

  private def compactNow(): Unit = {
    // TIERED fold (the LSM discipline, surfaced by HnswStreamSoak):
    // refolding the WHOLE index at a fixed period is O(N) per fold and
    // quadratic total work over a long stream. Fold only the
    // accumulated TAIL (everything after the base segment — O(tail
    // rows)); pull the base in only once the tail has grown to its
    // size, so full refolds are geometrically spaced and total work is
    // O(N log N). Either way the fold target sits BELOW the trigger
    // threshold (not defaultParallelism, which can exceed it and
    // re-trigger immediately); slab bounding may still force more
    // graphs than requested — the growth-based trigger absorbs that.
    val target = math.max(1, compactAtShards / 2)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tailOnly = segments.size >= 2 && rowCounts.tail.sum < rowCounts.head
    // release the PREVIOUS generation first, retire this fold's inputs
    retired.foreach(_.unpersist())
    val foldName = f"fold-$compactionsVar%06d"
    if (tailOnly) {
      val tail = segments.tail
      val tailView = new HnswStore[String](spark,
        spark.sparkContext.union(tail.map(_.shards)),
        segments.head.normalized, m, efConstruction)
      val folded = tailView.compact(numShards = target).persist(level)
      val (nrows, nsh) = folded.materialize()
      retired = tail
      segments = Vector(segments.head, folded)
      shardCounts = Vector(shardCounts.head, nsh)
      rowCounts = Vector(rowCounts.head, nrows)
      persistDir.foreach { root =>
        HnswIO.saveInto(folded, new org.apache.hadoop.fs.Path(root, foldName).toString)
        pendingDeletes ++= segDirs.tail
        segDirs = Vector(segDirs.head, foldName)
      }
    } else {
      val folded = viewVar.compact(numShards = target).persist(level)
      val (nrows, nsh) = folded.materialize()
      retired = segments
      segments = Vector(folded)
      shardCounts = Vector(nsh)
      rowCounts = Vector(nrows)
      persistDir.foreach { root =>
        HnswIO.saveInto(folded, new org.apache.hadoop.fs.Path(root, foldName).toString)
        pendingDeletes ++= segDirs
        segDirs = Vector(foldName)
      }
    }
    lastCompactSize = shardCounts.sum
    compactionsVar += 1
    refreshView()
  }

  // folded-away segment dirs awaiting deletion — removed only AFTER the
  // next manifest flip stops referencing them (crash in between leaves
  // harmless orphan dirs, never a manifest naming missing dirs)
  private var pendingDeletes: Vector[String] = Vector.empty

  private def manifestJson: String = {
    val segs = segDirs.map(d => "\"" + d + "\"").mkString(",")
    s"""{"format": 1, "last_batch_id": $lastBatchId, """ +
    s""""last_compact_size": $lastCompactSize, "compactions": $compactionsVar, """ +
    s""""normalized": ${normalize}, "m": $m, "efc": $efConstruction, """ +
    s""""segments": [$segs]}"""
  }

  private def writeManifest(root: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    val name = "manifest-" + java.util.UUID.randomUUID().toString.take(12) + ".json"
    val out = fs.create(new org.apache.hadoop.fs.Path(rootPath, name), true)
    try out.write(manifestJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    graft.core.StoreIO.flipPointer(conf, rootPath, name)
    // now safe: nothing references the folded-away dirs or old manifests
    pendingDeletes.foreach { d =>
      try fs.delete(new org.apache.hadoop.fs.Path(rootPath, d), true)
      catch { case _: java.io.IOException => () }
    }
    pendingDeletes = Vector.empty
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("manifest-") && n != name)
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => () }
    }
  }

  private def resumeFrom(root: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return
    graft.core.StoreIO.resolveCurrent(fs, rootPath).foreach { mf =>
      val in = fs.open(mf)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
              finally in.close()
      def num(key: String): Long =
        ("\"" + key + """"\s*:\s*(-?\d+)""").r.findFirstMatchIn(s).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(s"no $key in segment manifest $mf"))
      require(num("format") == 1L, s"unsupported segment manifest format in $mf")
      require(s.contains(s""""normalized": $normalize""") &&
          num("m") == m && num("efc") == efConstruction,
        s"persisted segment index at $root was built with different " +
          s"(normalize, m, efConstruction) than requested — refusing to mix graphs")
      val names = """"segments"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toVector
      val loaded = names.map { d =>
        val st = HnswIO.loadFrom[String](spark,
            new org.apache.hadoop.fs.Path(rootPath, d).toString)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (nrows, nsh) = st.materialize() // corrupt files fail HERE, loudly
        (st, nsh, nrows)
      }
      segments = loaded.map(_._1)
      segDirs = names
      shardCounts = loaded.map(_._2)
      rowCounts = loaded.map(_._3)
      lastBatchId = num("last_batch_id")
      lastCompactSize = num("last_compact_size").toInt
      compactionsVar = num("compactions").toInt
      if (segments.nonEmpty) refreshView()
      resumedVar = true
    }
  }

  /** Release every live segment. */
  def close(): Unit = synchronized {
    segments.foreach(_.unpersist())
    retired.foreach(_.unpersist())
    segments = Vector.empty
    shardCounts = Vector.empty
    rowCounts = Vector.empty
    retired = Vector.empty
    viewVar = null
  }
}
