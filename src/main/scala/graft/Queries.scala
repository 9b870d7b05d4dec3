package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CosineTopK

/** Driver-facing query catalog. Each entry re-expresses one operator from
  * SURVEY.md §2 (or a scale-pipeline extension) over the shared testdata
  * tables, with a DuckDB oracle in `Oracles`. Conventions for oracle hash
  * parity: all derived floats rounded to 6 decimals and computed in
  * double on both sides; rank/count columns cast to BIGINT; ties broken
  * by id so ordering is deterministic.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Event timestamps as epoch MICROSECONDS, robust to how the testdata
    * writer encoded the column. Historically `events.ts` was parquet
    * NANOS (read as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`); newer generations write
    * timestamp[us] (TIMESTAMP_NTZ). DuckDB's `epoch_us(ts)` sees the
    * same integers in both encodings (its parquet reader truncates ns
    * to µs), so the oracles are encoding-agnostic — this helper makes
    * the Spark side match. NTZ→LTZ cast is exact under the UTC session
    * timezone every entrypoint sets.
    */
  private[graft] def tsMicros(df: DataFrame, tsCol: String): org.apache.spark.sql.Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$tsCol div 1000")
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }

  /** Shared top-k runner on the gemm path (packed BlockStore, one
    * shuffle-free treeAggregate pass, exact double scoring — bit-parity
    * with the declarative Window plan and the DuckDB oracle). The query
    * side is a driver-side collect by design: queries are the small side
    * (pico_vdb batches), the store side streams distributed.
    */
  private def topkGemm(spark: SparkSession, dir: String,
                       qFilter: org.apache.spark.sql.Column,
                       storeFilter: Option[org.apache.spark.sql.Column],
                       k: Int, betterThan: Option[Double] = None): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(qFilter)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val store = storeFilter.map(emb.filter).getOrElse(emb)
    CosineTopK.gemm(store, "vec_id", "embedding", queries, k, betterThan,
        normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Batch top-k cosine over the embeddings store (O9+O15+O18). */
  def topkBatch(spark: SparkSession, dir: String): DataFrame =
    topkGemm(spark, dir, col("vec_id") < 20, None, k = 10)

  /** Top-k with score threshold — `better_than` (O10). */
  def topkThreshold(spark: SparkSession, dir: String): DataFrame =
    topkGemm(spark, dir, col("vec_id") >= 20 && col("vec_id") < 40, None,
      k = 20, betterThan = Some(0.2))

  /** Metadata equality prefilter — `where {k: v}` (O11). */
  def topkWhereEq(spark: SparkSession, dir: String): DataFrame =
    topkGemm(spark, dir, col("vec_id") < 10, Some(col("label") === 3), k = 5)

  /** Metadata `$in` prefilter (O12). */
  def topkWhereIn(spark: SparkSession, dir: String): DataFrame =
    topkGemm(spark, dir, col("vec_id") >= 10 && col("vec_id") < 20,
      Some(col("label").isin(1, 2, 3)), k = 5)

  /** Candidate id-list restriction (O14): ids = multiples of 7. */
  def topkIds(spark: SparkSession, dir: String): DataFrame =
    topkGemm(spark, dir, col("vec_id") < 10, Some(col("vec_id") % 7 === 0), k = 5)

  /** Point lookup with vector materialization (O19): the vector itself is
    * surfaced as its rounded L2 norm so the check stays hashable.
    */
  def pointLookup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    emb.filter(col("vec_id").isin(1, 5, 9, 13, 21, 34))
      .select(col("vec_id"), col("label"),
        round(sqrt(graft.functions.l2_norm_sq(col("embedding"))), 6).as("vec_norm"))
  }

  /** Count/stats introspection (O21/O22) as a per-label breakdown. */
  def countByLabel(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").groupBy(col("label"))
      .agg(count(lit(1)).as("n"))

  /** Upsert MERGE semantics (O4): batch rows win over existing rows. */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").select(col("vec_id"), col("label"))
    val batch = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), (col("label") + 100).as("label"))
    emb.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(batch)
  }

  /** Upsert update-vs-insert report (O4): semi/anti split of the batch. */
  def upsertReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").select("vec_id")
    val batch = emb.filter(col("vec_id") < 100)
      .unionByName(emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 1000000).as("vec_id")))
    val upd = batch.join(emb, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("update").as("kind"), col("n"))
    val ins = batch.join(emb, Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("insert").as("kind"), col("n"))
    upd.unionByName(ins)
  }

  /** Delete-by-predicate as anti-join (O5), then visible counts (O21). */
  def deleteAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val doomed = emb.filter(col("label") === 5).select("vec_id")
    emb.join(doomed, Seq("vec_id"), "left_anti")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
  }

  /** Embedding-cosine near-duplicate pairs (pipeline op): sampled left
    * side vs full store, threshold + ordered pair dedup.
    */
  def embNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val left = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(left))
      .filter(col("qid") < col("vec_id"))
      .select(col("qid"), col("vec_id"),
        graft.functions.cosine_sim(col("qvec"), col("embedding")).as("score"))
      .filter(col("score") >= 0.38)
    scored.select(col("qid"), col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Exact dedup by content hash (pipeline op; reuses O7's md5 idea). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  /** Token-count text analysis per language (pipeline op). */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      round(avg(col("n_tokens")), 4).as("avg_tokens"),
      max(col("n_tokens")).as("max_tokens"))
  }

  /** BPE-ish token counting (pipeline op): alpha runs, digit runs, and
    * single punctuation marks as separate tokens — the regex family BPE
    * pre-tokenizers use — alongside the whitespace count.
    */
  def tokensBpeish(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"),
      expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
        .cast("long").as("n_bpe"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws"))

  /** Quality score (pipeline op): length score + stopword ratio. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), qualityExpr.as("quality"))

  /** Language-ID heuristic (pipeline op): marker-token vote. */
  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    docs.select(col("doc_id"),
        expr("size(filter(split(trim(text), '\\\\s+'), x -> x IN ('the','a')))")
          .cast("long").as("en_hits"),
        expr("size(filter(split(trim(text), '\\\\s+'), x -> x IN ('scan','join','merge')))")
          .cast("long").as("dsl_hits"))
      .withColumn("detected",
        when(col("en_hits") > col("dsl_hits"), "en")
          .when(col("dsl_hits") > col("en_hits"), "dsl")
          .otherwise("und"))
  }

  /** Document fingerprint (pipeline op): hash of the leading 8-token
    * prefix — a cheap shift-resistant signature.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    docs.select(col("doc_id"),
      md5(concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 8)).cast("binary"))
        .as("fp"))
  }

  /** Fingerprint-cluster dedup (pipeline op): group by a low-entropy
    * 4-token-prefix hash; emit only clusters with real duplicates.
    */
  def dedupFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 4))
        .cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** n-gram Jaccard over prefix-blocked candidate pairs (pipeline op). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.ngramJaccardBlocked(t(spark, dir, "documents"), "doc_id", "text")

  /** MinHash + LSH near-duplicate detection (pipeline op). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.minhashLSH(t(spark, dir, "documents"), "doc_id", "text")

  /** 64-bit SimHash signatures (pipeline op). Served from the shared
    * signature cache, so q28's near-dup pass reuses one projection.
    */
  def simhashSig(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.simhashSigs(t(spark, dir, "documents"), "doc_id", "text")

  /** SimHash near-duplicate pairs: banded signature blocking + Hamming
    * verification (pipeline op; completes the simhash family over q23's
    * signatures).
    */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.simhashNearDup(t(spark, dir, "documents"), "doc_id", "text")

  /** Char-trigram language ID (pipeline op): score each document's
    * character trigrams against tiny per-language profiles — the
    * classic n-gram heuristic (q15 is its word-marker cousin).
    */
  def langIdChargram(spark: SparkSession, dir: String): DataFrame = {
    val enProfile = Seq("the", "he ", " th", "ing", "nd ", "and", " an", "ed ")
    val dslProfile = Seq("sca", "can", "joi", "oin", "mer", "erg", "rge", "an ")
    // Occurrence count per gram via the codegen'd replace trick:
    // (len(t) - len(replace(t, g))) / 3. Equal to the positional count
    // the DuckDB oracle computes because none of the profile grams can
    // overlap itself (no gram's 1- or 2-char prefix equals its suffix),
    // so occurrences are always >= 3 chars apart. The previous
    // interpreted-HOF scan (substr at every position + IN) cost 9.3 s at
    // sf0.1; this is a handful of whole-stage-codegen string passes over
    // a once-projected lowered column.
    def hits(profile: Seq[String]) = profile.map { g =>
      val lit = g.replace("'", "''")
      expr(s"(_ln_ - length(replace(_lt_, '$lit'))) DIV 3")
    }.reduce(_ + _).cast("long")
    t(spark, dir, "documents")
      .withColumn("_lt_", lower(col("text")))
      .withColumn("_ln_", length(col("_lt_")))
      .select(col("doc_id"),
        hits(enProfile).as("en3"), hits(dslProfile).as("dsl3"))
      .withColumn("detected",
        when(col("en3") > col("dsl3"), "en")
          .when(col("dsl3") > col("en3"), "dsl")
          .otherwise("und"))
  }

  /** Winnowing fingerprints (pipeline op): rolling-hash minima over
    * sliding windows — the shift-resistant document signature scheme.
    */
  def winnowFp(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.winnowFingerprints(t(spark, dir, "documents"), "doc_id", "text")

  /** Tumbling-window event aggregation — the batch-equivalent of the
    * Structured Streaming windowed agg (`ts` normalized to epoch µs via
    * [[tsMicros]], so both the legacy nanos-as-long and the current
    * timestamp[us] testdata encodings bucket identically).
    */
  def eventWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.withColumn("ts_us", tsMicros(ev, "ts"))
      .groupBy(expr("ts_us div 3600000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
  }

  /** Multimodal feature extraction over an opaque binary payload column
    * (stub decoder — see operators.Multimodal).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    operators.Multimodal.extractFeatures(
      t(spark, dir, "documents").withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload")

  /** Machine-checked invariant for the no-oracle ANN entries (VERDICT
    * r9 next-round #7): the driver cannot hash-match an approximate
    * result, but the entry can SELF-assert recall@10 against the exact
    * path computed in-engine (nProbe = nList scans every list — exact
    * by construction, the q47-q49 anchor). The floor is the
    * structure-free expectation minus sampling slack: on vectors with
    * no cluster structure IVF recall ≈ probed mass = nProbe/nList
    * (bench `nprobe*` rows), and 20 queries × k=10 gives ~0.035 sd, so
    * floor = nProbe/nList − 0.1 can only trip on a real regression.
    * Checked once per (dir, params) key and cached — q26/q46 reuse one
    * validation, and repeat bench passes don't re-pay the exact scan.
    */
  private val recallFloorChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private def assertRecallFloor(key: String, idx: operators.IvfIndex,
      queries: => Array[(Long, Array[Float])], k: Int): Double =
    recallFloorChecked.computeIfAbsent(key, { _ =>
      // `queries` is by-name: on a cache hit NOTHING runs — in
      // particular q46 must not pay a driver collect job inside its
      // timed bench samples once q26/q46's first call validated the
      // floor (round-10 self-review)
      //
      // Probe at QUARTER lists, deliberately below the round-13
      // probe-fraction crossover (graft.ann.exactscan.fraction,
      // default 0.5): the default nList/2 now snaps to the exact
      // all-list scan, which would make this floor trivially true
      // (recall 1.0 by construction) — the invariant must keep
      // testing GENUINE probing, not the snap.
      val np = math.max(1, idx.nList / 4)
      val qs = queries
      def top(nProbe: Int): Map[Long, Set[Long]] =
        idx.search(qs, k, nProbe, normalized = false)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = top(idx.nList)
      val approx = top(np)
      val perQ = qs.map { case (qid, _) =>
        val ex = exact.getOrElse(qid, Set.empty[Long])
        if (ex.isEmpty) 1.0
        else approx.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
      }
      val recall = perQ.sum / math.max(1, perQ.length)
      val floor = np.toDouble / idx.nList - 0.1
      require(recall >= floor,
        f"ANN recall floor violated for $key: recall@$k = $recall%.3f < " +
          f"floor $floor%.3f (nProbe=$np, nList=${idx.nList})")
      recall
    })

  /** IVF approximate-nearest-neighbor search (O25-O27 analog). ANN hit
    * sets are approximate, so a SQL oracle cannot reproduce them — but
    * the recall INVARIANT is oracle-able (VERDICT r18 next-round #4,
    * reference parity-test style: tests/test_task14_faiss_vs_numpy_
    * results.py:8-34 asserts easy-data agreement rather than
    * bit-parity). The entry runs the probed search (still the timed
    * work — the aggregation below keeps the full search in the output
    * lineage), self-asserts the recall@10 floor against the in-engine
    * exact path ([[assertRecallFloor]] — a violation THROWS, turning
    * the correctness row red), and emits the checked artifact the
    * DuckDB oracle CAN verify: one row per query with its hit count
    * and the floor verdict. Exact-parity of the machinery is oracled
    * by q47-q49; bit-level behavior is pinned in IvfIndexSpec.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // Build amortized per dataset: sampled local k-means fit + one
    // assignment pass, cached across calls (VERDICT r1 next-round #6).
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    assertRecallFloor(s"$dir/embeddings#16@k10", idx, queries, 10)
    // quarter-list nProbe, explicitly BELOW the round-13 probe-fraction
    // crossover: the nList/2 default now snaps to the exact all-list
    // scan (graft.ann.exactscan.fraction), which would make this
    // "ann" catalog entry silently measure the exact path — the entry
    // exists to time GENUINE probing (same np as the recall floor)
    idx.search(queries, k = 10, nProbe = math.max(1, idx.nList / 4),
        normalized = false)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      // true by construction HERE: assertRecallFloor above threw if the
      // floor was violated, so reaching this plan means the invariant
      // held — the literal is the checked verdict, not an assumption
      .withColumn("recall_floor_met", lit(true))
      .select(col("qid"), col("n_hits"), col("recall_floor_met"))
  }

  /** Dataset-query-side IVF ANN (O27 scale path): the query batch stays
    * a DataFrame end-to-end — per-row codegen centroid probes +
    * bounded-heap top-k, no driver collect anywhere. Bit-identical
    * output to [[annIvf]] (searchDs parity spec), registered separately
    * so the distributed path carries its own bench number (VERDICT r7
    * #6). Same index cache key as q26: whichever runs first builds.
    * ("No driver collect" scopes to the SEARCH path; the one-time
    * recall-floor validation collects its 20 queries on first call per
    * dataset only — by-name arg, cache-hit calls run nothing.)
    */
  def annIvfDs(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    // same invariant, same cache key as q26 (searchDs output is
    // spec-pinned bit-identical to search, so one validation covers
    // both entries)
    assertRecallFloor(s"$dir/embeddings#16@k10", idx,
      queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)), 10)
    // same explicit quarter-list nProbe as q26 (below the exactscan
    // crossover) so the bit-parity claim keeps comparing PROBED runs;
    // same checked-artifact output shape as q26 (recall invariant
    // oracle — see annIvf's scaladoc)
    idx.searchDs(queries, "vec_id", "embedding", k = 10,
        nProbe = math.max(1, idx.nList / 4), normalized = false)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("recall_floor_met", lit(true))
      .select(col("qid"), col("n_hits"), col("recall_floor_met"))
  }

  /** Oracled exact-parity ANN entry (q47, VERDICT r8 next-round #2): the
    * same IVF probe-join + bounded-heap `top_k_hits` machinery as q26,
    * run at nProbe = nList — every list is probed, so the candidate set
    * is the whole store and the result is EXACT by construction
    * (IvfIndexSpec proves nProbe=nList ≡ the exact path bit-for-bit).
    * That makes this the one ANN entry a DuckDB top-k oracle can
    * hash-match, giving the probe-join plumbing a green CORRECTNESS row
    * instead of a units-only argument. Distinct query slice from
    * q01/q26 so the entry carries its own evidence.
    */
  def annIvfExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 60 && col("vec_id") < 80)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    idx.search(queries, k = 10, nProbe = idx.nList, normalized = false)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled packed-ANN entry (q48): [[operators.IvfIndex.searchPacked]]
    * at nProbe = nList with exact double scoring — every bucket probed
    * and the cosine arithmetic identical to the declarative plan (the
    * gemmQueries kernels), so the same DuckDB top-k oracle hash-matches.
    * The bucketed-SIMD twin of q47's probe-join entry: between them the
    * whole ANN surface (probe selection, bucket cogroup, packed kernels,
    * heap merge) carries green CORRECTNESS rows.
    */
  def annIvfPacked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 80 && col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    idx.searchPacked[Long](queries, k = 10, nProbe = idx.nList,
        normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled shuffle-free-ANN entry (q49):
    * [[operators.IvfIndex.searchMerged]] at nProbe = nList with exact
    * double scoring — the driver-batch treeAggregate path (broadcast
    * down, heaps up, nothing shuffles), bit-identical to
    * [[annIvfPacked]]'s kernels (IvfIndexSpec), with its own green
    * CORRECTNESS row via the same DuckDB top-k oracle shape.
    */
  def annIvfMerged(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    idx.searchMerged[Long](queries, k = 10, nProbe = idx.nList,
        normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled IVF-SQ8 entry (q59, round 12): the two accelerators
    * COMPOSED — [[operators.IvfIndex.searchMergedQ8]] scans int8
    * bucket slabs (4x less bandwidth on the probed fraction), then
    * rescores candidates against the co-resident fp32 buckets. At
    * nProbe = nList every bucket is probed, and overfetch sized to the
    * whole store means no candidate can be lost — the rescore's
    * sequential-double arithmetic then makes the result exact by
    * construction, so the standard DuckDB top-k oracle hash-matches
    * the full quantize-buckets → int8-scan → fp32-rescore path
    * (IvfIndexSpec pins bit-parity with searchMerged(exact) at partial
    * probing too).
    */
  def annIvfQ8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 160 && col("vec_id") < 180)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val k = 10
    // covering overfetch: k * overfetch >= store rows, so the int8 cut
    // cannot drop a true candidate at any SF's embedding count
    val overfetch = (emb.count() / k + 1).toInt
    idx.searchMergedQ8[Long](queries, k = k, nProbe = idx.nList,
        normalized = false, overfetch = overfetch)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled IVF-PQ entry (q80, round 15): FAISS IVFPQ proper —
    * [[operators.IvfIndex.searchMergedPq]] scans product-quantized
    * bucket slabs by asymmetric distance (m=16 code bytes per 64-d
    * row), then rescores candidates against the co-resident fp32
    * buckets. At nProbe = nList every bucket is probed, and covering
    * overfetch means no candidate can be lost — the rescore's
    * sequential-double arithmetic then makes the result exact by
    * construction, so the standard DuckDB top-k oracle hash-matches
    * the full train -> encode-buckets -> ADC-scan -> fp32-rescore
    * path (IvfIndexSpec pins bit-parity with searchMerged(exact) at
    * partial probing too).
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 180 && col("vec_id") < 200)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val k = 10
    // covering overfetch: k * overfetch >= store rows, so the ADC cut
    // cannot drop a true candidate at any SF's embedding count
    val overfetch = (emb.count() / k + 1).toInt
    idx.searchMergedPq[Long](queries, k = k, nProbe = idx.nList,
        normalized = false, overfetch = overfetch, m = 16)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled bulk IVF-PQ entry (q81, round 15): the Dataset-query twin
    * of q80 — [[operators.IvfIndex.searchPackedPq]]'s fused cogroup
    * (ADC candidate scan + co-located fp32 rescore in ONE pass over
    * the shared bucket partitioner, queries arriving as a probe
    * shuffle instead of a driver broadcast). Same exactness argument
    * as q80/q59: nProbe = nList probes every bucket and covering
    * overfetch keeps every candidate, so the shared rescore tail makes
    * the result exact and the DuckDB top-k oracle hash-matches the
    * whole path (IvfIndexSpec pins bit-parity with searchPacked(exact)
    * at partial probing and against searchMergedPq).
    */
  def annIvfPqDs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 200 && col("vec_id") < 220)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val k = 10
    // covering overfetch: k * overfetch >= store rows, so the ADC cut
    // cannot drop a true candidate at any SF's embedding count
    val overfetch = (emb.count() / k + 1).toInt
    idx.searchPackedPq[Long](queries, k = k, nProbe = idx.nList,
        normalized = false, overfetch = overfetch, m = 16)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Shared sharded-HNSW store for q75/q76 (and the bench rows): one
    * graph per packed slab, built in-task — the DISTRIBUTED twin of the
    * serving replica's driver-local graph (operators.HnswStore).
    */
  private def hnswStoreFor(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    operators.HnswStore.cached(s"$dir/embeddings#hnsw")(
      operators.HnswStore.fromDataset[Long](
        emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])],
        normalize = false).persist())
  }

  /** Machine-checked invariant for the no-oracle q76 (the q26/q55
    * pattern): recall@10 of the per-shard graph search vs the exact
    * sharded scan, computed in-engine once per (dir, params) key. The
    * floor is the HnswSpec structure-free expectation (>= 0.85 at
    * ef=128 on random vectors) minus sampling slack for 20 queries —
    * 0.8 can only trip on a real graph regression, while IVF at the
    * same cost sits near probed-mass recall (q26's floor is 0.15).
    */
  private val hnswRecallChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private def assertHnswRecallFloor(key: String,
      store: operators.HnswStore[Long],
      queries: => Array[(Long, Array[Float])], k: Int, ef: Int,
      spark: SparkSession): Double =
    hnswRecallChecked.computeIfAbsent(key, { _ =>
      import spark.implicits._
      val qs = queries
      def top(exact: Boolean): Map[Long, Set[Long]] =
        store.searchMerged(qs, k, ef, exact = exact)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = top(exact = true)
      val approx = top(exact = false)
      val perQ = qs.map { case (qid, _) =>
        val ex = exact.getOrElse(qid, Set.empty[Long])
        if (ex.isEmpty) 1.0
        else approx.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
      }
      val recall = perQ.sum / math.max(1, perQ.length)
      require(recall >= 0.8,
        f"sharded-HNSW recall floor violated for $key: recall@$k = " +
          f"$recall%.3f < 0.8 (ef=$ef)")
      recall
    })

  /** Oracled sharded-HNSW exact entry (q75, round 13): the distributed
    * graph store's packing + treeAggregate merge + ranking machinery run
    * in EXACT mode — per-shard scoring ignores the graphs and uses the
    * sequential-double cosine of the declarative path
    * (BlockStore.scoreBlock), so the result is exact by construction
    * and the standard DuckDB top-k oracle hash-matches (the q47/q49
    * pattern: oracle the plumbing, recall-floor the approximation).
    * Distinct query slice so the entry carries its own evidence.
    */
  def hnswShardExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 180 && col("vec_id") < 200)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    hnswStoreFor(spark, dir).searchMerged(queries, k = 10, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled Dataset-query sharded-HNSW entry (q77, round 13): the
    * q48-for-the-graph-store — [[operators.HnswStore.searchPacked]]
    * keeps the query side a Dataset end-to-end (packed query slabs ×
    * graph shards, heap absorb in a reduceByKey — never a driver
    * array), run in exact mode so the standard DuckDB top-k oracle
    * hash-matches; HnswStoreSpec pins bit-parity with searchMerged in
    * BOTH modes. Distinct query slice for its own evidence.
    */
  def hnswShardPacked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 200 && col("vec_id") < 220)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    hnswStoreFor(spark, dir).searchPacked(queries, k = 10, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Sharded-HNSW graph search (q76, round 13): per-shard beam search
    * at ef=128 merged exactly — the distributed answer to the
    * reference's HNSW recall on STRUCTURE-FREE embeddings, where IVF
    * recall is bounded by probed mass (SCALING.md "ANN"). Approximate,
    * so the hit set has no SQL oracle; the entry self-asserts a
    * recall@10 floor against the in-engine exact sharded scan
    * ([[assertHnswRecallFloor]]; a violation throws) and emits the
    * checked per-query artifact (qid, n_hits, recall_floor_met) that
    * the DuckDB oracle verifies (the annIvf pattern). HnswStoreSpec
    * pins exact-parity and determinism; q75/q77 oracle the machinery
    * at exact settings.
    */
  def hnswShard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val store = hnswStoreFor(spark, dir)
    assertHnswRecallFloor(s"$dir/embeddings#hnsw@k10ef128", store,
      queries, 10, 128, spark)
    // checked-artifact output (recall invariant oracle — the annIvf
    // pattern): the floor assert above threw on violation; the beam
    // search stays in the lineage as the timed work
    store.searchMerged(queries, k = 10, ef = 128)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("recall_floor_met", lit(true))
      .select(col("qid"), col("n_hits"), col("recall_floor_met"))
  }

  /** Text-chunking ingest (pipeline op): overlapping token windows over
    * each document — the chunk->embed->upsert flow's first stage
    * (operators.TextChunk; bench/st_embedding.py analog). Boundaries are
    * pure arithmetic, so the DuckDB oracle recomputes them exactly.
    */
  def textChunks(spark: SparkSession, dir: String): DataFrame =
    operators.TextChunk.chunk(t(spark, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
      .select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
        col("n_tokens"), md5(col("chunk_text").cast("binary")).as("chunk_md5"))

  /** Distributed-query-side top-k (pipeline op): the query side is a
    * Dataset read from the table — never collected to the driver
    * (CosineTopK.gemmQueries: pack-per-partition x store blocks +
    * heap reduceByKey). Exact scoring, so the same DuckDB oracle shape
    * as q01-q05 applies.
    */
  def topkDistributed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    // pinned: cartesian recomputes the store side once per query
    // partition when unpersisted (pack-4x at q32's repartition(4)). No
    // explicit unpersist — the result is consumed lazily downstream,
    // and the ContextCleaner drops the RDD blocks once this call's
    // frame is unreachable (tiny pack; same lifecycle as gemmQueries'
    // own query-partition cache). Batch callers that consume results
    // eagerly should use CosineTopK.gemmQueriesManaged and release().
    val store = graft.core.BlockStore.fromDataset(
      emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])],
      normalize = false).persist()
    val queries = emb.filter(col("vec_id") >= 40 && col("vec_id") < 60)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .repartition(4)
    CosineTopK.gemmQueries(store, queries, k = 10, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Dedup cluster materialization (pipeline op): two overlapping
    * 4-token fingerprint blockings union into one candidate-pair graph
    * (Dedup.pairsByKey), connected components assign every clustered
    * document its smallest-reachable-id representative
    * (Dedup.connectedComponents hash-min propagation), and every
    * document comes back with a cluster id (singletons are their own
    * cluster). The keep-one pass a training pipeline runs after
    * near-dup detection — kept rows are those with
    * cluster_id = doc_id. The DuckDB oracle recomputes reachability
    * with a recursive CTE, so the fixpoint itself is oracle-checked.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val w = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    // both fingerprints in ONE scan via a generator — a union of two
    // fpAt(start) projections would re-read and re-tokenize documents
    // once per branch (the recompute-per-consumer trap; UNION ALL
    // multiplicity preserved, matching the oracle)
    val fps = w.select(col("doc_id"), explode(array(
      md5(concat_ws(" ", slice(col("w"), 1, 4)).cast("binary")),
      md5(concat_ws(" ", slice(col("w"), 2, 4)).cast("binary")))).as("fp"))
    val pairs = operators.Dedup.pairsByKey(fps, Seq("fp"))
    val cc = operators.Dedup.connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Incremental cluster maintenance (pipeline op, q45): the first
    * fingerprint blocking plays the HISTORICAL pair graph — labeled
    * once by connectedComponents — and the second blocking arrives as
    * a new batch of candidate pairs folded in with
    * [[operators.Dedup.mergeComponents]]: the hash-min fixpoint reruns
    * only over the new batch's quotient graph, never the accumulated
    * edge set. Merged labels must equal a from-scratch labeling of the
    * union graph (the quotient-contraction argument DedupSpec
    * asserts), so the DuckDB oracle recomputes reachability over BOTH
    * blockings' pairs with a recursive CTE — the incremental path is
    * held to the batch answer.
    */
  def mergeClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val w = docs.select(col("doc_id"), words(col("text")).as("w"))
    def fpAt(start: Int) = w.select(col("doc_id"),
      md5(concat_ws(" ", slice(col("w"), start, 4)).cast("binary")).as("fp"))
    val historical = operators.Dedup.connectedComponents(
      operators.Dedup.pairsByKey(fpAt(1), Seq("fp")))
    val newPairs = operators.Dedup.pairsByKey(fpAt(2), Seq("fp"))
    val merged = operators.Dedup.mergeComponents(historical, newPairs)
    docs.select(col("doc_id"))
      .join(merged.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** q45's fixture, exposed for the bench's merge-only timing (VERDICT
    * r8 next-round #5: the catalog entry conflates fixture construction
    * — a from-scratch labeling plus two blockings — with the 2-3 s fold
    * it exists to measure). Returns (historical labeling, new pair
    * batch); the historical frame is already materialized by
    * `connectedComponents`, the pair frame is persisted and counted so
    * a timed `mergeComponents` over the two measures ONLY the fold.
    */
  private[graft] def mergeFixture(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = t(spark, dir, "documents")
    val w = docs.select(col("doc_id"), words(col("text")).as("w"))
    def fpAt(start: Int) = w.select(col("doc_id"),
      md5(concat_ws(" ", slice(col("w"), start, 4)).cast("binary")).as("fp"))
    val historical = operators.Dedup.connectedComponents(
      operators.Dedup.pairsByKey(fpAt(1), Seq("fp")))
    val newPairs = operators.Dedup.pairsByKey(fpAt(2), Seq("fp")).persist()
    newPairs.count()
    (historical, newPairs)
  }

  /** PII redaction (pipeline op, q50): scrub emails / IPv4s / phone
    * numbers to typed placeholders before tokenization
    * ([[operators.CorpusClean.redactPii]] — one codegen regexp_replace
    * chain, zero shuffle). The synthetic corpus carries no PII, so the
    * entry SALTS deterministic contact strings into a subset of docs
    * (doc_id-derived, reproduced verbatim by the oracle) — the DuckDB
    * side re-runs the same RE2-safe patterns, holding both the match
    * semantics and the placeholder arithmetic to byte parity.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val salted = docs.select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 250).cast("string"), lit(".1")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit(" call 555-867-5309"))
        .otherwise(lit(""))).as("text"))
    operators.CorpusClean.redactPii(salted, "text")
      .select(col("doc_id"),
        md5(col("redacted").cast("binary")).as("redacted_md5"),
        col("n_redactions"))
  }

  /** URL-domain histogram (pipeline op, q51): documents per extracted
    * http(s) host ([[operators.CorpusClean.domainHistogram]]). Same
    * salting scheme as q50 — the synthetic corpus carries no URLs, so
    * deterministic ones are appended and the DuckDB oracle re-runs the
    * identical RE2-safe extraction.
    */
  def domainHist(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val salted = docs.select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" see https://site"), (col("doc_id") % 20).cast("string"),
          lit(".example.com/x")))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0, lit(" and http://mirror.example.org/y"))
        .otherwise(lit(""))).as("text"))
    operators.CorpusClean.domainHistogram(salted, "doc_id", "text")
  }

  /** Unigram LM cross-entropy (pipeline op, q52): per-doc mean
    * -log2 p(tok) under the corpus's own unigram MLE — the
    * perplexity-proxy quality filter
    * ([[operators.CorpusClean.unigramCrossEntropy]]). Double math end
    * to end, 6-dp rounded, so the DuckDB twin hash-matches.
    */
  def lmCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.unigramCrossEntropy(
      t(spark, dir, "documents"), "doc_id", "text")

  /** Character-window chunking (pipeline op): the reference's other
    * chunker (bench/local_embedding_index.py fixed-size slices,
    * including its trailing-empty-chunk quirk on exact multiples).
    */
  def textChunksChars(spark: SparkSession, dir: String): DataFrame =
    operators.TextChunk.chunkChars(t(spark, dir, "documents"), "doc_id", "text",
        chunkSize = 100)
      .select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
        col("n_chars"), md5(col("chunk_text").cast("binary")).as("chunk_md5"))

  /** Benchmark decontamination (pipeline op): train docs sharing any
    * 13-gram with the eval split (doc_id % 10 == 0 stands in for the
    * held-out benchmark set). Because this demo's "eval set" is 10%
    * OF THE CORPUS — not a benchmark-sized set — it grows with the
    * scale factor, so `broadcastEval=false`: the gram join shuffles
    * (or AQE broadcasts at runtime from actual sizes) instead of
    * statically broadcasting a corpus-fraction gram set that would
    * blow the driver at large SF. Real benchmark eval sets keep the
    * default broadcast path.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.CorpusClean.contaminationHits(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 13, broadcastEval = false)
  }

  /** Cross-document boilerplate detection (pipeline op): word 5-grams
    * occurring in >= 3 distinct documents (this corpus has no newlines,
    * so n-grams stand in for the line-level unit; `cleanLines` covers
    * the newline case and is spec-tested).
    */
  def boilerplateGrams(spark: SparkSession, dir: String): DataFrame = {
    val units = operators.Dedup.shingleSets(
        t(spark, dir, "documents"), "doc_id", "text", n = 5)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    operators.CorpusClean.commonUnits(units, "doc_id", "g", minDocs = 3)
  }

  /** Gopher-style repetition quality signals (pipeline op). */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.repetitionStats(
      t(spark, dir, "documents"), "doc_id", "text", n = 2)

  /** Per-source sampling rates for q38 — shared with the oracle
    * builder so both engines compare against the same hex thresholds.
    */
  private[graft] val sampleRates: Map[String, Double] =
    (0 until 20).map(k => s"src$k" -> (0.05 + 0.05 * (k % 5))).toMap

  /** Deterministic stratified sampling for domain mixing (pipeline
    * op): per-source keep rates, decided by md5(doc_id) — reproducible
    * across engines, so DuckDB running the same arithmetic IS the
    * oracle.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.stratifiedSample(
        t(spark, dir, "documents"), "doc_id", "source", sampleRates)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"))

  /** End-to-end hygiene pipeline (pipeline op): repetition gate →
    * decontaminate vs the eval split → exact-dedup keep-one →
    * stratified sample, as ONE composed plan (q39).
    */
  def hygienePipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // broadcastEval=false for the same reason as q35: the eval split
    // here is a corpus fraction, not a fixed benchmark set
    operators.CorpusClean.hygienePipeline(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", "source", sampleRates, broadcastEval = false)
  }

  /** Corpus IDF table (pipeline op): document frequency + smoothed
    * IDF per distinct term (q40).
    */
  def idfTable(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.idfTable(t(spark, dir, "documents"), "doc_id", "text")

  /** The whitespace tokenizer every text entry shares — q41's tf side
    * MUST stay bit-identical to the idf/df side's tokenization
    * (Dedup.wordsOf), or the term join silently drops divergent terms.
    */
  private def words(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  /** Per-document top TF-IDF terms (pipeline op, q41): the corpus IDF
    * table joined back to term frequencies, ranked per doc by the
    * bounded-heap `top_k_hits` aggregate — k rows per doc cross the
    * shuffle, where a row_number Window would shuffle every (doc,
    * term) score. Cross-family reuse of the vector path's top-k
    * machinery on the text side.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val idf = operators.CorpusClean.idfTable(docs, "doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // no broadcast hint: a corpus-scale open vocabulary can exceed the
    // broadcast cap — AQE broadcasts small vocabularies on its own
    val scored = tf
      .join(idf.select(col("term"), col("idf")), Seq("term"))
      .select(col("doc_id"), col("term"),
        round(col("tf") * col("idf"), 6).as("tfidf"))
    scored.groupBy(col("doc_id"))
      .agg(graft.functions.top_k_hits(col("tfidf"), col("term"), 3).as("hits"))
      .select(col("doc_id"), posexplode(col("hits")).as(Seq("i", "h")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("rank"),
        col("h.id").as("term"), col("h.score").as("tfidf"))
  }

  /** Corpus profile (pipeline op, q42): per-language doc counts, mean
    * and exact p50/p90 length percentiles — the summary a pipeline
    * prints before/after each hygiene stage. Exact `percentile` (both
    * engines interpolate at p*(n-1)) is fine at per-group cardinality;
    * a 100 TB corpus would swap in `approx_percentile` (no exact
    * oracle by construction).
    */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_chars")), 6).as("mean_chars"),
        // one percentile buffer per group for both points, not two
        expr("percentile(n_chars, array(0.5, 0.9))").as("_p"))
      .select(col("lang"), col("n"), col("mean_chars"),
        round(element_at(col("_p"), 1), 6).as("p50"),
        round(element_at(col("_p"), 2), 6).as("p90"))

  /** Chunk→document embedding pooling (pipeline op, q43): element-wise
    * mean of each group's vectors via the `vector_avg`
    * TypedImperativeAggregate — one (sums, count) buffer per group
    * crosses the shuffle however many chunk vectors fold in.
    * vec_id % 50 stands in for the chunk→doc relation. Output is
    * flattened to (doc, dim, val) rows — the driver's oracle compare
    * hashes scalars, not arrays.
    */
  def docEmbedding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .groupBy((col("vec_id") % 50).as("doc"))
      .agg(graft.functions.vector_avg(col("embedding")).as("v"))
      .select(col("doc"), posexplode(col("v")).as(Seq("i", "val")))
      .select(col("doc"), (col("i") + 1).cast("long").as("dim"),
        round(col("val"), 6).as("val"))

  /** Edit-distance near-dup verification (pipeline op, q44): the
    * fuzzy-match metric users reach for when Jaccard/Hamming are too
    * coarse. Levenshtein only ever runs as a VERIFY stage on blocked
    * candidates (prefix-fingerprint buckets here via
    * [[operators.Dedup.pairsByKey]]) — never on the pair space — and
    * uses the THRESHOLD form: the 3-arg `levenshtein` band-limits the
    * DP to O(len × threshold) cells and returns −1 past the bound, so
    * a candidate pair of long documents costs 120·len, not len²
    * (VERDICT r6 #2). `dist >= 0` keeps exactly the rows the
    * full-DP-then-filter version kept; integer distances, so oracle
    * parity is exact.
    */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val fps = docs.select(col("doc_id"),
      md5(concat_ws(" ", slice(words(col("text")), 1, 4)).cast("binary")).as("fp"))
    val pairs = operators.Dedup.pairsByKey(fps, Seq("fp"))
    val ta = docs.select(col("doc_id").as("a"), col("text").as("ta"))
    val tb = docs.select(col("doc_id").as("b"), col("text").as("tb"))
    pairs.join(ta, Seq("a")).join(tb, Seq("b"))
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb"), 120).cast("long").as("dist"))
      .filter(col("dist") >= 0)
  }

  /** General aggregation sanity on lineitem (TPC-H Q1 shape). */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))

  /** Ordered top-N customers by spend (sort+limit surface). */
  def topCustomers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"), count(lit(1)).as("n"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(10)

  /** Latest event per user (window-function surface). */
  def latestEvent(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
  }

  // ---- int8 scalar-quantized store entries (q55/q56) ----

  /** Per-dataset quantized store, built once and cached (same LRU
    * policy as the IVF index cache): one pack pass + one quantize map,
    * no shuffle. Cosine mode — the raw testdata embeddings, original
    * norms kept full-precision.
    */
  private val q8Cache =
    new core.SessionLru[String, (SparkSession, core.Q8Store[Long])](
      4, _._1, _._2.unpersist(false, cascadeSource = true))
  private def q8Store(spark: SparkSession, dir: String): core.Q8Store[Long] = {
    import spark.implicits._
    q8Cache.getOrBuild(s"$dir/embeddings#q8") {
      val ds = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val q8 = core.Q8Store.fromBlockStore(
        core.BlockStore.fromDataset(ds, normalize = false)).persist()
      q8.materialize()
      (spark, q8)
    }._2
  }

  /** Machine-checked invariant for the no-oracle q55 (the q26/q46
    * pattern): recall@10 of the small-overfetch rescored path against
    * the overfetch-all path (exact by construction — no candidate can
    * be lost when every row survives the scan). Validated once per
    * dataset and cached.
    */
  private val q8FloorChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private def assertQ8RecallFloor(key: String, spark: SparkSession,
      dir: String, queries: Array[(Long, Array[Float])], k: Int,
      overfetch: Int): Double =
    q8FloorChecked.computeIfAbsent(key, { _ =>
      import spark.implicits._
      val q8 = q8Store(spark, dir)
      def top(of: Int): Map[Long, Set[Long]] =
        q8.rescoredTopK(queries, k, of)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = top(0)
      val approx = top(overfetch)
      val perQ = queries.map { case (qid, _) =>
        val ex = exact.getOrElse(qid, Set.empty[Long])
        if (ex.isEmpty) 1.0
        else approx.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
      }
      val recall = perQ.sum / math.max(1, perQ.length)
      require(recall >= 0.9,
        f"q8 recall floor violated for $key: recall@$k = $recall%.3f < 0.9 " +
          f"(overfetch=$overfetch)")
      recall
    })

  /** Int8-quantized scan + exact rescore at realistic overfetch (the
    * production shape: 4x less scan bandwidth, candidates re-ranked in
    * full precision). Approximate by construction, so the hit set has
    * no SQL oracle — the entry self-asserts recall@10 >= 0.9 against
    * the in-engine overfetch-all path (see [[assertQ8RecallFloor]];
    * a violation throws) and emits the checked per-query artifact
    * (qid, n_hits, recall_floor_met) that the DuckDB oracle verifies
    * (the annIvf pattern, VERDICT r18 next-round #4). Exact-parity of
    * the machinery is oracled by q56.
    */
  def q8Ann(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 140 && col("vec_id") < 160)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    assertQ8RecallFloor(s"$dir/embeddings#q8@k10of4", spark, dir, queries,
      k = 10, overfetch = 4)
    // checked-artifact output (recall invariant oracle — the annIvf
    // pattern): the floor assert above threw on violation, so the
    // emitted verdict row is the checked invariant; the int8 scan +
    // rescore stays in the lineage as the timed work
    q8Store(spark, dir).rescoredTopK(queries, k = 10, overfetch = 4)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("recall_floor_met", lit(true))
      .select(col("qid"), col("n_hits"), col("recall_floor_met"))
  }

  /** Oracled exact-parity entry for the quantized machinery (the q47
    * pattern: exact settings on approximate machinery): overfetch-all
    * keeps every row through the int8 scan, so the full-precision
    * rescore IS the exact top-k — hash-matched by the same DuckDB
    * top-k oracle as q01. Proves quantize -> scan -> candidate ->
    * rescore end-to-end with a green CORRECTNESS row.
    */
  def q8RescoreExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 120 && col("vec_id") < 140)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    q8Store(spark, dir).rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  // ---- product-quantized store entries (q78/q79) ----

  /** Per-dataset PQ store, built once and cached (the q8Cache policy):
    * one bounded-sample codebook train + one encode map, no shuffle.
    * Cosine mode over the raw testdata embeddings; m=16 subspaces of
    * the 64-d rows — 16 code bytes/row vs 256 float bytes, the 16x
    * compression tier below q8's fixed 4x.
    */
  private val pqCache =
    new core.SessionLru[String, (SparkSession, core.PqStore[Long])](
      4, _._1, _._2.unpersist(false, cascadeSource = true))
  private def pqStore(spark: SparkSession, dir: String): core.PqStore[Long] = {
    import spark.implicits._
    pqCache.getOrBuild(s"$dir/embeddings#pq") {
      val ds = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val pq = core.PqStore.fromBlockStore(
        core.BlockStore.fromDataset(ds, normalize = false), m = 16).persist()
      pq.materialize()
      (spark, pq)
    }._2
  }

  /** Machine-checked invariant for the no-oracle q78 (the q26/q55
    * pattern): recall@10 of the small-overfetch rescored path against
    * the overfetch-all path (exact by construction). Validated once per
    * dataset and cached.
    */
  private val pqFloorChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private def assertPqRecallFloor(key: String, spark: SparkSession,
      dir: String, queries: Array[(Long, Array[Float])], k: Int,
      overfetch: Int): Double =
    pqFloorChecked.computeIfAbsent(key, { _ =>
      import spark.implicits._
      val pq = pqStore(spark, dir)
      def top(of: Int): Map[Long, Set[Long]] =
        pq.rescoredTopK(queries, k, of)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = top(0)
      val approx = top(overfetch)
      val perQ = queries.map { case (qid, _) =>
        val ex = exact.getOrElse(qid, Set.empty[Long])
        if (ex.isEmpty) 1.0
        else approx.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
      }
      val recall = perQ.sum / math.max(1, perQ.length)
      require(recall >= 0.9,
        f"pq recall floor violated for $key: recall@$k = $recall%.3f < 0.9 " +
          f"(overfetch=$overfetch)")
      recall
    })

  /** PQ ADC scan + exact rescore at realistic overfetch (the production
    * shape: 16x less scan bandwidth than fp32, candidates re-ranked in
    * full precision). Approximate by construction, so the hit set has
    * no SQL oracle — the entry self-asserts recall@10 >= 0.9 against
    * the in-engine overfetch-all path (see [[assertPqRecallFloor]]; a
    * violation throws) and emits the checked per-query artifact
    * (qid, n_hits, recall_floor_met) that the DuckDB oracle verifies
    * (the annIvf pattern). Exact-parity of the machinery is oracled by
    * q79.
    */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 160 && col("vec_id") < 180)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    assertPqRecallFloor(s"$dir/embeddings#pq@k10of8", spark, dir, queries,
      k = 10, overfetch = 8)
    // checked-artifact output (recall invariant oracle — the annIvf
    // pattern): the floor assert above threw on violation; the ADC scan
    // + rescore stays in the lineage as the timed work
    pqStore(spark, dir).rescoredTopK(queries, k = 10, overfetch = 8)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("recall_floor_met", lit(true))
      .select(col("qid"), col("n_hits"), col("recall_floor_met"))
  }

  /** Oracled exact-parity entry for the PQ machinery (the q47/q56
    * pattern: exact settings on approximate machinery): overfetch-all
    * keeps every row through the ADC scan, so the full-precision
    * rescore IS the exact top-k — hash-matched by the same DuckDB
    * top-k oracle as q01. Proves train -> encode -> ADC scan ->
    * candidate -> rescore end-to-end with a green CORRECTNESS row.
    */
  def pqRescoreExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    pqStore(spark, dir).rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled IVF-bit entry (q83, round 15): the cheapest composed rung
    * — IVF prunes the probed buckets, 256 sign bits hold each scanned
    * row, Hamming ranks candidates, the shared fp32 tail rescores. At
    * nProbe = nList + covering overfetch the result is exact by the
    * same argument as q80/q81, so the standard DuckDB top-k oracle
    * hash-matches the whole sketch -> Hamming -> rescore composition.
    */
  def annIvfBit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 140 && col("vec_id") < 160)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val k = 10
    val overfetch = (emb.count() / k + 1).toInt
    idx.searchMergedBit[Long](queries, k = k, nProbe = idx.nList,
        normalized = false, overfetch = overfetch, bits = 256)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  // ---- VdbStore-facade composed-tier entries (q84/q85, round 16) ----

  /** Per-dataset facade store for the composed-tier entries: the FULL
    * reference store contract (write-time f32 L2 normalization,
    * pico_vdb.py:422/58-68) loaded once from the embeddings table with
    * zero-padded string ids, so the store's string tie-break equals
    * the oracle's numeric one. Accelerator enablement is per-entry
    * (each entry configures exactly the tiers it exercises).
    */
  private val vdbCache =
    new core.SessionLru[String, (SparkSession, core.VdbStore)](
      4, _._1, v => {
        val st = v._2
        st.disableAnn(); st.disableQ8(); st.disablePq(); st.disableBit()
        st.disableHnsw()
      })
  private def vdbStoreFor(spark: SparkSession, dir: String): core.VdbStore = {
    vdbCache.getOrBuild(s"$dir/embeddings#vdb") {
      val emb = t(spark, dir, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val st = core.VdbStore.empty(spark, dim)
      st.upsertDF(emb.select(
        lpad(col("vec_id").cast("string"), 8, "0").as("_id_"),
        col("embedding").as("vector"),
        lit(null).cast("string").as("meta")))
      (spark, st)
    }._2
  }

  /** Shared driver for the facade-composition entries: enable exactly
    * the requested tiers on the cached store, run `query()` with
    * nProbe = nList (every bucket probed) under a covering overfetch
    * conf (k * overfetch >= store rows, so the compressed candidate
    * cut cannot drop a true hit) — the q80/q83 exactness argument,
    * but through the PUBLIC facade dispatch instead of the IvfIndex
    * methods directly, proving `query()` itself reaches the composed
    * tier (the reference's contract that its accelerator is always
    * reachable from query(), pico_vdb.py:667-730). The overfetch conf
    * is restored after the call (query() collects eagerly, so the
    * returned rows are already driver-local).
    */
  private def vdbComposedTopk(spark: SparkSession, dir: String,
      lo: Long, hi: Long, expectStrategy: String,
      configure: core.VdbStore => Unit, overfetchKey: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    configure(store)
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val covering = ((store.count() / k) + 1).toString
    val prev = spark.conf.getOption(overfetchKey)
    spark.conf.set(overfetchKey, covering)
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k, nProbe = 16)
      finally prev match {
        case Some(v) => spark.conf.set(overfetchKey, v)
        case None => spark.conf.unset(overfetchKey)
      }
    require(store.lastQueryStrategy.contains(expectStrategy),
      s"facade routed ${store.lastQueryStrategy} instead of $expectStrategy")
    hits.zipWithIndex.flatMap { case (hs, qi) =>
      hs.zipWithIndex.map { case (h, r) =>
        (queries(qi)._1, (r + 1).toLong, h.id.toLong, h.metrics)
      }
    }.toSeq.toDF("qid", "rank", "vec_id", "score")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
  }

  /** Oracled facade IVF+PQ entry (q84, round 16): `enableAnn` +
    * `enablePq` on the SAME store routes `query()` through the
    * composed [[operators.IvfIndex.searchMergedPq]] scan (strategy
    * "ann+pq" — asserted), exact under nProbe = nList + covering
    * overfetch. The oracle reproduces the store's write-time float32
    * normalization in SQL (multiply-by-reciprocal, component-rounded
    * to REAL — bit-identical to functions.NormalizeL2), so the
    * standard top-k oracle hash-matches the normalized scores.
    */
  def vdbAnnPq(spark: SparkSession, dir: String): DataFrame =
    vdbComposedTopk(spark, dir, 220L, 240L, "ann+pq", st => {
      st.disableQ8(); st.disableBit()
      st.enableAnn(16); st.enablePq(16)
    }, "graft.pq.overfetch")

  /** Oracled facade IVF+bit entry (q85, round 16): `enableAnn` +
    * `enableBit` routes `query()` through the composed
    * [[operators.IvfIndex.searchMergedBit]] Hamming scan (strategy
    * "ann+bit" — asserted), exact under the same covering argument.
    */
  def vdbAnnBit(spark: SparkSession, dir: String): DataFrame =
    vdbComposedTopk(spark, dir, 240L, 260L, "ann+bit", st => {
      st.disableQ8(); st.disablePq()
      st.enableAnn(16); st.enableBit(256)
    }, "graft.bit.overfetch")

  /** Oracled facade filtered-ANN entry (q86, round 16): with
    * `graft.ann.filtered` on, a where-restricted `query()` routes
    * through [[operators.IvfIndex.searchMergedAllowed]] (strategy
    * "ann-filtered" — asserted) instead of the blanket exact bypass:
    * the predicate's matching ids broadcast into the probed bucket
    * scan as a membership set. At nProbe = nList the single pass IS
    * the exact filtered scan, so the unit-normalized top-k oracle
    * with the same store predicate hash-matches (graft.query.exact
    * pins double accumulation on both sides like q47). The O16
    * adaptive re-probe at PARTIAL nProbe is spec-pinned in
    * VdbStoreSpec — refill behavior can't be SQL-oracled.
    */
  def vdbAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit()
    store.enableAnn(16)
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 260 && col("vec_id") < 280)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val prevOn = spark.conf.getOption("graft.ann.filtered")
    val prevEx = spark.conf.getOption("graft.query.exact")
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k, nProbe = 16,
        where = Some(col("_id_") < "00000300"))
      finally {
        prevOn match {
          case Some(v) => spark.conf.set("graft.ann.filtered", v)
          case None => spark.conf.unset("graft.ann.filtered")
        }
        prevEx match {
          case Some(v) => spark.conf.set("graft.query.exact", v)
          case None => spark.conf.unset("graft.query.exact")
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered"),
      s"facade routed ${store.lastQueryStrategy} instead of ann-filtered")
    hits.zipWithIndex.flatMap { case (hs, qi) =>
      hs.zipWithIndex.map { case (h, r) =>
        (queries(qi)._1, (r + 1).toLong, h.id.toLong, h.metrics)
      }
    }.toSeq.toDF("qid", "rank", "vec_id", "score")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
  }

  /** Oracled facade bloom-rung entry (q87, round 16): with both exact
    * id sets forced over a tiny `graft.ann.filtered.max`, the
    * filtered query routes through the Bloom broadcast (strategy
    * "ann-filtered+bloom" — asserted) at a deliberately brutal 30%
    * false-positive rate. The verification semi-join + exact refill
    * make the result EXACT at covering probes regardless of what the
    * Bloom admits (VdbStore.query's eviction argument), so the same
    * unit-normalized filtered top-k oracle hash-matches — the oracle
    * is literally checking the FP-drop machinery under fire.
    */
  def vdbAnnFilteredBloom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit()
    store.enableAnn(16)
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 280 && col("vec_id") < 300)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val keys = Seq("graft.ann.filtered", "graft.query.exact",
      "graft.ann.filtered.max", "graft.ann.filtered.bloom.fpp")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    spark.conf.set("graft.ann.filtered.max", "2")
    spark.conf.set("graft.ann.filtered.bloom.fpp", "0.3")
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k, nProbe = 16,
        where = Some(col("_id_") >= "00000100"))
      finally keys.foreach { key =>
        prev(key) match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered+bloom"),
      s"facade routed ${store.lastQueryStrategy} instead of ann-filtered+bloom")
    emitVdbTopk(spark, queries, hits)
  }

  /** Shared (qid, rank, vec_id, score) emit for the facade entries —
    * zero-padded string ids map back to their numeric oracle ids.
    */
  private def emitVdbTopk(spark: SparkSession,
      queries: Array[(Long, Array[Float])],
      hits: Seq[Seq[core.VdbHit]]): DataFrame = {
    import spark.implicits._
    hits.zipWithIndex.flatMap { case (hs, qi) =>
      hs.zipWithIndex.map { case (h, r) =>
        (queries(qi)._1, (r + 1).toLong, h.id.toLong, h.metrics)
      }
    }.toSeq.toDF("qid", "rank", "vec_id", "score")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
  }

  /** Oracled facade filtered+int8 composition entry (q88, round 16):
    * `enableAnn` + `enableQ8` + `graft.ann.filtered` routes a
    * where-restricted `query()` through
    * [[operators.IvfIndex.searchMergedQ8Allowed]] (strategy
    * "ann-filtered+q8" — asserted): the membership-filtered QUANTIZED
    * candidate scan with the fp32 double rescore. Exact under
    * nProbe = nList + covering `graft.q8.overfetch` (the q84
    * covering argument applied to the filtered scan), so the
    * unit-normalized filtered top-k oracle hash-matches.
    */
  def vdbAnnQ8Filtered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disablePq(); store.disableBit()
    store.enableAnn(16)
    store.enableQ8()
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 300 && col("vec_id") < 320)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val covering = ((store.count() / k) + 1).toString
    val keys = Seq("graft.ann.filtered", "graft.query.exact", "graft.q8.overfetch")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    spark.conf.set("graft.q8.overfetch", covering)
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k, nProbe = 16,
        where = Some(col("_id_") < "00000200"))
      finally {
        store.disableQ8()
        keys.foreach { key =>
          prev(key) match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered+q8"),
      s"facade routed ${store.lastQueryStrategy} instead of ann-filtered+q8")
    emitVdbTopk(spark, queries, hits)
  }

  /** Oracled facade filtered-HNSW entry (q89, round 17): with
    * `graft.ann.filtered` on and the GRAPH strategy enabled, a
    * where-restricted `query()` routes through
    * [[operators.HnswStore.searchMergedMember]] (strategy
    * "hnsw-filtered" — asserted) instead of the per-call exact repack
    * scan — the last strategy×filter combination with a scale cliff
    * (VERDICT r16 missing #1). At a store-covering efSearch every
    * shard serves the exact member scan (the q86 covering argument,
    * graph-style), so the unit-normalized filtered top-k oracle
    * hash-matches under graft.query.exact. Partial-beam behavior
    * (filtered beam expansion, component-exhaustion snap) is
    * spec-pinned in HnswStoreSpec/VdbStoreSpec — not SQL-oracleable.
    */
  def vdbHnswFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit(); store.disableAnn()
    store.enableHnsw()
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 320 && col("vec_id") < 340)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val keys = Seq("graft.ann.filtered", "graft.query.exact")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k,
        efSearch = store.count().toInt,
        where = Some(col("_id_") < "00000300"))
      finally {
        store.disableHnsw() // shared cached store: don't outrank later entries
        keys.foreach { key =>
          prev(key) match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        }
      }
    require(store.lastQueryStrategy.contains("hnsw-filtered"),
      s"facade routed ${store.lastQueryStrategy} instead of hnsw-filtered")
    emitVdbTopk(spark, queries, hits)
  }

  /** Oracled facade deny-polarity entry (q90, round 17): an
    * ANTI-selective filter whose match set overflows a small forced
    * `graft.ann.filtered.max` while its complement fits — the
    * membership resolution broadcasts the complement as a DENY set
    * (polarity telemetry asserted), and at covering probes the result
    * is exact, so the filtered top-k oracle hash-matches. Closes
    * VERDICT r16 missing #3a: deny was engine-spec-only; now the
    * driver machine-checks it per round like allow (q86) and bloom
    * (q87).
    */
  def vdbAnnFilteredDeny(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit()
    store.enableAnn(16)
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 340 && col("vec_id") < 360)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val keys = Seq("graft.ann.filtered", "graft.query.exact",
      "graft.ann.filtered.max")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    // 480 of 500 rows match; the 20-id complement fits the cap
    spark.conf.set("graft.ann.filtered.max", "100")
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k, nProbe = 16,
        where = Some(col("_id_") >= "00000020"))
      finally keys.foreach { key =>
        prev(key) match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered") &&
        !store.lastQueryStrategy.exists(_.contains("bloom")),
      s"facade routed ${store.lastQueryStrategy} instead of ann-filtered")
    require(store.lastFilterPolarity == "deny",
      s"membership resolved as '${store.lastFilterPolarity}', expected deny")
    emitVdbTopk(spark, queries, hits)
  }

  /** Shared driver for the auto-tier × IVF composition entries
    * (q91-q93, round 17 — VERDICT r16 next #7): force the measured
    * memory budget via `graft.auto.mem.bytes` so [[core.VdbStore.enableAuto]]
    * lands on a specific rung, enable the IVF accelerator on top, and
    * prove the FACADE dispatch end-to-end — the chosen compression
    * tier must compose (strategy ann+q8 / ann+pq / ann+bit, asserted)
    * and be exact under nProbe = nList + covering overfetch, so the
    * unit-normalized top-k oracle hash-matches. This oracles the
    * ladder's dispatch the way q84/q85 oracled pq/bit.
    */
  private def vdbAutoTopk(spark: SparkSession, dir: String,
      lo: Long, hi: Long, expectTier: String,
      expectStrategy: String, overfetchKey: String): DataFrame = {
    val store = vdbStoreFor(spark, dir)
    store.disableAnn()
    // the forced budget derives from the STORE'S measured size, so the
    // entry lands on the intended rung at every SF (the sf0.01 table
    // has 500 embeddings, sf0.1 has 2000 — a fixed byte budget picked
    // different rungs per SF, caught by the r17 bench pass). With
    // headroom 0.5, budget = memBytes/2:
    //   q8:  budget = rows*dim       (int8 resident, fp32 4x over)
    //   pq:  budget = rows*dim/2     (int8 spills, m-byte codes fit)
    //   bit: budget = rows*m/2       (even PQ codes spill)
    val rows = store.count()
    val m = core.PqStore.autoM(store.dim).toLong
    val memBytes = expectTier match {
      case "q8" => 2L * rows * store.dim
      case "pq" => rows * store.dim
      case _ => rows * m
    }
    val prevMem = spark.conf.getOption("graft.auto.mem.bytes")
    spark.conf.set("graft.auto.mem.bytes", memBytes.toString)
    try {
      val tier = store.enableAuto()
      require(tier == expectTier,
        s"auto tier picked '$tier' at $memBytes budget bytes " +
          s"($rows rows x ${store.dim} dims), expected '$expectTier'")
    } finally prevMem match {
      case Some(v) => spark.conf.set("graft.auto.mem.bytes", v)
      case None => spark.conf.unset("graft.auto.mem.bytes")
    }
    vdbComposedTopk(spark, dir, lo, hi, expectStrategy,
      st => st.enableAnn(16), overfetchKey)
  }

  def vdbAutoQ8(spark: SparkSession, dir: String): DataFrame =
    vdbAutoTopk(spark, dir, 360L, 380L,
      expectTier = "q8", expectStrategy = "ann+q8", "graft.q8.overfetch")

  def vdbAutoPq(spark: SparkSession, dir: String): DataFrame =
    vdbAutoTopk(spark, dir, 380L, 400L,
      expectTier = "pq", expectStrategy = "ann+pq", "graft.pq.overfetch")

  def vdbAutoBit(spark: SparkSession, dir: String): DataFrame =
    vdbAutoTopk(spark, dir, 400L, 420L,
      expectTier = "bit", expectStrategy = "ann+bit", "graft.bit.overfetch")

  /** Oracled bulk filtered-ANN entry (q94, round 17): the
    * Dataset-query twin [[operators.IvfIndex.searchPackedAllowed]] —
    * a query TABLE (not a driver batch) with a membership filter
    * rides the cached bucket pack instead of falling back to the
    * exact filtered repack (VERDICT r16 missing #2). At covering
    * probes the flat-pack member scan IS the exact filtered scan, so
    * the raw-cosine filtered top-k oracle hash-matches; partial-probe
    * adaptive parity with the driver-batch twin is spec-pinned in
    * IvfIndexSpec.
    */
  def annIvfFilteredDs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 420 && col("vec_id") < 440)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val memberIds = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id")).as[Long].collect()
    idx.searchPackedAllowed[Long](queries, k = 10,
        core.SetMember(memberIds), deny = false,
        nProbe = idx.nList, normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled bulk filtered IVF-SQ8 entry (q95, round 17): the int8
    * composition of the Dataset-query filtered twin
    * ([[operators.IvfIndex.searchPackedQ8Allowed]] — fused
    * membership-filtered int8 candidate scan + co-located fp32
    * rescore). At covering probes + covering overfetch it is the
    * exact filtered scan, so the raw-cosine filtered top-k oracle
    * hash-matches; bit-parity with the fp32 bulk twin and the
    * driver-batch q8 twin is spec-pinned in IvfIndexSpec.
    */
  def annIvfQ8FilteredDs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 440 && col("vec_id") < 460)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val idx = operators.IvfIndex.cached(s"$dir/embeddings#16")(
      operators.IvfIndex.build(emb, "vec_id", "embedding", nList = 16,
        normalized = false))
    val memberIds = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id")).as[Long].collect()
    val nAll = emb.count()
    idx.searchPackedQ8Allowed[Long](queries, k = 10,
        core.SetMember(memberIds), deny = false,
        nProbe = idx.nList, normalized = false,
        overfetch = ((nAll / 10) + 1).toInt)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Oracled bulk-facade entry (q96, round 17): `VdbStore.queryDF` —
    * the Dataset-query twin of the reference's `query()` contract —
    * dispatching a where-restricted query TABLE through the
    * filtered-ANN rung at covering probes (strategy asserted), with
    * the query vectors never collected to the driver. The same
    * unit-normalized filtered top-k oracle as q86 hash-matches, plus
    * the joined-meta output shape is exercised end-to-end.
    */
  def vdbQueryDfFiltered(spark: SparkSession, dir: String): DataFrame = {
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit()
    store.disableHnsw()
    store.enableAnn(16)
    val qdf = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 460 && col("vec_id") < 480)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val keys = Seq("graft.ann.filtered", "graft.query.exact")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    val hits =
      try store.queryDF(qdf, "qid", "qvec", topK = 10, nProbe = 16,
          where = Some(col("_id_") < "00000300"))
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("_id_").cast("long").as("vec_id"),
          round(col("score"), 6).as("score"))
        // materialize under the conf overrides (queryDF is lazy)
        .localCheckpoint(true)
      finally keys.foreach { key =>
        prev(key) match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered"),
      s"bulk facade routed ${store.lastQueryStrategy} instead of ann-filtered")
    hits
  }

  /** Oracled bulk-facade bloom entry (q97, round 18 — VERDICT r17 next
    * #1, the last scale cliff): with both exact id sets forced over a
    * tiny `graft.ann.filtered.max`, a where-restricted `queryDF`
    * routes through the Bloom broadcast (strategy "ann-filtered+bloom"
    * — asserted; previously the bulk facade fell back to the per-call
    * exact repack here) at a deliberately brutal 30% false-positive
    * rate. The round-18 DISTRIBUTED verification semi-join + per-query
    * exact refill make the result exact at covering probes regardless
    * of what the Bloom admits (the `query()` eviction argument,
    * shape-independent — parity with the driver bloom path is
    * spec-pinned in VdbStoreSpec), so the q87 oracle shape
    * hash-matches through the query-table facade.
    */
  def vdbQueryDfBloom(spark: SparkSession, dir: String): DataFrame = {
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableBit()
    store.disableHnsw()
    store.enableAnn(16)
    val qdf = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 480 && col("vec_id") < 500)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val keys = Seq("graft.ann.filtered", "graft.query.exact",
      "graft.ann.filtered.max", "graft.ann.filtered.bloom.fpp")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.query.exact", "true")
    spark.conf.set("graft.ann.filtered.max", "2")
    spark.conf.set("graft.ann.filtered.bloom.fpp", "0.3")
    val hits =
      try store.queryDF(qdf, "qid", "qvec", topK = 10, nProbe = 16,
          where = Some(col("_id_") >= "00000100"))
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("_id_").cast("long").as("vec_id"),
          round(col("score"), 6).as("score"))
        .localCheckpoint(true)
      finally keys.foreach { key =>
        prev(key) match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    require(store.lastQueryStrategy.contains("ann-filtered+bloom"),
      s"bulk facade routed ${store.lastQueryStrategy} instead of ann-filtered+bloom")
    require(store.lastFilterPolarity == "bloom",
      s"membership resolved as '${store.lastFilterPolarity}', expected bloom")
    hits
  }

  /** Shared driver for the bulk-facade FLAT compressed-tier entries
    * (q98-q100, round 18 — VERDICT r17 next #3): enable exactly one
    * flat tier (no IVF, no graph), run an unfiltered query TABLE
    * through `queryDF`, and assert the strategy telemetry reports the
    * tier itself ("q8"/"pq"/"bit", NOT the exact-scan fallback these
    * routes used to take). Covering overfetch makes each tier's
    * compressed scan keep every row as a candidate, so the fp32 double
    * rescore IS the exact result (the q55/q56 keep-all argument, bulk
    * PackedScan-style) and the plain unit top-k oracle hash-matches.
    */
  private def vdbQueryDfFlatTier(spark: SparkSession, dir: String,
      lo: Long, hi: Long, expectStrategy: String, overfetchKey: String,
      enable: core.VdbStore => Unit,
      disable: core.VdbStore => Unit): DataFrame = {
    val store = vdbStoreFor(spark, dir)
    store.disableAnn(); store.disableHnsw()
    store.disableQ8(); store.disablePq(); store.disableBit()
    enable(store)
    val qdf = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val covering = ((store.count() / 10) + 1).toString
    val prev = spark.conf.getOption(overfetchKey)
    spark.conf.set(overfetchKey, covering)
    val hits =
      try store.queryDF(qdf, "qid", "qvec", topK = 10)
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("_id_").cast("long").as("vec_id"),
          round(col("score"), 6).as("score"))
        .localCheckpoint(true)
      finally {
        disable(store)
        prev match {
          case Some(v) => spark.conf.set(overfetchKey, v)
          case None => spark.conf.unset(overfetchKey)
        }
      }
    require(store.lastQueryStrategy.contains(expectStrategy),
      s"bulk facade routed ${store.lastQueryStrategy} instead of $expectStrategy")
    hits
  }

  def vdbQueryDfQ8(spark: SparkSession, dir: String): DataFrame =
    vdbQueryDfFlatTier(spark, dir, 0L, 20L, "q8", "graft.q8.overfetch",
      _.enableQ8(), _.disableQ8())

  def vdbQueryDfPq(spark: SparkSession, dir: String): DataFrame =
    vdbQueryDfFlatTier(spark, dir, 20L, 40L, "pq", "graft.pq.overfetch",
      _.enablePq(), _.disablePq())

  def vdbQueryDfBit(spark: SparkSession, dir: String): DataFrame =
    vdbQueryDfFlatTier(spark, dir, 40L, 60L, "bit", "graft.bit.overfetch",
      _.enableBit(), _.disableBit())

  /** Oracled bulk-facade IVF+bit entry (q101, round 18): `enableAnn` +
    * `enableBit` through `queryDF` now serves the composed bulk engine
    * ([[operators.IvfIndex.searchPackedBit]] — Hamming candidate scan
    * over the sketch bucket slabs, fused fp32 rescore from the
    * co-located float blocks; strategy "ann+bit" asserted, previously
    * the fp32 probed-scan fallback). Exact under nProbe = nList +
    * covering `graft.bit.overfetch` (the q85 covering argument,
    * per-bucket), so the unit top-k oracle hash-matches.
    */
  def vdbQueryDfAnnBit(spark: SparkSession, dir: String): DataFrame = {
    val store = vdbStoreFor(spark, dir)
    store.disableQ8(); store.disablePq(); store.disableHnsw()
    store.enableAnn(16)
    store.enableBit()
    val qdf = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 60 && col("vec_id") < 80)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val covering = ((store.count() / 10) + 1).toString
    val prev = spark.conf.getOption("graft.bit.overfetch")
    spark.conf.set("graft.bit.overfetch", covering)
    val hits =
      try store.queryDF(qdf, "qid", "qvec", topK = 10, nProbe = 16)
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("_id_").cast("long").as("vec_id"),
          round(col("score"), 6).as("score"))
        .localCheckpoint(true)
      finally {
        store.disableBit()
        prev match {
          case Some(v) => spark.conf.set("graft.bit.overfetch", v)
          case None => spark.conf.unset("graft.bit.overfetch")
        }
      }
    require(store.lastQueryStrategy.contains("ann+bit"),
      s"bulk facade routed ${store.lastQueryStrategy} instead of ann+bit")
    hits
  }

  /** Oracled facade filtered-graph+int8 entry (q102, round 18 —
    * VERDICT r17 missing #3): `enableHnsw` + `enableQ8` +
    * `graft.ann.filtered` routes a where-restricted `query()` through
    * [[operators.HnswStore.searchMergedMemberQ8]] (strategy
    * "hnsw-filtered+q8" — asserted): the per-shard beam walks the
    * INT8-quantized unit slabs and the `k x graft.q8.overfetch`
    * accepted survivors rescore in fp32 double. At a store-covering
    * beam the quantized MEMBER SCAN serves (keeping the int8 machinery
    * in the oracle loop), and covering overfetch makes every member
    * row a candidate — exact, so the q89 filtered oracle shape
    * hash-matches. Partial-beam behavior (int8 beam widening to the
    * candidate cut, component-exhaustion snap) is spec-pinned in
    * HnswStoreSpec — not SQL-oracleable.
    */
  def vdbHnswQ8Filtered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = vdbStoreFor(spark, dir)
    store.disablePq(); store.disableBit(); store.disableAnn()
    store.enableHnsw()
    store.enableQ8()
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") >= 80 && col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = 10
    val covering = ((store.count() / k) + 1).toString
    val keys = Seq("graft.ann.filtered", "graft.q8.overfetch")
    val prev = keys.map(key => key -> spark.conf.getOption(key)).toMap
    spark.conf.set("graft.ann.filtered", "true")
    spark.conf.set("graft.q8.overfetch", covering)
    val hits =
      try store.query(queries.map(_._2).toSeq, topK = k,
        efSearch = store.count().toInt,
        where = Some(col("_id_") < "00000300"))
      finally {
        store.disableHnsw(); store.disableQ8()
        keys.foreach { key =>
          prev(key) match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        }
      }
    require(store.lastQueryStrategy.contains("hnsw-filtered+q8"),
      s"facade routed ${store.lastQueryStrategy} instead of hnsw-filtered+q8")
    emitVdbTopk(spark, queries, hits)
  }

  // ---- binary-sketch store entry (q82) ----

  /** Per-dataset binary-sketch store, built once and cached: seeded
    * random-hyperplane sign bits, NO training at all — the
    * distribution-free tier below PQ (32 B/row at 256 bits vs the
    * 64-d embeddings' 256 float bytes, 8x; at 1024-d it is 128x).
    */
  private val bitCache =
    new core.SessionLru[String, (SparkSession, core.BitStore[Long])](
      4, _._1, _._2.unpersist(false, cascadeSource = true))
  private def bitStore(spark: SparkSession, dir: String): core.BitStore[Long] = {
    import spark.implicits._
    bitCache.getOrBuild(s"$dir/embeddings#bit") {
      val ds = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val bit = core.BitStore.fromBlockStore(
        core.BlockStore.fromDataset(ds, normalize = false), bits = 256).persist()
      bit.materialize()
      (spark, bit)
    }._2
  }

  /** Oracled exact-parity entry for the binary-sketch machinery (the
    * q79 pattern): overfetch-all keeps every row through the Hamming
    * scan, so the shared full-precision rescore IS the exact top-k —
    * hash-matched by the same DuckDB top-k oracle as q01. Proves
    * sketch -> Hamming scan -> candidate -> rescore end-to-end with a
    * green CORRECTNESS row.
    */
  def bitRescoreExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 120 && col("vec_id") < 140)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    bitStore(spark, dir).rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Gap-based sessionization over events (pipeline op): 30-minute
    * inactivity gap per user, per-session rollup. See
    * [[operators.Sessionize]] for semantics and the 100 TB shape.
    * Sessionizes on MICROSECOND timestamps (via [[tsMicros]]): DuckDB's
    * parquet reader sees µs integers for both historical testdata
    * encodings, so both engines agree — the operator itself is
    * unit-agnostic.
    */
  def sessionizeEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    operators.Sessionize.sessionStats(
      ev.withColumn("ts_us", tsMicros(ev, "ts")),
      "user_id", "ts_us", "event_id", "value",
      gap = 30L * 60 * 1000 * 1000)
  }

  /** Training-sequence packing bookkeeping (pipeline op): which documents
    * start in which fixed-length training sequence, per shard. See
    * [[operators.TextChunk.packSequences]].
    */
  def seqPack(spark: SparkSession, dir: String): DataFrame =
    operators.TextChunk.packSequences(
      t(spark, dir, "documents"), "doc_id", "text", seqLen = 2048, nShards = 8)

  /** Deterministic bucketed corpus shuffle (pipeline op): the
    * engine-reproducible training-order permutation. See
    * [[operators.CorpusClean.corpusShuffle]].
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.corpusShuffle(
      t(spark, dir, "documents"), "doc_id", nBuckets = 64)

  /** Corpus-mix rollup report (pipeline op): docs + token mass by
    * (lang, source) with ROLLUP subtotals — the mixture dashboard a
    * data-curation run reads before setting sampling rates (q38/q57
    * consume exactly these margins). Grouping-sets surface: Spark
    * plans one Expand + one partial-aggregated groupBy — still a
    * single shuffle at 100 TB. Subtotal rows mark the rolled-up level
    * with '(all)' so the hash compare has no NULL-ordering ambiguity.
    */
  def mixRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .select(coalesce(col("lang"), lit("(all)")).as("lang"),
        coalesce(col("source"), lit("(all)")).as("source"),
        col("n_docs"), col("sum_tokens"))

  /** Backward as-of join (pipeline op): click->purchase attribution —
    * each purchase event joined to the same user's most recent click at
    * or before the purchase time. The operator Spark lacks natively
    * (a time-inequality join plans as BroadcastNestedLoop); see
    * [[operators.AsOfJoin]] for the union + carry-forward shape (one
    * Exchange + one Sort, no candidate explosion). Deterministic ties:
    * max click time, then max click id — mirrored by the oracle's
    * `ORDER BY cus DESC, click_id DESC ... rn = 1`.
    */
  def asofAttrib(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val e = ev.withColumn("us", tsMicros(ev, "ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("us").as("click_us"))
    operators.AsOfJoin.backward(purchases, clicks,
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "us", rightTime = "click_us",
        leftCols = Seq("event_id", "user_id", "us"),
        rightPayload = Seq("click_id", "click_us"), tieBreak = "click_id")
      .select(col("event_id"), col("user_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("us") - col("click_us"), lit(-1L)).as("gap_us"))
  }

  /** Bucketed range join (pipeline op): pairs of events by the same
    * user within one hour of each other, each emitted exactly once.
    * See [[operators.RangeJoin]] — the epsilon-join blocking that turns
    * Spark's nested-loop inequality join into a shuffle equi-join on
    * (key, time-bucket).
    */
  def rangePairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    operators.RangeJoin.selfWithin(
        ev.withColumn("us", tsMicros(ev, "ts")),
        keyCol = "user_id", idCol = "event_id", tsCol = "us",
        delta = 3600L * 1000 * 1000)
      .select(col("user_id"), col("event_id_a"), col("event_id_b"),
        col("gap").as("gap_us"))
  }

  /** Temperature-based corpus mixing (pipeline op): per-(lang, source)
    * sampling weights proportional to tokens^0.5 (the standard
    * "temperature" reweighting that up-samples small domains), and the
    * per-domain sampling rate that spends a budget of half the total
    * token mass. One groupBy + a 1-row broadcast of the normalizers —
    * the same two-shuffle shape as q42/q58; q38's stratified sampler
    * and q57's shuffle consume exactly these rates at scale. All float
    * math in double with sqrt (not pow) so both engines bit-agree
    * before the round(6).
    */
  /** Shared q62/q65 rate table: per-(lang, source) domain stats plus
    * the rounded temperature weight and budgeted sampling rate.
    */
  private def temperatureRates(spark: SparkSession, dir: String): DataFrame = {
    val g = t(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    val tot = g.agg(sum(sqrt(col("tokens").cast("double"))).as("z"),
      sum(col("tokens")).cast("double").as("total"))
    val w = sqrt(col("tokens").cast("double")) / col("z")
    g.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
        round(w, 6).as("weight"),
        round(least(lit(1.0),
          lit(0.5) * col("total") * w / col("tokens").cast("double")), 6)
          .as("sample_rate"))
  }

  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureRates(spark, dir)

  /** Temperature sampling end-to-end (pipeline op, q65): the q62 rates
    * joined back onto the corpus (broadcast — the rate table is one
    * row per domain) and applied with the deterministic hash sampler
    * ([[operators.CorpusClean.sampleByRate]], q38's convention with a
    * data-derived per-row rate); per-domain kept-mass report. The
    * rates are ROUNDED to 6 dp before thresholding on both engines, so
    * the keep set is exactly reproducible.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val rates = temperatureRates(spark, dir)
      .select(col("lang"), col("source"), col("sample_rate"))
    val joined = d.join(broadcast(rates), Seq("lang", "source"))
    operators.CorpusClean.sampleByRate(joined, "doc_id", "sample_rate")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"),
        min(col("doc_id")).as("min_id"))
  }

  private val hybridTerms = Seq("dup", "vector", "query")

  /** BM25 keyword retrieval (pipeline op, q63): Okapi BM25 with the
    * Lucene idf over the whitespace token convention, top 20 docs for
    * a 3-term query mixing one rare discriminator ("dup") with two
    * common terms. See [[operators.Lexical.bm25]] — tf shuffle pruned
    * to query-term tokens, df + normalizer broadcast, TakeOrdered
    * top-k (never a global sort).
    */
  /** Shared q63/q64 ranking idiom: TakeOrdered top-n by (score desc,
    * doc_id), then a 1-based rank over the same order (the window runs
    * on n rows, after the limit).
    */
  private def rankedTop(scored: DataFrame, n: Int): DataFrame =
    scored.orderBy(desc("score"), col("doc_id")).limit(n)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("score"), col("doc_id"))))

  def bm25TopDocs(spark: SparkSession, dir: String): DataFrame =
    rankedTop(operators.Lexical.bm25(
        t(spark, dir, "documents"), "doc_id", "text", hybridTerms), 20)
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        round(col("score"), 6).as("score"))

  /** Hybrid search via reciprocal-rank fusion (pipeline op, q64): the
    * BM25 ranking (q63's scorer, top 100) fused with the exact cosine
    * ranking of a query embedding over the aligned embeddings table
    * (top 100), rrf = sum of 1/(60+rank); top 20 by fused score. The
    * production vector-store pattern the embedding-only reference
    * lacks. Rankings are deterministic (score desc, id) so the fusion
    * is exactly SQL-reproducible.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val lexTop = rankedTop(operators.Lexical.bm25(
        t(spark, dir, "documents"), "doc_id", "text", hybridTerms), 100)
      .select(col("doc_id"), col("rank"))
    val vecTop = topkGemm(spark, dir, col("vec_id") === 7, None, k = 100)
      .select(col("vec_id").as("doc_id"), col("rank"))
    operators.Lexical.rrfFuse(Seq(lexTop, vecTop), "doc_id", "rank")
      .orderBy(desc("rrf_score"), col("doc_id")).limit(20)
      .select(col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"),
        col("n_lists"))
  }

  /** MMR diversified retrieval (q66): fetch 20 exact-cosine candidates
    * per query, greedily re-rank to 5 with λ = 0.75 (λ and 1−λ both
    * exact binary doubles, so both engines score identically). See
    * [[operators.Mmr]]; the DuckDB oracle unrolls the 5 greedy steps
    * as chained CTEs over the same candidate and pairwise-sim tables.
    */
  def mmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") >= 30 && col("vec_id") < 40)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cand = CosineTopK.gemm(emb, "vec_id", "embedding", queries, 20,
        None, normalized = false, exact = true)
      .join(emb.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
    operators.Mmr.diversify(cand, "qid", "id", "score", "embedding",
        k = 5, lambda = 0.75)
      .toDF("qid", "rank", "vec_id", "mmr")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("mmr"), 6).as("mmr"))
  }

  /** Exact percentile profile (pipeline op, q67): per-source doc-length
    * p50/p90/p99 plus token-count mean — the distribution dashboard a
    * curation run reads before setting chunk/packing parameters. Exact
    * interpolated percentiles (`percentile`, one sort-based aggregate
    * per group — ~docs-per-source rows per task, no global sort), NOT
    * approx_percentile: at 100 TB the exact form is still one shuffle
    * of (source, n_chars) pairs, and only the exact form is
    * engine-reproducible (DuckDB `quantile_cont` has the same
    * (n-1)p interpolation). Floats rounded to 6 dp as usual.
    */
  def percentileProfile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"), col("n_chars"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
        round(expr("percentile(n_chars, 0.9)"), 6).as("p90_chars"),
        round(expr("percentile(n_chars, 0.99)"), 6).as("p99_chars"),
        round(avg(col("n_tokens")), 6).as("mean_tokens"))

  /** Cross-document repeated-span removal (pipeline op, q68): every
    * corpus-duplicated 5-token span keeps its first occurrence and is
    * cut everywhere else — suffix-dedup-style span-level dedup (vs
    * q12's whole-doc and q36's line-level rules). See
    * [[operators.Dedup.spanDedup]]. Output hashes the cleaned text so
    * the oracle checks the REBUILT document byte-for-byte.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.spanDedup(t(spark, dir, "documents"), "doc_id", "text", n = 5)

  /** Rounded-to-6dp q14 quality score — the shared scalar for the
    * selection ops below. Rounded BEFORE it is used as a sort key so
    * both engines agree on ties exactly (the same reason q14 rounds
    * its output).
    */
  private def qualityExpr: Column = round(
    least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.5 +
      (expr("size(filter(split(trim(text), '\\\\s+'), x -> x IN ('the','a','and','of','to')))").cast("double") /
        size(split(trim(col("text")), "\\s+")).cast("double")) * 0.5,
    6)

  /** Token-budget curation (pipeline op, q69): keep the
    * highest-quality documents until 60% of the corpus' tokens are
    * spent — the "select the best T tokens for the next pretraining
    * run" step, executed by [[operators.Select.budgetSelectDesc]]'s
    * histogram-threshold pass instead of the global-sort window the
    * oracle uses. Budget derives from the corpus itself (0.6 x total
    * tokens), so the entry is scale-free.
    */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = t(spark, dir, "documents")
      .select(col("doc_id"), qualityExpr.as("q"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    // data-derived budget: the histogram pass supplies the corpus
    // token total, so this is exactly two corpus scans
    operators.Select.budgetSelectDescFraction(
      scored, "q", "doc_id", "n_tokens", frac = 0.6)
  }

  /** Per-language quota balancing (pipeline op, q70): exactly 40 docs
    * per language, picked by deterministic md5 rank — the corpus
    * language-balancing step. [[operators.Select.groupQuota]] runs the
    * per-group histogram threshold, so a 90%-of-corpus language never
    * funnels through one window task.
    */
  def groupQuotaSample(spark: SparkSession, dir: String): DataFrame =
    operators.Select.groupQuota(
        t(spark, dir, "documents").select(col("lang"), col("doc_id")),
        "lang", "doc_id", quota = 40L)

  /** Exactly-N deterministic global sample (pipeline op, q72):
    * `ORDER BY md5(id), id LIMIT 137` semantics without the global
    * sort ([[operators.Select.exactSampleN]]).
    */
  def exactSample(spark: SparkSession, dir: String): DataFrame =
    operators.Select.exactSampleN(
      t(spark, dir, "documents").select(col("doc_id"), col("source")),
      "doc_id", n = 137L)

  /** Bigram PMI phrase table (pipeline op, q71):
    * [[operators.Lexical.pmiBigrams]] over the corpus, min count 5.
    */
  def pmiTable(spark: SparkSession, dir: String): DataFrame =
    operators.Lexical.pmiBigrams(t(spark, dir, "documents"), "text",
      minCount = 5L)

  /** Bigram-LM cross-entropy with unigram backoff (pipeline op, q74):
    * [[operators.CorpusClean.bigramCrossEntropy]] — the next model up
    * from q52 on the perplexity-filter axis.
    */
  def bigramCrossEnt(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusClean.bigramCrossEntropy(
      t(spark, dir, "documents"), "doc_id", "text")

  /** Adversarial rows unioned into q73's corpus (round 16, VERDICT r15
    * task 3): /root/testdata has no null doc ids or empty texts, which
    * is exactly why the r14 df/posting drift survived a full round —
    * so the oracle corpus carries them itself, identically on both
    * sides. The sentinels pin the operator's null contract (null-id
    * rows contribute NEITHER df nor postings — a df-inflation
    * regression resurfaces zznullbait at df 3): zzsentinel appears in
    * 3 real + 1 null doc (df must be 3), zznullbait in 2 real + 2 null
    * (df 2 → filtered), zzonlynull in null docs only (df 0 → absent),
    * and 3 real empty/whitespace-only docs make the empty-string term
    * itself pass minDf (split('') yields [''] on both engines).
    */
  private val q73ExtraRows: Seq[(Option[Long], String)] = Seq(
    (Some(9000001L), "zzsentinel alpha"),
    (Some(9000002L), "zzsentinel beta"),
    (Some(9000003L), "zzsentinel gamma"),
    (Some(9000004L), ""),
    (Some(9000005L), ""),
    (Some(9000006L), "   "),
    (Some(9000007L), "zznullbait"),
    (Some(9000008L), "zznullbait"),
    (None, "zznullbait zzonlynull"),
    (None, "zznullbait zzonlynull"),
    (None, "zzonlynull zzsentinel"),
    (None, ""))

  /** Inverted-index posting lists (retrieval op, q73):
    * [[operators.Lexical.invertedIndex]] — df >= 3, first 8 postings
    * per term — over the null-id/empty-text-augmented corpus.
    */
  def invertedIndexPostings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val extras = q73ExtraRows.toDF("doc_id", "text")
    operators.Lexical.invertedIndex(docs.unionByName(extras),
      "doc_id", "text", maxPostings = 8, minDf = 3L)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_topk_batch" -> (topkBatch _),
    "q02_topk_threshold" -> (topkThreshold _),
    "q03_topk_where_eq" -> (topkWhereEq _),
    "q04_topk_where_in" -> (topkWhereIn _),
    "q05_topk_ids" -> (topkIds _),
    "q06_point_lookup" -> (pointLookup _),
    "q07_count_by_label" -> (countByLabel _),
    "q08_upsert_merge" -> (upsertMerge _),
    "q09_upsert_report" -> (upsertReport _),
    "q10_delete_anti" -> (deleteAntiJoin _),
    "q11_emb_near_dup" -> (embNearDup _),
    "q12_dedup_exact" -> (dedupExact _),
    "q13_text_tokens" -> (textTokens _),
    "q14_text_quality" -> (textQuality _),
    "q15_text_lang_id" -> (textLangId _),
    "q16_text_fingerprint" -> (textFingerprint _),
    "q20_dedup_fingerprint" -> (dedupFingerprint _),
    "q21_ngram_jaccard" -> (ngramJaccard _),
    "q22_minhash_lsh" -> (minhashLsh _),
    "q23_simhash" -> (simhashSig _),
    "q24_event_windows" -> (eventWindows _),
    "q25_multimodal_features" -> (multimodalFeatures _),
    "q26_ann_ivf" -> (annIvf _),
    "q17_agg_pricing" -> (aggPricing _),
    "q18_top_customers" -> (topCustomers _),
    "q19_latest_event" -> (latestEvent _),
    "q27_tokens_bpeish" -> (tokensBpeish _),
    "q28_simhash_neardup" -> (simhashNearDup _),
    "q29_winnow_fp" -> (winnowFp _),
    "q30_langid_chargram" -> (langIdChargram _),
    "q31_text_chunks" -> (textChunks _),
    "q32_topk_distributed" -> (topkDistributed _),
    "q33_text_chunks_chars" -> (textChunksChars _),
    "q34_dedup_clusters" -> (dedupClusters _),
    "q35_decontaminate" -> (decontaminate _),
    "q36_boilerplate_grams" -> (boilerplateGrams _),
    "q37_repetition" -> (repetitionSignals _),
    "q38_stratified_sample" -> (stratifiedSample _),
    "q39_hygiene_pipeline" -> (hygienePipeline _),
    "q40_idf_table" -> (idfTable _),
    "q41_tfidf_top_terms" -> (tfidfTopTerms _),
    "q42_corpus_profile" -> (corpusProfile _),
    "q43_doc_embedding" -> (docEmbedding _),
    "q44_edit_distance" -> (editDistancePairs _),
    "q45_merge_clusters" -> (mergeClusters _),
    "q46_ann_ivf_ds" -> (annIvfDs _),
    "q47_ann_ivf_exact" -> (annIvfExact _),
    "q59_ann_ivf_q8" -> (annIvfQ8 _),
    "q48_ann_ivf_packed" -> (annIvfPacked _),
    "q49_ann_ivf_merged" -> (annIvfMerged _),
    "q50_pii_redact" -> (piiRedact _),
    "q51_domain_hist" -> (domainHist _),
    "q52_lm_crossent" -> (lmCrossEntropy _),
    "q53_sessionize" -> (sessionizeEvents _),
    "q54_seq_pack" -> (seqPack _),
    "q55_q8_ann" -> (q8Ann _),
    "q56_q8_rescore" -> (q8RescoreExact _),
    "q57_corpus_shuffle" -> (corpusShuffle _),
    "q58_mix_rollup" -> (mixRollup _),
    "q60_asof_join" -> (asofAttrib _),
    "q61_range_join" -> (rangePairs _),
    "q62_temperature_mix" -> (temperatureMix _),
    "q63_bm25" -> (bm25TopDocs _),
    "q64_hybrid_rrf" -> (hybridRrf _),
    "q65_temperature_sample" -> (temperatureSample _),
    "q66_mmr_diversify" -> (mmrDiversify _),
    "q67_percentiles" -> (percentileProfile _),
    "q68_span_dedup" -> (spanDedup _),
    "q69_token_budget" -> (tokenBudgetSelect _),
    "q70_group_quota" -> (groupQuotaSample _),
    "q71_pmi_bigrams" -> (pmiTable _),
    "q72_exact_sample" -> (exactSample _),
    "q73_inverted_index" -> (invertedIndexPostings _),
    "q74_bigram_crossent" -> (bigramCrossEnt _),
    "q75_hnsw_shard_exact" -> (hnswShardExact _),
    "q76_hnsw_shard" -> (hnswShard _),
    "q77_hnsw_shard_packed" -> (hnswShardPacked _),
    "q78_pq_ann" -> (pqAnn _),
    "q79_pq_rescore" -> (pqRescoreExact _),
    "q80_ann_ivf_pq" -> (annIvfPq _),
    "q81_ann_ivf_pq_ds" -> (annIvfPqDs _),
    "q82_bit_rescore" -> (bitRescoreExact _),
    "q83_ann_ivf_bit" -> (annIvfBit _),
    "q84_vdb_ann_pq" -> (vdbAnnPq _),
    "q85_vdb_ann_bit" -> (vdbAnnBit _),
    "q86_vdb_ann_filtered" -> (vdbAnnFiltered _),
    "q87_vdb_ann_filtered_bloom" -> (vdbAnnFilteredBloom _),
    "q88_vdb_ann_q8_filtered" -> (vdbAnnQ8Filtered _),
    "q89_vdb_hnsw_filtered" -> (vdbHnswFiltered _),
    "q90_vdb_ann_filtered_deny" -> (vdbAnnFilteredDeny _),
    "q91_vdb_auto_q8" -> (vdbAutoQ8 _),
    "q92_vdb_auto_pq" -> (vdbAutoPq _),
    "q93_vdb_auto_bit" -> (vdbAutoBit _),
    "q94_ann_ivf_filtered_ds" -> (annIvfFilteredDs _),
    "q95_ann_ivf_q8_filtered_ds" -> (annIvfQ8FilteredDs _),
    "q96_vdb_querydf_filtered" -> (vdbQueryDfFiltered _),
    "q97_vdb_querydf_bloom" -> (vdbQueryDfBloom _),
    "q98_vdb_querydf_q8" -> (vdbQueryDfQ8 _),
    "q99_vdb_querydf_pq" -> (vdbQueryDfPq _),
    "q100_vdb_querydf_bit" -> (vdbQueryDfBit _),
    "q101_vdb_querydf_ann_bit" -> (vdbQueryDfAnnBit _),
    "q102_vdb_hnsw_q8_filtered" -> (vdbHnswQ8Filtered _),
  )
}

/** DuckDB oracle SQL for every entry in [[Queries.all]]. Table names are
  * bare (the driver exposes the parquet files as views with those names).
  */
object Oracles {

  /** Top-k oracle over the STORE's normalized vectors (q84/q85): the
    * facade L2-normalizes at write time (float32 components,
    * multiply-by-reciprocal — functions.NormalizeL2), so the oracle
    * reproduces that normalization in SQL before scoring. Verified
    * bit-identical to the Scala kernel on the full sf0.01 table
    * (sequential-double norm accumulation matches DuckDB's
    * list_dot_product; CAST(x * (1.0/sqrt(s)) AS FLOAT) matches
    * (x * inv).toFloat), so the double-accumulated unit dot — the
    * rescore tail's arithmetic — hashes identically after round(,6).
    */
  private def topkOracleUnit(qFilter: String, k: Int,
                             storeFilter: String = "true"): String =
    s"""WITH u AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x * (1.0/sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS FLOAT)) AS uvec
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, uvec AS qvec FROM u WHERE $qFilter),
       |s AS (SELECT q.qid, u.vec_id,
       |        list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(u.uvec AS DOUBLE[])) AS score
       |      FROM q CROSS JOIN u WHERE $storeFilter),
       |r AS (SELECT qid, vec_id, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 6) AS score FROM r WHERE rank <= $k""".stripMargin

  /** Oracle for the approximate-recall entries' checked artifact (round
    * 19): one row per query in the slice, exactly k hits, floor verdict
    * true. Honest scope (ADVICE r19): this verifies the artifact's
    * SHAPE, not the hit set — the recall computation runs IN the entry
    * against the in-engine exact twin (SQL over the source tables
    * cannot reproduce an approximate hit set, and the driver's
    * hash-equality compare means SQL also cannot check a data-dependent
    * measured recall value), and any floor violation throws inside the
    * entry before this shape can match. The constant-true column is the
    * strongest SQL-checkable encoding of "the in-entry assert passed";
    * the n_hits = k prediction additionally pins that the probed search
    * filled k on the fixture (a legitimate underfill would redden the
    * row — by design: underfilling these covering fixtures IS a
    * regression). CatalogSpec states the same scope.
    */
  private def recallArtifactOracle(qFilter: String, k: Int): String =
    s"""SELECT vec_id AS qid, CAST($k AS BIGINT) AS n_hits,
       |  TRUE AS recall_floor_met
       |FROM embeddings WHERE $qFilter""".stripMargin

  private def topkOracle(qFilter: String, storeFilter: String, k: Int,
                         threshold: Option[Double]): String = {
    val thr = threshold.map(t => s"AND score >= $t").getOrElse("")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE $qFilter),
       |s AS (SELECT q.qid, e.vec_id,
       |        list_cosine_similarity(CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
       |      FROM q CROSS JOIN (SELECT * FROM embeddings WHERE $storeFilter) e),
       |r AS (SELECT qid, vec_id, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s WHERE true $thr)
       |SELECT qid, rank, vec_id, round(score, 6) AS score FROM r WHERE rank <= $k""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q01_topk_batch" -> topkOracle("vec_id < 20", "true", 10, None),
    "q02_topk_threshold" -> topkOracle("vec_id >= 20 AND vec_id < 40", "true", 20, Some(0.2)),
    "q03_topk_where_eq" -> topkOracle("vec_id < 10", "label = 3", 5, None),
    "q04_topk_where_in" -> topkOracle("vec_id >= 10 AND vec_id < 20", "label IN (1,2,3)", 5, None),
    "q05_topk_ids" -> topkOracle("vec_id < 10", "vec_id % 7 = 0", 5, None),
    "q06_point_lookup" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS vec_norm
        |FROM embeddings WHERE vec_id IN (1,5,9,13,21,34)""".stripMargin,
    "q07_count_by_label" ->
      "SELECT label, count(*) AS n FROM embeddings GROUP BY label",
    "q08_upsert_merge" ->
      """SELECT vec_id, label + 100 AS label FROM embeddings WHERE vec_id < 100
        |UNION ALL
        |SELECT vec_id, label FROM embeddings WHERE vec_id >= 100""".stripMargin,
    "q09_upsert_report" ->
      """WITH batch AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id < 100
        |  UNION ALL
        |  SELECT vec_id + 1000000 FROM embeddings WHERE vec_id < 50)
        |SELECT 'update' AS kind, count(*) AS n FROM batch
        |  WHERE vec_id IN (SELECT vec_id FROM embeddings)
        |UNION ALL
        |SELECT 'insert' AS kind, count(*) AS n FROM batch
        |  WHERE vec_id NOT IN (SELECT vec_id FROM embeddings)""".stripMargin,
    "q10_delete_anti" ->
      """SELECT label, count(*) AS n FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM embeddings WHERE label = 5)
        |GROUP BY label""".stripMargin,
    "q11_emb_near_dup" ->
      """SELECT l.vec_id AS qid, e.vec_id,
        |  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS score
        |FROM (SELECT * FROM embeddings WHERE vec_id < 200) l
        |JOIN embeddings e ON l.vec_id < e.vec_id
        |WHERE list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) >= 0.38""".stripMargin,
    "q12_dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n FROM documents GROUP BY 1",
    "q13_text_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
        |  max(len(string_split_regex(trim(text), '\s+'))) AS max_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q14_text_quality" ->
      """SELECT doc_id,
        |  round(least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5 +
        |    (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                          x -> x IN ('the','a','and','of','to'))) AS DOUBLE) /
        |     CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) * 0.5,
        |  6) AS quality
        |FROM documents""".stripMargin,
    "q15_text_lang_id" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('the','a'))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('scan','join','merge'))) AS BIGINT) AS dsl_hits,
        |  CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('the','a')))
        |          > len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('scan','join','merge'))) THEN 'en'
        |       WHEN len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('scan','join','merge')))
        |          > len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('the','a'))) THEN 'dsl'
        |       ELSE 'und' END AS detected
        |FROM documents""".stripMargin,
    "q16_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(string_split_regex(trim(text), '\s+')[1:8], ' ')) AS fp
        |FROM documents""".stripMargin,
    "q20_dedup_fingerprint" ->
      """SELECT md5(array_to_string(string_split_regex(trim(text), '\s+')[1:4], ' ')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q21_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |fp0 AS (SELECT doc_id, md5(array_to_string(w[1:4], ' ')) AS fp FROM w),
        |fp AS (SELECT *, count(*) OVER (PARTITION BY fp) AS bn,
        |              min(doc_id) OVER (PARTITION BY fp) AS bmin
        |       FROM fp0),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM fp x JOIN fp y
        |           ON x.fp = y.fp AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM fp WHERE bn > 100 AND doc_id > bmin),
        |shl AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |        FROM w WHERE len(w) >= 3)
        |SELECT cand.a, cand.b,
        |  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
        |FROM cand JOIN shl sa ON sa.doc_id = cand.a JOIN shl sb ON sb.doc_id = cand.b""".stripMargin,
    "q22_minhash_lsh" ->
      s"""WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle FROM words),
        |ab AS (SELECT doc_id,
        |         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS a,
        |         CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS b FROM sh),
        |mh AS (SELECT doc_id, s.seed,
        |         min((a + s.seed * b) % ${operators.Dedup.MinhashPrime}) AS sig
        |       FROM ab CROSS JOIN (SELECT unnest(range(12)) AS seed) s
        |       GROUP BY doc_id, s.seed),
        |bands0 AS (SELECT doc_id, CAST(seed // 3 AS INTEGER) AS band,
        |             string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS bkey
        |           FROM mh GROUP BY doc_id, seed // 3),
        |bands AS (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bn,
        |                 min(doc_id) OVER (PARTITION BY band, bkey) AS bmin
        |          FROM bands0),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM bands x JOIN bands y
        |           ON x.band = y.band AND x.bkey = y.bkey
        |          AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM bands WHERE bn > 100 AND doc_id > bmin),
        |shl AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |        FROM words WHERE len(w) >= 3)
        |SELECT cand.a, cand.b,
        |  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
        |FROM cand JOIN shl sa ON sa.doc_id = cand.a JOIN shl sb ON sb.doc_id = cand.b
        |WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.5""".stripMargin,
    "q23_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |h AS (SELECT doc_id, md5(tok) AS h FROM toks),
        |votes AS (SELECT doc_id, j,
        |    sum(2 * (((strpos('0123456789abcdef', substr(h, 1 + CAST(j // 4 AS INT), 1)) - 1)
        |              >> CAST(3 - j % 4 AS INT)) % 2) - 1) AS s
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS j) jj
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
        |FROM votes GROUP BY doc_id""".stripMargin,
    "q24_event_windows" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q25_multimodal_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  32 + ascii(substr(md5(text), 1, 1)) AS width,
        |  32 + ascii(substr(md5(text), 2, 1)) AS height,
        |  1 + ascii(substr(md5(text), 3, 1)) % 8 AS n_frames
        |FROM documents""".stripMargin,
    "q17_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q18_top_customers" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS spend, count(*) AS n
        |FROM orders GROUP BY o_custkey
        |ORDER BY spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q19_latest_event" ->
      """SELECT user_id, event_type, value FROM (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q27_tokens_bpeish" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws
        |FROM documents""".stripMargin,
    "q28_simhash_neardup" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |h AS (SELECT doc_id, md5(tok) AS h FROM toks),
        |votes AS (SELECT doc_id, j,
        |    sum(2 * (((strpos('0123456789abcdef', substr(h, 1 + CAST(j // 4 AS INT), 1)) - 1)
        |              >> CAST(3 - j % 4 AS INT)) % 2) - 1) AS s
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS j) jj
        |  GROUP BY doc_id, j),
        |sig AS (SELECT doc_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
        |  FROM votes GROUP BY doc_id),
        |bands AS (SELECT doc_id, b, substr(sig, CAST(b * 16 + 1 AS INT), 16) AS chunk
        |          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
        |bc AS (SELECT *, count(*) OVER (PARTITION BY b, chunk) AS bn,
        |              min(doc_id) OVER (PARTITION BY b, chunk) AS bmin
        |       FROM bands),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM bc x JOIN bc y
        |           ON x.b = y.b AND x.chunk = y.chunk
        |          AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM bc WHERE bn > 100 AND doc_id > bmin)
        |SELECT cand.a, cand.b,
        |  CAST(len(list_filter(range(1, 65),
        |    i -> substr(sx.sig, CAST(i AS INT), 1) != substr(sy.sig, CAST(i AS INT), 1))) AS BIGINT) AS hamming
        |FROM cand JOIN sig sx ON sx.doc_id = cand.a JOIN sig sy ON sy.doc_id = cand.b
        |WHERE len(list_filter(range(1, 65),
        |    i -> substr(sx.sig, CAST(i AS INT), 1) != substr(sy.sig, CAST(i AS INT), 1))) <= 3""".stripMargin,
    "q29_winnow_fp" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(w) - 1),
        |        i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS h
        |      FROM w WHERE len(w) >= 6),
        |fp AS (SELECT doc_id, list_sort(list_distinct(list_transform(
        |         range(1, len(h) - 2), i -> list_min(h[i:i+3])))) AS fps
        |       FROM h)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |  md5(array_to_string(fps, '|')) AS fp_digest
        |FROM fp""".stripMargin,
    "q30_langid_chargram" ->
      """WITH g AS (SELECT doc_id,
        |    list_transform(range(1, greatest(len(lower(text)) - 1, 1)),
        |      i -> substr(lower(text), CAST(i AS INT), 3)) AS grams
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(grams, x -> x IN ('the','he ',' th','ing','nd ','and',' an','ed '))) AS BIGINT) AS en3,
        |  CAST(len(list_filter(grams, x -> x IN ('sca','can','joi','oin','mer','erg','rge','an '))) AS BIGINT) AS dsl3,
        |  CASE WHEN len(list_filter(grams, x -> x IN ('the','he ',' th','ing','nd ','and',' an','ed ')))
        |          > len(list_filter(grams, x -> x IN ('sca','can','joi','oin','mer','erg','rge','an '))) THEN 'en'
        |       WHEN len(list_filter(grams, x -> x IN ('sca','can','joi','oin','mer','erg','rge','an ')))
        |          > len(list_filter(grams, x -> x IN ('the','he ',' th','ing','nd ','and',' an','ed '))) THEN 'dsl'
        |       ELSE 'und' END AS detected
        |FROM g""".stripMargin,
    // chunkSize=32, overlap=8 -> stride=24; boundaries mirror
    // TextChunk.chunk exactly (1 + floor((n-overlap-1)/stride) chunks,
    // slice clipped at the document end; empty tokens dropped — Python
    // str.split() parity). chunk_text hashes to md5 so the compare
    // stays row-hashable.
    "q31_text_chunks" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n,
        |        CASE WHEN len(w) <= 8 THEN 1
        |             ELSE 1 + (len(w) - 8 - 1) // 24 END AS n_chunks
        |      FROM w WHERE len(w) > 0),
        |e AS (SELECT doc_id, w, n, unnest(range(n_chunks)) AS i FROM c)
        |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR) AS chunk_id,
        |  doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(least(32, n - i * 24) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(w[CAST(i*24+1 AS INT):CAST(i*24+32 AS INT)], ' ')) AS chunk_md5
        |FROM e""".stripMargin,
    "q32_topk_distributed" -> topkOracle("vec_id >= 40 AND vec_id < 60", "true", 10, None),
    // mirrors chunkChars: len//100 + 1 chunks (trailing empty chunk on
    // exact multiples — the reference's own range() arithmetic)
    "q33_text_chunks_chars" ->
      """WITH c AS (SELECT doc_id, text, len(text) // 100 + 1 AS n FROM documents),
        |e AS (SELECT doc_id, text, unnest(range(n)) AS i FROM c)
        |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR) AS chunk_id,
        |  doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(len(substring(text, CAST(i*100+1 AS INT), 100)) AS BIGINT) AS n_chars,
        |  md5(substring(text, CAST(i*100+1 AS INT), 100)) AS chunk_md5
        |FROM e""".stripMargin,
    // mirrors dedupClusters: dual 4-token fingerprints (w[1:4], w[2:5]),
    // star-mirrored bucket cap like q21/q22, then min-reachable-id per
    // node via a recursive CTE — the oracle checks the actual
    // connected-components fixpoint, not just the pair set. (The star
    // branch cannot change components vs the clique — identical
    // connectivity — but mirroring keeps the edge sets bit-equal too.)
    "q34_dedup_clusters" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |fps AS (SELECT doc_id, md5(array_to_string(w[1:4], ' ')) AS fp FROM w
        |        UNION ALL
        |        SELECT doc_id, md5(array_to_string(w[2:5], ' ')) AS fp FROM w),
        |fpc AS (SELECT *, count(*) OVER (PARTITION BY fp) AS bn,
        |               min(doc_id) OVER (PARTITION BY fp) AS bmin
        |        FROM fps),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM fpc x JOIN fpc y
        |           ON x.fp = y.fp AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM fpc WHERE bn > 100 AND doc_id > bmin),
        |edges AS (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |reach(node, r) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
        |cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN cc ON cc.node = d.doc_id""".stripMargin,
    "q35_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS g
        |          FROM w, unnest(range(1, len(w) - 11)) AS t(i)),
        |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
        |SELECT gr.doc_id, count(*) AS n_hits
        |FROM grams gr JOIN ev USING (g)
        |WHERE gr.doc_id % 10 <> 0
        |GROUP BY gr.doc_id""".stripMargin,
    "q36_boilerplate_grams" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
        |          FROM w, unnest(range(1, len(w) - 3)) AS t(i))
        |SELECT g, count(DISTINCT doc_id) AS n_docs
        |FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 3""".stripMargin,
    "q37_repetition" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |      FROM w, unnest(range(1, len(w))) AS t(i)),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total, max(c) AS top,
        |             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
        |      FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(s.total, 0) AS n_grams,
        |  round(coalesce(CAST(s.top AS DOUBLE) / CAST(s.total AS DOUBLE), 0.0), 6) AS top_frac,
        |  round(coalesce(CAST(s.dup AS DOUBLE) / CAST(s.total AS DOUBLE), 0.0), 6) AS dup_frac
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    "q38_stratified_sample" -> {
      val values = Queries.sampleRates.toSeq.sortBy(_._1)
        .map { case (s, r) =>
          s"('$s', '${graft.operators.CorpusClean.sampleThresholdHex(r)}')"
        }.mkString(", ")
      s"""WITH rates(source, thr) AS (VALUES $values),
         |kept AS (SELECT d.source, d.doc_id
         |         FROM documents d JOIN rates r ON d.source = r.source
         |         WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr)
         |SELECT source, count(*) AS n_kept, min(doc_id) AS min_id
         |FROM kept GROUP BY source""".stripMargin
    },
    "q39_hygiene_pipeline" -> {
      val values = Queries.sampleRates.toSeq.sortBy(_._1)
        .map { case (s, r) =>
          s"('$s', '${graft.operators.CorpusClean.sampleThresholdHex(r)}')"
        }.mkString(", ")
      s"""WITH rates(source, thr) AS (VALUES $values),
         |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |g2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
         |       FROM w, unnest(range(1, len(w))) AS t(i)),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
         |rep AS (SELECT doc_id,
         |          round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) /
         |                CAST(sum(c) AS DOUBLE), 6) AS dup_frac
         |        FROM c2 GROUP BY doc_id),
         |lowrep AS (SELECT d.doc_id, d.text, d.source FROM documents d
         |           LEFT JOIN rep USING (doc_id)
         |           WHERE d.doc_id % 10 <> 0 AND d.text IS NOT NULL
         |             AND coalesce(rep.dup_frac, 0.0) <= 0.5),
         |g13 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS g
         |        FROM w, unnest(range(1, len(w) - 11)) AS t(i)),
         |ev AS (SELECT DISTINCT g FROM g13 WHERE doc_id % 10 = 0),
         |contam AS (SELECT DISTINCT g13.doc_id FROM g13 JOIN ev USING (g)
         |           WHERE g13.doc_id IN (SELECT doc_id FROM lowrep)),
         |clean AS (SELECT * FROM lowrep
         |          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |keep AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text))
         |SELECT c.doc_id, c.source
         |FROM clean c
         |JOIN keep USING (doc_id)
         |JOIN rates r ON c.source = r.source
         |WHERE substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8) < r.thr""".stripMargin
    },
    "q40_idf_table" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |t AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM w),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY term)
        |SELECT term, df,
        |  round(ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1.0) /
        |           (df + 1.0)) + 1.0, 6) AS idf
        |FROM d""".stripMargin,
    "q41_tfidf_top_terms" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |t AS (SELECT doc_id, unnest(w) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |d AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        round(tf.tf * round(ln((n.n + 1.0) / (d.df + 1.0)) + 1.0, 6), 6) AS tfidf
        |      FROM tf JOIN d USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |      FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf
        |FROM r WHERE rank <= 3""".stripMargin,
    "q42_corpus_profile" ->
      """SELECT lang, count(*) AS n,
        |  round(avg(n_chars), 6) AS mean_chars,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90
        |FROM documents GROUP BY lang""".stripMargin,
    "q43_doc_embedding" ->
      """WITH e AS (SELECT vec_id % 50 AS doc, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT doc, i, v[i] AS val FROM e, unnest(range(1, len(v) + 1)) AS t(i))
        |SELECT doc, CAST(i AS BIGINT) AS dim, round(avg(val), 6) AS val
        |FROM x GROUP BY doc, i""".stripMargin,
    "q44_edit_distance" ->
      """WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |fps AS (SELECT doc_id, md5(array_to_string(w[1:4], ' ')) AS fp FROM w),
        |fpc AS (SELECT *, count(*) OVER (PARTITION BY fp) AS bn,
        |               min(doc_id) OVER (PARTITION BY fp) AS bmin
        |        FROM fps),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM fpc x JOIN fpc y
        |           ON x.fp = y.fp AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM fpc WHERE bn > 100 AND doc_id > bmin)
        |SELECT c.a, c.b, CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
        |FROM cand c
        |JOIN documents da ON da.doc_id = c.a
        |JOIN documents db ON db.doc_id = c.b
        |WHERE levenshtein(da.text, db.text) <= 120""".stripMargin,
    // reachability over BOTH blockings' pairs (each capped per-blocking,
    // mirroring the two pairsByKey calls) — the incremental merge must
    // reproduce the from-scratch union answer
    "q45_merge_clusters" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |fps1 AS (SELECT doc_id, md5(array_to_string(w[1:4], ' ')) AS fp FROM w),
        |fps2 AS (SELECT doc_id, md5(array_to_string(w[2:5], ' ')) AS fp FROM w),
        |fpc1 AS (SELECT *, count(*) OVER (PARTITION BY fp) AS bn,
        |                min(doc_id) OVER (PARTITION BY fp) AS bmin
        |         FROM fps1),
        |fpc2 AS (SELECT *, count(*) OVER (PARTITION BY fp) AS bn,
        |                min(doc_id) OVER (PARTITION BY fp) AS bmin
        |         FROM fps2),
        |cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM fpc1 x JOIN fpc1 y
        |           ON x.fp = y.fp AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM fpc1 WHERE bn > 100 AND doc_id > bmin
        |         UNION
        |         SELECT x.doc_id AS a, y.doc_id AS b
        |         FROM fpc2 x JOIN fpc2 y
        |           ON x.fp = y.fp AND x.doc_id < y.doc_id AND x.bn <= 100
        |         UNION
        |         SELECT bmin AS a, doc_id AS b
        |         FROM fpc2 WHERE bn > 100 AND doc_id > bmin),
        |edges AS (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |reach(node, r) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
        |cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN cc ON cc.node = d.doc_id""".stripMargin,
    // Approximate-recall entries (round 19, VERDICT r18 next-round #4):
    // the hit SETS are approximate and cannot be reproduced in SQL, but
    // each entry emits a checked per-query artifact — (qid, n_hits,
    // recall_floor_met) — whose truth the entry itself establishes by
    // self-asserting recall >= floor against the in-engine exact twin
    // (a violation throws, so a red row replaces a wrong artifact).
    // The oracle verifies the artifact: every query row present, k hits
    // each, floor verdict true.
    "q26_ann_ivf" -> recallArtifactOracle("vec_id < 20", 10),
    "q46_ann_ivf_ds" -> recallArtifactOracle("vec_id < 20", 10),
    "q55_q8_ann" -> recallArtifactOracle("vec_id >= 140 AND vec_id < 160", 10),
    "q76_hnsw_shard" -> recallArtifactOracle("vec_id < 20", 10),
    "q78_pq_ann" -> recallArtifactOracle("vec_id >= 160 AND vec_id < 180", 10),
    // IVF at nProbe = nList probes every list — exact by construction, so
    // the standard top-k oracle applies (the first ANN entry that could
    // hash-match its full hit set)
    "q47_ann_ivf_exact" ->
      topkOracle("vec_id >= 60 AND vec_id < 80", "true", 10, None),
    // packed-kernel ANN at nProbe = nList, exact double cosine — same
    // oracle shape (see annIvfPacked)
    "q48_ann_ivf_packed" ->
      topkOracle("vec_id >= 80 AND vec_id < 100", "true", 10, None),
    // shuffle-free treeAggregate ANN at nProbe = nList, exact double
    // cosine — same oracle shape (see annIvfMerged)
    "q49_ann_ivf_merged" ->
      topkOracle("vec_id >= 100 AND vec_id < 120", "true", 10, None),
    // IVF-SQ8 composition at nProbe = nList + covering overfetch: int8
    // candidate generation cannot drop a row, fp32 rescore is the exact
    // arithmetic — same oracle shape (see annIvfQ8)
    "q59_ann_ivf_q8" ->
      topkOracle("vec_id >= 160 AND vec_id < 180", "true", 10, None),
    // sharded-HNSW store in exact mode: per-shard scoring bypasses the
    // graphs (sequential-double cosine, BlockStore.scoreBlock) and the
    // treeAggregate merge is lossless — exact by construction, same
    // oracle shape (see hnswShardExact; q76 stays no_oracle by design)
    "q75_hnsw_shard_exact" ->
      topkOracle("vec_id >= 180 AND vec_id < 200", "true", 10, None),
    // Dataset-query graph store in exact mode - same argument as q75,
    // distinct slice (see hnswShardPacked)
    "q77_hnsw_shard_packed" ->
      topkOracle("vec_id >= 200 AND vec_id < 220", "true", 10, None),
    // same salting, same RE2-safe patterns in the same order, same
    // stage-wise match counting (each pattern counted on its stage's
    // input, so a literal placeholder in a source doc never counts —
    // ADVICE r9; see piiRedact / CorpusClean.PiiPatterns)
    "q50_pii_redact" ->
      """WITH salted AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || (doc_id % 250) || '.1' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END AS text
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM salted),
        |s2 AS (
        |  SELECT doc_id, c1,
        |    len(regexp_extract_all(t1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS c2,
        |    regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT doc_id, c1, c2,
        |    len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS c3,
        |    regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        |  FROM s2)
        |SELECT doc_id, md5(redacted) AS redacted_md5,
        |  CAST(c1 + c2 + c3 AS BIGINT) AS n_redactions
        |FROM s3""".stripMargin,
    // same salting, same RE2 extraction; docs counted once per domain
    "q51_domain_hist" ->
      """WITH salted AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' see https://site' || (doc_id % 20) || '.example.com/x' ELSE '' END
        |    || CASE WHEN doc_id % 9 = 0 THEN ' and http://mirror.example.org/y' ELSE '' END AS text
        |  FROM documents),
        |d0 AS (SELECT doc_id,
        |         unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
        |       FROM salted),
        |d AS (SELECT DISTINCT doc_id, domain FROM d0)
        |SELECT domain, count(*) AS n_docs FROM d GROUP BY domain""".stripMargin,
    "q52_lm_crossent" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |t AS (SELECT doc_id, unnest(w) AS tok FROM w),
        |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
        |c AS (SELECT tok, sum(tf) AS c FROM dt GROUP BY tok),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c)
        |SELECT dt.doc_id,
        |  round(sum(CAST(dt.tf AS DOUBLE) * -log2(CAST(c.c AS DOUBLE) / n.n))
        |        / sum(CAST(dt.tf AS DOUBLE)), 6) AS cross_entropy
        |FROM dt JOIN c USING (tok) CROSS JOIN n
        |GROUP BY dt.doc_id""".stripMargin,
    // epoch_us mirrors the µs ts both engines can agree on (DuckDB's
    // parquet reader truncates ns timestamps to µs); 30 min gap
    "q53_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, us, value,
        |    sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(us) AS start_ts, max(us) AS end_ts,
        |  round(sum(value), 4) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    // same whitespace token convention as q13; start-bin attribution
    "q54_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    // q55 is approximate (no oracle; self-asserted recall floor).
    // q56: overfetch-all rescore == exact top-k (same oracle shape as q01)
    "q56_q8_rescore" -> topkOracle("vec_id >= 120 AND vec_id < 140", "true", 10, None),
    // q78 is approximate (no oracle; self-asserted recall floor).
    // q79: PQ overfetch-all rescore == exact top-k (the q56 shape)
    "q79_pq_rescore" -> topkOracle("vec_id >= 100 AND vec_id < 120", "true", 10, None),
    // q82: binary-sketch overfetch-all == exact (the q79 shape)
    "q82_bit_rescore" -> topkOracle("vec_id >= 120 AND vec_id < 140", "true", 10, None),
    // q83: IVF-bit at nProbe=nList + covering overfetch == exact
    "q83_ann_ivf_bit" -> topkOracle("vec_id >= 140 AND vec_id < 160", "true", 10, None),
    // q80: IVF-PQ at nProbe=nList + covering overfetch == exact (the q59 shape)
    "q80_ann_ivf_pq" -> topkOracle("vec_id >= 180 AND vec_id < 200", "true", 10, None),
    // q81: bulk (Dataset-query) IVF-PQ, same exactness argument via the
    // fused cogroup path
    "q81_ann_ivf_pq_ds" -> topkOracle("vec_id >= 200 AND vec_id < 220", "true", 10, None),
    // q84/q85: the facade-dispatch compositions (ann+pq / ann+bit) —
    // exact under nProbe = nList + covering overfetch; scores are over
    // the store's write-time-normalized unit vectors, reproduced in SQL
    "q84_vdb_ann_pq" -> topkOracleUnit("vec_id >= 220 AND vec_id < 240", 10),
    "q85_vdb_ann_bit" -> topkOracleUnit("vec_id >= 240 AND vec_id < 260", 10),
    "q86_vdb_ann_filtered" -> topkOracleUnit("vec_id >= 260 AND vec_id < 280", 10,
      storeFilter = "u.vec_id < 300"),
    "q87_vdb_ann_filtered_bloom" -> topkOracleUnit(
      "vec_id >= 280 AND vec_id < 300", 10, storeFilter = "u.vec_id >= 100"),
    "q88_vdb_ann_q8_filtered" -> topkOracleUnit(
      "vec_id >= 300 AND vec_id < 320", 10, storeFilter = "u.vec_id < 200"),
    // q89: the graph-strategy filtered rung at a store-covering beam ==
    // the exact filtered scan (per-shard member-scan snap)
    "q89_vdb_hnsw_filtered" -> topkOracleUnit(
      "vec_id >= 320 AND vec_id < 340", 10, storeFilter = "u.vec_id < 300"),
    // q90: deny polarity — the anti-selective filter's complement
    // broadcasts; exact at covering probes like q86
    "q90_vdb_ann_filtered_deny" -> topkOracleUnit(
      "vec_id >= 340 AND vec_id < 360", 10, storeFilter = "u.vec_id >= 20"),
    // q91-q93: auto-tier dispatch forced to each compression rung,
    // composed with IVF — exact under covering probes + overfetch, so
    // all three share the plain unit top-k oracle
    "q91_vdb_auto_q8" -> topkOracleUnit("vec_id >= 360 AND vec_id < 380", 10),
    "q92_vdb_auto_pq" -> topkOracleUnit("vec_id >= 380 AND vec_id < 400", 10),
    "q93_vdb_auto_bit" -> topkOracleUnit("vec_id >= 400 AND vec_id < 420", 10),
    // q94: the bulk (Dataset-query) filtered twin at covering probes ==
    // the exact filtered raw-cosine scan
    "q94_ann_ivf_filtered_ds" -> topkOracle(
      "vec_id >= 420 AND vec_id < 440", "vec_id % 2 = 0", 10, None),
    // q95: its int8 composition at covering probes + covering overfetch
    "q95_ann_ivf_q8_filtered_ds" -> topkOracle(
      "vec_id >= 440 AND vec_id < 460", "vec_id % 2 = 0", 10, None),
    // q96: the bulk FACADE (queryDF) through the filtered rung at
    // covering probes — the q86 oracle shape over a query table
    "q96_vdb_querydf_filtered" -> topkOracleUnit(
      "vec_id >= 460 AND vec_id < 480", 10, storeFilter = "u.vec_id < 300"),
    // q97: the bulk facade's Bloom rung — round-18 distributed
    // verification + refill make it exact at covering probes (the q87
    // oracle shape over a query table)
    "q97_vdb_querydf_bloom" -> topkOracleUnit(
      "vec_id >= 480 AND vec_id < 500", 10, storeFilter = "u.vec_id >= 100"),
    // q98-q100: the bulk facade's FLAT compressed tiers (round 18) —
    // exact at covering overfetch (each tier's scan keeps every row as
    // a candidate, so the fp32 double rescore is the exact result)
    "q98_vdb_querydf_q8" -> topkOracleUnit("vec_id < 20", 10),
    "q99_vdb_querydf_pq" -> topkOracleUnit("vec_id >= 20 AND vec_id < 40", 10),
    "q100_vdb_querydf_bit" -> topkOracleUnit("vec_id >= 40 AND vec_id < 60", 10),
    // q101: the bulk facade's composed IVF+bit engine — exact under
    // covering probes + covering overfetch like q85
    "q101_vdb_querydf_ann_bit" -> topkOracleUnit(
      "vec_id >= 60 AND vec_id < 80", 10),
    // q102: the graph rung's int8 composition at a store-covering beam
    // + covering overfetch == the exact filtered scan (the q89 shape)
    "q102_vdb_hnsw_q8_filtered" -> topkOracleUnit(
      "vec_id >= 80 AND vec_id < 100", 10, storeFilter = "u.vec_id < 300"),
    // same salted-md5 determinism trick as q38; first key byte -> bucket
    "q57_corpus_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, h,
        |    CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |        + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 64
        |      AS BIGINT) AS bucket
        |  FROM s)
        |SELECT doc_id, bucket,
        |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM b""".stripMargin,
    // ROLLUP null-markers coalesced to '(all)' on both sides
    "q58_mix_rollup" ->
      """SELECT coalesce(lang, '(all)') AS lang,
        |  coalesce(source, '(all)') AS source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,
    // naive point-in-time join + rn=1 window: the oracle prunes the
    // pair explosion AFTER materializing it (fine at sf0.01); the
    // Spark side never materializes it (AsOfJoin carry-forward)
    "q60_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, p.user_id, c.click_id, p.us - c.cus AS gap_us,
        |        row_number() OVER (PARTITION BY p.event_id
        |                           ORDER BY c.cus DESC, c.click_id DESC) AS rn
        |      FROM p LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.cus <= p.us)
        |SELECT event_id, user_id, coalesce(click_id, -1) AS click_id,
        |  coalesce(gap_us, -1) AS gap_us
        |FROM j WHERE rn = 1""".stripMargin,
    // naive inequality join (fine at sf0.01); the Spark side blocks on
    // (user, time-bucket) so the same pairs come out of an equi-join
    "q61_range_join" ->
      """SELECT a.user_id, a.event_id AS event_id_a, b.event_id AS event_id_b,
        |  abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000""".stripMargin,
    // sqrt on both sides (pow(x, 0.5) is not guaranteed bit-identical);
    // integer sums cast to BIGINT before compare, floats rounded to 6
    "q62_temperature_mix" ->
      """WITH d AS (SELECT lang, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |g AS (SELECT lang, source, count(*) AS n_docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS tokens
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT sum(sqrt(CAST(tokens AS DOUBLE))) AS z,
        |          CAST(sum(tokens) AS DOUBLE) AS total FROM g)
        |SELECT lang, source, n_docs, tokens,
        |  round(sqrt(CAST(tokens AS DOUBLE)) / z, 6) AS weight,
        |  round(least(1.0, 0.5 * total * (sqrt(CAST(tokens AS DOUBLE)) / z)
        |              / CAST(tokens AS DOUBLE)), 6) AS sample_rate
        |FROM g CROSS JOIN tot""".stripMargin,
    // Okapi BM25, Lucene idf ln(1+(N-df+.5)/(df+.5)), k1=1.2 b=0.75
    // (constants pre-folded identically on both sides: 2.2 = k1+1,
    // 0.25 = 1-b); same whitespace token convention as q13/q54;
    // rank on the UNROUNDED score, ties by doc_id
    "q63_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl FROM toks),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |t AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
        |dt AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
        |       FROM t WHERE tok IN ('dup', 'vector', 'query') GROUP BY 1, 2),
        |dft AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM dt GROUP BY 1),
        |scored AS (
        |  SELECT dt.doc_id,
        |    sum(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) * dt.tf * 2.2
        |        / (dt.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
        |  FROM dt JOIN dft f USING (tok) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s GROUP BY 1),
        |top AS (SELECT doc_id, score,
        |          row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |        FROM scored ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, round(score, 6) AS score
        |FROM top""".stripMargin,
    // BM25 top-100 + exact-cosine top-100 (query = vec_id 7) fused
    // with rrf k=60; embeddings.vec_id is doc-aligned (TESTDATA)
    "q64_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl FROM toks),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |t AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
        |dt AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
        |       FROM t WHERE tok IN ('dup', 'vector', 'query') GROUP BY 1, 2),
        |dft AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM dt GROUP BY 1),
        |scored AS (
        |  SELECT dt.doc_id,
        |    sum(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) * dt.tf * 2.2
        |        / (dt.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
        |  FROM dt JOIN dft f USING (tok) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s GROUP BY 1),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |        FROM scored ORDER BY score DESC, doc_id LIMIT 100),
        |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
        |vs AS (SELECT e.vec_id AS doc_id,
        |         list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
        |                                CAST(e.embedding AS DOUBLE[])) AS score
        |       FROM q CROSS JOIN embeddings e),
        |vec AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |        FROM vs ORDER BY score DESC, doc_id LIMIT 100),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM vec),
        |f AS (SELECT doc_id, sum(1.0 / (60 + rank)) AS rrf, count(*) AS n
        |      FROM u GROUP BY 1)
        |SELECT doc_id, round(rrf, 6) AS rrf_score, CAST(n AS BIGINT) AS n_lists
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // q62's rates (rounded to 6 dp BEFORE thresholding, so both
    // engines threshold the same double) applied with the q38 hash
    // convention, numerically: first 8 md5 hex digits as a long vs
    // floor(rate * 2^32)
    "q65_temperature_sample" ->
      """WITH d AS (SELECT doc_id, lang, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |g AS (SELECT lang, source, CAST(sum(n_tokens) AS BIGINT) AS tokens
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT sum(sqrt(CAST(tokens AS DOUBLE))) AS z,
        |          CAST(sum(tokens) AS DOUBLE) AS total FROM g),
        |r AS (SELECT lang, source,
        |        round(least(1.0, 0.5 * total * (sqrt(CAST(tokens AS DOUBLE)) / z)
        |                    / CAST(tokens AS DOUBLE)), 6) AS rate
        |      FROM g CROSS JOIN tot),
        |kept AS (SELECT d.lang, d.source, d.doc_id, d.n_tokens
        |         FROM d JOIN r USING (lang, source)
        |         WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |             < CAST(floor(r.rate * 4294967296.0) AS BIGINT))
        |SELECT lang, source, count(*) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens, min(doc_id) AS min_id
        |FROM kept GROUP BY 1, 2""".stripMargin,
    // MMR greedy unrolled: sel1 = argmax lam*rel; step i picks argmax
    // lam*rel - (1-lam)*max(sim to selected) over the rest; ties by
    // vec_id. lam = 0.75 so 0.75/0.25 are exact binary on both engines.
    "q66_mmr_diversify" -> {
      val steps = (2 to 5).map { i =>
        val prev = (1 until i).map(j => s"SELECT qid, vec_id FROM sel$j")
          .mkString(" UNION ALL ")
        s"""u$i AS ($prev),
           |rem$i AS (SELECT c.qid, c.vec_id, c.rel FROM cand c
           |          LEFT JOIN u$i u ON c.qid = u.qid AND c.vec_id = u.vec_id
           |          WHERE u.vec_id IS NULL),
           |sc$i AS (SELECT r.qid, r.vec_id,
           |           0.75 * r.rel - 0.25 * max(p.sim) AS mmr
           |         FROM rem$i r
           |         JOIN pair p ON p.qid = r.qid AND p.ca = r.vec_id
           |         JOIN u$i u ON u.qid = p.qid AND u.vec_id = p.cb
           |         GROUP BY r.qid, r.vec_id, r.rel),
           |sel$i AS (SELECT qid, vec_id, mmr FROM (
           |  SELECT qid, vec_id, mmr,
           |    row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rn
           |  FROM sc$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val out = (1 to 5).map(i =>
        s"SELECT qid, CAST($i AS BIGINT) AS rank, vec_id, round(mmr, 6) AS mmr FROM sel$i")
        .mkString("\n UNION ALL ")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
         |           WHERE vec_id >= 30 AND vec_id < 40),
         |s AS (SELECT q.qid, e.vec_id, e.embedding,
         |        list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
         |                               CAST(e.embedding AS DOUBLE[])) AS rel
         |      FROM q CROSS JOIN embeddings e),
         |cand AS (SELECT qid, vec_id, embedding, rel FROM (
         |  SELECT qid, vec_id, embedding, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
         |  FROM s) WHERE rn <= 20),
         |pair AS (SELECT a.qid, a.vec_id AS ca, b.vec_id AS cb,
         |           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |                                  CAST(b.embedding AS DOUBLE[])) AS sim
         |         FROM cand a JOIN cand b
         |           ON a.qid = b.qid AND a.vec_id <> b.vec_id),
         |sel1 AS (SELECT qid, vec_id, mmr FROM (
         |  SELECT qid, vec_id, 0.75 * rel AS mmr,
         |    row_number() OVER (PARTITION BY qid ORDER BY 0.75 * rel DESC, vec_id) AS rn
         |  FROM cand) WHERE rn = 1),
         |$steps
         |$out""".stripMargin
    },
    // exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the (n-1)p linear-interpolation definition
    "q67_percentiles" ->
      """SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
        |  round(quantile_cont(n_chars, 0.99), 6) AS p99_chars,
        |  round(avg(len(string_split_regex(trim(text), '\s+'))), 6) AS mean_tokens
        |FROM documents GROUP BY source""".stripMargin,
    // same 5-token spans (1-based list slicing here, 0-based on the
    // Spark side — each engine internally consistent); first occurrence
    // = min (doc, pos) via rn; a token is dropped iff covered by any
    // redundant start; clean text = kept tokens joined by single spaces
    "q68_span_dedup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS g
        |      FROM w, unnest(range(1, len(w) - 3)) AS t(i)),
        |r AS (SELECT doc_id, i FROM (
        |  SELECT doc_id, i,
        |    row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
        |  FROM g) WHERE rn > 1),
        |tok AS (SELECT doc_id, i, w[i] AS t
        |        FROM w, unnest(range(1, len(w) + 1)) AS u(i)),
        |dropped AS (SELECT DISTINCT t.doc_id, t.i FROM tok t
        |            JOIN r ON t.doc_id = r.doc_id
        |                  AND t.i BETWEEN r.i AND r.i + 4),
        |kept AS (SELECT t.doc_id, t.i, t.t FROM tok t
        |         LEFT JOIN dropped d ON t.doc_id = d.doc_id AND t.i = d.i
        |         WHERE d.i IS NULL),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |          string_agg(t, ' ' ORDER BY i) AS clean
        |        FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
        |  CAST(len(w.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(a.clean, '')) AS clean_md5
        |FROM w LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // q69: the oracle is the global-sort window the Spark side
    // deliberately avoids; cum is integral so `cum <= 0.6*sum` equals
    // the Spark side's floor'd long budget.
    "q69_token_budget" ->
      """WITH scored AS (SELECT doc_id,
        |  round(least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.5 +
        |    (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                          x -> x IN ('the','a','and','of','to'))) AS DOUBLE) /
        |     CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)) * 0.5,
        |  6) AS q,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents),
        |tot AS (SELECT 0.6 * sum(n_tokens) AS budget FROM scored),
        |w AS (SELECT doc_id, q, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY q DESC, doc_id) AS cum
        |      FROM scored)
        |SELECT doc_id, q, n_tokens FROM w, tot WHERE cum <= budget""".stripMargin,
    "q70_group_quota" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 40""".stripMargin,
    "q71_pmi_bigrams" ->
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
        |uc AS (SELECT tok, count(*) AS c FROM
        |         (SELECT unnest(w) AS tok FROM w) GROUP BY tok),
        |nu AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM uc),
        |bc AS (SELECT a, b, count(*) AS c_ab FROM
        |         (SELECT w[i] AS a, w[i+1] AS b
        |          FROM w, unnest(range(1, len(w))) AS t(i)) GROUP BY a, b),
        |nb AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS nb FROM bc)
        |SELECT bc.a, bc.b, bc.c_ab,
        |  round(ln((bc.c_ab / nb.nb) /
        |    ((ua.c / nu.nu) * (ub.c / nu.nu))), 6) AS pmi
        |FROM bc
        |JOIN uc ua ON bc.a = ua.tok
        |JOIN uc ub ON bc.b = ub.tok
        |CROSS JOIN nb CROSS JOIN nu
        |WHERE bc.c_ab >= 5""".stripMargin,
    "q72_exact_sample" ->
      """SELECT doc_id, source FROM documents
        |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 137""".stripMargin,
    // the corpus carries the Spark side's adversarial rows (null doc
    // ids, empty/whitespace texts — see Queries.q73ExtraRows); the
    // null contract is pinned by filtering null ids BEFORE ranking and
    // df-counting, matching min_k_ids + count(col) semantics
    "q73_inverted_index" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM (VALUES
        |    (9000001, 'zzsentinel alpha'),
        |    (9000002, 'zzsentinel beta'),
        |    (9000003, 'zzsentinel gamma'),
        |    (9000004, ''),
        |    (9000005, ''),
        |    (9000006, '   '),
        |    (9000007, 'zznullbait'),
        |    (9000008, 'zznullbait'),
        |    (NULL, 'zznullbait zzonlynull'),
        |    (NULL, 'zznullbait zzonlynull'),
        |    (NULL, 'zzonlynull zzsentinel'),
        |    (NULL, '')) v(doc_id, text)),
        |td AS (SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM aug)),
        |r AS (SELECT term, doc_id,
        |        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk,
        |        count(*) OVER (PARTITION BY term) AS df
        |      FROM td WHERE doc_id IS NOT NULL)
        |SELECT term, CAST(df AS BIGINT) AS df, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE df >= 3 AND rk <= 8""".stripMargin,
    "q74_bigram_crossent" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |tr AS (SELECT doc_id, w[i] AS a, w[i+1] AS b
        |       FROM w, unnest(range(1, len(w))) AS t(i)),
        |dt AS (SELECT doc_id, a, b, count(*) AS tf FROM tr GROUP BY doc_id, a, b),
        |bc AS (SELECT a, b, count(*) AS c_ab FROM tr GROUP BY a, b),
        |pre AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_pre FROM bc GROUP BY a),
        |uc AS (SELECT tok, count(*) AS c FROM
        |         (SELECT unnest(w) AS tok FROM w) GROUP BY tok),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uc)
        |SELECT dt.doc_id,
        |  round(sum(dt.tf * -log2(0.75 * dt_bc.c_ab / pre.c_pre +
        |                          0.25 * ub.c / n.n)) / sum(dt.tf),
        |        6) AS cross_entropy
        |FROM dt
        |JOIN bc dt_bc ON dt.a = dt_bc.a AND dt.b = dt_bc.b
        |JOIN pre ON dt.a = pre.a
        |JOIN uc ub ON dt.b = ub.tok
        |CROSS JOIN n
        |GROUP BY dt.doc_id""".stripMargin,
  )
}
