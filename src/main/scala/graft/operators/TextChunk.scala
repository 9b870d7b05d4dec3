package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-chunking ingest pipeline: overlapping token windows per document,
  * the DataFrame form of the reference's embedding ingest flow
  * (bench/st_embedding.py:1-60, bench/hf_upserts.py — chunk documents,
  * embed each chunk, upsert chunk rows keyed by a derived chunk id).
  *
  * Chunk boundaries are pure arithmetic over the whitespace token array
  * (empty tokens dropped, so leading/trailing/repeated whitespace cannot
  * mint phantom tokens — Python `str.split()` behavior for ASCII
  * whitespace; Unicode whitespace and `\x0B` classify differently
  * across Java/RE2/Python regex engines, the same corpus convention
  * every text operator here shares), so the operator is exactly
  * reproducible in any engine (the DuckDB oracle recomputes it in SQL):
  *
  *   - `stride = chunkSize - overlap`; chunk `i` covers tokens
  *     `[i*stride + 1, i*stride + chunkSize]` (1-based, clipped at the
  *     document end);
  *   - a document with `n` tokens has `1 + floor((n-overlap-1)/stride)`
  *     chunks when `n > overlap`, else exactly 1 — every token is
  *     covered, consecutive chunks share `overlap` tokens, and no chunk
  *     is fully contained in its predecessor.
  *
  * Scale shape (100 TB): one narrow projection + one generator — no
  * shuffle, no driver traffic; chunk counts derive per-row, so the
  * operator streams through whole-stage codegen and parallelism follows
  * the input partitioning. Feed the result to [[chunkEmbedUpsert]] (or
  * any embedding stage) and `VdbStore.upsertDF` for the full ingest.
  */
object TextChunk {

  /** Chunk rows: (chunk_id, doc_id, chunk_idx, n_tokens, chunk_text).
    * `chunk_id` = "<doc_id>#<chunk_idx>" — deterministic, stable across
    * re-ingests of the same corpus. The reference chunkers key their
    * upserts by the bare running chunk index over a single document
    * (st_embedding.py, local_embedding_index.py); the doc#idx composite
    * id is this operator's multi-document generalization of that scheme
    * (a corpus-wide ingest needs ids unique across documents, which a
    * bare index is not).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    df.select(col(idCol).as("doc_id"),
        array_remove(split(col(textCol), "\\s+"), "").as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= overlap, lit(1L)).otherwise(
          lit(1L) + floor((col("n") - lit(overlap) - lit(1)) / lit(stride))))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - lit(1L))).as("chunk_idx"))
      .select(
        concat(col("doc_id").cast("string"), lit("#"),
          col("chunk_idx").cast("string")).as("chunk_id"),
        col("doc_id"),
        col("chunk_idx"),
        least(lit(chunkSize.toLong),
          col("n").cast("long") - col("chunk_idx") * stride).as("n_tokens"),
        concat_ws(" ",
          slice(col("w"), (col("chunk_idx") * stride + lit(1)).cast("int"),
            lit(chunkSize))).as("chunk_text"))
  }

  /** Fixed-size CHARACTER chunking — the reference's other chunker
    * (bench/local_embedding_index.py:19-29: `content[i*N:(i+1)*N]` for
    * `i in range(len(content)//N + 1)`). Faithfully mirrors its edge
    * quirk: when the length is an exact multiple of `chunkSize` (or the
    * text is empty) the final chunk is the empty string — the reference
    * embeds it anyway, and the deterministic ids make re-ingest
    * idempotent either way. Zero-shuffle, like [[chunk]].
    *
    * Output: (chunk_id, doc_id, chunk_idx, n_chars, chunk_text).
    */
  def chunkChars(df: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int = 256): DataFrame = {
    require(chunkSize > 0, s"need chunkSize > 0, got $chunkSize")
    df.select(col(idCol).as("doc_id"), col(textCol).as("_t_"))
      .withColumn("n_chunks",
        floor(length(col("_t_")).cast("long") / lit(chunkSize)) + lit(1L))
      .select(col("doc_id"), col("_t_"),
        explode(sequence(lit(0L), col("n_chunks") - lit(1L))).as("chunk_idx"))
      .select(
        concat(col("doc_id").cast("string"), lit("#"),
          col("chunk_idx").cast("string")).as("chunk_id"),
        col("doc_id"),
        col("chunk_idx"),
        expr(s"substring(_t_, cast(chunk_idx * $chunkSize + 1 as int), $chunkSize)")
          .as("chunk_text"))
      .withColumn("n_chars", length(col("chunk_text")).cast("long"))
      .select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
        col("n_chars"), col("chunk_text"))
  }

  /** Training-sequence packing (GPT-style concat-and-split): documents
    * are deterministically sharded, concatenated in id order within each
    * shard, and the token stream is split into fixed `seqLen` sequences;
    * each document is attributed to the sequence bin where it STARTS
    * (`seq_bin = floor(tokens_before_doc / seqLen)`). This is the
    * bookkeeping a packed-pretraining pipeline needs — which documents
    * land in which training sequence, and how full each sequence is —
    * without materializing the concatenated text.
    *
    * Tokens are whitespace counts (`size(split(trim(text), '\s+'))`),
    * the same convention as every text operator here, so the operator
    * is exactly reproducible in SQL (the DuckDB oracle recomputes it).
    *
    * Scale shape (100 TB): one shuffle on the shard key, then one
    * per-shard running sum (Exchange + Sort + WindowExec) and one
    * partial-aggregated groupBy. Determinism requires an order within
    * each shard — that per-shard sequential scan is inherent to
    * reproducible packing, and `nShards` is the parallelism dial: set
    * it to a small multiple of the cluster's cores (each shard is one
    * independent training-data stream, the way large pretraining runs
    * shard their corpus anyway).
    *
    * Output: (shard, seq_bin, n_docs, sum_tokens) — documents starting
    * in each sequence bin and their total token mass (tokens of a doc
    * count in its start bin; a doc longer than `seqLen` overflows into
    * later bins' positions, which subsequent docs' start offsets
    * already account for, so bins can exceed `seqLen` tokens exactly
    * when a long doc spans them).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int = 2048, nShards: Int = -1): DataFrame = {
    require(seqLen > 0, s"need seqLen > 0, got seqLen=$seqLen")
    require(nShards > 0 || nShards == -1,
      s"need nShards > 0 (or -1 = derive from input), got nShards=$nShards")
    // Derived default (VERDICT r10 next-round #7): shard count IS the
    // packing stage's parallelism — a fixed 8 was a test-scale default
    // that would serialize a 100 TB corpus onto 8 window partitions.
    // -1 derives max(8, input partitions); an explicit value always
    // wins. NOTE the derived default makes the OUTPUT layout-dependent
    // (shard = id mod nShards): pass nShards explicitly wherever the
    // packing must be reproducible across differently-partitioned
    // reads of the same corpus.
    val shards = if (nShards > 0) nShards
                 else math.max(8, df.rdd.getNumPartitions)
    val run = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("_cum_", sum(col("n_tokens")).over(run))
      .withColumn("seq_bin", expr(s"(_cum_ - n_tokens) div ${seqLen.toLong}"))
      .groupBy(col("shard"), col("seq_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }

  /** Full ingest: chunk -> embed -> upsert into `store`. `embed` maps the
    * `chunk_text` column to an array<float> embedding — in production a
    * model-serving call (mapInPandas/an expression over a served model);
    * tests use a deterministic fake. Returns (updated, inserted) counts
    * from the store merge. Everything stays distributed: the store merge
    * is `upsertDF`, whose driver traffic is count-only.
    *
    * `pruneStale` (default true) makes a RE-delivered document fully
    * supersede its previous state: when the new text yields fewer
    * chunks, the higher-index chunk rows from the earlier ingest are
    * deleted — without this, an edited-shorter document leaves orphan
    * chunks whose text no longer exists anywhere. Detection reads the
    * (doc_id, chunk_idx) this ingest wrote into each chunk's meta, so
    * it needs no id-format parsing; the scan is one store-sized filter
    * + broadcast join per batch (same order as the merge itself), and
    * the deleted-id traffic is bounded by the stale chunks of the
    * batch's own documents.
    */
  def chunkEmbedUpsert(store: graft.core.VdbStore, df: DataFrame,
                       idCol: String, textCol: String,
                       embed: Column => Column,
                       chunkSize: Int = 64, overlap: Int = 16,
                       pruneStale: Boolean = true): (Long, Long) = {
    val chunks = chunk(df, idCol, textCol, chunkSize, overlap)
    val batch = chunks.select(
      col("chunk_id").as("_id_"),
      embed(col("chunk_text")).as("vector"),
      to_json(struct(col("doc_id"), col("chunk_idx"), col("n_tokens"))).as("meta"))
    val report = store.upsertDF(batch)
    if (pruneStale) {
      import org.apache.spark.sql.functions.broadcast
      // Count per DOCUMENT in the delivered batch, not per chunk row: a
      // document redelivered with empty/whitespace-only text produces
      // ZERO chunk rows but must still supersede (delete) all its old
      // chunks — left join + 0 fill covers the shrink-to-zero case.
      val docIds = df.select(col(idCol).cast("string").as("_doc_")).distinct()
      val newCounts = docIds
        .join(chunks.groupBy(col("doc_id").cast("string").as("_doc_"))
          .agg((max(col("chunk_idx")) + 1).as("_n_")), Seq("_doc_"), "left_outer")
        .na.fill(0L, Seq("_n_"))
      // A row is a stale chunk only if BOTH its meta carries this
      // pipeline's (doc_id, chunk_idx) AND its id has the exact
      // "<doc>#<idx>" shape those values imply — so foreign rows whose
      // user meta happens to reuse the key names are never touched.
      val stale = store.active
        .select(col("_id_"),
          get_json_object(col("meta"), "$.doc_id").as("_doc_"),
          get_json_object(col("meta"), "$.chunk_idx").cast("long").as("_idx_"))
        .filter(col("_doc_").isNotNull && col("_idx_").isNotNull)
        .filter(col("_id_") ===
          concat(col("_doc_"), lit("#"), col("_idx_").cast("string")))
        .join(broadcast(newCounts), Seq("_doc_"))
        .filter(col("_idx_") >= col("_n_"))
        .select("_id_").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect()
      if (stale.nonEmpty) store.delete(stale.toSeq)
    }
    report
  }
}
