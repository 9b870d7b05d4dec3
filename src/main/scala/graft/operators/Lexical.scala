package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval + rank fusion: the keyword half of hybrid search
  * (the reference is embedding-only; production vector stores pair the
  * ANN path with a BM25 ranker and fuse the two rankings — this is
  * that surface, Spark-first and exactly SQL-reproducible).
  *
  * Scale shape (100 TB): BM25 is two aggregations — a (doc, term)
  * partial-aggregated tf pass over the corpus scan (the query-term
  * `isin` filter prunes the exploded tokens BEFORE the shuffle, so
  * shuffle volume is O(matching doc-term pairs), not O(corpus tokens))
  * and a tiny per-term df rollup that broadcasts back alongside the
  * 1-row (N, avgdl) normalizer. Final top-k is TakeOrdered, never a
  * global sort. RRF is a union + one groupBy on the doc id.
  */
object Lexical {

  /** Okapi BM25 scores (Lucene idf variant: ln(1 + (N-df+.5)/(df+.5)))
    * for documents matching at least one of `terms`, tokenized on
    * whitespace exactly like the q13/q54 token convention. Returns
    * (idCol, score double) — un-truncated; callers rank/round.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toks = docs.select(col(idCol).as("_id_"),
      split(trim(col(textCol)), "\\s+").as("_ts_"))
      .withColumn("_dl_", size(col("_ts_")).cast("double"))
    // 1-row corpus normalizer (docs + mean length), broadcast below
    val stats = toks.agg(count(lit(1)).cast("double").as("_n_"),
      avg(col("_dl_")).as("_avgdl_"))
    val dt = toks.select(col("_id_"), col("_dl_"), explode(col("_ts_")).as("_tok_"))
      .filter(col("_tok_").isin(terms: _*)) // prune before the shuffle
      .groupBy(col("_id_"), col("_dl_"), col("_tok_"))
      .agg(count(lit(1)).cast("double").as("_tf_"))
    // per-term document frequency: (id, tok) is already distinct
    val dft = dt.groupBy(col("_tok_")).agg(count(lit(1)).cast("double").as("_df_"))
    val idf = log(lit(1.0) +
      (col("_n_") - col("_df_") + lit(0.5)) / (col("_df_") + lit(0.5)))
    val termScore = idf * col("_tf_") * lit(k1 + 1.0) /
      (col("_tf_") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl_") / col("_avgdl_")))
    dt.join(broadcast(dft), "_tok_")
      .crossJoin(broadcast(stats))
      .groupBy(col("_id_"))
      .agg(sum(termScore).as("score"))
      .select(col("_id_").as(idCol), col("score"))
  }

  /** Reciprocal-rank fusion: each input is a ranking (idCol, rankCol
    * with 1-based ranks); a document's fused score is the sum of
    * 1/(kRrf + rank) over the rankings it appears in. Returns
    * (idCol, rrf_score double, n_lists long). One union + one groupBy
    * on the id — no join chain, any number of rankers.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf > 0, s"need kRrf > 0, got $kRrf")
    rankings.map(df => df.select(col(idCol).as("_id_"),
        col(rankCol).cast("double").as("_r_")))
      .reduce(_ unionByName _)
      .groupBy(col("_id_"))
      .agg(sum(lit(1.0) / (lit(kRrf.toDouble) + col("_r_"))).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .select(col("_id_").as(idCol), col("rrf_score"), col("n_lists"))
  }
}
