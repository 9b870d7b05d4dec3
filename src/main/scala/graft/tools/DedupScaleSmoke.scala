package graft.tools

import org.apache.spark.sql.SparkSession

/** Dedup-family scale smoke: N synthetic documents (default 500k, ~50
  * tokens each, seeded; 1% are near-duplicate perturbed copies) through
  * minhash-LSH and simhash near-dup — converts SCALING.md's shuffle
  * claims for the dedup operators into measured numbers at 100x the
  * sf0.1 corpus, like ScaleSmoke does for the gemm path. Run by hand;
  * prints one line per phase.
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_SMOKE_DOCS").map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-phase shuffle-write volume: the byte-level witness for the
    // "batch-sized, not table-sized" claims (zero-component-shuffle
    // merge, round 8). Stage events arrive async — the short drain
    // sleep keeps attribution honest enough for a smoke.
    val shuffleW = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    // optional phase filter for focused re-measurement:
    // SPARK_GRAFT_SMOKE_PHASES="generate docs,hygiene" runs only phases
    // whose name starts with one of the comma-separated prefixes
    val phaseFilter = sys.env.get("SPARK_GRAFT_SMOKE_PHASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def timed(name: String)(f: => Long): Unit = {
      if (phaseFilter.exists(ps => !ps.exists(name.startsWith))) return
      Thread.sleep(300)
      val w0 = shuffleW.get()
      val t0 = System.nanoTime()
      val out = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain listener queue before reading
      val mb = (shuffleW.get() - w0) / 1048576.0
      println(f"DEDUPSMOKE $name%-24s $dt%7.2f s  shuffleMB=$mb%8.1f  (rows=$out)")
    }

    // ~50-token docs over a 10k-word vocabulary; every 100th doc is a
    // near-duplicate of its predecessor with 2 tokens swapped.
    val docs = spark.sparkContext.range(0, n, 1, 24).map { i =>
      val base = if (i % 100 == 99) i - 1 else i
      val rng = new java.util.Random(base * 2654435761L)
      val words = Array.fill(50)("w" + rng.nextInt(10000))
      if (i % 100 == 99) { // perturb two positions -> high-Jaccard near-dup
        val r2 = new java.util.Random(i)
        words(r2.nextInt(50)) = "w" + r2.nextInt(10000)
        words(r2.nextInt(50)) = "w" + r2.nextInt(10000)
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text").persist()
    timed("generate docs")(docs.count())

    timed("minhash LSH near-dup") {
      graft.operators.Dedup.minhashLSH(docs, "doc_id", "text",
        maxBucket = Some(1000)).count()
    }
    timed("minhash LSH hot bucket") {
      // every 10th doc replaced by identical boilerplate -> one
      // degenerate ~n/10-doc bucket per band; the default maxBucket=100
      // star-routes it (n/10 - 1 pairs to the bucket minimum, verified
      // downstream) instead of expanding (n/10)^2 pair rows — this
      // phase must stay in the same time class as the clean corpus
      import org.apache.spark.sql.functions.{col, lit, when}
      val hot = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          lit("common boilerplate header text repeated verbatim across the corpus"))
          .otherwise(col("text")))
      graft.operators.Dedup.minhashLSH(hot, "doc_id", "text").count()
    }
    timed("simhash near-dup") {
      graft.operators.Dedup.simhashNearDup(docs, "doc_id", "text").count()
    }
    timed("connected components") {
      // full cluster-materialization pass over the clean corpus's LSH
      // pair graph: the planted dups are disjoint 2-cliques
      // (diameter 1; no bucket reaches the 1000 cap here) — a
      // realistic shallow dup graph, so the Pregel loop converges in
      // 2-3 rounds
      val pairs = graft.operators.Dedup.minhashLSH(docs, "doc_id", "text",
        maxBucket = Some(1000))
      graft.operators.Dedup.connectedComponents(pairs).count()
    }
    // projection-only outputs must go through the bench's hashing sink,
    // or count() prunes the actual fingerprint computation
    timed("winnow fingerprints") {
      val df = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text")
      graft.Bench.forceSink(df); -1L
    }
    timed("exact dedup") {
      val df = graft.operators.Dedup.exact(docs, "doc_id", "text")
      graft.Bench.forceSink(df); -1L
    }
    timed("span dedup (5-gram)") {
      // n tokens -> ~46 gram rows/doc through one window on the gram
      // hash; the 1% perturbed copies share long spans with their
      // source, so real redundant starts exist corpus-wide
      val df = graft.operators.Dedup.spanDedup(docs, "doc_id", "text", n = 5)
      graft.Bench.forceSink(df); -1L
    }
    timed("span dedup skew (1M-dup gram)") {
      // VERDICT r12 #4's adversarial case: ONE 5-gram repeated ~10^6
      // times corpus-wide (every doc opens with the same boilerplate
      // span). Under the old per-gram row_number window this funneled
      // a million-row occurrence list through one un-splittable task;
      // the min(struct)+count aggregate partial-combines it map-side
      // and the join back AQE-splits. The smoke passes when wall stays
      // in the same band as the unskewed span-dedup row above.
      import org.apache.spark.sql.functions.{col, concat, lit}
      val skewed = docs.withColumn("text",
        concat(lit("all rights reserved legal notice "), col("text")))
      val df = graft.operators.Dedup.spanDedup(skewed, "doc_id", "text", n = 5)
      graft.Bench.forceSink(df); -1L
    }
    timed("decontaminate vs 5k eval") {
      // the 1% perturbed copies as the "benchmark" split: each shares
      // long token runs with its train-side source, so ~all 5k eval
      // docs contaminate exactly one train doc (chance 13-gram
      // collisions are ~none at this vocab) — rows ≈ 5k
      import org.apache.spark.sql.functions.col
      graft.operators.CorpusClean.contaminationHits(
        docs.filter(col("doc_id") % 100 =!= 99),
        docs.filter(col("doc_id") % 100 === 99),
        "doc_id", "text", n = 13).count()
    }
    timed("boilerplate 5-grams") {
      // every 10th doc is verbatim boilerplate (the hot-bucket corpus):
      // its grams occur in ~n/10 distinct docs and must survive the
      // count-distinct collapse; the random remainder never crosses
      // minDocs — rows = the boilerplate sentence's gram count
      import org.apache.spark.sql.functions.{col, explode, lit, when}
      val hot = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          lit("common boilerplate header text repeated verbatim across the corpus"))
          .otherwise(col("text")))
      val units = graft.operators.Dedup.shingleSets(hot, "doc_id", "text", n = 5)
        .select(col("doc_id"), explode(col("shingles")).as("g"))
      graft.operators.CorpusClean.commonUnits(units, "doc_id", "g", minDocs = 3)
        .count()
    }
    timed("repetition stats") {
      val df = graft.operators.CorpusClean.repetitionStats(docs, "doc_id", "text")
      graft.Bench.forceSink(df); -1L
    }
    timed("unigram cross-entropy") {
      // q52's at-scale witness: 3M docs × 50 tokens over a 10k-word
      // vocab — the (doc,tok) aggregate is the big frame (~150M rows
      // pre-collapse) joining a 10k-row vocab. forceSink, NOT count():
      // count() lets Catalyst prune the entropy math, the vocab join,
      // and the total scan, timing a plan that never does the work
      val df = graft.operators.CorpusClean
        .unigramCrossEntropy(docs, "doc_id", "text")
      graft.Bench.forceSink(df); -1L
    }
    timed("hygiene pipeline e2e") {
      // full pre-tokenization chain over the 495k/5k train/eval split:
      // repetition gate (map-side) -> decontaminate (broadcast grams)
      // -> exact dedup keep-one -> stratified sample at 20%
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val strat = docs.withColumn("src",
        pmod(col("doc_id"), lit(20)).cast("string"))
      graft.operators.CorpusClean.hygienePipeline(
        strat.filter(col("doc_id") % 100 =!= 99),
        strat.filter(col("doc_id") % 100 === 99),
        "doc_id", "text", "src",
        (0 until 20).map(k => k.toString -> 0.2).toMap).count()
    }
    timed("hygiene gated e2e") {
      // the single-scan opt-in (VERDICT r10 next-round #6): persist the
      // repetition gate once, pass it back as `gated` — the cache fill
      // is the only corpus scan; the pipeline's two gate references
      // read from cache. Same parameters, same output rows as the
      // default two-scan phase above.
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val strat = docs.withColumn("src",
        pmod(col("doc_id"), lit(20)).cast("string"))
      val train = strat.filter(col("doc_id") % 100 =!= 99)
      val gate = graft.operators.CorpusClean
        .repetitionGate(train, "text").persist()
      try
        graft.operators.CorpusClean.hygienePipeline(
          train,
          strat.filter(col("doc_id") % 100 === 99),
          "doc_id", "text", "src",
          (0 until 20).map(k => k.toString -> 0.2).toMap,
          gated = Some(gate)).count()
      finally gate.unpersist(false)
    }
    timed("stratified sample") {
      import org.apache.spark.sql.functions.pmod
      val strat = docs.withColumn("src",
        pmod(org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.lit(20)).cast("string"))
      graft.operators.CorpusClean.stratifiedSample(strat, "doc_id", "src",
        (0 until 20).map(k => k.toString -> (0.05 + 0.05 * (k % 5))).toMap).count()
    }

    // ---- incremental cluster maintenance at scale (round 7):
    // full fixpoint over an accumulated 3M-node / 2M-edge graph vs
    // folding a 1k-pair micro-batch into its labeling. The merge's
    // fixpoint sees only the batch's QUOTIENT graph; the accumulated
    // graph contributes one broadcast-relabel scan of the components
    // table — so batch folds must sit at the per-job floor, not the
    // full-recompute time class (which grows with the graph).
    val bigPairs = spark.sparkContext.range(0, 1000000, 1, 24)
      .flatMap(i => Seq((i * 3, i * 3 + 1), (i * 3 + 1, i * 3 + 2)))
      .toDF("a", "b") // 1M chains of 3 nodes: diameter 2
    var labeling: org.apache.spark.sql.DataFrame = null
    timed("cc full 3M nodes") {
      labeling = graft.operators.Dedup.connectedComponents(bigPairs)
      labeling.count()
    }
    (1 to 2).foreach { b =>
      timed(s"mergeComponents 1k batch $b") {
        // 500 bridges between existing chains + 500 brand-new pairs
        val batch = spark.sparkContext.range(0, 500, 1, 4).flatMap { i =>
          Seq((i * 6 * (b + 1), i * 6 * (b + 1) + 3),        // bridge
              (1000000000L + b * 10000 + i * 2,               // fresh pair
               1000000000L + b * 10000 + i * 2 + 1))
        }.toDF("a", "b")
        labeling = graft.operators.Dedup.mergeComponents(labeling, batch)
        labeling.count()
      }
    }
    spark.stop()
  }
}
