package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{VdbRecord, VdbStore}

/** Ground-truth retrieval harness — the analog of the reference's
  * `bench/hf_upserts.py` + `bench/hf_query.py:22-51` end-to-end flow.
  *
  * The reference embeds 1200 real (context, question, answer) rows with a
  * sentence-transformer, upserts context embeddings with their metadata,
  * saves the store, then queries with QUESTION embeddings — vectors that
  * are near, but not identical to, the stored context vectors — and
  * counts how often the top-1 hit is NOT the question's own source
  * document ("total num of mismatches"). That validates retrieval on
  * STRUCTURED embeddings end-to-end, where the batch benches only ever
  * see uniform-random vectors.
  *
  * No embedding model ships in this environment, so the structure is
  * planted deterministically instead of learned: documents are clustered
  * points on the unit sphere (cluster center + per-doc noise — the shape
  * of real embedding corpora, and of the reference's parity fixture in
  * tests/test_task14_faiss_vs_numpy_results.py), and each query is its
  * source document's vector plus a SMALLER perturbation (the
  * question-vs-context relationship). Ground truth is the source doc's
  * id by construction; with queryNoise < docNoise the exact path must
  * return it at rank 1 for every query.
  *
  * The run drives the full production lifecycle, exactly like the
  * reference pair of scripts: upsert (with metadata) → save → LOAD a
  * fresh store from disk → query. Exact mismatches are asserted == 0 by
  * RetrievalGroundTruthSpec; the ANN mismatch curve per nProbe is
  * recorded in the bench artifact (`retrieval_mismatch`), with
  * nProbe = nList as the exact-parity anchor (must also be 0).
  */
object RetrievalGroundTruth {

  final case class Result(
      nDocs: Int,
      nQueries: Int,
      exactMismatches: Int,
      /** nProbe -> mismatch count through the ANN strategy. */
      annMismatches: Seq[(Int, Int)],
      annNList: Int,
      /** Mismatches through the q8 strategy (int8 scan + rescore). */
      q8Mismatches: Int = -1,
      /** Mismatches through the composed ann+q8 strategy at the
        * default nProbe (round 12). */
      composedMismatches: Int = -1,
      /** Top-5 disagreements between the filtered-ANN allow-set rung
        * at covering probes and the exact filtered scan (round 16 —
        * must be 0: covering membership-filtered probing IS the exact
        * filtered result). -1 when the run skipped the filtered leg.
        */
      filteredMismatches: Int = -1,
      /** Same parity through the Bloom rung (tiny cap + fpp 0.3
        * forced), exercising the FP verification + refill machinery
        * on the lifecycle corpus. */
      bloomFilteredMismatches: Int = -1,
      /** Same parity through the GRAPH rung (round 17 — strategy
        * "hnsw-filtered" at a store-covering beam, where every shard
        * serves the exact member scan; must be 0). -1 when skipped.
        */
      hnswFilteredMismatches: Int = -1)

  /** Deterministic unit-norm clustered corpus + perturbed queries.
    * Returns (docs, queries) where queries pair each query vector with
    * its ground-truth source doc id.
    */
  private[graft] def corpus(
      dim: Int,
      nDocs: Int,
      nClusters: Int,
      nQueries: Int,
      seed: Long): (IndexedSeq[(String, Array[Float])], IndexedSeq[(String, Array[Float])]) = {
    val rng = new java.util.Random(seed)
    def unitNoise(sigma: Double): Array[Double] =
      Array.fill(dim)(rng.nextGaussian() * sigma)
    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / math.max(n, 1e-12)).toFloat)
    }
    val centers = IndexedSeq.fill(nClusters)(normalize(unitNoise(1.0)).map(_.toDouble))
    // docNoise spreads docs inside a cluster; queryNoise perturbs a doc
    // into its "question". queryNoise << docNoise keeps the source doc
    // the unambiguous nearest neighbor (margin checked by the spec).
    // Both are TOTAL L2 norms: the per-coordinate sigma divides by
    // sqrt(dim), or a "0.35" noise at dim=128 would really be a
    // norm-3.96 blob drowning the unit centers — structure-free data
    // mislabeled clustered, the exact failure this harness exists to
    // stop measuring (round-10 self-review; AssignBench documents the
    // same trap).
    val docNoise = 0.35 / math.sqrt(dim.toDouble)
    val queryNoise = 0.10 / math.sqrt(dim.toDouble)
    val docs = (0 until nDocs).map { i =>
      val c = centers(i % nClusters)
      val v = unitNoise(docNoise)
      var j = 0
      while (j < dim) { v(j) += c(j); j += 1 }
      (s"doc-$i", normalize(v))
    }
    val queries = (0 until nQueries).map { qi =>
      // deterministic spread over the corpus (the reference samples 50
      // random rows; determinism here keeps the artifact reproducible)
      val src = (qi * 37) % nDocs
      val base = docs(src)._2
      val v = unitNoise(queryNoise)
      var j = 0
      while (j < dim) { v(j) += base(j); j += 1 }
      (docs(src)._1, normalize(v))
    }
    (docs, queries)
  }

  /** Full lifecycle run. `savePath` must be a writable scratch dir; the
    * store is saved there and re-loaded before any query runs.
    */
  def run(
      spark: SparkSession,
      savePath: String,
      dim: Int = 128,
      nDocs: Int = 1200,
      nClusters: Int = 24,
      nQueries: Int = 50,
      nProbes: Seq[Int] = Seq.empty): Result = {
    val (docs, queries) = corpus(dim, nDocs, nClusters, nQueries, seed = 20260813L)

    // upsert with metadata (the reference stores context/question/answer
    // beside the vector; a doc's meta travels through save/load and
    // comes back on every hit)
    val store = VdbStore.empty(spark, dim)
    store.upsert(docs.map { case (id, v) =>
      VdbRecord(id, v, s"""{"doc":"${id}","cluster":"${id.drop(4).toInt % nClusters}"}""")
    })
    store.save(savePath)

    // fresh store from disk — the query side of the reference pair
    // (hf_query.py opens storage_file="hfdata" written by hf_upserts.py)
    val loaded = VdbStore.load(spark, savePath)
    val qVecs = queries.map(_._2)

    // exact path, reference parameters (top_k=5, better_than=0.2)
    val exactHits = loaded.query(qVecs, topK = 5, betterThan = Some(0.2))
    require(loaded.lastQueryStrategy.contains("exact"),
      s"expected exact strategy, got ${loaded.lastQueryStrategy}")
    def mismatches(hits: Seq[Seq[graft.core.VdbHit]]): Int =
      hits.zip(queries).count { case (h, (truth, _)) =>
        h.isEmpty || h.head.id != truth
      }
    val exactMis = mismatches(exactHits)

    // q8 strategy on the same structured corpus (round 10): the int8
    // scan + full-precision rescore must preserve end-to-end retrieval.
    // Runs unthresholded (better_than bypasses q8 by design) and BEFORE
    // enableAnn (ANN outranks q8 when both are on).
    loaded.enableQ8()
    val q8Hits = loaded.query(qVecs, topK = 5)
    require(loaded.lastQueryStrategy.contains("q8"),
      s"expected q8 strategy, got ${loaded.lastQueryStrategy}")
    val q8Mis = mismatches(q8Hits)
    loaded.disableQ8()

    // ANN strategy per nProbe. Auto-mode nList is only resolved by the
    // first build, so trigger it with a one-vector probe, then sweep:
    // defaults cover sparse probing (1, 4), the engine default
    // (nList/2), and nProbe = nList — the exact-parity anchor that must
    // also report 0 mismatches.
    loaded.enableAnn()
    loaded.query(qVecs.take(1), topK = 1)
    val nList = loaded.annInfo.nList
    val probes =
      (if (nProbes.nonEmpty) nProbes
       else Seq(1, 4, graft.operators.IvfIndex.defaultNProbe(nList), nList))
        .filter(_ >= 1).distinct.sorted
    val annResults = probes.map { np =>
      val hits = loaded.query(qVecs, topK = 5, nProbe = np)
      require(loaded.lastQueryStrategy.contains("ann"),
        s"expected ann strategy, got ${loaded.lastQueryStrategy}")
      (np, mismatches(hits))
    }
    // composed IVF-SQ8 strategy (round 12): both accelerators on, the
    // engine routes int8 bucket scan + fp32 rescore; default nProbe
    loaded.enableQ8()
    val composedHits = loaded.query(qVecs, topK = 5)
    require(loaded.lastQueryStrategy.contains("ann+q8"),
      s"expected ann+q8 strategy, got ${loaded.lastQueryStrategy}")
    val composedMis = mismatches(composedHits)

    // filtered-ANN parity on the lifecycle corpus (round 16): with the
    // opt-in on, a cluster-restricted query at covering probes must
    // reproduce the exact filtered scan's top-5 list for list —
    // through the allow-set rung AND the bloom rung (tiny cap + a
    // brutal fpp forced, so the FP verification + refill machinery is
    // what earns the zero).
    loaded.disableQ8()
    import org.apache.spark.sql.functions.{col, get_json_object}
    val whereEven =
      get_json_object(col("meta"), "$.cluster").cast("int") % 2 === 0
    val exactF = loaded.query(qVecs, topK = 5, where = Some(whereEven))
    require(loaded.lastQueryStrategy.contains("exact-filtered"),
      s"expected exact-filtered strategy, got ${loaded.lastQueryStrategy}")
    def listMis(a: Seq[Seq[graft.core.VdbHit]],
                b: Seq[Seq[graft.core.VdbHit]]): Int =
      a.zip(b).count { case (x, y) => x.map(_.id) != y.map(_.id) }
    val sconf = spark.conf
    val (filteredMis, bloomMis, hnswFMis) =
      try {
        sconf.set("graft.ann.filtered", "true")
        val fHits = loaded.query(qVecs, topK = 5, where = Some(whereEven),
          nProbe = nList)
        require(loaded.lastQueryStrategy.contains("ann-filtered"),
          s"expected ann-filtered strategy, got ${loaded.lastQueryStrategy}")
        sconf.set("graft.ann.filtered.max", "2")
        sconf.set("graft.ann.filtered.bloom.fpp", "0.3")
        val bHits = loaded.query(qVecs, topK = 5, where = Some(whereEven),
          nProbe = nList)
        require(loaded.lastQueryStrategy.contains("ann-filtered+bloom"),
          s"expected ann-filtered+bloom strategy, got ${loaded.lastQueryStrategy}")
        // graph rung (round 17): hnsw outranks ann under the same
        // opt-in; at a store-covering beam every shard serves the
        // exact member scan, so the list-for-list parity must be 0
        Seq("graft.ann.filtered.max", "graft.ann.filtered.bloom.fpp")
          .foreach(sconf.unset)
        loaded.enableHnsw()
        val hHits = loaded.query(qVecs, topK = 5, where = Some(whereEven),
          efSearch = nDocs)
        require(loaded.lastQueryStrategy.contains("hnsw-filtered"),
          s"expected hnsw-filtered strategy, got ${loaded.lastQueryStrategy}")
        loaded.disableHnsw()
        (listMis(fHits, exactF), listMis(bHits, exactF), listMis(hHits, exactF))
      } finally {
        loaded.disableHnsw()
        Seq("graft.ann.filtered", "graft.ann.filtered.max",
          "graft.ann.filtered.bloom.fpp").foreach(sconf.unset)
      }
    Result(nDocs, nQueries, exactMis, annResults, nList, q8Mis, composedMis,
      filteredMis, bloomMis, hnswFMis)
  }

  /** Text-featurized variant (VERDICT r10 "what's missing" #1): the
    * planted-cluster corpus above is the right sandbox call, but its
    * geometry is isotropic — real embedding corpora are anisotropic and
    * shell-concentrated, which is where IVF recall defaults earn or
    * lose their keep. This run featurizes the TESTDATA documents with
    * the deterministic hashing-trick n-gram projection
    * ([[graft.operators.TextFeaturize]], no model download) and drives
    * the same full lifecycle: upsert with metadata → save → load →
    * query, exact / q8 / ANN-per-nProbe.
    *
    * Queries are EXCERPTS (the middle `excerptFrac` of each source
    * doc's text, the question-vs-context relationship), so the query
    * vector is near but not equal to its doc's. Ground truth is the
    * source doc, made unambiguous BY CONSTRUCTION: query docs are
    * screened (deterministically, driver-side) to those whose excerpt
    * vector retrieves the doc itself with a cosine margin over every
    * other corpus doc — so exact/q8 mismatches measure the engine's
    * retrieval round-trip, not the featurizer's discrimination, while
    * the ANN curves keep their full information.
    */
  def runTextFeaturized(
      spark: SparkSession,
      savePath: String,
      docsParquet: String,
      dim: Int = 256,
      nQueries: Int = 50,
      excerptFrac: Double = 0.6): Result = {
    import org.apache.spark.sql.functions.col
    import graft.operators.TextFeaturize
    val texts = spark.read.parquet(docsParquet)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (s"doc-${r.getLong(0)}", r.getString(1)))
      .sortBy(_._1)
    val docs = texts.map { case (id, t) => (id, TextFeaturize.featurize(t, dim)) }

    // Unambiguity screen, in FEATURE space: a query doc qualifies only
    // when its excerpt vector's nearest corpus doc is the doc itself,
    // with a cosine margin over the runner-up. The corpus is the dedup
    // fixture — near-duplicates are ambiguous retrieval targets by
    // construction, and a gram-Jaccard proxy screen proved leaky at
    // 5,000 docs (2/50 excerpts resolved to a sub-threshold neighbor).
    // Screening on the actual retrieval geometry makes ground truth
    // unambiguous BY CONSTRUCTION — like the planted-cluster corpus —
    // so exact/q8 mismatches measure the ENGINE (upsert→save→load→
    // query round-trip), not the featurizer's discrimination. The
    // approximate strategies' curves stay fully informative. Only a
    // bounded pool (8x the needed queries) is screened, each against
    // the WHOLE corpus, in parallel: O(pool × D × dim) driver flops.
    def excerptVec(t: String): Array[Float] = {
      val from = (t.length * (1 - excerptFrac) / 2).toInt
      val until = math.min(t.length, from + math.max(1, (t.length * excerptFrac).toInt))
      TextFeaturize.featurize(t.substring(from, until), dim)
    }
    val margin = 0.02
    val poolSize = math.min(texts.length, nQueries * 8)
    val okFlags = new Array[Boolean](poolSize)
    java.util.stream.IntStream.range(0, poolSize).parallel().forEach { i =>
      val ev = excerptVec(texts(i)._2)
      var best = -2.0; var bestJ = -1; var second = -2.0
      var j = 0
      while (j < docs.length) {
        val v = docs(j)._2
        var s = 0.0; var c = 0
        while (c < dim) { s += ev(c).toDouble * v(c); c += 1 }
        if (s > best) { second = best; best = s; bestJ = j }
        else if (s > second) second = s
        j += 1
      }
      okFlags(i) = bestJ == i && best - second >= margin
    }
    val unambiguous = (0 until poolSize).filter(okFlags)
    require(unambiguous.nonEmpty,
      s"text-featurized screen rejected every candidate doc (pool=$poolSize, " +
        s"margin=$margin) — corpus too duplicate-dense for excerpt queries")
    // stride coprime with the pool size, so the query set never
    // collapses onto a cycle of 1-2 documents when 37 | length
    val stride = Iterator.from(37)
      .find(s => BigInt(s).gcd(BigInt(unambiguous.length)) == 1).get
    val queryIdx = (0 until nQueries).map(qi =>
      unambiguous((qi * stride) % unambiguous.length))
    val queries = queryIdx.map { i => (texts(i)._1, excerptVec(texts(i)._2)) }

    val store = VdbStore.empty(spark, dim)
    store.upsert(docs.toIndexedSeq.map { case (id, v) =>
      VdbRecord(id, v, s"""{"doc":"${id}"}""")
    })
    store.save(savePath)
    val loaded = VdbStore.load(spark, savePath)
    val qVecs = queries.map(_._2)

    def mismatches(hits: Seq[Seq[graft.core.VdbHit]]): Int =
      hits.zip(queries).count { case (h, (truth, _)) =>
        h.isEmpty || h.head.id != truth
      }
    val exactHits = loaded.query(qVecs, topK = 5)
    require(loaded.lastQueryStrategy.contains("exact"),
      s"expected exact strategy, got ${loaded.lastQueryStrategy}")
    val exactMis = mismatches(exactHits)

    loaded.enableQ8()
    val q8Hits = loaded.query(qVecs, topK = 5)
    require(loaded.lastQueryStrategy.contains("q8"),
      s"expected q8 strategy, got ${loaded.lastQueryStrategy}")
    val q8Mis = mismatches(q8Hits)
    loaded.disableQ8()

    loaded.enableAnn()
    loaded.query(qVecs.take(1), topK = 1)
    val nList = loaded.annInfo.nList
    val probes = Seq(1, 4, graft.operators.IvfIndex.defaultNProbe(nList), nList)
      .filter(_ >= 1).distinct.sorted
    val annResults = probes.map { np =>
      val hits = loaded.query(qVecs, topK = 5, nProbe = np)
      require(loaded.lastQueryStrategy.contains("ann"),
        s"expected ann strategy, got ${loaded.lastQueryStrategy}")
      (np, mismatches(hits))
    }
    loaded.enableQ8()
    val composedHits = loaded.query(qVecs, topK = 5)
    require(loaded.lastQueryStrategy.contains("ann+q8"),
      s"expected ann+q8 strategy, got ${loaded.lastQueryStrategy}")
    val composedMis = mismatches(composedHits)
    Result(docs.length, queries.length, exactMis, annResults, nList, q8Mis,
      composedMis)
  }

  /** Standalone runner: prints one JSON-ish line for ad-hoc checks. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-rgt").toString
    val r = run(spark, s"$dir/store")
    println(s"retrieval_mismatch exact=${r.exactMismatches} " +
      s"q8=${r.q8Mismatches} " +
      r.annMismatches.map { case (np, m) => s"np$np=$m" }.mkString(" ") +
      s" filtered_cover=${r.filteredMismatches} " +
      s"filtered_bloom=${r.bloomFilteredMismatches} " +
      s"nList=${r.annNList} nQueries=${r.nQueries}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val rt = runTextFeaturized(spark, s"$dir/store-text",
      s"$sfDir/documents.parquet")
    println(s"retrieval_mismatch_text exact=${rt.exactMismatches} " +
      s"q8=${rt.q8Mismatches} " +
      rt.annMismatches.map { case (np, m) => s"np$np=$m" }.mkString(" ") +
      s" nList=${rt.annNList} nQueries=${rt.nQueries}")
    spark.stop()
  }
}
