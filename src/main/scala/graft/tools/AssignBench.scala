package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused measurement for the IVF coarse-assignment pass (VERDICT r9
  * next-round #5): the distributed `nearest_centroid` map is the whole
  * build cost at scale (~447 s of the 452 s 10M-row build in the r9
  * ScaleSmoke), and it grows as √N per row. This times the SAME pass
  * at the 10M × 256-d / √N-list shape through both paths on one JVM —
  * flat exact argmax and the two-level `nearest_centroid_hier` that
  * [[graft.operators.IvfIndex.assign]] selects at this list count —
  * and measures (a) the hierarchical path's determinism (two passes
  * must fold bit-identically) and (b) its bucketing agreement with the
  * flat argmax (the approximation-quality number recorded in
  * SCALING.md).
  *
  * Design note, recorded so it isn't retried: an EXACT two-level
  * (branch-and-bound with Cauchy-Schwarz group bounds, padded for fp)
  * was implemented and measured first — flat 13.1 s vs bounded 14.0 s
  * at 1M × 1000 lists on clustered data. In 256-d the centroids are
  * near-orthogonal, every k-means group of centroids has an L2 radius
  * rivaling the inter-centroid gaps, and the bound |q|·r never
  * excludes a group; exact pruning is geometry-dead here, which is why
  * the shipped path is the standard approximate hierarchical
  * quantizer.
  *
  * Row generation is seeded and identical across passes; a
  * generation-only baseline pass is measured and subtracted so the
  * reported assign-only numbers isolate the argmax work.
  *
  * Env: SPARK_GRAFT_ASSIGN_N (default 10,000,000), SPARK_GRAFT_ASSIGN_DIM
  * (256), SPARK_GRAFT_ASSIGN_MODE=clustered|uniform (clustered),
  * SPARK_GRAFT_ASSIGN_FLAT=0 to skip the slow flat pass.
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_N", "10000000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_DIM", "256").toInt
    val runFlat = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_FLAT", "1") == "1"
    val mode = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_MODE", "clustered")
    val spark = SparkSession.builder()
      .master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nList = graft.operators.IvfIndex.defaultNList(n)
    val nClusters = nList // one planted cluster per list, the IVF ideal
    val clustered = mode == "clustered"
    def mkDf = spark.sparkContext.range(0L, n, 1, 240).map { i =>
      val rng = new java.util.Random(i * 6364136223846793005L + 1442695040888963407L)
      val v =
        if (!clustered) Array.fill(dim)(rng.nextFloat())
        else {
          // planted cluster: deterministic unit center + gaussian noise
          // of TOTAL norm ~0.3 (per-coord sigma scales 1/sqrt(dim) — a
          // fixed per-coord sigma would make noise norm ~sigma*16 at
          // 256-d and drown the unit centers, i.e. structure-free data
          // mislabeled clustered)
          val sigma = 0.3 / math.sqrt(dim.toDouble)
          val crng = new java.util.Random((i % nClusters) * 2654435761L + 17)
          val c = Array.fill(dim)(crng.nextGaussian())
          val cn = math.sqrt(c.map(x => x * x).sum)
          Array.tabulate(dim)(j =>
            (c(j) / cn + rng.nextGaussian() * sigma).toFloat)
        }
      (i, v)
    }.toDF("id", "vec")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // centroids: the production fit (sampled local k-means), untimed
    // here (FitBench owns that number — 5.6 s at this shape)
    val cents = graft.operators.IvfIndex.fitCentroids(
      mkDf, "vec", nList, normalized = false)
    System.err.println(s"fit done: nList=$nList dim=$dim n=$n")

    def fold(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(id, cid))")).collect()(0).getLong(0)

    val probeGroups = sys.env.get("SPARK_GRAFT_ASSIGN_W").map(_.toInt)
      .getOrElse(graft.functions.NearestCentroid.defaultProbeGroups(nList))
    def flatDf = mkDf.select(col("id"),
      graft.functions.nearest_centroid(col("vec"), cents).as("cid"))
    def hierDf = mkDf.select(col("id"),
      graft.functions.nearest_centroid_hier(col("vec"), cents, probeGroups)
        .as("cid"))
    // generation baseline over a vec-dependent value so the whole row
    // materializes; subtract from the assign passes to isolate argmax
    def baseDf = mkDf.select(col("id"), size(col("vec")).as("cid"))

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("generate_only") = timed { fold(baseDf); () }

    var flatSum = 0L
    if (runFlat) results("assign_flat") = timed { flatSum = fold(flatDf) }
    var hierSum = 0L
    results("assign_hier") = timed { hierSum = fold(hierDf) }
    // determinism witness: a second hier pass must fold identically
    val hierSum2 = fold(hierDf)
    require(hierSum == hierSum2, "hier assignment non-deterministic across runs")

    // bucketing agreement (approximation quality): one combined pass
    val agreeFrac =
      if (!runFlat) -1.0
      else {
        val r = mkDf.select(
            graft.functions.nearest_centroid(col("vec"), cents).as("f"),
            graft.functions.nearest_centroid_hier(col("vec"), cents, probeGroups)
              .as("h"))
          .agg(sum(when(col("f") === col("h"), 1L).otherwise(0L)).as("ok"),
            count(lit(1)).as("all"))
          .collect()(0)
        r.getLong(0).toDouble / math.max(1L, r.getLong(1))
      }
    // Approximation quality where it matters: id-agreement undercounts
    // quality because fitted centroid sets always carry near-ties
    // (k-means drops 2+ centroids into one data cluster; their Voronoi
    // neighbors straddle groups), and "disagreeing" onto a centroid
    // whose dot is within epsilon of the argmax is a fine bucket for
    // ANN probing. So: driver-side 10k-row sample, score of the
    // hier-chosen centroid vs the true max dot — mean and p99 relative
    // gap, plus the fraction of rows whose gap exceeds 1%.
    val sampleRows = mkDf.limit(10000).collect().map { r =>
      r.getSeq[Float](1).toArray
    }
    val plan = graft.functions.NearestCentroid.planFor(
      { val f = new Array[Double](cents.length * dim)
        cents.indices.foreach(c => System.arraycopy(cents(c), 0, f, c * dim, dim))
        f }, dim)
    val flatArr = {
      val f = new Array[Double](cents.length * dim)
      cents.indices.foreach(c => System.arraycopy(cents(c), 0, f, c * dim, dim))
      f
    }
    def dot(v: Array[Float], c: Int): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { s += flatArr(c * dim + j) * v(j); j += 1 }
      s
    }
    val gaps = sampleRows.map { v =>
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(Float.box))
      val f = graft.functions.NearestCentroid.nearest(ad, flatArr, dim, true)
      val h = graft.functions.NearestCentroid.nearestHier(ad, flatArr, dim,
        true, plan, probeGroups)
      val fs = dot(v, f)
      val hs = dot(v, h)
      if (fs <= 0) 0.0 else math.max(0.0, (fs - hs) / math.abs(fs))
    }.sorted
    val meanGap = gaps.sum / math.max(1, gaps.length)
    val p99Gap = gaps((gaps.length * 99) / 100)
    val gapOver1pct = gaps.count(_ > 0.01).toDouble / math.max(1, gaps.length)

    val parts = results.map { case (k, v) => s""""$k":${"%.1f".format(v)}""" }
    println(s"""{"n":$n,"dim":$dim,"nList":$nList,"mode":"$mode","probe_groups":$probeGroups,${parts.mkString(",")},"agree_frac":${"%.4f".format(agreeFrac)},"score_gap_mean":${"%.5f".format(meanGap)},"score_gap_p99":${"%.5f".format(p99Gap)},"gap_over_1pct_frac":${"%.4f".format(gapOver1pct)},"hier_deterministic":true}""")
    spark.stop()
  }
}
