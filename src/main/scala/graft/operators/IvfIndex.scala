package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}

/** IVF (inverted-file) ANN index — the batch-native analog of the
  * reference's FAISS HNSW accelerator (pico_vdb.py:169-212, 866-921).
  * HNSW's pointer-chasing graph build is inherently sequential and does
  * not map to Spark's execution model; IVF does: cluster the store into
  * nList centroid partitions (MLlib KMeans), persist `centroid_id` as a
  * partition column, and at query time prune to the nProbe nearest
  * centroids before running the exact top-k inside — the tuning knob
  * nProbe plays the role of efSearch.
  *
  * Scale: the index build is one KMeans fit (sampled) + one assignment
  * pass; search touches nProbe/nList of the data. Maintenance mirrors the
  * reference's lazy/incremental scheme (pico_vdb.py:195-204): new rows
  * get nearest-centroid assignments (cheap incremental); a full
  * re-cluster is only needed when the store has drifted (change ratio
  * heuristic, like the reference's 0.2 incremental threshold).
  */
final class IvfIndex(
    val centroids: Array[Array[Double]],
    val assigned: DataFrame, // original columns + centroid_id INT
    val idCol: String,
    val vecCol: String) extends Serializable {

  def nList: Int = centroids.length

  /** Nearest-centroid ids for one query vector (driver-side; centroids
    * are tiny by construction).
    */
  private[operators] def probesFor(q: Array[Double], nProbe: Int): Array[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length && j < q.length) { s += c(j) * q(j); j += 1 }
      (-s, i) // inner product similarity, descending
    }.sorted.take(nProbe).map(_._2)

  /** ANN top-k: prune to nProbe centroid partitions per query, exact
    * cosine top-k inside the pruned set. Output: qid, id, score, rank.
    */
  def search(queries: Array[(Long, Array[Float])], k: Int, nProbe: Int,
             normalized: Boolean = true): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    // (qid, probe centroid) pairs — broadcast-joined against the store's
    // centroid_id so each query only scans its probed partitions.
    val qnorm: Array[(Long, Array[Double])] = queries.map { case (qid, v) =>
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      qid -> (if (!normalized && n != 0.0) d.map(_ / n)
              else if (n == 0.0) { val e = new Array[Double](d.length); if (e.nonEmpty) e(0) = 1.0; e }
              else d)
    }
    val probes = qnorm.flatMap { case (qid, q) =>
      probesFor(q, nProbe).map(c => (qid, c))
    }.toSeq.toDF("qid", "centroid_id")
    val qdf = qnorm.toSeq.toDF("qid", "qvec")

    val rawScore = graft.functions.dot_product(col("qvec"),
      col(vecCol).cast("array<double>"))
    val score =
      if (normalized) rawScore
      else {
        val n = sqrt(graft.functions.l2_norm_sq(col(vecCol)))
        when(n === 0.0, lit(0.0)).otherwise(rawScore / n)
      }
    val cand = assigned
      .join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(qdf), Seq("qid"))
      .select(col("qid"), col(idCol).as("id"), score.as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

object IvfIndex {

  /** Build the index: KMeans over (a sample of) the vector column, then
    * one assignment pass adding `centroid_id`. Vectors are expected
    * L2-normalized (cosine == inner product), matching the store's
    * write-time invariant.
    */
  def build(store: DataFrame, idCol: String, vecCol: String,
            nList: Int, seed: Long = 42L, sampleFraction: Double = 1.0,
            normalized: Boolean = true, maxIter: Int = 8): IvfIndex = {
    val spark = store.sparkSession
    import spark.implicits._
    val featureSrc =
      if (normalized) col(vecCol)
      else graft.functions.normalize_l2(col(vecCol).cast("array<float>"))
    val feats = store.select(col(idCol), col(vecCol))
      .withColumn("features", arrayToVecUdf(featureSrc))
    val trainSrc = if (sampleFraction < 1.0) feats.sample(sampleFraction, seed) else feats
    // Partition quality, not convergence, is what IVF needs: a handful of
    // Lloyd iterations yields the same recall at nProbe/nList pruning, and
    // each iteration is a full Spark job at build time.
    val model = new KMeans()
      .setK(nList).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features")
      .fit(trainSrc)
    val assigned = model.transform(feats)
      .withColumnRenamed(model.getPredictionCol, "centroid_id")
      .drop("features")
    new IvfIndex(model.clusterCenters.map(_.toArray), assigned.cache(), idCol, vecCol)
  }

  private val arrayToVecUdf =
    udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
}
