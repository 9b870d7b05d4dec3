package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def normalizeOf(v: Array[Float]): Array[Float] =
    Seq(Tuple1(v)).toDF("v")
      .select(normalize_l2(col("v")).as("n"))
      .collect()(0).getSeq[Float](0).toArray

  test("normalize_l2 produces unit vectors") {
    val n = normalizeOf(Array(3f, 4f))
    assert(math.abs(n(0) - 0.6f) < 1e-6 && math.abs(n(1) - 0.8f) < 1e-6)
  }

  test("normalize_l2 zero vector maps to e0 (reference pico_vdb.py:58-68)") {
    val n = normalizeOf(Array(0f, 0f, 0f))
    assert(n.toSeq == Seq(1f, 0f, 0f))
  }

  test("normalize_l2 is idempotent and unit-norm (seeded property sweep)") {
    val rng = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val v = Array.fill(1 + rng.nextInt(32))((rng.nextFloat() - 0.5f) * 200f)
      val n1 = normalizeOf(v)
      val norm = math.sqrt(n1.map(x => x.toDouble * x).sum)
      val n2 = normalizeOf(n1)
      assert(math.abs(norm - 1.0) < 1e-5)
      n1.zip(n2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }
    }
  }

  test("dot_product matches a local loop, double accumulation") {
    val a = Array(0.1f, -2.5f, 3f, 4f)
    val b = Array(1.5f, 0.5f, -1f, 2f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).collect()(0).getDouble(0)
    val want = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosine_sim of identical vectors is 1") {
    val v = Array(0.3f, -0.7f, 2f)
    val got = Seq((v, v)).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(got - 1.0) < 1e-9)
  }

  test("content_id = md5 of normalized float32 LE bytes (numpy parity)") {
    // e0 normalized is itself; bytes = 00 00 80 3f + zeros
    val got = Seq(Tuple1(Array(1f, 0f))).toDF("v")
      .select(content_id(col("v"))).collect()(0).getString(0)
    val bytes = Array[Byte](0, 0, -128, 63, 0, 0, 0, 0)
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val want = md.map(b => f"${b & 0xff}%02x").mkString
    assert(got == want)
  }

  test("hierarchical assignment: deterministic bit-equal bucketing on fixed centroids") {
    // VERDICT r9 next-round #5. The two-level path is deliberately
    // approximate (its scaladoc owns that trade); what the spec pins:
    // (1) on FIXED centroids the bucketing is bit-equal across runs and
    // partitionings (a pure per-row function — the incremental
    // re-bucket contract), (2) every centroid belongs to exactly one
    // group, (3) on cluster-structured rows it agrees with the flat
    // exact argmax almost everywhere, (4) IvfIndex.assign selects the
    // hierarchical path at k >= 256 and the flat path below.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new scala.util.Random(77)
    val dim = 24
    val k = 300
    val cents: Array[Array[Double]] = Array.fill(k) {
      val c = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    val flat = new Array[Double](k * dim)
    (0 until k).foreach(c => System.arraycopy(cents(c), 0, flat, c * dim, dim))
    val plan = NearestCentroid.planFor(flat, dim)
    assert(plan.members.map(_.length).sum == k)
    assert(plan.members.flatten.sorted.toSeq == (0 until k))

    // cluster-structured rows: centroid + small noise (the data IVF
    // exists for); flat-argmax agreement must be near-total
    val w = NearestCentroid.defaultProbeGroups(k)
    val rows = (0 until 3000).map { i =>
      val c = cents(i % k)
      (i.toLong, Array.tabulate(dim)(j => (c(j) + rng.nextGaussian() * 0.05).toFloat))
    } ++ Seq((3000L, Array.fill(dim)(0f)), (3001L, Array.fill(dim / 2)(1f)))
    var agree = 0
    rows.foreach { case (_, v) =>
      val ad = new GenericArrayData(v.map(Float.box))
      val f = NearestCentroid.nearest(ad, flat, dim, true)
      val h = NearestCentroid.nearestHier(ad, flat, dim, true, plan, w)
      if (f == h) agree += 1
    }
    assert(agree >= (rows.size * 0.97).toInt,
      s"hier/flat agreement too low on clustered rows: $agree/${rows.size}")

    // determinism across partitionings: identical buckets, bit-equal
    val df = rows.toDF("id", "vec")
    def buckets(d: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      d.select(col("id"), nearest_centroid_hier(col("vec"), cents, w).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b1 = buckets(df.repartition(7))
    val b2 = buckets(df.repartition(3, col("id")))
    assert(b1 == b2, "bucketing must be partitioning-independent")
    // ...and bit-equal to the driver-side per-row function
    rows.foreach { case (id, v) =>
      val ad = new GenericArrayData(v.map(Float.box))
      assert(b1(id) == NearestCentroid.nearestHier(ad, flat, dim, true, plan, w))
    }

    // IvfIndex.assign path selection: k=300 -> hierarchical buckets,
    // k=100 -> flat buckets
    val hierIdx = operators.IvfIndex.assign(df, cents, "id", "vec",
      cacheAssigned = false)
    val hierGot = hierIdx.assigned.select("id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hierGot == b1, "assign at k=300 must use the hierarchical path")
    val flatIdx = operators.IvfIndex.assign(df, cents.take(100), "id", "vec",
      cacheAssigned = false)
    val flat100 = flat.take(100 * dim)
    flatIdx.assigned.select("id", "centroid_id").collect().foreach { r =>
      val ad = new GenericArrayData(
        rows(r.getLong(0).toInt)._2.map(Float.box))
      assert(r.getInt(1) == NearestCentroid.nearest(ad, flat100, dim, true),
        "assign below the threshold must stay exact flat")
    }
  }

  test("expressions survive codegen in a realistic plan") {
    val df = (0 until 100).map(i => (i.toLong, Array.fill(8)(i.toFloat + 1)))
      .toDF("id", "v")
    val out = df.select(col("id"), dot_product(normalize_l2(col("v")),
      normalize_l2(col("v"))).as("s")).collect()
    assert(out.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-6))
  }

  test("vector_avg pools element-wise across partitions, skips nulls, rejects mixed dims") {
    import spark.implicits._
    // 8 partitions force partial-buffer merges through serialize/merge
    val df = spark.sparkContext.parallelize(
        (0 until 100).map(i => (i % 4, Array(i.toFloat, 2f * i))), 8)
      .toDF("g", "v")
    val out = df.groupBy("g").agg(vector_avg(col("v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    // group g holds i = g, g+4, ..., g+96: mean = g + 48
    (0 until 4).foreach { g =>
      assert(out(g) == Seq((g + 48).toDouble, 2.0 * (g + 48)), s"group $g")
    }
    // null vectors are skipped, not zero-counted
    val withNull = Seq((1, Some(Array(1f, 3f))), (1, None), (1, Some(Array(3f, 5f))))
      .toDF("g", "v")
    val m = withNull.groupBy("g").agg(vector_avg(col("v")).as("m"))
      .collect()(0).getSeq[Double](1)
    assert(m == Seq(2.0, 4.0))
    // dimension mismatch fails loudly (silent truncation would corrupt
    // the pooled embedding)
    val bad = Seq((1, Array(1f, 2f)), (1, Array(1f, 2f, 3f))).toDF("g", "v")
    val err = intercept[Exception] {
      bad.groupBy("g").agg(vector_avg(col("v")).as("m")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(t =>
      t.getMessage != null && t.getMessage.contains("dimension mismatch")))
  }

  test("registerAll exposes every custom expression to spark.sql") {
    graft.functions.registerAll(spark)
    Seq((1L, "a b a b a b", Array(1f, 3f)), (2L, "p q r s", Array(3f, 5f)))
      .toDF("id", "text", "v").createOrReplaceTempView("sqlfns")
    val row = spark.sql(
      """SELECT size(word_ngrams_distinct(split(text, ' '), 2)) AS ng,
        |       size(winnow_fps(split(text, ' '), 2, 2)) AS wf,
        |       repetition_stats(split(text, ' '), 2).dup_frac AS df,
        |       simhash64(split(text, ' ')) AS sh
        |FROM sqlfns WHERE id = 1""".stripMargin).collect()(0)
    assert(row.getInt(0) == 2 && row.getInt(1) >= 1
      && row.getDouble(2) == 1.0 && row.getString(3).length == 64)
    val agg = spark.sql(
      """SELECT top_k_hits(CAST(id AS DOUBLE), id, 1) AS top,
        |       vector_avg(v) AS m
        |FROM sqlfns""".stripMargin).collect()(0)
    assert(agg.getSeq[org.apache.spark.sql.Row](0).head.getLong(0) == 2L)
    assert(agg.getSeq[Double](1) == Seq(2.0, 4.0))
    // non-literal int parameter is a loud analysis error, not a crash
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_ngrams_distinct(split(text,' '), CAST(id AS INT)) FROM sqlfns")
        .collect()
    }
  }
}
