package graft.core

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic persistence for a VdbStore — the Spark re-expression of the
  * reference's tmp-file + os.replace protocol (pico_vdb.py:343-393).
  *
  * Layout: `<path>/` is a root holding immutable versioned snapshots
  * plus one pointer file:
  * {{{
  *   <path>/_current          # tiny file naming the live snapshot dir
  *   <path>/v-<nonce>/        # parquet dataset + _store_meta.json
  *                            #   (+ _ann_centroids parquet)
  * }}}
  * Save writes a brand-new snapshot dir, then atomically replaces the
  * pointer FILE (single-file rename-with-overwrite — the os.replace
  * analog; directory renames are not atomic-replace on HDFS-like
  * filesystems). A crash at ANY point leaves `_current` naming a
  * complete snapshot; stale snapshots are swept on the next save.
  */
object StoreIO {

  private val MetaFile = "_store_meta.json"
  private val AnnDir = "_ann_centroids"
  private[graft] val HnswDir = "_ann_hnsw"
  private val PqDir = "_pq_codebook"
  private val Pointer = "_current"

  /** Atomically flip `<root>/_current` to name `version` (tmp-file +
    * single-file rename-with-overwrite — the os.replace analog; shared
    * by the store snapshots and [[graft.operators.HnswIO]] snapshots).
    */
  private[graft] def flipPointer(conf: org.apache.hadoop.conf.Configuration,
                                 root: Path, version: String): Unit = {
    val fs = root.getFileSystem(conf)
    val tmpPtr = new Path(root, Pointer + ".tmp-" + version)
    val po = fs.create(tmpPtr, true)
    try po.write(version.getBytes(StandardCharsets.UTF_8))
    finally po.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
    fc.rename(tmpPtr, new Path(root, Pointer),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The snapshot dir `<root>/_current` names, if the pointer exists. */
  private[graft] def resolveCurrent(fs: FileSystem, root: Path): Option[Path] = {
    val ptr = new Path(root, Pointer)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val version =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
        finally in.close()
      Some(new Path(root, version))
    }
  }

  /** Best-effort sweep of superseded `v-*` snapshots (keeping the live
    * one plus the `keep` most recent others — a reader grace window)
    * and stale tmp pointers.
    */
  private[graft] def sweepStale(fs: FileSystem, root: Path,
                                version: String, keep: Int): Unit = {
    val entries = fs.listStatus(root)
    val keepPrev = entries
      .filter(st => st.getPath.getName.startsWith("v-") && st.getPath.getName != version)
      .sortBy(-_.getModificationTime)
      .take(keep).map(_.getPath.getName).toSet
    entries.foreach { st =>
      val name = st.getPath.getName
      val stale =
        (name.startsWith("v-") && name != version && !keepPrev(name)) ||
        name.startsWith(Pointer + ".tmp-")
      if (stale) try fs.delete(st.getPath, true)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Returns the written snapshot directory.
    *
    * SINGLE-WRITER assumption (like the reference's in-process store):
    * concurrent saves to the same path are not coordinated. Readers get a
    * grace window of `graft.snapshots.keep` superseded snapshots
    * (default 1) before the sweep deletes them — a long-running reader
    * holding an older snapshot's lineage past that window must re-load.
    */
  def save(store: VdbStore, path: String): String = {
    val keepCount = math.max(0, new GraftConf(store.spark).snapshotsKeep)
    val spark = store.spark
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    val version = "v-" + java.util.UUID.randomUUID().toString.take(12)
    val snap = new Path(root, version)
    try {
      store.df.write.mode("overwrite").parquet(snap.toString)
      // IVF index state rides along: centroids in an underscore-prefixed
      // subdir (invisible to the main parquet reader), nList in the meta
      // (reference persists its FAISS file next to the store the same
      // way, pico_vdb.py:261, 347, 362).
      store.annStateForSave.foreach { case (_, centroids) =>
        import store.spark.implicits._
        centroids.toSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }
          .toDF("cid", "c")
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(snap, AnnDir).toString)
      }
      // Fresh sharded-HNSW graphs ride along too (reference contract:
      // the FAISS index file persists beside the store and loads back
      // without a rebuild, pico_vdb.py:260-283, 347, 362). Written in
      // the SAME immutable snapshot dir as the parquet rows, so the
      // sidecar can never describe different rows than it sits next
      // to; a stale/absent cache simply skips it (load re-enables and
      // rebuilds lazily, the pre-r15 behavior).
      store.hnswStateForSave.foreach { st =>
        graft.operators.HnswIO.saveInto(st, new Path(snap, HnswDir).toString)
      }
      // A trained PQ codebook rides along the same way (it is
      // data-distribution state like the IVF centroids — m*ksub*dsub
      // floats, ~1 MB): one row per (subspace, code) centroid, so load
      // re-encodes the rows without paying the driver k-means again.
      store.pqStateForSave.foreach { cb =>
        import store.spark.implicits._
        (0 until cb.m * cb.ksub).map { i =>
          (i, cb.centroids.slice(i * cb.dsub, (i + 1) * cb.dsub).toSeq)
        }.toDF("idx", "c")
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(snap, PqDir).toString)
      }
      val out = fs.create(new Path(snap, MetaFile), true)
      try out.write(store.metaJson.getBytes(StandardCharsets.UTF_8))
      finally out.close()

      // Atomic pointer flip: write _current.tmp, rename over _current.
      flipPointer(conf, root, version)
    } catch {
      case e: Throwable =>
        if (fs.exists(snap)) fs.delete(snap, true)
        throw e
    }
    // Best-effort sweep: keep the new snapshot plus the most recent
    // `graft.snapshots.keep` previous ones (a grace window so a reader
    // that resolved an old pointer moments ago can still finish —
    // single-writer semantics, like the reference); everything older and
    // stale tmp pointers go.
    sweepStale(fs, root, version, keepCount)
    snap.toString
  }

  def load(spark: SparkSession, path: String): VdbStore = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    // Legacy layout (round-1 saves): dataset directly under <path>.
    val dataDir = resolveCurrent(fs, root).getOrElse(root)
    val metaStr = {
      val in = fs.open(new Path(dataDir, MetaFile))
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
    val (dim, annNList, hnswParams, pqParams, bitBits, additional) =
      parseMeta(metaStr)
    val df = spark.read.schema(VdbStore.schema).parquet(dataDir.toString)
    val store = VdbStore.fromDF(spark, dim, df, additional)
    annNList.foreach { n =>
      val annPath = new Path(dataDir, AnnDir)
      val centroids =
        if (fs.exists(annPath))
          spark.read.parquet(annPath.toString)
            .select("cid", "c").orderBy("cid").collect()
            .map(_.getSeq[Double](1).toArray)
        else Array.empty[Array[Double]]
      store.restoreAnn(n, centroids)
    }
    hnswParams.foreach { case (m, efc) =>
      val hnswPath = new Path(dataDir, HnswDir)
      store.restoreHnsw(m, efc,
        if (fs.exists(hnswPath)) Some(hnswPath.toString) else None)
    }
    pqParams.foreach { case (m, ksub) =>
      val pqPath = new Path(dataDir, PqDir)
      val book: Option[PqCodebook] =
        if (!fs.exists(pqPath)) None
        else try {
          val rows = spark.read.parquet(pqPath.toString)
            .select("idx", "c").orderBy("idx").collect()
          require(rows.length == m * ksub,
            s"codebook sidecar has ${rows.length} rows, meta says ${m * ksub}")
          val dsub = dim / m
          val flat = new Array[Float](m * ksub * dsub)
          // row-count alone is not enough: a sidecar with duplicated
          // idx rows and missing ones passes the length check but
          // leaves zero-filled centroid slots — a silently degraded
          // codebook instead of the intended loud failure. Track the
          // indices actually seen and require full 0..m*ksub-1
          // coverage (violations fall into the NonFatal retrain path).
          val seen = new java.util.BitSet(m * ksub)
          rows.foreach { r =>
            val i = r.getInt(0)
            require(i >= 0 && i < m * ksub,
              s"codebook row index $i out of range [0, ${m * ksub})")
            require(!seen.get(i), s"codebook row index $i duplicated")
            seen.set(i)
            val c = r.getSeq[Float](1)
            require(c.length == dsub,
              s"codebook row $i has ${c.length} dims, expected $dsub")
            var t = 0
            while (t < dsub) { flat(i * dsub + t) = c(t); t += 1 }
          }
          require(seen.cardinality() == m * ksub,
            s"codebook sidecar covers ${seen.cardinality()} of ${m * ksub} centroids")
          Some(new PqCodebook(dim, m, ksub, flat))
        } catch {
          case scala.util.control.NonFatal(e) =>
            VdbStore.log.warn(
              s"graft: persisted PQ codebook at $pqPath is unreadable/stale " +
                s"(${e.getMessage}) — the codebook will retrain on next use")
            None
        }
      store.restorePq(m, book)
    }
    // the bit sketch has no trained state: re-enabling from the meta
    // key alone fully restores it (hyperplanes regenerate from seed).
    // enableBit, not a restore shim, so a corrupt/hand-edited bit_bits
    // fails HERE with a diagnosable load error, not on every query.
    bitBits.foreach(store.enableBit)
    store.storagePath = Some(path)
    store
  }

  /** Minimal JSON parse for our own meta format. `additional_data`
    * values come back as RAW JSON text (nested objects/arrays/numbers
    * round-trip verbatim, matching the reference's json.dump side bag —
    * pico_vdb.py:364-371, 500-512).
    */
  private[graft] def parseMeta(s: String)
      : (Int, Option[Int], Option[(Int, Int)], Option[(Int, Int)],
         Option[Int], Map[String, String]) = {
    // The writer always emits embedding_dim (and ann_nlist / hnsw_m /
    // hnsw_efc, if any) BEFORE additional_data — match the scalar keys
    // only in that prefix, or a user value like {"cfg": {"ann_nlist":
    // 8}} inside the raw-JSON side bag would spuriously enable ANN on
    // load.
    val adMatch = """"additional_data"\s*:""".r.findFirstMatchIn(s)
    val head = adMatch.map(m => s.substring(0, m.start)).getOrElse(s)
    val dim = """"embedding_dim"\s*:\s*(\d+)""".r
      .findFirstMatchIn(head).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"no embedding_dim in $s"))
    val ann = """"ann_nlist"\s*:\s*(\d+)""".r
      .findFirstMatchIn(head).map(_.group(1).toInt)
    val hnsw = for {
      m <- """"hnsw_m"\s*:\s*(\d+)""".r
        .findFirstMatchIn(head).map(_.group(1).toInt)
      e <- """"hnsw_efc"\s*:\s*(\d+)""".r
        .findFirstMatchIn(head).map(_.group(1).toInt)
    } yield (m, e)
    val pq = for {
      m <- """"pq_m"\s*:\s*(\d+)""".r
        .findFirstMatchIn(head).map(_.group(1).toInt)
      k <- """"pq_ksub"\s*:\s*(\d+)""".r
        .findFirstMatchIn(head).map(_.group(1).toInt)
    } yield (m, k)
    val bit = """"bit_bits"\s*:\s*(\d+)""".r
      .findFirstMatchIn(head).map(_.group(1).toInt)
    val kv = adMatch match {
      case None    => Map.empty[String, String]
      case Some(m) => parseObject(s, skipWs(s, m.end))
    }
    (dim, ann, hnsw, pq, bit, kv)
  }

  /** True iff `v` is one complete JSON value (used to validate raw side
    * data at store time, so save() can't write an unloadable meta).
    */
  private[graft] def isJsonValue(v: String): Boolean = {
    val t = v.trim
    if (t.isEmpty) return false
    try {
      if (scanValue(t, 0) != t.length) return false
      t.charAt(0) match {
        case '"' | '{' | '[' => true
        case _ => t.matches("""-?\d+(\.\d+)?([eE][+-]?\d+)?|true|false|null""")
      }
    } catch { case _: IllegalArgumentException => false }
  }

  private[graft] def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** Parse the JSON object starting at `s(i0) == '{'`; values are kept
    * as raw JSON text slices.
    */
  private def parseObject(s: String, i0: Int): Map[String, String] = {
    require(i0 < s.length && s.charAt(i0) == '{', s"additional_data is not an object in $s")
    def at(i: Int): Char = if (i < s.length) s.charAt(i) else truncated(s)
    val out = Map.newBuilder[String, String]
    var i = skipWs(s, i0 + 1)
    if (at(i) == '}') return out.result()
    var done = false
    while (!done) {
      if (at(i) != '"') truncated(s)
      val keyEnd = scanString(s, i)
      val key = unescapeJson(s.substring(i + 1, keyEnd - 1))
      i = skipWs(s, keyEnd)
      require(at(i) == ':', s"expected ':' at $i in meta")
      i = skipWs(s, i + 1)
      if (i >= s.length) truncated(s)
      val vEnd = scanValue(s, i)
      out += key -> s.substring(i, vEnd)
      i = skipWs(s, vEnd)
      at(i) match {
        case ',' => i = skipWs(s, i + 1)
        case '}' => done = true
        case c   => throw new IllegalArgumentException(s"unexpected '$c' at $i in meta")
      }
    }
    out.result()
  }

  private def truncated(s: String): Nothing =
    throw new IllegalArgumentException(s"truncated/corrupt store meta: $s")

  /** End index (exclusive) of the JSON string starting at `s(i0) == '"'`.
    * Bounds-checked: a torn meta file raises IllegalArgumentException,
    * not StringIndexOutOfBoundsException.
    */
  private[graft] def scanString(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length && s.charAt(i) != '"')
      i += (if (s.charAt(i) == '\\') 2 else 1)
    if (i >= s.length) truncated(s)
    i + 1
  }

  /** End index (exclusive) of the JSON value starting at `i0`. */
  private[graft] def scanValue(s: String, i0: Int): Int = s.charAt(i0) match {
    case '"' => scanString(s, i0)
    case '{' | '[' =>
      var depth = 0
      var i = i0
      var scanning = true
      while (scanning) {
        if (i >= s.length) truncated(s)
        s.charAt(i) match {
          case '"'       => i = scanString(s, i)
          case '{' | '[' => depth += 1; i += 1
          case '}' | ']' => depth -= 1; i += 1
          case _         => i += 1
        }
        scanning = depth > 0
      }
      i
    case _ => // number / true / false / null
      var i = i0
      while (i < s.length && !",}] \t\n\r".contains(s.charAt(i))) i += 1
      i
  }

  private[graft] def unescapeJson(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
