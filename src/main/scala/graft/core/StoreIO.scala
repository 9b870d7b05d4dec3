package graft.core

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic persistence for a VdbStore: one parquet dataset + a tiny
  * `_store_meta.json` ({embedding_dim, additional_data}), the Spark
  * re-expression of the reference's 3-file format + atomic
  * tmp-write-then-replace (pico_vdb.py:42-51, 343-393). Atomicity comes
  * from writing everything under `<path>.tmp-<nonce>` and renaming the
  * directory over the target; a crash mid-write leaves the old dataset
  * untouched and at most a stale tmp dir.
  */
object StoreIO {

  private val MetaFile = "_store_meta.json"
  private val AnnDir = "_ann_centroids"

  def save(store: VdbStore, path: String): Unit = {
    val spark = store.spark
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    try {
      store.df.write.mode("overwrite").parquet(tmp.toString)
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
          .write.mode("overwrite").parquet(new Path(tmp, AnnDir).toString)
      }
      val out = fs.create(new Path(tmp, MetaFile), true)
      try out.write(store.metaJson.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val backup = new Path(path + ".old-" + java.util.UUID.randomUUID().toString.take(8))
      val hadOld = fs.exists(target)
      if (hadOld && !fs.rename(target, backup))
        throw new java.io.IOException(s"could not stage old store at $target")
      if (!fs.rename(tmp, target)) {
        if (hadOld) fs.rename(backup, target) // roll back
        throw new java.io.IOException(s"could not move new store to $target")
      }
      if (hadOld) fs.delete(backup, true)
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  def load(spark: SparkSession, path: String): VdbStore = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val metaPath = new Path(target, MetaFile)
    val metaStr = {
      val in = fs.open(metaPath)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
    val (dim, annNList, additional) = parseMeta(metaStr)
    val df = spark.read.schema(VdbStore.schema).parquet(path)
    val store = VdbStore.fromDF(spark, dim, df, additional)
    annNList.foreach { n =>
      val annPath = new Path(target, AnnDir)
      val centroids =
        if (fs.exists(annPath))
          spark.read.parquet(annPath.toString)
            .select("cid", "c").orderBy("cid").collect()
            .map(_.getSeq[Double](1).toArray)
        else Array.empty[Array[Double]]
      store.restoreAnn(n, centroids)
    }
    store.storagePath = Some(path)
    store
  }

  /** Minimal JSON parse for our own flat meta format. */
  private[core] def parseMeta(s: String): (Int, Option[Int], Map[String, String]) = {
    val dim = """"embedding_dim"\s*:\s*(\d+)""".r
      .findFirstMatchIn(s).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"no embedding_dim in $s"))
    val ann = """"ann_nlist"\s*:\s*(\d+)""".r
      .findFirstMatchIn(s).map(_.group(1).toInt)
    val inner = """"additional_data"\s*:\s*\{(.*)\}\s*\}\s*$""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val kv = pair.findAllMatchIn(inner).map { m =>
      unescape(m.group(1)) -> unescape(m.group(2))
    }.toMap
    (dim, ann, kv)
  }

  private def unescape(s: String): String = {
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
