package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import graft.core.{StoreIO, VdbStore}

/** Migration source/sink for the REFERENCE's native on-disk layout
  * (pico_vdb.py:42-51, 330-393): a base path `store` fans out to
  *
  *   - `store.ids.json`  — JSON array of slot ids (row order; a
  *     tombstoned slot keeps its id, a never-used memmap slot is null)
  *   - `store.vecs.npy`  — numpy .npy v1.0, float32 C-order (N, dim)
  *   - `store.meta.json` — {"embedding_dim", "data": [doc|null, ...],
  *     "additional_data": {...}} where doc dicts INCLUDE `_id_`
  *
  * `load` lets a picovdb user point this engine at their existing
  * files; `save` writes a store back in the same layout (tmp + rename
  * per file, mirroring the reference's os.replace protocol). Both are
  * driver-side migration utilities by design — the reference's format
  * is a single in-RAM matrix, so anything it wrote fits on the driver;
  * the scale path is the engine's own parquet snapshots (StoreIO).
  *
  * Deviations (README "Deliberate deviations"): ids are canonically
  * STRING here, so an int id 7 imports as "7" and exports as the JSON
  * string "7".
  */
object PicoStore {

  // ------------------------------------------------------------- load

  def load(spark: SparkSession, basePath: String): VdbStore = {
    val conf = spark.sparkContext.hadoopConfiguration
    def readAll(p: String): String = {
      val path = new Path(p)
      val in = path.getFileSystem(conf).open(path)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
    val idsRaw = parseArray(readAll(s"$basePath.ids.json"))
    val metaStr = readAll(s"$basePath.meta.json")
    val top = parseObjectOrdered(metaStr, StoreIO.skipWs(metaStr, 0))
    def topVal(k: String): Option[String] = top.collectFirst { case (`k`, v) => v }
    val dim = topVal("embedding_dim")
      .map(_.trim.toInt)
      .getOrElse(throw new IllegalArgumentException(s"no embedding_dim in $basePath.meta.json"))
    val docsRaw = topVal("data").map(parseArray)
      .getOrElse(throw new IllegalArgumentException(s"no data array in $basePath.meta.json"))
    val additional: Map[String, String] = topVal("additional_data")
      .map(v => parseObjectOrdered(v, StoreIO.skipWs(v, 0)).toMap)
      .getOrElse(Map.empty)

    val (npDim, matrix) = readNpy(spark, s"$basePath.vecs.npy")
    require(npDim == dim || matrix.isEmpty,
      s"vecs.npy dim $npDim != embedding_dim $dim")
    require(idsRaw.length == docsRaw.length && idsRaw.length == matrix.length,
      s"slot misalignment: ids=${idsRaw.length} docs=${docsRaw.length} vecs=${matrix.length}")

    val rows = idsRaw.indices.flatMap { i =>
      val idJson = idsRaw(i).trim
      val docJson = docsRaw(i).trim
      if (idJson == "null" && docJson == "null") None // never-used memmap slot
      else {
        val id = jsonScalarToString(idJson)
        if (docJson == "null") // tombstone: doc None, vector zeroed (pico delete)
          Some(Row(id, matrix(i), null, true))
        else {
          // doc includes _id_ (pico upsert keeps it); our meta column is
          // the metadata WITHOUT the reserved id key
          val fields = parseObjectOrdered(docJson, StoreIO.skipWs(docJson, 0))
            .filterNot(_._1 == "_id_")
          val meta =
            if (fields.isEmpty) null
            else fields.map { case (k, v) =>
              s""""${graft.core.VdbStore.jsonEsc(k)}": $v"""
            }.mkString("{", ", ", "}")
          Some(Row(id, matrix(i), meta, false))
        }
      }
    }
    // id canonicalization (int 7 -> "7") can collide with a string "7"
    // that the reference kept distinct — fail fast rather than import
    // duplicate active _id_ rows (they'd break the unique-id invariant).
    val activeIds = rows.collect { case r if !r.getBoolean(3) => r.getString(0) }
    val dupes = activeIds.groupBy(identity).collect { case (id, g) if g.size > 1 => id }
    require(dupes.isEmpty,
      s"ids collide after string canonicalization (README id deviation): ${dupes.take(5).mkString(", ")}")

    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq,
        math.max(1, math.min(spark.sparkContext.defaultParallelism, rows.size))),
      VdbStore.schema)
    val store = VdbStore.fromDF(spark, dim, df, additional)
    // The reference persists an optional FAISS index next to the matrix
    // and rebuilds it when stale/dim-mismatched on load
    // (pico_vdb.py:260-283). We can't parse a FAISS file, but its
    // presence means the user ran with ANN on — mirror the stale-index
    // path: enable the IVF accelerator and let the first unfiltered
    // query build it (nList ~ sqrt(active), the standard IVF default).
    val faiss = new Path(s"$basePath.vecs.npy.faiss")
    if (faiss.getFileSystem(conf).exists(faiss)) {
      val active = rows.count(r => !r.getBoolean(3))
      store.enableAnn(math.max(1, math.min(4096, math.round(math.sqrt(active.toDouble)).toInt)))
    }
    store
  }

  // ------------------------------------------------------------- save

  /** Write `store` in the reference layout. Slots are emitted active
    * rows first then tombstones, each sorted by id (our DataFrame has
    * no slot order; only the three-file row alignment matters).
    */
  def save(store: VdbStore, basePath: String): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = store.df
      .select(col("_id_"), col("_vector_"), col("meta"), col("deleted"))
      .collect()
      .sortBy(r => (r.getBoolean(3), r.getString(0)))
    val dim = store.dim
    val ids = rows.map(r => "\"" + graft.core.VdbStore.jsonEsc(r.getString(0)) + "\"")
    val docs = rows.map { r =>
      if (r.getBoolean(3)) "null"
      else {
        val idJson = "\"" + graft.core.VdbStore.jsonEsc(r.getString(0)) + "\""
        Option(r.getString(2)) match {
          case None => s"""{"_id_": $idJson}"""
          case Some(m) =>
            val t = m.trim
            require(t.startsWith("{") && t.endsWith("}"),
              s"meta for ${r.getString(0)} is not a JSON object; cannot export")
            val inner = t.substring(1, t.length - 1).trim
            if (inner.isEmpty) s"""{"_id_": $idJson}"""
            else s"""{"_id_": $idJson, $inner}"""
        }
      }
    }
    val matrix = rows.map { r =>
      val v = r.getSeq[Float](1).toArray
      if (r.getBoolean(3)) new Array[Float](dim) else v // pico zeroes tombstones
    }
    val additional = store.getAdditionalDataJson.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${graft.core.VdbStore.jsonEsc(k)}": $v""" }
      .mkString("{", ", ", "}")

    val conf = store.spark.sparkContext.hadoopConfiguration
    def writeAtomic(dest: String, bytes: Array[Byte]): Unit = {
      val destPath = new Path(dest)
      val fs = destPath.getFileSystem(conf)
      val tmp = new Path(dest + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(destPath.toUri, conf)
      fc.rename(tmp, destPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    writeAtomic(s"$basePath.ids.json",
      ids.mkString("[", ", ", "]").getBytes(StandardCharsets.UTF_8))
    writeAtomic(s"$basePath.vecs.npy", npyBytes(matrix, dim))
    writeAtomic(s"$basePath.meta.json",
      (s"""{"embedding_dim": $dim, "data": ${docs.mkString("[", ", ", "]")}, """ +
        s""""additional_data": $additional}""").getBytes(StandardCharsets.UTF_8))
  }

  // -------------------------------------------------------- npy codec

  /** Read a numpy .npy v1.x/2.x file of C-order little-endian float32
    * (N, dim) — the only layout the reference writes (pico_vdb.py:26,
    * 71-73). Returns (dim, rows).
    */
  private[graft] def readNpy(spark: SparkSession, path: String): (Int, Array[Array[Float]]) = {
    val p = new Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val bytes = try in.readAllBytes() finally in.close()
    require(bytes.length >= 10 &&
      (bytes(0) & 0xff) == 0x93 &&
      new String(bytes, 1, 5, StandardCharsets.US_ASCII) == "NUMPY",
      s"$path is not a .npy file")
    val major = bytes(6) & 0xff
    val (headerLen, headerOff) =
      if (major == 1)
        (((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff), 10)
      else { // v2/v3: 4-byte little-endian header length
        require(bytes.length >= 12, s"truncated npy header in $path")
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    // torn files raise a diagnosable error, matching the meta scanner
    require(headerLen >= 0 && headerOff + headerLen <= bytes.length,
      s"truncated npy header in $path: declared $headerLen bytes, file has ${bytes.length}")
    val header = new String(bytes, headerOff, headerLen, StandardCharsets.US_ASCII)
    require(header.contains("'descr': '<f4'") || header.contains("\"descr\": \"<f4\""),
      s"unsupported npy dtype in $path: $header")
    require(header.contains("'fortran_order': False") || header.contains("\"fortran_order\": false"),
      s"fortran-order npy unsupported: $header")
    val shape = """'shape':\s*\((\s*\d+\s*(?:,\s*\d+\s*)?),?\)""".r
      .findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt))
      .getOrElse(throw new IllegalArgumentException(s"no shape in npy header: $header"))
    val (n, dim) = shape match {
      case Array(a, b) => (a, b)
      case Array(a)    => (a, 1)
      case _ => throw new IllegalArgumentException(s"npy shape not 2-D: $header")
    }
    val data = ByteBuffer.wrap(bytes, headerOff + headerLen,
      bytes.length - headerOff - headerLen).order(ByteOrder.LITTLE_ENDIAN)
    require(data.remaining() >= n.toLong * dim * 4,
      s"npy payload truncated: ${data.remaining()} bytes for $n x $dim float32")
    val out = Array.ofDim[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = new Array[Float](dim)
      var j = 0
      while (j < dim) { row(j) = data.getFloat(); j += 1 }
      out(i) = row
      i += 1
    }
    (if (n == 0) 0 else dim, out)
  }

  /** numpy .npy v1.0 bytes for a C-order float32 (N, dim) matrix —
    * byte-compatible with `np.save` (64-byte-aligned header, trailing
    * newline).
    */
  private[graft] def npyBytes(rows: Array[Array[Float]], dim: Int): Array[Byte] = {
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': (${rows.length}, $dim), }"
    val unpadded = 10 + dict.length + 1 // magic+ver+len + dict + '\n'
    val padded = ((unpadded + 63) / 64) * 64
    val headerLen = padded - 10
    val buf = ByteBuffer.allocate(padded + rows.length * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
    buf.put(1.toByte).put(0.toByte)
    buf.put((headerLen & 0xff).toByte).put(((headerLen >> 8) & 0xff).toByte)
    buf.put(dict.getBytes(StandardCharsets.US_ASCII))
    var pad = padded - unpadded
    while (pad > 0) { buf.put(' '.toByte); pad -= 1 }
    buf.put('\n'.toByte)
    rows.foreach { row =>
      require(row.length == dim, s"row dim ${row.length} != $dim")
      row.foreach(buf.putFloat)
    }
    buf.array()
  }

  // ------------------------------------------------------ json pieces

  /** Raw element slices of a JSON array. */
  private[graft] def parseArray(s: String): Vector[String] = {
    val i0 = StoreIO.skipWs(s, 0)
    require(i0 < s.length && s.charAt(i0) == '[', s"expected JSON array: ${s.take(40)}")
    val out = Vector.newBuilder[String]
    var i = StoreIO.skipWs(s, i0 + 1)
    if (i < s.length && s.charAt(i) == ']') return out.result()
    var done = false
    while (!done) {
      require(i < s.length, s"truncated JSON array: ${s.take(40)}")
      val end = StoreIO.scanValue(s, i)
      out += s.substring(i, end)
      i = StoreIO.skipWs(s, end)
      require(i < s.length, s"truncated JSON array: ${s.take(40)}")
      s.charAt(i) match {
        case ',' => i = StoreIO.skipWs(s, i + 1)
        case ']' => done = true
        case c   => throw new IllegalArgumentException(s"unexpected '$c' in JSON array")
      }
    }
    out.result()
  }

  /** Ordered (key, raw value) pairs of a JSON object starting at `i0`. */
  private[graft] def parseObjectOrdered(s: String, i0: Int): Seq[(String, String)] = {
    require(i0 < s.length && s.charAt(i0) == '{', s"expected JSON object: ${s.take(40)}")
    val out = Seq.newBuilder[(String, String)]
    var i = StoreIO.skipWs(s, i0 + 1)
    if (i < s.length && s.charAt(i) == '}') return out.result()
    var done = false
    while (!done) {
      require(i < s.length && s.charAt(i) == '"', s"expected key at $i in object")
      val keyEnd = StoreIO.scanString(s, i)
      val key = StoreIO.unescapeJson(s.substring(i + 1, keyEnd - 1))
      i = StoreIO.skipWs(s, keyEnd)
      require(i < s.length && s.charAt(i) == ':', s"expected ':' at $i in object")
      i = StoreIO.skipWs(s, i + 1)
      require(i < s.length, "truncated JSON object")
      val vEnd = StoreIO.scanValue(s, i)
      out += key -> s.substring(i, vEnd)
      i = StoreIO.skipWs(s, vEnd)
      require(i < s.length, "truncated JSON object")
      s.charAt(i) match {
        case ',' => i = StoreIO.skipWs(s, i + 1)
        case '}' => done = true
        case c   => throw new IllegalArgumentException(s"unexpected '$c' in JSON object")
      }
    }
    out.result()
  }

  /** JSON scalar id -> canonical string id ("7" for 7, unquoted+
    * unescaped for strings — README id deviation).
    */
  private def jsonScalarToString(v: String): String =
    if (v.length >= 2 && v.charAt(0) == '"' && v.charAt(v.length - 1) == '"')
      StoreIO.unescapeJson(v.substring(1, v.length - 1))
    else v
}
