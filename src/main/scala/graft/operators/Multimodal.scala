package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * BINARY payload columns with typed metadata structs; decode/feature
  * passes run as partition-wise batch transforms (the Scala analog of
  * pandas-UDF batches).
  *
  * The actual codec is a pluggable [[MediaDecoder]]; this container ships
  * no image/audio libraries, so the default is [[StubDecoder]] — a
  * clearly-marked deterministic fake derived from the payload's md5, which
  * keeps the Spark-side plumbing (schema, partitioning, batch shape) real
  * and testable, and is reproducible in the driver's DuckDB oracle.
  */
trait MediaDecoder extends Serializable {
  /** payload -> (width, height, nFrames) */
  def decode(payload: Array[Byte]): (Int, Int, Int)
}

/** Deterministic fake decode (NOT a real codec): width/height/frames are
  * functions of the payload md5 so tests and oracles can reproduce them.
  */
object StubDecoder extends MediaDecoder {
  def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  override def decode(payload: Array[Byte]): (Int, Int, Int) = {
    val h = md5hex(payload)
    (32 + h.charAt(0).toInt, 32 + h.charAt(1).toInt, 1 + h.charAt(2).toInt % 8)
  }
}

object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Decode features for a BINARY payload column, one partition-batch at a
    * time. Rows stream through the decoder; nothing is collected.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // null payload -> empty bytes (deterministic, no task crash)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h, f) = decoder.decode(payload)
        Row(id, payload.length.toLong, w, h, f)
      }
    }
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_width", IntegerType, nullable = false),
    StructField("src_height", IntegerType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false)))

  /** Aspect-preserving resize planning: decode source dims (stubbed codec,
    * real batch shape) and emit the target box fit. The pixel transform
    * itself would run here in the same partition pass with a real codec;
    * the geometry — the part an engine owns — is exact.
    */
  def resizePlan(df: DataFrame, idCol: String, payloadCol: String,
                 maxW: Int, maxH: Int,
                 decoder: MediaDecoder = StubDecoder): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(resizeSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _) = decoder.decode(
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray))
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        Row(r.getLong(0), w, h,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt))
      }
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sampled", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Frame sampling for video-shaped payloads: every `stride`-th frame
    * index (always including frame 0), one partition pass.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(frameSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, n) = decoder.decode(
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray))
        Row(r.getLong(0), n, (0 until n by stride).toArray)
      }
    }
  }
}
