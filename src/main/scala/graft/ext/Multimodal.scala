package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-local batch transforms
  * (`mapPartitions` — the Scala analog of arrow-batched Python UDFs).
  * North-star extension (SURVEY.md §2.C).
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly-marked deterministic STUB (`StubCodec`) — everything around
  * it (schema contract, binary transport, batch iteration shape,
  * partition-parallel execution, output schema) is real and is exactly what
  * a codec-backed implementation would keep.
  *
  * Scale design: per-row transforms only — no shuffle. Binary payloads
  * never hit the driver; `mapPartitions` streams batches through the
  * executor. Partitioning of the input (file layout / `repartition` by id)
  * carries through untouched.
  */
object Multimodal {

  /** Metadata carried beside every media payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("modality", StringType),      // image | audio | video
    StructField("format", StringType),        // e.g. png, wav, mp4 (stub: "bin")
    StructField("byte_length", LongType),
    StructField("content_md5", StringType)))

  /** Output schema of the stub image decoder / feature extractor. */
  val ImageFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Attach the metadata struct to a binary column — pure columnar. */
  def withMediaMeta(df: DataFrame, binCol: String, modality: String, format: String = "bin"): DataFrame =
    df.withColumn("media_meta", struct(
      lit(modality).as("modality"),
      lit(format).as("format"),
      length(col(binCol)).cast("long").as("byte_length"),
      md5(col(binCol)).as("content_md5")))

  /** STUB media codec — deterministic fake decode so the pipeline shape is
    * testable without image/audio libraries in the container. A real build
    * swaps `decodeImage` for e.g. an ImageIO/JavaCV call with the SAME
    * signature; nothing else changes.
    */
  object StubCodec {
    /** "Decode" an image: derive (width, height, channels) and a 8-float
      * feature vector deterministically from the payload bytes. Dimensions
      * come from the first 60 bits of the payload's MD5 — content-addressed
      * AND replayable in SQL (both engines agree on md5 + hex→int), so the
      * correctness oracle can check the decode plumbing end to end.
      */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) // 60 bits, nonnegative
      val width = (16 + h % 1024).toInt
      val height = (16 + (h / 1024) % 1024).toInt
      val channels = (1 + h % 3).toInt
      // Deterministic "features": byte histogram moments over 8 buckets.
      val buckets = new Array[Long](8)
      bytes.foreach(b => buckets((b & 0xff) / 32) += 1)
      val n = math.max(bytes.length, 1).toFloat
      (width, height, channels, buckets.map(_ / n))
    }

    /** "Sample" video frame offsets: every `everyNBytes` offset (a real
      * implementation samples every Nth frame timestamp).
      */
    def sampleFrameOffsets(bytes: Array[Byte], everyNBytes: Int): Array[Long] =
      (0L until bytes.length.toLong by everyNBytes.toLong).toArray

    /** "Resize" an image payload to a target pixel budget: deterministic
      * byte-decimation proportional to the area ratio (a real
      * implementation re-encodes at the target WxH; the payload-shrinks,
      * stays-binary, schema-stable contract is what matters here).
      */
    def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val (w, h, _, _) = decodeImage(bytes)
      val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h).toDouble)
      val outLen = math.max(1, math.ceil(bytes.length * ratio).toInt)
      val step = bytes.length.toDouble / outLen
      Array.tabulate(outLen)(i => bytes(math.min(bytes.length - 1, (i * step).toInt)))
    }
  }

  /** Decode+featurize an image binary column batch-wise. Input: any frame
    * with (`idCol` long, `binCol` binary). Output: id + ImageFeatureType
    * fields. Runs partition-local: executors stream rows, no shuffle, and
    * the iterator shape matches an arrow-batched UDF (batch in, batch out).
    */
  def imageFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(StructField("id", LongType) +: ImageFeatureType.fields)
    val in = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, c, feats) = StubCodec.decodeImage(bytes)
        Row(id, w, h, c, feats.toSeq)
      }
    }.toDF("id", "width", "height", "channels", "features")
  }

  /** Resize an image binary column to a target pixel budget — batch-wise,
    * partition-local, payload stays opaque binary with refreshed metadata.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType),
      StructField("byte_length", LongType)))
    val in = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val resized = StubCodec.resizeImage(r.getAs[Array[Byte]](1), targetW, targetH)
        Row(r.getLong(0), resized, resized.length.toLong)
      }
    }.toDF("id", "content", "byte_length")
  }

  /** Frame-sample a video binary column: one output row per sampled frame
    * offset (flatMap shape — batch in, variable batch out).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, everyNBytes: Int = 4096): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_index", IntegerType),
      StructField("frame_offset", LongType)))
    val in = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        StubCodec.sampleFrameOffsets(bytes, everyNBytes).zipWithIndex.map {
          case (off, i) => Row(id, i, off)
        }
      }
    }.toDF("id", "frame_index", "frame_offset")
  }
}
