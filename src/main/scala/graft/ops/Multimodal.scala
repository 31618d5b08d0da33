package graft.ops

import graft.core.WyHash

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as batched partition-level transforms (the Scala
  * analog of `mapInPandas`: iterator-to-iterator over fixed-size batches, so
  * a real decoder would amortize model/codec setup per batch, not per row).
  *
  * ==== STUB NOTICE ====
  * This container has no image/audio codecs, so the actual byte decoding is a
  * clearly-marked DETERMINISTIC FAKE (`stubDecode*` below): it derives
  * plausible metadata and features from the bytes via wyhash. Everything
  * around it — schemas, null handling, batch shape, partition preservation,
  * column pruning — is real and tested; swapping in a real codec is replacing
  * the one pure function.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  val DefaultBatchSize = 64

  /** DETERMINISTIC FAKE decode of an "image": metadata from the content hash,
    * mean intensity from an actual byte scan (so the plumbing moves real
    * bytes). A production build replaces this body with e.g. javax.imageio.
    */
  private[ops] def stubDecodeImage(bytes: Array[Byte]): Row = {
    val h = WyHash.hash(bytes, 0, bytes.length, 0L)
    val width = 64 + ((h & 0x3ff).toInt)
    val height = 64 + (((h >>> 10) & 0x3ff).toInt)
    val channels = if (((h >>> 20) & 1L) == 0L) 3 else 1
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    Row(width, height, channels, "stub", mean)
  }

  /** DETERMINISTIC FAKE resize: keeps a content-hash "thumbnail" of the target
    * size (real byte output, fake pixels).
    */
  private[ops] def stubResize(bytes: Array[Byte], w: Int, hgt: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, (w * hgt) / 64))
    var i = 0
    while (i < out.length) {
      out(i) = (WyHash.hash(bytes, 0, bytes.length, i.toLong) & 0xff).toByte
      i += 1
    }
    out
  }

  /** DETERMINISTIC FAKE frame sampling of a "video": n equal slices of the
    * byte stream stand in for decoded frames.
    */
  private[ops] def stubSampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (bytes.isEmpty) Seq.empty
    else (0 until n).map { i =>
      val start = (bytes.length.toLong * i / n).toInt
      val end = (bytes.length.toLong * (i + 1) / n).toInt
      java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1))
    }
  }

  /** Batched partition transform: the mapInPandas shape. Appends the decoded
    * metadata struct for `binCol`; batches of `batchSize` rows mimic Arrow
    * record batches (a real decoder initializes once per batch).
    */
  def decodeImages(df: DataFrame, binCol: String,
      outCol: String = "image_meta", batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema :+ StructField(outCol, imageMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec/model init)
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val meta = if (bytes == null) null else stubDecodeImage(bytes)
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }
  }

  /** Batched resize: appends a `binary` thumbnail column. */
  def resizeImages(df: DataFrame, binCol: String, width: Int, height: Int,
      outCol: String = "thumbnail", batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val thumb = if (bytes == null) null else stubResize(bytes, width, height)
          Row.fromSeq(row.toSeq :+ thumb)
        }
      }
    }
  }

  /** Batched frame sampling: appends an `array<binary>` of n frames. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
      outCol: String = "frames", batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema :+
      StructField(outCol, ArrayType(BinaryType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val frames = if (bytes == null) null else stubSampleFrames(bytes, n)
          Row.fromSeq(row.toSeq :+ frames)
        }
      }
    }
  }

  /** Pure-column feature extraction that needs no codec at all: byte length +
    * content hash + magic-byte sniffing (real logic, not a stub).
    */
  def binaryFeatures(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    df.withColumn(s"${binCol}_bytes", length(b))
      .withColumn(s"${binCol}_hash", graft.functions.wyhash64(b))
      .withColumn(s"${binCol}_sniffed_format",
        when(b.startsWith(lit(Array[Byte](0x89.toByte, 'P', 'N', 'G'))), "png")
          .when(b.startsWith(lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))), "jpeg")
          .when(b.startsWith(lit("RIFF".getBytes("UTF-8"))), "riff")
          .when(b.startsWith(lit(Array[Byte]('<', 'h', 't', 'm', 'l'))), "html")
          .otherwise("unknown"))
  }
}
