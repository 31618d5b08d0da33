package graft.ops

import graft.SharedSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def binDf = Seq(
    (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 10, 20, 30)),
    (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 5, 6)),
    (3L, "<html><body>x</body></html>".getBytes("UTF-8")),
    (4L, null.asInstanceOf[Array[Byte]])
  ).toDF("id", "blob")

  test("decodeImages: schema appended, nulls pass through, deterministic") {
    val out = Multimodal.decodeImages(binDf, "blob")
    assert(out.schema.fieldNames.toSeq == Seq("id", "blob", "image_meta"))
    assert(out.schema("image_meta").dataType == Multimodal.imageMetaSchema)
    val rows = out.orderBy($"id").collect()
    assert(rows(3).isNullAt(2), "null blob must give null meta")
    val meta = rows(0).getStruct(2)
    assert(meta.getInt(0) >= 64 && meta.getInt(1) >= 64)
    assert(meta.getString(3) == "stub")
    // deterministic across runs
    val again = Multimodal.decodeImages(binDf, "blob").orderBy($"id").collect()
    assert(again(0).getStruct(2) == meta)
  }

  test("resize + frame sampling produce typed outputs of the right shape") {
    val resized = Multimodal.resizeImages(binDf.filter($"blob".isNotNull), "blob", 32, 32)
      .select($"id", length($"thumbnail").as("len")).collect()
    assert(resized.forall(_.getInt(1) == 32 * 32 / 64))
    val frames = Multimodal.sampleFrames(binDf.filter($"blob".isNotNull), "blob", 4)
      .select($"id", size($"frames").as("n")).collect()
    assert(frames.forall(_.getInt(1) == 4))
  }

  test("binaryFeatures sniffs magic bytes without any decode") {
    val out = Multimodal.binaryFeatures(binDf.filter($"blob".isNotNull), "blob")
      .select($"id", $"blob_sniffed_format").orderBy($"id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "png" && out(2L) == "jpeg" && out(3L) == "html")
  }

  test("batching preserves every row across multiple partitions") {
    val big = (0 until 1000).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "blob").repartition(7)
    val out = Multimodal.decodeImages(big, "blob", batchSize = 16)
    assert(out.count() == 1000L)
    assert(out.select(sum(when($"image_meta".isNull, 1).otherwise(0))).collect()(0).getLong(0) == 0L)
  }
}
