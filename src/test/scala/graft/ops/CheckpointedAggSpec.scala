package graft.ops

import java.nio.file.Files

import graft.SharedSpark
import graft.functions._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CheckpointedAggSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_ckpt_").toString

  private def writeInput(): String = {
    val dir = tmp() + "/input"
    (0 until 20000).map(i => ("lang" + (i % 6), i.toLong % 5000))
      .toDF("lang", "v").repartition(8)
      .write.parquet(dir)
    dir
  }

  test("checkpointed result equals direct aggregation, with correct metrics") {
    val input = writeInput()
    val ckpt = tmp() + "/ckpt"
    val result = CheckpointedAgg.run(spark, input, Seq("lang"), "v", ckpt)
      .orderBy($"lang").collect()
    val direct = spark.read.parquet(input).groupBy($"lang")
      .agg(ce_approx_distinct($"v").as("d"), count(lit(1)).as("n"))
      .orderBy($"lang").collect()
    assert(result.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // rows_scanned metric matches true row counts per key
    assert(result.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(2))).toSeq)
    // lineage: every key merged sketches from all 8 input files
    assert(result.forall(_.getLong(3) == 8L))
  }

  test("resume after partial run: only missing splits processed, same answer") {
    val input = writeInput()
    val ckpt = tmp() + "/ckpt"
    val files = spark.read.parquet(input).inputFiles.toSeq
    // simulate a job killed after 3 of 8 files
    val n1 = CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt,
      onlyFiles = Some(files.take(3)))
    assert(n1 == 3)
    assert(CheckpointedAgg.completedSplits(spark, ckpt).size == 3)
    // resume: processes exactly the remaining 5
    val n2 = CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt)
    assert(n2 == 5)
    // idempotent: a third run does nothing
    assert(CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt) == 0)
    val result = CheckpointedAgg.finalizeStage(spark, ckpt, Seq("lang"))
      .orderBy($"lang").collect()
    val direct = spark.read.parquet(input).groupBy($"lang")
      .agg(ce_approx_distinct($"v").as("d")).orderBy($"lang").collect()
    assert(result.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("double-committed split is harmless (idempotent union, max-rows metric)") {
    val input = writeInput()
    val ckpt = tmp() + "/ckpt"
    val files = spark.read.parquet(input).inputFiles.toSeq
    CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt)
    // forcibly re-commit one split as its own committed batch (commit race)
    val dup = spark.read.parquet(files.head)
      .groupBy(lit(files.head).as("split_id"), $"lang")
      .agg(graft.functions.ce_sketch($"v").as("sketch"), count(lit(1)).as("rows"))
    dup.write.parquet(ckpt + "/batch_9999999999999_dup")
    val result = CheckpointedAgg.finalizeStage(spark, ckpt, Seq("lang"))
      .orderBy($"lang").collect()
    val direct = spark.read.parquet(input).groupBy($"lang")
      .agg(ce_approx_distinct($"v").as("d"), count(lit(1)).as("n"))
      .orderBy($"lang").collect()
    assert(result.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("torn batch without _SUCCESS is ignored and its splits get reprocessed") {
    val input = writeInput()
    val ckpt = tmp() + "/ckpt"
    val files = spark.read.parquet(input).inputFiles.toSeq
    CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt,
      onlyFiles = Some(files.take(4)))
    // simulate a kill mid-commitJob: drop the _SUCCESS marker of that batch
    val batchDir = new java.io.File(ckpt).listFiles()
      .filter(_.getName.startsWith("batch_")).head
    assert(new java.io.File(batchDir, "_SUCCESS").delete())
    assert(CheckpointedAgg.completedSplits(spark, ckpt).isEmpty)
    // rerun processes ALL files again (the torn batch is never trusted)
    assert(CheckpointedAgg.checkpointStage(spark, input, Seq("lang"), "v", ckpt) == 8)
    val result = CheckpointedAgg.finalizeStage(spark, ckpt, Seq("lang"))
      .orderBy($"lang").collect()
    val direct = spark.read.parquet(input).groupBy($"lang")
      .agg(graft.functions.ce_approx_distinct($"v").as("d"), count(lit(1)).as("n"))
      .orderBy($"lang").collect()
    assert(result.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
