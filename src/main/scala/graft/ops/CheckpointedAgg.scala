package graft.ops

import graft.functions._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable two-stage distinct-count job with per-partition lineage and
  * row-count metrics (north-rule requirement).
  *
  * Stage 1 aggregates per (input file, group keys) and appends
  * `(split_id, keys..., sketch, rows)` rows to a checkpoint directory —
  * `split_id` is the input file path, i.e. the lineage of that sketch. A
  * rerun lists the splits already committed and processes only the remaining
  * input files, so a killed job loses at most the in-flight (uncommitted)
  * stage — Spark's output commit protocol keeps the checkpoint dir free of
  * torn writes.
  *
  * Stage 2 (finalize) folds the checkpoint: first per (split, keys) with
  * sketch-union + max(rows) — making a double-committed split harmless for
  * both the estimate (union is idempotent) and the metric — then per keys
  * with union + sum(rows). Correctness rides on merge associativity/
  * commutativity exactly like Spark's own partial aggregation
  * (reference merge matrix, src/estimator.rs:287-333).
  */
object CheckpointedAgg {

  /** Splits already committed to the checkpoint. */
  def completedSplits(spark: SparkSession, ckptDir: String): Set[String] = {
    if (!exists(spark, ckptDir)) Set.empty
    else spark.read.parquet(ckptDir).select("split_id").distinct()
      .collect().map(_.getString(0)).toSet
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Run (or resume) stage 1: checkpoint per-file sketches of `valueCol`
    * grouped by `keys`. Returns the number of input files processed in this
    * invocation (0 = nothing left to do).
    */
  def checkpointStage(
      spark: SparkSession,
      inputPath: String,
      keys: Seq[String],
      valueCol: String,
      ckptDir: String,
      p: Int = 12,
      w: Int = 6,
      onlyFiles: Option[Seq[String]] = None): Int = {
    val all = spark.read.parquet(inputPath)
    val done = completedSplits(spark, ckptDir)
    val candidates = onlyFiles.getOrElse(all.inputFiles.toSeq)
    val todo = candidates.filterNot(done.contains)
    if (todo.nonEmpty) {
      val df = spark.read.schema(all.schema).parquet(todo: _*)
      df.groupBy(input_file_name().as("split_id") +: keys.map(col): _*)
        .agg(
          ce_sketch(col(valueCol), p, w).as("sketch"),
          count(lit(1)).as("rows"))
        .write.mode("append").parquet(ckptDir)
    }
    todo.size
  }

  /** Fold the checkpoint into final per-key estimates + scan metrics. */
  def finalizeStage(spark: SparkSession, ckptDir: String, keys: Seq[String]): DataFrame = {
    val ckpt = spark.read.parquet(ckptDir)
    ckpt
      .groupBy((Seq("split_id") ++ keys).map(col): _*)
      .agg(ce_merge(col("sketch")).as("sketch"), max(col("rows")).as("rows"))
      .groupBy(keys.map(col): _*)
      .agg(
        ce_merge_estimate(col("sketch")).as("distinct_count"),
        sum(col("rows")).as("rows_scanned"),
        countDistinct(col("split_id")).as("splits_merged"))
  }

  /** One-call convenience: checkpoint whatever is missing, then finalize. */
  def run(
      spark: SparkSession,
      inputPath: String,
      keys: Seq[String],
      valueCol: String,
      ckptDir: String,
      p: Int = 12,
      w: Int = 6): DataFrame = {
    checkpointStage(spark, inputPath, keys, valueCol, ckptDir, p, w)
    finalizeStage(spark, ckptDir, keys)
  }
}
