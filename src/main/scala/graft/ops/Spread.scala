package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism repair for per-row-expensive projections
  * (guide §2.5 "input skew": one huge unsplittable file — or here, a small
  * table written as a single row group — serializes a CPU-heavy stage onto
  * one task while the rest of the machine idles).
  */
object Spread {

  /** Repartitions `df` to the session's default parallelism when its scan
    * would otherwise run on fewer partitions than that. The minhash/simhash
    * signature passes, regex quality scoring, and vector kernels are pure
    * per-row CPU: their wall time is input-partition-bound, and a
    * single-row-group parquet table runs them on ONE core (measured on this
    * box: the sf0.1 documents table is one 584 KB file -> one task computes
    * all 5000 minhash signatures while 31 cores idle).
    *
    * Scale shape: at production volume the source carries thousands of
    * input splits, `current >= target` always holds, and this is a NO-OP —
    * no shuffle is ever added for data that already spreads. When it does
    * fire, the exchange carries exactly the projected columns the caller is
    * about to burn CPU on (callers pass a pre-projected frame), i.e. the
    * same bytes the scan read.
    *
    * Determinism: round-robin repartition with Spark's default
    * sort-before-repartition keeps row placement reproducible under task
    * retries; every consumer in this codebase is row-order-insensitive
    * (per-row projections, set-semantics joins, order-independent
    * aggregates).
    */
  def cpuBound(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    staticPartitionCount(df) match {
      case Some(current) if current < target => df.repartition(target)
      case _ => df
    }
  }

  /** Partition count of `df`'s physical plan, ONLY when probing it is free:
    * a non-adaptive plan (no exchanges) builds its RDD lazily, so
    * `execute().getNumPartitions` runs no job. An AQE-wrapped plan would
    * MATERIALIZE its intermediate query stages on `execute()` — real jobs,
    * re-run again by the caller's own action — so adaptive plans return None
    * and callers keep their default behavior.
    */
  def staticPartitionCount(df: DataFrame): Option[Int] =
    df.queryExecution.executedPlan match {
      case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        None
      case p => Some(p.execute().getNumPartitions)
    }
}
