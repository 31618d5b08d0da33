package graft.ops

import graft.functions._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling for training-data pipelines. Unlike
  * `df.sample`, these are pure functions of the KEY: the same row is always
  * in or out regardless of partitioning, retries, or cluster size — which is
  * what reproducible dataset builds and leak-free train/eval splits need.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`rate` of rows, decided by the wyhash of `key`. */
  def deterministicSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate out of range: $rate")
    df.filter(pmod(wyhash64(key), lit(Buckets)) < lit((rate * Buckets).toLong))
  }

  /** Disjoint named splits (e.g. train/val/test) with the given weights.
    * Returns the input plus a `split` column; every key lands in exactly one
    * split, stably.
    */
  def deterministicSplit(df: DataFrame, key: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $weights")
    val bucket = pmod(wyhash64(key), lit(Buckets))
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => (c * Buckets).toLong)
    val expr = weights.map(_._1).zip(thresholds).foldRight(
      lit(weights.last._1): Column) { case ((name, upper), rest) =>
      when(bucket < upper, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }
}
