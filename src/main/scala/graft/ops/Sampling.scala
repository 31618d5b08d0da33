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

  /** Deterministic training shuffle at corpus scale: every row lands in one
    * of `numShards` shards by the wyhash of `key`, and rows are ordered
    * WITHIN each shard by an independent second-level hash — the standard
    * shard + intra-shard-shuffle shape for training-data export. Costs ONE
    * hash-keyed exchange plus a per-partition sort; there is deliberately
    * no global orderBy, which would funnel the whole corpus through a
    * total-order range exchange for zero statistical benefit (uniform
    * hashes are already exchangeable across shards).
    *
    * Both the shard and the in-shard position are pure functions of the KEY,
    * so the export is bit-reproducible across retries, partitionings, and
    * cluster sizes — unlike `df.orderBy(rand())`. Keys must be unique for a
    * fully-determined order (rows sharing a key sort adjacently with
    * arbitrary relative order, like any sort on a non-unique key).
    *
    * Returns the input plus `shard` and `shuffle_order` columns, each
    * partition holding whole shards in order; write with
    * `.write.partitionBy("shard")` for one directory per shard.
    */
  def shuffleIntoShards(df: DataFrame, key: Column, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = wyhash64(key)
    // second-level hash decorrelates the in-shard order from the shard
    // assignment (h mod numShards) — re-hashing the 64-bit value is one
    // codegen'd kernel call per row, not a second pass over the key bytes
    val order = wyhash64(h)
    df.withColumn("shard", pmod(h, lit(numShards.toLong)).cast("int"))
      .withColumn("shuffle_order", order)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_order"), key)
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
