package graft.ops

import graft.SharedSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("deterministicSample: stable under repartition, rate approximately honored") {
    val df = (0 until 50000).map(i => ("k" + i, i)).toDF("key", "v")
    val a = Sampling.deterministicSample(df, $"key", 0.1)
      .select($"key").collect().map(_.getString(0)).toSet
    val b = Sampling.deterministicSample(df.repartition(17), $"key", 0.1)
      .select($"key").collect().map(_.getString(0)).toSet
    assert(a == b, "sample must be a pure function of the key")
    assert(math.abs(a.size - 5000) < 300, s"rate off: ${a.size}")
  }

  test("deterministicSplit: disjoint, exhaustive, stable, weighted") {
    val df = (0 until 30000).map(i => ("doc" + i, i)).toDF("key", "v")
    val split = Sampling.deterministicSplit(df, $"key",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 30000L)
    assert(math.abs(counts("train") - 24000) < 500, counts.toString)
    assert(math.abs(counts("val") - 3000) < 250, counts.toString)
    // same key -> same split on rerun
    val again = Sampling.deterministicSplit(df.repartition(7), $"key",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val joined = split.select($"key", $"split".as("s1"))
      .join(again.select($"key", $"split".as("s2")), "key")
      .filter($"s1" =!= $"s2").count()
    assert(joined == 0L)
  }

  test("shuffleIntoShards: complete, balanced, and the per-shard ORDER is a pure function of keys") {
    val df = (0 until 20000).map(i => ("doc" + i, i)).toDF("key", "v")
    val shards = 8
    def perShardOrder(in: org.apache.spark.sql.DataFrame): Map[Int, Seq[String]] =
      Sampling.shuffleIntoShards(in, $"key", shards)
        .select($"shard", $"shuffle_order", $"key")
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    val a = perShardOrder(df)
    // complete + disjoint: every row in exactly one shard, all shards used
    assert(a.keySet == (0 until shards).toSet, s"shards used: ${a.keySet}")
    assert(a.values.map(_.size).sum == 20000)
    // balanced within ~5 sigma of uniform
    a.values.foreach(s => assert(math.abs(s.size - 2500) < 300, s"skewed: ${s.size}"))
    // the ORDER (not just membership) survives an adversarial repartitioning
    val b = perShardOrder(df.repartition(13).sortWithinPartitions($"v"))
    assert(a == b, "per-shard order must be a pure function of the keys")
    // the in-shard order is decorrelated from the key's own order: doc0..doc9
    // must not appear in input order inside their shards
    val positions = a.values.flatten.zipWithIndex.toMap
    val firstTen = (0 until 10).map(i => positions("doc" + i))
    assert(firstTen != firstTen.sorted, s"order looks like input order: $firstTen")
    // physically, rows within each output partition are contiguous per shard
    // and sorted by shuffle_order (what a partitionBy export writes out)
    val plan = Sampling.shuffleIntoShards(df, $"key", shards)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.contains("rangepartitioning"),
      s"must sort within partitions, never a global range exchange:\n$plan")
  }

  test("SQL relativeSD overload maps to a precision like approx_count_distinct") {
    graft.functions.registerAll(spark)
    (0 until 60000).map(i => i.toLong % 30000).toDF("v").createOrReplaceTempView("sd_test")
    val est = spark.sql("SELECT ce_approx_distinct(v, 0.01) AS d FROM sd_test")
      .collect()(0).getLong(0)
    // sd=0.01 -> p=14 -> bound 1.04/sqrt(2^14) ~ 0.8%
    assert(math.abs(est - 30000.0) / 30000.0 <= 0.01 * 1.5, s"est $est")
  }

  test("merging sketches of different precisions fails with a clear error") {
    val df = (0 until 1000).map(i => i.toLong).toDF("v")
    val sk10 = df.agg(graft.functions.ce_sketch($"v", 10, 5).as("sk"))
    val sk12 = df.agg(graft.functions.ce_sketch($"v", 12, 6).as("sk"))
    val e = intercept[Exception] {
      sk10.union(sk12).agg(graft.functions.ce_merge_estimate($"sk")).collect()
    }
    assert(e.getMessage.contains("different parameters") ||
      e.getCause != null && e.getCause.getMessage.contains("different parameters"),
      s"unexpected error: ${e.getMessage}")
  }
}
