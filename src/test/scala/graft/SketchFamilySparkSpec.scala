package graft

import graft.functions._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchFamilySparkSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("bloom: distributed build has no false negatives; probe filters rows") {
    val keys = (0 until 5000).map(_.toLong).toDF("k").repartition(7)
    val bloomBytes = keys.agg(bloom_agg($"k", 5000, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val probes = (0 until 10000).map(_.toLong).toDF("p")
    val kept = probes.filter(bloom_might_contain(lit(bloomBytes), $"p")).count()
    assert(kept >= 5000, s"false negatives: kept only $kept of >= 5000")
    assert(kept < 5300, s"false-positive rate too high: $kept") // ~1% of the 5000 absent
  }

  test("cms: per-group frequency exact with wide sketch; merge roll-up") {
    val df = (0 until 30000).map(i => ("t" + (i % 3), (i % 40).toLong)).toDF("g", "v")
    val sk = df.groupBy($"g").agg(cms_agg($"v", 5, 4096).as("cms"))
    // each (g, v) pair occurs 30000 / 3 / 40 = 250 times
    val est = sk.select($"g", cms_estimate($"cms", lit(7L)).as("c")).collect()
    assert(est.forall(_.getLong(1) == 250L), est.mkString(","))
    // roll-up: merge the three group sketches -> total frequency 750
    val merged = sk.agg(sketch_merge($"cms", "cms").as("m"))
      .select(cms_estimate($"m", lit(7L))).collect()(0).getLong(0)
    assert(merged == 750L)
  }

  test("tdigest: distributed quantiles track exact percentiles; min/max exact") {
    val df = (0 until 100000).map(i => i.toDouble).toDF("v").repartition(13)
    val sk = df.agg(tdigest_agg($"v", 200).as("td"))
    val row = sk.select(
      sketch_quantile($"td", 0.0).as("q0"),
      sketch_quantile($"td", 0.5).as("q50"),
      sketch_quantile($"td", 1.0).as("q100")).collect()(0)
    assert(row.getDouble(0) == 0.0 && row.getDouble(2) == 99999.0)
    assert(math.abs(row.getDouble(1) - 50000.0) < 1000.0, s"median ${row.getDouble(1)}")
  }

  test("kll: distributed quantiles; repartition invariance of count/min/max") {
    val df = (0 until 50000).map(i => (i % 10, i.toDouble)).toDF("g", "v")
    val q = df.groupBy($"g").agg(kll_agg($"v", 200).as("kll"))
      .select($"g", sketch_quantile($"kll", 0.0).as("mn"),
        sketch_quantile($"kll", 1.0).as("mx"), sketch_quantile($"kll", 0.5).as("md"))
      .orderBy($"g").collect()
    q.foreach { r =>
      val g = r.getInt(0)
      assert(r.getDouble(1) == g.toDouble) // min of group g is g
      assert(r.getDouble(2) == (49990 + g).toDouble) // max is 49990+g
      assert(math.abs(r.getDouble(3) - 25000.0) < 1500.0, s"median ${r.getDouble(3)}")
    }
  }

  test("SQL surface for the whole family") {
    graft.functions.registerAll(spark)
    (0 until 5000).map(i => ("g" + (i % 2), i.toLong, (i % 100).toDouble))
      .toDF("g", "k", "x").createOrReplaceTempView("fam")
    val r = spark.sql(
      """SELECT g,
        |  bloom_might_contain(bloom_agg(k, 5000, CAST(0.01 AS DOUBLE)), 42L) AS bm,
        |  cms_estimate(cms_agg(k), 42L) AS ce,
        |  sketch_quantile(tdigest_agg(x), CAST(0.5 AS DOUBLE)) AS tq,
        |  sketch_quantile(kll_agg(x), CAST(1.0 AS DOUBLE)) AS kq
        |FROM fam GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r.length == 2)
    assert(r.exists(_.getBoolean(1))) // 42 present in one group
    assert(r.map(_.getLong(2)).sum == 1L) // key 42 occurs once total
    // group g0 sees even x only (max 98), g1 odd x only (max 99)
    assert(r.map(_.getDouble(4)).sorted.toSeq == Seq(98.0, 99.0))
  }

  test("tdigest_merge and bloom_merge roll-ups match direct aggregation") {
    val df = (0 until 20000).map(i => ("p" + (i % 4), i.toLong, i.toDouble)).toDF("p", "k", "x")
    // t-digest: exact min/max survive the two-level merge
    val td = df.groupBy($"p").agg(tdigest_agg($"x", 100).as("td"))
      .agg(sketch_merge($"td", "tdigest").as("m"))
      .select(sketch_quantile($"m", 0.0), sketch_quantile($"m", 1.0)).collect()(0)
    assert(td.getDouble(0) == 0.0 && td.getDouble(1) == 19999.0)
    // bloom: merged filter contains every key from every partition group
    val bf = df.groupBy($"p").agg(bloom_agg($"k", 20000, 0.01).as("bf"))
      .agg(sketch_merge($"bf", "bloom").as("m")).collect()(0).getAs[Array[Byte]](0)
    val filt = graft.core.BloomFilter.deserialize(bf)
    assert((0 until 20000).forall(i =>
      filt.mightContainHash(graft.core.WyHash.hashLong(i.toLong))))
  }

  test("mixing sketch families in a union fails loudly") {
    val df = (0 until 100).map(_.toLong).toDF("k")
    val bloom = df.agg(bloom_agg($"k").as("s"))
    val e = intercept[Exception] {
      bloom.select(cms_estimate($"s", lit(1L))).collect()
    }
    assert(e.getMessage.contains("magic") || e.getMessage.contains("cms"),
      s"unexpected: ${e.getMessage}")
  }
}
