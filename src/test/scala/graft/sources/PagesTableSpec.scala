package graft.sources

import graft.SharedSpark
import graft.functions._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PagesTableSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("schema matches the north-rule input shape exactly") {
    val df = PagesTable.generate(spark, 100, 50)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "url" -> "string", "warc_ts" -> "timestamp", "html" -> "binary",
      "text" -> "string", "lang" -> "string"))
  }

  test("deterministic: same rows on regeneration; text byte-identical per url") {
    val a = PagesTable.generate(spark, 2000, 700).orderBy("url", "warc_ts").collect()
    val b = PagesTable.generate(spark, 2000, 700).orderBy("url", "warc_ts").collect()
    assert(a.toSeq == b.toSeq)
    // per-row invariant: one url -> exactly one text/html byte sequence
    val variants = PagesTable.generate(spark, 5000, 500)
      .groupBy(col("url"))
      .agg(countDistinct(col("text")).as("t"), countDistinct(col("html")).as("h"))
      .filter(col("t") > 1 || col("h") > 1)
      .count()
    assert(variants == 0L)
  }

  test("closed-form distinct url count; sketch agrees within bound") {
    val df = PagesTable.generate(spark, 20000, 6000)
    assert(df.select(countDistinct(col("url"))).collect()(0).getLong(0) == 6000L)
    val est = df.agg(ce_approx_distinct(col("url")).as("d")).collect()(0).getLong(0)
    assert(math.abs(est - 6000.0) / 6000.0 <= 1.04 / math.sqrt(4096.0) * 1.2)
  }

  test("lang distribution is zipf-skewed: en dominates") {
    val counts = PagesTable.generate(spark, 20000, 20000)
      .groupBy(col("lang")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en").toDouble / 20000 > 0.3, s"en share too low: ${counts("en")}")
    assert(counts.size > 10, s"too few langs: ${counts.keys}")
  }

  test("generation is parallel and shuffle-free (scale shape)") {
    val plan = PagesTable.generate(spark, 1000, 500, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"generator must not shuffle:\n$plan")
    assert(plan.contains("Range"), s"expected Range source:\n$plan")
  }

  test("day partitioning: warc_ts spans the requested day count") {
    val days = PagesTable.generate(spark, 5000, 5000, days = 7)
      .select(to_date(col("warc_ts"))).distinct().count()
    assert(days == 7L)
  }
}
