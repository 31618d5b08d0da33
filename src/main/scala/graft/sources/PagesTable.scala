package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesized Common-Crawl-style web-pages table with the
  * exact north-rule schema: (url string, warc_ts timestamp, html binary,
  * text string, lang string). Every column is a pure function of the row
  * index (seed folded in), so expected distinct counts are computable in
  * closed form and `text` is byte-identical per url — the per-row invariant
  * vs the reference.
  *
  * Built entirely from `spark.range` + Catalyst expressions: whole-stage
  * codegen, no RDD, no driver-side data, embarrassingly parallel — the same
  * generator runs at 10^4 rows in a unit test and 10^12 rows on a cluster
  * (rows are produced per-partition with no shuffle).
  *
  * In production the reader/writer below would target an Iceberg catalog;
  * this sandbox has no Iceberg runtime jar (SURVEY.md §7.6), so tables are
  * day-partitioned Parquet with the same schema — swapping
  * `format("iceberg")` in `writeTo`/`readFrom` is the only change needed.
  */
object PagesTable {

  /** ~40 ISO language codes; index 0 ("en") is deliberately given ~45% of
    * rows (zipf-ish skew) to force the salted two-phase aggregation path.
    */
  private val langs = Seq(
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "cs", "sv", "fi", "hu", "el", "da",
    "ro", "no", "sk", "uk", "bg", "hr", "lt", "sl", "lv", "et",
    "th", "vi", "id", "ms", "hi", "bn", "fa", "he", "sr", "ca")

  /** 1000-slot lookup table realizing a zipf-ish lang distribution:
    * weight(k) ~ 1/(k+1), then slot counts normalized to 1000 with "en"
    * boosted to ~45%.
    */
  private val langSlots: Seq[String] = {
    // "en" takes 450 of 1000 slots; the rest share 550 slots zipf-style (1/i)
    val tail = langs.drop(1).zipWithIndex.map { case (l, i) => l -> (1.0 / (i + 1)) }
    val tailTotal = tail.map(_._2).sum
    val slots = Seq.fill(450)(langs.head) ++ tail.flatMap { case (l, wgt) =>
      Seq.fill(math.max(1, (wgt / tailTotal * 550).round.toInt))(l)
    }
    (slots ++ Seq.fill(1000)(langs.head)).take(1000)
  }

  private val vocab = Seq(
    "data", "web", "page", "crawl", "index", "search", "archive", "content",
    "text", "html", "link", "site", "host", "path", "query", "title",
    "body", "head", "meta", "word", "token", "corpus", "sample", "record",
    "fetch", "parse", "clean", "dedup", "shard", "batch", "store", "scan")

  /** Generate `numRows` pages. `distinctUrls` caps the url domain (duplicates
    * appear once numRows > distinctUrls — same url always carries
    * byte-identical text/html). `hosts` controls host fan-out, `days` the
    * number of distinct warc_ts days.
    */
  def generate(
      spark: SparkSession,
      numRows: Long,
      distinctUrls: Long,
      hosts: Int = 1000,
      days: Int = 30,
      partitions: Int = 0): DataFrame = {
    require(numRows >= distinctUrls, "numRows must be >= distinctUrls")
    val base = if (partitions > 0) spark.range(0, numRows, 1, partitions)
               else spark.range(numRows)
    val j = col("id") % distinctUrls // url index (duplicate domain)
    val urlCol = concat(
      lit("https://host-"), j % hosts, lit(".example/p/"), j)
    // deterministic 24-word text, pure function of the url index j
    val words = transform(
      sequence(lit(0), lit(23)),
      k => element_at(
        typedLit(vocab),
        (pmod(xxhash64(j, k), lit(vocab.size)) + 1).cast("int")))
    val textCol = concat(lit("doc "), j, lit(" "), array_join(words, " "))
    base.select(
      urlCol.as("url"),
      // base is midnight-aligned (2023-11-14 00:00:00 UTC) so the intra-day
      // second offset never spills into an extra calendar day
      timestamp_seconds(
        lit(1699920000L) + (col("id") % days) * 86400L + (col("id") * 37L) % 86400L
      ).as("warc_ts"),
      encode(concat(lit("<html><body>"), textCol, lit("</body></html>")), "UTF-8")
        .as("html"),
      textCol.as("text"),
      element_at(typedLit(langSlots), (pmod(xxhash64(j), lit(1000)) + 1).cast("int"))
        .as("lang"))
  }

  /** Write day-partitioned (Iceberg-style layout on Parquet). */
  def writeTo(df: DataFrame, path: String): Unit =
    df.withColumn("warc_day", to_date(col("warc_ts")))
      .write.mode("overwrite").partitionBy("warc_day").parquet(path)

  def readFrom(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
