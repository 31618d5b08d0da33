package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime observability for the LSH bucket caps: dropping oversized buckets
  * ([[Dedup]]'s `dropOversizedBuckets`) is the right quadratic-blowup trade,
  * but silent truncation reads as "no near-dups found" when the real story is
  * "the corpus saturated the buckets" (simhash's retired 4x16-bit quarter
  * keys did exactly that: template-heavy text concentrated one quarter
  * bucket to 75k rows at only 2M docs and the then-silent cap ate 21% of the
  * true pairs — measured, BASELINE.md round 5). The dropped-row share is
  * therefore measured ON EVERY RUN and surfaced three ways:
  *   - a loud stderr warning when the share exceeds [[WarnDropFraction]],
  *     naming the operator and the fraction lost;
  *   - programmatically via [[lastBucketCapStats]] for pipelines that must
  *     gate on recall loss;
  *   - an [[elidedRuns]] record + warning when an empty-result plan made AQE
  *     discard the metric node itself, so even an unmeasurable run is loud.
  *
  * The measurement is FREE at plan level: a `Dataset.observe` node over the
  * per-bucket counts the cap already aggregates — no extra shuffle, no extra
  * scan, no eager action (the plan stays a lazy builder; metrics fire through
  * the QueryExecutionListener when the enclosing query actually runs).
  */
object GraftMetrics {

  /** Dropped-row share of one capped LSH run. `bandedRows` counts (bucket,
    * id) rows BEFORE the cap; `droppedRows` of them sat in buckets larger
    * than `maxBucketSize` and were cut.
    */
  final case class BucketCapStats(
      bandedRows: Long, droppedRows: Long, droppedBuckets: Long, maxBucketSize: Int) {
    def droppedFraction: Double =
      if (bandedRows <= 0) 0.0 else droppedRows.toDouble / bandedRows
  }

  /** Warn on stderr past this dropped-row share. */
  val WarnDropFraction = 0.05

  private val Prefix = "graft.bucket_cap."
  // observe names must be unique per plan; the counter suffix keeps two caps
  // of the same operator inside one composed query from colliding — and
  // doubles as the "which plan is newest" order for lastBucketCapStats
  private val nameCounter = new AtomicLong()
  // per-op ring of (plan counter -> stats), bounded so a long-running
  // pipeline can't accumulate entries forever; TreeMap keeps counter order
  private val MaxStatsPerOp = 64
  private val stats = new ConcurrentHashMap[
    String, scala.collection.immutable.TreeMap[Long, BucketCapStats]]()
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Cap stats of the NEWEST capped plan built for an operator ("minhash",
    * "simhash", "embedding") that has reported — "newest" by plan-creation
    * order (the observe counter), not listener arrival order, so two capped
    * runs of the same operator cannot clobber each other into reading the
    * wrong run's drop share. The listener bus is asynchronous: stats land
    * shortly AFTER the action returns, not within it.
    *
    * SCOPE: the stats registry is process-global and keyed by operator name
    * only. In a multi-tenant JVM (concurrent pipelines, several
    * SparkSessions) "newest" is newest ACROSS tenants — a pipeline that must
    * gate on the recall loss of ITS OWN run should capture the set of
    * counters in [[allBucketCapStats]] before acting its query and diff
    * afterward, rather than trusting the single newest entry.
    */
  def lastBucketCapStats(opName: String): Option[BucketCapStats] =
    Option(stats.get(opName)).flatMap(_.lastOption.map(_._2))

  /** All recorded cap stats for an operator, oldest plan first (bounded to
    * the most recent [[MaxStatsPerOp]] plans) — for pipelines gating on the
    * recall loss of a SPECIFIC run among several.
    */
  def allBucketCapStats(opName: String): Seq[BucketCapStats] =
    Option(stats.get(opName)).map(_.values.toSeq).getOrElse(Seq.empty)

  /** Number of capped runs of `opName` whose drop-share metric was ELIDED:
    * the observe node was in the plan but no metric arrived, because AQE's
    * empty-relation propagation replaced an empty-result subtree (and the
    * CollectMetrics inside it) before the final plan was walked. An elided
    * run means the drop share is UNKNOWN, not zero — and an empty result is
    * exactly when silent cap truncation would hide, so gating pipelines
    * should treat elided runs as suspect (inspect bucket counts directly,
    * or rerun with spark.sql.adaptive.enabled=false to measure).
    */
  def elidedRuns(opName: String): Long =
    Option(elided.get(opName)).map(_.get()).getOrElse(0L)

  private val elided = new ConcurrentHashMap[String, AtomicLong]()

  private[graft] def resetBucketCapStats(): Unit = { stats.clear(); elided.clear() }

  /** Wraps the per-bucket `(bucket, _bn)` count frame with the observation.
    * maxBucketSize rides in the metric name (observe expressions must be
    * aggregates or constants, and a name parse is simpler than a synthetic
    * constant aggregate).
    */
  private[ops] def observeBucketCap(counts: DataFrame, opName: String,
      maxBucketSize: Int): DataFrame = {
    ensureListener(counts.sparkSession)
    counts.observe(
      s"$Prefix$opName#$maxBucketSize#${nameCounter.incrementAndGet()}",
      coalesce(sum(col("_bn")), lit(0L)).as("banded_rows"),
      coalesce(sum(when(col("_bn") > maxBucketSize, col("_bn"))), lit(0L))
        .as("dropped_rows"),
      count(when(col("_bn") > maxBucketSize, lit(1))).as("dropped_buckets"))
  }

  private def ensureListener(spark: SparkSession): Unit = {
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          // elision detection: a bucket-cap observe that the ANALYZED plan
          // carries but the delivered metrics lack was optimized out of the
          // final plan (AQE replaces empty-result subtrees wholesale, and
          // the CollectMetrics node goes with them). Record + warn: the
          // drop share of that run is unknown, not zero.
          val planned = scala.collection.mutable.Set[String]()
          qe.analyzed.foreach {
            case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
                if c.name.startsWith(Prefix) => planned += c.name
            case _ => ()
          }
          planned.diff(qe.observedMetrics.keySet).foreach { name =>
            name.stripPrefix(Prefix).split('#') match {
              case Array(op, cap, _) =>
                elided.computeIfAbsent(op, _ => new AtomicLong()).incrementAndGet()
                System.err.println(
                  s"[graft] $op: bucket-cap drop-share metric (maxBucketSize=" +
                  s"$cap) was ELIDED for this run — the query produced an " +
                  s"empty intermediate result and adaptive empty-relation " +
                  s"pruning discarded the metric node, so the dropped-row " +
                  s"share is UNKNOWN (an empty result is exactly when cap " +
                  s"truncation would hide); inspect bucket counts directly " +
                  s"or rerun with spark.sql.adaptive.enabled=false to measure")
              case _ => ()
            }
          }
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(Prefix)) {
              name.stripPrefix(Prefix).split('#') match {
                case Array(op, cap, counter) =>
                  val s = BucketCapStats(
                    row.getAs[Long]("banded_rows"),
                    row.getAs[Long]("dropped_rows"),
                    row.getAs[Long]("dropped_buckets"),
                    cap.toInt)
                  stats.compute(op, (_, old) => {
                    val base = if (old == null)
                      scala.collection.immutable.TreeMap.empty[Long, BucketCapStats]
                    else old
                    val next = base + (counter.toLong -> s)
                    if (next.size > MaxStatsPerOp) next.drop(next.size - MaxStatsPerOp)
                    else next
                  })
                  if (s.droppedFraction > WarnDropFraction)
                    System.err.println(
                      f"[graft] $op: bucket cap (maxBucketSize=${s.maxBucketSize}) " +
                      f"dropped ${s.droppedRows} of ${s.bandedRows} banded rows " +
                      f"(${s.droppedFraction * 100}%.1f%%) across ${s.droppedBuckets} " +
                      f"oversized buckets — pairs inside those buckets are NOT " +
                      f"reported; raise maxBucketSize, add planes/bands, or route " +
                      f"boilerplate through exact dedup first")
                case _ => ()
              }
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
  }
}
