package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 measurement harness (guide §1): per-query isolation timing, plan
  * capture, and phase-level breakdowns of the composite lifecycle gates.
  * SEPARATE from the frozen [[Bench]] — nothing here feeds the driver's
  * metric; numbers are cited in OPTIMIZATION_r07.md.
  *
  * Usage:
  *   runMain graft.BenchExtra time [reps] [query...]   — per-query seconds (min of reps)
  *   runMain graft.BenchExtra plans <outdir> <suffix> [query...] — write explain("formatted")
  *   runMain graft.BenchExtra ivfphases                — step timing of the IVF lifecycle
  *   runMain graft.BenchExtra streamphases             — step timing of the streaming gates
  */
object BenchExtra {

  private def quietLogs(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    quietLogs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = newSession(cpus)
    val mode = args.headOption.getOrElse("time")
    mode match {
      case "time" =>
        val (reps, names0) = args.drop(1).toSeq match {
          case r +: rest if r.forall(_.isDigit) => (r.toInt, rest)
          case rest => (2, rest)
        }
        val names = if (names0.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names0
        // JIT/listing warm-up like Bench
        names.foreach { n =>
          try SparkEntry.queries(n)(spark, sfDir).collect()
          catch { case e: Throwable => System.err.println(s"WARMUP FAIL $n: $e") }
        }
        val results = names.map { n =>
          val secs = (1 to reps).map { _ =>
            spark.sparkContext.setJobDescription(n)
            val (_, s) = time(SparkEntry.queries(n)(spark, sfDir).collect())
            s
          }
          n -> secs
        }
        results.foreach { case (n, ss) =>
          println(f"TIME $n%-36s min=${ss.min}%8.3f all=${ss.map(s => f"$s%.3f").mkString(",")}")
        }
        println("TOTALMIN " + results.map(_._2.min).sum)
      case "plans" =>
        val outDir = args(1)
        val suffix = args(2)
        val names = if (args.length > 3) args.drop(3).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { n =>
          try {
            val df = SparkEntry.queries(n)(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"PLAN $n -> $outDir/${n}_$suffix.txt")
          } catch { case e: Throwable => System.err.println(s"PLAN FAIL $n: $e") }
        }
      case "ivfphases" =>
        ivfPhases(spark, sfDir)
      case "streamphases" =>
        streamPhases(spark, sfDir)
      case other =>
        System.err.println(s"unknown mode $other")
    }
    spark.stop()
  }

  /** Replicates q_ann_topk_ivf_deleted_compacted (the slowest IVF gate) step
    * by step with timers, after one warm-up pass of the whole gate.
    */
  private def ivfPhases(s: SparkSession, dir: String): Unit = {
    def read(t: String) = s.read.parquet(s"$dir/$t.parquet")
    // warm up
    SparkEntry.queries("q_ann_topk_ivf_deleted_compacted")(s, dir).collect()
    (1 to 2).foreach { round =>
      val emb = read("embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val planted = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + lit(1L << 40)).as("vec_id"), col("embedding"))
      val (centroids, tTrain) = time(graft.ops.Similarity.trainIvfCentroids(
        emb, "embedding", k = 16, sampleSize = 2000))
      val idx = java.nio.file.Files.createTempDirectory("graft_phase_ivf_").toString
      val (_, tAssign) = time(graft.ops.Similarity.assignCells(
        emb, "vec_id", "embedding", centroids, idx))
      val (_, tAppend) = time(graft.ops.Similarity.appendToIndex(
        planted, "vec_id", "embedding", idx))
      val (_, tRemove) = time(graft.ops.Similarity.removeFromIndex(s, idx,
        planted.select(col("vec_id").as("id"))))
      val (_, tCompact) = time(graft.ops.Similarity.compactIndex(s, idx))
      val (_, tProbe) = time(graft.ops.Similarity.ivfTopKFromIndex(
        s, idx, queries, "qid", "qvec", k = 3, nProbe = centroids.length)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .collect())
      println(f"IVFPHASE r$round train=$tTrain%.3f assign=$tAssign%.3f " +
        f"append=$tAppend%.3f remove=$tRemove%.3f compact=$tCompact%.3f " +
        f"probe=$tProbe%.3f total=${tTrain + tAssign + tAppend + tRemove + tCompact + tProbe}%.3f")
    }
  }

  /** Times the two streaming gates end to end plus their setup pieces. */
  private def streamPhases(s: SparkSession, dir: String): Unit = {
    // warm up both
    SparkEntry.queries("q_stream_sketch_restore")(s, dir).collect()
    SparkEntry.queries("q_stream_dedup_restore")(s, dir).collect()
    (1 to 2).foreach { round =>
      val (_, tSketch) = time(
        SparkEntry.queries("q_stream_sketch_restore")(s, dir).collect())
      val (_, tDedup) = time(
        SparkEntry.queries("q_stream_dedup_restore")(s, dir).collect())
      println(f"STREAMPHASE r$round sketch=$tSketch%.3f dedup=$tDedup%.3f")
    }
  }
}
