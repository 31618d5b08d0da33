package graft.ops

import graft.SharedSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("langId picks the right profile for clear-cut text") {
    val df = Seq(
      ("the cat and the dog went to the house and it was good", "en"),
      ("der hund und die katze sind nicht mit dem mann auf der straße", "de"),
      ("le chat et le chien sont dans la maison pour les vacances", "fr"),
      ("el perro y el gato en la casa con una mesa para el niño", "es"),
      ("zzz qqq www", "und")
    ).toDF("text", "expected")
    val got = df.select(TextOps.langId($"text").as("lang"), $"expected").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got ${r.getString(0)} expected ${r.getString(1)}"))
  }

  test("quality score orders garbage below prose; features sane") {
    val df = Seq(
      ("good", "The quick brown fox jumps over the lazy dog while the sun rises " +
        "over the quiet village and people start their morning routines with coffee."),
      ("digits", "4 8 15 16 23 42 108 3.14159 2.71828 1337 99999 00000 12345 67890"),
      ("short", "ok"),
      ("punct", "!!! ??? *** $$$ %%% @@@ ### &&& ((( ))) [[[ ]]] {{{ }}}")
    ).toDF("kind", "text")
    val scores = df.select($"kind", TextOps.qualityScore($"text").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("good") > 0.8, s"good prose scored ${scores("good")}")
    assert(scores("good") > scores("digits") && scores("good") > scores("short") &&
      scores("good") > scores("punct"), s"ordering wrong: $scores")
    assert(scores("punct") < 0.4, s"punct garbage scored ${scores("punct")}")
  }

  test("token counts: whitespace exact; bpe-ish >= whitespace on punctuated text") {
    val df = Seq("hello world, this is a test! with punct-uation.").toDF("text")
    val r = df.select(
      TextOps.tokenCountWhitespace($"text").as("ws"),
      TextOps.tokenCountBpeish($"text").as("bpe")).collect()(0)
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) >= r.getInt(0), s"bpe ${r.getInt(1)} < ws ${r.getInt(0)}")
  }

  test("docFingerprint stable under formatting, different for different content") {
    val df = Seq(
      ("a", "Hello   World  \n foo"),
      ("b", "hello world foo"),
      ("c", "hello world bar")
    ).toDF("id", "text")
    val fp = df.select($"id", TextOps.docFingerprint($"text").as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("a") == fp("b"))
    assert(fp("a") != fp("c"))
  }
}

class SimilaritySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def unitVec(dim: Int, seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    val v = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x).sum).toFloat
    v.map(_ / n)
  }

  private def jitter(v: Seq[Float], eps: Float, seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    v.map(x => x + rnd.nextGaussian().toFloat * eps)
  }

  test("cosine column algebra: identical -> 1, orthogonal -> 0") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine($"a", $"b").as("same"),
      Similarity.cosine($"a", $"c").as("orth")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(1)) < 1e-6)
  }

  test("bruteForceTopK returns the true nearest neighbors") {
    val dim = 16
    val base = (0 until 50).map(i => (i.toLong, unitVec(dim, i)))
    // corpus row 1000+i is a jittered copy of query i's vector
    val corpus = (base.map { case (i, v) => (i, v) } ++
      (0 until 5).map(i => (1000L + i, jitter(unitVec(dim, i), 0.05f, 77 + i))))
      .toDF("id", "vec")
    val queries = (0 until 5).map(i => (i.toLong, unitVec(dim, i))).toDF("qid", "qvec")
    val top1 = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the nearest neighbor of query i is corpus row i itself (cosine 1)
    (0 until 5).foreach(i => assert(top1(i.toLong) == i.toLong, s"q$i -> ${top1(i.toLong)}"))
    val top2 = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 2)
      .filter($"rank" === 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i => assert(top2(i.toLong) == 1000L + i,
      s"q$i 2nd -> ${top2(i.toLong)}"))
  }

  test("embeddingNearDupPairs finds jittered copies, skips unrelated vectors") {
    val dim = 16
    val base = (0 until 60).map(i => (i.toLong, unitVec(dim, i)))
    val dups = (0 until 5).map(i => (100L + i, jitter(unitVec(dim, i), 0.01f, 900 + i)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", dim,
      threshold = 0.98, planes = 8, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0 until 5).count(i => pairs.contains((i.toLong, 100L + i)))
    assert(hits >= 4, s"recall too low: $hits/5 ($pairs)")
    // unrelated random unit vectors in 16d essentially never reach cosine 0.98
    assert(pairs.forall { case (a, b) => b - a == 100L },
      s"false positives: ${pairs.filterNot { case (a, b) => b - a == 100L }}")
  }

  test("lshTopK recalls the true top-1 with multiple tables") {
    val dim = 16
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val queries = (0 until 10).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 500 + i)))
      .toDF("qid", "qvec")
    val got = Similarity.lshTopK(corpus, "id", "vec", queries, "qid", "qvec",
      k = 1, dim = dim, planes = 8, tables = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 10).count(i => got.get(i.toLong).contains(i.toLong))
    assert(hits >= 8, s"LSH recall too low: $hits/10 ($got)")
  }

  test("ivfTopK: deterministic centroids; nProbe cells recall the true top-1") {
    val dim = 16
    val corpus = (0 until 300).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val queries = (0 until 10).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 500 + i)))
      .toDF("qid", "qvec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 12, sampleSize = 300)
    // determinism: retraining on the same corpus gives identical centroids —
    // even under a DIFFERENT partitioning/row order, because the hash-spread
    // sample is a pure function of the data multiset, not the plan
    val again = Similarity.trainIvfCentroids(corpus.repartition(7), "vec",
      k = 12, sampleSize = 300)
    assert(centroids.zip(again).forall { case (a, b) => a.sameElements(b) },
      "IVF training must be deterministic and partitioning-invariant")
    assert(centroids.forall(c =>
      math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9), "centroids normalized")
    val got = Similarity.ivfTopK(corpus, "id", "vec", queries, "qid", "qvec",
      k = 1, centroids, nProbe = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 10).count(i => got.get(i.toLong).contains(i.toLong))
    assert(hits >= 8, s"IVF recall too low: $hits/10 ($got)")
    // full probe (nProbe = k) degenerates to exact brute force
    val full = Similarity.ivfTopK(corpus, "id", "vec", queries, "qid", "qvec",
      k = 1, centroids, nProbe = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == brute, s"nProbe=k must equal brute force: $full vs $brute")
  }

  test("trainIvfCentroids samples across ALL partitions, not the first-scanned slice") {
    val dim = 8
    def around(center: Array[Float], seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      center.map(x => x + r.nextGaussian().toFloat * 0.02f).toSeq
    }
    val a = Array.fill(dim)(0.0f).updated(0, 1.0f)
    val b = Array.fill(dim)(0.0f).updated(1, 1.0f)
    // topic-clustered layout: partition 0 holds ONLY cluster A, partition 1
    // ONLY cluster B — exactly the corpus shape where limit(n) trained the
    // quantizer on one unrepresentative slice
    val rows = (0 until 100).map(i => (i.toLong, around(a, i))) ++
      (100 until 200).map(i => (i.toLong, around(b, i)))
    val corpus = rows.toDF("id", "vec")
      .repartitionByRange(2, $"id")
      .sortWithinPartitions($"id")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 50)
    assert(centroids.length == 2)
    def maxDot(dir: Array[Float]): Double =
      centroids.map(c => c.zip(dir).map { case (x, y) => x * y }.sum).max
    // one centroid must represent each cluster — a first-partition-only
    // sample would leave cluster B unrepresented (max dot ~0)
    assert(maxDot(a) > 0.9, s"cluster A unrepresented: ${centroids.map(_.toSeq).toSeq}")
    assert(maxDot(b) > 0.9, s"cluster B unrepresented: ${centroids.map(_.toSeq).toSeq}")
  }

  test("trainIvfCentroids: fewer distinct directions than k -> fewer, distinct centroids") {
    val dim = 4
    val u = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val v = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // 50 rows but only two distinct vectors; k = 5 used to emit duplicate
    // centroids (permanently empty IVF cells)
    val rows = (0 until 50).map(i => (i.toLong, if (i % 2 == 0) u else v))
    val centroids = Similarity.trainIvfCentroids(rows.toDF("id", "vec"), "vec",
      k = 5, sampleSize = 50)
    assert(centroids.length == 2, s"expected 2 distinct centroids, got ${centroids.length}")
    assert(!centroids(0).sameElements(centroids(1)), "duplicate centroids")
    // and serving still works with the reduced centroid set
    val queries = Seq((0L, u), (1L, v)).toDF("qid", "qvec")
    val got = Similarity.ivfTopK(rows.toDF("id", "vec"), "id", "vec",
      queries, "qid", "qvec", k = 1, centroids, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(1L) == 1L, s"IVF serving broken: $got")
    // a caller-side nProbe larger than the reduced centroid count must not
    // throw — ivfTopK clamps it to centroids.length
    val clamped = Similarity.ivfTopK(rows.toDF("id", "vec"), "id", "vec",
      queries, "qid", "qvec", k = 1, centroids, nProbe = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clamped == got, s"clamped full probe diverged: $clamped vs $got")
  }

  test("persisted IVF index: fullprobe == brute force; probes PRUNE partitions (poison proof)") {
    val dim = 8
    val corpus = (0 until 400).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 8, sampleSize = 400)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_index_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // sidecar round-trips bit-exactly
    val loaded = Similarity.loadCentroids(spark, idx)
    assert(loaded.length == centroids.length &&
      loaded.zip(centroids).forall { case (a, b) => a.sameElements(b) },
      "centroid sidecar must round-trip exactly")
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 900 + i)))
      .toDF("qid", "qvec")
    // fullprobe-from-index must equal brute force row for row
    val full = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute, s"indexed fullprobe diverged from brute force")
    // PRUNING PROOF: poison every cell partition the nProbe=1 queries do NOT
    // probe — if the pruned scan listed or read those partitions, the query
    // would throw on the garbage files; completing proves partition pruning
    // works at the I/O level, not just in the plan text
    val probed = queries.select(
      explode(graft.functions.nearest_centroids($"qvec", loaded, 1)).as("c"))
      .distinct().collect().map(_.getInt(0)).toSet
    val allCells = spark.read.parquet(idx).select($"cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val unprobed = allCells -- probed
    assert(unprobed.nonEmpty, s"fixture broken: queries probe every cell ($probed)")
    unprobed.foreach { c =>
      val dir = java.nio.file.Paths.get(idx, s"cell=$c")
      java.nio.file.Files.list(dir).forEach { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.write(f, "poisoned-not-a-parquet-file".getBytes("UTF-8"))
      }
    }
    val pruned = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 1, nProbe = 1)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cell"),
      s"no literal partition filter on the index scan:\n$planStr")
    val got = pruned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "pruned probe returned nothing")
    // non-vacuous poison: a probe that DOES touch the poisoned cells fails
    intercept[Exception] {
      Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
        k = 1, nProbe = loaded.length).collect()
    }
  }

  test("centroid sidecar: driver-written file is Spark-readable and loadCentroids is bit-exact") {
    val dim = 8
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val corpus = vecs.toDF("vec_id", "embedding")
    val centroids = Similarity.trainIvfCentroids(corpus, "embedding", k = 4,
      sampleSize = 100)
    val idx = java.nio.file.Files.createTempDirectory("graft_sidecar_spec_").toString
    Similarity.assignCells(corpus, "vec_id", "embedding", centroids, idx)
    // the fast path must have produced the driver-written file (a Spark
    // fallback here would silently hide a broken writer)
    val files = new java.io.File(s"$idx/_centroids").list().toSeq
    assert(files.contains("part-00000-centroids.parquet"),
      s"expected the driver-written sidecar, found: $files")
    // plain Spark read (the fallback path + external consumers) agrees
    val viaSpark = spark.read.parquet(s"$idx/_centroids")
      .orderBy($"idx").select($"centroid").collect()
      .map(_.getSeq[Double](0).toArray)
    assert(viaSpark.length == centroids.length)
    viaSpark.zip(centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "spark-read sidecar diverged") }
    // and the driver-side reader agrees bit for bit
    val viaDriver = Similarity.loadCentroids(spark, idx)
    assert(viaDriver.length == centroids.length)
    viaDriver.zip(centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "driver-read sidecar diverged") }
  }

  test("appendToIndex: incremental rows join the index; fullprobe == brute force over the union") {
    val dim = 8
    val all = (0 until 300).map(i => (i.toLong, unitVec(dim, i)))
    val first = all.filter(_._1 % 2 == 0).toDF("id", "vec")
    val second = all.filter(_._1 % 2 == 1).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(first, "vec", k = 6, sampleSize = 300)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_append_").toString
    Similarity.assignCells(first, "id", "vec", centroids, idx)
    Similarity.appendToIndex(second, "id", "vec", idx)
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 700 + i)))
      .toDF("qid", "qvec")
    val full = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(all.toDF("id", "vec"), "id", "vec",
      queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute,
      s"index after append diverged from brute force over the union")
    // the sidecar is untouched by the append
    val loaded = Similarity.loadCentroids(spark, idx)
    assert(loaded.zip(centroids).forall { case (a, b) => a.sameElements(b) })
    // cell stats see the full post-append index (footer-only count)
    val total = Similarity.indexCellStats(spark, idx)
      .agg(org.apache.spark.sql.functions.sum($"rows")).collect()(0).getLong(0)
    assert(total == 300L, s"cell stats must cover build + append rows: $total")
  }

  test("compactIndex: appends re-merge to ~filesPerCell; only fragmented cells rewrite; answers unchanged") {
    val dim = 8
    val all = (0 until 300).map(i => (i.toLong, unitVec(dim, i)))
    val thirds = (0 until 3).map(t => all.filter(_._1 % 3 == t).toDF("id", "vec"))
    val centroids = Similarity.trainIvfCentroids(thirds(0), "vec", k = 6, sampleSize = 300)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_compact_").toString
    Similarity.assignCells(thirds(0), "id", "vec", centroids, idx)
    Similarity.appendToIndex(thirds(1), "id", "vec", idx)
    Similarity.appendToIndex(thirds(2), "id", "vec", idx)
    def filesByCell(): Map[Int, Seq[String]] = {
      val root = new java.io.File(idx)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName.stripPrefix("cell=").toInt ->
          d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq)
        .toMap
    }
    val before = filesByCell()
    assert(before.values.exists(_.size > 1),
      s"fixture broken: appends must fragment some cell: $before")
    // fragmentation is visible in the stats dashboard
    val statFiles = Similarity.indexCellStats(spark, idx)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(statFiles == before.view.mapValues(_.size).toMap,
      s"indexCellStats files column diverges from the FS listing: $statFiles vs $before")
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val compacted = Similarity.compactIndex(spark, idx)
    assert(compacted.toSet == before.filter(_._2.size > 1).keySet,
      s"compacted exactly the fragmented cells: $compacted vs $before")
    // the compaction's materialization checkpoint must not stay resident —
    // leaked blocks tax everything that runs after (unpersist is async)
    val freeBy = System.currentTimeMillis + 15000
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet.diff(rddsBefore)
    while (leaked().nonEmpty && System.currentTimeMillis < freeBy) Thread.sleep(100)
    assert(leaked().isEmpty, s"compaction left checkpoint blocks resident: ${leaked()}")
    val after = filesByCell()
    assert(after.keySet == before.keySet, "compaction must not add or drop cells")
    assert(after.values.forall(_.size == 1), s"cells not merged to 1 file: $after")
    // untouched (already-compact) cells keep their exact files
    before.filter(_._2.size == 1).foreach { case (cell, files) =>
      assert(after(cell) == files, s"un-fragmented cell $cell was rewritten")
    }
    // sidecar survives the dynamic overwrite
    val loaded = Similarity.loadCentroids(spark, idx)
    assert(loaded.zip(centroids).forall { case (a, b) => a.sameElements(b) },
      "centroid sidecar lost by compaction")
    // fullprobe after compaction still equals brute force over everything
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 600 + i)))
      .toDF("qid", "qvec")
    val full = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(all.toDF("id", "vec"), "id", "vec",
      queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute, "compacted index diverged from brute force")
    // idempotent: a compact index compacts to nothing
    assert(Similarity.compactIndex(spark, idx).isEmpty, "second compaction must be a no-op")
    // later appends re-fragment ONLY their touched cells; targeted
    // compaction with filesPerCell > 1 re-merges through the salted layout
    Similarity.appendToIndex(thirds(1), "id", "vec", idx)
    Similarity.appendToIndex(thirds(2), "id", "vec", idx)
    val refrag = filesByCell().filter(_._2.size > 2).keySet
    assert(refrag.nonEmpty, "two appends must push some cell past 2 files")
    val again = Similarity.compactIndex(spark, idx, filesPerCell = 2)
    assert(again.toSet == refrag, s"compacted exactly the >2-file cells: $again vs $refrag")
    assert(filesByCell().values.forall(_.size <= 2), "filesPerCell=2 exceeded")
  }

  test("compactIndex maxCells bounds one run, most-fragmented cells first") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_maxcells_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // fragment cell A twice and cell B once: A ends at 3 files, B at 2
    def onCentroid(c: Int, ids: Range) =
      ids.map(i => (i.toLong, centroids(c).map(_.toFloat).toSeq)).toDF("id", "vec")
    Similarity.appendToIndex(onCentroid(0, 1000 until 1010), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(0, 1010 until 1020), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(1, 2000 until 2010), "id", "vec", idx)
    val filesOf = Similarity.indexCellStats(spark, idx)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(filesOf(0) == 3 && filesOf(1) == 2, s"fixture: $filesOf")
    // one bounded run compacts ONLY the most fragmented cell
    val first = Similarity.compactIndex(spark, idx, maxCells = 1)
    assert(first == Seq(0), s"most-fragmented cell first: $first")
    val after1 = Similarity.indexCellStats(spark, idx)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(after1(0) == 1 && after1(1) == 2, s"bounded run touched extra cells: $after1")
    // the next bounded run picks up the remaining fragmentation
    val second = Similarity.compactIndex(spark, idx, maxCells = 1)
    assert(second == Seq(1), s"incremental continuation: $second")
    assert(Similarity.compactIndex(spark, idx, maxCells = 1).isEmpty)
  }

  test("compactIndex maxCells: tombstone-pending cells are never starved by fragmentation order") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_starve_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    def onCentroid(c: Int, ids: Range) =
      ids.map(i => (i.toLong, centroids(c).map(_.toFloat).toSeq)).toDF("id", "vec")
    // cell 0: most fragmented (3 files); cell 1: 1 file + a PENDING tombstone
    Similarity.appendToIndex(onCentroid(0, 1000 until 1010), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(0, 1010 until 1020), "id", "vec", idx)
    val idsInCell1 = spark.read.parquet(idx).filter($"cell" === 1)
      .select($"id").limit(1).collect().map(_.getLong(0))
    assert(idsInCell1.nonEmpty, "fixture: cell 1 must hold rows")
    Similarity.removeFromIndex(spark, idx, idsInCell1.toSeq.toDF("id"))
    // pure files-order would pick cell 0 forever under maxCells = 1 with
    // ongoing appends — the tombstoned cell must win the bounded slot
    val first = Similarity.compactIndex(spark, idx, maxCells = 1)
    assert(first == Seq(1), s"tombstoned cell must compact first: $first")
    val second = Similarity.compactIndex(spark, idx, maxCells = 1)
    assert(second == Seq(0), s"fragmentation follows once deletions applied: $second")
  }

  test("compactIndex never reads untouched cells (poison proof at the I/O level)") {
    val dim = 8
    val corpus = (0 until 300).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 6, sampleSize = 300)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_cpoison_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // fragment ONLY cell 0: append rows that sit exactly on centroid 0's
    // direction, so assignment sends every one of them to cell 0
    val c0 = centroids(0).map(_.toFloat).toSeq
    val onC0 = (1000L until 1020L).map(i => (i, c0)).toDF("id", "vec")
    Similarity.appendToIndex(onC0, "id", "vec", idx)
    def files(cell: Int): Seq[java.io.File] = {
      val d = new java.io.File(idx, s"cell=$cell")
      if (!d.isDirectory) Seq.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
    }
    assert(files(0).size > 1, "fixture broken: cell 0 must be the fragmented cell")
    // poison every OTHER cell's data files (cell 0 stays readable — parquet
    // schema inference reads the first listed file, which is cell=0's)
    val allCells = Similarity.indexCellStats(spark, idx)
      .select($"cell").collect().map(_.getInt(0)).toSet
    val poisoned = (allCells - 0).flatMap(files(_))
    assert(poisoned.nonEmpty, "fixture broken: need poisoned cells")
    poisoned.foreach(f =>
      java.nio.file.Files.write(f.toPath, "poisoned-not-a-parquet-file".getBytes("UTF-8")))
    // compaction must list/read ONLY the fragmented cell — completing with
    // garbage everywhere else proves the partition pruning at the I/O level
    val done = Similarity.compactIndex(spark, idx)
    assert(done == Seq(0), s"must compact exactly the fragmented cell 0: $done")
    assert(files(0).size == 1, s"cell 0 not merged: ${files(0)}")
    // poisoned files are untouched by the dynamic overwrite
    poisoned.foreach { f =>
      assert(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .startsWith("poisoned"), s"compaction rewrote an untouched cell file: $f")
    }
    // non-vacuous poison: reading the whole index DOES fail
    intercept[Exception] {
      spark.read.parquet(idx).agg(org.apache.spark.sql.functions.sum($"norm")).collect()
    }
  }

  test("removeFromIndex: probes exclude tombstoned rows; compaction drops them physically") {
    val dim = 8
    val all = (0 until 300).map(i => (i.toLong, unitVec(dim, i)))
    val corpus = all.toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 6, sampleSize = 300)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_del_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // plant exact clones of the first 5 vectors under huge ids: without
    // deletion they WOULD rank at the top for their queries (cosine 1)
    val planted = (0 until 5).map(i => (5000L + i, unitVec(dim, i))).toDF("id", "vec")
    Similarity.appendToIndex(planted, "id", "vec", idx)
    val removed = Similarity.removeFromIndex(spark, idx,
      (0 until 5).map(i => 5000L + i).toDF("id"))
    assert(removed == 5L, s"expected 5 tombstoned rows, got $removed")
    // absent ids resolve to nothing
    assert(Similarity.removeFromIndex(spark, idx, Seq(999999L).toDF("id")) == 0L)
    // pending tombstones are visible in the dashboard
    val pendingTs = Similarity.indexCellStats(spark, idx)
      .agg(org.apache.spark.sql.functions.sum($"tombstones")).collect()(0).getLong(0)
    assert(pendingTs == 5L, s"dashboard must show pending tombstones: $pendingTs")
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 650 + i)))
      .toDF("qid", "qvec")
    def fullprobe() = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // BEFORE compaction: the anti-join hides the tombstoned clones
    assert(fullprobe() == brute,
      "probe with pending tombstones must exclude the removed rows")
    // compaction applies: physical rows AND bytes gone, tombstone store cleared
    val bytesBefore = Similarity.indexCellStats(spark, idx)
      .agg(org.apache.spark.sql.functions.sum($"bytes")).collect()(0).getLong(0)
    val compacted = Similarity.compactIndex(spark, idx)
    assert(compacted.nonEmpty, "tombstoned cells must be selected for compaction")
    val bytesAfter = Similarity.indexCellStats(spark, idx)
      .agg(org.apache.spark.sql.functions.sum($"bytes")).collect()(0).getLong(0)
    assert(bytesAfter < bytesBefore,
      s"compaction must reclaim bytes: $bytesBefore -> $bytesAfter")
    val residentIds = spark.read.parquet(idx).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert((5000L until 5005L).forall(!residentIds.contains(_)),
      s"tombstoned rows still physically present: ${residentIds.filter(_ >= 5000L)}")
    assert(residentIds.size == 300, s"survivors damaged: ${residentIds.size}")
    assert(!new java.io.File(idx, "_tombstones").exists,
      "applied tombstones must be cleared from the store")
    // and the answers are unchanged after the physical rewrite
    assert(fullprobe() == brute, "compacted index diverged from brute force")
    // second compaction: nothing fragmented, nothing tombstoned
    assert(Similarity.compactIndex(spark, idx).isEmpty)
  }

  test("removeFromIndex: a fully-emptied cell disappears at compaction; probes stay correct") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_empty_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // remove EVERY row of cell 0
    val cell0Ids = spark.read.parquet(idx).filter($"cell" === 0)
      .select($"id").collect().map(_.getLong(0))
    assert(cell0Ids.nonEmpty, "fixture: cell 0 must hold rows")
    assert(Similarity.removeFromIndex(spark, idx, cell0Ids.toSeq.toDF("id"))
      == cell0Ids.length.toLong)
    val done = Similarity.compactIndex(spark, idx)
    assert(done.contains(0), s"the emptied cell must be selected: $done")
    assert(!new java.io.File(idx, "cell=0").exists,
      "a cell with zero surviving rows must be removed outright")
    // fullprobe over the remaining cells == brute force over the survivors
    val survivors = corpus.join(cell0Ids.toSeq.toDF("id"), Seq("id"), "left_anti")
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 350 + i)))
      .toDF("qid", "qvec")
    val full = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(survivors, "id", "vec", queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute, "probe over an index with a deleted cell diverged")
  }

  test("deleting EVERY row: stats dashboard reports zero cells, probe refuses with a clear error") {
    val dim = 8
    val corpus = (0 until 60).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 60)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_allgone_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    Similarity.removeFromIndex(spark, idx, (0L until 60L).toDF("id"))
    Similarity.compactIndex(spark, idx)
    assert(!new java.io.File(idx, "_tombstones").exists)
    // the dashboard must report the emptiness, not die in schema inference
    assert(Similarity.indexCellStats(spark, idx).count() == 0L)
    // and the probe refuses with the build/append guidance
    val q = corpus.limit(1).select($"id".as("qid"), $"vec".as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(spark, idx, q, "qid", "qvec", 1, 1)
    }
    assert(e.getMessage.contains("no data cells"), e.getMessage)
    // the lifecycle continues: append rebuilds content against the sidecar
    Similarity.appendToIndex(corpus.limit(10), "id", "vec", idx)
    assert(Similarity.ivfTopKFromIndex(spark, idx, q, "qid", "qvec", 1,
      centroids.length).count() == 1L)
  }

  test("compactIndex maxBytes: a byte budget bounds one run; an over-budget cell still progresses") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_bytes_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // fragment cell 0 HEAVILY (3 appends -> 4 files, the skewed hot cell)
    // and cells 1, 2 lightly (1 append each -> 2 files)
    def onCentroid(c: Int, ids: Range) =
      ids.map(i => (i.toLong, centroids(c).map(_.toFloat).toSeq)).toDF("id", "vec")
    Similarity.appendToIndex(onCentroid(0, 1000 until 1050), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(0, 1050 until 1100), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(0, 1100 until 1150), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(1, 2000 until 2010), "id", "vec", idx)
    Similarity.appendToIndex(onCentroid(2, 3000 until 3010), "id", "vec", idx)
    val stats = Similarity.indexCellStats(spark, idx)
      .collect().map(r => r.getInt(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(stats(0)._1 == 4 && stats(1)._1 == 2 && stats(2)._1 == 2, s"fixture: $stats")
    // budget below even the hot cell's bytes: the head cell still compacts
    // (progress guarantee — the rewrite streams, so this is an I/O bound,
    // not a memory bound) but nothing else fits the run
    val tiny = Similarity.compactIndex(spark, idx, maxBytes = 1L)
    assert(tiny == Seq(0), s"over-budget head cell must still make progress: $tiny")
    // next run under a budget that fits one light cell: exactly one compacts
    val statsAfter = Similarity.indexCellStats(spark, idx)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val oneCell = Similarity.compactIndex(spark, idx, maxBytes = statsAfter(1))
    assert(oneCell.size == 1 && (oneCell.head == 1 || oneCell.head == 2),
      s"budget for one light cell must compact exactly one: $oneCell")
    // unbounded run converges the rest; total content never changed
    Similarity.compactIndex(spark, idx)
    assert(Similarity.compactIndex(spark, idx).isEmpty)
    assert(spark.read.parquet(idx).count() == 200L + 150L + 10L + 10L)
  }

  test("removeFromIndexByVector: zero index I/O (poison proof); same end state as id-based removal") {
    val dim = 8
    val all = (0 until 200).map(i => (i.toLong, unitVec(dim, i)))
    val corpus = all.toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_delvec_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // poison EVERY data file: vector-based resolution must read only the
    // _centroids sidecar, so the call still succeeds — the id-based variant
    // would fail here (it scans the index), which also keeps this poison
    // non-vacuous
    val root = new java.io.File(idx)
    val poisoned = root.listFiles().filter(_.getName.startsWith("cell="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    val saved = poisoned.map(f => f -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    poisoned.foreach(f => java.nio.file.Files.write(f.toPath, "poison".getBytes))
    val doomed = all.take(5).toDF("id", "vec")
    val n = Similarity.removeFromIndexByVector(spark, idx, doomed, "id", "vec")
    assert(n == 5L, s"expected 5 tombstones resolved from the sidecar alone, got $n")
    intercept[Exception] { // non-vacuous: an index scan DOES fail right now
      Similarity.removeFromIndex(spark, idx, Seq(7L).toDF("id"))
    }
    // restore the data; the tombstones must now behave exactly like id-based
    // ones: probes exclude, compaction applies
    saved.foreach { case (f, bytes) => java.nio.file.Files.write(f.toPath, bytes) }
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 450 + i)))
      .toDF("qid", "qvec")
    def fullprobe() = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(
      all.drop(5).toDF("id", "vec"), "id", "vec", queries, "qid", "qvec", 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fullprobe() == brute, "vector-resolved tombstones must mask the removed rows")
    Similarity.compactIndex(spark, idx)
    val resident = spark.read.parquet(idx).select($"id").collect().map(_.getLong(0)).toSet
    assert((0L until 5L).forall(!resident.contains(_)), s"rows not dropped: $resident")
    assert(fullprobe() == brute, "post-compaction probe diverged")
  }

  test("tombstone backlog warning fires past broadcast size, names the remedy") {
    assert(Similarity.tombstoneBacklogWarning(1024 * 1024).isEmpty,
      "small backlogs must stay silent")
    val w = Similarity.tombstoneBacklogWarning(100L * 1024 * 1024)
    assert(w.exists(m => m.contains("SHUFFLE") && m.contains("compactIndex")),
      s"big backlog must warn with the remedy: $w")
  }

  test("tombstones are (cell, id)-scoped: a wrong-cell tombstone masks and deletes nothing") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_cellscope_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // pick an id and tombstone it with a DRIFTED vector that resolves to a
    // DIFFERENT cell — the documented masks-nothing case
    val byCell = spark.read.parquet(idx).select($"id", $"cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val victim = byCell.keys.head
    val otherCell = byCell.values.find(_ != byCell(victim)).get
    val drifted = centroids(otherCell).map(_.toFloat).toSeq // sits ON the other centroid
    assert(Similarity.removeFromIndexByVector(spark, idx,
      Seq((victim, drifted)).toDF("id", "vec"), "id", "vec") == 1L)
    // probe with the victim's REAL vector, probing every cell: the row must
    // still be served (the tombstone lives in the wrong cell)
    val vq = corpus.filter($"id" === victim)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val got = Similarity.ivfTopKFromIndex(spark, idx, vq, "qid", "qvec",
      k = 1, nProbe = centroids.length)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(victim) == victim,
      s"a wrong-cell tombstone must mask nothing: $got")
    // compaction (which selects both cells) must not delete the live row
    // either, and must clear the inert tombstone
    Similarity.compactIndex(spark, idx)
    assert(spark.read.parquet(idx).filter($"id" === victim).count() == 1L,
      "a wrong-cell tombstone physically deleted a live row")
    assert(!new java.io.File(idx, "_tombstones").exists, "inert tombstone not cleared")
  }

  test("torn post-crash index: probes and mutations refuse loudly; compactIndex heals") {
    val dim = 8
    val corpus = (0 until 100).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 100)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_torn_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    val queries = corpus.limit(2).select($"id".as("qid"), $"vec".as("qvec"))
    assert(new java.io.File(idx, "_compact_trash").mkdir())
    def mustRefuse(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("interrupted-compaction leftovers"), e.getMessage)
    }
    // a probe against the torn state would silently lose rows — refuse
    mustRefuse(Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec", 1, 1))
    mustRefuse(Similarity.appendToIndex(corpus.limit(1), "id", "vec", idx))
    mustRefuse(Similarity.removeFromIndex(spark, idx, Seq(0L).toDF("id")))
    // compaction heals, then everything works again
    Similarity.compactIndex(spark, idx)
    assert(Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec", 1,
      centroids.length).count() == 2L)
  }

  test("compactIndex recovery merges a moved-aside cell into a live dir recreated out-of-band") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_merge_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    // second file in cell 0 via an append of rows sitting on centroid 0
    Similarity.appendToIndex(
      (1000L until 1010L).map(i => (i, centroids(0).map(_.toFloat).toSeq))
        .toDF("id", "vec"), "id", "vec", idx)
    val total = spark.read.parquet(idx).count()
    val cell0 = new java.io.File(idx, "cell=0")
    val files = cell0.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 2, s"fixture needs 2 files in cell 0: ${files.toSeq}")
    // simulate: crash after live->trash rename with the replacement still in
    // tmp, then an out-of-band writer recreated cell=0 with OTHER rows
    // (here: one of the original files, moved back by hand)
    val trash = new java.io.File(idx, "_compact_trash"); assert(trash.mkdir())
    val stash = java.nio.file.Files.createTempDirectory("graft_stash_")
    java.nio.file.Files.move(files(0).toPath, stash.resolve(files(0).getName))
    assert(cell0.renameTo(new java.io.File(trash, "cell=0")))
    assert(cell0.mkdir())
    java.nio.file.Files.move(stash.resolve(files(0).getName),
      new java.io.File(cell0, files(0).getName).toPath)
    val tmp = new java.io.File(idx, "_compact_tmp/cell=0"); assert(tmp.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(tmp, "part-discard.parquet").toPath, "never-read")
    // recovery must MERGE the moved-aside file back (tmp existence proves the
    // swap never completed), not drop it as a superseded copy
    Similarity.compactIndex(spark, idx)
    assert(spark.read.parquet(idx).count() == total,
      "recovery lost rows when the live dir had been recreated out-of-band")
    assert(!trash.exists && !new java.io.File(idx, "_compact_tmp").exists)
  }

  test("orphaned tombstones are cleared even when nothing qualifies for compaction") {
    val dim = 8
    val corpus = (0 until 100).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 100)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_orphan_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    val cell0Ids = spark.read.parquet(idx).filter($"cell" === 0)
      .select($"id").collect().map(_.getLong(0)).toSeq
    Similarity.removeFromIndex(spark, idx, cell0Ids.toDF("id"))
    // simulate the crash orphaning: the cell vanished but its tombstones
    // survived (prior swap completed, store rewrite never ran)
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(idx, "cell=0"))
    // nothing is fragmented and the only tombstoned cell no longer exists:
    // the run selects nothing but must STILL clear the orphans
    assert(Similarity.compactIndex(spark, idx).isEmpty)
    assert(!new java.io.File(idx, "_tombstones").exists,
      "orphaned tombstones must not sit in the store forever")
  }

  test("compactIndex crash recovery: a moved-aside cell whose replacement never landed is restored") {
    val dim = 8
    val corpus = (0 until 200).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_crash_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    val total = spark.read.parquet(idx).count()
    // simulate a crash mid-swap: cell 0 was renamed into the trash dir but
    // its replacement never arrived (interrupted between the two renames)
    val cell0 = new java.io.File(idx, "cell=0")
    assert(cell0.isDirectory, "fixture: cell 0 must exist")
    val trash = new java.io.File(idx, "_compact_trash")
    assert(trash.mkdir())
    assert(cell0.renameTo(new java.io.File(trash, "cell=0")))
    // leftover tmp from the interrupted run must be cleared too
    val tmp = new java.io.File(idx, "_compact_tmp")
    assert(tmp.mkdir())
    java.nio.file.Files.writeString(
      new java.io.File(tmp, "garbage.bin").toPath, "leftover")
    assert(!cell0.isDirectory, "fixture: cell 0 moved aside")
    // the next compaction heals first: cell 0 restored, work dirs cleared,
    // content intact
    Similarity.compactIndex(spark, idx)
    assert(cell0.isDirectory, "interrupted swap must be rolled back")
    assert(!trash.exists && !tmp.exists, "work dirs must be cleared")
    assert(spark.read.parquet(idx).count() == total, "rows lost in recovery")
  }

  test("compactIndex crash recovery: an interrupted tombstone-store rewrite loses no pending deletes") {
    val dim = 8
    val corpus = (0 until 100).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 100)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_tscrash_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    Similarity.removeFromIndex(spark, idx, Seq(3L, 4L).toDF("id"))
    // simulate the crash window between the store rewrite's delete and
    // rename: the pending entries live ONLY in _tombstones.tmp
    val live = new java.io.File(idx, "_tombstones")
    val tmp = new java.io.File(idx, "_tombstones.tmp")
    assert(live.renameTo(tmp), "fixture: move the store aside")
    // the next compaction heals first (rename completed), then applies
    Similarity.compactIndex(spark, idx)
    val resident = spark.read.parquet(idx).select($"id").collect().map(_.getLong(0)).toSet
    assert(!resident.contains(3L) && !resident.contains(4L),
      s"pending deletes lost by the interrupted store rewrite: $resident")
    assert(!live.exists && !tmp.exists, "store must be fully cleared after applying")
  }

  test("removeFromIndex contract: compact-then-re-add works (tombstone does not outlive compaction)") {
    val dim = 8
    val corpus = (0 until 100).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 2, sampleSize = 100)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_readd_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx)
    val vec7 = corpus.filter($"id" === 7L)
    Similarity.removeFromIndex(spark, idx, Seq(7L).toDF("id"))
    Similarity.compactIndex(spark, idx)
    // documented lifecycle: compaction cleared the tombstone, so the id can
    // come back and is served again
    Similarity.appendToIndex(vec7, "id", "vec", idx)
    val queries = vec7.select($"id".as("qid"), $"vec".as("qvec"))
    val got = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
      k = 1, nProbe = centroids.length)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 7L, s"re-added id must be served after compaction: $got")
  }

  test("index lifecycle model check: random append/remove/compact sequences match brute force") {
    // model-based randomized check: drive the persisted index through a
    // random op sequence while tracking the expected surviving rows in
    // memory; after EVERY step, a fullprobe must equal brute force over the
    // model. Catches interaction bugs directed tests miss (remove-then-
    // append cells, repeated removes, budgeted compaction interleavings).
    // Deterministic seed: failures reproduce.
    val dim = 8
    val rnd = new scala.util.Random(4242)
    val initial = (0 until 120).map(i => (i.toLong, unitVec(dim, i)))
    val centroids = Similarity.trainIvfCentroids(initial.toDF("id", "vec"), "vec",
      k = 4, sampleSize = 200)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_model_").toString
    Similarity.assignCells(initial.toDF("id", "vec"), "id", "vec", centroids, idx)
    var model: Map[Long, Seq[Float]] = initial.toMap
    var nextId = 1000L
    val queries = (0 until 4).map(i => (i.toLong, jitter(unitVec(dim, 500 + i), 0.02f, i)))
      .toDF("qid", "qvec")
    def check(step: String): Unit = {
      val full = Similarity.ivfTopKFromIndex(spark, idx, queries, "qid", "qvec",
        k = 3, nProbe = centroids.length)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = Similarity.bruteForceTopK(
        model.toSeq.map { case (i, v) => (i, v) }.toDF("id", "vec"), "id", "vec",
        queries, "qid", "qvec", 3)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(full == brute, s"model divergence after $step")
    }
    for (step <- 0 until 12) {
      rnd.nextInt(3) match {
        case 0 => // append a fresh batch
          val batch = (0 until 10).map(j => (nextId + j, unitVec(dim, rnd.nextInt(10000))))
          nextId += 10
          Similarity.appendToIndex(batch.toDF("id", "vec"), "id", "vec", idx)
          model ++= batch
          check(s"$step:append")
        case 1 => // remove a random live subset (sometimes by vector)
          val doomed = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(8))
          if (rnd.nextBoolean())
            Similarity.removeFromIndex(spark, idx, doomed.toDF("id"))
          else
            Similarity.removeFromIndexByVector(spark, idx,
              doomed.map(i => (i, model(i))).toDF("id", "vec"), "id", "vec")
          model --= doomed
          check(s"$step:remove")
        case 2 => // compact, sometimes byte-budgeted
          val budget = if (rnd.nextBoolean()) Long.MaxValue else 1L + rnd.nextInt(20000)
          Similarity.compactIndex(spark, idx, maxBytes = budget)
          check(s"$step:compact(budget=$budget)")
      }
    }
    // drain: unbounded compactions must converge with the model intact
    while (Similarity.compactIndex(spark, idx).nonEmpty) ()
    check("drain")
    val resident = spark.read.parquet(idx).select($"id").collect().map(_.getLong(0)).toSet
    assert(resident == model.keySet,
      s"physical rows diverge from the model: extra=${resident -- model.keySet} " +
        s"missing=${model.keySet -- resident}")
  }

  test("filesPerCell salts the build shuffle: big cells write in parallel, results unchanged") {
    val dim = 8
    val corpus = (0 until 300).map(i => (i.toLong, unitVec(dim, i))).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 4, sampleSize = 300)
    val idx1 = java.nio.file.Files.createTempDirectory("graft_ivf_f1_").toString
    val idx3 = java.nio.file.Files.createTempDirectory("graft_ivf_f3_").toString
    Similarity.assignCells(corpus, "id", "vec", centroids, idx1)
    Similarity.assignCells(corpus, "id", "vec", centroids, idx3, filesPerCell = 3)
    // the salted layout actually fans out: some cell dir holds > 1 data file
    def filesPerCellDir(idx: String): Seq[Int] = {
      val root = new java.io.File(idx)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    }
    assert(filesPerCellDir(idx1).forall(_ == 1), "unsalted build: one file per cell")
    assert(filesPerCellDir(idx3).exists(_ > 1),
      s"salted build must produce parallel files: ${filesPerCellDir(idx3)}")
    // and the query answer is layout-independent
    val queries = (0 until 5).map(i => (i.toLong, jitter(unitVec(dim, i), 0.02f, 800 + i)))
      .toDF("qid", "qvec")
    def res(idx: String) = Similarity.ivfTopKFromIndex(spark, idx, queries,
      "qid", "qvec", k = 3, nProbe = centroids.length)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res(idx1) == res(idx3), "salted layout changed query results")
  }
}
