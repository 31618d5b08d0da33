package graft.ops

import graft.functions._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at three exactness
  * levels. All plans are shuffle-minimal: per-row fingerprints (no explode of
  * shingles across the cluster), band-key shuffles carry only (key, id)
  * pairs, and pair verification joins only candidate buckets.
  */
object Dedup {

  /** Exact dedup on content hash. Keeps the smallest `idCol` per identical
    * `textCol` (null texts form one group, like a hash-partitioned window
    * would).
    *
    * CONTRACT: `idCol` must uniquely identify rows. Rows that share BOTH the
    * id and the text (true duplicate records) all match the winner pair and
    * all survive — a semi join cannot tell identical rows apart. For corpora
    * without a unique id use [[exactByContent]] instead (found the hard way:
    * a 192M-row soak where the "id" url column repeated kept everything).
    *
    * Scale shape: the winner election aggregates a PROJECTED `(hash, id)`
    * frame — only ~16 bytes/row cross that exchange, never the text — and the
    * survivors are restored with a left-semi join on `(id, hash)`. When the
    * winner set fits in memory AQE broadcasts it and the corpus side never
    * shuffles at all; otherwise Catalyst falls back to a shuffled semi join
    * whose build side is still only the 16-byte winner pairs. The previous
    * window-function shape unconditionally shipped every column of every row
    * through a full-corpus exchange plus a per-partition sort.
    *
    * Measured guidance (192M-row head-to-head, BASELINE.md): when the winner
    * set is NOT broadcastable, the join back shuffles the full corpus anyway
    * and [[exactByContent]] (one aggregation, one scan) is ~1.6x faster —
    * prefer this shape when winners broadcast (modest distinct counts) or
    * when only the surviving ids are needed (use the election alone).
    *
    * "Exact" bound: texts are equated by (64-bit wyhash, length), never by
    * full content — the whole point is that the text itself never shuffles.
    * Two DIFFERENT texts of the same length colliding in wyhash64 would
    * merge (expected collisions ~ n^2 / 2^65 per length class: ~0.03 across
    * 10^9 same-length docs — negligible below ~10^10 rows of one length;
    * compare-by-content at that scale means [[exactByContent]], whose
    * hash-grouped struct-min carries the text inside one aggregation).
    */
  def exactByHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = df
      .select(wyhash64(col(textCol)).as("__g_h"), length(col(textCol)).as("__g_l"),
        col(idCol).as("__g_id"))
      .groupBy(col("__g_h"), col("__g_l"))
      .agg(min(col("__g_id")).as("__g_id"))
    // Null-safe id equality: a text group whose ids are ALL null elects a
    // null winner, and plain === would match nothing — silently losing the
    // text from the output. With <=> such rows all survive instead (null ids
    // already violate the uniqueness contract; keeping duplicates is the
    // safe failure mode, losing data is not). Null texts likewise group
    // under (null, null) via <=>. The length in the key costs 4 bytes/row
    // and removes every cross-length hash collision.
    df.join(
      winners,
      (df(idCol) <=> winners("__g_id")) && (wyhash64(df(textCol)) <=> winners("__g_h")) &&
        (length(df(textCol)) <=> winners("__g_l")),
      "left_semi")
  }

  /** Exact dedup on selected columns (hash-groupBy semantics). */
  def exactByColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact content dedup for corpora WITHOUT a unique row id: keeps the
    * lexicographically smallest full row per identical `textCol`
    * (deterministic across retries and partitionings, unlike
    * dropDuplicates/first which keep an arbitrary row).
    *
    * Scale shape: one aggregation on the 8-byte content hash — the partial
    * (map-side) `min(struct(*))` collapses same-split duplicates BEFORE the
    * exchange, and only one candidate struct per (hash, map partition)
    * shuffles. Catalyst plans struct-min as a SortAggregate (struct buffers
    * aren't hash-aggregable — Spark's own dropDuplicates over string columns
    * sorts the same way), so each partition sorts by the 8-byte hash; unlike
    * the window shape there is no second full-corpus pass and the reduce
    * side only sees collapsed candidates. With a unique id
    * [[exactByHash]] ships only 16 bytes/row instead.
    *
    * "Exact" bound: rows are grouped by (64-bit wyhash, length) of the text;
    * two DIFFERENT same-length texts colliding in wyhash64 would keep only
    * one survivor (~n^2 / 2^65 expected collisions per length class —
    * negligible below ~10^10 same-length rows; see [[exactByHash]]).
    */
  def exactByContent(df: DataFrame, textCol: String): DataFrame = {
    val rowStruct = struct(df.columns.map(col): _*)
    df.groupBy(wyhash64(col(textCol)).as("__g_h"), length(col(textCol)).as("__g_l"))
      .agg(min(rowStruct).as("__g_row"))
      .select(col("__g_row.*"))
  }

  /** Documents with no shingles at all (empty/whitespace/punct-only text)
    * share the sentinel all-Long.MaxValue signature and would pair everything
    * with everything; they belong to exact dedup, not LSH.
    */
  private def nonEmptySigs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): DataFrame =
    // signature hashing is the CPU wall of this pass: spread the projected
    // (id, text) frame first so a narrow input (single-row-group table)
    // cannot serialize it onto one task (Spread.cpuBound is a no-op at
    // production input-split counts)
    Spread.cpuBound(df.select(col(idCol).as("_id"), col(textCol).as("_t")))
      .select(
        col("_id"),
        minhash_signature(col("_t"), numHashes, shingleSize).as("_sig"))
      .filter(element_at(col("_sig"), 1) =!= Long.MaxValue)

  /** Degenerate-bucket guard shared by every LSH self-join: a bucket key
    * shared by a huge number of docs (boilerplate corpora) makes the bucket
    * self-join quadratic IN THAT BUCKET, so oversized buckets are dropped
    * via a groupBy-count + join (no window sort; the aggregation shuffles
    * only (key, partial count), and the filter join's small-buckets side is
    * a tiny key list that AQE broadcasts). The semantic trade is explicit
    * and the same one minhash has always documented: pairs entirely inside
    * an over-`maxBucketSize` bucket are not reported — at the thresholds
    * these operators serve, such buckets are boilerplate, and boilerplate
    * belongs to exact dedup, not near-dup LSH.
    *
    * The truncation is LOUD: an observe node over the per-bucket counts (no
    * extra shuffle or action) measures the dropped-row share per run, warns
    * on stderr past [[GraftMetrics.WarnDropFraction]], and exposes it via
    * [[GraftMetrics.lastBucketCapStats]](opName) — a saturated-bucket corpus
    * (e.g. simhash quarters beyond ~4M docs) can no longer silently read as
    * "no near-duplicates".
    */
  private def dropOversizedBuckets(banded: DataFrame, bucketCol: String,
      maxBucketSize: Int, opName: String): DataFrame = {
    val counts = GraftMetrics.observeBucketCap(
      banded.groupBy(col(bucketCol)).agg(count(lit(1)).as("_bn")),
      opName, maxBucketSize)
    // DELIVERY CAVEAT (handled in GraftMetrics): two plan shapes never
    // deliver the in-plan metric — empty results under AQE (empty-relation
    // propagation discards the CollectMetrics node with the collapsed
    // subtree; measured: an all-boilerplate corpus recorded nothing under
    // AQE, everything with AQE off) and lazy-localCheckpoint consumers (the
    // clustering/transitive paths: checkpoint creation carries the node but
    // runs no job, and the materialization later runs as a LogicalRDD
    // without it). The listener detects observe names planned but missing
    // from the delivered metrics and MEASURES the counts aggregate directly
    // (one extra banding pass, only for those runs), so the drop share is
    // real numbers even there — an empty result is exactly when silent cap
    // truncation would hide.
    val smallBuckets = counts
      .filter(col("_bn") <= maxBucketSize)
      .select(col(bucketCol))
    banded.join(smallBuckets, Seq(bucketCol))
  }

  /** Per-doc band keys as narrow `(_band, _id)` rows — the signature is
    * dropped BEFORE anything shuffles, so band exchanges carry ~16 bytes/row,
    * then oversized buckets are dropped ([[dropOversizedBuckets]]; the band
    * exchange is reused by Catalyst for the count, the filter join, and the
    * self-join).
    */
  private def cappedBands(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucketSize: Int): DataFrame = {
    val banded = sigs.select(
      col("_id"),
      explode(array((0 until bands).map(b =>
        minhash_band_key(col("_sig"), b, rowsPerBand)): _*)).as("_band"))
    dropOversizedBuckets(banded, "_band", maxBucketSize, "minhash")
  }

  /** MinHash-LSH candidate pairs: documents sharing >= 1 of `bands` band
    * keys, as (idA < idB) distinct pairs. Signatures are computed per-row
    * and never shuffle — band exchanges and the bucket self-join carry only
    * `(band, id)`.
    */
  def minHashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 5,
      maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val banded = cappedBands(
      nonEmptySigs(df, idCol, textCol, numHashes, shingleSize),
      bands, numHashes / bands, maxBucketSize)
    val a = banded.select(col("_band"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_id").as("id_b"))
    a.join(b, Seq("_band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Signature-estimated Jaccard: fraction of equal slots (codegen'd
    * VecEqFraction kernel — runs once per candidate pair, where an
    * interpreted higher-order function would pay per-slot lambda dispatch).
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    vec_eq_fraction(sigA, sigB)

  /** MinHash-LSH near-duplicate pairs with estimated similarity >= threshold.
    *
    * Scale shape: band exchanges and the bucket self-join carry only
    * `(band, id)` pairs, and the signatures are re-joined only for the (far
    * smaller) candidate-pair set to compute the estimated Jaccard.
    *
    * `cacheSignatures` trades storage for CPU across the three consumers of
    * the signature frame (banding + two candidate rejoins):
    *   - `true` (default): lazy localCheckpoint — the minhash pass runs once
    *     and ~(numHashes x 8)B/row are materialized to the block managers
    *     (memory, spilling to local disk). Right when documents are larger
    *     than their signatures (real web pages).
    *   - `false`: signatures are recomputed per consumer — zero storage,
    *     ~3-4x signature CPU (the banding join, its bucket-size count, and
    *     the two candidate rejoins each re-derive the frame unless Catalyst
    *     reuses an exchange). Right when documents are SMALLER than their
    *     1 KB signatures or executor disk is tight (found the hard way: a
    *     64M-row short-doc soak spilled ~70 GB of checkpointed signatures
    *     and filled the disk).
    */
  def minHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 5,
      maxBucketSize: Int = 10000,
      cacheSignatures: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rawSigs = nonEmptySigs(df, idCol, textCol, numHashes, shingleSize)
    val sigs = if (cacheSignatures) rawSigs.localCheckpoint(eager = false) else rawSigs
    pairsFromSigFrame(sigs, threshold, bands, numHashes / bands, maxBucketSize)
  }

  /** Banding + candidate generation + estimated-Jaccard verify over a
    * normalized `(_id, _sig)` signature frame — the pipeline shared by the
    * from-text and from-stored-signatures entry points.
    */
  private def pairsFromSigFrame(sigs: DataFrame, threshold: Double, bands: Int,
      rowsPerBand: Int, maxBucketSize: Int): DataFrame = {
    val banded = cappedBands(sigs, bands, rowsPerBand, maxBucketSize)
    val a = banded.select(col("_band"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_id").as("id_b"))
    val candidates = a.join(b, Seq("_band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sigA = sigs.select(col("_id").as("id_a"), col("_sig").as("_sig_a"))
    val sigB = sigs.select(col("_id").as("id_b"), col("_sig").as("_sig_b"))
    candidates.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("_sig_a"), col("_sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The ingest-time fingerprint step for [[minHashNearDupPairsOnSignatures]]:
    * `(idCol, minhash_sig array<long>)` for every row — INCLUDING
    * shingle-less docs, whose all-Long.MaxValue sentinel signature is stored
    * as-is (the pairs entry point excludes them, exactly like the text
    * path). Persist this once when documents land; every later dedup run
    * then reads ~numHashes x 8 B/row instead of re-hashing the text.
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      shingleSize: Int = 5): DataFrame =
    // NOT spread (unlike nonEmptySigs): this frame is typically written
    // straight to the fingerprint store, and a repartition here fans the
    // write out into one tiny file per core on narrow inputs (measured:
    // +0.3 s on the onsigs gate) — callers who burn CPU on it downstream
    // get the spread from the pairs path instead
    df.select(col(idCol),
      minhash_signature(col(textCol), numHashes, shingleSize).as("minhash_sig"))

  /** [[minHashNearDupPairs]] over PRE-COMPUTED signatures (`sigCol`, as
    * written by [[minHashSignatures]] at ingest) — the same
    * fingerprint-at-ingest pattern as [[simHashNearDupPairsOnHashes]].
    *
    * Scale rationale (measured, BASELINE.md round 2): the text path
    * re-computes signatures up to ~3x per run (banding + two candidate
    * rejoins) unless they are localCheckpointed, and checkpointing spilled
    * ~70 GB at 64M short docs — storage OR repeated CPU, every run. Stored
    * signatures break the trade: each consumer re-READS a column-pruned
    * ~(numHashes x 8)B/row parquet projection instead of re-hashing text,
    * so no checkpoint dial exists here at all, and the shingling CPU is
    * paid exactly once at ingest for the corpus's lifetime.
    *
    * `numHashes`/`bands` must match the ingest-time parameters (signatures
    * of a different width would band on wrong slots); null signatures and
    * the shingle-less sentinel are excluded like the text path. Identical
    * results to [[minHashNearDupPairs]] on the same corpus by construction
    * — both run [[pairsFromSigFrame]] on the same signature values.
    */
  def minHashNearDupPairsOnSignatures(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    // in-plan width guard (no extra pass): a stored signature narrower than
    // numHashes would make every high band key a CONSTANT (all slots out of
    // range), banding the whole corpus into one bucket per band — either a
    // quadratic self-join or a silently-capped empty result. Fail fast with
    // the actual widths instead.
    val checkedSig = when(size(col(sigCol)) === numHashes, col(sigCol))
      .otherwise(raise_error(format_string(
        s"stored minhash signature has %s slots but numHashes=$numHashes was " +
          s"requested — pass the ingest-time numHashes", size(col(sigCol))))
        .cast("array<bigint>"))
    // nulls drop BEFORE the width check (size(null) is null and would take
    // the raise_error branch)
    val sigs = df.filter(col(sigCol).isNotNull)
      .select(col(idCol).as("_id"), checkedSig.as("_sig"))
      .filter(element_at(col("_sig"), 1) =!= Long.MaxValue)
    pairsFromSigFrame(sigs, threshold, bands, numHashes / bands, maxBucketSize)
  }

  /** [[minHashDedup]] over STORED signatures: keeps every `df` row whose id
    * has no more-senior (smaller-id) near-duplicate, with the pair list
    * derived from the fingerprint table `sigs` (`sigIdCol`, `sigCol` — as
    * written by [[minHashSignatures]] at ingest; ids must align with `df`'s
    * `idCol` values). Same one-pass contract as [[minHashDedup]], zero text
    * re-hashing: a threshold re-tune re-runs this against the same stored
    * fingerprints. Rows of `df` without a fingerprint row have no pairs and
    * always survive.
    */
  def minHashDedupOnSignatures(
      df: DataFrame,
      idCol: String,
      sigs: DataFrame,
      sigIdCol: String,
      sigCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      maxBucketSize: Int = 10000): DataFrame =
    dropLosers(df, idCol, minHashNearDupPairsOnSignatures(sigs, sigIdCol, sigCol,
      threshold, numHashes, bands, maxBucketSize))

  /** One-pass loser drop shared by every near-dup dedup wrapper: a doc
    * survives unless some pair dominates it (its id is the larger side).
    * The loser list is small next to the corpus, so AQE broadcasts the
    * anti-join build side.
    */
  private def dropLosers(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("id_b").as("_loser")).distinct()
    df.join(losers, df(idCol) === col("_loser"), "left_anti")
  }

  /** Near-dup dedup: drop every document that has a more-senior (smaller id)
    * near-duplicate. One LSH pass (near-transitive clusters collapse to their
    * minimum over repeated application; one pass is the standard
    * training-data practice).
    */
  def minHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 5,
      cacheSignatures: Boolean = true): DataFrame =
    dropLosers(df, idCol, minHashNearDupPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleSize, cacheSignatures = cacheSignatures))

  /** One-pass simhash dedup: drop every document with a more-senior
    * (smaller-id) near-duplicate within `maxHamming` bits — the one-call
    * wrapper over [[simHashNearDupPairs]], same contract as
    * [[minHashDedup]] (chains keep every non-dominated doc; route through
    * [[nearDupClusters]] for transitive collapse).
    */
  def simHashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame =
    dropLosers(df, idCol,
      simHashNearDupPairs(df, idCol, textCol, maxHamming, maxBucketSize))

  /** One-pass embedding-cosine dedup: drop every vector with a more-senior
    * (smaller-id) near-duplicate at cosine >= threshold — the one-call
    * wrapper over [[embeddingNearDupPairs]], same contract as
    * [[minHashDedup]].
    */
  def embeddingDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      planes: Int = 16,
      tables: Int = 6,
      maxBucketSize: Int = 10000,
      cacheVectors: Boolean = true): DataFrame =
    dropLosers(df, idCol, embeddingNearDupPairs(df, idCol, vecCol, dim, threshold,
      planes, tables, maxBucketSize, cacheVectors))

  /** Cluster-aware near-dup dedup: keeps exactly ONE document (the minimum
    * id) per TRANSITIVE near-duplicate cluster. [[minHashDedup]]'s one-pass
    * contract keeps a doc whenever no direct pair dominates it, so a chain
    * A~B~C with A!~C keeps both A and C; this variant first closes the pair
    * list into connected components ([[nearDupClusters]]' min-label
    * propagation with pointer jumping, eager convergence) and keeps each
    * component's minimum. Costs the clustering rounds on top of one LSH pass
    * — the pair list, not the corpus, drives that cost (isolated docs ride
    * through one join).
    *
    * The survivor test is free: cluster labels ARE component minima, so a
    * doc survives iff its label equals its own id — no extra per-cluster
    * aggregation.
    */
  def minHashDedupTransitive(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 5,
      maxBucketSize: Int = 10000,
      cacheSignatures: Boolean = true,
      iterations: Int = 20): DataFrame =
    keepClusterMinima(df, idCol,
      minHashNearDupPairs(df, idCol, textCol, threshold, numHashes, bands,
        shingleSize, maxBucketSize, cacheSignatures), iterations)

  /** Cluster-aware dedup shared by the transitive wrappers: close the pair
    * list into connected components and keep each component's minimum. The
    * survivor test is free — cluster labels ARE component minima, so a doc
    * survives iff its label equals its own id.
    */
  private[ops] def keepClusterMinima(df: DataFrame, idCol: String, pairs: DataFrame,
      iterations: Int): DataFrame = {
    val survivors = nearDupClusters(df.select(col(idCol)), idCol,
      pairs.select(col("id_a"), col("id_b")), iterations)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }

  /** [[minHashDedupTransitive]] over STORED signatures: the transitive
    * counterpart of [[minHashDedupOnSignatures]] — pair list from the
    * fingerprint table, closed into connected components, one survivor per
    * component. Rows of `df` without a fingerprint row are isolated and
    * always survive.
    */
  def minHashDedupTransitiveOnSignatures(
      df: DataFrame,
      idCol: String,
      sigs: DataFrame,
      sigIdCol: String,
      sigCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      maxBucketSize: Int = 10000,
      iterations: Int = 20): DataFrame =
    keepClusterMinima(df, idCol,
      minHashNearDupPairsOnSignatures(sigs, sigIdCol, sigCol, threshold,
        numHashes, bands, maxBucketSize), iterations)

  /** One-pass simhash dedup over PRE-COMPUTED 64-bit fingerprints
    * (`hashCol` on `df` itself) — [[simHashDedup]] for corpora that store
    * their simhash at ingest. Rows with a null hash never pair and always
    * survive.
    */
  def simHashDedupOnHashes(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame =
    dropLosers(df, idCol,
      simHashNearDupPairsOnHashes(df, idCol, hashCol, maxHamming, maxBucketSize))

  /** Transitive counterpart of [[simHashDedupOnHashes]]. */
  def simHashDedupTransitiveOnHashes(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000,
      iterations: Int = 20): DataFrame =
    keepClusterMinima(df, idCol,
      simHashNearDupPairsOnHashes(df, idCol, hashCol, maxHamming, maxBucketSize),
      iterations)

  /** Cluster-aware simhash dedup: [[simHashNearDupPairs]] closed into
    * connected components, one survivor (minimum id) per component — the
    * transitive counterpart of [[simHashDedup]], exactly like
    * [[minHashDedupTransitive]] vs [[minHashDedup]].
    */
  def simHashDedupTransitive(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000,
      iterations: Int = 20): DataFrame =
    keepClusterMinima(df, idCol,
      simHashNearDupPairs(df, idCol, textCol, maxHamming, maxBucketSize), iterations)

  /** Cluster-aware embedding dedup: [[embeddingNearDupPairs]] closed into
    * connected components, one survivor (minimum id) per component.
    */
  def embeddingDedupTransitive(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      planes: Int = 16,
      tables: Int = 6,
      maxBucketSize: Int = 10000,
      cacheVectors: Boolean = true,
      iterations: Int = 20): DataFrame =
    keepClusterMinima(df, idCol,
      embeddingNearDupPairs(df, idCol, vecCol, dim, threshold, planes, tables,
        maxBucketSize, cacheVectors), iterations)

  /** Frees a localCheckpoint's blocks NOW instead of waiting for GC-driven
    * cleanup. ONLY for checkpoints that nothing can reference again — a
    * freed local checkpoint cannot be recomputed (its lineage is severed).
    * Same lesson as [[Similarity.compactIndex]]: resident blocks from a
    * finished step tax everything that runs after.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Transitive near-duplicate clusters from a pair list: each round does one
    * hop of min-label propagation over the edges PLUS a pointer-jumping step
    * (label := label(label)), so round r covers chains of length ~2^r.
    * Returns (id, cluster_id); docs without any pair map to themselves.
    *
    * Convergence: with `converge = true` (default) each round is evaluated
    * eagerly and the loop STOPS at the first round where no label changed —
    * a sound fixpoint test (labels only ever decrease, and a hop-stable
    * labeling is constant per connected component, hence the component
    * minimum). `iterations` is then only a safety budget (default 20 covers
    * component diameters ~2^20; a warning is logged if it is ever
    * exhausted). With `converge = false` the function stays a pure lazy plan
    * builder — no Spark jobs run until the caller acts — and runs exactly
    * `iterations` rounds, so the caller owns the chain-length contract
    * (diameter <= ~2^iterations).
    */
  /** Edge-count ceiling for the driver-side connected-components fast path
    * of [[nearDupClusters]] (0 disables it). Near-dup pair lists are tiny
    * next to their corpus — when the whole list fits comfortably on the
    * driver, union-find there replaces the per-round join/checkpoint/probe
    * job cascade of the distributed loop (measured: ~1.3 s of fixed cost per
    * clustering at bench scale) with ONE collect; past the ceiling the
    * distributed loop runs exactly as before, so corpus-scale pair lists
    * never touch the driver.
    */
  private def ccDriverMaxEdges: Int =
    sys.props.get("graft.cc.driver.max.edges")
      .orElse(sys.env.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES"))
      .map(_.toInt).getOrElse(1000000)

  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame, // (id_a, id_b) with id_a < id_b
      iterations: Int = 20,
      converge: Boolean = true): DataFrame = {
    // iterations <= 0 would skip the loop entirely and return all-self labels
    // while (with converge) printing a spurious budget-exhausted warning
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // Driver fast path: when the pair list is small (the normal case — LSH
    // pair lists are a sliver of the corpus), collect it once and run exact
    // union-find with min-label roots on the driver. Identical semantics to
    // the converged loop below: component minima as labels, and edges with
    // an endpoint outside `df` neither receive labels nor bridge components
    // (a membership probe resolves that before any union). Only for eager
    // (converge) mode — lazy mode is contractually a pure plan builder — and
    // long ids (the min-label order of other types belongs to Catalyst).
    // Side benefit: the collect is a plain action over the pairs plan, so
    // the LSH bucket-cap observe metric upstream is delivered IN-PLAN here —
    // the lazy-checkpoint delivery miss (and its measure-on-miss re-run of
    // the banding aggregate, one extra pass per clustering) only remains on
    // the distributed path.
    if (converge && ccDriverMaxEdges > 0 &&
        df.schema(idCol).dataType == org.apache.spark.sql.types.LongType) {
      val cap = ccDriverMaxEdges
      val collected = pairs
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        // null-endpoint edges are inert in the distributed loop (equi-joins
        // skip null keys) — dropping them here is the identical semantics
        .filter(col("id_a").isNotNull && col("id_b").isNotNull)
        .head(cap + 1)
      if (collected.length <= cap)
        return driverClusters(df, idCol, collected)
      // else: fall through — the distributed loop re-evaluates `pairs`
      // (same cost the loop always paid; the oversized head() is discarded)
    }
    // Materialized once (lazily): the pair list is typically itself an LSH
    // pipeline, and every iteration joins against it.
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint(eager = false)
    // Propagate over PAIRED docs only: near-dup pair lists cover a small
    // fraction of a corpus, and an isolated doc's label never changes — the
    // previous shape dragged every corpus row through two joins PER ROUND.
    // Isolated docs rejoin once at the end (left join + coalesce = one
    // corpus pass total). The left-semi keeps the old contract that pair
    // endpoints outside `df` neither receive labels nor bridge components.
    var labels = df.select(col(idCol).as("_id"), col(idCol).as("cluster_id"))
      .join(edges.select(col("id_a").as("_id")).distinct(), Seq("_id"), "left_semi")
    // eager (converge) mode frees each round's checkpoints as soon as the
    // following round has materialized: a round's `jumped` intermediate and
    // the PREVIOUS round's frame can never be referenced again, and leaving
    // them resident accumulates 2 frames per round in the block managers
    // for the whole clustering (the final round's frame must stay — the
    // returned plan reads it, and a freed local checkpoint cannot be
    // recomputed). Lazy mode frees nothing: plans are unmaterialized.
    var prevRound: Option[DataFrame] = None
    var i = 0
    var done = false
    while (i < iterations && !done) {
      // hop: min of own and neighbors' labels
      val neighborMin = edges
        .join(labels, edges("id_b") === labels("_id"))
        .groupBy(col("id_a")).agg(min(col("cluster_id")).as("_nmin"))
      val hopped = labels
        .join(neighborMin, labels("_id") === neighborMin("id_a"), "left")
        .select(col("_id"),
          least(col("cluster_id"), coalesce(col("_nmin"), col("cluster_id")))
            .as("cluster_id"),
          (col("_nmin") < col("cluster_id")).as("_chg"))
      // pointer jump: adopt the label of the current label (path halving).
      // `hopped` feeds the join twice, so checkpoint it (computed once at
      // first use); then truncate the running frame's lineage every round —
      // without the checkpoints the logical plan doubles per iteration and
      // Catalyst re-analyzes the whole chain each time (driver-side blow-up
      // for deep iteration counts). eager follows `converge`: the fixpoint
      // test needs the round materialized anyway, and the check then reads
      // the block manager instead of recomputing.
      val jumped = hopped.localCheckpoint(eager = converge)
      val parents = jumped.select(
        col("_id").as("_pid"), col("cluster_id").as("_plabel"))
      val next = jumped
        .join(parents, jumped("cluster_id") === parents("_pid"), "left")
        .select(col("_id"),
          least(col("cluster_id"), coalesce(col("_plabel"), col("cluster_id")))
            .as("cluster_id"),
          // changed this round = hop lowered it, or the jump did (null-safe:
          // _chg/_plabel are null for isolated labels -> no change)
          (coalesce(col("_chg"), lit(false)) ||
            coalesce(col("_plabel") < col("cluster_id"), lit(false))).as("_chg"))
        .localCheckpoint(eager = converge)
      // the convergence probe scans the just-materialized round for one
      // changed row (limit-1 short-circuits; the final, converged round is
      // the only full scan) — no extra join, the flag rides the round frame
      if (converge) {
        done = next.filter(col("_chg")).isEmpty
        freeCheckpoint(jumped)
        prevRound.foreach(freeCheckpoint)
        prevRound = Some(next)
      }
      labels = next.select(col("_id"), col("cluster_id"))
      i += 1
    }
    // the edge list is dead once the last round has materialized (the
    // returned plan reads only the final label frame)
    if (converge) freeCheckpoint(edges)
    if (converge && !done)
      System.err.println(s"[graft] nearDupClusters: iteration budget " +
        s"($iterations) exhausted before convergence — components with " +
        s"diameter > ~2^$iterations may be split; raise `iterations`")
    // isolated docs (the vast majority at corpus scale) map to themselves in
    // one pass; the propagated label frame is small, so AQE broadcasts it
    val fin = labels.select(col("_id"), col("cluster_id"))
    df.select(col(idCol).as("_id"))
      .join(fin, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("cluster_id"), col("_id")).as("cluster_id"))
  }

  /** Driver-side exact connected components for [[nearDupClusters]]' fast
    * path: union-find with path compression over the collected edge list,
    * roots resolved to component minima — the same labeling the converged
    * distributed loop computes. Edges touching an id absent from `df` are
    * dropped BEFORE any union (one broadcast semi-probe of `df`'s id column
    * resolves membership), preserving the contract that outside endpoints
    * neither receive labels nor bridge components.
    */
  private def driverClusters(df: DataFrame, idCol: String,
      edgeRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val labelSchema = StructType(Seq(
      StructField("_id", LongType), StructField("cluster_id", LongType)))
    val endpoints: Array[Long] = {
      val s = new java.util.HashSet[java.lang.Long]()
      edgeRows.foreach { r => s.add(r.getLong(0)); s.add(r.getLong(1)) }
      val out = new Array[Long](s.size)
      val it = s.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    val present = new java.util.HashSet[java.lang.Long]()
    if (endpoints.nonEmpty) {
      val epDf = spark.createDataFrame(
        java.util.Arrays.asList(endpoints.map(e => Row(e)): _*),
        StructType(Seq(StructField("_ep", LongType))))
      // membership probe: one projected scan of df's id column against the
      // broadcast endpoint set (bounded by 2x the edge cap)
      df.select(col(idCol).as("_ep"))
        .join(broadcast(epDf), Seq("_ep"), "left_semi")
        .distinct().collect().foreach(r => present.add(r.getLong(0)))
    }
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeRows.foreach { e =>
      val a = e.getLong(0)
      val b = e.getLong(1)
      if (present.contains(a) && present.contains(b)) {
        val ra = find(a)
        val rb = find(b)
        // union by min root: keeps find() roots already component-minimal
        if (ra < rb) { parent(b) = ra; parent(rb) = ra }
        else if (rb < ra) { parent(a) = rb; parent(ra) = rb }
      }
    }
    // every touched node labels to its root (== component min, since unions
    // always kept the smaller root); untouched df ids self-label via the
    // final coalesce
    val labelRows: java.util.List[Row] = {
      val out = new java.util.ArrayList[Row](parent.size)
      parent.foreachKey { n => out.add(Row(n, find(n))) }
      out
    }
    val fin = spark.createDataFrame(labelRows, labelSchema)
    df.select(col(idCol).as("_id"))
      .join(broadcast(fin), Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("cluster_id"), col("_id")).as("cluster_id"))
  }

  // --- SimHash multi-piece bucketing --------------------------------------
  // The 64-bit simhash is split into `maxHamming + 3` near-equal blocks and
  // bucketed on every block TRIPLE. A pair within Hamming <= m corrupts at
  // most m blocks, so at least (m + 3) - m = 3 blocks agree BIT-FOR-BIT —
  // the pair shares at least one of the C(m+3, 3) triple keys (pigeonhole;
  // the guarantee needs blocks - tripleSize >= maxHamming). At the default
  // m = 3 that is 6 blocks (11,11,11,11,10,10 bits) and 20 keys of ~32 bits
  // — vs 16 bits for the retired 4-quarter scheme, whose every bucket
  // passed any sane cap by a few million docs (and, measured, saturated on
  // TEMPLATED text at only 2M): random-corpus occupancy drops from
  // corpus/2^16 per quarter to corpus/2^32 per triple, sparse into the
  // billions. Larger m trades both fan-out and key width: m = 6 buckets on
  // C(9,3) = 84 keys of ~21 bits (occupancy corpus/2M per key). Cost at
  // m = 3: 20 (key, id, hash) rows per doc instead of 4 — ~5x the (still
  // tiny, ~24 B/row) band traffic.
  val SimHashMaxHammingLimit = 6

  /** Near-even 64-bit split into `blocks` pieces: the first (64 mod blocks)
    * blocks take the extra bit. blocks = 6 yields 11,11,11,11,10,10 —
    * bit-identical to the fixed layout the 20-triple scheme shipped with.
    */
  private[ops] def simHashBlockBits(blocks: Int): Array[Int] =
    Array.tabulate(blocks)(b => 64 / blocks + (if (b < 64 % blocks) 1 else 0))

  private[ops] def simHashTriples(blocks: Int): IndexedSeq[(Int, Int, Int)] =
    for {
      i <- 0 until blocks
      j <- i + 1 until blocks
      k <- j + 1 until blocks
    } yield (i, j, k)

  /** All C(blocks,3) block-triple bucket keys of one 64-bit simhash column,
    * each ONE long: the triple index in the top bits tags the triple's three
    * blocks concatenated — `t << 48 | blocks`, collision-free across triples
    * by construction (the widest supported triple is 3 x 16 = 48 bits at 4
    * blocks, and the largest tag, C(9,3) - 1 = 83, fits bits 48..55). A
    * flat 8-byte key shuffles, hashes, and aggregates cheaper than a struct
    * key. Pure column algebra over one projected hash value — the hash is
    * computed once per row, never per key.
    */
  private def simHashTripleKeys(sh: Column, blocks: Int): Column = {
    val bits = simHashBlockBits(blocks)
    val offset = bits.scanLeft(0)(_ + _).init
    def block(b: Int): Column =
      shiftrightunsigned(sh, offset(b)).bitwiseAND(lit((1L << bits(b)) - 1))
    array(simHashTriples(blocks).zipWithIndex.map { case ((i, j, k), t) =>
      shiftleft(block(i), bits(j) + bits(k)) +
        shiftleft(block(j), bits(k)) + block(k) +
        lit(t.toLong << 48)
    }: _*)
  }

  /** SimHash near-duplicate pairs: same 64-bit simhash up to `maxHamming`
    * differing bits (0..[[SimHashMaxHammingLimit]]; 0 = identical hashes
    * only, bucketed like maxHamming = 1). Buckets by the
    * C(maxHamming+3, 3) block-triple keys (any pair within the Hamming bound
    * must fully agree on at least one triple — see [[simHashBlockBits]]),
    * verifies exact Hamming distance inside buckets only. Completeness
    * therefore never depends on luck: bucketing is a covering code for the
    * requested bound, and the verify filter makes false bucket collisions
    * harmless. Fan-out and key width both scale with the bound (m = 3: 20
    * keys of ~32 bits; m = 6: 84 keys of ~21 bits) — prefer the smallest
    * maxHamming the task tolerates.
    *
    * `maxBucketSize` caps triple buckets exactly like minhash's band cap: a
    * boilerplate-heavy corpus where thousands of near-identical docs share
    * all blocks would otherwise go quadratic in those buckets. Pairs
    * entirely inside an oversized bucket are not reported (see
    * [[dropOversizedBuckets]]); with ~32-bit keys a RANDOM corpus never
    * approaches the cap below billions of docs — oversized buckets now
    * always mean true boilerplate, which belongs to exact dedup.
    */
  def simHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame =
    simHashNearDupPairsOnHashes(
      // simhash64 tokenizes + hashes every word: spread the projected
      // (id, text) frame so a narrow input cannot serialize the hash pass
      Spread.cpuBound(df.select(col(idCol), col(textCol)))
        .select(col(idCol), simhash64(col(textCol)).as("__graft_sh"))
        // hash 0 is the zero-FEATURE case (empty/whitespace/punct-only text:
        // no word hashes, all counters 0) — the simhash analogue of minhash's
        // shingle-less sentinel. Such docs carry no content signal, yet all
        // share hash 0 and would pair with each other at "hamming 0" despite
        // different raw bytes; they belong to exact dedup, not LSH. A REAL
        // text hashing to exactly 0 needs all 64 counters balanced-or-
        // negative simultaneously (~2^-64 for non-degenerate inputs).
        .filter(col("__graft_sh") =!= 0L),
      idCol, "__graft_sh", maxHamming, maxBucketSize)

  /** [[simHashNearDupPairs]] over PRE-COMPUTED 64-bit simhashes (`hashCol`):
    * corpora that store fingerprints (e.g. via `simhash64` at ingest) skip
    * re-hashing the text, and synthetic-hash soaks can exercise the
    * bucketing at web scale without materializing web-scale text.
    */
  def simHashNearDupPairsOnHashes(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= SimHashMaxHammingLimit,
      s"block-triple bucketing supports maxHamming <= $SimHashMaxHammingLimit " +
        s"(maxHamming + 3 blocks keyed on triples; got $maxHamming — beyond " +
        s"$SimHashMaxHammingLimit the ~${64 / (SimHashMaxHammingLimit + 3)}-bit " +
        s"blocks stop discriminating and the fan-out grows combinatorially)")
    val blocks = math.max(maxHamming, 1) + 3
    // null hashes (null text upstream, or nulls in a stored fingerprint
    // column) can never pair — a null key matches nothing in the bucket
    // equi-join — but WOULD band into one shared null bucket first, where a
    // null-heavy corpus pollutes the drop-share metric (and pays 20
    // exchange rows per null). They belong out of LSH entirely, like
    // minhash's shingle-less docs.
    val hashed = df.select(col(idCol).as("_id"), col(hashCol).as("_sh"))
      .filter(col("_sh").isNotNull)
    val banded = dropOversizedBuckets(
      hashed.select(col("_id"), col("_sh"),
        explode(simHashTripleKeys(col("_sh"), blocks)).as("_bucket")),
      "_bucket", maxBucketSize, "simhash")
    val a = banded.select(col("_bucket"), col("_id").as("id_a"), col("_sh").as("_sh_a"))
    val b = banded.select(col("_bucket"), col("_id").as("id_b"), col("_sh").as("_sh_b"))
    a.join(b, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sh_a").bitwiseXOR(col("_sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // a pair can share several agreeing triples; min() is pure dedup (the
      // hamming of a pair is the same in every bucket it meets in)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Exact n-gram Jaccard similarity of two text columns (built-in set
    * algebra over shingle hash sets). Two shingle-less texts have no defined
    * similarity and yield NULL — without the guard Spark 4's default ANSI
    * mode would throw DIVIDE_BY_ZERO on the empty union.
    */
  def ngramJaccard(textA: Column, textB: Column, shingleSize: Int = 5): Column = {
    val sa = shingle_set(textA, shingleSize)
    val sb = shingle_set(textB, shingleSize)
    val union = size(array_union(sa, sb))
    when(union > 0,
      size(array_intersect(sa, sb)).cast("double") / union.cast("double"))
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets prune the
    * candidate space, exact cosine verifies inside buckets. Pairs with
    * cosine >= threshold, (idA < idB) distinct.
    *
    * Scale shape — the same one minhash earned the hard way: bucket
    * exchanges and the bucket self-join carry ONLY `(bucket, id)` (~20
    * bytes/row); the vectors are re-joined by id for the far smaller
    * distinct candidate-pair set, so each pair's cosine is computed exactly
    * once (the previous shape shuffled `tables` copies of every vector
    * through the self-join and scored a pair once per shared bucket).
    *
    * Dirty vectors (wrong length, null elements, non-finite, all-zero) get
    * no buckets from the kernel and drop out of LSH entirely. `maxBucketSize`
    * caps the remaining buckets like minhash's band cap — a direction shared
    * by a huge number of embeddings (e.g. a template cluster) would
    * otherwise go quadratic in its bucket; pairs entirely inside an
    * oversized bucket are not reported (see [[dropOversizedBuckets]]).
    *
    * `cacheVectors` is minhash's `cacheSignatures` dial: `true` (default)
    * lazily localCheckpoints the projected (id, vec, norm) frame shared by
    * banding and the two candidate rejoins; `false` recomputes it per
    * consumer (right when the upstream is a cheap scan or executor disk is
    * tight).
    *
    * SIZING `planes`: each table has 2^planes buckets and candidate work is
    * sum(bucketSize^2) per table, so aim for
    * `planes >= log2(corpus / desired_bucket_size)` — e.g. 2M vectors at
    * ~30/bucket needs 16 planes; the old default of 10 (1024 buckets/table)
    * put ~2000 random vectors in every bucket at 2M corpus and made the
    * self-join a 10^10-pair explosion (measured, BASELINE.md). More planes =
    * fewer false candidates but lower recall per table; add tables to buy
    * recall back.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      planes: Int = 16,
      tables: Int = 6,
      maxBucketSize: Int = 10000,
      cacheVectors: Boolean = true): DataFrame = {
    // norms once per row, never per candidate pair; all table buckets from
    // one kernel pass (posexplode: pos = table; dirty vectors -> no rows)
    val rawVecs = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      Similarity.norm(col(vecCol)).as("_n"))
    val vecs = if (cacheVectors) rawVecs.localCheckpoint(eager = false) else rawVecs
    val banded = dropOversizedBuckets(
      vecs.select(col("_id"),
        posexplode(hyperplane_buckets(col("_v"), dim, planes, tables)))
        .select(col("_id"),
          struct(col("pos").as("t"), col("col").as("b")).as("_bucket")),
      "_bucket", maxBucketSize, "embedding")
    val a = banded.select(col("_bucket"), col("_id").as("id_a"))
    val b = banded.select(col("_bucket"), col("_id").as("id_b"))
    val candidates = a.join(b, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val va = vecs.select(col("_id").as("id_a"), col("_v").as("_va"), col("_n").as("_na"))
    val vb = vecs.select(col("_id").as("id_b"), col("_v").as("_vb"), col("_n").as("_nb"))
    val denom = col("_na") * col("_nb")
    candidates.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        when(denom > 0, Similarity.dot(col("_va"), col("_vb")) / denom)
          .otherwise(lit(0.0)).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
