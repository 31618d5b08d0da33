package graft.sql

import graft.core.WyHash

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared text-shingling used by the dedup expressions: lowercase, split on
  * non-alphanumerics, build word k-grams, hash each with wyhash. One pass, no
  * intermediate explode/shuffle — the scalable shape for per-document
  * fingerprints.
  */
private[graft] object Shingling {

  // compiled once: String.split would recompile the pattern on every row
  private val WordBoundary = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  /** 64-bit hash of each word k-gram of the (lowercased) text.
    *
    * Each word is wyhashed ONCE; a shingle's hash is a position-sensitive
    * mum-mix of its k word hashes (the same combiner as the LSH band key).
    * The earlier formulation re-built the joined shingle string and re-hashed
    * its full byte run for every window position — O(k) more byte traffic
    * plus two allocations per shingle. Downstream semantics only need the
    * hash to be deterministic and injective-in-practice (set sizes for exact
    * Jaccard, permutation minima for MinHash), which the mix preserves.
    */
  def shingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val wh = wordHashes(text)
    if (wh.length < k) {
      if (wh.isEmpty) Array.empty
      else Array(combine(wh, 0, wh.length))
    } else {
      val out = new Array[Long](wh.length - k + 1)
      var i = 0
      while (i + k <= wh.length) {
        out(i) = combine(wh, i, k)
        i += 1
      }
      out
    }
  }

  def split(text: UTF8String): Array[String] = {
    // toLowerCase on the JVM string: correctness over micro-perf here
    WordBoundary.split(text.toString.toLowerCase).filter(_.nonEmpty)
  }

  /** wyhash of every word of the lowercased text. */
  def wordHashes(text: UTF8String): Array[Long] = {
    val words = split(text)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val bytes = words(i).getBytes("UTF-8")
      out(i) = WyHash.hash(bytes, 0, bytes.length, 0L)
      i += 1
    }
    out
  }

  @inline private def combine(h: Array[Long], start: Int, len: Int): Long = {
    var acc = WyHash.hashLong(len.toLong)
    var i = start
    while (i < start + len) {
      acc = WyHash.mum(acc ^ h(i), WyHash.P1)
      i += 1
    }
    acc
  }
}

/** Per-row MinHash signature of a text column: `numHashes` permutation minima
  * over the word `shingleSize`-grams, permutations via universal hashing
  * (a_i * h + b_i with odd a_i derived from wyhash of the index — seedless
  * and deterministic). Jaccard similarity of two documents ~= fraction of
  * matching signature slots. Computed per row — embarrassingly parallel, no
  * explode, no shuffle; the LSH banding that follows is plain column algebra.
  */
case class MinHashSignature(child: Expression, numHashes: Int = 128, shingleSize: Int = 5)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(numHashes)(i => WyHash.hashLong(i.toLong * 2 + 1) | 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(numHashes)(i => WyHash.hashLong(-i.toLong - 1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash expects a string column, got ${child.dataType.catalogString}")
    else if (numHashes < 2 || numHashes > 1024)
      TypeCheckResult.TypeCheckFailure(s"numHashes must be in [2..1024], got $numHashes")
    else if (shingleSize < 1 || shingleSize > 32)
      TypeCheckResult.TypeCheckFailure(s"shingleSize must be in [1..32], got $shingleSize")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val hashes = Shingling.shingleHashes(input.asInstanceOf[UTF8String], shingleSize)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < hashes.length) {
      val h = hashes(s)
      var i = 0
      while (i < numHashes) {
        val v = coefA(i) * h + coefB(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash of a text column: for every word 1-gram hash, add +1/-1 to
  * 64 bit-counters by the hash's bits; the sign pattern is the fingerprint.
  * Near-duplicates land within a small Hamming distance. Per-row, one pass.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects a string column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val wordHs = Shingling.wordHashes(input.asInstanceOf[UTF8String])
    val counters = new Array[Int](64)
    var w = 0
    while (w < wordHs.length) {
      val h = wordHs(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Word k-gram (shingle) hash set of a text column — the exact-Jaccard
  * building block (array_intersect/array_union on two of these gives the true
  * n-gram Jaccard similarity). Distinct, sorted for deterministic output.
  */
case class ShingleSet(child: Expression, shingleSize: Int = 5)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_set expects a string column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val hs = Shingling.shingleHashes(input.asInstanceOf[UTF8String], shingleSize)
    val distinct = hs.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

/** MinHash band key: hash of signature slots [band*rowsPerBand, ...) — docs
  * sharing any band key are LSH candidates.
  */
case class MinHashBandKey(child: Expression, band: Int, rowsPerBand: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band key expects array<bigint> signature, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = WyHash.hashLong(band.toLong)
    var i = band * rowsPerBand
    val end = math.min(arr.numElements(), i + rowsPerBand)
    while (i < end) {
      acc = WyHash.mum(acc ^ arr.getLong(i), WyHash.P1)
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKey =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_key"
}
