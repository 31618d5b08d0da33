package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded, deterministic) mirroring the reference fuzz
  * targets (fuzz/fuzz_targets/estimator.rs: split-insert-merge invariants) and
  * the merge-law guarantees distributed aggregation depends on
  * (src/estimator.rs:287-333 checks both orders of every representation pair).
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def sketchOf(items: Seq[Long], p: Int = 12, w: Int = 6): CardinalitySketch = {
    val sk = CardinalitySketch(p, w)
    items.foreach(i => sk.insertHash(WyHash.hashLong(i)))
    sk
  }

  private def canonical(sk: CardinalitySketch): Seq[Byte] = sk.serialize().toSeq

  // Sizes crossing all three representations and their boundaries.
  private val sizes = Seq(0, 1, 2, 3, 5, 100, 127, 128, 129, 200, 1000)

  private def randomItems(rnd: Random): Seq[Long] =
    Seq.fill(sizes(rnd.nextInt(sizes.length)))(rnd.nextLong())

  test("merge is commutative (estimates always; canonical bytes in HLL range)") {
    val rnd = new Random(12345)
    for (_ <- 0 until 200) {
      val xs = randomItems(rnd); val ys = randomItems(rnd)
      val ab = sketchOf(xs); ab.merge(sketchOf(ys))
      val ba = sketchOf(ys); ba.merge(sketchOf(xs))
      assert(ab.estimate == ba.estimate, s"|xs|=${xs.size} |ys|=${ys.size}")
      // Small-mode slot order depends on insertion order; HLL state does not.
      if (xs.size + ys.size > 300) assert(canonical(ab) == canonical(ba))
    }
  }

  test("merge is associative on estimates") {
    val rnd = new Random(23456)
    for (_ <- 0 until 100) {
      val xs = randomItems(rnd); val ys = randomItems(rnd); val zs = randomItems(rnd)
      val left = sketchOf(xs)
      left.merge(sketchOf(ys)); left.merge(sketchOf(zs))
      val right = sketchOf(ys)
      right.merge(sketchOf(zs))
      val all = sketchOf(xs)
      all.merge(right)
      assert(left.estimate == all.estimate)
    }
  }

  test("merge of partitioned stream equals single-pass sketch (partial-agg soundness)") {
    val rnd = new Random(34567)
    for (_ <- 0 until 100) {
      val xs = randomItems(rnd)
      val parts = 1 + rnd.nextInt(8)
      val whole = sketchOf(xs)
      val merged = CardinalitySketch(12, 6)
      xs.grouped(math.max(1, xs.size / parts + 1)).foreach(c => merged.merge(sketchOf(c)))
      assert(merged.estimate == whole.estimate)
      assert(canonical(merged) == canonical(whole))
    }
  }

  test("duplicates never change the sketch") {
    val rnd = new Random(45678)
    for (_ <- 0 until 100) {
      val xs = randomItems(rnd)
      val once = sketchOf(xs)
      val thrice = sketchOf(xs ++ xs ++ xs.reverse)
      assert(once.estimate == thrice.estimate)
      assert(canonical(once) == canonical(thrice))
    }
  }

  test("exact below 129 distinct, bounded error above (src/lib.rs:36-40)") {
    val rnd = new Random(56789)
    for (_ <- 0 until 60) {
      val n = rnd.nextInt(5001)
      val sk = sketchOf(0L until n.toLong)
      if (n <= 128) assert(sk.estimate == n.toLong)
      else {
        val err = math.abs(sk.estimate.toDouble - n) / n
        assert(err <= 1.04 / math.sqrt(4096.0) * 4.0, s"n=$n est=${sk.estimate} err=$err")
      }
    }
  }

  test("insert after deserialize never crashes and keeps invariants (fuzz serde)") {
    val rnd = new Random(67890)
    for (_ <- 0 until 100) {
      val rt = CardinalitySketch.deserialize(sketchOf(randomItems(rnd)).serialize())
      rt.insertHash(WyHash.hashLong(1L))
      assert(rt.estimate > 0)
      assert(rt.sizeInBytes > 0)
    }
  }

  test("serialize/deserialize round trip across all precisions and widths") {
    for (p <- Seq(4, 10, 11, 12, 18); w <- Seq(4, 5, 6); n <- Seq(0, 2, 50, 300)) {
      val sk = sketchOf(0L until n.toLong, p, w)
      val rt = CardinalitySketch.deserialize(sk.serialize())
      assert(rt == sk, s"p=$p w=$w n=$n")
      assert(rt.estimate == sk.estimate)
    }
  }

  test("deserialize random garbage either fails cleanly or yields a working sketch") {
    val rnd = new Random(78901)
    for (_ <- 0 until 500) {
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      try {
        val sk = CardinalitySketch.deserialize(bytes)
        sk.insertHash(WyHash.hashLong(42L))
        assert(sk.estimate > 0)
      } catch {
        case _: IllegalArgumentException => // expected for malformed input
      }
    }
  }
}
