package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the reference's statistical error benchmark
  * (benches/cardinality_estimator.rs:163-186; published table
  * README.md:184-209): many seeded runs per cardinality, average |relative
  * error| must sit within the published envelope. The reference reports
  * 0.0080-0.0138 (mean 0.0064) for p=12 over 256..1M; we assert a slightly
  * looser 0.02 per-cardinality cap and the theoretical-bound mean.
  */
class StatisticalErrorSpec extends AnyFunSuite {

  private def avgAbsRelErr(p: Int, w: Int, n: Int, runs: Int): Double = {
    var total = 0.0
    for (run <- 0 until runs) {
      val sk = CardinalitySketch(p, w)
      var i = 0
      while (i < n) {
        // distinct universe per run: fold the run id into the item
        sk.insertHash(WyHash.hashLong(run.toLong * 0x9e3779b97f4a7c15L + i))
        i += 1
      }
      total += math.abs(sk.estimate.toDouble - n) / n
    }
    total / runs
  }

  test("p=12 w=6: avg |rel err| within published envelope across cardinalities") {
    val results = Seq(256, 1024, 4096, 16384, 65536).map { n =>
      n -> avgAbsRelErr(12, 6, n, runs = 20)
    }
    results.foreach { case (n, err) =>
      assert(err <= 0.02, s"n=$n avg err $err exceeds 0.02 (published max 0.0138)")
    }
    val mean = results.map(_._2).sum / results.size
    assert(mean <= 1.04 / math.sqrt(4096.0), s"mean err $mean exceeds 1 sigma")
  }

  test("exact range: exact up to 31-bit encoded-hash collisions (array.rs:59)") {
    // Small/Array dedup on a 31-bit encoded space: ~8e-5 per 128-item run.
    // Run 9 here genuinely collides (values 9000045 and 9000056 share the
    // low 25 idx bits and rank) — the reference behaves identically, so the
    // assertion tolerates exactly that kind of rare off-by-one.
    var collisions = 0
    for (run <- 0 until 50) {
      val sk = CardinalitySketch(12, 6)
      (0 until 128).foreach(i => sk.insertHash(WyHash.hashLong(run * 1000003L + i)))
      assert(sk.estimate >= 127L && sk.estimate <= 128L, s"run $run: ${sk.estimate}")
      if (sk.estimate == 127L) collisions += 1
    }
    assert(collisions <= 2, s"too many encoded-hash collisions: $collisions")
  }

  test("p=10 and p=14 track their own theoretical bounds") {
    assert(avgAbsRelErr(10, 5, 8192, 15) <= 1.04 / math.sqrt(1024.0) * 1.2)
    assert(avgAbsRelErr(14, 6, 8192, 15) <= 1.04 / math.sqrt(16384.0) * 1.2)
  }
}
