package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite {
  test("no false negatives; fpp near target") {
    val bf = BloomFilter.forExpected(10000, 0.01)
    (0 until 10000).foreach(i => bf.putHash(WyHash.hashLong(i.toLong)))
    assert((0 until 10000).forall(i => bf.mightContainHash(WyHash.hashLong(i.toLong))))
    val fps = (10000 until 110000).count(i => bf.mightContainHash(WyHash.hashLong(i.toLong)))
    val fpp = fps / 100000.0
    assert(fpp < 0.03, s"fpp $fpp too high for target 0.01")
  }

  test("merge is union; serde round trip") {
    val a = BloomFilter.forExpected(1000, 0.01)
    val b = BloomFilter.forExpected(1000, 0.01)
    (0 until 500).foreach(i => a.putHash(WyHash.hashLong(i.toLong)))
    (500 until 1000).foreach(i => b.putHash(WyHash.hashLong(i.toLong)))
    a.merge(BloomFilter.deserialize(b.serialize()))
    assert((0 until 1000).forall(i => a.mightContainHash(WyHash.hashLong(i.toLong))))
    assert(BloomFilter.deserialize(a.serialize()) == a)
  }

  test("rejects mismatched geometry and garbage bytes") {
    intercept[IllegalArgumentException](
      new BloomFilter(1024, 3).merge(new BloomFilter(2048, 3)))
    intercept[IllegalArgumentException](BloomFilter.deserialize(Array[Byte](1, 2, 3)))
    val bad = new BloomFilter(1024, 3).serialize()
    bad(0) = 0
    intercept[IllegalArgumentException](BloomFilter.deserialize(bad))
  }
}

class CountMinSketchSpec extends AnyFunSuite {
  test("never under-estimates; exact when width >> distinct keys") {
    val cms = new CountMinSketch(5, 4096)
    val rnd = new Random(7)
    val truth = new Array[Long](100)
    (0 until 100000).foreach { _ =>
      val key = rnd.nextInt(100)
      truth(key) += 1
      cms.addHash(WyHash.hashLong(key.toLong))
    }
    (0 until 100).foreach { key =>
      val est = cms.estimateHash(WyHash.hashLong(key.toLong))
      assert(est >= truth(key), s"under-estimate at $key")
      assert(est == truth(key), s"collision at width 4096 with 100 keys: $est vs ${truth(key)}")
    }
    assert(cms.totalCount == 100000L)
  }

  test("merge equals single-pass; error bounded on heavy stream") {
    val whole = new CountMinSketch(5, 1024)
    val parts = (0 until 4).map(_ => new CountMinSketch(5, 1024))
    val rnd = new Random(13)
    (0 until 40000).foreach { i =>
      val key = (math.abs(rnd.nextGaussian()) * 300).toInt // skewed keys
      whole.addHash(WyHash.hashLong(key.toLong))
      parts(i % 4).addHash(WyHash.hashLong(key.toLong))
    }
    val merged = CountMinSketch.deserialize(parts(0).serialize())
    parts.drop(1).foreach(p => merged.merge(CountMinSketch.deserialize(p.serialize())))
    assert(merged == whole)
    // CMS guarantee: overestimate <= eps * N with eps = e/width, prob 1-e^-depth
    val eps = math.E / 1024
    (0 until 1000).foreach { key =>
      val est = whole.estimateHash(WyHash.hashLong(key.toLong))
      assert(est <= 40000 * eps + 40000 / 50, s"unreasonable estimate $est for key $key")
    }
  }

  test("serde validation") {
    intercept[IllegalArgumentException](CountMinSketch.deserialize(Array[Byte](0)))
    val ok = new CountMinSketch(3, 64)
    ok.addHash(WyHash.hashLong(1L))
    val rt = CountMinSketch.deserialize(ok.serialize())
    assert(rt.estimateHash(WyHash.hashLong(1L)) == 1L)
    assert(rt.totalCount == 1L)
  }
}

class TDigestSpec extends AnyFunSuite {
  test("exact min/max; interior quantiles accurate on uniform data") {
    val td = TDigest(200)
    val rnd = new Random(99)
    val data = Array.fill(100000)(rnd.nextDouble() * 1000)
    data.foreach(td.add(_))
    assert(td.quantile(0.0) == data.min)
    assert(td.quantile(1.0) == data.max)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = td.quantile(q)
      val exactRank = sorted.count(_ <= est).toDouble / data.length
      assert(math.abs(exactRank - q) < 0.01, s"q=$q est=$est rank=$exactRank")
    }
    assert(td.centroidCount < 2.5 * 200, s"too many centroids: ${td.centroidCount}")
  }

  test("merge of partitions tracks single-pass quantiles") {
    val rnd = new Random(5)
    val data = Array.fill(50000)(math.exp(rnd.nextGaussian())) // skewed
    val whole = TDigest(100)
    data.foreach(whole.add(_))
    val parts = data.grouped(12500).map { chunk =>
      val t = TDigest(100)
      chunk.foreach(t.add(_))
      t.serialize()
    }.toSeq
    val merged = TDigest.deserialize(parts.reduce(TDigest.union))
    assert(merged.count == 50000L)
    assert(merged.min == data.min && merged.max == data.max)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = merged.quantile(q)
      val exactRank = sorted.count(_ <= est).toDouble / data.length
      assert(math.abs(exactRank - q) < 0.02, s"merged q=$q est=$est rank=$exactRank")
    }
  }

  test("serde round trip and validation") {
    val td = TDigest(50)
    (0 until 1000).foreach(i => td.add(i.toDouble))
    val rt = TDigest.deserialize(td.serialize())
    assert(rt == td)
    assert(rt.quantile(0.5) == td.quantile(0.5))
    intercept[IllegalArgumentException](TDigest.deserialize(Array[Byte](9, 9, 9)))
  }
}

class KllSketchSpec extends AnyFunSuite {
  test("exact mode below compaction threshold matches discrete quantiles") {
    val kll = KllSketch(256)
    val data = (1 to 100).map(_.toDouble)
    new Random(3).shuffle(data).foreach(kll.add)
    assert(kll.isExact)
    assert(kll.quantile(0.0) == 1.0)
    assert(kll.quantile(1.0) == 100.0)
    assert(kll.quantile(0.5) == 50.0) // ceil(0.5*100) = rank 50 -> value 50
    assert(kll.quantile(0.25) == 25.0)
  }

  test("rank error bounded after heavy compaction") {
    val kll = KllSketch(200)
    val rnd = new Random(11)
    val data = Array.fill(200000)(rnd.nextDouble())
    data.foreach(kll.add)
    assert(!kll.isExact)
    assert(kll.retainedItems < 3000, s"retained ${kll.retainedItems}")
    val sorted = data.sorted
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val est = kll.quantile(q)
      val exactRank = sorted.count(_ <= est).toDouble / data.length
      assert(math.abs(exactRank - q) < 0.03, s"q=$q est=$est rank=$exactRank")
    }
  }

  test("merge of partitions: count/min/max exact, ranks bounded") {
    val rnd = new Random(17)
    val data = Array.fill(80000)(rnd.nextGaussian())
    val parts = data.grouped(20000).map { chunk =>
      val s = KllSketch(200)
      chunk.foreach(s.add)
      s.serialize()
    }.toSeq
    val merged = KllSketch.deserialize(parts.reduce(KllSketch.union))
    assert(merged.count == 80000L)
    assert(merged.min == data.min && merged.max == data.max)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val exactRank = sorted.count(_ <= est).toDouble / data.length
      assert(math.abs(exactRank - q) < 0.04, s"q=$q est=$est rank=$exactRank")
    }
  }

  test("serde round trip and validation") {
    val s = KllSketch(64)
    (0 until 5000).foreach(i => s.add(i.toDouble))
    val rt = KllSketch.deserialize(s.serialize())
    assert(rt == s)
    assert(rt.quantile(0.5) == s.quantile(0.5))
    intercept[IllegalArgumentException](KllSketch.deserialize(Array[Byte](1)))
  }

  test("repeated merges stay size-bounded (upper-level cascade) and conserve weight") {
    val rnd = new Random(31)
    val merged = KllSketch(200)
    var total = 0L
    for (_ <- 0 until 200) {
      val part = KllSketch(200)
      val n = 300 + rnd.nextInt(700)
      (0 until n).foreach(_ => part.add(rnd.nextGaussian()))
      total += n
      merged.merge(KllSketch.deserialize(part.serialize()))
    }
    assert(merged.count == total)
    // size must stay O(k log n), never linear in the number of merged partials
    assert(merged.retainedItems < 4000,
      s"retained ${merged.retainedItems} after 200 merges — unbounded growth")
    // weight conservation: odd-length compaction keeps the leftover item, so
    // the weighted total equals the true count and median stays centered
    val med = merged.quantile(0.5)
    assert(math.abs(med) < 0.1, s"median drifted to $med")
  }
}
