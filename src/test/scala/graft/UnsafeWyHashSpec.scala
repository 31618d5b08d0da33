package graft

import scala.util.Random

import graft.core.WyHash
import graft.sql.UnsafeWyHash

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class UnsafeWyHashSpec extends AnyFunSuite {
  test("zero-copy UTF8String hash equals byte-array hash for all tail lengths") {
    val rnd = new Random(424242)
    for (len <- 0 to 120; _ <- 0 until 3) {
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val expected = WyHash.hash(bytes, 0, len, 0L)
      val got = UnsafeWyHash.hashUTF8(UTF8String.fromBytes(bytes))
      assert(got == expected, s"mismatch at len=$len")
    }
  }

  test("offset within a larger backing array is honored") {
    val bytes = "padding-padding-hello world tail".getBytes("UTF-8")
    val sub = UTF8String.fromBytes(bytes, 16, 11) // "hello world"
    assert(UnsafeWyHash.hashUTF8(sub) == WyHash.hash("hello world".getBytes("UTF-8")))
  }
}
