package graft.sql

import graft.core.WyHash

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Zero-copy wyhash over UTF8String memory (on-heap or off-heap). Strings are
  * the dominant sketch input (urls, text) and `UTF8String.getBytes` copies on
  * every row; this reads the backing memory directly via Platform, cutting an
  * allocation + copy from the per-row aggregation hot path. Must produce
  * byte-identical results to WyHash.hash on the equivalent byte array
  * (asserted in UnsafeWyHashSpec). x86-64 is little-endian, matching the
  * byte-array reader.
  */
object UnsafeWyHash {
  import WyHash.{mum, P0, P1, P2, P3, P4, P5}

  @inline private def r8(base: AnyRef, off: Long): Long = Platform.getLong(base, off)

  @inline private def r4(base: AnyRef, off: Long): Long =
    Platform.getInt(base, off).toLong & 0xffffffffL

  @inline private def r3(base: AnyRef, off: Long, k: Int): Long =
    ((Platform.getByte(base, off) & 0xffL) << 16) |
      ((Platform.getByte(base, off + (k >> 1)) & 0xffL) << 8) |
      (Platform.getByte(base, off + k - 1) & 0xffL)

  def hashUTF8(u: UTF8String): Long = hash(u.getBaseObject, u.getBaseOffset, u.numBytes, 0L)

  /** Identical structure to WyHash.hash, reading from (base, offset) memory. */
  def hash(base: AnyRef, offset: Long, length: Int, seed: Long): Long = {
    var s = seed
    var o = offset
    var i = length
    while (i >= 32) {
      s = mum(
        s ^ P0,
        mum(r8(base, o) ^ P1, r8(base, o + 8) ^ P2) ^
          mum(r8(base, o + 16) ^ P3, r8(base, o + 24) ^ P4))
      o += 32
      i -= 32
    }
    s ^= P0
    if (i == 0) ()
    else if (i < 4) s = mum(s, r3(base, o, i) ^ P1)
    else if (i <= 8) s = mum(s, ((r4(base, o) << 32) | r4(base, o + i - 4)) ^ P1)
    else if (i <= 16) s = mum(mum(s, r8(base, o) ^ P1), r8(base, o + i - 8) ^ P2)
    else if (i <= 24)
      s = mum(mum(mum(s, r8(base, o) ^ P1), r8(base, o + 8) ^ P2), r8(base, o + i - 8) ^ P3)
    else
      s = mum(
        mum(mum(mum(s, r8(base, o) ^ P1), r8(base, o + 8) ^ P2), r8(base, o + 16) ^ P3),
        r8(base, o + i - 8) ^ P4)
    mum(s, length.toLong ^ P5)
  }
}
