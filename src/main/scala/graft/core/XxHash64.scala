package graft.core

/** Pure-Scala xxHash64 (public algorithm, xxhash.com spec).
  *
  * Kept Spark-free so the deterministic kernel (SynthWeb / RefSim /
  * property tests) can run without a SparkSession. Verified against
  * Spark's built-in `xxhash64()` in XxHash64Spec so lake bucket keys
  * computed here agree with `functions.xxhash64` in plans.
  */
object XxHash64 {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  def hash(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = rotl(v1 + readLong(bytes, i) * P2, 31) * P1
        v2 = rotl(v2 + readLong(bytes, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + readLong(bytes, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + readLong(bytes, i + 24) * P2, 31) * P1
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = (h ^ (rotl(v1 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v2 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v3 * P2, 31) * P1)) * P1 + P4
      h = (h ^ (rotl(v4 * P2, 31) * P1)) * P1 + P4
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ (rotl(readLong(bytes, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readInt(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** Hash of a UTF-8 string; seed 42 matches Spark's xxhash64() default. */
  def hash(s: String, seed: Long = 42L): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Mix two longs into one deterministic long (for derived streams). */
  def mix(a: Long, b: Long): Long = {
    val buf = new Array[Byte](16)
    var i = 0
    while (i < 8) { buf(i) = ((a >>> (8 * i)) & 0xff).toByte; i += 1 }
    while (i < 16) { buf(i) = ((b >>> (8 * (i - 8))) & 0xff).toByte; i += 1 }
    hash(buf, 0L)
  }
}
