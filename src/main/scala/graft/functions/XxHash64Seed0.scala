package graft.functions

/** XXH64 (seed configurable, notably seed 0) over UTF-8 bytes.
  *
  * The reference engine keys its online feature store on xxhash64(seed=0) of
  * the lowered search query (reference: pipeline/src/main/java/ai/promoted/
  * metrics/logprocessor/common/util/StringUtil.java:6-51, compatible with
  * cespare/xxhash Sum64String). Spark's built-in `xxhash64` is hardwired to
  * seed 42 and hashes Catalyst rows (length-prefixed), so it can never be
  * byte-compatible; this is a from-scratch implementation of the public
  * XXH64 algorithm (https://github.com/Cyan4973/xxHash — public BSD spec).
  */
object XxHash64 {
  private final val Prime1 = -7046029288634856825L // 11400714785074694791
  private final val Prime2 = -4417276706812531889L // 14029467366897019727
  private final val Prime3 = 1609587929392839161L
  private final val Prime4 = -8796714831421723037L // 9650029242287828579
  private final val Prime5 = 2870177450012600261L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * Prime2, 31) * Prime1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * Prime1 + Prime4

  def hashBytes(b: Array[Byte], seed: Long): Long = {
    val len = b.length
    var i = 0
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + Prime1 + Prime2
      var v2 = seed + Prime2
      var v3 = seed
      var v4 = seed - Prime1
      val limit = len - 32
      while (i <= limit) {
        v1 = round(v1, readLongLE(b, i)); i += 8
        v2 = round(v2, readLongLE(b, i)); i += 8
        v3 = round(v3, readLongLE(b, i)); i += 8
        v4 = round(v4, readLongLE(b, i)); i += 8
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + Prime5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLongLE(b, i))
      h = rotl(h, 27) * Prime1 + Prime4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= readIntLE(b, i) * Prime1
      h = rotl(h, 23) * Prime2 + Prime3
      i += 4
    }
    while (i < len) {
      h ^= (b(i) & 0xffL) * Prime5
      h = rotl(h, 11) * Prime1
      i += 1
    }
    h ^= h >>> 33
    h *= Prime2
    h ^= h >>> 29
    h *= Prime3
    h ^= h >>> 32
    h
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}
