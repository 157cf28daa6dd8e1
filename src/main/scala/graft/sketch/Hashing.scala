package graft.sketch

/**
 * xxHash64 — self-contained implementation of the public xxHash64 algorithm
 * (Yann Collet, BSD-2; spec at github.com/Cyan4973/xxHash). Used as the hash
 * family for every sketch in this library.
 *
 * Why not the reference's hashing: the reference's C# sketches hash with a
 * per-object *random* identity hash XOR a per-row seed
 * (/root/reference/Simulation/CountMin.cs:31,36 with Flow.cs:33-35), which is
 * only "ideal" because the identity hash is random, and its C CountMax reuses
 * one hash for all rows (/root/reference/KernelCountMax/countmax.h:51 — the
 * per-line mask at :37-39 is dead). Neither is reproducible or
 * pairwise-independent. We instead derive two independent 64-bit hashes per
 * key and use Kirsch–Mitzenmeyer double hashing h_i = h1 + i·h2 for the d
 * sketch rows — the standard practical stand-in for pairwise-independent row
 * hashes.
 */
object XxHash64 {
  final val Prime1 = 0x9E3779B185EBCA87L
  final val Prime2 = 0xC2B2AE3D27D4EB4FL
  final val Prime3 = 0x165667B19E3779F9L
  final val Prime4 = 0x85EBCA77C2B2AE63L
  final val Prime5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= Prime2
    h ^= h >>> 29; h *= Prime3
    h ^= h >>> 32
    h
  }

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * Prime2, 31) * Prime1

  @inline private def mergeRound(h0: Long, acc: Long): Long =
    (h0 ^ round(0L, acc)) * Prime1 + Prime4

  /** Hash a single 64-bit value (xxh64 of its 8 little-endian bytes). */
  def hashLong(value: Long, seed: Long): Long = {
    var h = seed + Prime5 + 8L
    h ^= round(0L, value)
    h = rotl(h, 27) * Prime1 + Prime4
    avalanche(h)
  }

  /** Hash a single 32-bit value (xxh64 of its 4 little-endian bytes). */
  def hashInt(value: Int, seed: Long): Long = {
    var h = seed + Prime5 + 4L
    h ^= (value & 0xFFFFFFFFL) * Prime1
    h = rotl(h, 23) * Prime2 + Prime3
    avalanche(h)
  }

  @inline private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  @inline private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) |
      ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  /** xxh64 over `length` bytes of `data` starting at `offset`. */
  def hashBytes(data: Array[Byte], offset: Int, length: Int, seed: Long): Long = {
    var i = offset
    val end = offset + length
    var h = 0L
    if (length >= 32) {
      var v1 = seed + Prime1 + Prime2
      var v2 = seed + Prime2
      var v3 = seed
      var v4 = seed - Prime1
      val limit = end - 32
      while (i <= limit) {
        v1 = round(v1, readLongLE(data, i))
        v2 = round(v2, readLongLE(data, i + 8))
        v3 = round(v3, readLongLE(data, i + 16))
        v4 = round(v4, readLongLE(data, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + Prime5
    }
    h += length.toLong
    while (i + 8 <= end) {
      h ^= round(0L, readLongLE(data, i))
      h = rotl(h, 27) * Prime1 + Prime4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= (readIntLE(data, i) & 0xFFFFFFFFL) * Prime1
      h = rotl(h, 23) * Prime2 + Prime3
      i += 4
    }
    while (i < end) {
      h ^= (data(i) & 0xFFL) * Prime5
      h = rotl(h, 11) * Prime1
      i += 1
    }
    avalanche(h)
  }

  def hashBytes(data: Array[Byte], seed: Long): Long =
    hashBytes(data, 0, data.length, seed)

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}

/**
 * A key hashed to two independent 64-bit values; row hash i is
 * `h1 + i*h2` (Kirsch–Mitzenmeyer). All sketches key off this so a key is
 * hashed at most twice regardless of sketch depth.
 */
final case class Hash128(h1: Long, h2: Long) {
  @inline def row(i: Int): Long = h1 + i.toLong * h2
  /** Non-negative bucket index for row i over a power-of-two width mask. */
  @inline def bucket(i: Int, mask: Int): Int = (row(i) & mask.toLong).toInt
  /** Non-negative bucket index for row i over an arbitrary modulus. */
  @inline def bucketMod(i: Int, m: Int): Int = (((row(i) % m) + m) % m).toInt
}

object Hash128 {
  final val Seed1 = 0x51a7bba5e17e0a39L // fixed library salts
  final val Seed2 = 0x9c2e8f04d7a3c1b7L

  def ofString(s: String, seed: Long): Hash128 = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ofBytes(b, seed)
  }

  def ofBytes(b: Array[Byte], seed: Long): Hash128 =
    Hash128(XxHash64.hashBytes(b, seed ^ Seed1), XxHash64.hashBytes(b, seed ^ Seed2))

  def ofLong(v: Long, seed: Long): Hash128 =
    Hash128(XxHash64.hashLong(v, seed ^ Seed1), XxHash64.hashLong(v, seed ^ Seed2))
}
