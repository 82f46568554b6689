package graft.sig

import graft.hash.Blake2b
import java.nio.charset.StandardCharsets

/** 128-bit SimHash fingerprint, matching the reference's deterministic
  * fallback implementation (/root/reference/src/Learners/simhash_model.py:95-121):
  * per-token BLAKE2b-128 bit votes, token weights capped at `maxWeight`,
  * final bit i = 1 iff the weighted vote sum is >= 0.
  *
  * The fingerprint is packed as (hi, lo): bit i of the Python bigint maps to
  * lo bit i for i < 64 and hi bit (i-64) for i >= 64.
  */
object SimHash extends Serializable {

  final case class Sig128(hi: Long, lo: Long)

  def fromTokens(tokens: Array[String], maxWeight: Int = 255, bits: Int = 128): Sig128 = {
    if (tokens.isEmpty) return Sig128(0L, 0L)
    require(bits <= 128, s"SimHash bits > 128 not supported (got $bits); the " +
      "reference's 128-bit blake2b hash zero-fills higher bits anyway")
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < tokens.length) {
      val prev = counts.get(tokens(i))
      counts.put(tokens(i), if (prev == null) 1 else prev + 1)
      i += 1
    }
    val v = new Array[Long](bits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (hi, lo) = Blake2b.hash128(e.getKey.getBytes(StandardCharsets.UTF_8))
      val w = math.min(e.getValue.intValue(), maxWeight).toLong
      var b = 0
      while (b < bits) {
        val bit = if (b < 64) (lo >>> b) & 1L else if (b < 128) (hi >>> (b - 64)) & 1L else 0L
        v(b) += (if (bit == 1L) w else -w)
        b += 1
      }
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < bits) {
      if (v(b) >= 0L) {
        if (b < 64) lo |= 1L << b else hi |= 1L << (b - 64)
      }
      b += 1
    }
    Sig128(hi, lo)
  }

  /** Hamming distance over the low `bits` bits — simhash_model.py:50-53. */
  def hamming(aHi: Long, aLo: Long, bHi: Long, bLo: Long, bits: Int = 128): Int = {
    val loMask = if (bits >= 64) -1L else (1L << bits) - 1
    val hiMask = if (bits <= 64) 0L else if (bits >= 128) -1L else (1L << (bits - 64)) - 1
    java.lang.Long.bitCount((aLo ^ bLo) & loMask) + java.lang.Long.bitCount((aHi ^ bHi) & hiMask)
  }

  /** sim = max(0, 1 - hd/bits) — simhash_model.py:252. */
  def similarity(aHi: Long, aLo: Long, bHi: Long, bLo: Long, bits: Int = 128): Double =
    math.max(0.0, 1.0 - hamming(aHi, aLo, bHi, bLo, bits).toDouble / bits.toDouble)
}
