package graft.sig

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** b-bit MinHash (Li & König 2010, "b-Bit Minwise Hashing"): keep only
  * the lowest b bits of each MinHash position and estimate Jaccard from
  * the fraction of agreeing b-bit slots, corrected for random collisions
  * — the standard storage/bandwidth lever for MinHash at scale. With
  * b=4 and 64 permutations the signature shrinks from 64 longs (512 B)
  * to five packed longs (40 B) — a 12.8× cut in exactly the bytes the
  * estimate-prefilter regime shuffles (BENCH/BASELINE.md records that
  * regime's payoff boundary: the full-width estimate path GREW shuffle
  * to 512 B/pair; this is the published fix, kept integer-exact).
  *
  * Everything is BIGINT bit arithmetic a SQL oracle recomputes
  * bit-for-bit: low bits = pmod(v, 2^b), packing = shift-or into
  * 60-bit-safe words (14 four-bit slots per long, max shift 52), and
  * the collision-corrected estimator in parts-per-million
  *
  *   est_ppm = max(0, 10^6 · (match·2^b − n) div (n · (2^b − 1)))
  *
  * which is the paper's Ĵ = (m − C)/(1 − C) with the uniform-collision
  * baseline C = 2^-b, scaled to integers (floor division; the reference
  * estimator's float form agrees to 1 ulp·10^6). The reference system
  * carries full-width signatures only (/root/reference/src/features/
  * minhash.py) — this is the scale path, not a port.
  */
object BBitMinHash {

  /** 4-bit slots: 14 per 64-bit word keeps every shifted term and the
    * word sum under 2^56 — no sign-bit hazards in any engine.
    */
  val Bits = 4
  val SlotsPerWord = 14
  private val Mask = (1L << Bits) - 1

  def nWords(numPerm: Int): Int = (numPerm + SlotsPerWord - 1) / SlotsPerWord

  /** Packed b-bit signature as array<long> of [[nWords]] words; slot i of
    * word w holds pmod(minhash[w·14 + i], 16) at bit offset 4·i. Pure
    * per-row projection (map-only at any scale).
    */
  def packExpr(mhCol: String, numPerm: Int): Column = {
    val words = (0 until nWords(numPerm)).map { w =>
      val lo = w * SlotsPerWord
      val slots = math.min(SlotsPerWord, numPerm - lo)
      (0 until slots).map { i =>
        s"shiftleft(pmod(element_at($mhCol, ${lo + i + 1}), ${Mask + 1}L), ${Bits * i})"
      }.mkString(" + ")
    }
    expr(s"array(${words.mkString(", ")})")
  }

  /** (url, bbit) packed-signature table from a full-width signature
    * relation — what a 100 TB deployment PERSISTS and shuffles for the
    * estimate tier, at 1/12.8 the bytes.
    */
  def packed(sigs: DataFrame, urlCol: String, mhCol: String, numPerm: Int): DataFrame =
    sigs.select(col(urlCol).as("url"), packExpr(mhCol, numPerm).as("bbit"))

  /** Number of agreeing b-bit slots between two packed signatures.
    * SWAR nibble compare, 6 integer ops per word instead of 14 unpacked
    * comparisons: x = a xor b is zero exactly in agreeing slots; OR-fold
    * each nibble of x onto its lowest bit, mask to one indicator bit per
    * slot, and bit_count gives the DISAGREEING slot count.
    */
  def matchCountExpr(aCol: String, bCol: String, numPerm: Int): Column = {
    val terms = (0 until nWords(numPerm)).map { w =>
      val lo = w * SlotsPerWord
      val slots = math.min(SlotsPerWord, numPerm - lo)
      val mask = (0 until slots).map(i => 1L << (Bits * i)).reduce(_ | _)
      val x = s"(element_at($aCol, ${w + 1}) ^ element_at($bCol, ${w + 1}))"
      s"(${slots}L - bit_count(($x | shiftright($x, 1) | shiftright($x, 2) | shiftright($x, 3)) & ${mask}L))"
    }
    expr(terms.mkString(" + "))
  }

  /** Collision-corrected Jaccard estimate in ppm from a match count. */
  def estimatePpmExpr(matchCol: String, numPerm: Int): Column = {
    val twoB = Mask + 1
    expr(s"greatest(0L, (1000000L * ($matchCol * ${twoB}L - ${numPerm}L)) div (${numPerm}L * ${Mask}L))")
  }

  /** Per-pair b-bit estimates: join candidate pairs (a, b) to the packed
    * table twice, emit (a, b, match_cnt, est_ppm). The joins ship 40 B of
    * signature per side instead of 512 B — the whole point.
    */
  def estimatePairs(pairs: DataFrame, packed: DataFrame, numPerm: Int): DataFrame =
    pairs
      .join(packed.select(col("url").as("pa"), col("bbit").as("a_bb")), col("a") === col("pa"))
      .join(packed.select(col("url").as("pb"), col("bbit").as("b_bb")), col("b") === col("pb"))
      .withColumn("match_cnt", matchCountExpr("a_bb", "b_bb", numPerm))
      .withColumn("est_ppm", estimatePpmExpr("match_cnt", numPerm))
      .select("a", "b", "match_cnt", "est_ppm")
}
