package graft.sig

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-Permutation Hashing with rotation densification (Li, Owen &
  * Zhang 2012 "One Permutation Hashing"; Shrivastava & Li 2014
  * "Improved Densification of One Permutation Hashing") — the
  * signature-COMPUTE lever complementing b-bit's byte lever: where
  * classic MinHash evaluates k=64 permutations per shingle, OPH makes
  * ONE pass, splitting the hash range into k bins by modulus and taking
  * the minimum within each bin. Empty bins (sparse docs) borrow the
  * nearest non-empty bin clockwise, mixed with the rotation distance so
  * borrowed values collide across docs only when the donor bins AND
  * distances agree — the 2014 paper's t·C offset, realized here as
  * XOR with t·2654435769 (no BIGINT overflow in any engine, unlike the
  * additive form; same collision-avoidance role, deviation documented).
  * The bin-agreement fraction estimates Jaccard exactly like signature
  * agreement does for k independent permutations.
  *
  * Everything is integer arithmetic on the already-hashed shingle values
  * (xxh64, persisted in 03_sig), so the whole chain — binning, per-bin
  * min, densification walk, pairwise agreement — is recomputable by the
  * DuckDB oracle from stage parquet. At 100 TB the win is CPU at
  * signature time: O(|shingles|) hash work per doc instead of
  * O(k·|shingles|), with the same banding/estimate machinery downstream.
  * The reference computes the classic k-permutation form
  * (/root/reference/src/features/minhash.py) — this is the scale path,
  * not a port.
  */
object Oph {

  /** Odd 32-bit mixing constant (2^32/φ); t·MixC fits in 38 bits for
    * t < 64, so the XOR mix never overflows anywhere.
    */
  val MixC = 2654435769L

  /** Pure single-pass reference: bin by pmod(h, bins), min per bin,
    * rotation-densify. Docs with no shingles return all-sentinel
    * (Long.MaxValue) — callers exclude them exactly like
    * MinHashSig.emptySignature docs.
    */
  def signature(shingleHashes: Array[Long], bins: Int): Array[Long] = {
    val mins = new Array[Long](bins)
    val filled = new Array[Boolean](bins)
    var i = 0
    while (i < shingleHashes.length) {
      val h = shingleHashes(i)
      val b = (((h % bins) + bins) % bins).toInt
      if (!filled(b) || h < mins(b)) { mins(b) = h; filled(b) = true }
      i += 1
    }
    val out = new Array[Long](bins)
    var j = 0
    while (j < bins) {
      if (filled(j)) out(j) = mins(j)
      else {
        var t = 1
        var done = false
        while (t < bins && !done) {
          val src = (j + t) % bins
          if (filled(src)) { out(j) = mins(src) ^ (t.toLong * MixC); done = true }
          t += 1
        }
        if (!done) out(j) = Long.MaxValue
      }
      j += 1
    }
    out
  }

  /** (url, oph array<long>) from a (url, shingles) relation. Plan: one
    * explode + ONE map-side-combinable (url, bin) min + one per-url
    * collect into the bounded k-entry map — the densification walk is a
    * codegen'd higher-order expression over that map, no second shuffle.
    * Docs with empty shingle sets drop (no rows to bin).
    */
  def signatureTable(sigs: DataFrame, urlCol: String, shCol: String,
                     bins: Int): DataFrame = {
    val dense = expr(
      s"transform(sequence(0, ${bins - 1}), j -> coalesce(" +
        "element_at(bm, CAST(j AS INT)), " +
        s"aggregate(sequence(1, ${bins - 1}), CAST(NULL AS LONG), (acc, t) -> " +
        "IF(acc IS NOT NULL, acc, " +
        s"IF(element_at(bm, CAST(pmod(j + t, $bins) AS INT)) IS NOT NULL, " +
        s"element_at(bm, CAST(pmod(j + t, $bins) AS INT)) ^ (t * ${MixC}L), " +
        "CAST(NULL AS LONG))))))")
    sigs.select(col(urlCol).as("url"), explode(col(shCol)).as("h"))
      .groupBy(col("url"), pmod(col("h"), lit(bins.toLong)).cast("int").as("bin"))
      .agg(min(col("h")).as("mn"))
      .groupBy("url")
      .agg(map_from_entries(collect_list(struct(col("bin"), col("mn")))).as("bm"))
      .select(col("url"), dense.as("oph"))
  }

  /** Per-pair OPH agreement: (a, b, match_cnt, est_ppm) with
    * est_ppm = (10^6 · match) div bins — the OPH Jaccard estimate.
    */
  def estimatePairs(pairs: DataFrame, ophTable: DataFrame, bins: Int): DataFrame =
    pairs
      .join(ophTable.select(col("url").as("oa"), col("oph").as("a_sig")), col("a") === col("oa"))
      .join(ophTable.select(col("url").as("ob"), col("oph").as("b_sig")), col("b") === col("ob"))
      .withColumn("match_cnt",
        expr("CAST(size(filter(zip_with(a_sig, b_sig, (x, y) -> x = y), v -> v)) AS LONG)"))
      .withColumn("est_ppm", expr(s"(1000000L * match_cnt) div ${bins}L"))
      .select("a", "b", "match_cnt", "est_ppm")
}
