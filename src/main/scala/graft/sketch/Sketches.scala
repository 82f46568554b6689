package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable streaming sketches for corpus-scale frequency and cardinality
  * estimation — the summaries a 100 TB curation pipeline keeps ABOUT the
  * corpus without materializing per-key state: a count-min sketch
  * (Cormode & Muthukrishnan 2005, "An improved data stream summary: the
  * count-min sketch and its applications") for token/heavy-hitter
  * frequencies, and HyperLogLog-style registers (Flajolet et al. 2007)
  * for distinct counts. The reference has no sketch surface (its corpora
  * are small enough for exact counts — e.g. the exact top-50 token table,
  * /root/reference/src/features/text_preproc.py:217-244); these are the
  * scale path for the same questions.
  *
  * Determinism contract (what makes BOTH operators fully DuckDB-oracle-able
  * where typical sketch implementations are not): every hash is the repo's
  * md5-prefix 60-bit uniform (Sampling.hashU's integer form — first 15 hex
  * chars of md5 as a BIGINT), every derived quantity is INTEGER arithmetic
  * (bucket = h % w; register index = low bits; rho from the base-2 digit
  * count of the remaining bits), and every aggregate is a plain
  * sum/count/max groupBy. No RNG, no floats, no platform-dependent hash:
  * the sketch CONTENTS are a pure function of the input multiset, identical
  * on any cluster size, and a SQL engine can recompute them bit-for-bit.
  * The float-valued ESTIMATOR (HLL's harmonic mean) stays out of the data
  * path — it is a driver-side readout, exercised in SketchSpec.
  *
  * Merge laws (asserted in SketchSpec): CMS counters ADD across shards
  * (sketch(A ⊎ B) = cell-wise sum), HLL registers MAX across shards —
  * both are one groupBy over (constant-size) sketch rows, so per-shard
  * sketches from 1000 executors combine in a single reduce of d·w (resp.
  * m) rows. At 100 TB this is the whole point: frequency/cardinality state
  * is O(d·w + m), not O(distinct keys), and partial aggregation does the
  * map-side combine for free.
  */
object Sketches {

  /** 60-bit integer hash of (seed, item): first 15 hex chars of
    * md5("<seed>:" || item) as a long. Mirrors the DuckDB expression
    * CAST('0x' || substr(md5('<seed>:' || x), 1, 15) AS BIGINT).
    */
  def hash60(seed: Int, item: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), item)), 1, 15), 16, 10).cast("long")

  /** Count-min sketch over an item column (one row per OCCURRENCE — pass a
    * pre-distinct frame to sketch a set): d independent hash rows of w
    * buckets, emitted as (r, bucket, cnt) with only non-empty cells
    * present. One corpus scan (the d probes explode per row), one
    * map-side-combinable groupBy over at most d·w keys.
    */
  def countMinSketch(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    val probes = array((0 until d).map { r =>
      struct(lit(r).as("r"), pmod(hash60(r, col(itemCol)), lit(w.toLong)).as("bucket"))
    }: _*)
    items
      .select(explode(probes).as("p"))
      .groupBy(col("p.r").as("r"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a count-min sketch: for each row of `queries`,
    * est = min over the d rows of the addressed cell (0 if the cell is
    * empty — only possible for items the sketch never saw). The sketch is
    * at most d·w rows, so it BROADCASTS; the query side never shuffles to
    * probe. CMS guarantee: est >= true count, always.
    */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                       d: Int, w: Int): DataFrame = {
    val probes = array((0 until d).map { r =>
      struct(lit(r).as("r"), pmod(hash60(r, col(itemCol)), lit(w.toLong)).as("bucket"))
    }: _*)
    queries
      .select(col(itemCol), explode(probes).as("p"))
      .select(col(itemCol), col("p.r").as("r"), col("p.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** The shared HLL register derivation: idx = low p bits of the 60-bit
    * hash, rho = position of the first 1-bit in the remaining (60-p)-bit
    * field (all-zeros -> 61-p, the standard saturation). rho is computed
    * as (61-p) - bitlen(rest) where bitlen is the base-2 digit count —
    * Spark `conv(x,10,2)` and DuckDB `bin(x)` both render unpadded
    * binary, so the oracle recomputes it character-for-character.
    */
  private def hllIdxRho(itemCol: String, p: Int): (Column, Column) = {
    require(p >= 2 && p <= 16, s"p=$p out of range")
    val u = hash60(0, col(itemCol))
    val rest = shiftright(u, p)
    val width = 61 - p // bits in `rest` + 1: rho range is 1..(61-p)
    val rho = when(rest === 0L, lit(width))
      .otherwise(lit(width) - length(conv(rest.cast("string"), 10, 2)))
    (pmod(u, lit(1L << p)), rho.cast("int"))
  }

  /** HyperLogLog registers over an item column, p = log2(m) index bits.
    * Emits only non-empty registers (idx, max_rho); absent registers read
    * as zero in the estimator.
    */
  def hllRegisters(items: DataFrame, itemCol: String, p: Int): DataFrame = {
    val (idx, rho) = hllIdxRho(itemCol, p)
    items
      .select(idx.as("idx"), rho.as("rho"))
      .groupBy("idx")
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Grouped HLL registers: one register set per value of `groupCol` —
    * the GROUP BY form of cardinality sketching (distinct tokens per
    * language, distinct urls per host, ...). State is O(groups · m) and
    * still merges by MAX per (group, idx), so per-shard grouped sketches
    * combine in one tiny reduce exactly like the ungrouped form.
    */
  def hllRegistersBy(items: DataFrame, groupCol: String, itemCol: String,
                     p: Int): DataFrame = {
    val (idx, rho) = hllIdxRho(itemCol, p)
    items
      .select(col(groupCol), idx.as("idx"), rho.as("rho"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Driver-side HLL readout (the only float math, deliberately outside
    * the oracle surface): standard bias-corrected harmonic mean with the
    * small-range linear-counting correction. `registers` maps idx ->
    * max_rho for the non-empty registers.
    */
  def hllEstimate(registers: Map[Long, Int], p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val zeros = m - registers.size
    val sum = zeros * 1.0 + registers.valuesIterator.map(r => math.pow(2.0, -r)).sum
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
