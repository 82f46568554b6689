package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for the written corpus — the storage
  * layout that makes MULTI-dimensional predicates prunable at scan time
  * (what Delta/Iceberg's OPTIMIZE ZORDER produces). Sorting by one key
  * gives perfect parquet min/max locality on that key and none on any
  * other; interleaving the bits of two keys gives BOTH predicates
  * row-group locality, so footer stats skip most of the corpus for either
  * filter. At 100 TB the scan-time difference is the whole game: a
  * fetch-time range query over a host-sorted corpus otherwise decodes
  * every row group.
  *
  * Two dimension reducers, with different honesty guarantees:
  *  - integral keys taken mod 2^16 are ORDER-PRESERVING (for values below
  *    2^16, e.g. bucketed timestamps/lengths) — these serve parquet
  *    min/max pruning, and ZOrderSpec MEASURES the skip (rows decoded off
  *    the z layout vs a single-key-sorted layout, via scan input metrics);
  *  - string keys are reduced with the md5-prefix hash (hash16), which
  *    CLUSTERS equal values into the same files (locality for compaction
  *    and co-access) but is deliberately not claimed to serve min/max
  *    pruning: hash order is unrelated to string order, so footer stats
  *    on the raw string stay coarse. Pruning on a string dim needs an
  *    order-preserving encoding (e.g. a range-partition id), noted here
  *    so the limitation is explicit.
  *
  * Determinism: shift/and/or over md5-prefix and mod-2^16 integers — the
  * z-value column is bit-identical in DuckDB (q_zorder is hash-oracled).
  */
object ZOrder {

  /** Low 16 bits of the md5-prefix 60-bit uniform of a string key. */
  def hash16(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(65536L))

  /** Morton interleave of the low 16 bits of two non-negative longs:
    * bit i of `a` lands at bit 2i, bit i of `b` at bit 2i+1 (`b` owns the
    * top bit — put the dimension you filter hardest second).
    */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-value of (string key, integral key): string hashed (locality),
    * int order-preserving mod 2^16 (prunable).
    */
  def zValue(strKey: Column, intKey: Column): Column =
    interleave16(hash16(strKey), pmod(intKey.cast("long"), lit(65536L)))

  /** Z-value of two integral keys, both order-preserving mod 2^16. */
  def zValue2(a: Column, b: Column): Column =
    interleave16(pmod(a.cast("long"), lit(65536L)),
      pmod(b.cast("long"), lit(65536L)))

  /** Write `df` clustered by the given z-value column into ~nFiles files:
    * range-repartition on z + sort within partitions, so each file covers
    * a compact z-range and its parquet footer min/max on the underlying
    * key columns is tight. One range shuffle at write time buys every
    * later filtered scan its row-group pruning.
    */
  def writeClustered(df: DataFrame, z: Column, nFiles: Int, path: String): Unit = {
    val zc = "__graft_zval" // collision-safe: never clobbers a data column
    df.withColumn(zc, z)
      .repartitionByRange(nFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
