package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixtures.
  *
  * Web-scale pipelines (reference: the corpus assembly around
  * /root/reference/src/pipelines/ingestion.py — its per-source folder
  * selection is the degenerate all-or-nothing form of this) need
  * REPRODUCIBLE subsampling: the same doc must land in the same sample on
  * every run, on any cluster size, with no RNG state to ship. We derive a
  * uniform u in [0,1) from a cryptographic hash of the stable document
  * key: u = int(md5(key)[0:15 hex]) / 2^60. md5 is available and
  * bit-identical in both Spark and DuckDB, so every sampling decision is
  * recomputable by the SQL oracle — sampling becomes a pure, shuffle-free
  * per-row filter (map-only plan; the only exchange in temperature mixing
  * is the broadcast of per-stratum rates, |strata| rows).
  *
  * Two operators:
  *  - [[stratifiedSample]]: fixed per-stratum keep rates (e.g. downsample
  *    the head language, keep the tail).
  *  - [[temperatureRates]] / [[temperatureSample]]: alpha=0.5 temperature
  *    mixture (p_d proportional to sqrt(n_d)) — the standard rebalancing
  *    used when assembling multilingual / multi-source training corpora.
  *    sqrt is IEEE-correctly-rounded in both engines (the reason alpha is
  *    fixed at 0.5 rather than a free pow(n, alpha): libm pow is not).
  *    The one cross-engine wobble is the SUM of per-stratum sqrt terms,
  *    whose addition order is engine-internal: rates agree to ~1 ulp.
  *    A membership flip therefore needs u within ~2^-52 of the rate —
  *    probability ~1e-16 per doc, ~1e-8 even at 10^8 docs; emitted rates
  *    are rounded to 7 dp so the VALUES compare engine-independently.
  *
  * At 100 TB: stratified sampling is embarrassingly parallel (no shuffle,
  * no state); temperature mixing adds one tiny aggregate (rows = number of
  * strata, i.e. sources/domains/languages) broadcast back — never a
  * bottleneck.
  */
object Sampling {

  /** 2^60 as a double — exact. */
  private val Two60 = 1152921504606846976.0d

  /** Deterministic uniform in [0,1): first 15 hex chars of md5(key) as a
    * 60-bit integer over 2^60. 15 hex digits keep conv() inside a signed
    * long (60 bits); the division by a power of two is exact scaling, so
    * u carries the full 60 hash bits.
    */
  def hashU(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long") / lit(Two60)

  /** Keep rows where hashU(key) < rate(stratum). `rates` maps stratum
    * value -> keep rate in [0,1]; strata absent from the map use
    * `defaultRate`. Pure per-row filter — no shuffle, no RNG.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: Column,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(hashU(keyCol) < rateCol)
  }

  /** Per-stratum keep rates for an alpha=0.5 temperature mixture with an
    * expected output of `targetFraction` * corpus size:
    *   p_d = sqrt(n_d) / sum_d sqrt(n_d)
    *   rate_d = min(1, targetFraction * N * p_d / n_d)
    * Small strata are upweighted (rate can hit 1.0 = keep all), large
    * strata downweighted — the head/tail rebalancing knob. Returns
    * (stratum, n_docs, rate); one aggregate over |strata| groups.
    *
    * The arithmetic is written in a fixed operation order (each step one
    * IEEE-correctly-rounded op) so DuckDB reproduces rate_d bit-exactly.
    */
  def temperatureRates(df: DataFrame, strataCol: String, targetFraction: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(col("n_docs")).as("n_total"),
      sum(sqrt(col("n_docs").cast("double"))).as("sum_sqrt"))
    counts.crossJoin(broadcast(tot))
      .select(col(strataCol), col("n_docs"),
        least(lit(1.0d),
          lit(targetFraction) * col("n_total").cast("double") *
            (sqrt(col("n_docs").cast("double")) / col("sum_sqrt")) /
            col("n_docs").cast("double")).as("rate"))
  }

  /** Apply [[temperatureRates]] to the corpus: broadcast-join the rate
    * per stratum, keep rows with hashU(key) < rate.
    */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: Column,
                        targetFraction: Double): DataFrame = {
    val rates = temperatureRates(df, strataCol, targetFraction)
    df.join(broadcast(rates.select(col(strataCol), col("rate"))), Seq(strataCol))
      .filter(hashU(keyCol) < col("rate"))
  }

  /** EXACTLY k rows per stratum: the k smallest hashU values (ties broken
    * by the tiebreak column) — consistent bottom-k sampling. Unlike rate
    * sampling the output size is a hard budget, and the choice is stable
    * under corpus growth: a doc leaves the sample only when a new doc
    * with a smaller hash enters its stratum. One shuffle on the stratum
    * key; the per-stratum ORDER BY is a window over that partition, never
    * a global sort.
    */
  def bottomKPerStratum(df: DataFrame, strataCol: String, keyCol: Column,
                        tiebreak: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(hashU(keyCol).asc, tiebreak.asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }
}
