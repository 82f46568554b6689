package graft

import graft.sample.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic hash sampling (sample/Sampling): uniformity of the
  * md5-derived draw, per-stratum rate targeting, temperature-mixture
  * rate algebra, determinism across runs, and the map-only plan.
  */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpus(nA: Int, nB: Int) = {
    import spark.implicits._
    ((1 to nA).map(i => (i.toLong, "a")) ++
      (1 to nB).map(i => (10000L + i, "b"))).toDF("doc_id", "s")
  }

  test("hashU is in [0,1) and approximately uniform") {
    import spark.implicits._
    val u = (1 to 4000).map(_.toLong).toDF("doc_id")
      .select(Sampling.hashU(col("doc_id").cast("string")).as("u"))
    val (mn, mx, mean) = u.agg(min("u"), max("u"), avg("u"))
      .as[(Double, Double, Double)].collect().head
    assert(mn >= 0.0 && mx < 1.0)
    assert(math.abs(mean - 0.5) < 0.02, s"mean $mean far from 0.5")
  }

  test("stratified sample hits per-stratum rates within binomial noise") {
    val df = corpus(3000, 1000)
    val got = Sampling.stratifiedSample(df, "s", col("doc_id").cast("string"),
      Map("a" -> 0.2), defaultRate = 0.8)
    val byS = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sd(a) = sqrt(3000*.2*.8) ~ 22; sd(b) = sqrt(1000*.8*.2) ~ 13; 4 sd
    assert(math.abs(byS("a") - 600L) < 90, s"stratum a: ${byS("a")}")
    assert(math.abs(byS("b") - 800L) < 55, s"stratum b: ${byS("b")}")
  }

  test("stratified sample is deterministic and subset-stable") {
    val df = corpus(500, 200)
    val r1 = Sampling.stratifiedSample(df, "s", col("doc_id").cast("string"),
      Map("a" -> 0.4), 0.4).select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Sampling.stratifiedSample(df, "s", col("doc_id").cast("string"),
      Map("a" -> 0.4), 0.4).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2)
    // lowering the rate can only REMOVE docs (nested samples — the
    // property that makes hash sampling resumable at 100 TB)
    val r3 = Sampling.stratifiedSample(df, "s", col("doc_id").cast("string"),
      Map("a" -> 0.2), 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r3.subsetOf(r1))
  }

  test("temperature rates: sqrt weighting, saturation, expected-size algebra") {
    import spark.implicits._
    val df = corpus(6400, 100)
    val rates = Sampling.temperatureRates(df, "s", targetFraction = 0.5)
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // p_a = 80/90, p_b = 10/90; rate_a = .5*6500*(80/90)/6400 ~ 0.4514
    // rate_b = .5*6500*(10/90)/100 = 3.61 -> saturates at 1.0
    assert(rates("b")._2 == 1.0, s"small stratum must saturate: ${rates("b")}")
    assert(math.abs(rates("a")._2 - 0.5 * 6500.0 * (80.0 / 90.0) / 6400.0) < 1e-12)
    // small stratum upweighted relative to naive 0.5, large downweighted
    assert(rates("a")._2 < 0.5 && rates("b")._2 > 0.5)
  }

  test("temperature sample keeps saturated strata whole") {
    val df = corpus(6400, 100)
    val got = Sampling.temperatureSample(df, "s", col("doc_id").cast("string"), 0.5)
    val byS = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("b") == 100L, s"rate-1.0 stratum must keep all rows: $byS")
    assert(math.abs(byS("a") - 2889L) < 160, s"stratum a: ${byS("a")}") // 4 sd
  }

  test("bottom-k: exactly k per stratum; growth evicts at most one per new doc") {
    import spark.implicits._
    val df = corpus(300, 80)
    val s1 = Sampling.bottomKPerStratum(df, "s", col("doc_id").cast("string"),
      col("doc_id"), k = 25).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 50)
    val byS = Sampling.bottomKPerStratum(df, "s", col("doc_id").cast("string"),
      col("doc_id"), k = 25).groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS == Map("a" -> 25L, "b" -> 25L))
    // consistency: adding one doc to stratum a displaces AT MOST one member
    val grown = df.union(Seq((999999L, "a")).toDF("doc_id", "s"))
    val s2 = Sampling.bottomKPerStratum(grown, "s", col("doc_id").cast("string"),
      col("doc_id"), k = 25).select("doc_id").collect().map(_.getLong(0)).toSet
    assert((s1 -- s2).size <= 1, s"grew by one doc but evicted ${(s1 -- s2).size}")
  }

  test("plan: stratified sampling is map-only (no Exchange)") {
    val plan = Sampling.stratifiedSample(corpus(10, 10), "s",
      col("doc_id").cast("string"), Map("a" -> 0.5), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample must not shuffle:\n$plan")
  }
}
