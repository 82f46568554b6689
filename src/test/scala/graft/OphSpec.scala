package graft

import graft.sig.Oph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One-permutation hashing (sig/Oph): the distributed signature table
  * against the single-pass reference, hand-traced densification, the
  * bin-agreement Jaccard estimator on sets with known overlap, and
  * partition invariance.
  */
class OphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val Bins = 64

  private def shDf(rows: (String, Array[Long])*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "shingles")
  }

  /** Deterministic pseudo-random shingle hash set (full signed range).
    * splitmix64-finalized so the values are hash-uniform — the bin-min
    * estimator assumes that, and a raw arithmetic progression (the first
    * draft here) correlates bin minima enough to wreck it.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def fakeShingles(seed: Long, n: Int): Array[Long] =
    Array.tabulate(n)(i => mix(seed * 1000003L + i))

  test("distributed signature table matches the single-pass reference") {
    val rows = Seq(
      "a" -> fakeShingles(1L, 300),
      "b" -> fakeShingles(2L, 40),   // sparse: many empty bins -> densify
      "c" -> fakeShingles(3L, 3))    // very sparse: long rotation walks
    val got = Oph.signatureTable(shDf(rows: _*), "url", "shingles", Bins)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    rows.foreach { case (u, sh) =>
      assert(got(u).sameElements(Oph.signature(sh, Bins)), s"doc $u")
    }
  }

  test("hand-traced densification at bins=8") {
    // h values chosen so bins 1 and 4 are filled, everything else empty:
    // 9 % 8 = 1, 12 % 8 = 4, 20 % 8 = 4 (min 12)
    val sig = Oph.signature(Array(9L, 12L, 20L), 8)
    assert(sig(1) == 9L && sig(4) == 12L)
    assert(sig(0) == (9L ^ (1L * Oph.MixC)))      // borrow bin 1 at t=1
    assert(sig(2) == (12L ^ (2L * Oph.MixC)))     // borrow bin 4 at t=2
    assert(sig(3) == (12L ^ (1L * Oph.MixC)))
    assert(sig(5) == (9L ^ (4L * Oph.MixC)))      // wrap: 5 -> 9 % 8 = 1
    assert(sig(7) == (9L ^ (2L * Oph.MixC)))
    assert(Oph.signature(Array.empty[Long], 8).forall(_ == Long.MaxValue))
  }

  test("bin-agreement estimator tracks true Jaccard of the hash sets") {
    val base = fakeShingles(10L, 400)
    val half = base.take(200) ++ fakeShingles(11L, 200)   // J = 200/600
    val none = fakeShingles(12L, 400)                     // J = 0
    import spark.implicits._
    val t = Oph.signatureTable(
      shDf("x" -> base, "y" -> half, "z" -> none, "w" -> base), "url", "shingles", Bins)
    val pairs = Seq(("x", "y"), ("x", "z"), ("x", "w")).toDF("a", "b")
    val est = Oph.estimatePairs(pairs, t, Bins)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3) / 1e6).toMap
    assert(est(("x", "w")) == 1.0)
    assert(math.abs(est(("x", "y")) - 200.0 / 600.0) < 0.2)
    assert(est(("x", "z")) < 0.15)
  }

  test("pipeline with the OPH signer keeps >= 0.99 of the classic duplicate pairs") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 40, membersPerFamily = 6)
    def dupPairs(conf: graft.DedupConfig, tag: String): Set[String] = {
      val dir = s"/tmp/graft_test_ophsigner_$tag"
      TestUtil.deleteRecursively(new java.io.File(dir))
      graft.plans.DedupPipeline.run(spark, pages, dir, conf, resume = false)
      spark.read.parquet(s"$dir/06_verdicts")
        .filter($"final_label" === "DUPLICATE")
        .select($"pair_key").as[String].collect().toSet
    }
    val classic = dupPairs(graft.DedupConfig.balanced, "off")
    val oph = dupPairs(graft.DedupConfig.balanced.copy(signerOph = true), "on")
    // verification is exact, so precision is structural: every OPH dup
    // pair must verify under the same thresholds — only candidate recall
    // can move between signers
    val recall = (classic & oph).size.toDouble / classic.size
    assert(recall >= 0.99, s"OPH-signer dup-pair recall $recall vs classic (|classic|=${classic.size})")
  }

  test("signature table is partition invariant") {
    val rows = (1L to 30L).map(i => s"u$i" -> fakeShingles(i, 20 + (i % 50).toInt))
    val d1 = shDf(rows: _*).repartition(1)
    val d7 = shDf(rows: _*).repartition(7)
    def m(df: org.apache.spark.sql.DataFrame) =
      Oph.signatureTable(df, "url", "shingles", Bins)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    assert(m(d1) == m(d7))
  }
}
