package graft

import graft.plans.DedupPipeline
import org.scalatest.funsuite.AnyFunSuite

/** DedupConfig.verifyCoGroup — the partition-aware pair scorer must be
  * VERDICT-IDENTICAL to the join dataflow (same pairs, same scores, same
  * labels), including the empty-shingle sentinel and exact-dup paths, and
  * invariant to the shuffle-partition count that defines its routing.
  */
class VerifyCoGroupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def verdictsWith(conf: DedupConfig, pages: org.apache.spark.sql.Dataset[graft.model.Schemas.Page]): Set[String] = {
    import spark.implicits._
    val norm = DedupPipeline.normalizeStage(spark, pages)
    val reps = DedupPipeline.repMap(spark, norm)
    val repNorm = norm.join(reps.filter($"url" === $"rep").select($"rep"),
      norm("url") === $"rep").drop("rep").as[graft.model.Schemas.DocNorm]
    val sigs = DedupPipeline.signatureStage(spark, repNorm, conf)
    val bands = DedupPipeline.bandingStage(spark, sigs, conf)
    val (cands, _) = DedupPipeline.candidateStage(spark, bands, conf)
    DedupPipeline.verifyStage(spark, cands, sigs, repNorm, conf)
      .collect().map(_.toString).toSet
  }

  test("cogroup scorer == join scorer on a mixed corpus (near dups, exact dups, empties)") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 15, membersPerFamily = 7)
    val joinV = verdictsWith(DedupConfig.balanced, pages)
    val cgV = verdictsWith(DedupConfig.balanced.copy(verifyCoGroup = true), pages)
    assert(joinV.nonEmpty)
    assert(cgV == joinV,
      s"only-join=${(joinV -- cgV).take(3)}, only-cogroup=${(cgV -- joinV).take(3)}")
  }

  test("cogroup scorer is invariant to the shuffle-partition count") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 8, membersPerFamily = 7)
    val conf = DedupConfig.balanced.copy(verifyCoGroup = true)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val at8 = verdictsWith(conf, pages)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val at3 = verdictsWith(conf, pages)
      assert(at3 == at8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
