package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IncrementalDedup: the incremental ingest must agree exactly with a full
  * recompute on the union corpus (for every component a new page touches),
  * exact refetches must short-circuit before signing, and config-mismatched
  * old runs must be refused.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_test_inc_$tag"
    TestUtil.deleteRecursively(new java.io.File(d))
    d
  }

  test("incremental ingest == full recompute on every affected component") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 30, membersPerFamily = 5)
    // old corpus: members m0-m2 of each family; new crawl batch: m3-m4
    val oldPages = pages.filter(p => p.url.split("/m")(1).toInt < 3)
    val newPages = pages.filter(p => p.url.split("/m")(1).toInt >= 3)

    val conf = DedupConfig.balanced
    val oldDir = freshDir("full_old")
    graft.plans.DedupPipeline.run(spark, oldPages, oldDir, conf, resume = false)
    val inc = graft.plans.IncrementalDedup.ingest(spark, oldDir, newPages, oldDir, conf)
      .select($"url", $"cluster_id", $"cluster_size")
      .as[(String, String, Long)].collect().toSet

    val fullDir = freshDir("full_all")
    val full = graft.plans.DedupPipeline.run(spark, pages, fullDir, conf, resume = false)
    val newUrls = newPages.map(_.url).collect().toSet
    val fullRows = full.select($"url", $"cluster_id", $"cluster_size")
      .as[(String, String, Long)].collect()
    val affected = fullRows.map(_._2).toSet.filter(cid =>
      fullRows.exists(r => r._2 == cid && newUrls.contains(r._1)))
    val fullAffected = fullRows.filter(r => affected.contains(r._2)).toSet

    assert(inc.nonEmpty, "expected affected components")
    assert(inc == fullAffected,
      s"incremental=${inc.size} rows, full-affected=${fullAffected.size}; " +
        s"only-inc=${(inc -- fullAffected).take(5)}, only-full=${(fullAffected -- inc).take(5)}")
  }

  test("exact refetches attach by hash join and are never signed") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 10, membersPerFamily = 3)
    val oldDir = freshDir("refetch")
    graft.plans.DedupPipeline.run(spark, pages, oldDir, DedupConfig.balanced, resume = false)
    // the refetch batch: identical text under a fresh url
    val refetch = pages.map(p => p.copy(url = p.url + "/refetch"))
    val out = graft.plans.IncrementalDedup.ingest(spark, oldDir, refetch, oldDir, DedupConfig.balanced)

    // nothing reached the signature pass
    assert(spark.read.parquet(s"$oldDir/inc_03_sig").count() == 0)
    // every refetched page is clustered with its original
    val assigned = out.select($"url", $"cluster_id").as[(String, String)].collect()
      .filter(_._1.endsWith("/refetch")).toMap
    assert(assigned.size == pages.count())
    val clusterOf = out.select($"url", $"cluster_id").as[(String, String)].collect().toMap
    assigned.foreach { case (u, cid) =>
      val orig = u.stripSuffix("/refetch")
      assert(clusterOf.get(orig).contains(cid), s"$u not clustered with $orig")
    }
  }

  test("two-batch chain: ingest -> compact -> ingest == full recompute") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 20, membersPerFamily = 5)
    def m(u: String) = u.split("/m")(1).toInt
    val basePages = pages.filter(p => m(p.url) < 2)
    val b1 = pages.filter(p => m(p.url) == 2 || m(p.url) == 3)
    val b2 = pages.filter(p => m(p.url) == 4)

    val conf = DedupConfig.balanced
    val baseDir = freshDir("chain_base")
    graft.plans.DedupPipeline.run(spark, basePages, baseDir, conf, resume = false)
    val inc1 = freshDir("chain_inc1")
    graft.plans.IncrementalDedup.ingest(spark, baseDir, b1, inc1, conf)
    val comp1 = freshDir("chain_comp1")
    graft.plans.IncrementalDedup.compact(spark, baseDir, inc1, comp1, conf)
    val inc2 = freshDir("chain_inc2")
    graft.plans.IncrementalDedup.ingest(spark, comp1, b2, inc2, conf)
    val comp2 = freshDir("chain_comp2")
    graft.plans.IncrementalDedup.compact(spark, comp1, inc2, comp2, conf)

    val chained = spark.read.parquet(s"$comp2/07_clusters")
      .select($"url", $"cluster_id", $"cluster_size")
      .as[(String, String, Long)].collect().toSet

    val fullDir = freshDir("chain_full")
    graft.plans.DedupPipeline.run(spark, pages, fullDir, conf, resume = false)
    val full = spark.read.parquet(s"$fullDir/07_clusters")
      .select($"url", $"cluster_id", $"cluster_size")
      .as[(String, String, Long)].collect().toSet

    assert(chained.nonEmpty)
    assert(chained == full,
      s"chained=${chained.size} full=${full.size}; " +
        s"only-chained=${(chained -- full).take(5)}, only-full=${(full -- chained).take(5)}")
  }

  test("re-running ingest with a different batch in the same incDir recomputes (batch marker)") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 8, membersPerFamily = 4)
    def m(u: String) = u.split("/m")(1).toInt
    val basePages = pages.filter(p => m(p.url) < 2)
    val b1 = pages.filter(p => m(p.url) == 2)
    val b2 = pages.filter(p => m(p.url) == 3)

    val conf = DedupConfig.balanced
    val baseDir = freshDir("bmark_base")
    graft.plans.DedupPipeline.run(spark, basePages, baseDir, conf, resume = false)
    val incDir = freshDir("bmark_inc")
    graft.plans.IncrementalDedup.ingest(spark, baseDir, b1, incDir, conf)
    val normB1 = spark.read.parquet(s"$incDir/inc_01_norm").select($"url")
      .as[String].collect().toSet
    assert(normB1 == b1.map(_.url).collect().toSet)

    // SAME incDir, DIFFERENT batch: stages must recompute, not resume
    graft.plans.IncrementalDedup.ingest(spark, baseDir, b2, incDir, conf)
    val normB2 = spark.read.parquet(s"$incDir/inc_01_norm").select($"url")
      .as[String].collect().toSet
    assert(normB2 == b2.map(_.url).collect().toSet,
      "stale previous-batch stages were returned instead of recomputing")
  }

  test("config-mismatched old run is refused") {
    import spark.implicits._
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 4, membersPerFamily = 2)
    val oldDir = freshDir("confmismatch")
    graft.plans.DedupPipeline.run(spark, pages, oldDir, DedupConfig.balanced, resume = false)
    val other = DedupConfig.balanced.copy(numPerm = 128)
    val e = intercept[IllegalArgumentException] {
      graft.plans.IncrementalDedup.ingest(spark, oldDir, pages, oldDir, other)
    }
    assert(e.getMessage.contains("incomparable"))
  }
}
