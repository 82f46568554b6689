package graft

import graft.plans.DedupPipeline
import org.scalatest.funsuite.AnyFunSuite

/** S13 — HTML run report rendered from persisted stage outputs. */
class ReportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("report renders summary, top pairs, and shared-shingle rationale") {
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 20, membersPerFamily = 5)
    val dir = "/tmp/graft_test_report"
    TestUtil.deleteRecursively(new java.io.File(dir))
    DedupPipeline.run(spark, pages, dir, DedupConfig.balanced, resume = false)
    val out = graft.tools.Report.write(spark, dir, topK = 5)
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
    assert(html.contains("<h1>Near-duplicate run report</h1>"))
    assert(html.contains("total_pairs") && html.contains("duplicates"))
    assert(html.contains("Top 5 duplicate pairs"))
    assert(html.contains("shared)"), "no shingle rationale rendered")
    assert(html.contains("\"stages\":["), "metrics json not embedded")
  }
}
