package graft

import graft.model.Schemas.Page
import graft.plans.DedupPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end pipeline vs the reference: dup-pair recall >= 0.99 against the
  * reference's cluster assignments (BASELINE.json metric) on the golden
  * corpus, at the same shingle/signature config.
  */
class PipelineGoldenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val clustersByUrl: Map[String, String] = {
    import spark.implicits._
    val pages = GoldenFixtures.corpus.map { d =>
      Page(d.url, new Timestamp(1704067200000L), Array.emptyByteArray, d.text, "en")
    }
    val ds = spark.createDataset(pages)
    val dir = "/tmp/graft_test_pipeline"
    TestUtil.deleteRecursively(new java.io.File(dir))
    val out = DedupPipeline.run(spark, ds, dir, DedupConfig.balanced, resume = false)
    out.select($"url", $"cluster_id").as[(String, String)].collect().toMap
  }

  private def recallVs(mode: String): (Double, Long, Long) = {
    val clusters = GoldenFixtures.goldenClusters.filter(_.mode == mode)
    var total = 0L
    var hit = 0L
    clusters.foreach { c =>
      val ms = c.members
      for (i <- ms.indices; j <- (i + 1) until ms.size) {
        total += 1
        val ci = clustersByUrl.get(ms(i))
        val cj = clustersByUrl.get(ms(j))
        if (ci.isDefined && ci == cj) hit += 1
      }
    }
    (hit.toDouble / total, hit, total)
  }

  test("dup-pair recall >= 0.99 vs reference clusters (sampler candidates)") {
    val (recall, hit, total) = recallVs("sampler")
    info(f"sampler-mode recall: $recall%.4f ($hit/$total pairs)")
    assert(recall >= 0.99)
  }

  test("dup-pair recall >= 0.99 vs reference clusters (all truth pairs scored)") {
    val (recall, hit, total) = recallVs("alltruth")
    info(f"alltruth-mode recall: $recall%.4f ($hit/$total pairs)")
    assert(recall >= 0.99)
  }

  test("verdict labels agree with reference decisions on shared pairs") {
    import spark.implicits._
    val verdicts = spark.read.parquet("/tmp/graft_test_pipeline/06_verdicts")
      .select($"pair_key", $"final_label").as[(String, String)].collect().toMap
    // Verdicts are rep-level (exact-group members never reach LSH; they
    // attach via the rep map), so only golden pairs between group reps can
    // appear here. Exhaustive pair-level decision parity over all 3302
    // golden pairs lives in DecisionParitySpec.
    val shared = GoldenFixtures.goldenDecisions.filter(d => verdicts.contains(d.pairKey))
    assert(shared.size > 100, s"too few shared pairs (${shared.size}) for a meaningful check")
    val disagree = shared.filter(d => verdicts(d.pairKey) != d.label)
    val rate = 1.0 - disagree.size.toDouble / shared.size
    info(f"shared pairs: ${shared.size}, agreement: $rate%.5f")
    assert(disagree.isEmpty, s"first disagreements: ${disagree.take(5).map(d =>
      s"${d.pairKey} ours=${verdicts(d.pairKey)} ref=${d.label}").mkString("; ")}")
  }

  test("exact duplicates collapse via the exact-hash short-circuit") {
    // families' case/whitespace/punct/special variants (kinds 1-4) must land
    // in the same cluster as their base without needing signature votes
    val fams = GoldenFixtures.corpus.filter(d => d.family >= 0 && d.kind >= 0 && d.kind <= 4)
      .groupBy(_.family)
    fams.foreach { case (_, members) =>
      val cids = members.flatMap(m => clustersByUrl.get(m.url)).distinct
      assert(cids.size == 1, s"family ${members.head.family} exact variants split: $cids")
    }
  }

  test("metrics snapshot is written alongside outputs") {
    clustersByUrl // force the pipeline run
    val f = new java.io.File("/tmp/graft_test_pipeline/metrics.json")
    assert(f.exists())
    val json = java.nio.file.Files.readString(f.toPath)
    assert(json.contains("\"duplicates\":") && json.contains("\"stages\":["))
    assert(json.contains("\"clusters\":"))
  }

  test("lineage rows exist for every stage partition") {
    val lineage = spark.read.parquet("/tmp/graft_test_pipeline/lineage/*")
    val stages = lineage.select("stage").distinct().collect().map(_.getString(0)).sorted
    assert(stages.toSeq == Seq("01_norm", "02_reps", "03_sig", "04_bands", "05_cand", "06_verdicts", "07_clusters"))
    assert(lineage.filter(col("rows") < 0).count() == 0)
  }
}
