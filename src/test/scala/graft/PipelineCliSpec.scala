package graft

import graft.tools.PipelineCli
import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit entrypoint: arg parsing, preset/signer/knob mapping,
  * and the session-injected run() end-to-end over a pages parquet dir
  * (stage outputs + lineage + metrics.json under --run-dir, resume markers
  * honored). main() itself is the same run() behind getOrCreate(), with
  * master/executors supplied by spark-submit — not testable in the shared
  * local[4] JVM, by design.
  */
class PipelineCliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("arg parsing and config mapping") {
    val a = PipelineCli.parse(Seq("--input", "/in", "--run-dir", "/out",
      "--preset", "recall", "--signer", "oph", "--reliable-checkpoints",
      "--checkpoint-dir", "/ck", "--no-resume"))
    assert(a == PipelineCli.Args("/in", "/out", "recall", "oph", reliable = true,
      checkpointDir = Some("/ck"), resume = false))
    val c = PipelineCli.config(a)
    assert(c.thrMinhash == DedupConfig.recall.thrMinhash)
    assert(c.signerOph && c.reliableCheckpoints)
    assert(PipelineCli.config(PipelineCli.parse(Seq("--input", "i", "--run-dir", "o")))
      == DedupConfig.balanced)
    intercept[IllegalArgumentException](PipelineCli.parse(Seq("--input", "i")))
    intercept[IllegalArgumentException](PipelineCli.parse(Seq("--input", "i", "--run-dir", "o", "--bogus")))
    intercept[IllegalArgumentException](PipelineCli.config(
      PipelineCli.parse(Seq("--input", "i", "--run-dir", "o", "--preset", "nope"))))
  }

  test("run(): pages parquet in, stage outputs + lineage + metrics out, resume honored") {
    val stamp = System.nanoTime()
    val inDir = s"/tmp/graft_cli_in_$stamp"
    val runDir = s"/tmp/graft_cli_run_$stamp"
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 30, membersPerFamily = 5)
    pages.write.parquet(inDir)
    val a = PipelineCli.parse(Seq("--input", inDir, "--run-dir", runDir))
    val n = PipelineCli.run(spark, a)
    assert(n > 0)
    Seq("01_norm", "03_sig", "04_bands", "05_cand", "06_verdicts", "07_clusters")
      .foreach(st => assert(new java.io.File(s"$runDir/$st/_SUCCESS").exists(), st))
    assert(new java.io.File(s"$runDir/lineage").isDirectory)
    assert(new java.io.File(s"$runDir/metrics.json").exists())
    // identical to driving the pipeline directly at the same config
    val direct = graft.plans.DedupPipeline.run(spark, pages, s"$runDir/_direct",
      DedupConfig.balanced, resume = false).collect().map(_.toString).sorted.toSeq
    val cli = spark.read.parquet(s"$runDir/07_clusters").collect().map(_.toString).sorted.toSeq
    assert(cli == direct)
    // resume: second run must not recompute (mtimes stable)
    val before = new java.io.File(s"$runDir/03_sig").listFiles().map(_.lastModified()).toSeq
    PipelineCli.run(spark, a)
    val after = new java.io.File(s"$runDir/03_sig").listFiles().map(_.lastModified()).toSeq
    assert(before == after, "resume recomputed a completed stage")
  }
}
