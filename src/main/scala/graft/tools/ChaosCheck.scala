package graft.tools

import graft.DedupConfig
import graft.plans.DedupPipeline
import org.apache.spark.sql.SparkSession

/** Executor-loss chaos check for the `reliableCheckpoints` deployment knob
  * (DedupConfig Scaladoc): run the full pipeline on a real multi-executor
  * `local-cluster` with durable checkpoint() enabled, SIGKILL one executor
  * JVM as soon as the first reliable checkpoint has been written (i.e.
  * mid-verify — the lineage-truncation point), and assert the job still
  * completes with clusters identical to an undisturbed local[4] run.
  *
  * This is the positive half of the cluster-deployment claim. The negative
  * half — that the DEFAULT localCheckpoint pipeline cannot survive the same
  * loss — is documented rather than asserted: once an executor holding
  * localCheckpoint blocks dies, Spark aborts the job with
  * "Checkpoint block ... not found" after exhausting task retries, and
  * asserting a specific failure mode of Spark's retry machinery would pin
  * this test to scheduler internals that legitimately vary across versions.
  *
  * Runs as a separate JVM (launched by ExecutorLossSpec) because the
  * ScalaTest suites share one local[4] SparkContext and a JVM can hold only
  * one context at a time. One JSON line on stdout:
  *   {"chaos":"executor_kill","killed":true,"match":true,"rows":N}
  */
object ChaosCheck {
  @volatile private var killedPid: Long = -1L

  private def sparkLocal(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** True once any reliable-checkpoint part file exists under `dir`. */
  private def hasCheckpointData(dir: java.io.File): Boolean = {
    def walk(f: java.io.File): Boolean =
      if (f.isDirectory) Option(f.listFiles()).exists(_.exists(walk))
      else f.getName.startsWith("part-")
    dir.exists() && walk(dir)
  }

  private def executorChildren(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala
      .filter(_.info().commandLine().orElse("").contains("CoarseGrainedExecutorBackend"))
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    // same locale pin as PipelineCli (Dsir/Vocab/Winnow mirror caveat)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nFamilies = if (args.nonEmpty) args(0).toInt else 600
    val stamp = System.nanoTime()

    // Phase 1: undisturbed expected clusters on plain local[4].
    val local = sparkLocal()
    local.sparkContext.setLogLevel("WARN")
    val (pagesL, _) = graft.pages.PagesSource.syntheticCorpus(local, nFamilies, 6)
    val expected = DedupPipeline.run(local, pagesL, s"/tmp/graft_chaos_exp_$stamp",
      DedupConfig.balanced, resume = false).collect().map(_.toString).sorted.toSeq
    local.stop()

    // Phase 2: 2 executor JVMs x 2 cores, durable checkpoints, one SIGKILL.
    val spark = graft.ScalingBench.buildClusterSpark(2, 2, 3072, 8)
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = new java.io.File(s"/tmp/graft_chaos_ck_$stamp")
    spark.sparkContext.setCheckpointDir(ckDir.getAbsolutePath)
    val killer = new Thread(() => {
      val deadline = System.currentTimeMillis() + 600000L
      // wait for the first durable checkpoint (the verify pair relation)
      // AND a full executor complement to pick a victim from
      while ((!hasCheckpointData(ckDir) || executorChildren().size < 2)
        && System.currentTimeMillis() < deadline) Thread.sleep(200)
      executorChildren().headOption.foreach { v =>
        killedPid = v.pid()
        System.err.println(s"[chaos] SIGKILL executor pid=$killedPid")
        v.destroyForcibly()
      }
    })
    killer.setDaemon(true)
    killer.start()
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies, 6)
    val got = DedupPipeline.run(spark, pages, s"/tmp/graft_chaos_run_$stamp",
      DedupConfig.balanced.copy(reliableCheckpoints = true), resume = false)
      .collect().map(_.toString).sorted.toSeq
    spark.stop()

    val killed = killedPid > 0
    val ok = got == expected
    println(s"""{"chaos":"executor_kill","killed":$killed,"match":$ok,"rows":${got.size}}""")
    if (!killed) sys.exit(2)
    if (!ok) sys.exit(1)
  }
}
