package graft.tools

import graft.{Bench, DedupConfig, ScalingBench}
import graft.pages.PagesSource
import graft.plans.DedupPipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Evidence run for the verify-stage MinHash-estimate prefilter: the same
  * pipeline at sf0.1 with the prefilter ON (default band) vs OFF
  * (band = (-1, 2) → every non-exact pair joins the full shingle arrays,
  * i.e. the pre-prefilter dataflow), reporting total shuffle bytes, wall
  * time, and verdict/cluster identity. One JSON line on stdout.
  */
object PrefilterBench {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val expand = sys.env.getOrElse("SPARK_GRAFT_EXPAND", "8").toInt
    val variants = sys.env.getOrElse("SPARK_GRAFT_VARIANTS", "2").toInt
    val spark = Bench.buildSpark(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // At 10^12-doc scale the pairs relation is far beyond any broadcast
    // threshold, so the verify joins are shuffle joins; this knob emulates
    // that join strategy at sandbox scale so the prefilter's shuffle-byte
    // effect is measurable (with broadcasts, the array side never shuffles
    // locally and the comparison is blind to it).
    if (sys.env.get("SPARK_GRAFT_FORCE_SMJ").contains("1")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }

    val pages = ScalingBench.expandPages(spark,
      PagesSource.fromDocuments(spark, sfDir, variants), sfDir, expand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPages = pages.count()

    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
        }
      }
    })

    def runWith(conf: DedupConfig, tag: String): (String, Double, Long, Long) = {
      val dir = s"/tmp/graft_prefilter_$tag"
      deleteRecursively(new java.io.File(dir))
      shuffleWrite = 0L; shuffleRead = 0L
      val t0 = System.nanoTime()
      DedupPipeline.run(spark, pages, dir, conf, resume = false).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000) // drain async listener events
      (dir, sec, shuffleWrite, shuffleRead)
    }

    runWith(DedupConfig.balanced, "warmup")
    val (dOn, sOn, wOn, rOn) = runWith(DedupConfig.balanced.copy(estPrefilter = true), "on")
    val (dBb, sBb, wBb, rBb) = runWith(DedupConfig.balanced.copy(bbitPrefilter = true), "bbit")
    val (dOff, sOff, wOff, rOff) = runWith(DedupConfig.balanced, "off")

    val a = spark.read.parquet(s"$dOn/06_verdicts").select(col("pair_key"), col("final_label").as("la"))
    val b = spark.read.parquet(s"$dOff/06_verdicts").select(col("pair_key"), col("final_label").as("lb"))
    val labelDiffs = a.join(b, Seq("pair_key"), "full_outer")
      .filter(not(col("la") <=> col("lb"))).count()
    val bb = spark.read.parquet(s"$dBb/06_verdicts").select(col("pair_key"), col("final_label").as("lc"))
    val bbitDiffs = bb.join(b, Seq("pair_key"), "full_outer")
      .filter(not(col("lc") <=> col("lb"))).count()
    val cOn = spark.read.parquet(s"$dOn/07_clusters")
      .select("url", "cluster_id").collect().map(_.toSeq).toSet
    val cOff = spark.read.parquet(s"$dOff/07_clusters")
      .select("url", "cluster_id").collect().map(_.toSeq).toSet
    val cBb = spark.read.parquet(s"$dBb/07_clusters")
      .select("url", "cluster_id").collect().map(_.toSeq).toSet
    val pairsTotal = a.count()

    spark.stop()
    println(
      f"""{"pages":$nPages,"pairs":$pairsTotal,"sec_prefilter_on":$sOn%.2f,"sec_prefilter_bbit":$sBb%.2f,"sec_prefilter_off":$sOff%.2f,"shuffle_write_on":$wOn,"shuffle_write_bbit":$wBb,"shuffle_write_off":$wOff,"shuffle_read_on":$rOn,"shuffle_read_bbit":$rBb,"shuffle_read_off":$rOff,"shuffle_write_saved_pct":${100.0 * (wOff - wOn) / math.max(1L, wOff)}%.1f,"shuffle_write_saved_bbit_pct":${100.0 * (wOff - wBb) / math.max(1L, wOff)}%.1f,"label_diffs":$labelDiffs,"label_diffs_bbit":$bbitDiffs,"clusters_identical":${cOn == cOff},"clusters_identical_bbit":${cBb == cOff}}""")
  }
}
