package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Diagnostic: run the dedup pipeline cold and print every Spark job's
  * wall time + first stage name, to attribute pipeline wall to jobs.
  * Not part of the driver contract — a measurement tool like ScalingBench.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // "cluster <workers> <coresPerWorker>" after the sf dir probes the
    // local-cluster mode with the ScalingBench corpus (variants/expand env)
    val clusterMode = args.length >= 3 && args(1) == "cluster"
    val spark =
      if (clusterMode)
        graft.ScalingBench.buildClusterSpark(args(2).toInt, args(3).toInt,
          sys.env.getOrElse("SPARK_GRAFT_WORKER_MB", "6144").toInt,
          args(2).toInt * args(3).toInt)
      else graft.Bench.buildSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobs.synchronized { jobs(js.jobId) = (System.nanoTime(), desc.take(120)) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach { case (t0, d) =>
          done += ((je.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
      }
    })
    val stages = mutable.ArrayBuffer[(Int, Double, Double, Double, Long, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        val run = si.taskMetrics.executorRunTime / 1e3
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val sr = si.taskMetrics.shuffleReadMetrics.totalBytesRead
        val sw = si.taskMetrics.shuffleWriteMetrics.bytesWritten
        stages.synchronized {
          stages += ((si.stageId, wall, run, gc, sr, sw, si.numTasks, si.name.take(90)))
        }
      }
    })

    val pipeDir = s"/tmp/graft_probe_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.Bench.deleteRecursivelyPublic(new java.io.File(pipeDir))

    if (clusterMode) graft.ScalingBench.warmup(spark, sfDir)
    val t0 = System.nanoTime()
    val pages =
      if (clusterMode)
        graft.ScalingBench.buildPages(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_VARIANTS", "2").toInt)
      else graft.pages.PagesSource.fromDocuments(spark, sfDir, variants = 2)
    val tPages = System.nanoTime()
    val out = graft.plans.DedupPipeline.run(spark, pages, pipeDir, graft.ScalingBench.benchConf)
    val n = out.count()
    val tEnd = System.nanoTime()

    Thread.sleep(500) // let listener drain
    println(f"== pages build: ${(tPages - t0) / 1e9}%.2f s; pipeline: ${(tEnd - tPages) / 1e9}%.2f s; rows=$n")
    done.sortBy(_._1).foreach { case (id, sec, d) =>
      println(f"job $id%4d  $sec%7.2f s  $d")
    }
    println(f"== sum of jobs > 0.2s: ${done.map(_._2).filter(_ > 0.2).sum}%.2f s; all jobs: ${done.map(_._2).sum}%.2f s (n=${done.size})")
    println("== stages (wall, sumTaskRun, sumGC, shufR/W MB, nTasks, name), wall > 0.2s:")
    val snap = stages.synchronized { stages.sortBy(_._1).toVector }
    snap.foreach { case (id, wall, run, gc, sr, sw, nt, nm) =>
      if (wall > 0.2) println(f"stage $id%4d  wall=$wall%7.2f  run=$run%8.2f  gc=$gc%6.2f  sR=${sr / 1e6}%8.1f  sW=${sw / 1e6}%8.1f  tasks=$nt%4d  $nm")
    }
    println(f"== total shuffle read GB: ${snap.map(_._5).sum / 1e9}%.2f; write GB: ${snap.map(_._6).sum / 1e9}%.2f")
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    gcBeans.forEach(b => println(s"== driver GC ${b.getName}: ${b.getCollectionTime} ms over ${b.getCollectionCount} collections"))
    spark.stop()
  }
}
