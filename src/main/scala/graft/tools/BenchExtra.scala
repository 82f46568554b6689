package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Round-6 auxiliary benchmarks — everything the frozen `graft.Bench`
  * cannot time (guide §1.4/§1.5): noop-sink isolation of each bench query
  * (computes every column of every row, no sink cost, no count-pruning)
  * and the OPH-signer pipeline end-to-end (VERDICT r05 #6: the
  * `q_dedup_clusters_oph` row was green but untimed).
  *
  * Same env contract as Bench: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS;
  * prints ONE JSON line `{"metric":"extra", ...}`. The classic-pipeline
  * and OPH-pipeline rows are timed cold (run dirs deleted first), like
  * Bench times q_dedup_clusters.
  */
object BenchExtra {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def timeNoop(spark: SparkSession, name: String, sfDir: String, k: Int): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < k) {
      if (name == "q_dedup_clusters")
        deleteRecursively(new java.io.File(
          s"/tmp/graft_pipe_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"))
      if (name == "q_dedup_clusters_oph")
        deleteRecursively(new java.io.File(
          s"/tmp/graft_pipeoph_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"))
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[benchextra] $name failed: $e"); return -1.0 }
      finally spark.sparkContext.setJobDescription(null)
      val t = (System.nanoTime() - t0) / 1e9
      if (t < best) best = t
      i += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2").toInt.max(1)
    val spark = graft.Bench.buildSpark(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = graft.Bench.benchNames :+ "q_dedup_clusters_oph"
    val results = names.map(n => n -> timeNoop(spark, n, sfDir, repeat))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val json = s"""{"metric":"extra","unit":"sec","sink":"noop","queries":$qs,"sf":"$sfDir","cpus":"$cpus","stat":"min_of_$repeat"}"""
    spark.stop()
    println(json)
  }
}
