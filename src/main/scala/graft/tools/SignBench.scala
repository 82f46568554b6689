package graft.tools

import graft.{Bench, DedupConfig}
import graft.plans.DedupPipeline

/** Evidence run for the OPH signer: time the signature stage alone
  * (classic k-permutation MinHash vs `signerOph`) over a persisted
  * 01_norm directory. One JSON line on stdout. Usage:
  *   runMain graft.tools.SignBench /path/to/run/01_norm
  */
object SignBench {
  def main(args: Array[String]): Unit = {
    val normDir = args(0)
    val spark = Bench.buildSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val norm = spark.read.parquet(normDir).as[graft.model.Schemas.DocNorm]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = norm.count()

    def run(conf: DedupConfig): Double = {
      val t0 = System.nanoTime()
      DedupPipeline.signatureStage(spark, norm, conf).foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    val classicConf = DedupConfig.balanced
    val ophConf = DedupConfig.balanced.copy(signerOph = true)
    run(classicConf) // warm-up (JIT + parquet decode into the cache)
    val classic = math.min(run(classicConf), run(classicConf))
    val oph = math.min(run(ophConf), run(ophConf))
    spark.stop()
    println(
      f"""{"docs":$nDocs,"sec_classic":$classic%.2f,"sec_oph":$oph%.2f,"speedup":${classic / oph}%.2f}""")
  }
}
