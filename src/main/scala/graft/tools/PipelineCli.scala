package graft.tools

import graft.DedupConfig
import graft.model.Schemas.Page
import graft.plans.DedupPipeline
import org.apache.spark.sql.{Dataset, SparkSession}

/** spark-submit entrypoint for the dedup pipeline — the north rule's
  * deployment surface ("runs via spark-submit on multi-executor clusters"):
  *
  *   spark-submit --class graft.tools.PipelineCli <jar> \
  *     --input /data/pages_parquet --run-dir hdfs:///dedup/run1 \
  *     [--preset balanced|high|recall] [--signer classic|oph] \
  *     [--reliable-checkpoints] [--checkpoint-dir hdfs:///dedup/ck] \
  *     [--no-resume]
  *
  * `--input` is a parquet directory of Common-Crawl-style pages with the
  * input-table shape (url string, warc_ts timestamp, html binary,
  * text string, lang string). Master, executor count, and memory come from
  * spark-submit itself (no master hardcoded here); all stage outputs,
  * per-partition lineage, and metrics.json land under --run-dir, and a
  * re-run with the same config resumes from completed stages. One JSON
  * line (the run's metrics) is printed to stdout on success.
  */
object PipelineCli {

  final case class Args(input: String = "", runDir: String = "",
                        preset: String = "balanced", signer: String = "classic",
                        reliable: Boolean = false, checkpointDir: Option[String] = None,
                        resume: Boolean = true)

  def parse(argv: Seq[String]): Args = {
    def loop(rest: List[String], acc: Args): Args = rest match {
      case Nil => acc
      case "--input" :: v :: t => loop(t, acc.copy(input = v))
      case "--run-dir" :: v :: t => loop(t, acc.copy(runDir = v))
      case "--preset" :: v :: t => loop(t, acc.copy(preset = v))
      case "--signer" :: v :: t => loop(t, acc.copy(signer = v))
      case "--reliable-checkpoints" :: t => loop(t, acc.copy(reliable = true))
      case "--checkpoint-dir" :: v :: t => loop(t, acc.copy(checkpointDir = Some(v)))
      case "--no-resume" :: t => loop(t, acc.copy(resume = false))
      case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val a = loop(argv.toList, Args())
    require(a.input.nonEmpty, "--input <pages parquet dir> is required")
    require(a.runDir.nonEmpty, "--run-dir <stage output dir> is required")
    a
  }

  def config(a: Args): DedupConfig = {
    val base = a.preset match {
      case "balanced" => DedupConfig.balanced
      case "high" => DedupConfig.high
      case "recall" => DedupConfig.recall
      case p => throw new IllegalArgumentException(s"unknown preset: $p")
    }
    val signed = a.signer match {
      case "classic" => base
      case "oph" => base.copy(signerOph = true)
      case s => throw new IllegalArgumentException(s"unknown signer: $s")
    }
    signed.copy(reliableCheckpoints = a.reliable)
  }

  /** Session-injected core (the testable half of main). */
  def run(spark: SparkSession, a: Args): Long = {
    import spark.implicits._
    a.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val pages: Dataset[Page] = spark.read.parquet(a.input)
      .select($"url", $"warc_ts", $"html", $"text", $"lang").as[Page]
    DedupPipeline.run(spark, pages, a.runDir, config(a), resume = a.resume).count()
  }

  def main(argv: Array[String]): Unit = {
    // Pin the JVM default locale: the Dsir/Vocab/Winnow local mirrors
    // lowercase with Locale.ROOT while Spark's `lower()` follows the JVM
    // default — on a special-casing default locale (tr_TR 'I'/'İ') the
    // stream-vs-batch parity documented in those Scaladocs would diverge.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val a = parse(argv.toIndexedSeq)
    // No .master() here: spark-submit supplies master/executors/memory.
    val spark = SparkSession.builder().appName("graft-dedup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clustered = run(spark, a)
    val metrics = {
      val p = new org.apache.hadoop.fs.Path(a.runDir, "metrics.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    spark.stop()
    println(metrics)
  }
}
