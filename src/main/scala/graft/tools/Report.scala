package graft.tools

import graft.norm.TextNorm
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S13 — run report: the reference renders an HTML summary with per-pair
  * rationale (app.py report route / minhash rationale strings); ours renders
  * the same surface from the persisted stage outputs — run summary, label
  * counts, top duplicate pairs with per-learner scores and the T3
  * shared-shingle sample. Driver-sized by construction: everything read
  * here is already aggregated or explicitly top-k-limited.
  */
object Report {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render `runDir/report.html` from a completed pipeline run. */
  def write(spark: SparkSession, runDir: String, topK: Int = 10): String = {
    import spark.implicits._
    val verdicts = spark.read.parquet(s"$runDir/06_verdicts")
    val summary = graft.metrics.Metrics.runSummary(verdicts).first()
    val top = graft.metrics.Metrics.topExamples(verdicts, "jaccard", "DUPLICATE", topK)
      .select($"a", $"b", $"jaccard", $"sim_sim", $"shared_span_len", $"dup_kind")
      .collect()
    val normByUrl = {
      val urls = top.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
      if (urls.isEmpty) Map.empty[String, String]
      else spark.read.parquet(s"$runDir/01_norm")
        .filter($"url".isin(urls.toIndexedSeq: _*))
        .select($"url", $"norm_text").as[(String, String)].collect().toMap
    }
    val metricsJson = {
      val p = new java.io.File(s"$runDir/metrics.json")
      if (p.exists()) java.nio.file.Files.readString(p.toPath) else "{}"
    }

    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>graft dedup run</title></head><body>")
    sb.append("<h1>Near-duplicate run report</h1>")
    sb.append("<h2>Summary</h2><table border=\"1\"><tr>")
    summary.schema.fieldNames.foreach(f => sb.append(s"<th>${esc(f)}</th>"))
    sb.append("</tr><tr>")
    summary.toSeq.foreach(v => sb.append(s"<td>${esc(String.valueOf(v))}</td>"))
    sb.append("</tr></table>")
    sb.append(s"<h2>Top $topK duplicate pairs</h2>")
    sb.append("<table border=\"1\"><tr><th>a</th><th>b</th><th>jaccard</th><th>simhash</th>" +
      "<th>span</th><th>kind</th><th>shared shingles (sample)</th></tr>")
    top.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val sample = (for { na <- normByUrl.get(a); nb <- normByUrl.get(b) } yield {
        val (_, s, nInter, nUnion) = TextOps.sharedShingleRationale(
          TextNorm.tokenize(na), TextNorm.tokenize(nb), 3)
        s"${s.map(esc).mkString("; ")} <i>($nInter/$nUnion shared)</i>"
      }).getOrElse("")
      sb.append(s"<tr><td>${esc(a)}</td><td>${esc(b)}</td>" +
        f"<td>${r.getDouble(2)}%.4f</td><td>${r.getDouble(3)}%.4f</td>" +
        s"<td>${r.getInt(4)}</td><td>${esc(Option(r.getString(5)).getOrElse(""))}</td>" +
        s"<td>$sample</td></tr>")
    }
    sb.append("</table>")
    sb.append(s"<h2>Run metrics</h2><pre>${esc(metricsJson)}</pre>")
    sb.append("</body></html>")

    val out = s"$runDir/report.html"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    out
  }

  def main(args: Array[String]): Unit = {
    val runDir = args.headOption.getOrElse(
      graft.SparkEntry.runDirFor("/root/testdata/sf0.001"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"wrote ${write(spark, runDir)}")
    spark.stop()
  }
}
