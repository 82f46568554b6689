package graft

import graft.model.Schemas.Page
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming curation gates (StreamingDedup.curateStream): quality, OOV,
  * and decontamination filters applied per-row at the stream boundary,
  * composing with dedupStream.
  */
class StreamingCurateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def page(url: String, text: String, minute: Int) =
    Page(url, new Timestamp(1704067200000L + minute * 60000L), Array.emptyByteArray, text, "en")

  private val cleanText = "the quick brown fox and the lazy dog it was a good day"
  private val vocab: Set[String] = cleanText.split(" ").toSet
  private val evalNg: Set[String] = Set("one two three")

  test("quality, OOV, and contamination gates each drop their row; clean passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val q = StreamingDedup.curateStream(spark, in.toDS(), vocab, evalNg, n = 3,
      minQuality = 0.5, maxOovRate = 0.5)
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        page("clean", cleanText, 0),
        page("lowq", "0123456789!!!! 0000 ####", 1),
        // 3-char tokens keep mean_token_len in the quality sweet spot
        // (score ~0.71 >= 0.5) so THIS row isolates the OOV gate
        page("oov", "zzz yyy xxx www vvv uuu ttt sss rrr qqq", 2),
        page("contaminated", "it was the day and one two three it was good", 3))
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM curate_out").as[String].collect().toSet
      assert(urls == Set("clean"))
    } finally q.stop()
  }

  test("curate composes with dedupStream: gated then deduped in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val gated = StreamingDedup.curateStream(spark, in.toDS(), vocab, evalNg, n = 3,
      minQuality = 0.5, maxOovRate = 0.5)
    val q = StreamingDedup.dedupStream(gated.toDF())
      .writeStream.format("memory").queryName("curate_dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        page("c1", cleanText, 0),
        page("c2", cleanText.toUpperCase, 1), // exact dup after normalize
        page("bad", "one two three " + cleanText, 2)) // contaminated
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM curate_dedup_out").as[String].collect().toSet
      assert(urls.size == 1 && urls.subsetOf(Set("c1", "c2")))
    } finally q.stop()
  }

  test("hash sampling on a stream picks exactly the batch members (stateless)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val pages = (1 to 60).map(i => page(s"u$i", s"text $i", i))
    val in = MemoryStream[Page]
    val q = graft.sample.Sampling.stratifiedSample(in.toDS().toDF(), "lang",
      col("url"), Map("en" -> 0.5), 0.5)
      .writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(pages: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT url FROM sample_out").as[String].collect().toSet
      val batch = graft.sample.Sampling.stratifiedSample(pages.toDF(), "lang",
        col("url"), Map("en" -> 0.5), 0.5).select("url").as[String].collect().toSet
      assert(streamed == batch, "stream membership must equal batch membership")
      assert(batch.nonEmpty && batch.size < 60)
    } finally q.stop()
  }

  test("DSIR gate on a stream picks exactly the batch apply's members") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val B = 64
    val texts: Seq[(String, String)] =
      (1 to 6).map(i => s"t$i" -> s"the quick brown fox jumps over the lazy dog run $i") ++
        (1 to 9).map(i => s"s$i" -> s"click here buy now free offer limited deal winner prize $i") ++
        Seq("m1" -> "the quick brown fox jumps click here buy now free offer",
          "x1" -> "solo")
    val df = texts.toDF("url", "text")
    val fitDf = graft.sample.Dsir.fitDists(df, df.filter(col("url").startsWith("t")),
      "url", "text", B)
    val fit = fitDf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val batchW = graft.sample.Dsir.importanceWeights(df, fitDf, "url", "text", B)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // single-row mirror == distributed apply, doc by doc (incl. the drop)
    texts.foreach { case (u, t) =>
      assert(graft.sample.Dsir.weightPpmLocal(t, fit, B) == batchW.get(u), u)
    }
    val thr = 1000000L
    val want = batchW.filter(_._2 >= thr).keySet
    assert(want.nonEmpty && want != batchW.keySet, "threshold must split the corpus")
    val in = MemoryStream[Page]
    val q = StreamingDedup.dsirGateStream(spark, in.toDS(), fit, B, thr)
      .writeStream.format("memory").queryName("dsir_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(texts.zipWithIndex.map { case ((u, t), i) => page(u, t, i) }: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT url FROM dsir_gate_out").as[String].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("empty/whitespace/null text is all-OOV (batch Vocab parity) and drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Batch semantics first: Vocab.oovStats tokenizes "  " to [""], which
    // is OOV, so oov_rate is 1.0 — the stream gate must agree.
    val batchRate = graft.text.Vocab.oovStats(
      Seq((1L, "  ")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .select("oov_rate").as[Double].head()
    assert(batchRate == 1.0)
    val in = MemoryStream[Page]
    // minQuality very low so ONLY the OOV gate is exercised here
    val q = StreamingDedup.curateStream(spark, in.toDS(), vocab, evalNg, n = 3,
      minQuality = -1e9, maxOovRate = 0.99)
      .writeStream.format("memory").queryName("curate_empty_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        page("clean", cleanText, 0),
        page("blank", "   ", 1),
        page("nulltext", null, 2))
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM curate_empty_out").as[String].collect().toSet
      assert(urls == Set("clean"))
    } finally q.stop()
  }

  test("containsFlagged row form: boundaries, case, short docs") {
    import graft.text.Decontaminate.containsFlagged
    assert(containsFlagged("x ONE Two THREE y", evalNg, 3))
    assert(!containsFlagged("one two four three", evalNg, 3))
    assert(!containsFlagged("one two", evalNg, 3)) // shorter than n
    assert(!containsFlagged(null: String, evalNg, 3))
    assert(!containsFlagged("anything", Set.empty, 3))
  }

  test("streaming CMS state equals the batch sketch after each prefix of the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val q = StreamingDedup.streamingCms(in.toDF(), "text", d = 4, w = 64)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Complete).start()
    try {
      def stateNow(): Set[(Int, Long, Long)] = {
        q.processAllAvailable()
        spark.sql("SELECT r, bucket, cnt FROM cms_out")
          .as[(Int, Long, Long)].collect().toSet
      }
      def batchOf(pages: Seq[Page]): Set[(Int, Long, Long)] = {
        val toks = pages.toDF().select(
          org.apache.spark.sql.functions.explode(
            graft.text.Decontaminate.tokensCol(org.apache.spark.sql.functions.col("text"))).as("tok"))
        graft.sketch.Sketches.countMinSketch(toks, "tok", 4, 64)
          .as[(Int, Long, Long)].collect().toSet
      }
      val b1 = Seq(page("a", cleanText, 0), page("b", "alpha beta gamma alpha", 1))
      val b2 = Seq(page("c", "beta beta delta " + cleanText, 2))
      in.addData(b1: _*)
      assert(stateNow() == batchOf(b1), "state after batch 1 diverges")
      in.addData(b2: _*)
      assert(stateNow() == batchOf(b1 ++ b2), "merged state after batch 2 diverges")
    } finally q.stop()
  }
}
