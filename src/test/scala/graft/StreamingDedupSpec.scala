package graft

import graft.model.Schemas.Page
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured-Streaming ingest dedup driven through MemoryStream: exact
  * duplicates (same normalized content) across micro-batches are emitted
  * once; the windowed histogram aggregates with a watermark.
  */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def page(url: String, text: String, minute: Int, lang: String = "en") =
    Page(url, new Timestamp(1704067200000L + minute * 60000L), Array.emptyByteArray, text, lang)

  test("dedupStream emits the first occurrence per content hash across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val q = StreamingDedup.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        page("u1", "alpha bravo charlie", 0),
        page("u2", "ALPHA   bravo charlie", 1), // exact dup after normalize
        page("u3", "different text entirely", 2))
      q.processAllAvailable()
      in.addData(
        page("u4", "alpha bravo charlie", 3), // dup from a later batch
        page("u5", "brand new content", 4))
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM dedup_out").as[String].collect().toSet
      assert(urls.contains("u3") && urls.contains("u5"))
      // exactly one of the three alpha-bravo-charlie variants survived
      assert(urls.intersect(Set("u1", "u2", "u4")).size == 1)
      assert(urls.size == 3)
    } finally q.stop()
  }

  test("dedupStreamStateful keeps one page per hash with keyed state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val q = StreamingDedup.dedupStreamStateful(spark, in.toDS(), stateTimeout = None)
      .writeStream.format("memory").queryName("dedup_state_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(page("a1", "one two three", 0), page("a2", "one  TWO three", 1))
      q.processAllAvailable()
      in.addData(page("a3", "one two three", 2), page("a4", "four five six", 3))
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM dedup_state_out").as[String].collect().toSet
      assert(urls.intersect(Set("a1", "a2", "a3")).size == 1)
      assert(urls.contains("a4"))
    } finally q.stop()
  }

  test("nearDupCandidates: LSH-bucket collisions across batches, unrelated pages never pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two near-duplicate long docs (small token edit) + one unrelated doc,
    // arriving in different micro-batches
    val rng = new graft.pages.PagesSource.DetRng(99)
    val base = (0 until 200).map(_ => s"w${rng.nextInt(400)}").mkString(" ")
    val near = base.split(' ').zipWithIndex
      .map { case (w, i) => if (i % 25 == 7) "edited" else w }.mkString(" ")
    val other = (0 until 200).map(_ => s"z${rng.nextInt(400) + 1000}").mkString(" ")
    val in = MemoryStream[graft.model.Schemas.Page]
    val q = StreamingDedup.nearDupCandidates(spark, in.toDS(), stateTimeout = None)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("near_cand_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(page("n1", base, 0), page("n3", other, 1))
      q.processAllAvailable()
      in.addData(page("n2", near, 2))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT a, b FROM near_cand_out")
        .as[(String, String)].collect().toSet
      assert(pairs.contains(("n1", "n2")), s"near-dup pair not surfaced: $pairs")
      assert(!pairs.exists(p => p._1 == "n3" || p._2 == "n3"),
        s"unrelated page paired: $pairs")
    } finally q.stop()
  }

  test("nearDupCandidates bucket cap bounds within-batch pair emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new graft.pages.PagesSource.DetRng(7)
    val base = (0 until 150).map(_ => s"c${rng.nextInt(300)}").mkString(" ")
    val in = MemoryStream[graft.model.Schemas.Page]
    val q = StreamingDedup.nearDupCandidates(spark, in.toDS(), maxBucketUrls = 2,
      stateTimeout = None)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("near_cap_out")
      .outputMode(OutputMode.Append).start()
    try {
      // 4 exact near-dups in ONE batch: with cap 2 only one pair per
      // bucket can emit — never the full 6-pair clique
      in.addData((1 to 4).map(i => page(s"c$i", base, i)): _*)
      q.processAllAvailable()
      val pairs = spark.sql("SELECT a, b FROM near_cap_out")
        .as[(String, String)].collect().toSet
      assert(pairs.nonEmpty, "cap 2 should still admit one pair")
      assert(pairs.size < 6, s"mega-bucket clique not truncated: $pairs")
    } finally q.stop()
  }

  test("streaming under suppression uses the frozen hot set: batch superset, no template pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // template-heavy corpus (BoilerplateSpec's failure mode): the stream
    // must sign with the BATCH-derived hot set — same frozen-vocabulary
    // contract as IncrementalDedup — and refuse to run without it.
    val template = (0 until 300).map(i => s"tmplword$i").mkString(" ")
    val pageList = for { f <- 0 until 15; m <- 0 until 3 } yield {
      val core = (0 until 40).map(i => s"fam${f}core$i").mkString(" ")
      val edit = if (m == 0) "" else s" extraf${f}m$m tail$m"
      page(s"https://t.example/f$f/m$m", s"$template $core$edit", f * 10 + m)
    }
    val conf = graft.DedupConfig.balanced.copy(boilerplateMaxDfFrac = Some(0.3))
    val pages = spark.createDataset(pageList)
    val norm = graft.plans.DedupPipeline.normalizeStage(spark, pages)
    val hot = graft.sig.Boilerplate.hotShingles(spark, norm, conf)
    assert(hot.nonEmpty, "template corpus should yield a hot set")
    val sigs = graft.plans.DedupPipeline.signatureStage(spark, norm, conf, hot)
    val bands = graft.plans.DedupPipeline.bandingStage(spark, sigs, conf)
    val (cands, _) = graft.plans.DedupPipeline.candidateStage(spark, bands, conf)
    val batchPairs = cands.as[(String, String)].collect().toSet
    assert(batchPairs.nonEmpty)

    intercept[IllegalArgumentException] {
      StreamingDedup.nearDupCandidates(spark, pages, conf, stateTimeout = None)
    }

    val in = MemoryStream[Page]
    val q = StreamingDedup.nearDupCandidates(spark, in.toDS(), conf,
        maxBucketUrls = 4096, stateTimeout = None, hotShingles = hot)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("near_boiler_out")
      .outputMode(OutputMode.Append).start()
    try {
      pageList.grouped(20).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamPairs = spark.sql("SELECT a, b FROM near_boiler_out")
        .as[(String, String)].collect().toSet
      val missing = batchPairs -- streamPairs
      assert(missing.isEmpty,
        s"${missing.size} of ${batchPairs.size} suppressed batch pairs missing from the stream")
      def fam(u: String) = u.split("/")(3)
      assert(streamPairs.forall { case (a, b) => fam(a) == fam(b) },
        s"suppressed stream emitted cross-family template pairs: ${streamPairs.filter(p => fam(p._1) != fam(p._2)).take(3)}")
    } finally q.stop()
  }

  test("streaming near-dup candidates are a superset of the batch pipeline's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same config, same signatures => same LSH buckets: every batch
    // candidate pair must also be emitted by the stream (at-least-once
    // semantics; the stream additionally pairs exact-dup members the batch
    // path routes through the rep map instead)
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, nFamilies = 30, membersPerFamily = 4)
    val pageList = pages.collect().toSeq
    val conf = graft.DedupConfig.balanced
    val norm = graft.plans.DedupPipeline.normalizeStage(spark, pages)
    val sigs = graft.plans.DedupPipeline.signatureStage(spark, norm, conf)
    val bands = graft.plans.DedupPipeline.bandingStage(spark, sigs, conf)
    val (cands, _) = graft.plans.DedupPipeline.candidateStage(spark, bands, conf)
    val batchPairs = cands.as[(String, String)].collect().toSet

    val in = MemoryStream[Page]
    val q = StreamingDedup.nearDupCandidates(spark, in.toDS(),
        maxBucketUrls = 4096, stateTimeout = None)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("near_superset_out")
      .outputMode(OutputMode.Append).start()
    try {
      pageList.grouped(40).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamPairs = spark.sql("SELECT a, b FROM near_superset_out")
        .as[(String, String)].collect().toSet
      val missing = batchPairs -- streamPairs
      assert(batchPairs.nonEmpty, "batch produced no candidate pairs — test corpus too sparse")
      assert(missing.isEmpty,
        s"${missing.size} of ${batchPairs.size} batch pairs missing from the stream: ${missing.take(5)}")
    } finally q.stop()
  }

  test("windowedLangHistogram aggregates per (window, lang) under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Page]
    val q = StreamingDedup.windowedLangHistogram(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("lang_hist_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        page("w1", "x", 0), page("w2", "y", 1), page("w3", "z", 2, lang = "de"),
        page("w4", "q", 11))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      in.addData(page("w5", "r", 40))
      q.processAllAvailable()
      val rows = spark.sql("SELECT lang, cnt FROM lang_hist_out")
        .as[(String, Long)].collect().toSet
      assert(rows.contains(("en", 2L))) // w1+w2 in the first 10-min window
      assert(rows.contains(("de", 1L)))
    } finally q.stop()
  }
}
