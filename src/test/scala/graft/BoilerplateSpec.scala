package graft

import graft.model.Schemas._
import graft.plans.DedupPipeline
import graft.sig.{Boilerplate, Shingles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level boilerplate shingle suppression (the pair-density knob).
  *
  * Planted failure mode: every page shares a large template block
  * (navigation/footer), so WITHOUT suppression unrelated families exceed
  * the LSH threshold, flood the candidate stage, and — because both the
  * shingle-Jaccard and the token-weight SimHash are template-dominated —
  * get labeled DUPLICATE, collapsing the corpus into one mega-cluster.
  * WITH suppression the template shingles are removed before signatures,
  * cross-family candidates vanish at the SOURCE, and within-family
  * near-dup recall is untouched.
  */
class BoilerplateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val NFam = 20
  private val Members = 3

  /** template (300 tokens, shared by all docs) + per-family core (40
    * tokens) + per-member tail edit (near variants within a family).
    */
  private def corpus(): Seq[Page] = {
    val template = (0 until 300).map(i => s"tmplword$i").mkString(" ")
    for {
      f <- 0 until NFam
      m <- 0 until Members
    } yield {
      val core = (0 until 40).map(i => s"fam${f}core$i").mkString(" ")
      val edit = if (m == 0) "" else s" extraf${f}m$m tail$m"
      Page(s"https://t.example/f$f/m$m",
        new java.sql.Timestamp(1700000000000L + (f * 10L + m) * 1000L),
        Array.emptyByteArray, s"$template $core$edit", "en")
    }
  }

  private val conf = DedupConfig.balanced.copy(boilerplateMaxDfFrac = Some(0.3))

  private def runPipeline(pages: Seq[Page], c: DedupConfig, tag: String): String = {
    import spark.implicits._
    val dir = s"/tmp/graft_test_boiler_$tag"
    TestUtil.deleteRecursively(new java.io.File(dir))
    DedupPipeline.run(spark, spark.createDataset(pages), dir, c, resume = false)
    dir
  }

  test("signDoc shingles == Shingles.ofNormText (single source of truth)") {
    val d = DedupPipeline.normalizeDoc("u", "Some tested text with a few shared tokens here", "en")
    val (as, bs) = graft.sig.MinHashSig.permutations(DedupConfig.balanced.numPerm, DedupConfig.balanced.seed)
    val sig = DedupPipeline.signDoc(d, DedupConfig.balanced, as, bs)
    assert(sig.shingles.sameElements(Shingles.ofNormText(d.norm_text, DedupConfig.balanced)))
  }

  test("suppress == filterNot, preserves order, empty-hot is identity") {
    val sh = Array(-9L, -2L, 0L, 3L, 7L, 11L, 42L)
    val hot = Array(-2L, 7L, 100L)
    assert(Boilerplate.suppress(sh, hot).sameElements(sh.filterNot(hot.contains)))
    assert(Boilerplate.suppress(sh, Array.emptyLongArray) eq sh)
  }

  test("dfThreshold is decimal-exact at integer boundaries") {
    // double math: 0.05 * 1200 = 60.000000000000004 -> ceil 61 (wrong);
    // decimal math (and DuckDB's DECIMAL literal): exactly 60
    assert(Boilerplate.dfThreshold(0.05, 1200L, 2) == 60L)
    assert(Boilerplate.dfThreshold(0.05, 1201L, 2) == 61L)
    assert(Boilerplate.dfThreshold(0.3, 60L, 2) == 18L)
    assert(Boilerplate.dfThreshold(0.000001, 10L, 2) == 2L) // minDf floor
  }

  test("hot set == brute-force df>thr, partition-invariant, sample catches template") {
    import spark.implicits._
    val pages = corpus()
    val norm = pages.map(p => DedupPipeline.normalizeDoc(p.url, p.text, p.lang))
    // brute force df over the same chain
    val df = scala.collection.mutable.Map.empty[Long, Int]
    norm.foreach(d => Shingles.ofNormText(d.norm_text, conf).foreach(h =>
      df.update(h, df.getOrElse(h, 0) + 1)))
    val thr = Boilerplate.dfThreshold(0.3, norm.size.toLong, conf.boilerplateMinDf)
    val expected = df.collect { case (h, c) if c > thr => h }.toArray.sorted

    val ds1 = spark.createDataset(norm).repartition(1)
    val ds7 = spark.createDataset(norm).repartition(7)
    val hot1 = Boilerplate.hotShingles(spark, ds1, conf)
    val hot7 = Boilerplate.hotShingles(spark, ds7, conf)
    assert(hot1.sameElements(expected), s"hot=${hot1.length} expected=${expected.length}")
    assert(hot7.sameElements(expected))

    // template-only shingles (present in EVERY doc) are all hot
    val templateSh = Shingles.ofNormText(
      DedupPipeline.normalizeDoc("t", (0 until 300).map(i => s"tmplword$i").mkString(" "), "en").norm_text, conf)
    assert(templateSh.forall(h => java.util.Arrays.binarySearch(hot1, h) >= 0))

    // 1-in-2 url-hash sample still catches template shingles (df = whole sample)
    val hotSampled = Boilerplate.hotShingles(spark, ds7,
      conf.copy(boilerplateSampleOneIn = 2))
    assert(templateSh.forall(h => java.util.Arrays.binarySearch(hotSampled, h) >= 0))
  }

  test("suppression kills the cross-family mega-cluster and keeps family recall") {
    import spark.implicits._
    val pages = corpus()

    val dirOff = runPipeline(pages, DedupConfig.balanced, "off")
    val dirOn = runPipeline(pages, conf, "on")

    val candOff = spark.read.parquet(s"$dirOff/05_cand").count()
    val candOn = spark.read.parquet(s"$dirOn/05_cand").count()
    def fam(u: String): String = u.split("/")(3)
    val crossOff = spark.read.parquet(s"$dirOff/05_cand")
      .as[(String, String)].collect().count { case (a, b) => fam(a) != fam(b) }
    val crossOn = spark.read.parquet(s"$dirOn/05_cand")
      .as[(String, String)].collect().count { case (a, b) => fam(a) != fam(b) }

    // without the knob the template floods candidates across families...
    assert(crossOff > 0, "planted corpus should produce cross-family candidates without suppression")
    // ...and the template-dominated learners label them DUPLICATE (the
    // failure mode): at least one cluster spans families
    val maxOff = spark.read.parquet(s"$dirOff/07_clusters").agg(max($"cluster_size")).first().getLong(0)
    assert(maxOff > Members, s"expected a cross-family mega-cluster without suppression, max size $maxOff")

    // with the knob: no cross-family candidates at all, far fewer pairs
    assert(crossOn == 0, s"$crossOn cross-family candidates survived suppression")
    assert(candOn < candOff, s"candidates should shrink: on=$candOn off=$candOff")

    // recall: every within-family pair is DUPLICATE and clusters = exactly
    // the families
    val clustersOn = spark.read.parquet(s"$dirOn/07_clusters")
      .as[(String, String, Long)].collect()
    assert(clustersOn.length == NFam * Members, "every doc should be clustered")
    val byCluster = clustersOn.groupBy(_._2)
    assert(byCluster.size == NFam)
    byCluster.values.foreach { ms =>
      assert(ms.length == Members)
      assert(ms.map(m => fam(m._1)).distinct.length == 1, "cluster spans families")
    }

    // the hot set was persisted next to 03_sig
    assert(new java.io.File(s"$dirOn/03_hot/_SUCCESS").exists())
  }

  test("incremental ingest signs new batches with the frozen hot set") {
    import spark.implicits._
    val pages = corpus()
    val dirOn = runPipeline(pages, conf, "inc_base")
    val newPage = Page("https://t.example/f0/m9",
      new java.sql.Timestamp(1700009000000L), Array.emptyByteArray,
      (0 until 300).map(i => s"tmplword$i").mkString(" ") + " " +
        (0 until 40).map(i => s"fam0core$i").mkString(" ") + " extraf0m9 tail9", "en")
    graft.plans.IncrementalDedup.ingest(spark, dirOn,
      spark.createDataset(Seq(newPage)), dirOn, conf, resume = false)

    // the new page's signature contains no hot shingle (frozen vocabulary)
    val hot = spark.read.parquet(s"$dirOn/03_hot").as[Long].collect().sorted
    val newSh = spark.read.parquet(s"$dirOn/inc_03_sig")
      .filter($"url" === newPage.url).select($"shingles").as[Array[Long]].first()
    assert(newSh.nonEmpty)
    assert(newSh.forall(h => java.util.Arrays.binarySearch(hot, h) < 0))

    // and it attaches to family 0's cluster, not a template mega-cluster
    val assign = spark.read.parquet(s"$dirOn/inc_07_assign")
      .filter($"url" === newPage.url).select($"cluster_id").as[String].collect()
    assert(assign.length == 1 && assign.head == "https://t.example/f0/m0",
      s"new page attached to ${assign.mkString(",")}")
  }
}
