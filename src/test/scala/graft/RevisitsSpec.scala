package graft

import graft.model.Schemas.Page
import graft.pages.Revisits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Crawl-snapshot revisit handling (pages/Revisits): the derived refetch
  * batch, keep-newest-per-URL survivor selection, and per-URL revision
  * stats. Survivorship is checked against a hand-computed expectation on a
  * planted multi-fetch log — same role as the DuckDB oracle, in-process.
  */
class RevisitsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def page(url: String, ts: Long, text: String) =
    Page(url, new Timestamp(ts * 1000L),
      s"<html><body>$text</body></html>".getBytes("UTF-8"), text, "en")

  private def toDF(ps: Seq[Page]) = {
    import spark.implicits._
    ps.toDS().toDF()
  }

  test("withRefetches adds one fetch per sampled URL, +1 day, half changed") {
    val base = toDF((1 to 400).map(i => page(s"https://ex.com/$i", 1000L + i, s"text $i")))
    val out = Revisits.withRefetches(base, 0.3).cache()
    try {
      val n = out.count()
      // binomial around 400*1.3 = 520, sd ~ sqrt(400*.3*.7) ~ 9.2; 5 sd
      assert(math.abs(n - 520L) < 46, s"total fetches $n")
      // every refetched URL appears exactly twice, second fetch exactly +1 day
      val gaps = out.groupBy("url")
        .agg(count(lit(1)).as("c"),
          (max(col("warc_ts").cast("long")) - min(col("warc_ts").cast("long"))).as("gap"))
        .filter(col("c") > 1)
      assert(gaps.filter(col("c") =!= 2).count() == 0)
      assert(gaps.filter(col("gap") =!= 86400L).count() == 0)
      // changed fraction of refetches is ~half (u < rate/2 given u < rate)
      val changed = Revisits.urlRevisionStats(out).filter(col("changed")).count()
      val refetched = gaps.count()
      assert(math.abs(changed.toDouble / refetched - 0.5) < 0.25,
        s"$changed changed of $refetched refetched")
    } finally { out.unpersist(): Unit }
  }

  test("keepLatestFetch keeps exactly the newest fetch per URL") {
    val log = toDF(Seq(
      page("https://a/1", 100L, "old"), page("https://a/1", 200L, "new"),
      page("https://a/2", 300L, "only"),
      page("https://a/3", 400L, "v1"), page("https://a/3", 500L, "v2"),
      page("https://a/3", 450L, "mid")))
    val kept = Revisits.keepLatestFetch(log)
      .select(col("url"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kept == Map("https://a/1" -> "new", "https://a/2" -> "only",
      "https://a/3" -> "v2"))
  }

  test("timestamp tie broken deterministically by md5(text) desc") {
    val log = toDF(Seq(
      page("https://t/1", 100L, "alpha"), page("https://t/1", 100L, "beta")))
    val md5a = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val md5b = java.security.MessageDigest.getInstance("MD5")
      .digest("beta".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = if (md5a > md5b) "alpha" else "beta"
    val got = Revisits.keepLatestFetch(log).select("text").collect().map(_.getString(0))
    assert(got.toSeq == Seq(want))
  }

  test("urlRevisionStats: identical refetch is not 'changed', drifted is") {
    val log = toDF(Seq(
      page("https://s/same", 100L, "x"), page("https://s/same", 200L, "x"),
      page("https://s/drift", 100L, "x"), page("https://s/drift", 200L, "y")))
    val rows = Revisits.urlRevisionStats(log)
      .select("url", "n_fetches", "n_versions", "changed").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows("https://s/same") == ((2L, 1L, false)))
    assert(rows("https://s/drift") == ((2L, 2L, true)))
  }
}
