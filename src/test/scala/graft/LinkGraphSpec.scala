package graft

import graft.graph.LinkGraph
import graft.model.Schemas.Page
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Link-graph operators: outlink extraction, host-graph aggregation, and
  * fixed-point PageRank. The rank test recomputes the exact integer
  * recurrence in plain Scala — same role as the DuckDB oracle, in-process.
  */
class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def page(url: String, html: String) =
    Page(url, new Timestamp(0L), html.getBytes("UTF-8"), "t", "en")

  /** Scala reference of LinkGraph.hostRank's recurrence (single-threaded,
    * insertion-ordered — order must not matter because all ops are exact).
    */
  private def refRank(edges: Seq[(String, String, Long)], iters: Int,
                      scale: Long): Map[String, Long] = {
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = hosts.size.toLong
    val outW = edges.groupBy(_._1).map { case (h, es) => h -> es.map(_._3).sum }
    val base = (scale * 15L) / (100L * n)
    var rank = hosts.map(h => h -> scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (g, es) =>
        g -> es.map { case (h, _, w) => (rank(h) * w) / outW(h) }.sum
      }
      val dang = hosts.filterNot(outW.contains).map(rank).sum
      rank = hosts.map { h =>
        h -> (base + ((inflow.getOrElse(h, 0L) + dang / n) * 85L) / 100L)
      }.toMap
    }
    rank
  }

  test("outlinks extracts absolute anchors; hostGraph canonicalizes hosts") {
    import spark.implicits._
    val pages = Seq(
      page("https://a.example/p1",
        """<html><a href="https://b.example/x">b</a> <a href="https://WWW.B.example/y">b2</a></html>"""),
      page("https://a.example/p2",
        """<a href="http://c.example/">c</a> plain text no links after""")).toDS()
    val links = LinkGraph.outlinks(pages.toDF())
      .as[(String, String)].collect().sorted
    assert(links.toSeq == Seq(
      ("https://a.example/p1", "https://WWW.B.example/y"),
      ("https://a.example/p1", "https://b.example/x"),
      ("https://a.example/p2", "http://c.example/")))
    val hg = LinkGraph.hostGraph(LinkGraph.outlinks(pages.toDF()))
      .as[(String, String, Long)].collect().sorted
    // www./case variants collapse onto one host edge with weight 2
    assert(hg.toSeq == Seq(
      ("a.example", "b.example", 2L),
      ("a.example", "c.example", 1L)))
  }

  test("hostRank matches the exact Scala recurrence, incl. a dangling host") {
    import spark.implicits._
    // c is dangling (no out-edges); a is the hub
    val edges = Seq(
      ("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L), ("b", "c", 3L))
    val df = edges.toDF("src_host", "dst_host", "n_links")
    val got = LinkGraph.hostRank(df, iters = 10)
      .as[(String, Long)].collect().toMap
    val want = refRank(edges, iters = 10, scale = 1000000000000L)
    assert(got == want)
    // dangling host keeps non-base mass via redistribution: c's rank must
    // exceed the pure teleport floor
    assert(want("c") > (1000000000000L * 15L) / (100L * 3L))
  }

  test("hostRank is exactly partition-invariant (integer arithmetic)") {
    import spark.implicits._
    val edges = (0 until 40).map { i =>
      (s"h${i % 8}", s"h${(i * 3 + 1) % 8}", (i % 5 + 1).toLong)
    }
    val df = edges.toDF("src_host", "dst_host", "n_links")
    val r1 = LinkGraph.hostRank(df.repartition(1), iters = 10)
      .as[(String, Long)].collect().toMap
    val r32 = LinkGraph.hostRank(df.repartition(32), iters = 10)
      .as[(String, Long)].collect().toMap
    assert(r1 == r32)
    assert(r1 == refRank(edges, 10, 1000000000000L))
  }

  test("anchors extracts (src, dst, anchor); profile aggregates per canonical host") {
    import spark.implicits._
    val pages = Seq(
      page("https://a.example/p1",
        """<a href="https://b.example/x" class="nav">go b</a> <a href="https://WWW.B.example/y">go b</a>"""),
      page("https://a.example/p2",
        """<a href="http://c.example/"></a> <a href="/relative">skip</a> text""")).toDS()
    val got = LinkGraph.anchors(pages.toDF())
      .as[(String, String, String)].collect().sorted
    assert(got.toSeq == Seq(
      ("https://a.example/p1", "https://WWW.B.example/y", "go b"),
      ("https://a.example/p1", "https://b.example/x", "go b"),
      ("https://a.example/p2", "http://c.example/", "")))
    val prof = LinkGraph.hostAnchorProfile(LinkGraph.anchors(pages.toDF()))
      .as[(String, String, Long)].collect().sorted
    // www./case variants collapse; same anchor text sums
    assert(prof.toSeq == Seq(
      ("b.example", "go b", 2L),
      ("c.example", "", 1L)))
  }

  /** Scala mirror of sample/Sampling.hashU (60-bit md5-prefix uniform). */
  private def refHashU(key: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0d
  }

  test("rankGatedSample keeps exactly top-K-host pages passing the hash gate") {
    import spark.implicits._
    // ring a->b->c->a plus a hub: every host links d, d links nothing out
    val html = Map(
      "a" -> """<a href="https://b.example/">b</a> <a href="https://d.example/">d</a>""",
      "b" -> """<a href="https://c.example/">c</a> <a href="https://d.example/">d</a>""",
      "c" -> """<a href="https://a.example/">a</a> <a href="https://d.example/">d</a>""",
      "d" -> "no links")
    val pages = (for {
      h <- Seq("a", "b", "c", "d"); i <- 0 until 8
    } yield page(s"https://$h.example/doc/$i", html(h))).toDS().toDF()
    val ranks = LinkGraph.hostRank(LinkGraph.hostGraph(LinkGraph.outlinks(pages)))
    val rankMap = ranks.as[(String, Long)].collect().toMap
    // d receives from all three, so it is the unique top-1 host
    assert(rankMap("d.example") > rankMap.removed("d.example").values.max)
    val got = LinkGraph.rankGatedSample(pages, ranks, topK = 1, rate = 0.5)
      .as[(String, String, Long)].collect().toSeq.sorted
    val want = (0 until 8).map(i => s"https://d.example/doc/$i")
      .filter(u => refHashU(u) < 0.5)
      .map(u => (u, "d.example", rankMap("d.example")))
    assert(want.nonEmpty && want.size < 8) // the gate actually splits
    assert(got == want)
    // deterministic under repartitioning
    val got32 = LinkGraph.rankGatedSample(pages.repartition(32), ranks, 1, 0.5)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(got32 == got)
  }

  test("rank mass is approximately conserved (floors only leak downward)") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val total = LinkGraph.hostRank(edges.toDF("src_host", "dst_host", "n_links"), iters = 10)
      .agg(sum("rank")).head().getLong(0)
    val s = 1000000000000L
    assert(total <= s && total > s - s / 100) // ≥99% of the unit mass
  }
}
