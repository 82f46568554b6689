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

  test("rank mass is approximately conserved (floors only leak downward)") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val total = LinkGraph.hostRank(edges.toDF("src_host", "dst_host", "n_links"), iters = 10)
      .agg(sum("rank")).head().getLong(0)
    val s = 1000000000000L
    assert(total <= s && total > s - s / 100) // ≥99% of the unit mass
  }
}
