package graft

import graft.plans.Curate
import org.scalatest.funsuite.AnyFunSuite

/** Curation emission (plans/Curate.keepBest): per-cluster argmax by
  * (n_tokens desc, url asc), unclustered passthrough, and exactly one kept
  * row per cluster regardless of partitioning.
  */
class CurateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("keepBest keeps the longest member per cluster, url-asc on ties") {
    import spark.implicits._
    val clusters = Seq(
      ("u1", "c1", 3L), ("u2", "c1", 3L), ("u3", "c1", 3L),
      ("u4", "c2", 2L), ("u5", "c2", 2L)).toDF("url", "cluster_id", "cluster_size")
    val norm = Seq(
      ("u1", 10), ("u2", 40), ("u3", 40), // c1: tie at 40 -> u2 (url asc)
      ("u4", 7), ("u5", 7),               // c2: tie at 7 -> u4
      ("u6", 99), ("u7", 1)               // unclustered
    ).toDF("url", "n_tokens")

    val got = Curate.keepBest(clusters, norm)
      .as[(String, Option[String], Long, Int)].collect().sortBy(_._1)

    assert(got.toSeq == Seq(
      ("u2", Some("c1"), 3L, 40),
      ("u4", Some("c2"), 2L, 7),
      ("u6", None, 1L, 99),
      ("u7", None, 1L, 1)))
  }

  test("keepBest is partition-invariant and keeps exactly one row per cluster") {
    import spark.implicits._
    val rng = new graft.pages.PagesSource.DetRng(11L)
    val rows = (0 until 500).map { i =>
      val c = s"c${i % 37}"
      (s"u$i", c, (500 / 37).toLong)
    }
    val norm = (0 until 500).map(i => (s"u$i", rng.nextInt(1000)))
    for (parts <- Seq(1, 7)) {
      val cl = rows.toDF("url", "cluster_id", "cluster_size").repartition(parts)
      val n = norm.toDF("url", "n_tokens").repartition(parts)
      val got = Curate.keepBest(cl, n)
        .as[(String, Option[String], Long, Int)].collect()
      assert(got.length == 37, s"expected 37 kept rows, got ${got.length}")
      val expected = norm.groupBy(x => x._1.drop(1).toInt % 37).map { case (c, ms) =>
        s"c$c" -> ms.minBy(m => (-m._2, m._1))._1
      }
      got.foreach { case (url, cid, _, _) =>
        assert(expected(cid.get) == url, s"wrong rep for ${cid.get}: $url")
      }
    }
  }
}
