package graft

import graft.cc.ConnectedComponents
import graft.pages.PagesSource.DetRng
import org.scalatest.funsuite.AnyFunSuite

/** Connected components vs a driver-side union-find oracle. */
class CCSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def unionFind(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) != x) parent(x) = find(parent(x))
      parent(x)
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = min member of the component
    val byRoot = verts.groupBy(find)
    byRoot.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }
  }

  test("CC matches union-find on random graphs of varying shape") {
    import spark.implicits._
    val rng = new DetRng(77)
    Seq(20, 150).foreach { n =>
      // random edges + a long path (worst case for naive propagation)
      val rand = (0 until n).map(_ => (s"v${rng.nextInt(n)}", s"v${rng.nextInt(n)}"))
        .filter(e => e._1 != e._2)
      val path = (0 until 30).map(i => (f"p${i}%03d", f"p${i + 1}%03d"))
      val edges = rand ++ path
      val expected = unionFind(edges)
      val df = edges.toDF("a", "b")
      val got = ConnectedComponents.run(spark, df).as[(String, String)].collect().toMap
      assert(got == expected, s"n=$n mismatch")
    }
  }

  test("CC matches union-find on a large random graph at full parallelism") {
    import spark.implicits._
    val rng = new DetRng(79)
    val n = 30000
    // sparse random graph (many components) + a 200-vertex path tail
    val rand = (0 until n).map(_ => (f"v${rng.nextInt(n)}%05d", f"v${rng.nextInt(n)}%05d"))
      .filter(e => e._1 != e._2)
    val path = (0 until 200).map(i => (f"p${i}%04d", f"p${i + 1}%04d"))
    val edges = rand ++ path
    val expected = unionFind(edges)
    val got = ConnectedComponents.run(spark, edges.toDF("a", "b").repartition(32))
      .as[(String, String)].collect().toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("CC is invariant under edge order and partition count") {
    import spark.implicits._
    val rng = new DetRng(78)
    val edges = (0 until 200).map(_ => (s"v${rng.nextInt(80)}", s"v${rng.nextInt(80)}"))
      .filter(e => e._1 != e._2)
    val a = ConnectedComponents.run(spark, edges.toDF("a", "b").repartition(1))
      .as[(String, String)].collect().toMap
    val b = ConnectedComponents.run(spark, edges.reverse.toDF("a", "b").repartition(13))
      .as[(String, String)].collect().toMap
    assert(a == b)
  }
}
