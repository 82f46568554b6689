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

  test("dictionary-encoded loop is bit-identical to the direct loop") {
    import spark.implicits._
    // the r06 size gate keeps small graphs on the direct path; pin BOTH
    // paths explicitly on the same input (random + path + planted cliques)
    // and require exact agreement with each other and the union-find
    val rng = new DetRng(81)
    val rand = (0 until 400).map(_ => (s"v${rng.nextInt(120)}", s"v${rng.nextInt(120)}"))
      .filter(e => e._1 != e._2)
    val path = (0 until 40).map(i => (f"p${i}%03d", f"p${i + 1}%03d"))
    val clique = for (i <- 0 until 8; j <- (i + 1) until 8) yield (s"c$i", s"c$j")
    val edges = rand ++ path ++ clique
    val expected = unionFind(edges)
    val direct = ConnectedComponents.run(spark, edges.toDF("a", "b"),
        forceIdEncoding = Some(false)).as[(String, String)].collect().toMap
    val encoded = ConnectedComponents.run(spark, edges.toDF("a", "b"),
        forceIdEncoding = Some(true)).as[(String, String)].collect().toMap
    assert(direct == expected)
    assert(encoded == expected)
  }

  test("dictionary-encoded loop handles numeric vertex keys") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L + 0L), (7L, 8L), (8L, 9L))
      .filter(e => e._1 != e._2)
    val got = ConnectedComponents.run(spark, edges.toDF("a", "b"),
        forceIdEncoding = Some(true)).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
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
