package graft

import graft.pages.PagesSource.DetRng
import graft.sig.{MinHashAggregator, MinHashSig}
import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** The typed-Aggregator MinHash union sketch: per-group signature equals
  * the plain signature of the group's element union, is invariant to
  * partitioning (merge correctness), and pairwise estimates track exact
  * Jaccard.
  */
class MinHashAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val numPerm = 64
  private val seed = 13L

  private def data: Seq[(String, Long)] = {
    val rng = new DetRng(55)
    // overlapping element universes per group (with duplicates)
    val base = (0 until 800).map(_ => rng.nextLong() % 500)
    val ga = base.take(600).map(("a", _))
    val gb = base.drop(300).map(("b", _))               // ~50% overlap with a
    val gc = (0 until 400).map(_ => ("c", rng.nextLong() % 500 + 10000))
    ga ++ gb ++ gc
  }

  test("grouped sketch == signature of the element union, partition-invariant") {
    import spark.implicits._
    val agg = F.udaf(new MinHashAggregator(numPerm, seed), Encoders.scalaLong)
    def sketches(parts: Int): Map[String, Seq[Long]] =
      data.toDF("g", "h").repartition(parts)
        .groupBy("g").agg(agg(F.col("h")).as("sig"))
        .as[(String, Seq[Long])].collect().toMap
    val s1 = sketches(1)
    val s17 = sketches(17)
    assert(s1 == s17, "sketch differs under repartitioning (merge broken)")
    val (as, bs) = MinHashSig.permutations(numPerm, seed)
    data.groupBy(_._1).foreach { case (g, rows) =>
      val union = rows.map(_._2).distinct.sorted.toArray
      val expected = MinHashSig.signature(union, as, bs).toSeq
      assert(s1(g) == expected, s"group $g sketch != union signature")
    }
  }

  test("pairwise sketch estimates track exact Jaccard of the element sets") {
    val (as, bs) = MinHashSig.permutations(numPerm, seed)
    val byG = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).toSet
    }
    val sig = byG.map { case (g, s) =>
      g -> MinHashSig.signature(s.toArray.sorted, as, bs)
    }
    def exact(a: Set[Long], b: Set[Long]) =
      a.intersect(b).size.toDouble / a.union(b).size
    val estAB = MinHashSig.estimate(sig("a"), sig("b"))
    val exAB = exact(byG("a"), byG("b"))
    assert(math.abs(estAB - exAB) < 0.2, f"a-b est $estAB%.3f vs exact $exAB%.3f")
    assert(exAB > 0.2, "fixture should overlap")
    val estAC = MinHashSig.estimate(sig("a"), sig("c"))
    assert(estAC < 0.1, f"disjoint groups estimated similar: $estAC%.3f")
  }
}
