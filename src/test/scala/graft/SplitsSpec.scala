package graft

import graft.sample.{Sampling, Splits}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leakage-safe split assignment (sample/Splits): cluster-keyed splits
  * co-locate near-dup components (zero cross-split dup pairs BY
  * CONSTRUCTION, not by luck), the url-keyed counterfactual leaks, the
  * fractions land within binomial noise, and assignment is deterministic.
  */
class SplitsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 3000 singletons + 200 clusters of 3 (urls c<k>m<j> share cluster c<k>)
  private def corpus() = {
    import spark.implicits._
    val singles = (1 to 3000).map(i => s"https://s.example/$i")
    val members = for { k <- 1 to 200; j <- 1 to 3 } yield (s"https://c.example/$k/$j", s"cl_$k")
    val docs = (singles ++ members.map(_._1)).toDF("url")
    val clusters = members.toDF("url", "cluster_id")
    (docs, clusters)
  }

  test("cluster members share a split; fractions within binomial noise") {
    val (docs, clusters) = corpus()
    val a = Splits.assign(docs, clusters).cache()
    try {
      // every cluster maps to exactly one split
      val perCluster = a.filter(col("split_key").startsWith("cl_"))
        .groupBy("split_key").agg(countDistinct("split").as("d"))
      assert(perCluster.filter(col("d") =!= 1).count() == 0)
      val bySplit = a.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = 3600.0
      assert(math.abs(bySplit("train") / total - 0.9) < 0.03, bySplit.toString)
      assert(math.abs(bySplit.getOrElse("valid", 0L) / total - 0.05) < 0.03)
      assert(math.abs(bySplit.getOrElse("test", 0L) / total - 0.05) < 0.03)
    } finally { a.unpersist(): Unit }
  }

  test("cluster-keyed leakage is zero; url-keyed counterfactual leaks") {
    import spark.implicits._
    val (docs, clusters) = corpus()
    // dup pairs = all intra-cluster pairs (the verdicts a dedup run emits)
    val dups = (for { k <- 1 to 200; i <- 1 to 3; j <- (i + 1) to 3 }
      yield (s"https://c.example/$k/$i", s"https://c.example/$k/$j"))
      .toDF("a", "b")
    val byCluster = Splits.leakage(dups, Splits.assign(docs, clusters))
      .collect().head
    assert(byCluster.getLong(0) == 600L && byCluster.getLong(1) == 0L,
      s"cluster-keyed: ${byCluster.mkString(",")}")
    val byUrl = Splits.leakage(dups, Splits.assign(docs, clusters.limit(0)))
      .collect().head
    // url-keyed: each pair crosses with prob ~2*0.9*0.1+0.05*... ~ 0.185;
    // 600 pairs -> expect ~111 crossings, require strictly positive and
    // sane (the property under test is "naive splits leak")
    assert(byUrl.getLong(0) == 600L)
    assert(byUrl.getLong(1) > 30L && byUrl.getLong(1) < 300L,
      s"url-keyed crossings: ${byUrl.getLong(1)}")
  }

  test("assignment is deterministic and fraction-monotone") {
    val (docs, clusters) = corpus()
    val s1 = Splits.assign(docs, clusters).collect().map(r => (r.getString(0), r.getString(2))).toMap
    val s2 = Splits.assign(docs, clusters).collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(s1 == s2)
    // growing trainFrac only moves docs INTO train (nested-boundary
    // property — re-splitting a grown corpus config never churns splits)
    val wide = Splits.assign(docs, clusters, trainFrac = 0.95, validFrac = 0.025)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(s1.collect { case (u, "train") => u }.forall(u => wide(u) == "train"))
  }

  test("hashU agreement: split boundary uses the shared md5 uniform") {
    import spark.implicits._
    val (docs, clusters) = corpus()
    val a = Splits.assign(docs, clusters)
      .withColumn("u", Sampling.hashU(col("split_key")))
      .select("split", "u").as[(String, Double)].collect()
    a.foreach { case (s, u) =>
      val want = if (u < 0.9) "train" else if (u < 0.95) "valid" else "test"
      assert(s == want, s"u=$u split=$s")
    }
  }
}
