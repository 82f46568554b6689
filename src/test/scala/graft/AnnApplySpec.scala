package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF/KMeans fit-apply split (ann.Ann): the composed ivfTopK must be
  * exactly fit + apply, and the deterministic assignment must match a
  * driver-side argmin and be partitioning-invariant.
  */
class AnnApplySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import graft.ann.Ann

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ivfTopK == ivfFit + ivfApply composition") {
    import spark.implicits._
    val e = emb
    val q = e.filter($"vec_id" < 10)
    val direct = Ann.ivfTopK(spark, e, q, k = 5, nlist = 8, nprobe = 3, seed = 7L)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val (cent, asg) = Ann.ivfFit(spark, e, nlist = 8, seed = 7L)
    val split = Ann.ivfApply(spark, e, asg, cent, q, k = 5, nprobe = 3)
      .select($"query_id", $"nbr_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(direct == split)
    assert(direct.nonEmpty)
  }

  test("assignToCentroids matches driver-side argmin and is partition-invariant") {
    import spark.implicits._
    val e = emb
    val (cent, _) = Ann.ivfFit(spark, e, nlist = 8, seed = 42L)
    val centLocal = cent.select($"list_id".as[Int], $"centroid".as[Array[Double]])
      .collect().sortBy(_._1)
    val expected = e.select($"vec_id".as[Long], $"embedding".as[Array[Float]]).collect()
      .map { case (id, v) =>
        val (best, _) = centLocal.foldLeft((-1, Double.MaxValue)) { case ((bi, bd), (i, c)) =>
          var d = 0.0; var j = 0
          while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
          if (d < bd) (i, d) else (bi, bd)
        }
        id -> best
      }.toMap
    def got(parts: Int) = Ann.assignToCentroids(spark, e.repartition(parts), cent)
      .as[(Long, Int)].collect().toMap
    assert(got(1) == expected)
    assert(got(13) == expected)
  }
}
