package graft

import graft.sources.Sharding
import org.scalatest.funsuite.AnyFunSuite

/** Size-balanced shard assignment (sources/Sharding): the distributed
  * two-pass rank must equal a single-threaded (weight DESC, key ASC)
  * ROW_NUMBER, the striped deal must bound the shard-weight spread by the
  * max single weight, and the result must be independent of the input's
  * initial partitioning.
  */
class ShardingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // heavy-tailed weights — the distribution that breaks naive hash sharding
  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, (1000000.0 / (i * i) + i % 97).toLong + 1L)
    }.toDF("doc_id", "n_chars")
  }

  test("rank equals single-threaded (weight DESC, key ASC) row_number") {
    val df = corpus(500)
    val got = Sharding.assignShards(df, "doc_id", "n_chars", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val want = got.map(t => (t._1, t._2)).sortBy { case (k, w) => (-w, k) }
      .zipWithIndex.map { case ((k, w), i) =>
        (k, w, i + 1L, (i % 8))
      }.toSet
    assert(got.toSet == want)
    assert(got.length == 500)
  }

  test("shard weight spread is bounded by the max single weight") {
    val df = corpus(1000)
    val assigned = Sharding.assignShards(df, "doc_id", "n_chars", 8)
    val totals = Sharding.shardStats(assigned)
      .collect().map(r => r.getLong(2))
    val maxW = assigned.agg(org.apache.spark.sql.functions.max("weight"))
      .collect().head.getLong(0)
    assert(totals.length == 8)
    assert(totals.max - totals.min <= maxW,
      s"spread ${totals.max - totals.min} > max weight $maxW")
  }

  test("assignment is invariant to input partitioning") {
    val df = corpus(300)
    val a = Sharding.assignShards(df.repartition(1), "doc_id", "n_chars", 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3))).toSet
    val b = Sharding.assignShards(df.repartition(17), "doc_id", "n_chars", 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("single shard degenerates to pure rank; nShards=0 rejected") {
    val df = corpus(50)
    val one = Sharding.assignShards(df, "doc_id", "n_chars", 1)
    assert(one.filter(org.apache.spark.sql.functions.col("shard") =!= 0).count() == 0)
    intercept[IllegalArgumentException] {
      Sharding.assignShards(df, "doc_id", "n_chars", 0)
    }
  }
}
