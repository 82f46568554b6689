package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located tables (sources/Bucketed): zero-Exchange joins and
  * aggregations on the bucket key, vs a shuffling unbucketed control, and
  * result parity between the two layouts.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val tables: (String, String) = {
    import spark.implicits._
    Bucketed.ensureDb(spark, "graft_bt_test", "/tmp/graft_bt_test_wh")
    val a = (1L to 400L).map(i => (i, s"text $i", i % 7)).toDF("doc_id", "text", "lang_id")
    val b = (1L to 400L).map(i => (i, i * 3 % 100)).toDF("doc_id", "n_tokens")
    Bucketed.writeTable(a, "graft_bt_test.docs", "doc_id", 8)
    Bucketed.writeTable(b, "graft_bt_test.stats", "doc_id", 8)
    ("graft_bt_test.docs", "graft_bt_test.stats")
  }

  test("co-bucketed equi-join plans with zero Exchange; unbucketed control shuffles") {
    withNoBroadcast {
      val (ta, tb) = tables
      val bucketed = spark.table(ta).join(spark.table(tb), "doc_id")
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"), s"bucketed join must not shuffle:\n$bPlan")

      import spark.implicits._
      val ua = (1L to 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      val ub = (1L to 400L).map(i => (i, i * 3 % 100)).toDF("doc_id", "n_tokens")
      val uPlan = ua.join(ub, "doc_id").queryExecution.executedPlan.toString
      assert(uPlan.contains("Exchange"), s"control should shuffle:\n$uPlan")
    }
  }

  test("groupBy on the bucket key aggregates without Exchange") {
    val (ta, _) = tables
    val agg = spark.table(ta).groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
  }

  test("bucketed join result equals the unbucketed join result") {
    import spark.implicits._
    val (ta, tb) = tables
    val got = spark.table(ta).join(spark.table(tb), "doc_id")
      .select($"doc_id", $"lang_id", $"n_tokens")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val want = (1L to 400L).map(i => (i, i % 7, i * 3 % 100))
    assert(got == want)
  }

  test("overwrite is idempotent: rewrite then reread keeps bucket metadata") {
    import spark.implicits._
    val b2 = (1L to 400L).map(i => (i, i * 5 % 100)).toDF("doc_id", "n_tokens")
    Bucketed.writeTable(b2, "graft_bt_test.stats2", "doc_id", 8)
    Bucketed.writeTable(b2, "graft_bt_test.stats2", "doc_id", 8)
    withNoBroadcast {
      val plan = spark.table(tables._1).join(spark.table("graft_bt_test.stats2"), "doc_id")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"rewritten table lost bucketing:\n$plan")
    }
  }
}
