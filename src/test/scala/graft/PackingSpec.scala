package graft

import graft.plans.Packing
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (plans/Packing): hand vectors, boundary straddling,
  * partition invariance, window-parity on random input, no-Window plan.
  */
class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, Long)], budget: Long) = {
    import spark.implicits._
    Packing.assign(rows.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", budget)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
  }

  test("hand vector: starts 0,4,12,15 at budget 10") {
    val got = run(Seq((1L, 4L), (2L, 8L), (3L, 3L), (4L, 10L)), budget = 10)
    assert(got == Seq(
      (1L, 4L, 0L, 0L),   // start 0
      (2L, 8L, 0L, 4L),   // start 4, straddles into bin 1
      (3L, 3L, 1L, 2L),   // start 12
      (4L, 10L, 1L, 5L))) // start 15
  }

  test("exact boundary: a doc ending at the budget opens the next bin cleanly") {
    val got = run(Seq((1L, 10L), (2L, 5L)), budget = 10)
    assert(got == Seq((1L, 10L, 0L, 0L), (2L, 5L, 1L, 0L)))
  }

  test("partition invariance: shuffled, skew-partitioned input packs identically") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, (i * 37 % 90) + 1))
    val base = run(rows, budget = 256)
    val shuffled = Packing.assign(
      scala.util.Random.shuffle(rows).toDF("doc_id", "n_tokens").repartition(7),
      "doc_id", "n_tokens", 256)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(shuffled == base)
  }

  test("parity with the naive global-window formulation") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, (i * 13 % 40) + 1))
    val got = run(rows, budget = 100)
    var s = 0L
    val want = rows.map { case (id, n) =>
      val r = (id, n, s / 100, s % 100); s += n; r
    }
    assert(got == want)
  }

  test("plan: no Window operator anywhere (distributed prefix sum)") {
    import spark.implicits._
    val plan = Packing.assign(
      (1L to 50L).map(i => (i, 5L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window forbidden:\n$plan")
  }
}
