package graft

import graft.sources.{MergeTable, Sources}
import org.scalatest.funsuite.AnyFunSuite

/** S9 MERGE table maintenance (sources/MergeTable): chained merges match
  * chained upsertByKey through the parquet round trip, snapshot pointer
  * semantics (bootstrap, rollback, vacuum), within-batch winner rule.
  */
class MergeTableSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_mergetbl_test").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("bootstrap + chained merges equal chained upsertByKey") {
    import spark.implicits._
    val table = freshDir()
    val base = Seq((1L, "e"), (2L, "e"), (3L, "e")).toDF("k", "v")
    val b1 = Seq((2L, "b"), (4L, "n")).toDF("k", "v")
    val b2 = Seq((3L, "c"), (4L, "c2"), (5L, "m")).toDF("k", "v")

    MergeTable.merge(spark, table, base, "k")
    MergeTable.merge(spark, table, b1, "k")
    MergeTable.merge(spark, table, b2, "k")

    val got = MergeTable.read(spark, table).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = Sources.upsertByKey(Sources.upsertByKey(base, b1, "k"), b2, "k")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == want)
    assert(got == Seq((1L, "e"), (2L, "b"), (3L, "c"), (4L, "c2"), (5L, "m")))
    assert(MergeTable.snapshots(table) == Seq("snap_000000", "snap_000001", "snap_000002"))
  }

  test("within-batch duplicate keys resolve to upsertByKey's winner") {
    import spark.implicits._
    val table = freshDir()
    // winner per key = max by non-key columns desc: "b" beats "a"
    MergeTable.merge(spark, table,
      Seq((7L, "a"), (7L, "b"), (8L, "x")).toDF("k", "v"), "k")
    val got = MergeTable.read(spark, table).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((7L, "b"), (8L, "x")))
  }

  test("rollback moves the pointer back one snapshot; data intact") {
    import spark.implicits._
    val table = freshDir()
    MergeTable.merge(spark, table, Seq((1L, "v0")).toDF("k", "v"), "k")
    MergeTable.merge(spark, table, Seq((1L, "v1")).toDF("k", "v"), "k")
    assert(MergeTable.read(spark, table).get.as[(Long, String)].collect().toSeq ==
      Seq((1L, "v1")))
    assert(MergeTable.rollback(table).contains("snap_000000"))
    assert(MergeTable.read(spark, table).get.as[(Long, String)].collect().toSeq ==
      Seq((1L, "v0")))
    // rollback at the oldest snapshot is a no-op
    assert(MergeTable.rollback(table).isEmpty)
  }

  test("vacuum removes old snapshots, never the current one") {
    import spark.implicits._
    val table = freshDir()
    (0 until 4).foreach(i =>
      MergeTable.merge(spark, table, Seq((1L, s"v$i")).toDF("k", "v"), "k"))
    val removed = MergeTable.vacuum(table, keep = 2)
    assert(removed == Seq("snap_000000", "snap_000001"))
    assert(MergeTable.snapshots(table) == Seq("snap_000002", "snap_000003"))
    assert(MergeTable.read(spark, table).get.as[(Long, String)].collect().toSeq ==
      Seq((1L, "v3")))
  }

  test("empty table reads as None; merge bootstraps it") {
    val table = freshDir()
    assert(MergeTable.read(spark, table).isEmpty)
    import spark.implicits._
    MergeTable.merge(spark, table, Seq((1L, "x")).toDF("k", "v"), "k")
    assert(MergeTable.read(spark, table).isDefined)
  }
}
