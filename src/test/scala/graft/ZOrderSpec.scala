package graft

import graft.sources.ZOrder
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering (sources/ZOrder): the Morton interleave vs a
  * pure-Scala recompute, and the MEASURED data-skipping claim — the same
  * range-filtered scan decodes far fewer rows off the z-clustered layout
  * than off a layout sorted by the other key, because parquet row-group
  * min/max stats prune.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("zValue matches pure-Scala Morton interleave of (md5-16, key mod 2^16)") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (s"host$i", i * 37L)).toDF("h", "k")
    val got = df.select($"h", $"k", ZOrder.zValue($"h", $"k").as("z"))
      .as[(String, Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (h, k, z) =>
      val hex = md.digest(h.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val a = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 65536L
      val b = k % 65536L
      var exp = 0L
      for (i <- 0 until 16) {
        exp |= ((a >> i) & 1L) << (2 * i)
        exp |= ((b >> i) & 1L) << (2 * i + 1)
      }
      assert(z == exp, s"z mismatch for ($h, $k)")
    }
  }

  private val zDir = "/tmp/graft_test_zorder_clustered"
  private val sDir = "/tmp/graft_test_zorder_seqsorted"

  private def corpus() = {
    import spark.implicits._
    // val = multiplicative hash of seq: deterministic, uncorrelated with
    // seq, below 2^16 so the z reduction is order-preserving
    (0L until 40000L)
      .map(i => (i, (i * 2654435761L) % 65536L, s"payload $i ${"x" * 64}"))
      .toDF("seq", "val", "body")
  }

  /** Both layouts, written once per suite run — each test that reads them
    * forces this, so tests stay order-independent and isolated runs work.
    */
  private lazy val layouts: Unit = {
    import spark.implicits._
    TestUtil.deleteRecursively(new java.io.File(zDir))
    TestUtil.deleteRecursively(new java.io.File(sDir))
    val rows = corpus()
    ZOrder.writeClustered(rows, ZOrder.zValue2($"seq", $"val"), nFiles = 8, zDir)
    rows.repartitionByRange(8, $"seq").sortWithinPartitions("seq")
      .write.mode("overwrite").parquet(sDir)
  }

  test("z layout decodes far fewer rows for a val-range scan than a seq-sorted layout") {
    import spark.implicits._
    layouts
    val decoded = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        decoded.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    def decodedRows(path: String): (Long, Long) = {
      spark.sparkContext.addSparkListener(listener)
      decoded.set(0L)
      try {
        val n = spark.read.parquet(path)
          .filter($"val" >= 8192L && $"val" <= 16383L).count()
        org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        (n, decoded.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (zN, zRead) = decodedRows(zDir)
    val (sN, sRead) = decodedRows(sDir)
    assert(zN == sN, s"layouts disagree on the answer: $zN vs $sN")
    // seq-sorted: val is scattered, every row group spans the full val
    // range, so min/max prunes nothing and ~all 40k rows decode
    assert(sRead >= 35000L, s"seq-sorted baseline unexpectedly pruned: $sRead")
    // z layout: row groups whose val min/max excludes [8192, 16383] skip
    assert(zRead * 2 <= sRead,
      s"z-order layout did not skip: decoded $zRead vs baseline $sRead")
  }

  test("both layouts hold identical data (clustering may not lose rows)") {
    import spark.implicits._
    layouts
    val z = spark.read.parquet(zDir).as[(Long, Long, String)].collect().toSet
    val s = spark.read.parquet(sDir).as[(Long, Long, String)].collect().toSet
    assert(z == s && z.size == 40000)
  }
}
