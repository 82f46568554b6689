package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-partitioned sink (SparkEntry.partitionedDumpDir): layout,
  * lossless round trip, and — the scale property — partition PRUNING in
  * the read plan (a lang filter must never touch other langs' files).
  */
class PartitionedSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("layout: one lang=<v> directory per language, no lang column in files") {
    val p = SparkEntry.partitionedDumpDir(spark, sf)
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")), dirs.mkString(","))
    // the partition column must be layout-encoded, not duplicated in data
    val one = new java.io.File(p, dirs.head).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val schema = spark.read.parquet(one.getAbsolutePath).schema.fieldNames.toSet
    assert(!schema.contains("lang"), s"lang leaked into file schema: $schema")
  }

  test("round trip is lossless (count and content aggregate match source)") {
    val p = SparkEntry.partitionedDumpDir(spark, sf)
    val src = spark.read.parquet(s"$sf/documents.parquet")
    val back = spark.read.parquet(p)
    assert(back.count() == src.count())
    val a = src.agg(sum("n_chars"), sum("doc_id")).collect().head
    val b = back.agg(sum("n_chars"), sum("doc_id")).collect().head
    assert(a == b)
  }

  test("plan: lang filter becomes a PartitionFilter (pruned scan)") {
    val p = SparkEntry.partitionedDumpDir(spark, sf)
    val q = spark.read.parquet(p).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning on lang:\n$plan")
    // objective proof: after pruning, only lang=en files are read
    val files = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan touched non-pruned files: ${files.filterNot(_.contains("lang=en")).take(3).mkString(",")}")
  }
}
