package graft.tools

import graft.{Bench, SparkEntry}

/** Ad-hoc single-query timer: `runMain graft.tools.TimeQuery <sfDir> <q>...`
  * — same session config as Bench, per-query wall + row count to stderr.
  * For sizing candidate timed-set entries before they join Bench.benchNames.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Bench.buildSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      System.err.println(f"[time] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $rows%d rows")
    }
    spark.stop()
  }
}
