package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run metrics — distributed re-expression of the reference's metrics
  * module (/root/reference/src/metrics/metrics.py). Every aggregation is a
  * single groupBy/window pass (the reference loops over Python lists).
  */
object Metrics {

  /** M1 — run summary: counts by final label and dup kind, consensus rate
    * (metrics.py:13-68).
    */
  def runSummary(verdicts: DataFrame): DataFrame = {
    verdicts.agg(
      count(lit(1)).as("total_pairs"),
      sum(when(col("final_label") === "DUPLICATE", 1).otherwise(0)).as("duplicates"),
      sum(when(col("final_label") === "NON_DUPLICATE", 1).otherwise(0)).as("non_duplicates"),
      sum(when(col("final_label") === "UNCERTAIN", 1).otherwise(0)).as("uncertain"),
      sum(when(col("dup_kind") === "EXACT", 1).otherwise(0)).as("exact_dups"),
      sum(when(col("dup_kind") === "NEAR", 1).otherwise(0)).as("near_dups"),
      (sum(when(col("final_label") =!= "UNCERTAIN", 1).otherwise(0)) / count(lit(1)))
        .as("consensus_rate"))
  }

  /** M2 — rank-based AUC (Mann-Whitney with tie-averaged ranks,
    * metrics.py:704-728) of `scoreCol` against boolean/0-1 `labelCol`.
    * Returns a 1-row DataFrame (auc, n_pos, n_neg).
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // tie-averaged rank = avg of row_numbers within equal scores
    val ranked = df.select(col(scoreCol).as("s"), col(labelCol).cast("int").as("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
    val tieAvg = ranked.groupBy(col("s"))
      .agg(avg(col("rn")).as("avg_rank"))
    val joined = ranked.join(tieAvg, "s")
    joined.agg(
      sum(when(col("y") === 1, col("avg_rank")).otherwise(0.0)).as("rank_sum_pos"),
      sum(col("y")).cast("long").as("n_pos"),
      sum(lit(1) - col("y")).cast("long").as("n_neg"))
      .select(
        when(col("n_pos") === 0 || col("n_neg") === 0, 0.5)
          .otherwise((col("rank_sum_pos") - col("n_pos") * (col("n_pos") + 1) / 2.0) / (col("n_pos") * col("n_neg")))
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** M3/M4 — P/R/F1 + confusion at a threshold (metrics.py:315-459). */
  def prfAtThreshold(df: DataFrame, scoreCol: String, labelCol: String,
                     threshold: Double): DataFrame = {
    val pred = (col(scoreCol) >= threshold).cast("int")
    val y = col(labelCol).cast("int")
    df.agg(
      sum(when(pred === 1 && y === 1, 1).otherwise(0)).as("tp"),
      sum(when(pred === 1 && y === 0, 1).otherwise(0)).as("fp"),
      sum(when(pred === 0 && y === 0, 1).otherwise(0)).as("tn"),
      sum(when(pred === 0 && y === 1, 1).otherwise(0)).as("fn"),
      avg(col(scoreCol)).as("score_mean"),
      min(col(scoreCol)).as("score_min"),
      max(col(scoreCol)).as("score_max"),
      stddev_pop(col(scoreCol)).as("score_std"),
      avg((abs(col(scoreCol) - threshold) <= 0.05).cast("int")).as("near_band_share"))
      .withColumn("precision", when(col("tp") + col("fp") > 0, col("tp") / (col("tp") + col("fp"))).otherwise(0.0))
      .withColumn("recall", when(col("tp") + col("fn") > 0, col("tp") / (col("tp") + col("fn"))).otherwise(0.0))
      .withColumn("f1", when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))).otherwise(0.0))
  }

  /** M5 — pairwise learner vote-agreement matrix (metrics.py:462-496). */
  def agreementMatrix(verdicts: DataFrame): DataFrame = {
    val learners = Seq("vote_sim" -> "simhash", "vote_min" -> "minhash", "vote_emb" -> "embedding")
    val rows = for ((ca, na) <- learners; (cb, nb) <- learners) yield {
      verdicts.agg(
        lit(na).as("learner_a"), lit(nb).as("learner_b"),
        avg((col(ca) === col(cb)).cast("int")).as("agreement_rate"),
        avg(col(ca).cast("int")).as("vote_share_a"))
    }
    rows.reduce(_ unionByName _)
  }

  /** M7 — 20-bin score histogram split by a predicate (metrics.py:604-636). */
  def scoreHistogram(df: DataFrame, scoreCol: String, positive: Column,
                     nBins: Int = 20): DataFrame = {
    df.select(
        least(lit(nBins - 1), floor(col(scoreCol) * nBins)).cast("int").as("bin"),
        positive.cast("int").as("pos"))
      .groupBy("bin")
      .agg(sum(col("pos")).as("pos_count"), sum(lit(1) - col("pos")).as("neg_count"))
      .withColumn("bin_lo", col("bin") / nBins.toDouble)
      .orderBy("bin")
  }

  /** M8 — threshold sweep: cumulative TP/FP over descending unique scores
    * (metrics.py:739-803), yielding ROC/PR points.
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val w = Window.orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val y = col(labelCol).cast("int")
    val scored = df.select(col(scoreCol).as("thr"), y.as("y"))
      .withColumn("tp", sum(col("y")).over(w))
      .withColumn("fp", sum(lit(1) - col("y")).over(w))
    val totals = scored.agg(sum(col("y")).as("P"), sum(lit(1) - col("y")).as("N")).first()
    val p = totals.getLong(0).toDouble
    val n = totals.getLong(1).toDouble
    scored.groupBy(col("thr"))
      .agg(max(col("tp")).as("tp"), max(col("fp")).as("fp"))
      .withColumn("tpr", if (p > 0) col("tp") / p else lit(0.0))
      .withColumn("fpr", if (n > 0) col("fp") / n else lit(0.0))
      .withColumn("precision", when(col("tp") + col("fp") > 0, col("tp") / (col("tp") + col("fp"))).otherwise(1.0))
      .orderBy(col("thr").desc)
  }

  /** M9 — top-k example pairs by a score (metrics.py:514-540). */
  def topExamples(verdicts: DataFrame, scoreCol: String, label: String, k: Int = 50): DataFrame =
    verdicts.filter(col("final_label") === label)
      .orderBy(col(scoreCol).desc, col("pair_key"))
      .limit(k)

  /** M10 — corpus stats (text_preproc.py:217-244): doc count, avg token
    * length, language histogram, vocab size, top-50 tokens.
    */
  def corpusStats(norm: DataFrame, spark: SparkSession): (DataFrame, DataFrame) = {
    val summary = norm.agg(
      count(lit(1)).as("doc_count"),
      avg(col("n_tokens")).as("avg_doc_len"))
    val tokens = norm
      .select(explode(split(col("norm_text"), " ")).as("token"))
      .filter(length(col("token")) >= 2 && !col("token").isin(graft.norm.TextNorm.DefaultStopwords.toSeq: _*))
    val top = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(50)
    (summary, top)
  }
}
