package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary fitting + out-of-vocabulary scoring — the corpus
  * statistics a training pipeline computes before freezing a tokenizer
  * (and the OOV-rate quality axis CCNet-style filters use to spot
  * non-linguistic pages). Tokens come from the shared SQL-portable
  * tokenizer (Decontaminate.tokensCol) so DuckDB recomputes both chains.
  *
  * Scale shape: token counting is ONE map-side-combinable groupBy over
  * token-scale rows (the same class as the shingle pipeline — partial
  * aggregation makes a boilerplate mega-token cost one counter per task).
  * The top-V selection is orderBy+limit over the already-aggregated
  * distinct-token table, which Spark plans as TakeOrderedAndProject —
  * a per-partition top-V + single merge of V-row heaps, never a full
  * sort of the vocabulary. Ranks are then assigned on the V-row result
  * (V is tokenizer-sized, thousands — driver-scale by construction).
  * OOV scoring broadcasts the vocab as a hash set into one mapPartitions
  * pass: zero shuffle, O(1) membership per token — the right shape when
  * the corpus is 100 TB and the vocab is kilobytes-to-megabytes.
  */
object Vocab {

  /** Top-V tokens by corpus count: (token, cnt, rank), rank 1-based,
    * ties broken by token ascending — fully deterministic.
    */
  def topK(df: DataFrame, textCol: String, v: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val top = df
      .select(explode(Decontaminate.tokensCol(col(textCol))).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc)
      .limit(v)
      .as[(String, Long)].collect()
    spark.createDataFrame(top.zipWithIndex.map { case ((t, c), i) =>
      (t, c, (i + 1).toLong)
    }.toSeq).toDF("token", "cnt", "rank")
  }

  /** Per-doc OOV stats against a vocab token set:
    * (idCol, n_tokens, n_oov, oov_rate). Broadcast set + one typed
    * mapPartitions — no shuffle anywhere.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: Set[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (id, text) =>
          val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          var oov = 0L
          toks.foreach(t => if (!v(t)) oov += 1)
          (id, toks.length.toLong, oov,
            if (toks.isEmpty) 0.0 else oov.toDouble / toks.length)
        }
      }.toDF(idCol, "n_tokens", "n_oov", "oov_rate")
  }
}
