package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer training statistics (Sennrich et al. 2016,
  * arXiv:1508.07909) — the data-prep side of training a subword tokenizer
  * on the corpus the pipeline curates. The reference has no tokenizer
  * training; this is a training-pipeline extension like decontamination.
  *
  * Scale shape (the standard BPE trick, stated explicitly): the corpus is
  * reduced ONCE to its word-type table (word, cnt) — one map-side-
  * combinable groupBy; every subsequent merge iteration runs over word
  * TYPES (bounded by `maxTypes`, a vocab-sized table that fits on the
  * driver exactly like the calibration samples), never over the 100 TB
  * corpus. Applying a learned merge list back to the corpus is a
  * broadcast-map (segment() under a UDF), shuffle-free.
  *
  * Determinism contract: pair counts are exact BIGINT sums over adjacent
  * positions; the merge pick is argmax by (cnt DESC, left ASC, right ASC)
  * — a total order; merge application is the greedy left-to-right
  * non-overlapping scan. All integer/string ops, so the ENTIRE iterative
  * fit is recomputable in SQL: the q_bpe_merges oracle unrolls the
  * generations as chained CTEs (the integer-PageRank precedent), each one
  * re-counting pairs, re-picking the argmax, and re-segmenting via a
  * list_reduce scan.
  */
object Bpe {

  /** Corpus word-type table (word, cnt) under the shared \s+ tokenizer.
    * The empty token (what the tokenizer yields for empty/whitespace-only
    * text) is excluded: it is not a word, has no pairs, and its empty
    * segmentation would poison the oracle's list_reduce replay.
    */
  def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Decontaminate.tokensCol(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Generation-0 (character-alphabet) adjacent-pair counts, distributed:
    * explode each word type's adjacent char pairs weighted by cnt. Guarded
    * for single-char words (Spark's sequence counts DOWN when hi < lo).
    */
  def pairStats(types: DataFrame): DataFrame = {
    val pairs = when(length(col("word")) >= 2,
      transform(sequence(lit(1), length(col("word")) - 1), i =>
        struct(col("word").substr(i, lit(1)).as("l"),
          col("word").substr(i + lit(1), lit(1)).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    types
      .select(explode(pairs).as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Greedy left-to-right non-overlapping application of one merge.
    * Equivalent to the oracle's list_reduce scan: after a merge the new
    * symbol (l+r) becomes the tail, so an overlapping re-match against
    * `l` is structurally impossible.
    */
  def applyMerge(segs: Array[String], l: String, r: String): Array[String] = {
    val out = new ArrayBuffer[String](segs.length)
    var i = 0
    while (i < segs.length) {
      if (i + 1 < segs.length && segs(i) == l && segs(i + 1) == r) {
        out += l + r; i += 2
      } else { out += segs(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-side greedy BPE fit over a word-type table: numMerges rounds
    * of (count pairs weighted by word cnt) -> (argmax by cnt DESC, l ASC,
    * r ASC) -> (re-segment), stopping early when no pair reaches
    * minCount. Returns (step, left, right, cnt) with step 1-based.
    */
  def fitMerges(types: Seq[(String, Long)], numMerges: Int,
                minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var segs: Array[(Array[String], Long)] =
      types.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }.toArray
    val merges = new ArrayBuffer[(Int, String, String, Long)]
    var step = 1
    var continue = true
    while (continue && step <= numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]
      segs.foreach { case (ss, c) =>
        var i = 0
        while (i + 1 < ss.length) {
          val k = (ss(i), ss(i + 1))
          counts.merge(k, c, (a, b) => a + b)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val eligible = counts.asScala.filter(_._2 >= minCount)
      if (eligible.isEmpty) continue = false
      else {
        // argmax: cnt DESC, then (l, r) ASC — the oracle's ORDER BY
        val ((l, r), c) = eligible.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        merges += ((step, l, r, c))
        segs = segs.map { case (ss, wc) => (applyMerge(ss, l, r), wc) }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Segment one word with a learned merge list (applied in fit order) —
    * the APPLY half, a pure function usable under a broadcast UDF.
    */
  def segment(word: String, merges: Seq[(String, String)]): Array[String] = {
    var segs = word.split("").filter(_.nonEmpty)
    merges.foreach { case (l, r) => segs = applyMerge(segs, l, r) }
    segs
  }

  /** Fit over a DataFrame word-type table with the scale cap: the top
    * `maxTypes` types by (cnt DESC, word ASC) are collected to the driver
    * (the bounded-collect pattern the calibration fit uses); dropped
    * types are logged. Returns the merge table as a DataFrame
    * (step, l, r, cnt).
    */
  def fitMergesDf(spark: SparkSession, types: DataFrame, numMerges: Int,
                  maxTypes: Int = 100000): DataFrame = {
    import spark.implicits._
    // collect maxTypes+1 rows so hitting the cap is detectable without a
    // separate count() job (which would run the corpus-sized groupBy twice)
    val collected = types.orderBy(col("cnt").desc, col("word").asc)
      .limit(maxTypes + 1).as[(String, Long)].collect()
    if (collected.length > maxTypes)
      Console.err.println(s"[graft.bpe] capped word types at $maxTypes " +
        "(top by count; fit is approximate beyond the cap)")
    fitMerges(collected.take(maxTypes).toSeq, numMerges).toDF("step", "l", "r", "cnt")
  }
}
