package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines (GPT-3 appendix C,
  * Brown et al. 2020 arXiv:2005.14165; Gopher §A.4.4, Rae et al. 2021
  * arXiv:2112.11446): flag corpus documents whose token n-grams collide
  * with an eval/benchmark set, so leaked test data is dropped before
  * training. The reference has no decontamination stage — this is one of
  * the training-pipeline operators the graft adds beyond its surface.
  *
  * Scale shape: the two sides are wildly asymmetric — benchmarks are MBs,
  * the corpus is ~100 TB — so the eval n-gram set is distinct-reduced and
  * BROADCAST, and the corpus scan discovers hits in a map-side
  * broadcast-hash-join on the exploded n-grams: the corpus side never
  * shuffles to find matches. The only shuffle is the per-doc hit count
  * over the (rare) matching rows, partial-aggregated map-side first. A
  * production deployment hashes each n-gram to 64 bits (xxh64) before
  * broadcasting to cut the broadcast payload ~10×; here the n-gram STRING
  * is carried end-to-end so the DuckDB oracle can recompute the whole
  * chain — the plan shape is identical either way.
  */
object Decontaminate {

  /** SQL-portable tokenizer shared with the DuckDB oracle:
    * whitespace-split of lower(trim(text)).
    */
  def tokensCol(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Space-joined n-gram array over a token-array column. Guarded for
    * short docs: Spark's `sequence(1, k)` counts DOWN when k < 1, so the
    * window index range must be gated on size >= n.
    */
  def ngramsCol(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct eval-side n-grams (one `g` string column) — the set to
    * broadcast. Distinct BEFORE the broadcast: the eval set dedups on the
    * small side, never against the corpus.
    */
  def evalNgrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(ngramsCol(tokensCol(col(textCol)), n)).as("g")).distinct()

  /** Plain-Scala row form for streaming / map-only use: does `text`
    * contain ANY n-gram from `evalNg`? Same tokenizer as tokensCol;
    * membership only (no hit counts), so it needs no aggregation state —
    * the shape a stateless stream filter requires.
    */
  def containsFlagged(text: String, evalNg: Set[String], n: Int): Boolean = {
    if (text == null || evalNg.isEmpty) return false
    containsFlagged(text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+"), evalNg, n)
  }

  /** Pre-tokenized form: callers that already hold the (trim+lowercase+
    * split \s+) token array — e.g. the streaming curation gate, which
    * shares one tokenization across its OOV and contamination checks —
    * avoid re-splitting the text.
    */
  def containsFlagged(toks: Array[String], evalNg: Set[String], n: Int): Boolean = {
    if (evalNg.isEmpty || toks.length < n) return false
    val sb = new StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (evalNg(sb.toString)) return true
      i += 1
    }
    false
  }

  /** Per-doc contamination flags: (idCol, n_hits = distinct contaminated
    * n-grams, contaminated). Every corpus doc appears exactly once; clean
    * docs carry n_hits = 0. Both joins broadcast the small side (eval
    * n-grams, then the hit rows), so the corpus is scanned once with no
    * corpus-side shuffle for discovery.
    */
  def flag(corpus: DataFrame, evalNg: DataFrame, idCol: String,
           textCol: String, n: Int): DataFrame = {
    val exploded = corpus
      .select(col(idCol), explode(ngramsCol(tokensCol(col(textCol)), n)).as("g"))
    val hits = exploded
      .join(broadcast(evalNg), "g")
      .groupBy(col(idCol))
      .agg(count_distinct(col("g")).as("n_hits"))
    corpus.select(col(idCol))
      .join(broadcast(hits), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_hits").isNotNull.as("contaminated"))
  }

  /** Containment-based (fuzzy) decontamination — FineWeb/Dolma-style: a
    * doc is flagged when the FRACTION of its distinct n-grams that appear
    * in the eval set reaches thrNum/thrDen, not on any single hit. `flag`
    * catches verbatim leakage; this catches paraphrased/partial leakage
    * while tolerating incidental n-gram collisions (boilerplate phrases)
    * that would make any-hit flagging drop clean documents at web scale.
    *
    * Decision arithmetic is INTEGER cross-multiplication
    * (n_hits * thrDen >= n_ngrams * thrNum), so the oracle re-decides
    * bit-identically — no float threshold compare anywhere. Scale shape:
    * n_ngrams is a per-row expression (no aggregation), hits reuse the
    * broadcast eval set; the corpus side shuffles nothing.
    */
  def containment(corpus: DataFrame, evalNg: DataFrame, idCol: String,
                  textCol: String, n: Int, thrNum: Int, thrDen: Int): DataFrame = {
    val distinctNg = array_distinct(ngramsCol(tokensCol(col(textCol)), n))
    val withN = corpus.select(col(idCol),
      size(distinctNg).cast("long").as("n_ngrams"))
    val hits = corpus
      .select(col(idCol), explode(distinctNg).as("g"))
      .join(broadcast(evalNg), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    withN.join(broadcast(hits), Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (col("n_ngrams") > 0 &&
          coalesce(col("n_hits"), lit(0L)) * thrDen >= col("n_ngrams") * thrNum)
          .as("flagged"))
  }
}
