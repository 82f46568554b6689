package graft

import graft.ann.Ann
import graft.model.Schemas._
import graft.pages.PagesSource
import graft.plans.DedupPipeline
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with ANSI-SQL DuckDB oracles where the semantics are
  * SQL-expressible; signature/LSH/clustering queries are rows-only checked
  * here and oracled against reference-generated golden fixtures in the
  * ScalaTest suite instead.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Simple SQL-expressible normalization used ONLY by the oracle-checked
    * exact-dedup queries (the full reference chain is exercised by the
    * golden-vector tests): lower + whitespace collapse + trim.
    */
  private def simpleNormCol(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Base ∪ deterministic uppercase/whitespace variants — gives the
    * dedup queries real duplicate groups to find, derivable identically in
    * Spark and DuckDB SQL.
    */
  private def docsWithVariants(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"), col("source"))
    val up = d.select((col("doc_id") + 1000000).as("doc_id"),
      upper(col("text")).as("text"), col("lang"), col("source"))
    val ws = d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        regexp_replace(col("text"), " ", "  ").as("text"), col("lang"), col("source"))
    d.unionByName(up).unionByName(ws)
  }

  private val docsWithVariantsSql =
    """(SELECT doc_id, text, lang, source FROM documents
      | UNION ALL SELECT doc_id + 1000000, upper(text), lang, source FROM documents
      | UNION ALL SELECT doc_id + 2000000, regexp_replace(text, ' ', '  ', 'g'), lang, source
      |   FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** Flagship: full dedup pipeline over pages derived from sf0.001 docs. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val pages = PagesSource.fromDocuments(spark, sfDir, variants = 3)
    DedupPipeline.run(spark, pages, s"/tmp/graft_entry_${System.nanoTime()}",
      DedupConfig.balanced, resume = false)
  }

  /** Shared pipeline run per sf dir: stage outputs persist under /tmp and
    * later queries reuse them via the resume markers (the input tables are
    * immutable), so Verify doesn't recompute the pipeline per query.
    */
  def pipelineRunDir(s: SparkSession, dir: String): String = {
    val rd = s"/tmp/graft_pipe_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val pages = PagesSource.fromDocuments(s, dir, variants = 2)
    DedupPipeline.run(s, pages, rd, DedupConfig.balanced, resume = true)
    rd
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- SQL-oracled (DuckDB parity) ----------
    "q_lang_hist" -> ((s, dir) => {
      docs(s, dir).groupBy("lang").agg(count(lit(1)).as("cnt")).orderBy("lang")
    }),
    "q_corpus_stats" -> ((s, dir) => {
      docs(s, dir).agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_chars")).as("total_chars"),
        avg(col("n_chars")).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
    }),
    "q_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),
    "q_top_tokens" -> ((s, dir) => {
      docs(s, dir)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc).limit(50)
    }),
    "q_exact_dup_groups" -> ((s, dir) => {
      docsWithVariants(s, dir)
        .select(col("doc_id"), sha2(simpleNormCol(col("text")), 256).as("norm_hash"))
        .groupBy("norm_hash")
        .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("rep_doc_id"))
        .filter(col("cluster_size") >= 2)
        .orderBy("rep_doc_id")
    }),
    "q_exact_dedup_keep_first" -> ((s, dir) => {
      docsWithVariants(s, dir)
        .select(col("doc_id"), sha2(simpleNormCol(col("text")), 256).as("norm_hash"))
        .groupBy("norm_hash").agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).orderBy("doc_id")
    }),
    "q_quality_counts" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[a-z]", ""))).cast("long").as("n_lower"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("n_digits"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long").as("n_spaces"))
        .orderBy("doc_id")
    }),
    "q_token_jaccard_pairs" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"), col("source"),
        array_distinct(split(trim(lower(col("text"))), "\\s+")).as("toks"))
      val a = t.select(col("source"), col("doc_id").as("a"), col("toks").as("ta"))
      val b = t.select(col("source").as("source2"), col("doc_id").as("b"), col("toks").as("tb"))
      a.join(b, col("source") === col("source2") && col("a") < col("b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
        .withColumn("uni", (size(col("ta")) + size(col("tb"))).cast("double") - col("inter"))
        .withColumn("jaccard", col("inter") / col("uni"))
        .filter(col("jaccard") >= 0.8)
        .select(col("a"), col("b"), col("jaccard"))
        .orderBy("a", "b")
    }),
    "q_ann_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Ann.bruteForceTopK(s, e, e.filter(col("vec_id") < 20), k = 5)
        .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "q_ingest_dedup" -> ((s, dir) => {
      // A7: within-batch keep-first by content hash + anti-join vs seen
      val batch = docsWithVariants(s, dir).select(col("doc_id"), col("text"))
      val seen = docs(s, dir).filter(col("doc_id") % 5 === 0)
        .select(sha2(lower(trim(col("text"))), 256).as("content_hash")).distinct()
      graft.sources.Sources.dedupIngest(batch, "text", seen)
        .select(col("doc_id")).orderBy("doc_id")
    }),
    // ---------- rows-only (non-SQL-expressible; oracled in ScalaTest
    // against reference-generated golden fixtures) ----------
    "q_normalize" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val n = graft.norm.TextNorm.normalize(t)
          (id, n, graft.norm.TextNorm.exactHash(n), graft.norm.TextNorm.contentHash(n))
        }.toDF("doc_id", "norm_text", "exact_hash", "content_hash").orderBy("doc_id")
    }),
    "q_minhash_signatures" -> ((s, dir) => {
      val pages = PagesSource.fromDocuments(s, dir, variants = 0)
      val norm = DedupPipeline.normalizeStage(s, pages)
      DedupPipeline.signatureStage(s, norm, DedupConfig.balanced)
        .select(col("url"), col("n_shingles"),
          element_at(col("minhash"), 1).as("mh0"),
          element_at(col("minhash"), 2).as("mh1"),
          col("simhash_hi"), col("simhash_lo")).orderBy("url")
    }),
    "q_lsh_candidates" -> ((s, dir) => {
      s.read.parquet(s"${pipelineRunDir(s, dir)}/05_cand").orderBy("a", "b")
    }),
    "q_dedup_verdicts" -> ((s, dir) => {
      s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts")
        .select(col("pair_key"), col("exact"), col("jaccard"), col("hamming"),
          col("sim_sim"), col("votes"), col("final_label"), col("dup_kind"))
        .orderBy("pair_key")
    }),
    "q_dedup_clusters" -> ((s, dir) => {
      s.read.parquet(s"${pipelineRunDir(s, dir)}/07_clusters")
        .orderBy("cluster_id", "url")
    }),
    "q_cluster_summary" -> ((s, dir) => {
      // T2 cluster ordering: size desc, then first member
      // (near_duplicate.py:369-371)
      s.read.parquet(s"${pipelineRunDir(s, dir)}/07_clusters")
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .orderBy(col("cluster_size").desc, col("cluster_id").asc)
    }),
    "q_run_summary" -> ((s, dir) => {
      graft.metrics.Metrics.runSummary(
        s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts"))
    }),
    "q_agreement_matrix" -> ((s, dir) => {
      graft.metrics.Metrics.agreementMatrix(
        s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts"))
        .orderBy("learner_a", "learner_b")
    }),
    "q_score_histogram" -> ((s, dir) => {
      val v = s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts")
      graft.metrics.Metrics.scoreHistogram(v, "jaccard", col("final_label") === "DUPLICATE")
    }),
    "q_threshold_sweep" -> ((s, dir) => {
      val v = s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts")
        .withColumn("is_dup", (col("final_label") === "DUPLICATE").cast("int"))
      graft.metrics.Metrics.thresholdSweep(v, "jaccard", "is_dup")
    }),
    "q_auc" -> ((s, dir) => {
      val v = s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts")
        .withColumn("is_dup", (col("final_label") === "DUPLICATE").cast("int"))
      graft.metrics.Metrics.auc(v, "jaccard", "is_dup")
    }),
    "q_bootstrap_calibration" -> ((s, dir) => {
      import s.implicits._
      val rd = pipelineRunDir(s, dir)
      val norm = s.read.parquet(s"$rd/01_norm").as[graft.model.Schemas.DocNorm]
      val sigs = s.read.parquet(s"$rd/03_sig").as[graft.model.Schemas.DocSig]
      val cals = graft.plans.Bootstrap.calibrate(s, norm, sigs, DedupConfig.balanced,
        maxPos = 5000, maxNeg = 5000)
      s.createDataFrame(cals).orderBy("learner")
    }),
    "q_html_meta" -> ((s, dir) => {
      // multimodal plumbing: opaque binary column -> typed metadata via a
      // deterministic decode (title extraction from the html bytes)
      import s.implicits._
      PagesSource.fromDocuments(s, dir, variants = 0)
        .map { p =>
          val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
          val title = {
            val i = html.indexOf("<title>")
            val j = html.indexOf("</title>")
            if (i >= 0 && j > i) html.substring(i + 7, j) else ""
          }
          (p.url, p.html.length, title, p.lang)
        }.toDF("url", "html_bytes", "title", "lang").orderBy("url")
    }),
    "q_lang_id" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("lang"), col("text")).as[(Long, String, String)]
        .map { case (id, lang, t) => (id, lang, TextOps.langId(t)) }
        .toDF("doc_id", "lang", "pred_lang").orderBy("doc_id")
    }),
    "q_quality_score" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val q = TextOps.quality(t)
          (id, q.n_chars, q.n_tokens, q.mean_token_len, q.alpha_ratio, q.digit_ratio,
            q.punct_ratio, q.stopword_ratio, q.score)
        }.toDF("doc_id", "n_chars", "n_tokens", "mean_token_len", "alpha_ratio",
          "digit_ratio", "punct_ratio", "stopword_ratio", "score").orderBy("doc_id")
    }),
    "q_fingerprint" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) => (id, TextOps.fingerprint(t), TextOps.simhash64(t), TextOps.subwordCount(t)) }
        .toDF("doc_id", "fingerprint", "simhash64", "n_subwords").orderBy("doc_id")
    }),
    "q_label_assign" -> ((s, dir) => {
      // X5: cosine label assignment — argmax over a broadcast label matrix
      // (classifier.py:219-247); labels = the first 5 vectors
      val e = embeddings(s, dir)
      val labels = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("label_id"), col("embedding").as("label_vec"))
      val scored = e.filter(col("vec_id") >= 5).crossJoin(broadcast(labels))
        .withColumn("cos", expr(
          "aggregate(zip_with(embedding, label_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v) / " +
            "(sqrt(aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) * " +
            "sqrt(aggregate(label_vec, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("label_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("label_id").as("predicted_label"))
        .orderBy("vec_id")
    }),
    "q_kmeans" -> ((s, dir) => {
      // X3: spark.ml KMeans over the embeddings (seed 42 like the
      // reference's classification side, cli.py:174-198)
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = embeddings(s, dir)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(8).setSeed(42).setFeaturesCol("features")
        .fit(e)
      model.transform(e).groupBy(col("prediction"))
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy(col("cluster_size").desc, col("prediction"))
        .select(col("cluster_size")) // sizes only: stable under label permutation
    }),
    "q_pseudo_labels" -> ((s, dir) => {
      // A8: pseudo-label builder — pos if >=2 learners clear thr+0.07,
      // neg if all below thr-0.07 (arbiter.py:508-534)
      val v = s.read.parquet(s"${pipelineRunDir(s, dir)}/06_verdicts")
      val margin = 0.07
      val strongVotes = (col("sim_sim") >= 0.75 + margin).cast("int") +
        (col("jaccard") >= 0.75 + margin).cast("int")
      val allWeak = (col("sim_sim") <= 0.75 - margin) && (col("jaccard") <= 0.75 - margin)
      v.withColumn("pseudo", when(col("exact") || (strongVotes >= 2), 1)
          .when(allWeak, 0).otherwise(lit(null)))
        .filter(col("pseudo").isNotNull)
        .select(col("pair_key"), col("pseudo").cast("int").as("pseudo"))
        .orderBy("pair_key")
    }),
    "q_calibrated_verdicts" -> ((s, dir) => {
      // K1-K6 + A6: bootstrap calibration feeding the calibrated arbiter
      // with gray-zone escalation
      import s.implicits._
      val rd = pipelineRunDir(s, dir)
      val norm = s.read.parquet(s"$rd/01_norm").as[graft.model.Schemas.DocNorm]
      val sigs = s.read.parquet(s"$rd/03_sig").as[graft.model.Schemas.DocSig]
      val cands = s.read.parquet(s"$rd/05_cand").as[graft.model.Schemas.CandPair]
      val params = graft.plans.Bootstrap.learnerParams(s, norm, sigs, DedupConfig.balanced,
        maxPos = 5000, maxNeg = 5000)
      graft.plans.CalibratedDedup.verify(s, cands, sigs, norm, DedupConfig.balanced, params)
        .toDF()
        .select(col("pair_key"), col("final_label"), col("reason"),
          col("sim_prob"), col("min_prob"), col("emb_prob"),
          concat_ws(",", col("escalation_steps")).as("steps"))
        .orderBy("pair_key")
    }),
    "q_simhash_modes" -> ((s, dir) => {
      // G2/G3/G4: SimHash featurization modes — word shingles (unit-sep
      // joiner), char n-grams, positional bucketing (simhash_model.py:198-234)
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val norm = graft.norm.TextNorm.normalize(t)
          val toks = graft.norm.TextNorm.simhashTokens(norm)
          val uni = graft.sig.SimHash.fromTokens(toks)
          val wsh = graft.sig.SimHash.fromTokens(
            graft.norm.TextNorm.wordShinglesUnitSep(toks, 3))
          val cng = graft.sig.SimHash.fromTokens(
            graft.norm.TextNorm.charShingles(norm, 5))
          val posToks = toks.zipWithIndex.map { case (tk, i) => s"$tk@${i / 8}" }
          val pos = graft.sig.SimHash.fromTokens(posToks)
          (id, uni.hi, uni.lo, wsh.hi, wsh.lo, cng.hi, cng.lo, pos.hi, pos.lo)
        }.toDF("doc_id", "uni_hi", "uni_lo", "wsh_hi", "wsh_lo",
          "cng_hi", "cng_lo", "pos_hi", "pos_lo").orderBy("doc_id")
    }),
    "q_embed_near_dup" -> ((s, dir) => {
      // the sandbox embeddings top out at cosine ~0.51; 0.45 exercises the
      // operator with a non-empty result
      Ann.lshCandidates(s, embeddings(s, dir), dim = 64, bands = 16, bitsPerBand = 6)
        .filter(col("cosine") >= 0.45)
        .orderBy("a", "b")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_lang_hist" ->
      "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY lang",
    "q_corpus_stats" ->
      ("SELECT count(*) AS doc_count, sum(n_chars) AS total_chars, " +
        "avg(n_chars) AS avg_chars, count(DISTINCT source) AS n_sources FROM documents"),
    "q_token_count" ->
      ("SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens " +
        "FROM documents ORDER BY doc_id"),
    "q_top_tokens" ->
      ("SELECT token, count(*) AS cnt FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token " +
        "FROM documents) WHERE length(token) > 0 GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 50"),
    "q_exact_dup_groups" ->
      (s"SELECT sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS norm_hash, " +
        s"count(*) AS cluster_size, min(doc_id) AS rep_doc_id FROM $docsWithVariantsSql " +
        "GROUP BY 1 HAVING count(*) >= 2 ORDER BY rep_doc_id"),
    "q_exact_dedup_keep_first" ->
      (s"SELECT min(doc_id) AS doc_id FROM $docsWithVariantsSql " +
        "GROUP BY sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) ORDER BY doc_id"),
    "q_quality_counts" ->
      ("SELECT doc_id, length(text) AS n_chars, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS n_lower, " +
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits, " +
        "length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_spaces " +
        "FROM documents ORDER BY doc_id"),
    "q_token_jaccard_pairs" ->
      ("WITH t AS (SELECT doc_id, source, list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks FROM documents) " +
        "SELECT a.doc_id AS a, b.doc_id AS b, " +
        "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(CAST(len(a.toks) + len(b.toks) AS DOUBLE) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) AS jaccard " +
        "FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "(CAST(len(a.toks) + len(b.toks) AS DOUBLE) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) >= 0.8 " +
        "ORDER BY a, b"),
    "q_ingest_dedup" ->
      (s"WITH hashed AS (SELECT doc_id, sha256(lower(trim(text))) AS content_hash FROM $docsWithVariantsSql), " +
        "firstper AS (SELECT content_hash, min(doc_id) AS doc_id FROM hashed GROUP BY 1), " +
        "seen AS (SELECT DISTINCT sha256(lower(trim(text))) AS h FROM documents WHERE doc_id % 5 = 0) " +
        "SELECT doc_id FROM firstper WHERE content_hash NOT IN (SELECT h FROM seen) ORDER BY doc_id"),
    "q_label_assign" ->
      ("SELECT vec_id, predicted_label FROM (" +
        "SELECT e.vec_id, l.vec_id AS predicted_label, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding, l.embedding) DESC, l.vec_id ASC) AS rn " +
        "FROM embeddings e JOIN embeddings l ON l.vec_id < 5 WHERE e.vec_id >= 5) " +
        "WHERE rn = 1 ORDER BY vec_id"),
    "q_ann_topk" ->
      ("SELECT query_id, nbr_id, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS nbr_id, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id ASC) AS rank " +
        "FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id WHERE q.vec_id < 20) " +
        "WHERE rank <= 5 ORDER BY query_id, rank")
  )
}
