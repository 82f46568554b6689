package graft.sig

import graft.lsh.BucketGuard
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS local-fingerprinting algorithm): the PARTIAL-COPY detection
  * modality the whole-document family (MinHash/SimHash, minhash_model.py /
  * simhash_model.py in the reference) lacks. MinHash measures whole-set
  * resemblance, so a page that copies three paragraphs into otherwise-new
  * text scores low Jaccard and is invisible to the LSH pipeline; winnowing
  * guarantees that any shared token run of at least k + w - 1 tokens
  * produces at least one SHARED fingerprint (the window-min of the first
  * full window inside the run is the same hash on both sides), giving
  * deterministic recall for long verbatim spans at a per-doc cost of
  * O(tokens), vs the pipeline's suffix-automaton span pass which is
  * per-PAIR and only runs on LSH candidates.
  *
  * Fingerprint identity is SQL-portable BY DESIGN so the driver oracle can
  * recompute the whole chain: a token k-gram hashes to the 16-hex-char
  * prefix of its md5, and window minima compare LEXICOGRAPHICALLY —
  * fixed-width lowercase hex orders identically as string or integer, so
  * Spark's `array_min` and DuckDB's `list_aggregate(_, 'min')` agree
  * bit-for-bit. (A production deployment can swap md5 for xxh64 — the
  * selection logic is hash-agnostic; md5 keeps ONE identity for engine and
  * oracle here.)
  *
  * Scale shape: fingerprint derivation is a pure per-row projection built
  * from codegen'd built-ins only (split / transform / slice / md5 /
  * array_min — no UDF, no shuffle); matching is one explode + equi-join on
  * the fingerprint value — the same bucket-join shape as LSH banding —
  * under the shared mega-bucket guard (a fingerprint present in millions of
  * docs is corpus boilerplate; its bucket would go quadratic exactly like a
  * degenerate LSH bucket).
  */
object Winnow {

  /** Local property carrying the guard's dropped-bucket count (set by
    * `matches`; BucketGuard tag "winnow").
    */
  final val DroppedBucketsProp = "graft.winnow.droppedBuckets"

  private def emptyStrArray = expr("CAST(array() AS ARRAY<STRING>)")

  /** Distinct winnowed fingerprints per row: (idCol, fps array<string>).
    *
    * Tokens are `split(trim(lower(text)), "\\s+")` — the same convention as
    * the green token queries (q_token_count / q_tokenize). Docs shorter
    * than k + w - 1 tokens have no full window and yield an empty set.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1 (got k=$k, w=$w)")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select(col(idCol), toks.as("toks"))
      // gram hashes in position order: h(i) = hex16(md5(toks[i..i+k-1]))
      .withColumn("hs",
        when(size(col("toks")) >= k + w - 1,
          transform(sequence(lit(0), size(col("toks")) - lit(k)),
            i => substring(md5(concat_ws(" ", slice(col("toks"), i + lit(1), lit(k)))), 1, 16)))
          .otherwise(emptyStrArray))
      // winnow: min of each w-window of gram hashes, distinct values
      .withColumn("fps",
        when(size(col("hs")) >= w,
          array_distinct(transform(sequence(lit(0), size(col("hs")) - lit(w)),
            j => array_min(slice(col("hs"), j + lit(1), lit(w))))))
          .otherwise(emptyStrArray))
      .select(col(idCol), col("fps"))
  }

  /** Exploded (id, fp) rows — the relation `matches` joins on. */
  def fingerprintRows(df: DataFrame, idCol: String, textCol: String,
                      k: Int, w: Int): DataFrame =
    fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), explode(col("fps")).as("fp"))

  /** Partial-copy candidate pairs: docs sharing >= minShared winnowed
    * fingerprints, (a, b, shared) with a < b. One equi-join on fp under the
    * shared BucketGuard (`maxFpDocs` members per fingerprint; hotter
    * fingerprints are corpus boilerplate and are dropped with the standard
    * logged-drop protocol), then a count per pair — never a cross join.
    */
  def matches(spark: SparkSession, fpRows: DataFrame, idCol: String,
              minShared: Long, maxFpDocs: Long = 4096L): DataFrame = {
    val rows = fpRows.select(lit(0).as("band"), col("fp").as("bucket"), col(idCol))
    val ok = BucketGuard.okBuckets(spark, rows, maxFpDocs, "winnow").ok
    val r = rows.join(ok, Seq("band", "bucket"))
    val a = r.select(col("bucket"), col(idCol).as("a"))
    val b = r.select(col("bucket").as("bucket2"), col(idCol).as("b"))
    a.join(b, col("bucket") === col("bucket2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
