package graft

import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("CSV docs source reads a text column and synthesizes sha1 ids") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "docs.csv")
    Files.writeString(f.toPath,
      "text\n\"hello world\"\n\"second doc\"\n\"hello world\"\n")
    val df = Sources.csvDocs(spark, f.getAbsolutePath)
    assert(df.count() == 3)
    val ids = df.select("doc_id").collect().map(_.getString(0))
    assert(ids.forall(_.length == 40)) // sha1 hex
    assert(ids.distinct.length == 2)   // identical text -> identical id
  }

  test("JSON docs source reads doc_id/text objects") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "docs.json")
    Files.writeString(f.toPath,
      """[{"doc_id":"a","text":"one"},{"doc_id":"b","text":"two"}]""")
    val df = Sources.jsonDocs(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("doc_id", "text"))
  }

  test("ingest dedup keeps first per hash and drops seen hashes") {
    import spark.implicits._
    val batch = Seq((1L, "Hello"), (2L, "hello "), (3L, "fresh"), (4L, "Other"))
      .toDF("doc_id", "text")
    val seen = Seq("Other").toDF("t")
      .select(org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim($"t")), 256)
        .as("content_hash"))
    val out = Sources.dedupIngest(batch, "text", seen)
      .select("doc_id").as[Long].collect().sorted
    // 1 and 2 normalize identically -> keep 1; 4 is already seen; 3 kept
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("bloom-prefiltered ingest equals the plain anti-join, even at fpp 0.5") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sha2, lower, trim}
    val batch = (1L to 200L).map(i => (i, s"doc text number ${i % 120}"))
      .toDF("doc_id", "text")
    val seen = (0L until 120L by 3L).map(i => s"doc text number $i")
      .toDF("t").select(sha2(lower(trim($"t")), 256).as("content_hash"))
    val exact = Sources.dedupIngest(batch, "text", seen)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // default fpp and a deliberately terrible fpp: output must be exact
    // either way — false positives are removed by the confirm anti-join
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Sources.bloomDedupIngest(spark, batch, "text", seen, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == exact, s"fpp=$fpp")
    }
  }

  test("pages source reads a parquet path with the input_hint schema") {
    val dir = Files.createTempDirectory("graft_pages").toFile.getAbsolutePath + "/pages"
    val (pages, _) = graft.pages.PagesSource.syntheticCorpus(spark, 2, 3)
    pages.write.mode("overwrite").parquet(dir)
    val back = Sources.pages(spark, dir)
    assert(back.count() == 6)
    assert(back.head().url.startsWith("https://"))
  }
}
