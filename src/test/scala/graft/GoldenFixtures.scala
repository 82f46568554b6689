package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Loader for the reference-generated golden fixtures (the jsonl files under
  * fixtures/, produced by fixtures/gen_golden.py from the reference's
  * deterministic fallback code paths).
  */
object GoldenFixtures {
  private val mapper = new ObjectMapper()

  def lines(path: String): Seq[JsonNode] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toList
    finally src.close()
  }

  val dir = "fixtures"

  final case class NormVector(raw: String, norm: String, tokens: Seq[String], contentHash: String)
  lazy val normGolden: Seq[NormVector] = lines(s"$dir/norm_golden.jsonl").map { n =>
    NormVector(n.get("raw").asText(), n.get("norm").asText(),
      n.get("tokens").elements().asScala.map(_.asText()).toSeq,
      n.get("content_hash").asText())
  }

  final case class CorpusDoc(url: String, text: String, family: Int, kind: Int)
  lazy val corpus: Seq[CorpusDoc] = lines(s"$dir/corpus.jsonl").map { n =>
    CorpusDoc(n.get("url").asText(), n.get("text").asText(),
      n.get("family").asInt(), n.get("kind").asInt())
  }

  final case class GoldenDoc(url: String, norm: String, nTokens: Int, exactHash: String,
                             contentHash: String, simhashHex: String, nShingles: Int,
                             shinglesHead: Seq[String])
  lazy val goldenDocs: Seq[GoldenDoc] = lines(s"$dir/golden_docs.jsonl").map { n =>
    GoldenDoc(n.get("url").asText(), n.get("norm").asText(), n.get("n_tokens").asInt(),
      n.get("exact_hash").asText(), n.get("content_hash").asText(),
      n.get("simhash_hex").asText(), n.get("n_shingles").asInt(),
      n.get("shingles_head").elements().asScala.map(_.asText()).toSeq)
  }

  final case class GoldenDecision(a: String, b: String, pairKey: String, label: String,
                                  dupKind: Option[String], reason: String,
                                  simRaw: Option[Double], minRaw: Option[Double],
                                  embCos: Option[Double])
  lazy val goldenDecisions: Seq[GoldenDecision] = lines(s"$dir/golden_decisions.jsonl").map { n =>
    def optD(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asDouble())
    GoldenDecision(n.get("a").asText(), n.get("b").asText(), n.get("pair_key").asText(),
      n.get("label").asText(),
      Option(n.get("dup_kind")).filterNot(_.isNull).map(_.asText()),
      n.get("reason").asText(), optD("sim_raw"), optD("min_raw"), optD("emb_cos"))
  }

  final case class NormExtra(kind: String, input: String, outText: Option[String],
                             outList: Option[Seq[String]])
  lazy val normExtraGolden: Seq[NormExtra] = lines(s"$dir/norm_extra_golden.jsonl").map { n =>
    NormExtra(n.get("kind").asText(), n.get("input").asText(),
      Option(n.get("out_text")).filterNot(_.isNull).map(_.asText()),
      Option(n.get("out_list")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSeq))
  }

  final case class GoldenCluster(mode: String, members: Seq[String])
  lazy val goldenClusters: Seq[GoldenCluster] = lines(s"$dir/golden_clusters.jsonl").map { n =>
    GoldenCluster(n.get("mode").asText(),
      n.get("members").elements().asScala.map(_.asText()).toSeq)
  }
}
