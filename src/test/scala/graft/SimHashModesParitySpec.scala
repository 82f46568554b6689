package graft

import graft.norm.TextNorm
import graft.sig.SimHash
import org.scalatest.funsuite.AnyFunSuite

/** G2/G3/G4 — SimHash featurization-mode parity vs the reference
  * (fixtures/gen_golden_simhash_modes.py): unigram, unit-sep word shingles
  * (k=3), char 5-grams, positional bucketing (pos_bucket=8), each as
  * 128-bit hex over 150 golden corpus docs.
  */
class SimHashModesParitySpec extends AnyFunSuite {

  private lazy val goldens = GoldenFixtures.lines("fixtures/simhash_modes_golden.jsonl")
  private lazy val textByUrl = GoldenFixtures.corpus.map(d => d.url -> d.text).toMap

  private def hex(s: SimHash.Sig128): String = f"${s.hi}%016x${s.lo}%016x"

  test("all four featurization modes match the reference hex on 150 docs") {
    assert(goldens.size == 150)
    goldens.foreach { g =>
      val url = g.get("url").asText()
      val norm = TextNorm.normalize(textByUrl(url))
      val toks = TextNorm.simhashTokens(norm)
      assert(hex(SimHash.fromTokens(toks)) == g.get("uni_hex").asText(), s"$url unigram")
      assert(hex(SimHash.fromTokens(TextNorm.wordShinglesUnitSep(toks, 3))) ==
        g.get("wsh_hex").asText(), s"$url wshingle")
      assert(hex(SimHash.fromTokens(TextNorm.charShingles(norm, 5))) ==
        g.get("cng_hex").asText(), s"$url cngram")
      val posToks = toks.zipWithIndex.map { case (tk, i) => s"$tk@${i / 8}" }
      assert(hex(SimHash.fromTokens(posToks)) == g.get("pos_hex").asText(), s"$url pos")
    }
  }
}
