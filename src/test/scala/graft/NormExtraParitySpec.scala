package graft

import graft.norm.TextNorm
import org.scalatest.funsuite.AnyFunSuite

/** Parity for the remaining text_preproc operators against
  * reference-generated golden vectors (fixtures/gen_golden_norm2.py):
  * N0 drop_repeating_lines, N3 sentence_split, N4 filename_tokens.
  */
class NormExtraParitySpec extends AnyFunSuite {

  private def vectors(kind: String) = GoldenFixtures.normExtraGolden.filter(_.kind == kind)

  test("drop_repeating_lines matches the reference on every golden vector") {
    val vs = vectors("drop_repeating_lines")
    assert(vs.size >= 20)
    vs.foreach { v =>
      val got = TextNorm.dropRepeatingLines(v.input)
      assert(got == v.outText.get,
        s"drop_repeating_lines(${v.input.take(60)}): got=$got ref=${v.outText.get}")
    }
  }

  test("sentence_split matches the reference on every golden vector") {
    val vs = vectors("sentence_split")
    assert(vs.size >= 20)
    vs.foreach { v =>
      val got = TextNorm.sentenceSplit(v.input).toSeq
      assert(got == v.outList.get,
        s"sentence_split(${v.input.take(60)}): got=$got ref=${v.outList.get}")
    }
  }

  test("filename_tokens matches the reference on every golden vector") {
    val vs = vectors("filename_tokens")
    assert(vs.size >= 14)
    vs.foreach { v =>
      val got = TextNorm.filenameTokens(v.input).toSeq
      assert(got == v.outList.get,
        s"filename_tokens(${v.input}): got=$got ref=${v.outList.get}")
    }
  }
}
