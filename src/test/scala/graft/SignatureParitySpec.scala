package graft

import graft.hash.{Blake2b, XXH64}
import graft.lsh.LshParams
import graft.norm.TextNorm
import graft.sig.{CheapEmbed, MinHashSig, SimHash}
import org.scalatest.funsuite.AnyFunSuite

class SignatureParitySpec extends AnyFunSuite {

  test("BLAKE2b-128 matches hashlib.blake2b(digest_size=16) vectors") {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
    assert(hex(Blake2b.digest(Array.emptyByteArray, 16)) == "cae66941d9efbd404e4d88758ea67670")
    assert(hex(Blake2b.digest("abc".getBytes("UTF-8"), 16)) == "cf4ab791c62b8d2b2109c90275287816")
    assert(hex(Blake2b.digest("The quick brown fox jumps over the lazy dog".getBytes("UTF-8"), 16))
      == "249df9a49f517ddcd37f5c897620ec73")
    assert(hex(Blake2b.digest("tokenü".getBytes("UTF-8"), 16)) == "471a4b62aa8f8d36b1ed5e7129b574cf")
  }

  test("XXH64 matches the public spec vectors") {
    assert(XXH64.hashString("", 0L) == 0xEF46DB3751D8E999L)
    assert(XXH64.hashString("a", 0L) == 0xD24EC4F1A98C6E5BL)
    assert(XXH64.hashString("abc", 0L) == 0x44BC2CF5AD770999L)
  }

  test("SimHash matches the reference's blake2b fallback on all golden docs") {
    GoldenFixtures.goldenDocs.foreach { g =>
      val toks = TextNorm.simhashTokens(g.norm)
      val s = SimHash.fromTokens(toks)
      val hex = f"${s.hi}%016x${s.lo}%016x"
      assert(hex == g.simhashHex, s"simhash mismatch for ${g.url}: ours=$hex ref=${g.simhashHex}")
    }
  }

  test("shingle sets match the reference (count + lexicographic head)") {
    GoldenFixtures.goldenDocs.foreach { g =>
      val toks = TextNorm.tokenize(g.norm)
      val sh = TextNorm.wordShingles(toks, 3).distinct
      assert(sh.length == g.nShingles, s"n_shingles mismatch for ${g.url}")
      assert(sh.sorted.take(5).toSeq == g.shinglesHead, s"shingle head mismatch for ${g.url}")
    }
  }

  test("LSH optimal params match the datasketch-style derivation") {
    assert(LshParams.optimal(0.6, 64) == LshParams.BandsRows(10, 6))
    assert(LshParams.optimal(0.5, 128) == LshParams.BandsRows(25, 5))
  }

  test("MinHash estimate approximates exact Jaccard (3-sigma, 64 perms)") {
    val (as, bs) = MinHashSig.permutations(64)
    val rng = new graft.pages.PagesSource.DetRng(99)
    (0 until 30).foreach { _ =>
      val n = 200 + rng.nextInt(400)
      val base = Array.fill(n)(rng.nextLong())
      val keep = 0.3 + rng.nextDouble() * 0.7
      val other = base.filter(_ => rng.nextDouble() < keep) ++ Array.fill(rng.nextInt(100))(rng.nextLong())
      val aSet = base.distinct.sorted
      val bSet = other.distinct.sorted
      val exact = MinHashSig.jaccardSorted(aSet, bSet)
      val est = MinHashSig.estimate(MinHashSig.signature(aSet, as, bs), MinHashSig.signature(bSet, as, bs))
      val sigma = math.sqrt(exact * (1 - exact) / 64.0)
      assert(math.abs(est - exact) <= math.max(4 * sigma, 0.13),
        s"estimate $est too far from exact $exact")
    }
  }

  test("cheap embedding cosine matches reference within 1e-5 on golden pairs") {
    val byUrl = GoldenFixtures.goldenDocs.map(d => d.url -> d.norm).toMap
    val checked = GoldenFixtures.goldenDecisions
      .filter(d => d.embCos.isDefined && byUrl.contains(d.a) && byUrl.contains(d.b))
    assert(checked.nonEmpty, "no golden pairs with embedding cosine among golden docs")
    checked.foreach { d =>
      val cos = CheapEmbed.cosine(CheapEmbed.embed(byUrl(d.a)), CheapEmbed.embed(byUrl(d.b)))
      assert(math.abs(cos - d.embCos.get) < 1e-5,
        s"cosine mismatch ${d.pairKey}: ours=$cos ref=${d.embCos.get}")
    }
  }
}
