package graft

import graft.norm.TextNorm
import graft.sig.{CheapEmbed, SimHash}
import org.scalatest.funsuite.AnyFunSuite

/** Pair-level decision parity: replicate the arbiter's balanced,
  * calibration-OFF voting (arbiter.py:260-320,358-447) in plain Scala over
  * every golden pair and require the reference's final labels.
  */
class DecisionParitySpec extends AnyFunSuite {

  private val conf = DedupConfig.balanced

  private lazy val docs: Map[String, String] =
    GoldenFixtures.corpus.map(d => d.url -> TextNorm.normalize(d.text)).toMap

  private lazy val exact: Map[String, String] = docs.map { case (u, n) => u -> TextNorm.exactHash(n) }
  private lazy val simSig = docs.map { case (u, n) =>
    u -> SimHash.fromTokens(TextNorm.simhashTokens(n), conf.maxTokenWeight, conf.simhashBits)
  }
  private lazy val shingleSets = docs.map { case (u, n) =>
    u -> TextNorm.wordShingles(TextNorm.tokenize(n), conf.shingleSize).toSet
  }
  private lazy val embs = docs.map { case (u, n) => u -> CheapEmbed.embed(n, conf.embedDim) }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def decide(a: String, b: String): (String, String, Double, Double, Double) = {
    if (exact(a) == exact(b)) return ("DUPLICATE", "EXACT", 1.0, 1.0, 1.0)
    val sa = simSig(a); val sb = simSig(b)
    val simRaw = SimHash.similarity(sa.hi, sa.lo, sb.hi, sb.lo, conf.simhashBits)
    val minRaw = jaccard(shingleSets(a), shingleSets(b))
    val cos = CheapEmbed.cosine(embs(a), embs(b))
    var votes = 0
    if (simRaw >= conf.thrSimhash) votes += 1
    if (minRaw >= conf.thrMinhash) votes += 1
    if (cos >= conf.thrEmbedCosine || CheapEmbed.cosToUnit(cos) >= conf.thrEmbedCosine) votes += 1
    val label = if (votes >= conf.requiredVotes) "DUPLICATE" else "NON_DUPLICATE"
    (label, if (label == "DUPLICATE") "NEAR" else null, simRaw, minRaw, cos)
  }

  test("per-learner raw scores match the reference exactly (non-exact pairs)") {
    val nonExact = GoldenFixtures.goldenDecisions.filter(d => d.dupKind.forall(_ != "EXACT"))
    assert(nonExact.size > 1000)
    var embChecked = 0
    nonExact.foreach { d =>
      val (_, _, simRaw, minRaw, cos) = decide(d.a, d.b)
      d.simRaw.foreach(ref => assert(simRaw == ref,
        s"sim_raw mismatch ${d.pairKey}: ours=$simRaw ref=$ref"))
      d.minRaw.foreach(ref => assert(minRaw == ref,
        s"min_raw mismatch ${d.pairKey}: ours=$minRaw ref=$ref"))
      d.embCos.foreach { ref => assert(math.abs(cos - ref) < 1e-5,
        s"emb_cos mismatch ${d.pairKey}: ours=$cos ref=$ref"); embChecked += 1 }
    }
    assert(embChecked > 1000)
  }

  test("final labels match the reference on every golden pair") {
    val all = GoldenFixtures.goldenDecisions
    val mismatches = all.flatMap { d =>
      val (label, kind, _, _, _) = decide(d.a, d.b)
      if (label != d.label) Some(s"${d.pairKey}: ours=$label ref=${d.label} reason=${d.reason}")
      else if (d.label == "DUPLICATE" && d.dupKind.exists(_ != Option(kind).getOrElse("")))
        Some(s"${d.pairKey}: kind ours=$kind ref=${d.dupKind}")
      else None
    }
    val rate = 1.0 - mismatches.size.toDouble / all.size
    assert(mismatches.isEmpty,
      f"label agreement $rate%.5f; first mismatches:\n${mismatches.take(5).mkString("\n")}")
  }
}
