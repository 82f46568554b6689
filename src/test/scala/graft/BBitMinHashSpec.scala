package graft

import graft.sig.{BBitMinHash, MinHashSig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** b-bit MinHash (sig/BBitMinHash): packing layout, packed-vs-raw match
  * agreement, self-match identity, the collision-corrected estimator on
  * pairs with known Jaccard, and the byte-budget arithmetic the operator
  * exists for.
  */
class BBitMinHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val NumPerm = 64

  private def sigDf(rows: (String, Array[Long])*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "minhash")
  }

  /** Deterministic pseudo-random full-width signature. */
  private def fakeSig(seed: Long): Array[Long] =
    Array.tabulate(NumPerm)(i => math.abs(seed * 6364136223846793005L + i * 1442695040888963407L) % ((1L << 61) - 1))

  test("nWords and the packed layout: 64 slots in 5 words, low bits preserved") {
    assert(BBitMinHash.nWords(NumPerm) == 5)
    val mh = fakeSig(7L)
    val packed = BBitMinHash.packed(sigDf("u" -> mh), "url", "minhash", NumPerm)
      .collect()(0).getSeq[Long](1)
    assert(packed.size == 5)
    for (k <- 0 until NumPerm) {
      val w = k / BBitMinHash.SlotsPerWord
      val i = k % BBitMinHash.SlotsPerWord
      val slot = (packed(w) >> (BBitMinHash.Bits * i)) & 0xfL
      assert(slot == (mh(k) % 16 + 16) % 16, s"slot $k")
    }
  }

  test("packed match count == raw low-bit agreement count; self-match is 64") {
    val a = fakeSig(1L); val b = fakeSig(2L)
    val packed = BBitMinHash.packed(sigDf("a" -> a, "b" -> b), "url", "minhash", NumPerm)
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("a", "a")).toDF("a", "b")
    val got = BBitMinHash.estimatePairs(pairs, packed, NumPerm)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = (0 until NumPerm).count(k => a(k) % 16 == b(k) % 16).toLong
    assert(got(("a", "b")) == want)
    assert(got(("a", "a")) == NumPerm.toLong)
    // self-pair estimate must be exactly 1.0 (1e6 ppm)
    val selfEst = BBitMinHash.estimatePairs(pairs, packed, NumPerm)
      .filter(col("a") === col("b")).collect()(0).getLong(3)
    assert(selfEst == 1000000L)
  }

  test("negative signature values pack by pmod (the OPH signer's raw xxh64 bins)") {
    // classic MinHash values are nonnegative (mod 2^61-1), but the OPH
    // signer persists raw xxh64 bin minima — negative about half the
    // time. Packing and matching must be floorMod-consistent so the
    // signer-agnostic oracle SQL (((v % 16) + 16) % 16) agrees.
    val a = Array.tabulate(NumPerm)(i => if (i % 2 == 0) -fakeSig(3L)(i) else fakeSig(3L)(i))
    val b = Array.tabulate(NumPerm)(i => if (i % 3 == 0) -fakeSig(4L)(i) else a(i))
    val packed = BBitMinHash.packed(sigDf("a" -> a, "b" -> b), "url", "minhash", NumPerm)
    val slots = packed.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (k <- 0 until NumPerm) {
      val w = k / BBitMinHash.SlotsPerWord
      val i = k % BBitMinHash.SlotsPerWord
      assert(((slots("a")(w) >> (BBitMinHash.Bits * i)) & 0xfL) == java.lang.Math.floorMod(a(k), 16L), s"slot $k")
    }
    import spark.implicits._
    val got = BBitMinHash.estimatePairs(Seq(("a", "b")).toDF("a", "b"), packed, NumPerm)
      .collect()(0).getLong(2)
    val want = (0 until NumPerm).count(k =>
      java.lang.Math.floorMod(a(k), 16L) == java.lang.Math.floorMod(b(k), 16L)).toLong
    assert(got == want)
  }

  test("collision-corrected estimator tracks true Jaccard on real signatures") {
    val (pa, pb) = MinHashSig.permutations(NumPerm)
    def sign(items: Seq[Long]) = MinHashSig.signature(items.toArray, pa, pb)
    val base = (1L to 400L)
    val cases = Seq(
      ("identical", base, base, 1.0),
      ("j_third", base, (201L to 600L), 200.0 / 600.0), // |A∩B|=200, |A∪B|=600
      ("disjoint", base, (1001L to 1400L), 0.0))
    cases.foreach { case (name, xs, ys, trueJ) =>
      val packed = BBitMinHash.packed(
        sigDf("x" -> sign(xs), "y" -> sign(ys)), "url", "minhash", NumPerm)
      import spark.implicits._
      val est = BBitMinHash.estimatePairs(Seq(("x", "y")).toDF("a", "b"), packed, NumPerm)
        .collect()(0).getLong(3) / 1e6
      // 64 slots, b=4: sd of the corrected estimator ~ sqrt(J(1-J)/n)/(1-C)
      // ~< 0.07; allow 3 sd plus minhash's own estimation error
      assert(math.abs(est - trueJ) < 0.22, s"$name: est $est vs true $trueJ")
    }
  }

  test("estimator floor: disjoint sets cannot go negative") {
    import spark.implicits._
    // worst case: zero matching slots -> raw corrected value is negative,
    // clamped to 0
    val a = Array.tabulate(NumPerm)(i => (2L * i + 1))      // odd low bits
    val b = Array.tabulate(NumPerm)(i => (2L * i))          // even low bits
    val packed = BBitMinHash.packed(sigDf("a" -> a, "b" -> b), "url", "minhash", NumPerm)
    val r = BBitMinHash.estimatePairs(Seq(("a", "b")).toDF("a", "b"), packed, NumPerm)
      .collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }

  test("byte budget: packed form is 12.8x smaller than full width") {
    val fullBytes = NumPerm * 8
    val packedBytes = BBitMinHash.nWords(NumPerm) * 8
    assert(fullBytes == 512 && packedBytes == 40)
    assert(fullBytes.toDouble / packedBytes == 12.8)
  }
}
