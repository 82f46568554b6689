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
}
