package graft.multimodal

import graft.hash.XXH64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video travel as opaque
  * `binary` columns with typed metadata extracted by per-partition batch
  * decode — the Scala-native analogue of a Pandas-UDF/mapInPandas stage
  * (mapPartitions IS the batch iterator; Tungsten handles the
  * columnar<->row boundary that Arrow handles on the Python side).
  *
  * The DECODERS are deliberately stubbed behind a deterministic container
  * format ("GRFT" header): this sandbox has no media libraries, so the
  * byte-parsing, schema, partitioning and batch shape are real while the
  * pixel/sample decode is a documented fake. Swapping `decodeImageMeta`'s
  * body for an ImageIO/ffmpeg call changes nothing upstream or downstream.
  *
  * Container layout (big-endian):
  *   image: 'G''R''F''T'  kind:1=img  w:int  h:int  ch:byte  payload
  *   audio: 'G''R''F''T'  kind:2=aud  rate:int  nSamples:int  ch:byte  payload
  *   video: 'G''R''F''T'  kind:3=vid  w:int  h:int  nFrames:byte  frames
  */
object MediaOps extends Serializable {

  final val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
  final val KindImage: Byte = 1
  final val KindAudio: Byte = 2
  final val KindVideo: Byte = 3

  final case class ImageMeta(width: Int, height: Int, channels: Int, n_bytes: Int)
  final case class AudioMeta(sample_rate: Int, n_samples: Int, channels: Int,
                             duration_sec: Double, n_bytes: Int)

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Deterministic fake image: header carries real dims, payload is a
    * seeded pseudo-random sample of (w*h*ch) % 4096 bytes (a thumbnail-
    * sized stand-in — the metadata describes the FULL image, like real
    * container headers do).
    */
  def encodeFakeImage(width: Int, height: Int, channels: Int, seed: Long): Array[Byte] = {
    val payloadLen = (width.toLong * height * channels % 4096L).toInt
    val out = new Array[Byte](14 + payloadLen)
    Magic.copyInto(out, 0, 0, 4)
    out(4) = KindImage
    putInt(out, 5, width); putInt(out, 9, height)
    out(13) = channels.toByte
    var i = 0
    while (i < payloadLen) {
      out(14 + i) = (XXH64.hashLongs(Array(seed, i.toLong), 0, 2, 0x6D1AL) & 0xFF).toByte
      i += 1
    }
    out
  }

  private implicit class ArrCopy(private val a: Array[Byte]) extends AnyVal {
    def copyInto(dst: Array[Byte], srcPos: Int, dstPos: Int, len: Int): Unit =
      System.arraycopy(a, srcPos, dst, dstPos, len)
  }

  def encodeFakeAudio(sampleRate: Int, nSamples: Int, channels: Int, seed: Long): Array[Byte] = {
    val payloadLen = (nSamples.toLong * channels % 2048L).toInt
    val out = new Array[Byte](14 + payloadLen)
    Magic.copyInto(out, 0, 0, 4)
    out(4) = KindAudio
    putInt(out, 5, sampleRate); putInt(out, 9, nSamples)
    out(13) = channels.toByte
    var i = 0
    while (i < payloadLen) {
      out(14 + i) = (XXH64.hashLongs(Array(seed, i.toLong), 0, 2, 0xA0D10L) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Fake video: nFrames frames, each a fake image blob, length-prefixed. */
  def encodeFakeVideo(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    // the frame count is a single header byte — more frames would silently
    // wrap the header and desync frameSample's walk
    require(nFrames >= 0 && nFrames <= 255, s"nFrames must be in [0, 255], got $nFrames")
    val frames = (0 until nFrames).map(f => encodeFakeImage(width, height, 3, seed * 31 + f))
    val total = 14 + frames.map(4 + _.length).sum
    val out = new Array[Byte](total)
    Magic.copyInto(out, 0, 0, 4)
    out(4) = KindVideo
    putInt(out, 5, width); putInt(out, 9, height)
    out(13) = nFrames.toByte
    var off = 14
    frames.foreach { fr =>
      putInt(out, off, fr.length); off += 4
      fr.copyInto(out, 0, off, fr.length); off += fr.length
    }
    out
  }

  private def hasMagic(bytes: Array[Byte], kind: Byte): Boolean =
    bytes.length >= 14 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3) && bytes(4) == kind

  /** STUBBED decode (real byte parsing, fake pixels — see class doc). */
  def decodeImageMeta(bytes: Array[Byte]): ImageMeta = {
    require(hasMagic(bytes, KindImage), "not a GRFT image")
    ImageMeta(getInt(bytes, 5), getInt(bytes, 9), bytes(13) & 0xFF, bytes.length)
  }

  def decodeAudioMeta(bytes: Array[Byte]): AudioMeta = {
    require(hasMagic(bytes, KindAudio), "not a GRFT audio")
    val rate = getInt(bytes, 5); val n = getInt(bytes, 9)
    AudioMeta(rate, n, bytes(13) & 0xFF, n.toDouble / rate, bytes.length)
  }

  /** Frame-sample every `everyN`th frame of a fake video — the decode is
    * stubbed, the exploded-binary-frames dataflow is the real thing.
    */
  def frameSample(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    require(hasMagic(bytes, KindVideo), "not a GRFT video")
    val nFrames = bytes(13) & 0xFF
    var off = 14
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var f = 0
    while (f < nFrames) {
      val len = getInt(bytes, off); off += 4
      if (f % everyN == 0) out += java.util.Arrays.copyOfRange(bytes, off, off + len)
      off += len
      f += 1
    }
    out.toSeq
  }

  /** Resize dims preserving aspect so max(w,h) <= maxDim (pure math —
    * identical in any engine).
    */
  def resizeDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else {
      val s = maxDim.toDouble / m
      (math.max(1, math.floor(w * s).toInt), math.max(1, math.floor(h * s).toInt))
    }
  }

  /** Deterministic feature-extraction stub: a unit-normalized float vector
    * hashed from the media bytes — drop-in input for Ann.* search.
    */
  def featureVec(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    var norm = 0.0
    while (i < dim) {
      val h = XXH64.hash(bytes, i.toLong)
      v(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      norm += v(i).toDouble * v(i)
      i += 1
    }
    val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
    i = 0
    while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
    v
  }

  /** Typed metadata table from a binary image column — per-partition batch
    * decode (the mapInPandas-shaped stage).
    */
  def imageMetaTable(spark: SparkSession, df: DataFrame, idCol: String,
                     binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeImageMeta(bytes)
        val (rw, rh) = resizeDims(m.width, m.height, 256)
        (id, m.width, m.height, m.channels, m.n_bytes.toLong, rw, rh)
      })
      .toDF(idCol, "width", "height", "channels", "n_bytes", "resized_w", "resized_h")
  }
}
