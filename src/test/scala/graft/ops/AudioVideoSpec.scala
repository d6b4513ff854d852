package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MM-AU / MM-VID — the audio and video thirds of the multimodal
  * mandate: REAL RIFF/WAVE writer+parser (8-bit unsigned mono PCM) and
  * the concatenated-P6 frame walker, both exercised the way
  * TextStateMultimodalSpec exercises the image codec — hand-built
  * payloads, independent recomputations, malformed-input contracts. */
class AudioVideoSpec extends SparkSpec {
  import spark.implicits._

  test("MM-AU wavBytes -> wavParse round-trips every header field and " +
      "the sample plane") {
    val b = Audio.wavBytes("abc", 10)
    val w = Audio.wavParse(b).get
    assert(w.sampleRate == 8000 && w.channels == 1 && w.bits == 8)
    assert(w.dataLen == 10 && w.dataOff == 44 && b.length == 54)
    // plane = "abc" repeated: a b c a b c a b c a
    val plane = (0 until 10).map(i => b(w.dataOff + i).toChar).mkString
    assert(plane == "abcabcabca")
    // empty text falls back to a single space
    val e = Audio.wavParse(Audio.wavBytes("", 4)).get
    assert((0 until 4).forall(i =>
      Audio.wavBytes("", 4)(e.dataOff + i) == ' '.toByte))
  }

  test("MM-AU wavParse rejects malformed payloads: bad magic, RIFF size " +
      "mismatch, truncated data chunk, non-PCM format; tolerates an " +
      "extra chunk before fmt (real chunk walk, not fixed offsets)") {
    val good = Audio.wavBytes("xy", 8)
    assert(Audio.wavParse(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Audio.wavParse(badMagic).isEmpty)
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(Audio.wavParse(badSize).isEmpty)
    assert(Audio.wavParse(good.dropRight(3)).isEmpty) // truncated: size check
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Audio.wavParse(nonPcm).isEmpty)
    // insert a 4-byte "LIST" chunk between WAVE and fmt; fix RIFF size
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(good, 0, 12)
    extra.write("LIST".getBytes("US-ASCII"))
    extra.write(Array[Byte](4, 0, 0, 0)); extra.write(Array[Byte](1, 2, 3, 4))
    extra.write(good, 12, good.length - 12)
    val eb = extra.toByteArray
    val sz = eb.length - 8
    eb(4) = (sz & 0xff).toByte; eb(5) = ((sz >> 8) & 0xff).toByte
    eb(6) = ((sz >> 16) & 0xff).toByte; eb(7) = ((sz >> 24) & 0xff).toByte
    val w = Audio.wavParse(eb).get
    assert(w.sampleRate == 8000 && w.dataLen == 8)
  }

  test("MM-AU wavResample keeps every factor-th sample at rate/factor — " +
      "identifiable-sample decimation geometry") {
    val b = Audio.wavBytes("abcdefgh", 8) // samples a..h, distinct
    val r = Audio.wavResample(b, 2).get
    val w = Audio.wavParse(r).get
    assert(w.sampleRate == 4000 && w.dataLen == 4)
    assert((0 until 4).map(i => r(w.dataOff + i).toChar).mkString == "aceg")
    // factor 1 is the identity; malformed input resamples to None
    assert(Audio.wavResample(b, 1).get.sameElements(b))
    assert(Audio.wavResample(Array[Byte](1, 2, 3), 2).isEmpty)
  }

  test("MM-AU wavEnergy windows match an independent recomputation; " +
      "active flags the loud window only; malformed rows emit nothing") {
    // 6 samples over win=4: window 0 = "Azzz" (quiet mix), window 1 =
    // "Az" (the loud A dominates a 2-sample window)
    val txt = "Azzz" // A=65 -> c=-63; z=122 -> c=-6
    val payload = Audio.wavBytes(txt, 6)
    val df = Seq((1L, payload), (2L, Array[Byte](0, 1, 2))).toDF("doc_id", "payload")
    val rows = Audio.wavEnergy(spark, df, "doc_id", win = 4, threshold = 1500L)
      .orderBy(col("win")).as[(Long, Int, Int, Long, Int)].collect()
    val cs = txt.map(c => (c.toInt - 128).toLong)
    val e0 = (0 until 4).map(i => cs(i % 4) * cs(i % 4)).sum // 4077
    val e1 = (4 until 6).map(i => cs(i % 4) * cs(i % 4)).sum // 4005
    assert(rows.toSeq == Seq((1L, 0, 4, e0, 0), (1L, 1, 2, e1, 1)))
    assert(e0 <= 1500L * 4 && e1 > 1500L * 2) // the split is exercised
  }

  test("MM-VID withVideoPayload -> videoFrames: per-frame channel sums " +
      "match the rotation formula; stride keeps frames 0 and 2") {
    // doc_id 1: width 9, height 4, nf 3, planes rotate "abcd" by f
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val vid = Multimodal.withVideoPayload(docs, "text", "doc_id")
    val rows = Multimodal.videoFrames(spark, vid, "doc_id", stride = 2)
      .orderBy(col("frame")).as[(Long, Int, Int, Int, Long, Long, Long)]
      .collect()
    assert(rows.map(_._2).toSeq == Seq(0, 2)) // stride 2 of frames 0,1,2
    def sums(f: Int): (Long, Long, Long) = {
      val t = "abcd"
      val rot = t.substring(f % 4) + t.substring(0, f % 4)
      val plane = Iterator.continually(rot).flatten.take(9 * 4 * 3).toSeq
      ((0 until 36).map(p => plane(3 * p).toLong).sum,
        (0 until 36).map(p => plane(3 * p + 1).toLong).sum,
        (0 until 36).map(p => plane(3 * p + 2).toLong).sum)
    }
    assert((rows(0)._5, rows(0)._6, rows(0)._7) == sums(0))
    assert((rows(1)._5, rows(1)._6, rows(1)._7) == sums(2))
    assert(rows.forall(r => r._3 == 9 && r._4 == 4))
  }

  test("MM-VID2 videoFramePhash: identical frame content across videos " +
      "hashes identically; the walked hash equals phash56 of the sliced " +
      "frame bytes") {
    // ids 0 and 8: same width (8), same text -> frame 0 is byte-identical
    val docs = Seq((0L, "hello world"), (8L, "hello world"))
      .toDF("doc_id", "text")
    val vid = Multimodal.withVideoPayload(docs, "text", "doc_id")
    val hashes = Multimodal.videoFramePhash(spark, vid, "doc_id", stride = 2)
      .as[(Long, Int, Long)].collect()
      .map { case (id, f, ph) => (id, f) -> ph }.toMap
    // nf(0) = 2 -> kept {0}; nf(8) = 2 + 8 % 3 = 4 -> kept {0, 2}
    assert(hashes.keySet == Set((0L, 0), (8L, 0), (8L, 2)))
    assert(hashes((0L, 0)) == hashes((8L, 0)))
    // slice frame 0 out of the payload and hash it standalone
    val payload = vid.filter(col("doc_id") === 0)
      .select(col("payload")).as[Array[Byte]].head()
    assert(Multimodal.phash56(payload).get == hashes((0L, 0)))
    // rotation changes content: frame 2 of doc 8 differs from frame 0
    assert(hashes((8L, 2)) != hashes((8L, 0)))
  }

  test("MM-VID videoFrames: a truncated tail ends the walk but earlier " +
      "frames still emit; garbage emits nothing") {
    val docs = Seq((0L, "xyz")).toDF("doc_id", "text") // width 8, nf 2
    val vid = Multimodal.withVideoPayload(docs, "text", "doc_id")
    val full = vid.select(col("payload")).as[Array[Byte]].head()
    val frameLen = full.length / 2
    val cut = Seq((0L, full.take(frameLen + 5)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.videoFrames(spark, cut, "doc_id", stride = 1)
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
    assert(rows.map(_._2).toSeq == Seq(0)) // frame 1 truncated away
    val junk = Seq((9L, "nonsense".getBytes("US-ASCII"))).toDF("doc_id", "payload")
    assert(Multimodal.videoFrames(spark, junk, "doc_id").isEmpty)
  }
}
