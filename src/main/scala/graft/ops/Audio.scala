package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MM-AU — the AUDIO third of the multimodal mandate (image/audio/video
  * as opaque binary + typed metadata): a REAL RIFF/WAVE codec over 8-bit
  * unsigned mono PCM — the netpbm-of-audio, trivial enough to need no
  * codec JAR yet real enough that [[wavParse]] must walk actual
  * little-endian chunk structure (reference scope: the downloader is a
  * market-data pipeline with no media path; this lane exists for the
  * training-data mandate, same as [[Multimodal]]).
  *
  * The contract mirrors [[Multimodal.withPpmPayload]]/`ppmDecode`
  * exactly: [[wavPayload]] writes a VALID .wav any player opens
  * (RIFF header, `fmt ` chunk: PCM/mono/8 kHz/8-bit, `data` chunk),
  * with the sample plane = the document's text repeated to length
  * (all-ASCII corpus, so DuckDB's `unicode(char)` == byte — the PPM
  * oracle discipline); [[wavParse]] is an actual parser (magic checks,
  * LE field decode, chunk walk, truncation checks) returning None for
  * malformed bytes, never garbage. Every judged feature is an exact
  * integer aggregate, so the oracle replays the whole
  * generator→writer→parser→feature chain from `documents.text` alone.
  *
  * Scale shape (identical to the image lanes): payload construction,
  * parse, windowed energy are all partition-local mapPartitions batches
  * — no KEY shuffle anywhere (the one allowed exchange is
  * [[Scale.fanOut]]'s round-robin spread when the scan has too few
  * splits for the codec compute; PlanShapeSpec pins this). A heavier
  * codec (MP3/FLAC via a library) would swap into the same per-batch
  * seam.
  */
object Audio {

  /** Samples per payload: 150 + 37·(doc_id % 5) ∈ [150, 298] — varies
    * by row so the length fields in RIFF/data headers are actually
    * exercised, and never a multiple of the 40-sample energy window so
    * the partial tail window runs in the judged lane too. */
  def nSamplesFor(id: Long): Int = (150 + 37 * (id % 5)).toInt

  /** Little-endian field writers — RIFF is LE throughout. */
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Build one VALID 8-bit unsigned mono PCM WAV: 44-byte canonical
    * header + n sample bytes. Sample i = text byte (i mod |text|) —
    * the [[Multimodal.withPpmPayload]] pixel-plane rule, so the oracle
    * rebuilds the plane with `rpad(t, n, t)`. */
  def wavBytes(text: String, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val t = if (text.isEmpty) " " else text
    val tb = t.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(44 + nSamples)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + nSamples))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))          // audioFormat = PCM
    out.write(le16(1))          // channels = mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate)) // byteRate = rate * block
    out.write(le16(1))          // blockAlign = 1 (mono 8-bit)
    out.write(le16(8))          // bitsPerSample
    out.write("data".getBytes("US-ASCII")); out.write(le32(nSamples))
    var i = 0
    while (i < nSamples) { out.write(tb(i % tb.length)); i += 1 }
    out.toByteArray
  }

  /** Parsed WAV: format fields + the data chunk's (offset, length). */
  final case class Wav(sampleRate: Int, channels: Int, bits: Int,
    dataOff: Int, dataLen: Int)

  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  /** REAL parser: RIFF magic + size, WAVE form type, then a chunk WALK
    * (not fixed offsets — a writer emitting an extra `LIST` chunk still
    * parses) collecting `fmt ` and `data`. Returns None for anything
    * malformed: bad magic, short file, RIFF size mismatch, non-PCM
    * format, truncated data chunk, fmt after data missing, zero-rate. */
  def wavParse(bytes: Array[Byte]): Option[Wav] = {
    if (!tag(bytes, 0, "RIFF") || bytes.length < 44) return None
    if (rd32(bytes, 4) != bytes.length - 8) return None
    if (!tag(bytes, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val len = rd32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      if (tag(bytes, i, "fmt ")) {
        if (len < 16 || rd16(bytes, i + 8) != 1) return None // PCM only
        val rate = rd32(bytes, i + 12)
        val ch = rd16(bytes, i + 10)
        val bits = rd16(bytes, i + 22)
        if (rate <= 0 || ch <= 0 || bits <= 0) return None
        fmt = Some((rate, ch, bits))
      } else if (tag(bytes, i, "data")) data = Some((i + 8, len))
      i += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    for ((r, c, b) <- fmt; (off, dl) <- data) yield Wav(r, c, b, off, dl)
  }

  /** Nearest-neighbor decimation — the audio twin of
    * [[Multimodal.ppmResize]]: keep every `factor`-th sample and emit a
    * VALID WAV at sampleRate/factor (duration preserved), which
    * [[wavParse]] round-trips like any payload. Malformed → None. */
  def wavResample(bytes: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    wavParse(bytes).filter(w => w.sampleRate >= factor).map { w =>
      val n2 = (w.dataLen + factor - 1) / factor
      val out = new java.io.ByteArrayOutputStream(44 + n2)
      out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + n2))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
      out.write(le16(1)); out.write(le16(w.channels))
      out.write(le32(w.sampleRate / factor))
      out.write(le32(w.sampleRate / factor))
      out.write(le16(1)); out.write(le16(w.bits))
      out.write("data".getBytes("US-ASCII")); out.write(le32(n2))
      var i = 0
      while (i < n2) { out.write(bytes(w.dataOff + i * factor) & 0xff); i += 1 }
      out.toByteArray
    }
  }

  /** Attach the WAV payload: (idCol, payload) — partition-local build,
    * the binaryFile-source stand-in (same as withPpmPayload). */
  def wavPayload(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val in = Scale.fanOut(
      docs.select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("t")))
    val out: Dataset[Row] = in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, wavBytes(r.getString(1), nSamplesFor(id)))
      }
    }(enc)
    out.withColumnRenamed("id", idCol)
  }

  /** Typed metadata by REAL parse: (id, sample_rate, channels, bits,
    * n_samples, byte_len, sum_s) — sum_s = exact sum of the raw sample
    * bytes, the feature that hash-checks the data-chunk offset/length
    * arithmetic (not just the header fields). Null row values for
    * malformed payloads. `pre` slots a bytes→bytes transform (e.g.
    * `wavResample(_, 2)`) into the same batch, the decode discipline. */
  def wavMeta(spark: SparkSession, df: DataFrame, idCol: String,
      pre: Array[Byte] => Array[Byte] = identity): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_samples", IntegerType, nullable = true),
      StructField("byte_len", IntegerType, nullable = true),
      StructField("sum_s", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val in = Scale.fanOut(
      df.select(col(idCol).cast("long").as("id"), col("payload")))
    val out: Dataset[Row] = in.mapPartitions { it =>
      it.map { r =>
        val bytes = pre(r.getAs[Array[Byte]](1))
        wavParse(bytes) match {
          case Some(w) =>
            var s = 0L
            var i = 0
            while (i < w.dataLen) { s += bytes(w.dataOff + i) & 0xff; i += 1 }
            Row(r.getLong(0), Int.box(w.sampleRate), Int.box(w.channels),
              Int.box(w.bits), Int.box(w.dataLen), Int.box(bytes.length),
              Long.box(s))
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null)
        }
      }
    }(enc)
    out.withColumnRenamed("id", idCol)
  }

  /** Windowed energy — the per-frame feature pass every audio pipeline
    * runs (VAD, silence trim, loudness normalization all start here):
    * per window of `win` samples, energy = Σ (s−128)² over the window
    * (8-bit unsigned centers at 128; sum of squares is the exact-integer
    * stand-in for RMS — no sqrt, so the oracle replays it bit-for-bit)
    * plus `active` = energy > threshold·n_win (the VAD decision).
    * One output row per (id, window): ceil(n/win) ≤ 8 rows per doc at
    * the generator's sizes. Partition-local flatMap, zero shuffle;
    * malformed payloads contribute no rows (parser contract). */
  def wavEnergy(spark: SparkSession, df: DataFrame, idCol: String,
      win: Int = 40, threshold: Long = 100L): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("win", IntegerType, nullable = false),
      StructField("n_in_win", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("active", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val in = Scale.fanOut(
      df.select(col(idCol).cast("long").as("id"), col("payload")))
    val out: Dataset[Row] = in.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        wavParse(bytes) match {
          case Some(w) =>
            val nw = (w.dataLen + win - 1) / win
            (0 until nw).iterator.map { k =>
              val lo = k * win
              val hi = math.min(w.dataLen, lo + win)
              var e = 0L
              var i = lo
              while (i < hi) {
                val c = (bytes(w.dataOff + i) & 0xff) - 128
                e += c.toLong * c
                i += 1
              }
              Row(id, k, hi - lo, e,
                if (e > threshold * (hi - lo)) 1 else 0)
            }
          case None => Iterator.empty
        }
      }
    }(enc)
    out.withColumnRenamed("id", idCol)
  }
}
