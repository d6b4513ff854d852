package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` below is a clearly-marked deterministic stand-in
  * that consumes real bytes and emits a fixed-shape feature vector. The
  * Spark-side plumbing — schema, batch shape, partition-local processing —
  * is real and tested, which is the part that matters for the engine: at
  * 100 TB the decode runs partition-local with zero shuffle, exactly as
  * here.
  */
object Multimodal {

  /** Metadata struct carried next to every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Attach a binary payload + metadata struct to a text table — the test
    * stand-in for reading real media files (binaryFile source in prod). */
  def withPayload(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("payload", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        expr(s"octet_length($textCol)").cast("int").as("byte_len"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        ((col(idCol) * 37) % 480).cast("int").as("height"),
        (floor(expr(s"octet_length($textCol)") / 100) + 1).cast("int")
          .as("n_frames")))

  /** STUB decode: deterministic fake "feature extraction" — sums byte
    * values in 16-byte chunks into an 8-dim float vector. A real deploy
    * swaps the body for an image/audio codec; the signature (bytes ->
    * fixed-dim features, computed partition-local via mapPartitions with
    * no shuffle) is the contract. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out((i / 16) % 8) += (bytes(i) & 0xff).toFloat
      i += 1
    }
    out
  }

  /** Frame sampling: every `stride`-th byte ("frame") of the payload. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Array[Byte] =
    bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray

  /** STUB resize: nearest-neighbor resample of the payload to `targetLen`
    * bytes — the stand-in for an image resize (real deploy: codec +
    * interpolation; the partition-local byte->byte shape is the contract). */
  def resize(bytes: Array[Byte], targetLen: Int): Array[Byte] =
    if (bytes.isEmpty || targetLen <= 0) Array.emptyByteArray
    else Array.tabulate(targetLen)(i => bytes((i.toLong * bytes.length / targetLen).toInt))

  /** Decode operator: partition-local batch decode of payload -> features
    * + sampled frames. mapPartitions (not a per-row UDF) so a real codec
    * could amortize model/codec init per batch — the Pandas-UDF batch
    * shape, expressed in Scala. */
  def decode(spark: SparkSession, df: DataFrame, idCol: String,
      stride: Int = 100): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_sampled", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // fan out first: a compacted input file = one split = the whole codec
    // workload on one core (Scale.fanOut is a no-op with enough splits)
    val in = Scale.fanOut(
      df.select(col(idCol).cast("long").as("id"), col("payload")))
    val out: Dataset[Row] = in.mapPartitions { it =>
      // per-partition init would go here (codec / model load)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(bytes).toSeq, sampleFrames(bytes, stride).length)
      }
    }(enc)
    out.withColumnRenamed("id", idCol)
  }
}
