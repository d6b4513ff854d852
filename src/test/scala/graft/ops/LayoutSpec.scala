package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-at-a-time reference interleave (the semantics the magic-number
    * version must match). */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zValue matches the bit-at-a-time Morton reference on the 16-bit domain") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y), s"($x,$y)") }
  }

  test("zValue masks inputs to 16 bits (overflow bits cannot collide dimensions)") {
    val got = Seq((65536L + 3L, 2L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).as[Long].head()
    assert(got == mortonRef(3L, 2L))
  }

  test("zOrderBy yields disjoint sorted z-ranges per partition") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(5000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    val parts = Layout.zOrderBy(df, col("x"), col("y"), partitions = 4)
      .select("z").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    // sorted within each partition (row-group-level min/max stats)
    parts.foreach(p => assert(p == p.sorted))
    // disjoint ranges across partitions (file-level min/max stats):
    // sort partitions by their min; each must start after the previous ends
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("compact bin-packs a many-tiny-files directory, preserving data") {
    val in = java.nio.file.Files.createTempDirectory("graft_tiny").toString
    val out = java.nio.file.Files.createTempDirectory("graft_packed").toString + "/c"
    // 32 tiny files (one per partition)
    spark.range(0, 10000).repartition(32).write.mode("overwrite").parquet(in)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 32)
    val nOut = Layout.compact(spark, in, out, targetBytes = 1L << 20)
    assert(parquetFiles(out) == nOut && nOut < 32)
    val a = spark.read.parquet(in).as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException](Layout.compact(spark, in, in))
  }

  test("z-curve locality: a small 2-D box spans a bounded z-range") {
    // the property pruning relies on: rows inside a dim-aligned box fall in
    // few contiguous z runs. For a power-of-two-aligned box the whole box
    // is ONE contiguous z block; check the 16x16 box at (1024, 2048)
    val zs = for (x <- 1024L until 1040L; y <- 2048L until 2064L)
      yield mortonRef(x, y)
    assert(zs.max - zs.min == 255) // 16*16 box = 256 consecutive z values
  }
}
