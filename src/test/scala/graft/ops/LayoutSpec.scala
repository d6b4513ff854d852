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

  /** Bit-at-a-time N-dim reference interleave. */
  private def mortonRefN(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = xs.length
    for (i <- xs.indices; b <- 0 until bits)
      z |= ((xs(i) >> b) & 1L) << (n * b + i)
    z
  }

  test("zValueN matches the bit-at-a-time reference on 3 dims (16 bits each)") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(1000)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
        rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L, 0L), (65535L, 65535L, 65535L), (65535L, 0L, 1L))
    val got = pts.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        Layout.zValueN(Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, w, z) =>
      assert(z == mortonRefN(Seq(x, y, w), 16), s"($x,$y,$w)")
    }
  }

  test("zValueN on 2 dims equals the magic-number zValue") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val diff = pts.toDF("x", "y")
      .select((Layout.zValueN(Seq(col("x"), col("y"))) =!=
        Layout.zValue(col("x"), col("y"))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("zValueN masks each dim to its bit budget and fits a signed 64-bit") {
    // 4 dims -> 15 bits each -> 60-bit result; overflow bits masked away
    val got = Seq((1L << 15 | 5L, 3L, 2L, 1L)).toDF("a", "b", "c", "d")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c"), col("d"))))
      .as[Long].head()
    assert(got == mortonRefN(Seq(5L, 3L, 2L, 1L), 15))
    assert(got >= 0L)
  }

  test("zValueN past 62 dims is refused with the bit-budget named") {
    // 62/n truncates to 0 bits past 62 dims — must be a loud contract
    // error, not an opaque empty-reduce failure
    val e = intercept[IllegalArgumentException] {
      Layout.zValueN((1 to 63).map(i => lit(i.toLong)))
    }
    assert(e.getMessage.contains("62"))
    // 62 dims is the edge: 1 bit each, still a valid interleave
    val edge = Seq(1).toDF("x")
      .select(Layout.zValueN((1 to 62).map(i => lit(i % 2L))))
      .as[Long].head()
    assert(edge >= 0L)
  }

  test("3-dim z-curve locality + min/max pruning: an aligned box is one z run") {
    // rows inside an 8x8x8 dim-aligned box occupy 512 CONSECUTIVE z values
    // — the property that lets per-file min/max stats prune a 3-column
    // predicate after zOrderByN clustering
    val zs = for (x <- 512L until 520L; y <- 1024L until 1032L;
                  w <- 2048L until 2056L)
      yield mortonRefN(Seq(x, y, w), 16)
    assert(zs.max - zs.min == 511)

    // and end-to-end: cluster 3-D data, then check the files (partitions)
    // that contain box rows are a small subset — i.e. min/max on z prunes
    val rnd = new scala.util.Random(19)
    val df = Seq.fill(8000)((rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)).toDF("x", "y", "w")
    val parts = Layout.zOrderByN(df, Seq(col("x"), col("y"), col("w")),
        partitions = 8)
      .withColumn("hit", col("x") < 256 && col("y") < 256 && col("w") < 256)
      .select("z", "hit").rdd
      .mapPartitions(it => {
        val rows = it.toSeq
        Iterator.single((rows.nonEmpty && rows.exists(_.getBoolean(1)),
          rows.nonEmpty))
      }).collect()
    val withBox = parts.count(_._1)
    val nonEmpty = parts.count(_._2)
    // the box is 1/4096 of each dim-cube = z-prefix-localized; it must not
    // smear across all 8 files
    assert(withBox <= math.max(1, nonEmpty / 4),
      s"box rows hit $withBox of $nonEmpty z-ranged files — no locality")
  }

  test("quantileBucket balances skewed data and is monotone in the value") {
    val rnd = new scala.util.Random(23)
    // heavily skewed: 90% of mass in [0,10), long tail to 10000
    val vals = Seq.fill(5000)(
      if (rnd.nextDouble() < 0.9) rnd.nextDouble() * 10
      else rnd.nextDouble() * 10000)
    val df = vals.toDF("v")
    val bucketed = df.select(col("v"),
      Layout.quantileBucket(df, "v", 16).as("qb"))
    val sizes = bucketed.groupBy("qb").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keys.forall(b => b >= 0 && b < 16))
    // equal-frequency: every bucket within 2x of the ideal share
    val ideal = 5000.0 / 16
    sizes.values.foreach(n => assert(n < ideal * 2 && n > ideal / 2,
      s"bucket sizes unbalanced: $sizes"))
    // monotone: sorting by (qb, v) == sorting by v
    val byBucket = bucketed.orderBy("qb", "v").select("v").as[Double].collect()
    assert(byBucket.toSeq == vals.sorted)
  }

  test("quantileBucket + zOrderByN: skewed columns still cluster with disjoint z-ranges") {
    val rnd = new scala.util.Random(29)
    // both dims heavily skewed — raw masking would collapse most rows
    // into a few z codes; quantile bucketing restores resolution
    val df = Seq.fill(4000)((math.pow(rnd.nextDouble(), 8) * 1e6,
      math.pow(rnd.nextDouble(), 8) * 1e6)).toDF("a", "b")
    val qa = Layout.quantileBucket(df, "a", 256)
    val qb = Layout.quantileBucket(df, "b", 256)
    val parts = Layout.zOrderByN(df, Seq(qa, qb), partitions = 4)
      .select("z").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach(p => assert(p == p.sorted))
    val ranges = parts.map(p => (p.min, p.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // resolution actually used: many distinct z codes, not a collapsed few
    assert(parts.flatten.distinct.size > 1000)
  }

  test("compact guard: trailing-slash spelling of the same dir is rejected") {
    val in = java.nio.file.Files.createTempDirectory("graft_guard").toString
    spark.range(0, 10).write.mode("overwrite").parquet(in)
    intercept[IllegalArgumentException](Layout.compact(spark, in, in + "/"))
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
