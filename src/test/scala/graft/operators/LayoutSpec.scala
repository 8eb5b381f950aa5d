package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C98: the Morton key must match a driver-side reference interleave
  * bit-for-bit, file assignment must respect the equal-width contract,
  * and the pruning report must show z-order's multi-dimensional locality
  * beating a single-dimension sort on a box probe. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def refZ(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; i <- xs.indices)
      z |= ((xs(i) >> b) & 1L) << (b * xs.length + i)
    z
  }

  test("C98: zOrderKey equals the reference interleave on random dims (2 and 3 dims)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
      rnd.nextInt(128).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(col("x"), col("y"),
      Layout.zOrderKey(Seq(col("x"), col("y")), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, z) =>
      assert(z == refZ(Seq(x, y), 16), s"($x,$y)") }
    val got3 = df.select(col("x") % 128, col("y") % 128, col("w"),
      Layout.zOrderKey(Seq(col("x") % 128, col("y") % 128, col("w")), 7).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (x, y, w, z) =>
      assert(z == refZ(Seq(x, y, w), 7), s"($x,$y,$w)") }
    // interleave is a bijection on the padded domain: no collisions
    assert(got2.map(_._3).distinct.length == got2.map(t => (t._1, t._2)).distinct.length)
  }

  test("C98: assignFiles is the equal-width contract; bounds hold; empty-safe stats") {
    val df = (0L until 1000L).toDF("k")
    val assigned = Layout.assignFiles(df, col("k"), 10)
    val got = assigned.select(col("k"), col("__file")).as[(Long, Long)].collect()
    got.foreach { case (k, f) => assert(f == k * 10 / 1000, s"k=$k") }
    assert(got.map(_._2).distinct.sorted.toSeq == (0L to 9L))
    // stats carry min/max per file for every dim
    val stats = Layout.fileStats(assigned.withColumn("d2", col("k") % 7), Seq("k", "d2"))
    assert(stats.count() == 10)
    val row = stats.filter(col("__file") === 3).head()
    assert(row.getAs[Long]("min_k") == 300L && row.getAs[Long]("max_k") == 399L)
  }

  test("C98: REAL parquet footers carry the computed stats — file skipping is physical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zlayout").toString
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val zkey = Layout.zOrderKey(Seq(col("x"), col("y")), 6)
    Layout.writeClustered(grid, zkey, 64, dir)
    // the footers of the written layout must agree with the computed
    // stats frame EXACTLY — what engine-side skipping consults is what
    // the audit predicted
    val computed = Layout.fileStats(Layout.assignFiles(grid, zkey, 64), Seq("x", "y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val physical = Layout.footerStats(spark, dir, Seq("x", "y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(physical == computed, "footer stats must equal the audit's stats frame")
    // and the pruning verdict on real footers matches the simulated one
    val probe = Seq(("x", 8L, 23L), ("y", 8L, 23L))
    val fromFooters = Layout.filesTouched(
      Layout.footerStats(spark, dir, Seq("x", "y")), probe)
      .as[(Long, Long)].head()
    val simulated = Layout.filesTouched(
      Layout.fileStats(Layout.assignFiles(grid, zkey, 64), Seq("x", "y")), probe)
      .as[(Long, Long)].head()
    assert(fromFooters == simulated)
    // Spark's own scan proves the skip: reading the clustered layout with
    // the box predicate must produce exactly the box
    val read = spark.read.parquet(dir)
      .filter(col("x").between(8, 23) && col("y").between(8, 23))
    assert(read.count() == 16L * 16L)
  }

  test("C104: compaction plan packs files in cluster order, covers all rows, respects the target") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val stats = Layout.fileStats(
      Layout.assignFiles(grid, Layout.zOrderKey(Seq(col("x"), col("y")), 6), 64),
      Seq("x", "y"))
    val plan = Layout.compactionPlan(stats, targetRows = 256, Seq("x", "y"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    // every row and every file is covered exactly once
    assert(plan.map(_._3).sum == 64L * 64L, "row total")
    assert(plan.map(_._2).sum == 64L, "file total")
    // groups are contiguous, non-overlapping file spans in cluster order
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"spans must not overlap: $a $b")
      case _ => ()
    }
    // the prefix-sum rule: every group except possibly the last reaches
    // the target once its last file lands (cum_prev < target * (g+1))
    plan.dropRight(1).foreach { g =>
      assert(g._3 >= 256 - 64 + 1, s"group ${g._1} too small: ${g._3} rows")
    }
    // uniform 8x8 tiles of 64 rows → exactly 4 files per 256-row group
    assert(plan.forall(_._2 == 4) && plan.length == 16)
    // group envelopes equal the union of their files' envelopes
    val byFile = stats.as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    plan.foreach { g =>
      val files = (g._4 to g._5).flatMap(byFile.get)
      assert(g._6 == files.map(_._3).min && g._7 == files.map(_._4).max, s"x envelope of $g")
      assert(g._8 == files.map(_._5).min && g._9 == files.map(_._6).max, s"y envelope of $g")
    }
  }

  test("C98: on a uniform grid, z-order prunes a box probe; a 1-D sort cannot") {
    // 64x64 grid of points, 64 files: the z-layout packs 8x8 tiles per
    // file, so a 16x16 box touches exactly the 4-9 overlapping tiles; the
    // x-sorted layout slices the grid into x-strips, and a box spanning
    // 16 x-values touches every strip in that x range but ALL y — more
    // files than tiles once the y band is selective.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val z = Layout.fileStats(
      Layout.assignFiles(grid, Layout.zOrderKey(Seq(col("x"), col("y")), 6), 64),
      Seq("x", "y"))
    val xs = Layout.fileStats(
      Layout.assignFiles(grid, col("x"), 64), Seq("x", "y"))
    val probe = Seq(("x", 8L, 23L), ("y", 8L, 23L))
    val (zt, ztot) = Layout.filesTouched(z, probe)
      .as[(Long, Long)].head()
    val (xt, xtot) = Layout.filesTouched(xs, probe)
      .as[(Long, Long)].head()
    assert(ztot == 64 && xtot == 64)
    // 16x16 box over 8x8 tiles: at most 3x3 = 9 tiles overlap
    assert(zt <= 9, s"z-order touched $zt files")
    // x-sorted: every one of the 16 x-strips overlaps the box
    assert(xt == 16, s"x-sort touched $xt files")
    assert(zt < xt, "z-order must beat the 1-D sort on a box probe")
  }

  test("C123: REAL parquet bloom filters prune point lookups where min/max cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // a date-clustered layout whose id column is SCATTERED: every file's
    // id range spans ~the whole domain, so range skipping is useless for
    // an id lookup — exactly the bloom filter's case. ids are a bijection
    // (reversed within the day) so present/absent is deterministic.
    val rows = (for (day <- 0L until 16L; i <- 0L until 200L)
      yield (day, day * 200L + (199L - i))).toDF("day", "id")
    Layout.writeClusteredWithBloom(rows, col("day"), 16, dir,
      bloomCol = "id", ndv = 200L)
    val present = Seq(0L, 399L, 1600L, 3199L) // days 0, 1, 8, 15
    val absent = Seq(999999L, 555555L)
    val got = Layout.bloomProbe(spark, dir, "id", present ++ absent)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (k <- present) {
      val (total, range, bloom) = got(k)
      assert(total == 16L)
      // min/max: file f holds ids [f*200, f*200+199] — contiguous per
      // file here, so range DOES prune this fixture; the point is bloom
      // NEVER misses the owner...
      assert(bloom >= 1L, s"key $k: bloom must pass its owner file")
      // ...and never passes (beyond false positives) what range proves
      // impossible: the owner file passes both
      assert(range >= 1L)
    }
    // scattered fixture for the range-useless case: ids striped ACROSS
    // files so every file's [min, max] covers the domain
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bloom2").toString
    val striped = (for (f <- 0L until 16L; i <- 0L until 200L)
      yield (f, i * 16L + f)).toDF("day", "id") // file f: ids ≡ f (mod 16)
    Layout.writeClusteredWithBloom(striped, col("day"), 16, dir2,
      bloomCol = "id", ndv = 200L)
    // mid-domain keys (edge keys would let min/max prune after all):
    // residues 0, 1, 2, 3 — one owner file each
    val probes = Seq(1600L, 1617L, 1634L, 1651L)
    val got2 = Layout.bloomProbe(spark, dir2, "id", probes)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (k <- probes) {
      val (total, range, bloom) = got2(k)
      assert(total == 16L)
      assert(range == 16L, s"key $k: striped ranges must NOT prune (got $range)")
      assert(bloom < 16L, s"key $k: bloom must prune striped files")
      assert(bloom >= 1L, s"key $k: no false negatives")
    }
    // absent keys: bloom may false-positive a few files, never all
    val gotAbs = Layout.bloomProbe(spark, dir2, "id", Seq(777777L))
      .as[(Long, Long, Long, Long)].head()
    assert(gotAbs._4 < 16L, s"absent key passed all files: $gotAbs")
  }

  test("C106: sampled advisor verdict matches the exact advisor on real data (sf0.01)") {
    // the q186 shape on the real orders table one SF up from the suite
    // default: the exact advisor (5 full re-cluster passes) and the
    // hash-sampled advisor (1% and 10%) must agree on the decision —
    // the winning candidate and the full cheap-to-costly ordering
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val base = orders.select(
      (col("o_custkey") % 65536).cast("long").as("ck"),
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
        .cast("long").as("dd"),
      expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) div 100000")
        .as("pb"),
      col("o_orderkey"))
    val dims = Seq("ck", "dd", "pb")
    val candidates = Seq(
      ("sort_ck" -> col("ck")),
      ("sort_dd" -> col("dd")),
      ("z_ck_dd" -> Layout.zOrderKey(Seq(col("ck"), col("dd")))),
      ("z_ck_pb" -> Layout.zOrderKey(Seq(col("ck"), col("pb")))),
      ("z_dd_pb" -> Layout.zOrderKey(Seq(col("dd"), col("pb")))))
    val workload = Seq(
      Seq(("ck", 100L, 199L)),
      Seq(("dd", 365L, 729L)),
      Seq(("ck", 100L, 199L), ("dd", 365L, 729L)),
      Seq(("pb", 100L, 150L)),
      Seq(("ck", 100L, 199L), ("pb", 100L, 150L)))
    def ordering(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy(col("workload_files_touched").asc, col("candidate").asc)
        .select("candidate").as[String].collect().toSeq
    val exact = ordering(Layout.advise(base, dims, candidates, workload))
    for (ppm <- Seq(10000L, 100000L)) {  // 1% and 10%
      val sampled = ordering(Layout.adviseSampled(base, col("o_orderkey"), ppm,
        dims, candidates, workload))
      assert(sampled.head == exact.head,
        s"fraction ${ppm}ppm picked ${sampled.head}, exact picked ${exact.head}")
      assert(sampled == exact,
        s"fraction ${ppm}ppm ordering $sampled vs exact $exact")
    }
    // determinism: the sample is hash-keyed, so the verdict replays
    val again = ordering(Layout.adviseSampled(base, col("o_orderkey"), 10000L,
      dims, candidates, workload))
    assert(again == ordering(Layout.adviseSampled(base, col("o_orderkey"), 10000L,
      dims, candidates, workload)))
  }
}
