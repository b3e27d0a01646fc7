package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Z-order layout: the Morton interleave itself, and the measurable
  * pruning claim — a 2-d box predicate touches a small fraction of
  * z-ordered files where a 1-d sorted layout cannot skip anything on the
  * non-sort column. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("zValue interleaves bits (hand-computed Morton codes)") {
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val z = Layout.zValue(Seq((col("x"), 0.0, 4.0), (col("y"), 0.0, 4.0)), bits = 2)
    val got = df.select(col("x"), col("y"), z.as("z")).as[(Long, Long, Long)]
      .collect().toSet
    // 2-bit buckets over [0,4): value==bucket. x takes the high bit per
    // level: z(x=3,y=0) = 1010b = 10; z(0,3) = 0101b = 5; z(3,3) = 15;
    // z(2,1) = 1001b = 9
    assert(got == Set((3L, 0L, 10L), (0L, 3L, 5L), (3L, 3L, 15L), (2L, 1L, 9L)), s"$got")
  }

  test("z-ordered files prune a 2-d box; 1-d sort cannot prune the other dim") {
    val n = 20000
    val pts = (0 until n).map { i =>
      (graft.functions.Mix.splitmix64(0x20e4L + i) & 1023L,
        graft.functions.Mix.splitmix64(0x77abL + i) & 1023L)
    }.toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("layout_z").toString
    val xdir = java.nio.file.Files.createTempDirectory("layout_x").toString
    Layout.zorderWrite(pts, Seq("x", "y"), zdir, numFiles = 64, bits = 8)
    // 1-d comparison layout: globally sorted by x into the same file count
    pts.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)
    // box: x,y both in [0, 96) — ~0.9% of the 1024x1024 space
    val box = Seq(("x", 0.0, 95.0), ("y", 0.0, 95.0))
    val (zTouched, zTotal) = Layout.filesTouched(spark, zdir, box)
    val (xTouched, xTotal) = Layout.filesTouched(spark, xdir, box)
    assert(zTotal == 64 && xTotal == 64, s"file counts: z=$zTotal x=$xTotal")
    assert(zTouched <= 6,
      s"z-order must confine the box to a few Morton segments, touched $zTouched/64")
    // the x-sorted layout prunes on x (the sort column)...
    assert(xTouched <= 12, s"x-sort should prune on x, touched $xTouched/64")
    // ...but a filter on the OTHER dimension alone cannot skip anything
    val (yOnlyX, _) = Layout.filesTouched(spark, xdir, Seq(("y", 0.0, 95.0)))
    val (yOnlyZ, _) = Layout.filesTouched(spark, zdir, Seq(("y", 0.0, 95.0)))
    assert(yOnlyX >= 60, s"x-sorted layout cannot prune a y filter, touched $yOnlyX/64")
    assert(yOnlyZ <= yOnlyX / 2,
      s"z-order must prune the single-column y filter too: $yOnlyZ vs $yOnlyX")
    // layout changes bytes-on-disk locality, never content
    val back = spark.read.parquet(zdir).as[(Long, Long)].collect().toSet
    assert(back == pts.as[(Long, Long)].collect().toSet, "z-order must preserve rows exactly")
  }

  test("null and constant columns do not break the bucket map") {
    val df = Seq((Some(1L), 5L), (None, 5L), (Some(3L), 5L)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("layout_nulls").toString
    Layout.zorderWrite(df, Seq("a", "b"), dir, numFiles = 2, bits = 4)
    assert(spark.read.parquet(dir).count() == 3, "rows with NULL z-cols must survive")
  }

  test("shuffleShards: a complete permutation — contiguous positions, balanced shards, md5 order") {
    val ids = (1L to 2000L)
    val got = Layout.shuffleShards(ids.toDF("doc_id").repartition(9), "doc_id",
        nShards = 16, epoch = 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).sorted == ids.toSeq, "every id exactly once")
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet == (0L until 16L).toSet, "all shards populated")
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq,
        s"shard $s positions must be contiguous from 1")
      // 2000/16 = 125 expected; 4σ of binomial(2000, 1/16) ≈ 44
      assert(math.abs(rows.size - 125) <= 50, s"shard $s holds ${rows.size}")
    }
    // order parity with a literal md5 replay
    def h(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuf:0:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val expect = ids.map(i => (i, h(i))).groupBy(_._2 % 16).flatMap {
      case (s, members) =>
        members.sortBy { case (id, hv) => (hv, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, s, i + 1L) }
    }.toSet
    assert(got.toSet == expect, "md5-order parity with the literal replay")
  }

  test("shuffleShards: a new epoch is an independent permutation; same epoch is identical") {
    val ids = (1L to 400L).toDF("doc_id")
    def run(e: Int) = Layout.shuffleShards(ids, "doc_id", nShards = 4, epoch = e)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val e0a = run(0); val e0b = run(0); val e1 = run(1)
    assert(e0a == e0b, "same epoch replays identically — restart resumes, never reshuffles")
    assert(e0a != e1, "a new epoch must re-permute")
    assert(e0a.map(r => (r._2, r._3)).toSet != e1.map(r => (r._2, r._3)).toSet ||
      e0a.map(_._1) == e1.map(_._1), "different slot assignment across epochs")
  }
}
