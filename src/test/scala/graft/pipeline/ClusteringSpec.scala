package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Integer Lloyd k-means: hand-checkable separation, empty-cluster
  * centroid retention, truncating-division centroid parity on negatives,
  * and randomized agreement with a literal driver-side Lloyd replay
  * (seeding, argmin tie-break, floor-div update — the whole recurrence,
  * not just the final labels). */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private def df(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  /** The repo's md5-h60 over "km:<id>" — the seed order both engines use. */
  private def h60(v: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"km:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  /** Literal driver-side replay of the documented recurrence. */
  private def bruteLloyd(vecs: Seq[(Long, Seq[Float])], k: Int,
                         rounds: Int): Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000).toLong).toArray)
    }
    var cents: Seq[(Long, Array[Long])] =
      q.sortBy { case (id, _) => (h60(id), id) }.take(k)
        .zipWithIndex.map { case ((_, v), i) => (i.toLong, v.clone) }
    def d2(x: Array[Long], c: Array[Long]): Long =
      x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    def assignAll() = q.map { case (id, v) =>
      val (c, d) = cents.map { case (c, cv) => (c, d2(v, cv)) }
        .minBy { case (c, d) => (d, c) }
      (id, c, d, v)
    }
    (0 until rounds).foreach { _ =>
      val byC = assignAll().groupBy(_._2)
      cents = cents.map { case (c, old) =>
        byC.get(c) match {
          case Some(members) =>
            val n = members.size
            val dims = members.head._4.length
            // BigInt / truncates toward zero — the Spark DIV / DuckDB //
            // semantics the operator documents
            (c, Array.tabulate(dims) { d =>
              (members.map(m => BigInt(m._4(d))).sum / n).toLong
            })
          case None => (c, old)
        }
      }
    }
    assignAll().map { case (id, c, d, _) => id -> (c, d) }.toMap
  }

  /** Driver-side replay of the simplified-silhouette readout on top of
    * the same Lloyd recurrence: per vector the two smallest (d², c),
    * IEEE-sqrt floors, ppm silhouette, per-cluster truncating mean. */
  private def bruteSilhouette(vecs: Seq[(Long, Seq[Float])], k: Int,
                              rounds: Int): Set[(Long, Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000).toLong).toArray)
    }
    var cents: Seq[(Long, Array[Long])] =
      q.sortBy { case (id, _) => (h60(id), id) }.take(k)
        .zipWithIndex.map { case ((_, v), i) => (i.toLong, v.clone) }
    def d2(x: Array[Long], c: Array[Long]): Long =
      x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    (0 until rounds).foreach { _ =>
      val byC = q.map { case (id, v) =>
        (cents.map { case (c, cv) => (c, d2(v, cv)) }.minBy { case (c, d) => (d, c) }._1, v)
      }.groupBy(_._1)
      cents = cents.map { case (c, old) =>
        byC.get(c) match {
          case Some(members) =>
            (c, Array.tabulate(old.length) { d =>
              (members.map(m => BigInt(m._2(d))).sum / members.size).toLong
            })
          case None => (c, old)
        }
      }
    }
    val perVec = q.map { case (_, v) =>
      val ds = cents.map { case (c, cv) => (d2(v, cv), c) }.sorted
      val (a2, c1) = ds.head
      val b2 = ds(1)._1
      val a = math.floor(math.sqrt(a2.toDouble)).toLong
      val b = math.floor(math.sqrt(b2.toDouble)).toLong
      (c1, if (math.max(a, b) > 0) (b - a) * 1000000L / math.max(a, b) else 0L)
    }
    perVec.groupBy(_._1).map { case (c, m) =>
      (c, m.size.toLong, (m.map(v => BigInt(v._2)).sum / m.size).toLong)
    }.toSet
  }

  test("two obvious blobs separate, assignments and dist2 exact") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0.9f, 0.9f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.1f, 1.1f)),
      (4L, Seq(-0.9f, -0.9f)), (5L, Seq(-1.0f, -1.0f)), (6L, Seq(-1.1f, -1.1f)))
    val got = Clustering.kmeansAssign(df(vecs), "vec_id", "embedding",
        k = 2, rounds = 3)
      .select("vec_id", "cluster", "dist2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val clusters = got.groupBy(_._2._1).view.mapValues(_.keySet.toSet).toMap
    assert(clusters.values.toSet == Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)),
      s"blobs must separate: $got")
    assert(got == bruteLloyd(vecs, 2, 3), "exact dist2/cluster parity")
  }

  test("empty cluster keeps its previous centroid (no reseeding)") {
    // k = 3 over 2 distinct points: one seed never captures anything
    // after the first update and must stay where it was seeded
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(-1f, 0f)))
    val got = Clustering.kmeansAssign(df(vecs), "vec_id", "embedding",
        k = 3, rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == bruteLloyd(vecs, 3, 4))
  }

  test("negative components: centroid floor-div truncates toward zero like the oracle") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(-0.3f)), (2L, Seq(-0.4f)), (3L, Seq(0.7f)), (4L, Seq(0.8f)))
    val got = Clustering.kmeansAssign(df(vecs), "vec_id", "embedding",
        k = 2, rounds = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == bruteLloyd(vecs, 2, 2))
  }

  test("randomized agreement with the literal Lloyd replay, any partitioning") {
    val vecs: Seq[(Long, Seq[Float])] = (1L to 120L).map { i =>
      val r = graft.functions.Mix.splitmix64(0x5eedL + i)
      (i, (0 until 6).map { d =>
        (((graft.functions.Mix.splitmix64(r + d) >>> 40).toFloat / (1 << 24)) - 0.5f)
      })
    }
    val expected = bruteLloyd(vecs, 5, 3)
    val got = Clustering.kmeansAssign(
        df(vecs).repartition(13), "vec_id", "embedding", k = 5, rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
  }

  test("kmeansScore pure-map fold == kmeansAssign shuffle argmin, bit for bit") {
    val vecs: Seq[(Long, Seq[Float])] = (1L to 80L).map { i =>
      val r = graft.functions.Mix.splitmix64(0xf00dL + i)
      (i, (0 until 5).map { d =>
        (((graft.functions.Mix.splitmix64(r + d) >>> 40).toFloat / (1 << 24)) - 0.5f)
      })
    }
    val assigned = Clustering.kmeansAssign(df(vecs), "vec_id", "embedding",
        k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    val scored = Clustering.kmeansScore(df(vecs), df(vecs), "vec_id", "embedding",
        k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(scored == assigned,
      "scoring the training corpus must reproduce the assignment exactly")
  }

  test("silhouette: tight blobs score near 1e6, exact parity with the brute replay") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0.9f, 0.9f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.1f, 1.1f)),
      (4L, Seq(-0.9f, -0.9f)), (5L, Seq(-1.0f, -1.0f)), (6L, Seq(-1.1f, -1.1f)))
    val got = Clustering.kmeansSilhouette(df(vecs), "vec_id", "embedding",
        k = 2, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSilhouette(vecs, 2, 3), s"got $got")
    // two well-separated blobs: every mean silhouette above 0.8
    assert(got.forall(_._3 > 800000L), s"separated blobs must score high: $got")
  }

  test("silhouette: randomized parity with the brute replay, any partitioning") {
    val vecs: Seq[(Long, Seq[Float])] = (1L to 90L).map { i =>
      val r = graft.functions.Mix.splitmix64(0x51L + i)
      (i, (0 until 5).map { d =>
        (((graft.functions.Mix.splitmix64(r + d) >>> 40).toFloat / (1 << 24)) - 0.5f)
      })
    }
    val got = Clustering.kmeansSilhouette(
        df(vecs).repartition(7), "vec_id", "embedding", k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSilhouette(vecs, 4, 2))
    // k = 1 is meaningless for silhouette — loud
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansSilhouette(df(vecs), "vec_id", "embedding", k = 1, rounds = 1)
    }
    assert(e.getMessage.contains("k >= 2"))
  }

  test("summary rolls up sizes and truncating mean inertia") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0.9f, 0.9f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.1f, 1.1f)),
      (4L, Seq(-1.0f, -1.0f)))
    val brute = bruteLloyd(vecs, 2, 2)
    val expected = brute.groupBy(_._2._1).map { case (c, m) =>
      (c, m.size.toLong, m.values.map(v => BigInt(v._2)).sum / m.size)
    }.map { case (c, n, d) => (c, n, d.toLong) }.toSet
    val got = Clustering.kmeansSummary(df(vecs), "vec_id", "embedding",
        k = 2, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }
}
