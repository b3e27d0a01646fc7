package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** hllRolling: the trailing-window register merge must equal running
  * [[Sketches.hllDistinct]] over each window's raw rows — union really is
  * per-bucket max — including across gaps, and windowDays = 1 collapses
  * to the per-day sketch. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val rows: Seq[(Date, Long)] = Seq(
    // three consecutive days, heavy overlap, then a 10-day gap
    "2024-01-01" -> (1L to 40L),
    "2024-01-02" -> (21L to 60L),
    "2024-01-03" -> (51L to 90L),
    "2024-01-13" -> (1L to 25L)
  ).flatMap { case (day, ids) => ids.map(i => (d(day), i)) }

  test("rolling estimate == hllDistinct over each trailing window's raw rows") {
    val df = rows.toDF("ts", "user_id").repartition(7)
    val got = Sketches.hllRolling(df, "ts", "user_id", p = 6, windowDays = 7)
      .orderBy("day")
      .as[(Date, Long, Long, Long)].collect().toSeq
    val days = rows.map(_._1).distinct.sortBy(_.toString)
    val expected = days.map { day =>
      val lo = Date.valueOf(day.toLocalDate.minusDays(6))
      val win = rows.filter { case (dd, _) =>
        !dd.after(day) && !dd.before(lo)
      }.map(_._2)
      val r = Sketches.hllDistinct(
          win.map(v => ("x", v)).toDF("g", "v"), Seq("g"), "v", p = 6)
        .select("v_empty", "reg_sum", "n_distinct_est")
        .as[(Long, Long, Long)].collect().head
      (day, r._1, r._2, r._3)
    }
    assert(got == expected,
      s"rolling register merge must equal the window recompute:\n$got\nvs\n$expected")
    // the gap day must NOT see the pre-gap users: its window is day 13
    // alone, so its estimate matches the 25-user singleton sketch
    assert(got.last._1 == d("2024-01-13"))
  }

  test("windowDays = 1 collapses to the per-day sketch") {
    val df = rows.toDF("ts", "user_id")
    val got = Sketches.hllRolling(df, "ts", "user_id", p = 6, windowDays = 1)
      .orderBy("day")
      .as[(Date, Long, Long, Long)].collect().toSeq
    val daily = rows.groupBy(_._1).toSeq.sortBy(_._1.toString).map {
      case (day, rs) =>
        val r = Sketches.hllDistinct(
            rs.map(v => ("x", v._2)).toDF("g", "v"), Seq("g"), "v", p = 6)
          .select("v_empty", "reg_sum", "n_distinct_est")
          .as[(Long, Long, Long)].collect().head
        (day, r._1, r._2, r._3)
    }
    assert(got == daily)
  }
}
