package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (px, py) =>
        px >= x && py >= y && (px > x || py > y) }
    }.toSet

  test("pareto: hand case — staircase survives, dominated drop, duplicates counted") {
    val pts = Seq(
      (1.0, 9.0), (3.0, 7.0), (5.0, 5.0), (9.0, 1.0), // frontier
      (2.0, 2.0), (4.0, 4.0), (3.0, 6.0),             // dominated
      (5.0, 5.0))                                     // duplicate of a frontier pt
      .toDF("x", "y")
    val out = Skyline.pareto(pts, "x", "y")
      .as[(Double, Double, Long)].collect().toList.sortBy(_._1)
    assert(out.map(r => (r._1, r._2)) ==
      List((1.0, 9.0), (3.0, 7.0), (5.0, 5.0), (9.0, 1.0)))
    assert(out.find(_._1 == 5.0).get._3 == 2L, "duplicate frontier rows counted")
  }

  test("pareto: equal-x keeps only the max-y; single point; matches brute force") {
    val twoAtX = Seq((4.0, 1.0), (4.0, 8.0)).toDF("x", "y")
    assert(Skyline.pareto(twoAtX, "x", "y")
      .as[(Double, Double, Long)].collect().toList == List((4.0, 8.0, 1L)))

    assert(Skyline.pareto(Seq((1.0, 1.0)).toDF("x", "y"), "x", "y").count() == 1)

    // randomized-ish grid vs brute force, across bucket counts
    val grid = for (i <- 0 until 30) yield
      (((i * 37) % 17).toDouble, ((i * 53) % 13).toDouble)
    val df = grid.toDF("x", "y")
    val expected = brute(grid)
    for (b <- Seq(1, 4, 64)) {
      val got = Skyline.pareto(df, "x", "y", buckets = b)
        .select($"x", $"y").as[(Double, Double)].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
    intercept[IllegalArgumentException](Skyline.pareto(df, "x", "y", 0))
  }
}
