package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileTable: nulls, exact distincts, mode with tie-break, all-null column") {
    val df = Seq(
      (1L, Some("x"), Option.empty[String]),
      (2L, Some("y"), None),
      (3L, Some("x"), None),
      (4L, None, None))
      .toDF("id", "cat", "dead")
    val out = Profile.profileTable(df, Seq("id", "cat", "dead"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // id: unique longs -> 4 distinct, mode ties broken by min string "1"
    assert(out("id") == ("id", 4L, 0L, 4L, Some("1"), Some(1L)), s"$out")
    // cat: x beats y on count; one null
    assert(out("cat") == ("cat", 4L, 1L, 2L, Some("x"), Some(2L)))
    // dead: all null -> zero distinct, null mode
    assert(out("dead") == ("dead", 4L, 4L, 0L, None, None))
    intercept[IllegalArgumentException](Profile.profileTable(df, Nil))
    intercept[IllegalArgumentException](
      Profile.profileTable(df, Seq("nope")))
  }

  // --- correlationMatrix ---------------------------------------------------

  test("correlationMatrix: exact ±1 on linear columns, hand value on noise") {
    val df = (1 to 20).map { i =>
      (i.toDouble, 2.0 * i + 3.0, -0.5 * i + 10.0)
    }.toDF("x", "y2x", "yneg")
    val out = Profile.correlationMatrix(df, Seq("x", "y2x", "yneg"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((("x", "y2x"))) == ((20L, 1.0)))
    assert(out((("x", "yneg"))) == ((20L, -1.0)))
    assert(out((("y2x", "yneg"))) == ((20L, -1.0)))
  }

  test("correlationMatrix: pairwise null deletion and degenerate nulls") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(5.0)),
      (Some(3.0), None, Some(5.0)),
      (None, Some(8.0), Some(5.0)))
      .toDF("x", "y", "const")
    val rows = Profile.correlationMatrix(df, Seq("x", "y", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = rows((("x", "y")))
    assert(xy.getLong(2) == 2L) // only the two complete rows
    assert(xy.getDouble(3) == 1.0)
    assert(rows((("x", "const"))).isNullAt(3)) // zero variance side
    intercept[IllegalArgumentException](
      Profile.correlationMatrix(df, Seq("x")))
    intercept[IllegalArgumentException](
      Profile.correlationMatrix(df, Seq("x", "x")))
  }

  test("correlationMatrix matches the closed form computed independently") {
    val data = (1 to 150).map { i =>
      val x = ((i * 40507L) % 97).toDouble
      val y = ((i * 2654435761L % 89) % 53).toDouble
      (x, y)
    }
    val out = Profile.correlationMatrix(data.toDF("x", "y"), Seq("x", "y"))
      .collect().head
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    val n = data.size.toDouble
    val sx = data.map(d => BigDecimal(r9(d._1)).setScale(9)).sum.toDouble
    val sy = data.map(d => BigDecimal(r9(d._2)).setScale(9)).sum.toDouble
    val sxy = data.map(d => BigDecimal(r9(d._1 * d._2)).setScale(9)).sum.toDouble
    val sxx = data.map(d => BigDecimal(r9(d._1 * d._1)).setScale(9)).sum.toDouble
    val syy = data.map(d => BigDecimal(r9(d._2 * d._2)).setScale(9)).sum.toDouble
    val exp = math.rint((n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)) * 1e6) / 1e6
    assert(out.getDouble(3) == exp)
  }

  // --- duplicationHistogram ------------------------------------------------

  test("duplicationHistogram: planted cluster sizes read back exactly; " +
    "doc mass conserves; partitioning-invariant") {
    import spark.implicits._
    // 5 unique texts, one text ×3, one ×2 → sizes (1→5), (2→1), (3→1)
    val docs = ((1 to 5).map(i => s"unique $i") ++
      Seq.fill(3)("tripled") ++ Seq.fill(2)("doubled")).toDF("text")
    val out = Profile.duplicationHistogram(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(1L -> ((5L, 5L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 3L))))
    assert(out.values.map(_._2).sum == 10L) // every doc lands somewhere
    val out2 = Profile.duplicationHistogram(docs.repartition(7), "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out2 == out)
  }

  // --- blockingReport ------------------------------------------------------

  test("blockingReport: hand pair accounting; singleton blocks add no " +
    "candidates; one-block degenerate = no reduction; pair counts " +
    "render as exact strings; 1-row input = null ratio") {
    import spark.implicits._
    // blocks of size 3, 2, 1 → candidates 3 + 1 + 0 = 4 of C(6,2) = 15
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Profile.blockingReport(df, Seq("k")).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getString(3) == "4")
    assert(r.getString(4) == "15")
    assert(r.getDouble(5) == math.rint((1.0 - 4.0 / 15) * 1e6) / 1e6)
    // everything in one block: candidates = all pairs, ratio exactly 0
    val one = Seq.fill(5)("x").toDF("k")
    val r1 = Profile.blockingReport(one, Seq("k")).collect().head
    assert(r1.getString(3) == r1.getString(4))
    assert(r1.getDouble(5) == 0.0)
    // 1-row input: all_pairs = 0 → reduction_ratio null, not a
    // DIVIDE_BY_ZERO under ANSI mode
    val single = Seq("z").toDF("k")
    val rs = Profile.blockingReport(single, Seq("k")).collect().head
    assert(rs.getString(3) == "0" && rs.getString(4) == "0")
    assert(rs.isNullAt(5))
  }

  // --- benfordProfile ------------------------------------------------------

  test("benfordProfile: string-exact first digits (decimals, " +
    "sub-1 values, negatives); zeros/nulls drop; all 9 digits " +
    "present with n*p chi2 for absent ones") {
    import spark.implicits._
    val df = Seq[Option[Double]](
      Some(123.45), Some(0.034), Some(-250.0), Some(1.0e-5),
      Some(0.0), None, Some(900.1))
      .toDF("v")
    val out = Profile.benfordProfile(df, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(3), r.get(4))).toMap
    assert(out.keySet == (1 to 9).toSet, "all digits present")
    // digits: 1 (123.45), 3 (0.034), 2 (-250), 1 (1e-5), 9 (900.1)
    assert(out(1)._1 == 2L && out(2)._1 == 1L && out(3)._1 == 1L &&
      out(9)._1 == 1L)
    assert(out(4)._1 == 0L && out(4)._3 != null,
      "absent digit still carries its chi2 term")
    // expected fractions are the Benford curve
    assert(out(1)._2 == math.rint(
      math.rint(math.log(2.0) / math.log(10.0) * 1e9) / 1e9 * 1e6) / 1e6)
  }

  // --- vectorHealth --------------------------------------------------------

  test("vectorHealth: nulls, NaN, zero vectors, ragged dims and the " +
    "norm spread all read back") {
    import spark.implicits._
    val rows: Seq[(String, Option[Seq[Double]])] = Seq(
      ("g", Some(Seq(3.0, 4.0))),          // norm 5
      ("g", Some(Seq(0.0, 0.0))),          // zero vector
      ("g", Some(Seq(1.0, Double.NaN))),   // nonfinite
      ("g", None),                          // null
      ("g", Some(Seq(6.0, 8.0, 0.0))),     // ragged (dim 3), norm 10
      ("h", Some(Seq(1.0, 0.0))))
    val out = Profile.vectorHealth(rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 5L && g.getLong(2) == 1L)  // n, n_null
    assert(g.getLong(3) == 2L)                        // n_dims: 2 and 3
    assert(g.getInt(4) == 2)                          // min dim
    assert(g.getLong(5) == 1L && g.getLong(6) == 1L)  // nonfinite, zero
    assert(g.getDouble(7) == 0.0)                     // norm_min
    assert(g.getDouble(8) == 5.0)                     // median of 0,5,10
    assert(g.getDouble(9) == 10.0)                    // norm_max
    val h = out("h")
    assert(h.getLong(1) == 1L && h.getDouble(8) == 1.0)
  }

  test("keySkew: hand counts/shares, composite + null keys, topK cut, " +
    "summary facts on every row, guards") {
    import org.apache.spark.sql.functions._
    val rows = (Seq.fill(6)(("a", Some(1))) ++ Seq.fill(3)(("b", Some(2))) ++
      Seq.fill(1)(("c", None: Option[Int])))
      .toDF("k1", "k2")
    val out = Profile.keySkew(rows, Seq("k1", "k2"), topK = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6), r.getDouble(7))).toMap
    assert(out.size == 2, "topK cut")
    assert(out(1) == (("a|1", 6L, 60.0, 60.0, 10L, 3L, 3.3333)))
    assert(out(2) == (("b|2", 3L, 30.0, 90.0, 10L, 3L, 3.3333)))
    // the null key renders and ranks when topK admits it
    val all = Profile.keySkew(rows, Seq("k1", "k2"), topK = 10)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(all(3) == "c|NULL")
    intercept[IllegalArgumentException](Profile.keySkew(rows, Nil))
    intercept[IllegalArgumentException](
      Profile.keySkew(rows, Seq("k1"), topK = 0))
  }
}
