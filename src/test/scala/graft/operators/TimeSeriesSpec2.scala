package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** changePoint + seasonalDecompose (TimeSeriesSpec covers the earlier
  * resample/outlier/islands/ewma surface). */
class TimeSeriesSpec2 extends SparkSpec {
  import spark.implicits._

  // --- changePoint ---------------------------------------------------------

  test("changePoint finds a planted level shift at its boundary") {
    // level 10 for keys 1..20, level 30 for 21..40 → |cusum| peaks at 20
    val df = (1 to 40).map(i => (i, if (i <= 20) 10.0 else 30.0)).toDF("k", "v")
    val r = TimeSeries.changePoint(df, "k", "v").collect().head
    assert(r.getInt(0) == 20)
    // mean = 20; cusum at 20 = 20·(10−20) = −200
    assert(r.getDouble(1) == 200.0)
    assert(r.getDouble(2) == 20.0)
    assert(r.getLong(3) == 40L)
  }

  test("changePoint: flat series → zero strength, earliest-key tie-break") {
    val df = (1 to 10).map(i => (i, 5.0)).toDF("k", "v")
    val r = TimeSeries.changePoint(df, "k", "v").collect().head
    assert(r.getDouble(1) == 0.0)
    assert(r.getInt(0) == 1) // every key ties at 0 → earliest wins
  }

  // --- seasonalDecompose ---------------------------------------------------

  test("seasonalDecompose recovers a planted trend + weekly seasonality exactly") {
    val period = 7
    val seasonal = Array(3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0) // sums to 0
    // linear trend + seasonal, NO noise → centered MA of a linear trend
    // is the trend itself and residuals vanish where trend exists
    val df = (0 until 42).map { t =>
      (t, 100.0 + 2.0 * t + seasonal(t % period))
    }.toDF("k", "v")
    val out = TimeSeries.seasonalDecompose(df, "k", "v", period)
      .orderBy("k").collect()
    assert(out.length == 42)
    for (r <- out) {
      val t = r.getInt(0)
      if (t < 3 || t >= 39) {
        assert(r.isNullAt(2), s"edge trend at $t")
        assert(r.isNullAt(4), s"edge residual at $t")
      } else {
        assert(r.getDouble(2) == 100.0 + 2.0 * t, s"trend at $t")
        assert(r.getDouble(4) == 0.0, s"residual at $t")
      }
      assert(r.getDouble(3) == seasonal(t % period), s"seasonal at $t")
    }
    // seasonal components re-center to zero over one period
    val s = out.take(7).map(_.getDouble(3)).sum
    assert(math.abs(s) < 1e-9)
  }

  test("seasonalDecompose: even periods are rejected, short series all-null trend") {
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(Seq((1, 1.0)).toDF("k", "v"), "k", "v", 4)
    }
    val short = (0 until 3).map(t => (t, t.toDouble)).toDF("k", "v")
    val out = TimeSeries.seasonalDecompose(short, "k", "v", 5)
      .orderBy("k").collect()
    assert(out.forall(_.isNullAt(2)))
    assert(out.forall(_.isNullAt(3))) // no phase ever had a trend row
  }
}
