package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CentroidStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("centroidstore").toString + "/s"

  private val anchors2d = Seq(
    (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0)))
    .toDF("cluster_id", "centroid")

  private def gridMap(store: String) =
    CentroidStore.serveGrid(spark, store)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("three appends == one-shot union (the store contract); " +
    "assignment ties go to the lowest cluster; replay no-ops") {
    // near 0: (1,1),(2,0); near 10: (9,1),(8,0); equidistant (5,0) -> 0
    val all = Seq(Seq(1.0, 1.0), Seq(2.0, 0.0), Seq(9.0, 1.0),
      Seq(8.0, 0.0), Seq(5.0, 0.0))
    val streamed = tmp(); val oneShot = tmp()
    CentroidStore.create(anchors2d, streamed)
    CentroidStore.create(anchors2d, oneShot)
    all.zipWithIndex.foreach { case (v, i) =>
      CentroidStore.append(Seq(Tuple1(v)).toDF("vec"), "vec",
        streamed, i.toLong)
    }
    CentroidStore.append(all.map(Tuple1(_)).toDF("vec"), "vec",
      oneShot, 0L)
    assert(gridMap(streamed) == gridMap(oneShot))
    // cluster 0 gets (1,1),(2,0),(5,0): means (8/3, 1/3); cluster 1
    // gets (9,1),(8,0): means (8.5, 0.5)
    val g = gridMap(streamed)
    assert(g((0L, 1)) == ((3L, math.rint(8.0 / 3.0 * 1e4) / 1e4)))
    assert(g((0L, 2)) == ((3L, math.rint(1.0 / 3.0 * 1e4) / 1e4)))
    assert(g((1L, 1)) == ((2L, 8.5)) && g((1L, 2)) == ((2L, 0.5)))
    // replaying a manifested batch changes nothing
    CentroidStore.append(Seq(Tuple1(Seq(100.0, 100.0))).toDF("vec"),
      "vec", streamed, 2L)
    assert(gridMap(streamed) == gridMap(oneShot))
    // serve summary: n, first element, norm of rounded means
    val s = CentroidStore.serve(spark, streamed)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val m01 = math.rint(8.0 / 3.0 * 1e4) / 1e4
    val m02 = math.rint(1.0 / 3.0 * 1e4) / 1e4
    assert(s(0L) == ((3L, m01,
      math.rint(math.sqrt(m01 * m01 + m02 * m02) * 1e4) / 1e4)))
    assert(s(1L) == ((2L, 8.5,
      math.rint(math.sqrt(8.5 * 8.5 + 0.25) * 1e4) / 1e4)))
  }

  test("untouched clusters serve their anchors with n = 0; empty " +
    "store serves anchors; compaction invariant + dir sweep") {
    val store = tmp()
    CentroidStore.create(anchors2d, store)
    // nothing appended yet: anchors verbatim, n = 0
    assert(gridMap(store) == Map((0L, 1) -> ((0L, 0.0)),
      (0L, 2) -> ((0L, 0.0)), (1L, 1) -> ((0L, 10.0)),
      (1L, 2) -> ((0L, 0.0))))
    // only cluster 0 touched
    CentroidStore.append(Seq(Tuple1(Seq(2.0, 2.0))).toDF("vec"),
      "vec", store, 1L)
    val g = gridMap(store)
    assert(g((0L, 1)) == ((1L, 2.0)) && g((1L, 1)) == ((0L, 10.0)))
    CentroidStore.append(Seq(Tuple1(Seq(1.0, 0.0))).toDF("vec"),
      "vec", store, 2L)
    val before = gridMap(store)
    CentroidStore.compactStore(spark, store)
    assert(gridMap(store) == before)
    val dirs = new java.io.File(store + "/partials").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab="))
      .map(_.getName)
    assert(dirs.toList == List("ab=-1"), dirs.mkString(","))
    // appends keep composing after compaction
    CentroidStore.append(Seq(Tuple1(Seq(0.0, 2.0))).toDF("vec"),
      "vec", store, 3L)
    val g2 = gridMap(store)
    assert(g2((0L, 1)) == ((3L, 1.0)) && g2((0L, 2)) ==
      ((3L, math.rint(4.0 / 3.0 * 1e4) / 1e4)))
  }

  test("guards: duplicate/ragged anchors, existing store, wrong-dim " +
    "vector fails the append job, null vectors drop, empty batch no-op") {
    val store = tmp()
    intercept[IllegalArgumentException] {
      CentroidStore.create(Seq((0L, Seq(1.0)), (0L, Seq(2.0)))
        .toDF("cluster_id", "centroid"), store)
    }
    intercept[IllegalArgumentException] {
      CentroidStore.create(Seq((0L, Seq(1.0)), (1L, Seq(1.0, 2.0)))
        .toDF("cluster_id", "centroid"), store)
    }
    CentroidStore.create(anchors2d, store)
    intercept[IllegalArgumentException] {
      CentroidStore.create(anchors2d, store)
    }
    intercept[Exception] {
      CentroidStore.append(Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("vec"),
        "vec", store, 1L)
    }
    // the failed append is not manifested: batch 1 can retry
    CentroidStore.append(
      Seq(Tuple1(Seq(1.0, 1.0)),
        Tuple1(null.asInstanceOf[Seq[Double]])).toDF("vec"),
      "vec", store, 1L)
    assert(gridMap(store)((0L, 1)) == ((1L, 1.0)))
    CentroidStore.append(Seq(Tuple1(Seq(1.0, 1.0))).toDF("vec")
      .limit(0), "vec", store, 9L)
    assert(gridMap(store)((0L, 1)) == ((1L, 1.0)))
  }
}
