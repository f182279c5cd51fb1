package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoldenStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("goldenstore").toString + "/s"

  // (entity, status, prio, day, price, okey) — one column per strategy
  private def df(rows: Seq[(String, String, String, Int, Double, Long)]) =
    rows.toDF("eid", "status", "prio", "day", "price", "okey")

  private val b1 = Seq(
    ("e1", "F", "LOW", 3, 10.0, 101L),
    ("e1", "O", "URGENT", 1, 30.0, 102L),
    ("e2", "P", "MED", 5, 5.0, 201L))
  private val b2 = Seq(
    ("e1", "F", "HI", 2, 20.0, 103L),
    ("e3", "O", "LOW", 7, 7.0, 301L))
  private val b3 = Seq(
    ("e2", "F", "MEDIUM", 4, 50.0, 202L),
    ("e2", "F", "M", 6, 1.0, 203L))

  private def appendAll(store: String,
                        batches: Seq[(Seq[(String, String, String, Int, Double, Long)], Long)]): Unit =
    batches.foreach { case (rows, id) =>
      GoldenStore.append(df(rows), "eid", store, id,
        mostFrequent = Seq("status"), longest = Seq("prio"),
        minOf = Seq("day"), maxOf = Seq("price"),
        latestBy = Some(("day", Seq("okey"))))
    }

  private def batchGolden(rows: Seq[(String, String, String, Int, Double, Long)]): DataFrame =
    Merge.goldenRecord(df(rows), "eid",
      mostFrequent = Seq("status"), longest = Seq("prio"),
      minOf = Seq("day"), maxOf = Seq("price"),
      latestBy = Some(("day", Seq("okey"))))

  private def asMap(d: DataFrame) =
    d.select("eid", "status", "prio", "day", "price", "okey")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getDouble(4),
          r.getLong(5)))).toMap

  test("streamed appends == batch goldenRecord on the union, " +
    "incl. modal count merge across batches and all tie-breaks") {
    val store = tmp()
    appendAll(store, Seq((b1, 1L), (b2, 2L), (b3, 3L)))
    val streamed = asMap(GoldenStore.serve(spark, store))
    val batch = asMap(batchGolden(b1 ++ b2 ++ b3))
    assert(streamed == batch, s"$streamed vs $batch")
    // the cross-batch modal case the fold must get right: e1's 'F'
    // count is 1 in b1 and 1 in b2 — only the merged counts pick 'F'
    assert(streamed("e1")._1 == "F")
    // latest-by: e2's newest day (6) arrives in b3 -> okey 203
    assert(streamed("e2")._5 == 203L)
  }

  test("untouched entities' rows unchanged by an append; replay no-ops") {
    val store = tmp()
    appendAll(store, Seq((b1, 1L)))
    val before = asMap(GoldenStore.serve(spark, store))
    // b2 touches e1 and e3 only: e2's golden row must be byte-identical
    appendAll(store, Seq((b2, 2L)))
    val after = asMap(GoldenStore.serve(spark, store))
    assert(after("e2") == before("e2"))
    // and e2's ab=1 partial files were not rewritten
    // (the append touches only the batch's own ab= partition)
    // replay of an applied batchId is a completed append: state unchanged
    appendAll(store, Seq((b2.take(1), 2L)))
    assert(asMap(GoldenStore.serve(spark, store)) == after)
  }

  test("nulls never win; all-null column stays null; modal-only and " +
    "algebraic-only specs both serve") {
    val store = tmp()
    val rows = Seq(
      ("e1", null.asInstanceOf[String], "A", 1, 1.0, 1L),
      ("e1", "X", null.asInstanceOf[String], 2, 2.0, 2L),
      ("e2", null.asInstanceOf[String], null.asInstanceOf[String], 3, 3.0, 3L))
    GoldenStore.append(rows.toDF("eid", "status", "prio", "day", "price", "okey"),
      "eid", store, 1L, mostFrequent = Seq("status"), longest = Seq("prio"))
    val out = GoldenStore.serve(spark, store)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    // serve column order: eid, longest(prio), modal(status)
    assert(GoldenStore.serve(spark, store).columns.toSeq ==
      Seq("eid", "prio", "status"))
    assert(out("e1") == ((Some("A"), Some("X"))))
    assert(out("e2") == ((None, None)))
    // modal-only store
    val s2 = tmp()
    GoldenStore.append(df(b1), "eid", s2, 1L, mostFrequent = Seq("status"))
    assert(GoldenStore.serve(spark, s2).columns.toSeq == Seq("eid", "status"))
  }

  test("a modal column null in EVERY batch serves as a typed null " +
    "column (no delta dir ever written) and survives compaction") {
    val store = tmp()
    val rows = Seq(
      ("e1", null.asInstanceOf[String], "A", 1, 1.0, 1L),
      ("e2", null.asInstanceOf[String], "B", 2, 2.0, 2L))
    (0 to 1).foreach { b =>
      GoldenStore.append(
        rows.drop(b).take(1)
          .toDF("eid", "status", "prio", "day", "price", "okey"),
        "eid", store, b.toLong,
        mostFrequent = Seq("status"), longest = Seq("prio"))
    }
    val out = GoldenStore.serve(spark, store)
    assert(out.schema("status").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.collect().forall(_.isNullAt(2)))
    // the empty overwrite leaves at most a _SUCCESS skeleton — no
    // ab= batch partition ever lands
    val modal = new java.io.File(store + "/modal_status")
    assert(!modal.exists() ||
      modal.listFiles().forall(f => !f.getName.startsWith("ab=")))
    GoldenStore.compactStore(spark, store)
    assert(GoldenStore.serve(spark, store).collect().forall(_.isNullAt(2)))
  }

  test("compaction folds to one generation, serve identical, dirs " +
    "swept incl. modal dirs; post-compaction appends keep merging") {
    val store = tmp()
    appendAll(store, Seq((b1, 1L), (b2, 2L)))
    val before = asMap(GoldenStore.serve(spark, store))
    GoldenStore.compactStore(spark, store)
    assert(asMap(GoldenStore.serve(spark, store)) == before)
    Seq("/partials", "/modal_status").foreach { d =>
      val dirs = new java.io.File(store + d).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ab="))
        .map(_.getName)
      assert(dirs.toList == List("ab=-1"), s"$d: ${dirs.mkString(",")}")
    }
    appendAll(store, Seq((b3, 3L)))
    assert(asMap(GoldenStore.serve(spark, store)) ==
      asMap(batchGolden(b1 ++ b2 ++ b3)))
  }

  test("guards: empty spec, duplicate strategy column, spec drift " +
    "across appends, missing store") {
    val store = tmp()
    intercept[IllegalArgumentException](
      GoldenStore.append(df(b1), "eid", store, 1L))
    intercept[IllegalArgumentException](
      GoldenStore.append(df(b1), "eid", store, 1L,
        mostFrequent = Seq("prio"), longest = Seq("prio")))
    GoldenStore.append(df(b1), "eid", store, 1L, minOf = Seq("day"))
    intercept[IllegalArgumentException](
      GoldenStore.append(df(b2), "eid", store, 2L, maxOf = Seq("day")))
    intercept[IllegalArgumentException](GoldenStore.serve(spark, tmp()))
  }
}
