package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a", 1), (2L, "b", 1), (0L, "zero", 1))
    .toDF("k", "v", "ver")

  test("upsert replaces matched keys, inserts new ones, keeps the rest") {
    val updates = Seq((2L, "B", 2), (3L, "C", 2)).toDF("k", "v", "ver")
    val out = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((0L, "zero"), (1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("upsert: last-wins among intra-batch duplicate keys") {
    val updates = Seq((3L, "first", 1), (3L, "last", 9)).toDF("k", "v", "ver")
    val out = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
      .filter($"k" === 3L).select("v").as[String].collect().toSeq
    assert(out == Seq("last"))
  }

  test("upsert is idempotent (ON CONFLICT semantics)") {
    val updates = Seq((2L, "B", 2), (3L, "C", 2)).toDF("k", "v", "ver")
    val once = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
    val twice = Merge.upsert(once, updates, Seq("k"), Seq(col("ver")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("insertIfAbsent inserts only unmatched keys; key 0 is a real key") {
    val inserts = Seq((0L, "SHOULD NOT WIN", 2), (4L, "d", 2), (4L, "dup", 3))
      .toDF("k", "v", "ver")
    val out = Merge.insertIfAbsent(target, inserts, Seq("k"), Seq(col("ver")))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((0L, "zero"), (1L, "a"), (2L, "b"), (4L, "d")))
  }

  test("updateColumns overwrites only set columns on matched keys") {
    val updates = Seq((1L, "A2")).toDF("k", "v")
    val out = Merge.updateColumns(target, updates, Seq("k"), Seq("v"))
      .orderBy("k").select("k", "v", "ver").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((0L, "zero", 1), (1L, "A2", 1), (2L, "b", 1)))
  }

  test("updateColumns can set a matched column to NULL (join marker, not coalesce)") {
    val updates = Seq((1L, None: Option[String])).toDF("k", "v")
    val out = Merge.updateColumns(target, updates, Seq("k"), Seq("v"))
      .orderBy("k").select("k", "v").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((0L, Some("zero")), (1L, None), (2L, Some("b"))))
  }

  test("updateMisses finds update keys with no target row") {
    val updates = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val out = Merge.updateMisses(target, updates, Seq("k"))
      .select("k").as[Long].collect().toSeq
    assert(out == Seq(9L))
  }

  test("scd2FromChanges: versions with validity intervals, no-ops collapsed") {
    val changes = Seq(
      (1L, 100L, "a"), (1L, 200L, "a"), (1L, 300L, "b"), (1L, 400L, "b"),
      (2L, 150L, "x"))
      .toDF("k", "ts", "attr")
    val out = Merge.scd2FromChanges(changes, Seq("k"), "ts", Seq("attr"))
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, "a", 100L, Some(300L)), // ts=200 no-op collapsed
      (1L, "b", 300L, None),       // ts=400 no-op collapsed; open version
      (2L, "x", 150L, None)))
  }

  test("scd2FromChanges: null attr values version correctly (null-safe compare)") {
    val changes = Seq(
      (1L, 1L, Option("a")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Option("a")))
      .toDF("k", "ts", "attr")
    val out = Merge.scd2FromChanges(changes, Seq("k"), "ts", Seq("attr"))
      .orderBy("k", "valid_from")
      .select("attr", "valid_from", "valid_to")
      .as[(Option[String], Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (Some("a"), 1L, Some(2L)),
      (None, 2L, Some(4L)),        // consecutive nulls collapsed
      (Some("a"), 4L, None)))      // a -> null -> a is two real changes
  }

  test("scd2Lookup: facts pick the covering version; boundaries and misses") {
    val dim = Seq(
      (1L, "a", 100L, Option(300L)),
      (1L, "b", 300L, None),       // open current version
      (2L, "x", 150L, Option(150L)), // degenerate empty interval [150,150)
      (2L, "y", 150L, None))
      .toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, 100L),  // inclusive lower bound -> a
      (11L, 1L, 299L),  // inside first           -> a
      (12L, 1L, 300L),  // exclusive upper bound  -> b
      (13L, 1L, 99L),   // before history         -> null
      (14L, 2L, 150L),  // empty interval skipped -> y
      (15L, 3L, 500L))  // unknown key            -> null
      .toDF("fid", "k", "ts")
    val out = Merge.scd2Lookup(facts, dim, Seq("k"), "ts")
      .select("fid", "attr").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      10L -> Some("a"), 11L -> Some("a"), 12L -> Some("b"),
      13L -> None, 14L -> Some("y"), 15L -> None))
    // unique match on a well-formed dim: row count preserved
    assert(Merge.scd2Lookup(facts, dim, Seq("k"), "ts").count() == facts.count())
  }

  // --- applyCdc ------------------------------------------------------------

  test("applyCdc: latest op per key decides — upsert, delete, pass-through") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val log = Seq(
      (2L, 1L, "U", "b2"), (2L, 2L, "U", "b3"), // latest wins
      (3L, 1L, "I", "c"),                       // insert-new
      (1L, 1L, "D", "x"))                       // delete
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyCdc(base, log, Seq("k"),
        Seq(col("seq")), "op")
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "b3", 3L -> "c"))
  }

  test("applyCdc: delete-then-reinsert survives; upsert-then-delete is gone") {
    val base = Seq((9L, "keep")).toDF("k", "v")
    val log = Seq(
      (1L, 1L, "D", "x"), (1L, 2L, "I", "re"),  // reinserted
      (2L, 1L, "I", "y"), (2L, 2L, "D", "x"))   // deleted last
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyCdc(base, log, Seq("k"),
        Seq(col("seq")), "op")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "re", 9L -> "keep"))
  }

  test("applyCdc without deletes ≡ upsert") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq((2L, 1L, "U", "b1"), (2L, 2L, "U", "b2"),
      (4L, 1L, "I", "d")).toDF("k", "seq", "op", "v")
    val viaCdc = Merge.applyCdc(base, log, Seq("k"), Seq(col("seq")), "op")
      .as[(Long, String)].collect().sorted.toSeq
    val viaUpsert = Merge.upsert(base, log.select("k", "v"),
        Seq("k"), Seq(col("v")))
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaCdc == Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // upsert's last-wins under its own tiebreak agrees here because the
    // later seq also carries the lexicographically larger payload
    assert(viaUpsert == viaCdc)
  }

  test("goldenRecord: every strategy with its pinned tie-break; nulls " +
    "never win; all-null column yields null; guards") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // entity 1: modal priority 'b' (2 votes) over 'a' (1); comment
      // lengths 5/5/3 with tie 'xxxxx' vs 'yyyyy' -> smallest wins;
      // latest status by ts 30 -> 'C'; min ts 10
      (1L, "a", "xxxxx", 10L, "A"),
      (1L, "b", "yyyyy", 20L, "B"),
      (1L, "b", "zzz", 30L, "C"),
      // entity 2: modal tie 1-1 between 'a' and 'b' -> smallest 'a';
      // latest ts tie at 10 -> greatest status 'B'
      (2L, "a", "pp", 10L, "A"),
      (2L, "b", "qq", 10L, "B"))
      .toDF("eid", "prio", "cmt", "ts", "status")
    val out = Merge.goldenRecord(rows, "eid",
        mostFrequent = Seq("prio"), longest = Seq("cmt"),
        minOf = Seq("ts"), latestBy = Some(("ts", Seq("status"))))
      .collect().map(r => r.getLong(0) ->
        (r.getString(4), r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    // column order: eid, longest(cmt), minOf(ts), latest(status), mf(prio)
    assert(out(1L) == (("b", "xxxxx", 10L, "C")), out(1L))
    assert(out(2L) == (("a", "pp", 10L, "B")), out(2L))

    // nulls never win; an all-null column stays null
    val withNulls = Seq(
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], 5L,
        null.asInstanceOf[String]),
      (3L, "z", null.asInstanceOf[String], 6L,
        null.asInstanceOf[String]))
      .toDF("eid", "prio", "cmt", "ts", "status")
    val n = Merge.goldenRecord(withNulls, "eid",
        mostFrequent = Seq("prio"), longest = Seq("cmt"),
        minOf = Seq("ts"), latestBy = Some(("ts", Seq("status"))))
      .collect().head
    assert(n.getString(4) == "z" && n.isNullAt(1) && n.isNullAt(3))

    intercept[IllegalArgumentException](Merge.goldenRecord(rows, "eid"))
    intercept[IllegalArgumentException](Merge.goldenRecord(rows, "eid",
      mostFrequent = Seq("prio"), longest = Seq("prio")))
  }

test("snapshotAsOf: point-in-time state, deletes, delete-then-" +
    "reinsert, pre-history empty") {
    val log = Seq(
      ("k1", 1L, "I", "a"), ("k1", 3L, "U", "b"), ("k1", 5L, "D", "b"),
      ("k1", 7L, "I", "c"),
      ("k2", 2L, "I", "x"),
      ("k3", 6L, "I", "z"))
      .toDF("k", "seq", "op", "v")
    def snap(t: Long) =
      Merge.snapshotAsOf(log, Seq("k"), "seq", lit(t), "op")
        .select("k", "v").collect().map(r => r.getString(0) -> r.getString(1))
        .toMap
    assert(snap(4L) == Map("k1" -> "b", "k2" -> "x"))
    assert(snap(5L) == Map("k2" -> "x"))
    assert(snap(8L) == Map("k1" -> "c", "k2" -> "x", "k3" -> "z"))
    assert(snap(0L) == Map.empty)
    // inclusive boundary: the asOf row itself is visible
    assert(snap(3L)("k1") == "b")
    // explicit seqCols tie-break: two rows at seq 3 decided by a
    // second ordering column
    val tied = Seq(("k1", 3L, 1L, "I", "lo"), ("k1", 3L, 2L, "I", "hi"))
      .toDF("k", "seq", "sub", "op", "v")
    val got = Merge.snapshotAsOf(tied, Seq("k"), "seq", lit(3L), "op",
        seqCols = Seq(col("seq"), col("sub")))
      .select("v").collect().head.getString(0)
    assert(got == "hi")
  }
}
