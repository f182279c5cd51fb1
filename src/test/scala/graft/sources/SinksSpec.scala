package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("sinks").toString + "/t"

  test("appendParquet appends; partitioned layout on disk") {
    val p = tmp()
    Sinks.appendParquet(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "v", "part"),
      p, Seq("part"))
    Sinks.appendParquet(Seq((3L, "c", "x")).toDF("k", "v", "part"), p, Seq("part"))
    assert(spark.read.parquet(p).count() == 3)
    assert(new java.io.File(p, "part=x").exists())
  }

  test("overwritePartitions rewrites only touched partitions") {
    val p = tmp()
    Sinks.appendParquet(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "v", "part"),
      p, Seq("part"))
    Sinks.overwritePartitions(Seq((9L, "A2", "x")).toDF("k", "v", "part"), p, Seq("part"))
    val out = spark.read.parquet(p).orderBy("k").select("k", "v")
      .as[(Long, String)].collect().toSeq
    // partition x replaced, partition y untouched
    assert(out == Seq((2L, "b"), (9L, "A2")))
  }

  test("upsertParquet merges against existing state on disk") {
    val p = tmp()
    Sinks.upsertParquet(Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    Sinks.upsertParquet(Seq((2L, "B2", 2), (3L, "c", 2)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    val out = spark.read.parquet(p).orderBy("k").select("k", "v")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    // swap left no working dirs behind (ADVICE r1: crash-safe rename order)
    assert(!new java.io.File(p + "__graft_tmp").exists())
    assert(!new java.io.File(p + "__graft_old").exists())
  }

  test("upsertJdbc round-trips with Merge.upsert conflict semantics (embedded Derby)") {
    val dbDir = java.nio.file.Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val ddl = java.sql.DriverManager.getConnection(url)
    ddl.createStatement().execute(
      "CREATE TABLE tgt (k BIGINT PRIMARY KEY, v VARCHAR(32), ver INT)")
    ddl.close()
    // key-hash partitioning: concurrent partitions never share a key
    val first = Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "ver")
      .repartition(4, col("k"))
    Sinks.upsertJdbc(first, url, "tgt", Seq("k"), batchSize = 1)
    val second = Seq((2L, "B2", 2), (3L, "c", 2)).toDF("k", "v", "ver")
      .repartition(4, col("k"))
    Sinks.upsertJdbc(second, url, "tgt", Seq("k"))
    val back = spark.read.format("jdbc").option("url", url).option("dbtable", "tgt")
      .load()
      .select(col("K").cast("long"), col("V"), col("VER").cast("int"))
      .as[(Long, String, Int)].collect().toSeq.sorted
    // same outcome as the storage-side merge: k=2 updated, k=3 inserted
    assert(back == Seq((1L, "a", 1), (2L, "B2", 2), (3L, "c", 2)))
    // bad key fails fast, before any connection is opened
    intercept[IllegalArgumentException] {
      Sinks.upsertJdbc(first, url, "tgt", Seq("nope"))
    }
    // the read wrapper sees the upserted state, with filters pushed to
    // the database (Tables.jdbc is the reference's dim-read surface)
    val viaWrapper = Tables.jdbc(spark, url, "tgt")
      .filter(col("K") >= 2L).select(col("K").cast("long")).as[Long]
      .collect().toSeq.sorted
    assert(viaWrapper == Seq(2L, 3L))
  }

  test("clusteredParquet produces disjoint per-file key ranges (min/max pruning layout)") {
    val p = tmp()
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    Sinks.clusteredParquet(orders, p, Seq("o_orderkey"), files = 4)
    val ranges = spark.read.parquet(p)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length >= 2, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file key ranges must be disjoint: ${ranges.toSeq}")
      case _ => ()
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(p).count() == orders.count())
  }

  test("upsertParquet recovers when a stale __graft_old dir survives a crash") {
    val p = tmp()
    Sinks.upsertParquet(Seq((1L, "a", 1)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    // simulate a crash that died between parking old data and cleanup
    val old = new java.io.File(p + "__graft_old")
    assert(old.mkdirs())
    new java.io.FileWriter(new java.io.File(old, "leftover")).append("x").close()
    Sinks.upsertParquet(Seq((1L, "a2", 2)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    val out = spark.read.parquet(p).select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a2")))
    assert(!old.exists(), "stale __graft_old must be cleared, not block the rename")
  }

  test("upsertParquet restores __graft_old when a crash left dst missing (ADVICE r2)") {
    val p = tmp()
    Sinks.upsertParquet(Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    // simulate a crash mid-swap: dst was parked at __graft_old, the promote
    // of tmp never happened — __graft_old is the ONLY full copy and tmp
    // holds a partial (garbage) write
    val dst = new java.io.File(p)
    val old = new java.io.File(p + "__graft_old")
    assert(dst.renameTo(old))
    val tmpDir = new java.io.File(p + "__graft_tmp")
    assert(tmpDir.mkdirs())
    new java.io.FileWriter(new java.io.File(tmpDir, "partial")).append("junk").close()
    // the retry must restore the parked copy first, not merge against nothing
    Sinks.upsertParquet(Seq((3L, "c", 2)).toDF("k", "v", "ver"),
      p, Seq("k"), Seq(col("ver")))
    val out = spark.read.parquet(p).orderBy("k").select("k", "v")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "pre-crash rows must survive the retry")
    assert(!old.exists() && !tmpDir.exists())
  }
}
