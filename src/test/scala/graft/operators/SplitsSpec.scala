package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit hits requested weights within hash tolerance and is deterministic") {
    val ids = spark.range(0, 20000).toDF("id")
    val out = Splits.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, s"$counts")
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02, s"$counts")
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02, s"$counts")
    // membership depends on the id alone: re-run over reshuffled data agrees
    val rerun = Splits.hashSplit(ids.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val firstMap = out.as[(Long, String)].collect().toMap
    assert(rerun == firstMap)
  }

  test("four-way split chains every cut point") {
    val out = Splits.hashSplit(spark.range(0, 8000).toDF("id"), "id",
      Seq("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "d" -> 0.25))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    out.values.foreach(v => assert(math.abs(v / 8000.0 - 0.25) < 0.03, s"$out"))
  }

  test("guards: bad weights fail fast") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 0.5))                    // one split
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))        // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 1.1, "b" -> -0.1))       // negative
    }
  }

  test("weightedKeep: weight 1 keeps all, 0 keeps none, fractions approximate, deterministic") {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("grp", concat(lit("g"), pmod(col("id"), lit(4))))
    val kept = Splits.weightedKeep(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.0), defaultWeight = 0.25)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("g0") == 1000, "weight 1.0 must keep every row")
    assert(!byGrp.contains("g2"), "weight 0.0 must keep nothing")
    assert(math.abs(byGrp("g1") / 1000.0 - 0.5) < 0.05, s"$byGrp")
    assert(math.abs(byGrp("g3") / 1000.0 - 0.25) < 0.05, s"default weight applies: $byGrp")
    // pure function of the id: a re-run keeps the identical set
    val again = Splits.weightedKeep(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.0), defaultWeight = 0.25)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // monotone in the weight: growing a group's share only ADDS rows
    // (no resampling churn when a mix is rebalanced)
    val low = Splits.weightedKeep(df, "id", "grp", Map("g1" -> 0.25), 0.0)
      .select("id").as[Long].collect().toSet
    val high = Splits.weightedKeep(df, "id", "grp", Map("g1" -> 0.5), 0.0)
      .select("id").as[Long].collect().toSet
    assert(low.subsetOf(high), "raising a weight must never drop a kept row")
    intercept[IllegalArgumentException] {
      Splits.weightedKeep(df, "id", "grp", Map("g0" -> 1.5))
    }
  }

  test("weightedSamplePerStratumAgg ≡ window form; partial heap agg in the plan; giant stratum fine") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("grp", concat(lit("g"), pmod(col("id"), lit(3))))
      .withColumn("w", (pmod(col("id"), lit(7)) + 1).cast("double"))
    val win = Splits.weightedSamplePerStratum(df, "id", "grp", col("w"), k = 25)
      .select("id").as[Long].collect().sorted.toSeq
    val agg = Splits.weightedSamplePerStratumAgg(df, "id", "grp", col("w"), k = 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(win == agg, "heap aggregate selects the identical sample")
    assert(agg.length == 75)

    // plan proof: the aggregate form partial-combines map-side (no
    // full-stratum sort anywhere in ITS aggregation subtree)
    val winners = df.groupBy(col("grp"))
      .agg(graft.plans.TopK.topK(col("w"), col("id"), 25).as("t"))
    val plan = winners.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_agg"),
      s"map-side partial heap aggregation expected:\n$plan")
    assert(!plan.toLowerCase.contains("sort"),
      s"no sort in the aggregate subtree:\n$plan")

    // single giant stratum: the window form's pathological case — the
    // aggregate form returns the exact k smallest priorities
    val one = spark.range(0, 5000).toDF("id").withColumn("grp", lit("all"))
    val sampled = Splits.weightedSamplePerStratumAgg(one, "id", "grp",
      lit(1.0), k = 10).select("id").as[Long].collect().sorted.toSeq
    val expected = Splits.weightedSamplePerStratum(one, "id", "grp",
      lit(1.0), k = 10).select("id").as[Long].collect().sorted.toSeq
    assert(sampled == expected && sampled.length == 10)
  }

  test("shardShuffle: dense positions, hash order, stable under growth") {
    val df = spark.range(0, 1000).toDF("id")
    val out = Splits.shardShuffle(df, "id", numShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 1000)
    assert(out.forall { case (_, s, _) => s >= 0 && s < 4 })
    // positions are dense 1..n per shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // pure function of (salt, id): re-run identical
    val again = Splits.shardShuffle(df, "id", numShards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // growth stability: adding rows never changes an existing row's shard,
    // and never reorders two old rows within a shard (positions shift by
    // insertions only — relative order is preserved)
    val grown = Splits.shardShuffle(spark.range(0, 1500).toDF("id"), "id", 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    val oldByShard = out.groupBy(_._2).view.mapValues(
      _.sortBy(_._3).map(_._1).toSeq).toMap
    val grownOldByShard = grown.filter(_._1 < 1000).groupBy(_._2).view.mapValues(
      _.sortBy(_._3).map(_._1).toSeq).toMap
    assert(oldByShard == grownOldByShard)
    // not input order: the per-shard sequence differs from ascending ids
    assert(oldByShard.values.exists(seq => seq != seq.sorted))
    // different salt -> different layout
    val salted = Splits.shardShuffle(df, "id", 4, salt = "other")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(out.exists { case (id, s, _) => salted(id) != s })
  }

  test("temperatureKeep: alpha endpoints, skew flattening, determinism") {
    // skewed groups: g0 has 4000 rows, g1 1000, g2 250
    val df = spark.range(0, 5250).toDF("id")
      .withColumn("grp", when(col("id") < 4000, "g0")
        .when(col("id") < 5000, "g1").otherwise("g2"))
    // alpha = 1: natural distribution — every row kept (rate 1 for all)
    val nat = Splits.temperatureKeep(df, "id", "grp", alpha = 1.0)
    assert(nat.count() == 5250)
    // alpha = 0: equalize to the smallest group (~250 each)
    val eq = Splits.temperatureKeep(df, "id", "grp", alpha = 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(eq("g0") - 250.0) / 250.0 < 0.25, s"$eq")
    assert(math.abs(eq("g1") - 250.0) / 250.0 < 0.25, s"$eq")
    assert(eq("g2") == 250, "the smallest group is kept in full")
    // alpha = 0.5: rates are sqrt(cmin/c) — between the endpoints
    val half = Splits.temperatureKeep(df, "id", "grp", alpha = 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(half("g0") > eq("g0") && half("g0") < 4000, s"$half")
    assert(half("g2") == 250)
    // deterministic re-run
    val again = Splits.temperatureKeep(df, "id", "grp", alpha = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(Splits.temperatureKeep(df, "id", "grp", alpha = 0.5)
      .select("id").as[Long].collect().sorted.toSeq == again)
    intercept[IllegalArgumentException] {
      Splits.temperatureKeep(df, "id", "grp", alpha = 1.5)
    }
  }

  test("temperatureEpochs: upsamples toward balance, largest group stays single-copy") {
    val df = spark.range(0, 5250).toDF("id")
      .withColumn("grp", when(col("id") < 4000, "g0")
        .when(col("id") < 5000, "g1").otherwise("g2"))
    // alpha = 1: natural — exactly one copy of everything, epoch 0
    val nat = Splits.temperatureEpochs(df, "id", "grp", alpha = 1.0)
    assert(nat.count() == 5250)
    assert(nat.select(max(col("epoch"))).as[Long].head() == 0L)
    // alpha = 0: every group replicates to ~the largest (4000)
    val eq = Splits.temperatureEpochs(df, "id", "grp", alpha = 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(eq("g0") == 4000, "the largest group is never replicated")
    assert(math.abs(eq("g1") - 4000.0) / 4000.0 < 0.1, s"$eq")
    assert(math.abs(eq("g2") - 4000.0) / 4000.0 < 0.1, s"$eq")
    // alpha = 0.5: sqrt rates — g1 ≈ 1000·2 = 2000, g2 ≈ 250·4 = 1000;
    // epochs are dense 0..n-1 per row
    val half = Splits.temperatureEpochs(df, "id", "grp", alpha = 0.5)
    val counts = half.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts("g0") == 4000 && counts("g1") > 1500 && counts("g2") > 800, s"$counts")
    val perRow = half.filter(col("id") === 5100L).select("epoch")
      .as[Long].collect().sorted.toSeq
    assert(perRow == (0L until perRow.size.toLong), s"dense epochs: $perRow")
    // deterministic re-run
    val a = half.select("id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    val b = Splits.temperatureEpochs(df, "id", "grp", alpha = 0.5)
      .select("id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Splits.temperatureEpochs(df, "id", "grp", alpha = -0.1)
    }
  }

  test("negativeSample: k draws per anchor, in range, never self, deterministic") {
    val corpus = spark.range(0, 200).toDF("id")
    val anchors = corpus.filter(col("id") < 50)
    val out = Splits.negativeSample(anchors, "id", corpus, "id", k = 4)
      .select("anchor_id", "j", "neg_id").as[(Long, Long, Long)].collect()
    assert(out.length == 50 * 4)
    assert(out.forall { case (_, _, n) => n >= 0 && n < 200 })
    assert(out.forall { case (a, _, n) => n != a }, "never self-paired")
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    }
    // pure function of (salt, anchor, j)
    val again = Splits.negativeSample(anchors, "id", corpus, "id", k = 4)
      .select("anchor_id", "j", "neg_id").as[(Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
    // draws spread over the corpus (not degenerate)
    assert(out.map(_._3).distinct.length > 100)
  }
}
