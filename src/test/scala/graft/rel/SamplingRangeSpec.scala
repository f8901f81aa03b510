package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingRangeSpec extends SparkSpec {
  import spark.implicits._

  test("quotaPerGroup caps each group, keeps small groups whole, is deterministic") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small")).toDF("id", "grp")
    val s1 = Sampling.quotaPerGroup(df, "grp", "id", 10).as[(Long, String)].collect().toSet
    assert(s1.count(_._2 == "big") == 10)
    assert(s1.count(_._2 == "small") == 10) // only 10 exist — all kept
    val s2 = Sampling.quotaPerGroup(df.repartition(7), "grp", "id", 10).as[(Long, String)].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
  }

  test("weightedSample: deterministic across partitionings, caps per group, dominant weight always wins the top slot") {
    val df = (1L to 200L)
      .map(i => (i, if (i % 2 == 0) "even" else "odd", 1.0 + (i % 7)))
      .toDF("id", "grp", "w")
    val s1 = Sampling.weightedSample(df, "grp", "id", "w", 15)
      .as[(Long, String, Double)].collect().toSet
    assert(s1.count(_._2 == "even") == 15 && s1.count(_._2 == "odd") == 15)
    val s2 = Sampling.weightedSample(df.repartition(7), "grp", "id", "w", 15)
      .as[(Long, String, Double)].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")

    // a weight 12 orders of magnitude above the rest pins key ln(u)/w to
    // ~0⁻, above every unit-weight key for any u — it must always be kept
    val dom = ((1L to 50L).map(i => (i, "g", 1.0)) :+ ((99L, "g", 1e12)))
      .toDF("id", "grp", "w")
    val kept1 = Sampling.weightedSample(dom, "grp", "id", "w", 1)
      .select("id").as[Long].collect().toSeq
    assert(kept1 == Seq(99L), s"dominant weight must win, got $kept1")
  }

  test("quota priority spreads: the kept set is not just the lowest ids") {
    val df = (1L to 1000L).map((_, "g")).toDF("id", "grp")
    val kept = Sampling.quotaPerGroup(df, "grp", "id", 50).as[(Long, String)].collect().map(_._1)
    assert(kept.max > 500, "hash priority should select across the id range")
  }

  test("temperatureTargets: alpha=1 keeps proportions, alpha=0 is uniform, targets sum ~ total") {
    val df = (Seq.fill(80)("a") ++ Seq.fill(15)("b") ++ Seq.fill(5)("c")).toDF("grp")
    val at1 = Sampling.temperatureTargets(df, "grp", 1.0, 100L)
      .select("grp", "target_rows").as[(String, Long)].collect().toMap
    assert(at1 == Map("a" -> 80L, "b" -> 15L, "c" -> 5L))
    val at0 = Sampling.temperatureTargets(df, "grp", 0.0, 99L)
      .select("grp", "target_rows").as[(String, Long)].collect().toMap
    assert(at0 == Map("a" -> 33L, "b" -> 33L, "c" -> 33L))
    val atHalf = Sampling.temperatureTargets(df, "grp", 0.5, 100L)
      .select("grp", "target_rows").as[(String, Long)].collect().toMap
    assert(atHalf("a") < 80L && atHalf("c") > 5L, "alpha<1 must flatten toward uniform")
  }

  test("quotaByTargets: per-group quotas honored, absent groups dropped, same keep-order as quotaPerGroup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 60) "big" else if (i <= 90) "mid" else "tiny"))
      .toDF("id", "g")
    val targets = Seq(("big", 5L), ("mid", 30L)).toDF("g", "target_rows") // tiny absent
    val out = Sampling.quotaByTargets(df, "g", "id", targets)
    val byG = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("big" -> 5L, "mid" -> 30L), s"got $byG")
    // the kept 5 of "big" must equal constant-quota keep at n=5 (same priority order)
    val viaConst = Sampling.quotaPerGroup(df.filter($"g" === "big"), "g", "id", 5)
      .select("id").as[Long].collect().toSet
    val viaTargets = out.filter($"g" === "big").select("id").as[Long].collect().toSet
    assert(viaConst == viaTargets)
  }

  test("pointInInterval matches the naive BETWEEN join across bucket widths") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, 250L))
      .toDF("pid", "ts")
    val ivals = Seq((10L, 0L, 100L), (11L, 90L, 110L), (12L, 240L, 260L), (13L, 300L, 400L))
      .toDF("iid", "s", "e")
    val naive = points.join(ivals, col("s") <= col("ts") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "ts", ivals, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bucketWidth=$w")
    }
  }

  test("saltedJoin equals the plain join on skewed data and joins on (key, salt)") {
    // 90% of left rows share one hot key
    val left = (1L to 1000L).map(i => (if (i <= 900) 7L else i, i)).toDF("k", "lv")
    val right = Seq((7L, "hot"), (901L, "a"), (950L, "b"), (5000L, "never")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .as[(Long, Long, String)].collect().toSorted
    for (factor <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(left, right, "k", factor).select("k", "lv", "rv")
        .as[(Long, Long, String)].collect().toSorted
      assert(salted == plain, s"factor=$factor")
    }
    val plan = Skew.saltedJoin(left, right, "k", 8).queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"join must key on the salt:\n$plan")
  }

  private implicit class SortedOps[T: Ordering](a: Array[T]) {
    def toSorted: Seq[T] = a.toSeq.sorted
  }

  test("hashSplit: complete, near-90/5/5, pure function of the id, guard-railed") {
    val df = (0L until 10000L).toDF("id")
    val got = Sampling.hashSplit(df, "id", 90, 5)
    val counts = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(counts("train") > 8600L && counts("train") < 9400L, counts.toString)
    assert(counts("val") > 250L && counts("val") < 750L, counts.toString)
    assert(counts("test") > 250L && counts("test") < 750L, counts.toString)
    // assignment is exactly the documented bucket rule, row by row
    val bucket = pmod(col("id") * lit(2654435761L), lit(4294967296L)) % 100
    val mismatches = got
      .filter(
        (bucket < 90 && col("split") =!= "train") ||
          (bucket >= 90 && bucket < 95 && col("split") =!= "val") ||
          (bucket >= 95 && col("split") =!= "test"))
      .count()
    assert(mismatches == 0L)
    // repartitioning cannot move a doc between splits
    val again = Sampling.hashSplit(df.repartition(7), "id", 90, 5)
    assert(again.orderBy("id").collect().toSeq == got.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException](Sampling.hashSplit(df, "id", 95, 5))
    intercept[IllegalArgumentException](Sampling.hashSplit(got, "id", 90, 5)) // split col collision
  }

  test("quantileBins: equal populations on distinct values, ties share a bin, all-rows covered") {
    // 1..80 over 4 bins → exact 20/20/20/20, bin increases with value
    val df = (1L to 80L).map(i => (i, i)).toDF("id", "v")
    val out = Sampling.quantileBins(df, "v", 4).collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(out.length == 80)
    val byBin = out.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    assert(byBin.keySet == Set(1, 2, 3, 4))
    assert(byBin(1).toSeq == (1L to 20L) && byBin(4).toSeq == (61L to 80L))

    // heavy tie mass: value 5 holds ranks 1..70 of 80 → every 5 shares
    // bin 1, later values push into the top bin
    val tied = ((1L to 70L).map(i => (i, 5L)) ++ (71L to 80L).map(i => (i, i))).toDF("id", "v")
    val tout = Sampling.quantileBins(tied, "v", 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(tout.filter(_._2 == 5L).map(_._3).distinct.toSeq == Seq(1))
    assert(tout.map(_._1).toSet == (1L to 80L).toSet)
    assert(tout.filter(_._2 > 5L).forall(_._3 == 4))
  }

  test("quantileBins assignment is invariant to input partitioning") {
    val df = (1L to 97L).map(i => (i, i % 13)).toDF("id", "v")
    val a = Sampling.quantileBins(df.repartition(1), "v", 5)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val b = Sampling.quantileBins(df.repartition(7), "v", 5)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("pointInInterval with keys only matches same-key pairs; plans an equi-join, not a nested loop") {
    val points = Seq((1L, 5L, "u1"), (2L, 5L, "u2")).toDF("pid", "ts", "u")
    val ivals = Seq((10L, 0L, 10L, "u1")).toDF("iid", "s", "e", "iu")
    val joined = RangeJoin.pointInInterval(points, "ts", ivals, "s", "e", 10L, Seq("u" -> "iu"))
    assert(joined.select("pid").as[Long].collect().toSeq == Seq(1L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("exactStratifiedSplit: quotas are exactly largest-remainder, every row assigned once, deterministic") {
    // strata sized to exercise remainder allocation: 30 → 24/3/3 exact;
    // 33 → floors 26/3/3 (sum 32), one extra goes to train (rem 40 beats
    // 30/30); 7 → floors 5/0/0, extras 2 → val and test get their row
    val df = ((1L to 30L).map((_, "a")) ++ (31L to 63L).map((_, "b")) ++ (64L to 70L).map((_, "c")))
      .toDF("id", "src")
    val out = Sampling
      .exactStratifiedSplit(df, "src", "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .as[(Long, String, String)].collect()
    assert(out.length == 70, "every row lands in exactly one split")
    assert(out.map(_._1).distinct.length == 70)
    val sizes = out.groupBy(r => (r._2, r._3)).view.mapValues(_.length).toMap
    assert(sizes(("a", "train")) == 24 && sizes(("a", "val")) == 3 && sizes(("a", "test")) == 3)
    assert(sizes(("b", "train")) == 27 && sizes(("b", "val")) == 3 && sizes(("b", "test")) == 3)
    assert(sizes(("c", "train")) == 5 && sizes(("c", "val")) == 1 && sizes(("c", "test")) == 1)
    val out2 = Sampling
      .exactStratifiedSplit(df.repartition(7), "src", "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .as[(Long, String, String)].collect()
    assert(out.toSet == out2.toSet, "assignment must not depend on partitioning")
  }

  test("exactStratifiedSplit: a NULL stratum is a stratum — its rows are assigned, not dropped") {
    val df = ((1L to 20L).map(i => (i, Option("a"))) ++ (21L to 30L).map(i => (i, Option.empty[String])))
      .toDF("id", "src")
    val out = Sampling
      .exactStratifiedSplit(df, "src", "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect()
    assert(out.length == 30, s"null-stratum rows must be assigned, got ${out.length} of 30")
    // n=10 under 80/10/10: floors 8/1/1, extras 0
    val nullIds = (21L to 30L).toSet
    val nullSplits = out.filter(r => nullIds(r._1)).groupBy(_._2).view.mapValues(_.length).toMap
    assert(nullSplits == Map("train" -> 8, "val" -> 1, "test" -> 1), s"got $nullSplits")
  }
}
