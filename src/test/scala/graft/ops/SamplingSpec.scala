package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hashSample: deterministic, near-rate, salt-independent draws") {
    val a = Sampling.hashSample(ids, col("id"), 0.3, "s1").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, col("id"), 0.3, "s1").collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt+key must select the same rows")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate off: ${a.size}")
    val c = Sampling.hashSample(ids, col("id"), 0.3, "s2").collect().map(_.getLong(0)).toSet
    assert(c != a, "different salt must draw a different sample")
    // independence: overlap ≈ 0.09 of corpus, not 0 and not 0.3
    val ov = (a & c).size / 2000.0
    assert(ov > 0.04 && ov < 0.16, s"salted draws not independent: $ov")
  }

  test("hashSample is a map-side filter: no exchange in the plan") {
    val plan = Sampling.hashSample(ids, col("id"), 0.3, "s1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("splitColumn: exhaustive, disjoint, weight-proportional") {
    val out = ids.select(col("id"),
        Sampling.splitColumn(col("id"), "sp",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.length == 2000, "every row gets exactly one split")
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(sizes("train") / 2000.0 - 0.8) < 0.05, sizes.toString)
    assert(math.abs(sizes("val") / 2000.0 - 0.1) < 0.04, sizes.toString)
    assert(math.abs(sizes("test") / 2000.0 - 0.1) < 0.04, sizes.toString)
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = ids.withColumn("g",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val kept = Sampling.stratifiedSample(df, col("g"), col("id"),
        Map("a" -> 0.5), default = 0.05, salt = "st")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("a") / 1000.0 - 0.5) < 0.07, kept.toString)
    assert(math.abs(kept.getOrElse("b", 0L) / 1000.0 - 0.05) < 0.04, kept.toString)
  }

  test("capPerGroup keeps at most n per group, stable across runs") {
    val df = ids.withColumn("g", col("id") % 7)
    val a = Sampling.capPerGroup(df, col("g"), col("id"), 5, "c1")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.groupBy(_._2).forall(_._2.length == 5), "7 groups x 5 kept")
    val b = Sampling.capPerGroup(df, col("g"), col("id"), 5, "c1")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSet == b.toSet, "survivors must be stable")
    // small groups survive whole
    val tiny = Sampling.capPerGroup(ids.limit(3).withColumn("g", lit(0L)),
      col("g"), col("id"), 5, "c1")
    assert(tiny.count() == 3)
  }

  test("topFractionByScore keeps whole top levels covering the fraction") {
    // 100 rows score 3, 100 score 2, 800 score 1
    val df = (0 until 1000).map { i =>
      (i.toLong, if (i < 100) 3.0 else if (i < 200) 2.0 else 1.0)
    }.toDF("id", "s")
    // smallest set of WHOLE levels covering >=25%: {3,2} covers only
    // 20%, so level 1 joins and everything survives — quantized scores
    // can overshoot the fraction, by design
    val keep25 = Sampling.topFractionByScore(df, col("s"), 0.25)
      .collect().map(_.getDouble(1))
    assert(keep25.length == 1000)
    // at 10%, level 3 alone covers it: exactly the 100 top rows survive
    val keep10 = Sampling.topFractionByScore(df, col("s"), 0.1)
      .collect().map(_.getDouble(1))
    assert(keep10.length == 100 && keep10.forall(_ == 3.0))
  }

  test("packByTokenBudget: bounded packs, deterministic, all docs packed") {
    val df = ids.withColumn("tok", (col("id") % 90 + 10).cast("int"))
    val out = Sampling.packByTokenBudget(df, col("id"), col("tok"),
        budgetTokens = 500, shards = 4, salt = "p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length == 2000, "every document lands in a pack")
    assert(out.forall { case (_, _, sh, _) => sh >= 0 && sh < 4 })
    // offset packing: each pack's total ≤ budget + (its largest doc - 1)
    out.groupBy(t => (t._3, t._4)).foreach { case (k, docs) =>
      val total = docs.map(_._2.toLong).sum
      assert(total < 500 + 100, s"pack $k holds $total tokens")
    }
    val again = Sampling.packByTokenBudget(df, col("id"), col("tok"),
        budgetTokens = 500, shards = 4, salt = "p")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out.map(t => t._1 -> t._4).toMap == again, "stable across runs")
  }

  test("curriculum pack: total, stage-monotone in difficulty, budget-bounded") {
    // The gated composition's invariants, on the smoke corpus: every doc
    // packed exactly once; a harder doc never lands in an easier stage;
    // every (stage, shard, pack) stays within budget + one doc.
    val out = graft.SparkEntry.queries("m8_curriculum_pack")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))) // doc_id, diff, stage, shard, pack, toks
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.length.toLong == nDocs, "every document packed exactly once")
    assert(out.map(_._1).distinct.length == out.length)
    // stage monotone in difficulty class
    val stagesByDiff = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    stagesByDiff.foreach { case (d, ss) =>
      assert(ss.length == 1, s"difficulty class $d split across stages $ss")
    }
    val ordered = stagesByDiff.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered == ordered.sorted, s"stages not monotone: $ordered")
    // pack budget: 2048 + (largest member - 1)
    out.groupBy(t => (t._3, t._4, t._5)).foreach { case (k, docs) =>
      val total = docs.map(_._6).sum
      val maxDoc = docs.map(_._6).max
      assert(total < 2048 + maxDoc, s"pack $k holds $total tokens")
    }
  }

  test("temperatureMix flattens toward n^alpha, rarest source keeps all") {
    // sources sized 1000 / 250 / 40: at alpha=0.5 expected keep rates are
    // sqrt(40/n) → 0.2, 0.4, 1.0
    val df = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1250L).map(i => (i, "mid")) ++
      (1250L until 1290L).map(i => (i, "rare"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, col("src"), col("id"), 0.5, "t")
      .groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("rare") == 40L, s"rarest source must keep all: $out")
    assert(math.abs(out("big") / 1000.0 - 0.2) < 0.05, s"big: $out")
    assert(math.abs(out("mid") / 250.0 - 0.4) < 0.1, s"mid: $out")
    // deterministic: same draw on re-run
    val again = Sampling.temperatureMix(df, col("src"), col("id"), 0.5, "t")
      .groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
    // alpha = 1 keeps everything
    val all = Sampling.temperatureMix(df, col("src"), col("id"), 1.0, "t").count()
    assert(all == 1290L)
  }

  test("weightedSample: k >= n keeps everything; rerun is identical") {
    val df = (0L until 20L).toDF("id").withColumn("w", col("id") + 1)
    assert(Sampling.weightedSample(df, col("id"), col("w"), 50, "ws").count() == 20L)
    val a = Sampling.weightedSample(df, col("id"), col("w"), 5, "ws")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df, col("id"), col("w"), 5, "ws")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 5)
  }

  test("weightedSample: an overwhelming weight wins the draw across salts") {
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1000000000L)).toDF("id", "w")
    Seq("s1", "s2", "s3", "s4").foreach { salt =>
      val got = Sampling.weightedSample(df, col("id"), col("w"), 1, salt)
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(3L), s"salt $salt picked $got over the 1e9 weight")
    }
  }

  test("weightedSample: biased toward heavier rows over many draws") {
    // ids 0-9 weight 1, ids 10-19 weight 20: across 40 independent
    // salted draws of k=4, heavy picks must dominate decisively
    val df = (0L until 20L).toDF("id")
      .withColumn("w", when(col("id") >= 10, 20L).otherwise(1L))
    val picks = (0 until 40).flatMap { i =>
      Sampling.weightedSample(df, col("id"), col("w"), 4, s"wbias$i")
        .collect().map(_.getLong(0))
    }
    val heavy = picks.count(_ >= 10)
    assert(heavy > picks.length * 2 / 3,
      s"heavy rows won only $heavy of ${picks.length}")
  }

  test("weightedSample: non-positive weight fails the job loudly") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, col("id"), col("w"), 1, "ws").collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
  }

  test("weightedSample: NULL weight fails the job loudly (never wins silently)") {
    // NULL <= 0 is NULL in three-valued logic, so a guard without an
    // explicit isNull arm lets NULL weights through with NULL priority —
    // and ascending nulls-first ordering would make them win every draw.
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, col("id"), col("w"), 1, "ws").collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
  }

  test("weightedMix caps rates at 1, tags provenance, never duplicates") {
    val s1 = (0L until 500L).toDF("id")
    val s2 = (500L until 1000L).toDF("id")
    val out = Sampling.weightedMix(
        Seq(("full", s1, 2.0), ("half", s2, 0.5)), col("id"), "mx")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.count(_._2 == "full") == 500, "rate 2.0 caps at keep-all")
    val half = out.count(_._2 == "half")
    assert(math.abs(half / 500.0 - 0.5) < 0.1, s"half-source kept $half")
    assert(out.map(_._1).distinct.length == out.length, "no duplicated rows")
  }
}
