package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deterministic sampling and mixing operators for training-data
  * pipelines.
  *
  * Everything keys off [[TextFns.portable_hash60]] of (salt, key) mapped
  * into the integer space [0, 2^60) — never `rand()` — because at 100 TB
  * the properties that matter are exactly the ones randomness breaks:
  *  - **stable**: re-running a failed stage, backfilling a partition, or
  *    re-sampling after adding columns selects the SAME rows;
  *  - **map-side**: a sample/split/mix is a codegen'd filter — no
  *    shuffle, no state, pushes down past column pruning;
  *  - **independent**: changing the salt draws an independent sample, so
  *    train/val/test and per-experiment samples don't correlate;
  *  - **engine-portable**: any system with md5 reproduces the selection
  *    byte-exactly (the DuckDB correctness oracle does).
  *
  * Thresholds are precomputed as exact integer literals (fraction ×
  * 2^60, one double rounding in one place) and compared as longs, so no
  * float comparison ever reaches the data path.
  */
object Sampling {

  /** Hash space size: portable_hash60 is uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** Integer selection threshold for a fraction in [0, 1]. */
  def thresholdFor(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction: $fraction")
    // 2^60 fits a double exactly; the single product rounds once
    (fraction * HashSpace.toDouble).toLong
  }

  /** The sampling coordinate: uniform in [0, 2^60), keyed and salted. */
  def coord(key: Column, salt: String): Column =
    TextFns.portable_hash60(concat_ws("|", lit(salt), key.cast("string")))

  /** Bernoulli sample at `fraction`, deterministic in (salt, key). */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 salt: String): DataFrame =
    df.filter(coord(key, salt) < thresholdFor(fraction))

  /** Per-stratum Bernoulli sample: each row's threshold comes from its
    * stratum's fraction (`default` for unlisted strata). One codegen'd
    * when-chain — no join against a fractions table needed for the
    * O(10-100) strata a corpus mix typically has. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double], default: Double,
                       salt: String): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdFor(default))) { case (acc, (s, f)) =>
        when(stratum === s, lit(thresholdFor(f))).otherwise(acc)
      }
    df.filter(coord(key, salt) < threshold)
  }

  /** Disjoint split assignment (train/val/test…): weights normalize to
    * cumulative ranges over the hash space; every row lands in exactly
    * one split, stable in (salt, key). */
  def splitColumn(key: Column, salt: String,
                  weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), s"weights: $weights")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(c => thresholdFor(math.min(c, 1.0)))
    val h = coord(key, salt)
    weights.init.zip(cuts.init)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), cut), acc) =>
        when(h < cut, lit(name)).otherwise(acc)
      }
  }

  /** Per-group cap: keep at most `n` rows per group, chosen by the
    * salted hash coordinate (not arrival order), so the survivors are a
    * uniform, stable draw from each group — the "at most N documents per
    * domain" crawl-balancing rule. Runs through the TopKPerKey physical
    * operator: partial per-task cut, exchange carries ≤ n rows per group
    * per task, no full sort. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, n: Int,
                  salt: String): DataFrame =
    graft.plans.GraftOps.topKPerKey(
      df.withColumn("_scoord", coord(key, salt)),
      Seq(group), Seq(col("_scoord")), n)
      .drop("_scoord")

  /** Keep the highest-scoring `fraction` of rows, whole score levels at
    * a time: the threshold is the smallest score whose preceding
    * (higher-score) levels cover less than `fraction` of the corpus, so
    * selection is count-based and needs no quantile interpolation — on a
    * quantized score (quality buckets) the result is exact and
    * engine-portable.
    *
    * Plan shape: one aggregation to the per-level histogram (map-side
    * partial, |levels| rows), a window over those few rows (single
    * partition is fine — the histogram is tiny by construction), then
    * the 1-row threshold broadcast back as a filter. The corpus itself
    * is never shuffled. */
  def topFractionByScore(df: DataFrame, score: Column,
                         fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction: $fraction")
    val dist = df.groupBy(score.as("_s")).agg(count(lit(1)).as("_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val thr = dist
      .withColumn("_cum", sum("_cnt").over(w))
      .withColumn("_total", sum("_cnt").over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .filter((col("_cum") - col("_cnt")).cast("double") <
        lit(fraction) * col("_total").cast("double"))
      .agg(min(col("_s")).as("_thr"))
    df.join(broadcast(thr), score >= col("_thr")).drop("_thr")
  }

  /** Deterministic weighted sample WITHOUT replacement (priority
    * sampling, after Duffield/Lund/Thorup): each row draws the salted
    * uniform coordinate and gets priority `coord / weight` — the k
    * SMALLEST priorities win, so a row's inclusion probability grows
    * with its weight while the draw stays stable, engine-portable, and
    * re-runnable (the same properties every sampler in this module
    * trades `rand()` away for).
    *
    * The priority is the double division of two exact integers — both
    * engines compute the identical IEEE quotient, so the ranking needs
    * no rational arithmetic; ties (astronomically unlikely, but
    * engine-identical when they happen) break on the key. The cut is
    * the partial/final TopKPerKey pair under a constant key: each task
    * keeps its local k, the final reduce sees tasks×k rows — never a
    * global sort, never a driver merge. Non-positive weights fail the
    * job loudly (a zero/negative weight would otherwise win every
    * draw). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String): DataFrame = {
    require(k > 0, s"k: $k")
    // NULL must be caught explicitly: `NULL <= 0` is NULL (not true), so
    // without the isNull arm a NULL weight would slide into the otherwise
    // branch, produce a NULL priority, and nulls-first ascending ordering
    // would let the row silently win every draw.
    val w = when(weight.isNull || weight <= 0, raise_error(concat(
        lit("weightedSample: non-positive weight "),
        coalesce(weight.cast("string"), lit("NULL")))))
      .otherwise(weight.cast("double"))
    graft.plans.GraftOps.topKPerKey(
      df.withColumn("_wprio", coord(key, salt).cast("double") / w),
      Seq(lit(1)), Seq(col("_wprio").asc, key), k)
      .drop("_wprio")
  }

  /** Token-budget sequence packing: assign each document to a training
    * pack (context-window shard) of ~`budgetTokens` tokens. Documents
    * spread over `shards` independent streams by hash, order within a
    * shard by the same salted coordinate (deterministic, uniform), and a
    * document joins the pack its starting token offset falls in:
    * pack = floor(start_offset / budget).
    *
    * Offset packing rather than best-fit: assignment is a running sum +
    * a projection, fully deterministic and engine-portable, and every
    * pack's total stays within budget + one document. Each shard's
    * running sum is an independent partitioned window, so parallelism =
    * `shards` and no global sort exists anywhere. */
  def packByTokenBudget(df: DataFrame, key: Column, tokens: Column,
                        budgetTokens: Long, shards: Int,
                        salt: String): DataFrame = {
    require(budgetTokens > 0 && shards > 0, s"($budgetTokens, $shards)")
    val c = coord(key, salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_gshard")).orderBy(col("_gord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_gshard", pmod(c, lit(shards)))
      .withColumn("_gord", c)
      .withColumn("_gcum", sum(tokens).over(w))
      .withColumn("shard", col("_gshard").cast("int"))
      .withColumn("pack_id",
        floor((col("_gcum") - tokens) / budgetTokens).cast("long"))
      .drop("_gshard", "_gord", "_gcum")
  }

  /** Weighted corpus mix: sample each source at its rate and union,
    * tagging provenance. Rates > 1 are capped at 1 (this operator
    * subsamples; it does not duplicate rows — epoch repetition is a
    * training-loop concern, not a data-prep one). */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], key: Column,
                  salt: String): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.map { case (name, df, rate) =>
      hashSample(df, key, math.min(rate, 1.0), s"$salt|$name")
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Temperature-flattened source mix — the multilingual-pretraining
    * rebalance: subsample source s at rate r_s = (n_min / n_s)^(1-α),
    * so the kept distribution follows p_s ∝ n_s^α. α = 1 keeps every
    * row; α → 0 equalizes source counts; the rarest source always keeps
    * everything (this operator subsamples, like [[weightedMix]] —
    * upsampling/repetition belongs to the training loop).
    *
    * Plan shape at 100 TB: one grouped count (map-side partial) over the
    * source column, the per-source rate frame (|sources| rows) broadcast
    * back, and a map-side integer threshold compare — the corpus itself
    * never shuffles and the selection stays stable/replayable under the
    * same (salt, key) contract as every sampler here.
    *
    * Engine-exactness: at α = 0.5 the rate is sqrt(n_min/n_s); IEEE
    * division and sqrt are correctly rounded in every engine, so the
    * integer threshold (one floor of one product) is bit-identical and
    * the selection fully oracle-replayable. Other α go through pow(),
    * whose last-ulp behavior is implementation-defined — fine at scale,
    * but the oracle-gated query pins α = 0.5. */
  def temperatureMix(df: DataFrame, source: Column, key: Column,
                     alpha: Double, salt: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha: $alpha")
    val counts = df.groupBy(source.as("mix_source"))
      .agg(count(lit(1)).as("_n_s"))
    val nMin = counts.agg(min(col("_n_s")).as("_n_min"))
    val ratio = col("_n_min").cast("double") / col("_n_s").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val thr = counts.crossJoin(broadcast(nMin))
      .select(col("mix_source"),
        floor(rate * lit(HashSpace.toDouble)).cast("long").as("_thr"))
    df.withColumn("mix_source", source)
      .join(broadcast(thr), Seq("mix_source"))
      .filter(coord(key, salt) < col("_thr"))
      .drop("_thr")
  }
}
