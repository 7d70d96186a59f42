package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style data-quality report every pipeline
  * runs before trusting a new snapshot: per column, row/null/distinct
  * counts and the value range. The reference has no profiling surface;
  * this is the ingest-side QC row the training-data layer needs ("did the
  * crawl refresh halve the id space / null out a column / shift the time
  * range").
  *
  * ONE pass over the table: every per-column statistic is an aggregate in
  * a single wide agg row (Spark plans the exact multi-column distincts as
  * one Expand — input×columns rows, the documented cost of exactness;
  * swap [[Sketches.kmvDistinct]] in when an estimate is enough), then the
  * wide row unpivots with `stack` into one row per column. Min/max are
  * cast to strings AFTER aggregation in the column's own type — profile
  * integral/string columns (quantize doubles first) so the string forms
  * are engine-portable.
  */
object Profile {

  /** DISTRIBUTION-DRIFT check between two snapshots of a numeric column —
    * the monitoring row a nightly refresh runs before publishing: bin
    * edges are the REFERENCE snapshot's interior `nBins`-quantiles (one
    * bounded percentile collect, 6 dp parity regime; bin = count of edges
    * strictly below, ties down — the
    * [[CorpusSignals.qualityStrata]] convention), both snapshots count
    * into those fixed bins, and each bin reports its chi-square
    * contribution `(obs − exp)²/exp` (exp = the reference share scaled to
    * the current total) in exact integer micro-units via decimal(38,0) —
    * sum the contributions against χ²(nBins−1) to alarm. A bin the
    * reference holds but the current snapshot lost (or vice versa) shows
    * up as its full contribution, not an error.
    *
    * Scale shape: two bin-cardinality aggregates plus 1-row totals
    * broadcast; binning is map-side.
    *
    * Output: bin, ref_n, cur_n, exp_cur_milli, chi2_micro. */
  def driftCheck(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val fracs = (1 until nBins).map(_.toDouble / nBins)
    val edges = ref
      .agg(transform(percentile(col(valueCol).cast("long"),
        array(fracs.map(lit): _*)), b => round(b, 6)).as("bs"))
      .head.getSeq[Double](0)
    def binned(df: DataFrame, out: String): DataFrame = {
      val bin = edges.foldLeft(lit(0L): Column) { (acc, b) =>
        acc + (col(valueCol).cast("long") > lit(b)).cast("long")
      }
      df.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as(out))
    }
    val r = binned(ref, "ref_n")
    val c = binned(cur, "cur_n")
    val joined = r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = broadcast(joined.agg(sum(col("ref_n")).as("_rt"),
      sum(col("cur_n")).as("_ct")))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    joined.crossJoin(totals)
      .select(col("bin"), col("ref_n"), col("cur_n"),
        call_function("div", col("ref_n") * col("_ct") * 1000L, col("_rt"))
          .as("exp_cur_milli"),
        when(col("ref_n") === 0, lit(null).cast("long")).otherwise(
          (dec(col("cur_n") * col("_rt") - col("ref_n") * col("_ct")) *
            dec(col("cur_n") * col("_rt") - col("ref_n") * col("_ct")) *
            dec(lit(1000000L)) /
            (dec(col("_rt")) * dec(col("ref_n")) * dec(col("_ct"))))
            .cast("bigint")).as("chi2_micro"))
  }

  /** JOIN-KEY SKEW audit — the pre-join check that decides salting/AQE
    * strategy at scale: per key column, the total row count, distinct key
    * count, the HOTTEST key's share in ppm, and the ratio of the hottest
    * key's count to the mean per-key count (milli-units). A hot-share in
    * the percents (or hot/mean ≫ 1000 milli) on a shuffle key is the
    * skew that strands a reducer at 100 TB.
    *
    * One partial+final count per key column (key-cardinality exchange),
    * the hottest key via max(struct) — no window, no sort.
    *
    * Output: key_column, n_rows, n_keys, hot_key, hot_n, hot_share_ppm,
    * hot_over_mean_milli. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkew needs at least one key column")
    keyCols.map { k =>
      df.groupBy(col(k).cast("string").as("_k"))
        .agg(count(lit(1)).as("_n"))
        .agg(sum(col("_n")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(struct(col("_n"), col("_k"))).as("_hot"))
        .select(lit(k).as("key_column"), col("n_rows"), col("n_keys"),
          col("_hot._k").as("hot_key"), col("_hot._n").as("hot_n"),
          expr("(_hot._n * 1000000) div n_rows").as("hot_share_ppm"),
          expr("(_hot._n * n_keys * 1000) div n_rows").as("hot_over_mean_milli"))
    }.reduce(_ unionByName _)
  }

  /** Pairwise Pearson CORRELATIONS over integral columns in ONE pass: all
    * moment sums (Σx, Σx², Σxy) are exact integer aggregates in a single
    * wide row, the correlation assembles from them in decimal(38,0) (no
    * long overflow at any n) and divides as deterministic doubles rounded
    * to 6 dp — engine-exact given exact moments, no second scan, no
    * per-pair job. Quantize doubles to integer units first (the
    * engine-parity discipline everywhere else).
    *
    * Output: one row per unordered pair — col_a, col_b, n, corr. */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlations needs at least two columns")
    // second moments sum in decimal(38,0): a milli-quantized 1e8-scale
    // column squares to 1e16 per row — a long sum overflows within 1k rows
    val d38 = (c: Column) => c.cast("long").cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.flatMap(c => Seq(
        sum(col(c).cast("long")).as(s"__s_$c"),
        sum(d38(col(c)) * d38(col(c))).as(s"__q_$c"))) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum(d38(col(a)) * d38(col(b))).as(s"__p_${a}_$b")
      }.toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pairs = cols.combinations(2).map { case Seq(a, b) =>
      val num = dec(col("__n")) * dec(col(s"__p_${a}_$b")) -
        dec(col(s"__s_$a")) * dec(col(s"__s_$b"))
      def varOf(c: String) =
        (dec(col("__n")) * dec(col(s"__q_$c")) -
          dec(col(s"__s_$c")) * dec(col(s"__s_$c"))).cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        round(num.cast("double") / (sqrt(varOf(a)) * sqrt(varOf(b))), 6).as("corr"))
    }.toSeq
    wide.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.n").as("n"), col("p.corr").as("corr"))
  }

  /** Output: column, n_rows, n_nulls, n_distinct, min_value, max_value. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', __n_$c, __d_$c, __mn_$c, __mx_$c").mkString(", ")
    wide
      .select(col("__rows"),
        expr(s"stack(${cols.size}, $stacked) AS (col_name, __n, n_distinct, min_value, max_value)"))
      .select(col("col_name").as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("__n")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Poisson(1) CDF in truncated ppm (k = 0..8; mass beyond 8 is < 2 ppm
    * and maps to weight 9) — the literal table [[bootstrapMeans]] inverts. */
  private val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L, 999989L, 999998L)

  /** POISSON BOOTSTRAP of a metric's mean (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams" — the bootstrap that scales):
    * instead of materializing B global resamples, every row draws an
    * independent Poisson(1) replication weight PER REPLICA, so one
    * map-side explode (B rows per input row) plus one aggregation yields
    * all B resample means. The draw is DETERMINISTIC: u = md5(salt, id,
    * replica) mod 1e6 inverted through the literal Poisson CDF table —
    * exact integers end to end, so every engine reproduces every replica
    * (no RNG, no seed drift). The replica means' spread IS the sampling
    * distribution; take their quantiles for a CI.
    *
    * Output: replica, n_eff (Σ weights), sum_milli, mean_milli
    * (= sum div n_eff, NULL for an all-zero-weight replica). */
  def bootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
      replicas: Int = 32, salt: String = "boot"): DataFrame = {
    require(replicas >= 2, s"replicas must be >= 2, got $replicas")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val u = pmod(graft.pipeline.Hashing.md5Long(
      concat(lit(s"$salt:"), col(idCol).cast("string"), lit(":"),
        col("replica").cast("string"))), lit(1000000L))
    val weight = PoissonCdfPpm
      .map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _) // = #thresholds at or below u = the inverted draw
    df.select(col(idCol),
        expr(s"cast(round($valueCol * 1000) as bigint)").as("_vm"))
      .select(col(idCol), col("_vm"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .select(col("replica"), col("_vm"), weight.as("_w"))
      .groupBy("replica")
      .agg(sum(col("_w")).as("n_eff"),
        sum(col("_w") * col("_vm")).as("sum_milli"))
      .withColumn("mean_milli",
        when(col("n_eff") > 0, idiv(col("sum_milli"), col("n_eff"))))
  }

  /** Bootstrapped TREATMENT LIFT: [[bootstrapMeans]] per experiment arm,
    * replicas paired — each replica reports both arm means and their
    * difference, so the replica-difference spread is the CI on the lift
    * (the uncertainty read q_ab_lift's point estimate lacks, without any
    * normality assumption). Same single explode + ONE (arm, replica)
    * aggregation; the pairing join runs on the replica-grain table.
    * Weights hash on (salt, id, replica) only, so a row keeps the same
    * draw whichever arm it lands in — arm assignment and resampling stay
    * independent.
    *
    * Output per replica: replica, n_a, n_b, mean_a_milli, mean_b_milli,
    * lift_milli (NULL if either arm emptied). */
  def bootstrapLift(df: DataFrame, idCol: String, valueCol: String,
      armCol: String, replicas: Int = 32, salt: String = "boot"): DataFrame = {
    require(replicas >= 2, s"replicas must be >= 2, got $replicas")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val u = pmod(graft.pipeline.Hashing.md5Long(
      concat(lit(s"$salt:"), col(idCol).cast("string"), lit(":"),
        col("replica").cast("string"))), lit(1000000L))
    val weight = PoissonCdfPpm
      .map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val perArm = df.select(col(idCol), col(armCol).cast("long").as("_arm"),
        expr(s"cast(round($valueCol * 1000) as bigint)").as("_vm"))
      .select(col(idCol), col("_arm"), col("_vm"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .select(col("replica"), col("_arm"), col("_vm"), weight.as("_w"))
      .groupBy("replica", "_arm")
      .agg(sum(col("_w")).as("_n"), sum(col("_w") * col("_vm")).as("_s"))
      .withColumn("_m", when(col("_n") > 0, idiv(col("_s"), col("_n"))))
    val a = perArm.filter(col("_arm") === 0)
      .select(col("replica"), col("_n").as("n_a"), col("_m").as("mean_a_milli"))
    val b = perArm.filter(col("_arm") === 1)
      .select(col("replica"), col("_n").as("n_b"), col("_m").as("mean_b_milli"))
    a.join(b, Seq("replica"))
      .select(col("replica"), col("n_a"), col("n_b"),
        col("mean_a_milli"), col("mean_b_milli"),
        (col("mean_b_milli") - col("mean_a_milli")).as("lift_milli"))
  }
}
