package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Data profiling: per-column statistics for pipeline QA — the
  * check-before-you-train companion to the curation operators.
  *
  * One aggregate pass over the frame computes the row count and every
  * column's null count, distinct count, and min/max (stringified for a
  * uniform schema); the wide row is then melted to (column, stat) rows.
  *
  * [[profile]] uses exact `count_distinct` — N exact distincts in one agg
  * expand the input ~N-fold (Catalyst's Expand), the right trade at
  * QA/sample scale. [[profileApprox]] swaps in HyperLogLog
  * `approx_count_distinct` (no Expand, one pass, fixed-size sketches) —
  * the 100 TB path when cardinalities only need to be right to ~2%.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = profileWith(df, c => count_distinct(col(c)))

  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, distinct: String => Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    // row count folded into the same aggregate — a separate df.count()
    // would re-execute the whole upstream
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinct(c).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")
    cols.map { c =>
      (c,
        total,
        row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__distinct_$c"),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Equi-width histogram of a numeric column over [lo, hi): `bins` equal
    * buckets, under/overflow clamped into the edge buckets (the standard
    * profiling histogram; pair with [[Percentiles]] for equi-DEPTH cuts).
    *
    * 100 TB shape: one narrow scan computes the bin id per row, then ONE
    * partial-agged groupBy over at most `bins` keys — the shuffle carries
    * (bins x partitions) partial rows, never the corpus. Bin arithmetic is
    * `floor((v - lo) / width)` in doubles, identical expression order on
    * any IEEE engine (DuckDB twin: the same formula verbatim). Empty bins
    * are absent from the output (generate a scaffold downstream if a dense
    * vector is needed). Output: (bin long, lo_edge double, n long); null
    * values are dropped.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lo) / width).cast("long"),
      lit(0L)), lit(bins - 1L))
    df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (lit(lo) + col("bin") * width).as("lo_edge"),
        col("n"))
  }

  /** Deterministic HyperLogLog distinct estimate per group (Flajolet et
    * al. 2007), built from the repo's md5-long hash so the SAME registers
    * — and therefore the SAME estimate, bit for bit — reproduce on any
    * engine. Spark's `approx_count_distinct` is also HLL but its hash and
    * register layout are implementation-private; this variant exists so a
    * sketch-based cardinality can be GATE-PROVEN against an oracle rather
    * than trusted, and so registers persisted by one system can be merged
    * by another (max per register is the merge).
    *
    * Layout: 60-bit md5 hash; low 8 bits pick one of m=256 registers; the
    * remaining 52 bits w give rho = (leading zeros of w in 52 bits) + 1,
    * computed EXACTLY as 53 - bitlength(w) via string `bin()` (no
    * floating log). The harmonic denominator sums 2^(53-M_j) as exact
    * BIGINTs — the 2^53 scaling keeps even the rho=53 (w=0) register
    * integral; absent registers contribute 2^53 each and the max total
    * 2^61 fits comfortably — so the only floating steps are the final
    * alpha*m^2*2^53/S division and (below 2.5m) the standard
    * linear-counting correction m*ln(m/V) over the exact empty-register
    * count V — both written in one fixed literal order both engines
    * replay (ln + round-to-4 is the established cross-engine recipe, see
    * LanguageModel's gated NLL scores).
    *
    * 100 TB shape: one narrow projection (hash + register + rho), one
    * partial-agged shuffle to (group, register) max-rho cells — at most
    * 256 rows per group survive — then a per-group fold of those cells.
    * The exact `count_distinct` twin this replaces would Expand the corpus.
    * Output: (group, n_registers long, hll_est double rounded to 4).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol), groupCol)

  /** The sketch state: (group, register j, max rho) cells — at most 256
    * rows per group whatever the input size, mergeable by max(rho), and
    * exactly what a streaming aggregation can hold as bounded state
    * (see streaming.EventStreams.hllDistinctStream). */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = graft.functions.TextFunctions.md5Long(col(valueCol))
    df.select(col(groupCol), h.as("h"))
      // NB: Spark's two-arg SQL ltrim is (trimStr, str) — REVERSED from
      // DuckDB/Postgres — so the Scala `ltrim(col, trim)` function is the
      // unambiguous spelling here
      .select(col(groupCol), expr("h % 256").as("j"),
        (lit(53) - length(ltrim(bin(expr("h div 256")), "0"))).as("rho"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("rho")).as("m"))
  }

  /** Per-key equi-width histogram — [[histogram]] for every group at once
    * (value distributions per event type / per source, side by side).
    * Same exact bin arithmetic; ONE partial-agged groupBy over at most
    * keys x bins cells. Output: (key, bin, lo_edge, n). */
  def histogramByKey(df: DataFrame, keyCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lo) / width).cast("long"),
      lit(0L)), lit(bins - 1L))
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), bin.as("bin"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("bin"), (lit(lo) + col("bin") * width).as("lo_edge"),
        col("n"))
  }

  /** Exact mode (most frequent value) per group, ties to the SMALLEST
    * value — the categorical summary [[profile]]'s min/max can't give
    * (dominant language per source, dominant event type per user).
    * Two partial-agged aggregations — (key, value) counts, then the
    * x69-style max(struct(count, neg-value-order)) argmax — never a
    * per-key window sort. Values compare as strings for the tie (one
    * uniform schema); counts are exact. Output: (key, mode, n_mode). */
  def modeByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast("string").as("v"))
      .groupBy(col(keyCol), col("v"))
      .agg(count(lit(1)).as("n"))
    // argmax by (n asc-in-struct? we need max n, tie -> min v): Spark
    // struct ordering is field-by-field; there is no "descending string"
    // negation, so invert the roles: take MIN of (-n, v)
    counts.groupBy(col(keyCol))
      .agg(min(struct((-col("n")).as("nn"), col("v"))).as("b"))
      .select(col(keyCol), col("b.v").as("mode"), (-col("b.nn")).as("n_mode"))
  }

  /** Per-group EXTREMES review queue: the top-k and bottom-k rows by a
    * score within every group — the human-review workflow behind any
    * scorer rollout (read the best and worst of each source before
    * trusting the mean; x122 samples MID-band pairs, this surfaces the
    * tails). Two keyed rank windows (shuffle by group, never global),
    * output bounded at groups x 2k. Ties to the id. Output: (group, end
    * 'top'|'bottom', rk, id, score). */
  def extremesByKey(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val v = df.select(col(groupCol), col(idCol), col(scoreCol))
      .filter(col(scoreCol).isNotNull)
    def cut(end: String, desc: Boolean): DataFrame = {
      val ord = if (desc) Seq(col(scoreCol).desc, col(idCol).asc)
        else Seq(col(scoreCol).asc, col(idCol).asc)
      val w = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
      v.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col(groupCol), lit(end).as("end"), col("rk"), col(idCol),
          col(scoreCol))
    }
    cut("top", desc = true).unionAll(cut("bottom", desc = false))
  }

  /** Referential-integrity audit: how many child rows point at a parent
    * key that doesn't exist — the first data-quality gate on any
    * star-schema load (an orphan fact row silently vanishes from every
    * inner join downstream, so the join results LOOK clean while
    * undercounting). One equi LEFT ANTI join on the key (the parent side
    * reduces to its distinct keys first) + exact counts. Output: one row
    * (n_child, n_orphans, orphan_rate). */
  def refIntegrityReport(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
    val nChild = child.count()
    val orphans = child.select(col(childKey))
      .join(keys.hint("shuffle_hash"), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    orphans.select(lit(nChild).as("n_child"), col("n_orphans"),
      (col("n_orphans").cast("double") / lit(nChild.toDouble))
        .as("orphan_rate"))
  }

  /** Functional-dependency violation report: for "A should determine B"
    * (an order has one customer, a doc has one language), the A values
    * that map to MORE than one distinct B — the schema-assumption check
    * profiling tools run before anyone writes a join that silently
    * fans out. Two-stage distinct (the x31 shape — no COUNT DISTINCT
    * Expand). Output: (det value, n_distinct_dep) for violators only. */
  def fdViolations(df: DataFrame, detCol: String,
      depCol: String): DataFrame = {
    df.select(col(detCol), col(depCol))
      .filter(col(detCol).isNotNull && col(depCol).isNotNull)
      .distinct()
      .groupBy(col(detCol)).agg(count(lit(1)).as("n_distinct_dep"))
      .filter(col("n_distinct_dep") > 1L)
  }

  /** Small-cell disclosure report — the statistical-disclosure-control
    * rule applied before any cross-tab leaves the pipeline: cells of the
    * grouping with fewer than `k` rows identify near-unique subjects and
    * must be suppressed or coarsened. Returns the OFFENDING cells (the
    * suppression worklist), not just a count. One partial-agged groupBy
    * over the cell key space; exact counts. Output: (cols..., n) for
    * cells with n < k. */
  def smallCells(df: DataFrame, cols: Seq[String], k: Long): DataFrame = {
    require(cols.nonEmpty && k >= 2, "need grouping cols and k >= 2")
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Differentially-private-STYLE noisy release of a cross-tab: per-cell
    * counts plus Laplace(1/epsilon) noise — the Dwork et al. 2006
    * mechanism ([[smallCells]] suppresses risky cells; this is the other
    * standard disclosure control, publishing EVERY cell perturbed).
    * Counts have sensitivity 1 under add/remove-one-row adjacency, so
    * the Laplace scale is b = 1/epsilon.
    *
    * The uniform driving the inverse-CDF is DETERMINISTIC —
    * u = md5_60bit(seed|cell)/2^60 — so a release is reproducible
    * refresh-over-refresh and exactly replayable by the oracle; a
    * production deployment swaps the seeded uniform for a crypto RNG
    * (one expression), everything else identical. (Deterministic
    * per-cell noise also means re-running the release leaks nothing new
    * — fresh noise per query would compose the budget per run.)
    * noise = −b · sign(u−½) · ln(1 − 2|u−½|): a fixed double expression
    * over one exact integer, identical cross-engine (the trigram-LM ln
    * discipline), rounded once.
    *
    * 100 TB shape: ONE partial-agged groupBy to the cell frame; the
    * noise is a narrow per-cell expression on cell-count rows. Output:
    * (cols…, noisy_n, epsilon). */
  def dpNoisyCounts(df: DataFrame, cols: Seq[String], epsilon: Double,
      seed: Int = 42): DataFrame = {
    require(cols.nonEmpty && epsilon > 0.0, "need cells and epsilon > 0")
    val cell = concat_ws("|", lit(seed.toString) +: cols.map(col): _*)
    val u = graft.functions.TextFunctions.md5Long(cell).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val ctr = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(ctr) *
      log(lit(1.0) - lit(2.0) * abs(ctr))
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .select(cols.map(col) ++ Seq(
        round(col("n") + noise, 6).as("noisy_n"),
        lit(epsilon).as("epsilon")): _*)
  }

  /** Local-DP frequency release by randomized response (Warner 1965;
    * the one-bit ancestor of RAPPOR): each user's reported category is
    * their TRUE modal event type with probability p = keepMicro/1e6,
    * or a hash-"random" category otherwise, and the aggregator debiases
    * the observed counts with est(c) = (obs(c) − n·(1−p)/K) / p —
    * unbiased even though no individual report can be trusted; each
    * user's report is (ln(p·K/(1−p))+…)-LDP. The local-privacy sibling
    * of [[dpNoisyCounts]]'s central Laplace release: there the curator
    * sees the truth and noises the output, here the truth never leaves
    * the user.
    *
    * Determinism: the keep/fake coins are seeded md5 bits of the user
    * id (the [[dpNoisyCounts]] convention), so the release replays
    * bit-identically cross-engine; the debias expression is one double
    * fold per category with DYADIC p (default 0.75) so the literals
    * are exact. Output per category (dense over the domain): true_n —
    * emitted for gate/QA comparison, a real release would drop it —
    * obs_n, est_n.
    *
    * 100 TB shape: one (user,type) partial agg for modal types, the
    * category frame is domain-bounded, the keep/fake projection is
    * narrow, and the release is one category-sized groupBy. */
  def randomizedResponse(events: DataFrame, userCol: String,
      typeCol: String, keepMicro: Long = 750000L,
      seed: Int = 11): DataFrame = {
    require(keepMicro > 0L && keepMicro < 1000000L,
      s"keepMicro must be in (0, 1e6): $keepMicro")
    val d = (c: Column) => c.cast(DoubleType)
    val md5 = (tag: String) => graft.functions.TextFunctions.md5Long(
      concat_ws("|", lit("rr"), lit(seed.toString), lit(tag),
        col(userCol).cast("string")))
    // true category: the user's modal type (ties to the DESC type, the
    // x228 convention)
    val tc = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("cnt"))
    val modal = tc.withColumn("rn", row_number().over(
        Window.partitionBy(col(userCol))
          .orderBy(col("cnt").desc, col(typeCol).desc)))
      .filter(col("rn") === 1)
      .select(col(userCol), col(typeCol).as("true_c"))
    // indexed category domain (bounded frame; the K-row window)
    val cats = events.select(col(typeCol).as("c")).distinct()
      .withColumn("idx",
        (row_number().over(Window.orderBy(col("c").asc)) - 1).cast("long"))
    val kn = cats.agg(count(lit(1)).as("kk"))
      .crossJoin(modal.agg(count(lit(1)).as("nn")))
    val reported = modal.crossJoin(broadcast(kn))
      .withColumn("keep", pmod(md5("keep"), lit(1000000L)) < keepMicro)
      .withColumn("fake_idx", pmod(md5("cat"), col("kk")))
      .join(broadcast(cats.withColumnRenamed("c", "fake_c"))
        .withColumnRenamed("idx", "fake_idx"), Seq("fake_idx"))
      .withColumn("rep_c",
        when(col("keep"), col("true_c")).otherwise(col("fake_c")))
    val obs = reported.groupBy(col("rep_c").as("c"))
      .agg(count(lit(1)).as("obs_n"))
    val tru = modal.groupBy(col("true_c").as("c"))
      .agg(count(lit(1)).as("true_n"))
    val p = keepMicro.toDouble / 1000000.0
    val q = (1000000L - keepMicro).toDouble / 1000000.0
    // tru/obs are category-domain-sized aggregates: broadcast them so
    // the dense release never sort-merges K-row frames
    cats.join(broadcast(tru), Seq("c"), "left")
      .join(broadcast(obs), Seq("c"), "left")
      .crossJoin(broadcast(kn))
      .select(col("c").as("category"),
        coalesce(col("true_n"), lit(0L)).as("true_n"),
        coalesce(col("obs_n"), lit(0L)).as("obs_n"),
        round((d(coalesce(col("obs_n"), lit(0L))) -
          d(col("nn")) * lit(q) / d(col("kk"))) / lit(p), 6).as("est_n"))
  }

  /** Population stability index between two numeric distributions — the
    * industry-standard drift number (PSI < 0.1 stable, > 0.25 shifted)
    * for "did this feature/score move between snapshots", the NUMERIC
    * sibling of LanguageModel.sourceDrift's token KL: both frames bin
    * with [[histogram]]'s exact arithmetic, PSI = Σ (p_i - q_i)·ln(p_i/q_i)
    * with add-one smoothing over the fixed bin scaffold (empty bins
    * included — a mass shift INTO a previously-empty bin is exactly what
    * PSI must see).
    *
    * Cross-engine exactness: the per-bin counts are exact; the driver
    * folds the PSI sum in ascending-bin order (the x91 discipline —
    * DuckDB replays with an ORDER BY bin ordered aggregate) and rounds
    * to 6. Two partial-agged scans; the driver sees 2 x bins counts.
    * Output: one row (n_expected, n_actual, psi). */
  def psi(expected: DataFrame, actual: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val spark = expected.sparkSession
    import spark.implicits._
    def binCounts(df: DataFrame): Map[Long, Long] = {
      val width = (hi - lo) / bins
      val bin = least(greatest(
        floor((col(valueCol).cast("double") - lo) / width).cast("long"),
        lit(0L)), lit(bins - 1L))
      df.filter(col(valueCol).isNotNull).select(bin.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val e = binCounts(expected)
    val a = binCounts(actual)
    val ne = e.values.sum
    val na = a.values.sum
    require(ne > 0 && na > 0, "both frames need at least one binned value")
    val psiVal = (0L until bins.toLong).foldLeft(0.0) { (acc, i) =>
      val p = (e.getOrElse(i, 0L) + 1.0) / (ne + bins).toDouble
      val q = (a.getOrElse(i, 0L) + 1.0) / (na + bins).toDouble
      acc + (p - q) * math.log(p / q)
    }
    Seq((ne, na, BigDecimal(psiVal).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_expected", "n_actual", "psi")
  }

  /** One-row corpus report card — the numbers a dataset datasheet leads
    * with, computed in one pass plus two 1-row side frames: corpus size,
    * source count, total characters, exact-duplicate rate, English
    * fraction (per the x7 heuristic), mean quality score, and the median
    * document length. The go/no-go summary a refresh pipeline publishes
    * next to [[graft.operators.Cdc.corpusDiff]]'s status counts.
    *
    * Exactness: quality scores are 6-decimal-rounded, so the DECIMAL(18,6)
    * cast is exact and the sum order-independent; the mean divides the
    * exact sum (via the double-via-string hop) by an integer once.
    * dup_rate and pct_en are single divisions of exact counts; the median
    * is the x13-proven percentile pair.
    *
    * 100 TB shape: the main aggregate is ONE partial-agged scan (the
    * percentile's value buffer is the documented QA-scale trade —
    * Percentiles.exactSorted is the bounded swap); the distinct-fp and
    * distinct-source counts run as separate reduced frames crossJoined
    * back as broadcast 1-row results — deliberately NOT countDistinct in
    * the main agg, which would Expand the corpus once per distinct. At
    * sketch scale swap them for [[hllDistinct]]. */
  def corpusReportCard(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      nCharsCol: String = "n_chars"): DataFrame = {
    import graft.functions.TextFunctions
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val base = docs.select(col(sourceCol).as("src"), col(nCharsCol).as("nc"),
      TextFunctions.fingerprint(col(textCol)).as("fp"),
      TextFunctions.langId(col(textCol)).as("lp"),
      TextFunctions.qualityScore(col(textCol)).cast(d6).as("q"))
    val main = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("nc")).as("total_chars"),
      sum(when(col("lp") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(col("q")).as("sq"),
      expr("percentile(nc, 0.5)").as("p50_chars"))
    val uniq = base.select(col("fp")).distinct()
      .agg(count(lit(1)).as("n_unique"))
    val srcs = base.select(col("src")).distinct()
      .agg(count(lit(1)).as("n_sources"))
    main.crossJoin(broadcast(uniq)).crossJoin(broadcast(srcs))
      .select(col("n_docs"), col("n_sources"), col("total_chars"),
        ((col("n_docs") - col("n_unique")).cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        (col("n_en").cast("double") / col("n_docs").cast("double"))
          .as("pct_en"),
        (col("sq").cast("string").cast("double") /
          col("n_docs").cast("double")).as("mean_quality"),
        col("p50_chars"))
  }

  /** Rolling HLL distinct over time buckets: the distinct count for every
    * trailing window of `windowBuckets` buckets (weekly-active-users over
    * daily buckets, rolling distinct IPs, ...). THE demonstration of why
    * the register sketch beats count_distinct at scale: rolling exact
    * distincts need every window's VALUE SET (w overlapping corpus-sized
    * states), while HLL registers merge by max — the rolling state is a
    * 256-cell frame per bucket, merged across the window by one
    * range-frame max.
    *
    * 100 TB shape: ONE corpus scan partial-aggs to (bucket, register,
    * max-rho) cells; the dense scaffold (every bucket in the observed
    * range x 256 registers) is GENERATED (sequence explode x a broadcast
    * 256-row frame — the window max needs a row to land on even when the
    * register was absent from that bucket); the rolling max is a window
    * PARTITIONED BY REGISTER over |buckets| rows — everything after the
    * first scan is bounded by span x 256, not the corpus. Same md5
    * registers as [[hllDistinct]], so the estimates reproduce bit-for-bit
    * on any engine. Output: (bucket_us, n_registers, hll_est), one row
    * per observed-range bucket. */
  def rollingHllDistinct(df: DataFrame, tsCol: String, valueCol: String,
      bucketSeconds: Long, windowBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSeconds >= 1L && windowBuckets >= 1,
      "bucketSeconds and windowBuckets must be >= 1")
    val busc = bucketSeconds * 1000000L
    val bucketed = df.select(
      call_function("div", unix_micros(col(tsCol)), lit(busc)).as("bk"),
      col(valueCol).as("v"))
    val cells = hllRegisters(bucketed, "bk", "v")
    val buckets = cells.agg(min(col("bk")).as("lo"), max(col("bk")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bk"))
    val regs = df.sparkSession.range(0, 256).toDF("j")
    val w = Window.partitionBy(col("j")).orderBy(col("bk"))
      .rangeBetween(-(windowBuckets - 1L), 0L)
    val rolled = buckets.crossJoin(broadcast(regs))
      .join(cells, Seq("bk", "j"), "left")
      .withColumn("rm", max(col("m")).over(w))
      .filter(col("rm").isNotNull)
      .select(col("bk"), col("j"), col("rm").as("m"))
    hllEstimate(rolled, "bk")
      .select((col("bk") * busc).as("bucket_us"), col("n_registers"),
        col("hll_est"))
  }

  /** Fold register cells to the per-group estimate (see [[hllDistinct]]
    * for the exactness argument). */
  def hllEstimate(cells: DataFrame, groupCol: String): DataFrame = {
    val two53 = 9007199254740992L // 2^53
    val raw =
      lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
        lit(65536.0) * lit(two53.toDouble) /
        (col("s_present") + (lit(256L) - col("n_registers")) * lit(two53))
          .cast("double")
    val lc = lit(256.0) *
      log(lit(256.0) / (lit(256L) - col("n_registers")).cast("double"))
    cells.groupBy(col(groupCol))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), 53 - m)")).as("s_present"),
        count(lit(1)).as("n_registers"))
      .select(col(groupCol), col("n_registers"),
        round(
          when(raw <= 640.0 && col("n_registers") < 256L, lc).otherwise(raw),
          4).as("hll_est"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): for each
    * quasi-identifier cell, how many DISTINCT values of the sensitive
    * attribute appear — a k-anonymous release ([[smallCells]] passing)
    * still leaks when every member of a cell shares one sensitive value,
    * which is exactly what l_distinct = 1 reports. Cells below `l` are
    * flagged `at_risk`. The sensitive expression is any SQL expression
    * over the row (e.g. a bucketed numeric).
    *
    * One partial-agged groupBy with an exact distinct — at 100 TB swap
    * `count_distinct` for `approx_count_distinct` if sensitive
    * cardinality per cell is unbounded; here exactness is what the
    * oracle certifies.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveExpr: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty && l >= 2, "need QI cols and l >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(expr(sensitiveExpr)).as("l_distinct"))
      .withColumn("at_risk", col("l_distinct") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the release-audit ladder after [[smallCells]] (k-anonymity)
    * and [[lDiversity]]: an l-diverse cell still leaks when its
    * sensitive-value DISTRIBUTION skews far from the corpus's (the
    * "all rare diseases in one zip code" failure). Per QI class, the
    * total-variation distance between the class's sensitive distribution
    * and the global one, flagged when > t.
    *
    * EXACT integer arithmetic throughout (the x219 convention): tvd =
    * (1/2) Σ_v |k_cv/n_c − K_v/N| over the FULL global domain, folded
    * without a dense (class × value) spine via
    * Σ_{v∉class} K_v·n_c = n_c·N − Σ_{v∈class} K_v·n_c, so tvd =
    * (Σ_{v∈class} (|k_cv·N − K_v·n_c| − K_v·n_c) + n_c·N) / (2·n_c·N) —
    * present cells only, DECIMAL(38,0) cross products, ONE exact
    * decimal→double division at the edge.
    *
    * 100 TB shape: one partial-agged groupBy to the (QI class ×
    * sensitive value) cell frame; per-class and per-value totals are
    * WINDOW sums over that frame (round 10 — previously equi-joins,
    * which silently dropped NULL QI classes from the audit and leaked
    * NULL sensitive values' mass out of the per-class sum: a
    * false-negative channel in a privacy audit; window partitioning
    * groups NULLs like any other value, matching the
    * smallCells/lDiversity rungs). The one unpartitioned window runs
    * over the cell frame, which is domain-sized (QI × value), never
    * corpus-sized. Output per class: (qiCols..., n, tvd, at_risk). */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(qiCols.nonEmpty && t > 0.0 && t < 1.0,
      "need QI cols and t in (0,1)")
    val dec = DecimalType(38, 0)
    val cells = df.groupBy(
        (qiCols.map(col) :+ col(sensitiveCol).as("__sv")): _*)
      .agg(count(lit(1)).as("__k"))
    val wClass = Window.partitionBy(qiCols.map(col): _*)
    val wVal = Window.partitionBy(col("__sv"))
    val wAll = Window.partitionBy(lit(1))
    val kN = col("__k").cast(dec) * col("__n").cast(dec)
    val kvNc = col("__kv").cast(dec) * col("__nc").cast(dec)
    val num = cells
      .withColumn("__nc", sum(col("__k")).over(wClass))
      .withColumn("__kv", sum(col("__k")).over(wVal))
      .withColumn("__n", sum(col("__k")).over(wAll))
      .groupBy(qiCols.map(col): _*)
      .agg(max(col("__nc")).as("n"), max(col("__n")).as("__n"),
        sum(abs(kN - kvNc) - kvNc).as("__s"))
    // exact decimal numerator/denominator into doubles via string (the
    // j4 convention), ONE division, round to the 1e-6 grid
    val d = (c: Column) => c.cast("string").cast(DoubleType)
    num.select((qiCols.map(col) :+ col("n") :+
        round(d(col("__s") + col("n").cast(dec) * col("__n").cast(dec)) /
          d(col("n").cast(dec) * col("__n").cast(dec) * lit(2)),
          6).as("tvd")): _*)
      .withColumn("at_risk", col("tvd") > t)
  }

  /** Population Stability Index between a reference slice and a current
    * slice of an integer-valued feature (the standard refresh-over-refresh
    * drift monitor; PSI > 0.2 is the conventional "investigate" line,
    * > 0.25 "retrain"). Bins are REFERENCE quantile bins derived without a
    * separate quantile pass: bin(v) = (B * (cum_ref(v) - 1)) div n_ref
    * (left-closed — a value whose ref mass ENDS exactly at a B-quantile
    * edge stays in the lower bin, so uniform reference data bins evenly),
    * guarded at cum = 0 because DuckDB's // floors while Spark's div
    * truncates — integer division of exact counts, so the binning is
    * bit-identical on any engine and equal feature values can never
    * straddle a boundary.
    *
    * Engine-portability: per-bin proportions use add-half (Laplace)
    * smoothing — p = (r_b + 0.5)/(n_ref + B/2) — so empty bins are
    * well-defined without an epsilon hack; each bin's
    * (p - q) * ln(p / q) term is ROUNDED to the 1e-6 grid and summed as
    * exact DECIMAL (the x219 convention: no double summation order), then
    * the total is one exact decimal->double cast.
    *
    * 100 TB shape: two partial-agged groupBys reduce both slices to their
    * distinct-value frames (codomain-bounded — for unbounded or continuous
    * features the caller pre-quantizes, same contract as the
    * experiment-suite cum frames); the CDF window and everything after run
    * on that reduced frame plus a B-row spine. Nothing row-scale shuffles
    * twice, nothing collects.
    *
    * Output: one row per bin (bin, ref_n, cur_n, psi_term) with the total
    * (psi, drifted) repeated via a broadcast 1-row combine. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 8, threshold: Double = 0.2): DataFrame = {
    require(bins >= 2 && bins <= 64, s"bins must be in [2,64]: $bins")
    val spark = ref.sparkSession
    val d = (c: Column) => c.cast(DoubleType)
    def byValue(df: DataFrame, as: String): DataFrame =
      df.select(col(valueCol).cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as(as))
    val joined = byValue(ref, "r").join(byValue(cur, "c"), Seq("v"),
        "full_outer")
      .select(col("v"), coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("c"), lit(0L)).as("c"))
    // inclusive reference CDF on the distinct-value frame (bounded)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = joined.agg(sum(col("r")).as("n_ref"), sum(col("c")).as("n_cur"))
    val binned = joined.withColumn("cum_r", sum(col("r")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("bin",
        expr(s"(${bins}L * greatest(cum_r - 1L, 0L)) div n_ref"))
      .groupBy(col("bin"))
      .agg(sum(col("r")).as("ref_n"), sum(col("c")).as("cur_n"))
    // full B-row spine: empty bins still carry their smoothed term
    val spine = spark.range(bins.toLong).select(col("id").as("bin"))
    val p = (d(col("ref_n")) + lit(0.5)) / (d(col("n_ref")) + lit(bins / 2.0))
    val q = (d(col("cur_n")) + lit(0.5)) / (d(col("n_cur")) + lit(bins / 2.0))
    val cells = spine.join(binned, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .crossJoin(broadcast(tot))
      .withColumn("psi_term", round((p - q) * log(p / q), 6))
    // decimal -> double via string: both engines parse the exact decimal
    // rendering to the correctly-rounded double (the x219 convention)
    val total = cells
      .agg(sum(col("psi_term").cast(DecimalType(18, 6))).as("psi_dec"))
      .select(col("psi_dec").cast("string").cast("double").as("psi"))
    cells.crossJoin(broadcast(total))
      .select(col("bin"), col("ref_n"), col("cur_n"), col("psi_term"),
        col("psi"), (col("psi") > threshold).as("drifted"))
  }

  /** Jensen–Shannon divergence between the TOKEN distributions of two
    * corpus slices (Lin 1991) — the content-drift companion to
    * [[psiDrift]]'s single-feature monitor: PSI sees document lengths
    * move, JS sees the vocabulary itself move (new domains, a language
    * shift, template churn). Symmetric, bounded by ln 2, and defined
    * without smoothing because the mixture m = (p+q)/2 is nonzero
    * wherever either side has mass (0·ln 0 terms drop exactly).
    *
    * Engine-portability: p and q are exact-integer-ratio doubles
    * (identical cross-engine); each token's contribution
    * ½ p·ln(p/m) + ½ q·ln(q/m) is ROUNDED to the 1e-6 grid and summed
    * as exact DECIMAL over the vocabulary frame — no double summation
    * order — then one exact string->double cast. js_norm divides by the
    * pinned ln 2 literal.
    *
    * 100 TB shape: one explode + partial-agged token count per slice,
    * a vocab-sized full-outer equi-join, and a 1-row reduce of that
    * frame. Nothing row-scale after the token counts. Output: one row
    * (n_ref_tokens, n_cur_tokens, n_types, js_div, js_norm, drifted). */
  def jsDivergence(ref: DataFrame, cur: DataFrame, textCol: String,
      threshold: Double = 0.1): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    def tokCounts(df: DataFrame, as: String): DataFrame =
      df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val joined = tokCounts(ref, "r").join(tokCounts(cur, "c"), Seq("tok"),
        "full_outer")
      .select(coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("c"), lit(0L)).as("c"))
    // totals via a window ON the vocab frame (the ksArms convention), so
    // the token-count scans run exactly once — an agg + crossJoin-back
    // would re-evaluate both corpus scans (the x192 duplicate-subtree
    // hazard)
    val w = Window.partitionBy(lit(1))
    val withTot = joined
      .withColumn("nr", sum(col("r")).over(w))
      .withColumn("nc", sum(col("c")).over(w))
      .withColumn("n_types", count(lit(1)).over(w))
    val p = d(col("r")) / d(col("nr"))
    val q = d(col("c")) / d(col("nc"))
    val m = (p + q) / lit(2.0)
    val term = round(
      when(col("r") > 0L, p * log(p / m) / lit(2.0)).otherwise(lit(0.0)) +
        when(col("c") > 0L, q * log(q / m) / lit(2.0)).otherwise(lit(0.0)),
      6)
    withTot
      .agg(max(col("nr")).as("n_ref_tokens"),
        max(col("nc")).as("n_cur_tokens"),
        max(col("n_types")).as("n_types"),
        sum(term.cast(DecimalType(28, 6))).as("js_dec"))
      .select(col("n_ref_tokens"), col("n_cur_tokens"), col("n_types"),
        col("js_dec").cast("string").cast("double").as("js_div"))
      .withColumn("js_norm",
        round(col("js_div") / lit(0.6931471805599453), 6))
      .withColumn("drifted", col("js_norm") > threshold)
  }

  /** 1-D Wasserstein (earth-mover) distance between each group's
    * integer-valued distribution and the GLOBAL one: W1 = Σ over sorted
    * distinct values |F_g(v) − F(v)|·gap(v) — the drift number that,
    * unlike [[psiDrift]]/[[jsDivergence]], weighs HOW FAR the mass
    * moved, not just that bins disagree (a +1-char shift and a
    * doubled-length tail get very different W1 at similar PSI).
    *
    * Exactness: CDF differences are integer cross-multiplications
    * (|cum_s·n_g − cum_g·n_s| like the x221 KS fold), scaled by the
    * integer gap and summed in Decimal(38,0); ONE string-bridged
    * double division by n_s·n_g at the end (the x239 gs convention).
    * Frames: a (group × distinct-value) grid — codomain-bounded, never
    * row-scale; group spine broadcast. Output per group:
    * (group, n, w1). */
  def wasserstein1d(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val d = (c: Column) => c.cast(DoubleType)
    val counts = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val groups = counts.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val values = counts.groupBy(col("v")).agg(sum(col("c")).as("c_all"))
    val wv = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalCum = values
      .withColumn("cum_all", sum(col("c_all")).over(wv))
      .withColumn("gap",
        coalesce(lead(col("v"), 1).over(Window.orderBy(col("v"))) -
          col("v"), lit(0L)))
      .withColumn("n_all", sum(col("c_all")).over(Window.partitionBy(lit(1))))
      .select(col("v"), col("cum_all"), col("gap"), col("n_all"))
    val grid = broadcast(groups).crossJoin(globalCum)
      .join(counts, Seq("g", "v"), "left")
      .select(col("g"), col("n_g"), col("v"), col("cum_all"), col("gap"),
        col("n_all"), coalesce(col("c"), lit(0L)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = grid.withColumn("cum_g", sum(col("c")).over(wg))
      .withColumn("term",
        abs(col("cum_g").cast(dec) * col("n_all").cast(dec) -
          col("cum_all").cast(dec) * col("n_g").cast(dec)) *
          col("gap").cast(dec))
    terms.groupBy(col("g"), col("n_g"), col("n_all"))
      .agg(sum(col("term")).as("t"))
      .select(col("g").as(groupCol), col("n_g").as("n"),
        round(col("t").cast("string").cast(DoubleType) /
          (d(col("n_g")) * d(col("n_all"))), 6).as("w1"))
  }

  /** Benford first-digit audit (Newcomb 1881, Benford 1938): the
    * leading-digit distribution of a naturally-occurring amount column
    * against log10(1+1/d) — the standard synthetic-data / fabricated-
    * records detector (organic multiplicative amounts follow the law;
    * uniformly generated or hand-crafted ones pile onto wrong digits).
    * Values land on the exact integer grid (round(v·scale) as long,
    * non-positives dropped) and the leading digit comes from a
    * CASE-ladder of exact integer divisions — no per-row log10, so
    * both engines bucket identically. Output one row per digit 1..9:
    * (digit, n_obs, obs_frac, exp_frac, chi2_term), fracs rounded at
    * 6; empty input yields n=0 rows with NULL fracs. */
  def benford(df: DataFrame, valueCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1: $scale")
    val spark = df.sparkSession
    val d = (c: Column) => c.cast(DoubleType)
    val p10 = Iterator.iterate(1L)(_ * 10L).take(19).toSeq
    val m = round(col(valueCol).cast(DoubleType) * lit(scale.toDouble))
      .cast("long")
    val digit = coalesce((18 to 0 by -1).map(k =>
      when(col("m") >= lit(p10(k)),
        call_function("div", col("m"), lit(p10(k))))): _*)
    val obs = df.select(m.as("m")).filter(col("m") > 0L)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val spine = spark.range(1L, 10L).select(col("id").as("digit"))
    val cells = spine.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy(lit(1))))
    val expP = log(lit(1.0) + lit(1.0) / d(col("digit"))) /
      log(lit(10.0))
    val obsF = when(col("n") === 0L, lit(null).cast(DoubleType))
      .otherwise(d(col("n_obs")) / d(col("n")))
    val chiT = when(col("n") === 0L, lit(null).cast(DoubleType))
      .otherwise((d(col("n_obs")) - d(col("n")) * expP) *
        (d(col("n_obs")) - d(col("n")) * expP) / (d(col("n")) * expP))
    cells.select(col("digit"), col("n_obs"),
        round(obsF, 6).as("obs_frac"), round(expP, 6).as("exp_frac"),
        round(chiT, 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** Freedman-Diaconis histogram advisor: the bin count a histogram of
    * `valueCol` SHOULD use — width = 2*IQR/cbrt(n) (Freedman &
    * Diaconis 1981, robust to the outliers that wreck range/Sturges
    * choices), bins = ceil(range/width) clamped to [1, 512]. The
    * pre-flight for [[histogram]]/x62 and every dashboard that
    * otherwise hardcodes 20 bins: too few hides modes, too many turns
    * a 100 TB scan into noise. Values land on the exact integer grid
    * v = round(value*scale) (the [[benford]] cent convention); Q1/Q3
    * are integer-exact type-1 quantiles (min v with cum*4 >= n /
    * 3n) on the distinct-value frame. Zero IQR pins width NULL and
    * bins 1 (a point mass needs no histogram).
    *
    * Output one row: (n, v_min, v_max, iqr, fd_width, fd_bins) in
    * original value units.
    *
    * 100 TB shape: one partial-agged value-frame reduce; the
    * cumulative window orders the distinct-value (codomain-bounded)
    * frame. */
  def histogramAdvisor(df: DataFrame, valueCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val d = (c: Column) => c.cast("double")
    val byV = df
      .select(round(col(valueCol) * scale).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val wcum = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val th = byV
      .withColumn("n", sum(col("cnt")).over(tot))
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .agg(max(col("n")).as("n"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        min(when(col("cum") * 4L >= col("n"), col("v"))).as("q1"),
        min(when(col("cum") * 4L >= col("n") * 3L, col("v"))).as("q3"))
    val widthGrid = lit(2.0) * d(col("q3") - col("q1")) / cbrt(d(col("n")))
    th.select(col("n"),
      round(d(col("vmin")) / scale, 6).as("v_min"),
      round(d(col("vmax")) / scale, 6).as("v_max"),
      round(d(col("q3") - col("q1")) / scale, 6).as("iqr"),
      round(when(col("q3") === col("q1"),
        lit(null).cast("double")).otherwise(widthGrid / scale), 6)
        .as("fd_width"),
      when(col("q3") === col("q1"), lit(1L))
        .otherwise(least(lit(512L), greatest(lit(1L),
          ceil(d(col("vmax") - col("vmin")) / widthGrid).cast("long"))))
        .as("fd_bins"))
  }

  /** k-anonymity generalization planner: for each candidate
    * granularity g of the NUMERIC quasi-identifier (bucket = value
    * div g, the [[psiDrift]] integer-div convention), audit the
    * (categorical QI, bucket) cells and report whether every cell
    * reaches `k` — plus which granularity is the COARSEST-NECESSARY
    * choice (the smallest g that satisfies k: generalize no more than
    * the data requires, Sweeney 2002's minimal-generalization
    * principle). [[smallCells]] finds today's violations; this plans
    * the release schema that has none.
    *
    * Output per granularity: (granularity, n_cells, min_cell,
    * cells_below_k, satisfies_k, chosen) with `chosen` true on the
    * smallest satisfying granularity (false everywhere when none
    * satisfies — publish nothing, or suppress).
    *
    * 100 TB shape: one partial-agged groupBy per candidate granularity
    * (the ladder is a handful of scans), each reduced to a 1-row
    * audit; the chosen-marking window orders the ladder-sized frame. */
  def kAnonPlanner(df: DataFrame, qidCat: String, qidNum: String,
      k: Long, granularities: Seq[Long] = Seq(1L, 10L, 100L, 1000L))
      : DataFrame = {
    require(k >= 2 && granularities.nonEmpty &&
      granularities.forall(_ >= 1), "need k >= 2 and granularities >= 1")
    val perGran = granularities.map { g =>
      df.select(col(qidCat).as("c"),
          call_function("div", col(qidNum).cast("long"), lit(g)).as("b"))
        .groupBy(col("c"), col("b")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_cells"), min(col("n")).as("min_cell"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("cells_below_k"))
        .select(lit(g).as("granularity"), col("n_cells"),
          col("min_cell"), col("cells_below_k"))
    }
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    perGran.reduce(_.unionByName(_))
      .withColumn("satisfies_k", col("min_cell") >= k)
      .withColumn("chosen",
        col("satisfies_k") && col("granularity") ===
          min(when(col("min_cell") >= k, col("granularity"))).over(tot))
      .orderBy(col("granularity"))
  }
}
