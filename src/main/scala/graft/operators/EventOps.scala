package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (batch form; the
  * Structured Streaming form of the windowed aggregation lives in
  * graft.streaming.StreamOps and shares these semantics).
  *
  * Window starts are emitted as second-precision strings: the parquet
  * carries nanosecond timestamps, Spark truncates to microseconds on
  * read, and string form at the window boundary sidesteps the precision
  * mismatch against the oracle engine.
  */
object EventOps {

  /** Tumbling 10-minute windows: count + sum(value) per (window, type). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Sliding windows, 10-minute length / 5-minute slide: every event lands
    * in exactly two windows.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * user inactivity. Classic two-window composition — lag to mark
    * session starts, running sum to number sessions — then one
    * aggregation per session. Shuffles once on user_id; at 100 TB this
    * is the shape you want (sessionization never needs a global sort,
    * only per-user ordering inside the user's partition).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
    marked
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Exact interpolated quantiles of `value` per event type (Spark's
    * `percentile`, the order-statistics exact form — not the approximate
    * t-digest `approx_percentile`, whose sketch would never match an
    * oracle).
    */
  /** Exact-duplicate profile of an event stream: per type, total events,
    * distinct (user, ts, value) keys, and the duplicate surplus — the
    * dedup-before-ingest accounting step. One hash aggregate; the
    * distinct count rides the same shuffle on event_type.
    */
  def dedupStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id"), col("ts"), col("value")).as("n_distinct"))
      .withColumn("n_dupes", col("n_events") - col("n_distinct"))

  /** Join/aggregation-key skew audit — the pre-flight a 100 TB shuffle
    * runs before picking a strategy: the `topN` heaviest values of
    * `keyCol` with per-key count, parts-per-million share of all rows,
    * and the global key stats (distinct keys, total rows, max count)
    * repeated on every row for one-table consumption. The numbers decide
    * between a plain hash join, salting ([[graft.SparkEntry]]'s
    * `salted_agg` companion), or an AQE skew split.
    *
    * Scale shape: one map-side-partial count keyed on the audited key,
    * then a top-N that never global-sorts (TakeOrdered over one row per
    * DISTINCT key) and a single-row totals aggregate broadcast onto the
    * N survivors. Integer ppm (`cnt * 1e6 div total`) keeps the report
    * hash-identical cross-engine.
    */
  def skewKeyReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"))
    counts
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("key"))).cast("int"))
      .crossJoin(broadcast(totals))
      .select(
        col("rank"),
        col("key"),
        col("cnt"),
        expr("cnt * 1000000 div total_rows").as("share_ppm"),
        col("n_keys"),
        col("total_rows"),
        col("max_cnt"))
  }

  /** Ordered-funnel analysis: for the step sequence s₁ → s₂ → … → sₖ, a
    * user reaches step i when events of those types occur in strict
    * timestamp order. Computed greedily — tᵢ = min ts of an sᵢ event
    * AFTER tᵢ₋₁ — which is exact: if any witness sequence exists, the
    * earliest-completion one does. Output: one row per step with the
    * users reaching it and integer-ppm conversion vs step 1.
    *
    * Scale shape: one filtered scan per step (the event-type equality
    * pushes to the scan), each collapsed to one row per user by a
    * map-side-partial min and joined back on user_id — per-step state is
    * O(users), never a per-user event list, and k is the funnel length
    * (a small constant). Same-timestamp ties do not progress (strict >),
    * so the result is deterministic.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    def stepCount(reached: DataFrame, step: Int, tpe: String): DataFrame =
      reached
        .agg(count(lit(1)).as("n_users"))
        .select(lit(step).cast("int").as("step"), lit(tpe).as("event_type"), col("n_users"))
    var reached = ev
      .filter(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t"))
    val perStep = scala.collection.mutable.ArrayBuffer(stepCount(reached, 1, steps.head))
    steps.zipWithIndex.drop(1).foreach { case (tpe, i) =>
      reached = ev
        .filter(col("event_type") === tpe)
        .alias("e")
        .join(reached.alias("r"), col("e.user_id") === col("r.user_id"))
        .filter(col("e.ts") > col("r.t"))
        .groupBy(col("e.user_id").as("user_id"))
        .agg(min(col("e.ts")).as("t"))
      perStep += stepCount(reached, i + 1, tpe)
    }
    val u = perStep.reduce(_ unionAll _)
    val first = u.filter(col("step") === 1).select(col("n_users").as("n0"))
    u.crossJoin(broadcast(first))
      .select(
        col("step"),
        col("event_type"),
        col("n_users"),
        expr("n_users * 1000000 div n0").as("conv_ppm"))
  }

  /** Weekly retention-cohort matrix: users grouped by the ISO week
    * (Monday-truncated, identical in both engines) of their FIRST event;
    * for each (cohort week, week offset) the cohort members active that
    * week, the cohort size, and integer-ppm retention. Offsets are exact
    * multiples of 7 days between two Mondays, so the integer division is
    * exact. Cohort week is emitted as a date STRING — the established
    * cross-engine convention for calendar boundaries.
    *
    * Scale shape: first-event week is a map-side-partial min per user;
    * weekly activity a distinct on (user, week) — both one exchange keyed
    * on user_id and mutually co-partitioned for the matrix join; cohort
    * sizes are a tiny aggregate broadcast back onto the matrix.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val matrix = ev
      .distinct()
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), expr("datediff(wk, cohort_wk) div 7").cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_size"))
    matrix
      .join(broadcast(sizes), Seq("cohort_wk"))
      .select(
        col("cohort_wk").cast("string").as("cohort_week"),
        col("week_offset"),
        col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000000 div cohort_size").as("retained_ppm"))
  }

  def quantiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))

  /** Per-type outlier report via Tukey fences: an event is anomalous
    * when its value leaves [p25 − 1.5·IQR, p75 + 1.5·IQR] — the robust
    * (quartile-based) alternative to z-scores, immune to the outliers
    * it hunts inflating the threshold, and deterministic where a
    * mean/stddev formulation is not (distributed double sums are
    * order-nondeterministic at the last ulp; order statistics are
    * exact, and the 6-decimal rounding of the fences is the same
    * contract [[quantiles]] already hash-matches under).
    *
    * Scale shape: pass 1 computes the per-type fences (5 rows); pass 2
    * re-scans with the fence table BROADCAST — a counting aggregate,
    * map-side partial, no second shuffle of the events. At 100 TB the
    * exact percentile inside pass 1 is the piece to swap for
    * [[quantilesBinned]]'s histogram — the fence logic is unchanged.
    */
  def anomalies(events: DataFrame): DataFrame = {
    val fences = events
      .groupBy(col("event_type").as("ft"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.75)"), 6).as("p75"),
        count(lit(1)).as("n"))
      .select(
        col("ft"),
        col("n"),
        round(col("p25") - (col("p75") - col("p25")) * 1.5, 6).as("lo_fence"),
        round(col("p75") + (col("p75") - col("p25")) * 1.5, 6).as("hi_fence"))
    events
      .join(broadcast(fences), col("event_type") === col("ft"))
      .groupBy(col("event_type"), col("n"), col("lo_fence"), col("hi_fence"))
      .agg(
        sum(when(col("value") < col("lo_fence") || col("value") > col("hi_fence"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("value")).as("max_value"))
      .select(
        col("event_type"),
        col("n"),
        col("lo_fence"),
        col("hi_fence"),
        col("n_outliers"),
        col("max_value"))
  }

  /** Histogram-binned approximate quantiles — the SCALE path next to
    * [[quantiles]]' exact baseline: exact per-group percentiles need a
    * full sort of every value, while this is one hash aggregate on
    * (type, bin) — map-side partial, mergeable, bounded state — plus a
    * per-type cumulative scan over the (small) histogram. The estimate
    * is within half the 0.25 bin width of the rank-ceil(q·n) order
    * statistic; against the INTERPOLATED exact percentile the gap can
    * reach about one bin (interpolation lands between order statistics).
    *
    * Determinism: the bin is `floor(value * 4)` — multiplication by an
    * exactly-representable constant (no 1/width division noise), the
    * rank thresholds are the integer forms of ceil(q·n), and both
    * engines evaluate the identical expressions — so the estimates
    * hash-match the oracle exactly, which a t-digest/GK sketch never
    * could (their merge order is nondeterministic).
    */
  def quantilesBinned(events: DataFrame): DataFrame =
    quantilesFromHist(
      events
        .select(col("event_type"), floor(col("value") * 4).cast("long").as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("c")))

  /** Quantile extraction from a (event_type, bin, c) histogram — shared
    * by the batch operator and the streaming form (where the histogram
    * is the continuously-maintained state and this runs over the sink).
    */
  def quantilesFromHist(hist: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the per-type total rides the SAME window stage as the cumulative
    // sum (whole-partition frame) — no second aggregate, no join back
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
    // both quantiles in ONE pass over the cumulative histogram: the
    // smallest bin whose cumulative count reaches ceil(q·n), with the
    // rank thresholds in exact integer arithmetic (ceil(n/2) =
    // (n+1) div 2; ceil(19n/20) = (19n+19) div 20); min(when(...))
    // ignores below-rank rows (null)
    cum
      .groupBy(col("event_type"), col("n"))
      .agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))).as("b50"),
        min(when(col("cum") >= expr("(19 * n + 19) div 20"), col("bin"))).as("b95"))
      .select(
        col("event_type"),
        col("n"),
        round((col("b50") + 0.5) / 4.0, 6).as("p50_est"),
        round((col("b95") + 0.5) / 4.0, 6).as("p95_est"))
  }

  /** Binned quantile treatment effects — the distributional companion
    * of the mean-effect readouts ([[abTest]]/[[did]]): a treatment that
    * moves the median differently from the tail is invisible to a mean
    * difference, so experimentation platforms report the effect AT
    * quantiles (Athey & Imbens 2017's heterogeneity point, in the
    * binned form a 100 TB corpus permits). Per arm (the [[abTest]]
    * user_id parity assignment), the quarter-unit value histogram
    * ([[quantilesBinned]]'s grid) gives each arm's binned CDF; the
    * p25/p50/p75 bins are the smallest bins reaching ceil(q·n) in
    * EXACT integer rank arithmetic, and the QTE at q is the bin-center
    * difference — pure integer bin math, bit-identical cross-engine.
    *
    * Scale shape: one corpus scan → (arm, bin) histogram (hash,
    * map-side partial) → windows over the BOUNDED histogram (≤ arms ×
    * bins rows) → 3 output rows. The quantile never sorts the corpus.
    *
    * Output: one row per quantile `(q_pct, n_ctrl, n_treat, p_ctrl_est,
    * p_treat_est, qte_est)`.
    */
  def qteBinned(events: DataFrame): DataFrame = {
    val hist = events
      .select(
        pmod(col("user_id"), lit(2L)).as("arm"),
        floor(col("value") * 4).cast("long").as("bin"))
      .groupBy(col("arm"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val w = Window
      .partitionBy(col("arm"))
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("arm"))))
    val qb = cum
      .groupBy(col("arm"), col("n"))
      .agg(
        min(when(col("cum") >= expr("(n + 3) div 4"), col("bin"))).as("b25"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))).as("b50"),
        min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("bin"))).as("b75"))
    def armCol(a: Int, c: String) =
      sum(when(col("arm") === a.toLong, col(c)).otherwise(lit(null))).as(s"$c$a")
    val wide = qb.agg(
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n_ctrl"),
      sum(when(col("arm") === 1L, col("n")).otherwise(0L)).as("n_treat"),
      armCol(0, "b25"), armCol(1, "b25"),
      armCol(0, "b50"), armCol(1, "b50"),
      armCol(0, "b75"), armCol(1, "b75"))
    wide.select(
      col("n_ctrl"),
      col("n_treat"),
      expr(
        "stack(3, 25L, b250, b251, 50L, b500, b501, 75L, b750, b751) AS (q_pct, bc, bt)"))
      .select(
        col("q_pct"),
        col("n_ctrl"),
        col("n_treat"),
        round((col("bc") + 0.5) / 4.0, 6).as("p_ctrl_est"),
        round((col("bt") + 0.5) / 4.0, 6).as("p_treat_est"),
        round((col("bt") - col("bc")) / 4.0, 6).as("qte_est"))
  }

  /** [[qteBinned]] mirrored: the same histogram windows, the stack
    * unpivot spelled as a 3-way UNION ALL.
    */
  def qteBinnedSql(): String = {
    val rows = Seq(
      ("25", "b25"), ("50", "b50"), ("75", "b75")).map { case (q, b) =>
      s"""SELECT CAST($q AS BIGINT) AS q_pct, n_ctrl, n_treat,
         |       round((${b}0 + 0.5) / 4.0, 6) AS p_ctrl_est,
         |       round((${b}1 + 0.5) / 4.0, 6) AS p_treat_est,
         |       round((${b}1 - ${b}0) / 4.0, 6) AS qte_est
         |FROM wide""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH hist AS (
       |  SELECT ((user_id % 2) + 2) % 2 AS arm, CAST(floor(value * 4) AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT *, CAST(sum(c) OVER (PARTITION BY arm ORDER BY bin
       |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |         CAST(sum(c) OVER (PARTITION BY arm) AS BIGINT) AS n
       |  FROM hist),
       |qb AS (
       |  SELECT arm, n,
       |         min(CASE WHEN cum >= (n + 3) // 4 THEN bin END) AS b25,
       |         min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) AS b50,
       |         min(CASE WHEN cum >= (3 * n + 3) // 4 THEN bin END) AS b75
       |  FROM cum GROUP BY arm, n),
       |wide AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_ctrl,
       |         CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_treat,
       |         CAST(sum(CASE WHEN arm = 0 THEN b25 END) AS BIGINT) AS b250,
       |         CAST(sum(CASE WHEN arm = 1 THEN b25 END) AS BIGINT) AS b251,
       |         CAST(sum(CASE WHEN arm = 0 THEN b50 END) AS BIGINT) AS b500,
       |         CAST(sum(CASE WHEN arm = 1 THEN b50 END) AS BIGINT) AS b501,
       |         CAST(sum(CASE WHEN arm = 0 THEN b75 END) AS BIGINT) AS b750,
       |         CAST(sum(CASE WHEN arm = 1 THEN b75 END) AS BIGINT) AS b751
       |  FROM qb)
       |$rows""".stripMargin
  }

  /** JSON property extraction + aggregation: pulls `$.k` out of the props
    * JSON column (Spark-native get_json_object — codegen'd path) and
    * aggregates per event type.
    */
  def jsonAgg(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Product stickiness (DAU / trailing-7-day WAU) per day, in exact
    * ppm: the engagement time-series a product team reads daily. The
    * per-day distinct (day, user) pairs are ONE distinct aggregate
    * over the events; the trailing window is a bounded self-join of
    * that tiny day-grain table (days × 7 rows) — the events are never
    * rescanned or re-shuffled for the window.
    *
    * Output: `(day, dau, wau, stickiness_ppm)`.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val dayUsers = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val du = dayUsers.alias("du")
    val w = dayUsers.select(col("day").as("wday"), col("user_id")).alias("w")
    val wau = du
      .select(col("day")).distinct()
      .join(w, col("wday") >= date_sub(col("day"), 6) && col("wday") <= col("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dau = dayUsers.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    dau
      .join(wau, Seq("day"))
      .select(
        col("day").cast("string").as("day"),
        col("dau"),
        col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
  }

  /** [[stickiness]] mirrored. */
  def stickinessSql(): String =
    s"""WITH dayu AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM dayu GROUP BY day),
       |wau AS (SELECT d.day, CAST(count(DISTINCT w.user_id) AS BIGINT) AS wau
       |        FROM (SELECT DISTINCT day FROM dayu) d
       |        JOIN dayu w ON w.day >= d.day - INTERVAL 6 DAY AND w.day <= d.day
       |        GROUP BY d.day)
       |SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
       |       dau.dau * 1000000 // wau.wau AS stickiness_ppm
       |FROM dau JOIN wau USING (day)""".stripMargin

  /** MAD robust outliers — the median-based companion of the Tukey
    * fences ([[anomalies]]): per event type, median, median absolute
    * deviation, and the count of events whose deviation exceeds
    * `3.5 · 1.4826 · MAD` (the classic robust z cutoff; 1.4826 scales
    * MAD to σ under normality). Order statistics + one broadcast
    * counting pass — deterministic where mean/stddev is not, and the
    * 6 dp rounding contract is [[quantiles]]'s. Same 100 TB note: the
    * exact percentiles swap for the binned histogram, the outlier
    * logic unchanged.
    *
    * Output: `(event_type, n, med, mad, n_outliers)`.
    */
  def madOutliers(events: DataFrame): DataFrame = {
    val med = events
      .groupBy(col("event_type").as("mt"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val dev = events
      .join(broadcast(med), col("event_type") === col("mt"))
      .select(col("event_type"), col("value"), col("med"))
    val stats = dev
      .groupBy(col("event_type").as("st"), col("med"))
      .agg(
        round(expr("percentile(round(abs(value - med), 6), 0.5)"), 6).as("mad"),
        count(lit(1)).as("n"))
    events
      .join(broadcast(stats), col("event_type") === col("st"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(
          when(round(abs(col("value") - col("med")), 6) > round(lit(5.1891d) * col("mad"), 6), 1L)
            .otherwise(0L)).as("n_outliers"))
  }

  /** [[madOutliers]] mirrored. */
  def madOutliersSql(): String =
    s"""WITH med AS (
       |  SELECT event_type AS mt, round(quantile_cont(value, 0.5), 6) AS med
       |  FROM events GROUP BY 1),
       |stats AS (
       |  SELECT e.event_type AS st, m.med,
       |         round(quantile_cont(round(abs(e.value - m.med), 6), 0.5), 6) AS mad,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events e JOIN med m ON e.event_type = m.mt GROUP BY 1, 2)
       |SELECT e.event_type, max(s.n) AS n, max(s.med) AS med, max(s.mad) AS mad,
       |       CAST(sum(CASE WHEN round(abs(e.value - s.med), 6) >
       |                          round(5.1891 * s.mad, 6)
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM events e JOIN stats s ON e.event_type = s.st
       |GROUP BY e.event_type""".stripMargin

  /** First-order Markov transition matrix of user behavior: for every
    * consecutive event pair within a user's timeline (ts order,
    * event_id tiebreak), count `prev_type → event_type` and report the
    * row-normalized probability in exact micro-units
    * (`n · 10⁶ div row_total` — integer on both engines). The behavior
    * model behind next-event prediction and funnel design; also the
    * production smoke test for session integrity (an impossible
    * transition shows up as nonzero mass).
    *
    * Scale shape: one window (lag) keyed on user_id, one hash
    * aggregate on the (prev, next) pair — |types|² output rows no
    * matter the event volume.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val cnt = pairs
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt
      .groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    cnt
      .join(tot, Seq("prev_type"))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n"),
        expr("n * 1000000 div row_total").as("p_micro"))
  }

  /** [[markovTransitions]] mirrored. */
  def markovTransitionsSql(): String =
    s"""WITH p AS (
       |  SELECT user_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |c AS (SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
       |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
       |SELECT c.prev_type, c.next_type, c.n, c.n * 1000000 // t.row_total AS p_micro
       |FROM c JOIN t USING (prev_type)""".stripMargin

  // ---- distribution-drift monitors ----------------------------------------

  /** PSI bin width for [[psiDrift]] (value units per bin — ~20 bins
    * over the harness value range, the 10–25 the PSI literature
    * prescribes). */
  val PsiBinWidth = 25.0d

  /** The reference/current split both drift monitors share: the event
    * time range's integer midpoint (`lo + (hi − lo) div 2` in epoch
    * micros — exact on both engines), events at or before it are the
    * REFERENCE window, after it the CURRENT window. A production run
    * feeds two explicit snapshots; the midpoint split makes the
    * harness query self-contained and deterministic.
    */
  private def windowed(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
    events
      .join(broadcast(bounds))
      .withColumn(
        "win",
        when(unix_micros(col("ts")) <= expr("lo + (hi - lo) div 2"), lit("ref"))
          .otherwise(lit("cur")))
  }

  private val windowedSql: String =
    s"""b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
       |w AS (SELECT e.*, CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2
       |                       THEN 'ref' ELSE 'cur' END AS win
       |      FROM events e CROSS JOIN b)""".stripMargin

  /** Population Stability Index per event type between the reference
    * and current halves of the stream — THE production drift alarm for
    * feature distributions (PSI < 0.1 stable, 0.1–0.25 shifting,
    * > 0.25 drifted). Values bin at fixed width [[PsiBinWidth]];
    * Laplace-smoothed shares `p = (n + 1) / (N + B)` (B = bins the
    * type hits in either window) keep empty bins finite with no
    * epsilon grid; each bin's `(p_cur − p_ref)·ln(p_cur/p_ref)` is
    * rounded to integer micro-units BEFORE the sum (the [[TextOps]]
    * KL discipline) so the cross-bin total is order-free integer
    * addition, identical however Spark partitions it.
    *
    * Scale shape: one scan → hash aggregate on (type, bin) with
    * map-side partials; everything after runs on ≤ |types|·|bins|
    * rows. The 1-row bounds aggregate broadcasts — no driver collect.
    *
    * Output: `(event_type, n_ref, n_cur, n_bins, psi_micro)`.
    */
  def psiDrift(events: DataFrame): DataFrame = {
    val cnt = windowed(events)
      .select(
        col("event_type"),
        col("win"),
        floor(col("value") / lit(PsiBinWidth)).cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(
        sum(when(col("win") === "ref", 1L).otherwise(0L)).as("nr"),
        sum(when(col("win") === "cur", 1L).otherwise(0L)).as("nc"))
    psiFromCounts(cnt)
  }

  /** [[psiDrift]]'s scoring tail over a prepared per-(type, bin) count
    * table `(event_type, bin, nr, nc)` — shared with the STREAMING psi
    * gate, whose `nc` side comes out of a streaming aggregation while
    * `nr` is the stored reference histogram.
    */
  private[graft] def psiFromCounts(cnt: DataFrame): DataFrame = {
    val tot = cnt
      .groupBy(col("event_type").as("tt"))
      .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"), count(lit(1)).as("nb"))
    cnt
      .join(broadcast(tot), col("event_type") === col("tt"))
      .withColumn("pr", (col("nr") + 1).cast("double") / (col("tr") + col("nb")).cast("double"))
      .withColumn("pc", (col("nc") + 1).cast("double") / (col("tc") + col("nb")).cast("double"))
      .withColumn(
        "term_micro",
        round((col("pc") - col("pr")) * log(col("pc") / col("pr")) * 1000000.0d).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cur"),
        max(col("nb")).as("n_bins"),
        sum(col("term_micro")).as("psi_micro"))
  }

  /** [[psiDrift]] mirrored. */
  def psiDriftSql(): String =
    s"""WITH $windowedSql,
       |c AS (
       |  SELECT event_type, CAST(floor(value / $PsiBinWidth) AS BIGINT) AS bin,
       |         CAST(sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
       |         CAST(sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |  FROM w GROUP BY 1, 2),
       |t AS (SELECT event_type AS tt, CAST(sum(nr) AS BIGINT) AS tr,
       |             CAST(sum(nc) AS BIGINT) AS tc, CAST(count(*) AS BIGINT) AS nb
       |      FROM c GROUP BY 1),
       |x AS (
       |  SELECT c.event_type, t.tr, t.tc, t.nb,
       |         CAST(c.nr + 1 AS DOUBLE) / CAST(t.tr + t.nb AS DOUBLE) AS pr,
       |         CAST(c.nc + 1 AS DOUBLE) / CAST(t.tc + t.nb AS DOUBLE) AS pc
       |  FROM c JOIN t ON c.event_type = t.tt)
       |SELECT event_type, max(tr) AS n_ref, max(tc) AS n_cur, max(nb) AS n_bins,
       |       CAST(sum(CAST(round((pc - pr) * ln(pc / pr) * 1000000.0) AS BIGINT)) AS BIGINT)
       |         AS psi_micro
       |FROM x GROUP BY event_type""".stripMargin

  /** Kaplan–Meier estimator of time-to-first-purchase — survival
    * analysis over the event stream, the curve behind conversion-lag
    * and churn dashboards: per user, the duration (hours) from first
    * event to first purchase, RIGHT-CENSORED at observation end for
    * users who never purchase (they leave the risk set without an
    * event — dropping them instead would bias survival down, the
    * classic mistake KM exists to fix). The curve is carried in LOG
    * domain: each event-time's `ln(1 − d/n)` factor is rounded to
    * integer micro-units and the cross-time product becomes an integer
    * cumulative sum — order-free, no floating product chain. `s_ppm`
    * re-exponentiates in one fixed expression. A time where every
    * remaining at-risk user converts (S hits exactly 0) has no finite
    * log and ends the curve's support — the row guard, not a data
    * loss.
    *
    * Scale shape: two per-user aggregates and a 1-row broadcast, then
    * everything runs on the DURATION HISTOGRAM (≤ distinct durations,
    * not users); the single-series cumulative windows over that
    * compressed table only.
    *
    * Output: one row per conversion time
    * `(t_hr, n_risk, n_events, ln_s_micro, s_ppm)`.
    */
  def survivalKm(events: DataFrame): DataFrame = {
    // ONE corpus scan: the three per-user/global reductions the estimator
    // needs (first event, first purchase, per-user max ts) fold in a
    // single grouped aggregate — min(when(purchase, ts)) ≡ the filtered
    // per-user min (NULL when the user never purchases, exactly the
    // left-join absence it replaces), and the global observation end is
    // the max of the per-user maxima. The old shape scanned events three
    // times (u, p, oe), and the un-materialized histogram doubled the
    // whole subtree under the n_total cross join — 6 scans in the final
    // plan where one suffices (guide §7.2, duplicated subtrees; §6,
    // scan-count at scale).
    val perUser = Phys.materialized(
      events
        .groupBy(col("user_id"))
        .agg(
          min(unix_micros(col("ts"))).as("f"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("fp"),
          max(unix_micros(col("ts"))).as("me")))
    val oe = perUser.agg(max(col("me")).as("e"))
    val d = perUser
      .crossJoin(broadcast(oe))
      .select(
        when(col("fp").isNull, expr("(e - f) div 3600000000"))
          .otherwise(expr("(fp - f) div 3600000000"))
          .as("t_hr"),
        when(col("fp").isNull, 0L).otherwise(1L).as("ev"))
    // the duration histogram is ≤ |distinct t_hr| rows; materialized so
    // the n_total aggregate and the risk-set window read it once instead
    // of re-running the per-user pipeline
    val h = Phys.materialized(
      d.groupBy(col("t_hr"))
        .agg(count(lit(1)).as("n_exit"), sum(col("ev")).as("n_events")))
    val tot = h.agg(sum(col("n_exit")).as("n_total"))
    val ord = Window.orderBy(col("t_hr")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("n_total") - sum(col("n_exit")).over(ord) + col("n_exit"))
      .filter(col("n_events") > 0L && col("n_risk") > col("n_events"))
      .withColumn(
        "term",
        expr("CAST(round(ln(CAST(n_risk - n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))" +
          " * 1000000) AS BIGINT)"))
      .withColumn("ln_s_micro", sum(col("term")).over(ord))
      .select(
        col("t_hr"),
        col("n_risk"),
        col("n_events"),
        col("ln_s_micro"),
        expr("CAST(round(exp(CAST(ln_s_micro AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT)")
          .as("s_ppm"))
  }

  /** [[survivalKm]] mirrored. */
  def survivalKmSql(): String =
    s"""WITH u AS (SELECT user_id, min(ts) AS f FROM events GROUP BY 1),
       |p AS (SELECT user_id, min(ts) AS fp FROM events WHERE event_type = 'purchase'
       |      GROUP BY 1),
       |oe AS (SELECT max(ts) AS e FROM events),
       |d AS (
       |  SELECT CASE WHEN p.fp IS NULL
       |              THEN (epoch_us(oe.e) - epoch_us(u.f)) // 3600000000
       |              ELSE (epoch_us(p.fp) - epoch_us(u.f)) // 3600000000 END AS t_hr,
       |         CASE WHEN p.fp IS NULL THEN 0 ELSE 1 END AS ev
       |  FROM u LEFT JOIN p USING (user_id) CROSS JOIN oe),
       |h AS (SELECT t_hr, CAST(count(*) AS BIGINT) AS n_exit,
       |             CAST(sum(ev) AS BIGINT) AS n_events
       |      FROM d GROUP BY 1),
       |t AS (SELECT CAST(sum(n_exit) AS BIGINT) AS n_total FROM h),
       |rk AS (
       |  SELECT h.t_hr, h.n_exit, h.n_events,
       |         t.n_total - CAST(sum(h.n_exit) OVER (ORDER BY h.t_hr
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT) + h.n_exit AS n_risk
       |  FROM h CROSS JOIN t),
       |km AS (
       |  SELECT t_hr, n_risk, n_events,
       |         CAST(sum(CAST(round(ln(CAST(n_risk - n_events AS DOUBLE)
       |                 / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT))
       |             OVER (ORDER BY t_hr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ln_s_micro
       |  FROM rk WHERE n_events > 0 AND n_risk > n_events)
       |SELECT t_hr, n_risk, n_events, ln_s_micro,
       |       CAST(round(exp(CAST(ln_s_micro AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT)
       |         AS s_ppm
       |FROM km""".stripMargin

  /** Mann–Whitney U drift per event type between the same reference/
    * current halves — the RANK-based member of the two-sample battery
    * ([[psiDrift]] sees binned mass, [[ksDrift]] the sup-norm CDF gap,
    * MWU the stochastic ordering): `U/(n₁n₂) = P(ref < cur) +
    * ½P(ref = cur)`, i.e. the ROC-AUC of "which window is this value
    * from" — 500000 ppm means no shift, 1e6 means total separation.
    * Tie-corrected midranks are kept DOUBLED (`2·cum_before + c + 1` —
    * always integer), so U and the AUC are exact 64-bit rationals,
    * bit-identical cross-engine with no floating rank anywhere.
    *
    * Scale shape: identical to [[ksDrift]] — the scan compresses to the
    * per-(type, value) histogram first; ranks come from running sums
    * over that compressed table. Doubled rank sums stay under 2·n²
    * (≈ 2·10¹⁰ at sf0.1); past ~10⁹ rows per type the same statistic
    * runs on the binned histogram.
    *
    * Output: `(event_type, n_ref, n_cur, u2_ref, auc_cur_ppm)`.
    */
  def mwuDrift(events: DataFrame): DataFrame = {
    val h = windowed(events)
      .groupBy(col("event_type"), col("value").as("v"))
      .agg(
        sum(when(col("win") === "ref", 1L).otherwise(0L)).as("nr"),
        sum(when(col("win") === "cur", 1L).otherwise(0L)).as("nc"))
    val ord = Window
      .partitionBy(col("event_type"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = h
      .withColumn("cumt", sum(col("nr") + col("nc")).over(ord))
      // doubled midrank of the tie group at v: 2·cum_before + c + 1
      .withColumn("mr2", lit(2L) * col("cumt") - (col("nr") + col("nc")) + 1L)
    val tot = ranked
      .groupBy(col("event_type").as("tt"))
      .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
    ranked
      .groupBy(col("event_type"))
      .agg(sum(col("nr") * col("mr2")).as("r1_2"))
      .join(broadcast(tot), col("event_type") === col("tt"))
      .select(
        col("event_type"),
        col("tr").as("n_ref"),
        col("tc").as("n_cur"),
        // doubled U of the REF sample: 2·R1 − n1(n1+1)
        (col("r1_2") - col("tr") * (col("tr") + 1L)).as("u2_ref"),
        // AUC of "cur tends larger": 1 − U_ref/(n1·n2), in exact ppm
        when(col("tr") * col("tc") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(2 * tr * tc - (r1_2 - tr * (tr + 1))) * 1000000 div (2 * tr * tc)"))
          .as("auc_cur_ppm"))
  }

  /** [[mwuDrift]] mirrored. */
  def mwuDriftSql(): String =
    s"""WITH $windowedSql,
       |h AS (
       |  SELECT event_type, value AS v,
       |         CAST(sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
       |         CAST(sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |  FROM w GROUP BY 1, 2),
       |rk AS (
       |  SELECT event_type, nr, nc,
       |         2 * CAST(sum(nr + nc) OVER (PARTITION BY event_type ORDER BY v
       |                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |           - (nr + nc) + 1 AS mr2
       |  FROM h),
       |t AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc
       |      FROM h GROUP BY 1),
       |r AS (SELECT event_type, CAST(sum(nr * mr2) AS BIGINT) AS r1_2
       |      FROM rk GROUP BY 1)
       |SELECT r.event_type, t.tr AS n_ref, t.tc AS n_cur,
       |       r.r1_2 - t.tr * (t.tr + 1) AS u2_ref,
       |       CASE WHEN t.tr * t.tc = 0 THEN NULL
       |            ELSE (2 * t.tr * t.tc - (r.r1_2 - t.tr * (t.tr + 1))) * 1000000
       |                 // (2 * t.tr * t.tc) END AS auc_cur_ppm
       |FROM r JOIN t USING (event_type)""".stripMargin

  /** Behavioral-diversity profile: per-user Shannon entropy of the
    * event-TYPE distribution (0 = single-behavior, ln|types| =
    * uniform), rolled into quarter-nat buckets — the engagement-mix
    * histogram behind persona segmentation and bot screening (a scripted
    * client sits at entropy ≈ 0; organic users spread). Per-(user, type)
    * shares are exact rationals; each `−p·ln p` term is micro-rounded
    * before the per-user integer sum (the KL discipline); the bucket is
    * an integer division of the micro entropy.
    *
    * Scale shape: one (user, type) hash aggregate (map-side partials),
    * a user-keyed totals join, a per-user integer sum, a ≤ ~10-row
    * bucket rollup.
    *
    * Output: `(ent_bucket, n_users, min_ent_micro, max_ent_micro)`.
    */
  def userEntropyProfile(events: DataFrame): DataFrame = {
    val ut = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val tot = ut.groupBy(col("user_id")).agg(sum(col("c")).as("n"))
    val ent = ut
      .join(tot, Seq("user_id"))
      .withColumn(
        "term_micro",
        expr("""CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                |  * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)""".stripMargin))
      .groupBy(col("user_id"))
      .agg(sum(col("term_micro")).as("ent_micro"))
    ent
      .groupBy(expr("ent_micro div 250000").as("ent_bucket"))
      .agg(
        count(lit(1)).as("n_users"),
        min(col("ent_micro")).as("min_ent_micro"),
        max(col("ent_micro")).as("max_ent_micro"))
  }

  /** [[userEntropyProfile]] mirrored. */
  def userEntropyProfileSql(): String =
    s"""WITH ut AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM ut GROUP BY 1),
       |e AS (
       |  SELECT ut.user_id,
       |         CAST(sum(CAST(round(-(CAST(ut.c AS DOUBLE) / CAST(t.n AS DOUBLE))
       |             * ln(CAST(ut.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1000000) AS BIGINT))
       |           AS BIGINT) AS ent_micro
       |  FROM ut JOIN t USING (user_id) GROUP BY 1)
       |SELECT ent_micro // 250000 AS ent_bucket, CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(min(ent_micro) AS BIGINT) AS min_ent_micro,
       |       CAST(max(ent_micro) AS BIGINT) AS max_ent_micro
       |FROM e GROUP BY 1""".stripMargin

  /** CATEGORICAL mix drift between the reference/current halves — the
    * drift battery's missing axis (PSI/KS/MWU watch a numeric column;
    * this watches the event-TYPE composition): total-variation
    * distance `½ Σ|p_ref − p_cur|` as an EXACT integer ppm (common
    * denominator `tr·tc`, no floating shares), plus the chi-squared
    * homogeneity statistic with micro-rounded cell terms. A traffic
    * mix that shifts (more errors, fewer purchases) moves TV even
    * when every numeric distribution is stable.
    *
    * Scale shape: one hash aggregate to the |types|-row two-window
    * count table; everything after runs on that bounded table.
    *
    * Output: one row `(n_ref, n_cur, n_types, tv_ppm, chi2_micro)`.
    */
  def typeMixDrift(events: DataFrame): DataFrame = {
    val cnt = windowed(events)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("win") === "ref", 1L).otherwise(0L)).as("nr"),
        sum(when(col("win") === "cur", 1L).otherwise(0L)).as("nc"))
    val tot = cnt.agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
    cnt
      .crossJoin(broadcast(tot))
      .select(
        col("nr"),
        col("nc"),
        col("tr"),
        col("tc"),
        abs(col("nr") * col("tc") - col("nc") * col("tr")).as("tvn"),
        // chi2 homogeneity: two cells per type, e = rowtot·coltot/N;
        // an EMPTY window (tr or tc = 0) has zero expectations — the
        // statistic is undefined, guarded to 0 here and NULL at the top
        expr("""CASE WHEN tr = 0 OR tc = 0 THEN CAST(0 AS BIGINT)
                |ELSE CAST(round((
                |  (nr - CAST((nr + nc) AS DOUBLE) * CAST(tr AS DOUBLE)
                |        / CAST(tr + tc AS DOUBLE))
                |  * (nr - CAST((nr + nc) AS DOUBLE) * CAST(tr AS DOUBLE)
                |        / CAST(tr + tc AS DOUBLE))
                |  / (CAST((nr + nc) AS DOUBLE) * CAST(tr AS DOUBLE)
                |     / CAST(tr + tc AS DOUBLE))
                |  + (nc - CAST((nr + nc) AS DOUBLE) * CAST(tc AS DOUBLE)
                |        / CAST(tr + tc AS DOUBLE))
                |  * (nc - CAST((nr + nc) AS DOUBLE) * CAST(tc AS DOUBLE)
                |        / CAST(tr + tc AS DOUBLE))
                |  / (CAST((nr + nc) AS DOUBLE) * CAST(tc AS DOUBLE)
                |     / CAST(tr + tc AS DOUBLE))
                |  ) * 1000000) AS BIGINT) END""".stripMargin).as("cell_micro"))
      .agg(
        max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cur"),
        count(lit(1)).as("n_types"),
        expr("""CASE WHEN max(tr) * max(tc) = 0 THEN NULL
                |ELSE sum(tvn) * 1000000 div (2 * max(tr) * max(tc)) END""".stripMargin)
          .as("tv_ppm"),
        expr("CASE WHEN max(tr) * max(tc) = 0 THEN NULL ELSE sum(cell_micro) END")
          .as("chi2_micro"))
  }

  /** [[typeMixDrift]] mirrored. */
  def typeMixDriftSql(): String =
    s"""WITH $windowedSql,
       |c AS (SELECT event_type,
       |             CAST(sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
       |             CAST(sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |      FROM w GROUP BY 1),
       |t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc FROM c),
       |x AS (
       |  SELECT c.nr, c.nc, t.tr, t.tc,
       |         abs(c.nr * t.tc - c.nc * t.tr) AS tvn,
       |         CASE WHEN t.tr = 0 OR t.tc = 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(round((
       |           (c.nr - CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tr AS DOUBLE)
       |                 / CAST(t.tr + t.tc AS DOUBLE))
       |           * (c.nr - CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tr AS DOUBLE)
       |                 / CAST(t.tr + t.tc AS DOUBLE))
       |           / (CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tr AS DOUBLE)
       |              / CAST(t.tr + t.tc AS DOUBLE))
       |           + (c.nc - CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tc AS DOUBLE)
       |                 / CAST(t.tr + t.tc AS DOUBLE))
       |           * (c.nc - CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tc AS DOUBLE)
       |                 / CAST(t.tr + t.tc AS DOUBLE))
       |           / (CAST(c.nr + c.nc AS DOUBLE) * CAST(t.tc AS DOUBLE)
       |              / CAST(t.tr + t.tc AS DOUBLE))
       |           ) * 1000000) AS BIGINT) END AS cell_micro
       |  FROM c CROSS JOIN t)
       |SELECT max(tr) AS n_ref, max(tc) AS n_cur, CAST(count(*) AS BIGINT) AS n_types,
       |       CASE WHEN max(tr) * max(tc) = 0 THEN NULL
       |            ELSE CAST(sum(tvn) AS BIGINT) * 1000000
       |                 // (2 * max(tr) * max(tc)) END AS tv_ppm,
       |       CASE WHEN max(tr) * max(tc) = 0 THEN NULL
       |            ELSE CAST(sum(cell_micro) AS BIGINT) END AS chi2_micro
       |FROM x""".stripMargin

  /** Inter-arrival burstiness per event type (Goh & Barabási 2008):
    * over consecutive same-type arrival gaps (integer seconds),
    * `B = (σ − μ)/(σ + μ)` — −1 perfectly periodic, 0 Poisson, → 1
    * bursty. THE temporal texture statistic behind rate-limit sizing
    * and anomaly baselining (a Poisson assumption on bursty traffic
    * under-provisions every burst). Gap sums are exact 64-bit
    * integers; mean/σ/B evaluate in ONE fixed double expression
    * (sums cast first — `n·Σd²` would pass 2⁶³ as integers, the
    * [[Stats.corrMatrix]] discipline); NULL when σ + μ = 0 (a single
    * gap or all-zero gaps).
    *
    * Scale shape: one lag window per type over (ts, event_id) —
    * event-grain like the sessionizer, sharded per monitored series
    * in production — then a 5-row aggregate.
    *
    * Output: `(event_type, n_gaps, mean_gap_milli, b_micro)`.
    */
  def burstiness(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("event_type"), col("ts"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("ptus", lag(col("tus"), 1).over(w))
      .filter(col("ptus").isNotNull)
      .select(col("event_type"), expr("(tus - ptus) div 1000000").as("d"))
    gaps
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sd2"))
      .select(
        col("event_type"),
        col("n_gaps"),
        expr("sd * 1000 div n_gaps").as("mean_gap_milli"),
        expr("""CASE WHEN sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
                |               - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                |              / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                |          + CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE) = 0 THEN NULL
                |     ELSE CAST(round(
                |       (sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
                |              - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                |             / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                |        - CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                |       / (sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
                |                - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                |               / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                |          + CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                |       * 1000000) AS BIGINT) END""".stripMargin).as("b_micro"))
  }

  /** [[burstiness]] mirrored. */
  def burstinessSql(): String =
    s"""WITH g AS (
       |  SELECT event_type,
       |         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
       |             ORDER BY ts, event_id)) // 1000000 AS d
       |  FROM events),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       |             CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sd2
       |      FROM g WHERE d IS NOT NULL GROUP BY 1)
       |SELECT event_type, n_gaps, sd * 1000 // n_gaps AS mean_gap_milli,
       |       CASE WHEN sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
       |                       - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
       |                      / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
       |                  + CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE) = 0 THEN NULL
       |            ELSE CAST(round(
       |              (sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
       |                     - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
       |                    / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
       |               - CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE))
       |              / (sqrt((CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
       |                       - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
       |                      / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
       |                 + CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE))
       |              * 1000000) AS BIGINT) END AS b_micro
       |FROM a""".stripMargin

  /** Hour-of-day seasonality profile per event type — the temporal
    * fingerprint behind capacity planning and anomaly baselining (a
    * fence tuned on the daily average false-alarms every rush hour):
    * per (type, hour-of-day) the event count and its exact ppm share
    * of the type's traffic. The hour comes from integer epoch
    * arithmetic (`(µs div 3600·10⁶) mod 24` — UTC by construction,
    * no timezone function on either engine).
    *
    * Scale shape: one narrow map + one ≤ |types|·24-row hash
    * aggregate with map-side partials; totals join back bounded.
    *
    * Output: `(event_type, hour, n, share_ppm)`.
    */
  def seasonality(events: DataFrame): DataFrame = {
    val h = events
      .select(
        col("event_type"),
        // explicit floor-div (see pageHinkley): Spark div truncates,
        // DuckDB // floors — identical post-1970, harmonized for any ts
        expr("((unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000) % 24")
          .as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val tot = h.groupBy(col("event_type").as("tt")).agg(sum(col("n")).as("total"))
    h.join(broadcast(tot), col("event_type") === col("tt"))
      .select(
        col("event_type"),
        col("hour"),
        col("n"),
        expr("n * 1000000 div total").as("share_ppm"))
  }

  /** [[seasonality]] mirrored. */
  def seasonalitySql(): String =
    s"""WITH h AS (
       |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM h GROUP BY 1)
       |SELECT h.event_type, CAST(h.hour AS BIGINT) AS hour, h.n,
       |       h.n * 1000000 // t.total AS share_ppm
       |FROM h JOIN t USING (event_type)""".stripMargin

  /** The composed drift MONITORING REPORT — one row per event type
    * with all four alarms side by side ([[psiDrift]] binned mass,
    * [[ksDrift]] sup-norm CDF gap, [[mwuDrift]] stochastic ordering,
    * [[cusumDrift]] sequential localization): the table an on-call
    * dashboard actually renders, and the drift-side sibling of the
    * composed curation recipe (`pipeline_modern`). Pure composition —
    * each column family keeps its own operator's exact-integer
    * contract; the report is four bounded per-type tables joined on
    * the type key.
    *
    * Output: `(event_type, n_ref, n_cur, psi_micro, ks_ppm,
    * auc_cur_ppm, cusum_max_milli, cusum_crossings)`.
    */
  def driftReport(events: DataFrame): DataFrame =
    psiDrift(events)
      .select(col("event_type"), col("n_ref"), col("n_cur"), col("psi_micro"))
      .join(
        ksDrift(events).select(col("event_type"), col("d_ppm").as("ks_ppm")),
        Seq("event_type"))
      .join(
        mwuDrift(events).select(col("event_type"), col("auc_cur_ppm")),
        Seq("event_type"))
      .join(
        cusumDrift(events).select(
          col("event_type"),
          col("max_s_milli").as("cusum_max_milli"),
          col("n_crossings").as("cusum_crossings")),
        Seq("event_type"))

  /** [[driftReport]] mirrored: the four oracle bodies as subqueries
    * joined on the type key. */
  def driftReportSql(): String =
    s"""SELECT p.event_type, p.n_ref, p.n_cur, p.psi_micro,
       |       k.d_ppm AS ks_ppm, m.auc_cur_ppm,
       |       c.max_s_milli AS cusum_max_milli, c.n_crossings AS cusum_crossings
       |FROM (${psiDriftSql()}) p
       |JOIN (${ksDriftSql()}) k USING (event_type)
       |JOIN (${mwuDriftSql()}) m USING (event_type)
       |JOIN (${cusumDriftSql()}) c USING (event_type)""".stripMargin

  /** One-sided CUSUM decision threshold in value-milli units: the
    * cumulative positive excursion above the reference mean that
    * triggers a changepoint alarm. */
  val CusumH = 2000000L

  /** One-sided CUSUM changepoint monitor (Page 1954) per event type:
    * the reference half sets the in-control target (its integer-milli
    * mean, `sum div n`); the current half is then scanned in event
    * order and the classic recursion `S_i = max(0, S_{i-1} + (x_i −
    * target))` flags a changepoint when S crosses [[CusumH]]. The
    * recursion's max-reset is non-associative, so it is computed by the
    * EXACT equivalent `S_i = P_i − min(0, min_{j≤i} P_j)` — a prefix
    * sum and a running minimum, both plain window cumulatives over
    * integers, bit-identical cross-engine. Where [[psiDrift]]/[[ksDrift]]
    * compare two closed windows, CUSUM is the SEQUENTIAL monitor — it
    * localizes WHEN the shift happened (first_cross_id), which is what
    * an on-call engineer actually asks.
    *
    * Scale shape: one scan, one broadcast of the per-type targets, one
    * ordered window per type. CUSUM is inherently sequential per
    * monitored series; production shards by (type, stream partition)
    * and each shard's window is independent — the per-type window here
    * is that shard. All arithmetic in 64-bit milli units.
    *
    * Output: `(event_type, n_cur, target_milli, max_s_milli,
    * n_crossings, first_cross_id)` (NULL id when never crossed).
    */
  def cusumDrift(events: DataFrame): DataFrame = {
    val w = windowed(events).select(
      col("event_type"),
      col("win"),
      col("ts"),
      col("event_id"),
      expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
    val ref = w
      .filter(col("win") === "ref")
      .groupBy(col("event_type").as("rt"))
      .agg(expr("sum(vm) div count(1)").as("target_milli"))
    val ord = Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = w
      .filter(col("win") === "cur")
      .join(broadcast(ref), col("event_type") === col("rt"))
      .withColumn("p", sum(col("vm") - col("target_milli")).over(ord))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(ord)))
    s.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_cur"),
        max(col("target_milli")).as("target_milli"),
        max(col("s")).as("max_s_milli"),
        sum(when(col("s") > CusumH, 1L).otherwise(0L)).as("n_crossings"),
        min(when(col("s") > CusumH, struct(col("ts"), col("event_id")))).getField("event_id")
          .as("first_cross_id"))
  }

  /** [[cusumDrift]] mirrored. */
  def cusumDriftSql(): String =
    s"""WITH $windowedSql,
       |v AS (SELECT event_type, win, ts, event_id,
       |             CAST(round(value * 1000) AS BIGINT) AS vm FROM w),
       |ref AS (SELECT event_type, CAST(sum(vm) AS BIGINT) // CAST(count(*) AS BIGINT)
       |               AS target_milli
       |        FROM v WHERE win = 'ref' GROUP BY 1),
       |cur AS (SELECT v.event_type, v.ts, v.event_id, v.vm, r.target_milli
       |        FROM v JOIN ref r USING (event_type) WHERE v.win = 'cur'),
       |ps AS (SELECT event_type, ts, event_id, target_milli,
       |              CAST(sum(vm - target_milli) OVER (PARTITION BY event_type
       |                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |       FROM cur),
       |ss AS (SELECT *, CAST(p - least(CAST(0 AS BIGINT),
       |                min(p) OVER (PARTITION BY event_type
       |                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s
       |       FROM ps)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_cur,
       |       CAST(max(target_milli) AS BIGINT) AS target_milli,
       |       CAST(max(s) AS BIGINT) AS max_s_milli,
       |       CAST(sum(CASE WHEN s > $CusumH THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
       |       CAST(min(CASE WHEN s > $CusumH THEN {'ts': ts, 'event_id': event_id} END)
       |            .event_id AS BIGINT) AS first_cross_id
       |FROM ss GROUP BY event_type""".stripMargin

  /** Runtime-window bounds (percent of corpus ts span) for the drift
    * SERVING entries [[cusumQueryStored]]/[[psiQueryStored]]: a window
    * INSIDE the current half but deliberately not equal to it, so the
    * entries demonstrably score an arbitrary caller-supplied window
    * against the stored reference rather than re-running the train-side
    * ref/cur split. Constants (not args) only so the DuckDB oracle can
    * embed the same literals.
    */
  val DriftQueryLoPct = 60
  val DriftQueryHiPct = 90

  /** TRAIN-ONCE side of CUSUM serving: the per-type reference target
    * (mean of the ref half, value-milli integers) published through
    * [[ModelCache]] — built once per corpus snapshot, then every
    * monitoring query scores its own window against it without
    * touching the reference data again. Schema:
    * `(event_type, target_milli, n_ref)`.
    */
  def writeCusumModel(spark: org.apache.spark.sql.SparkSession, events: DataFrame, corpusKey: String): String =
    ModelCache.dir(s"cusum-ref|$corpusKey") {
      windowed(events)
        .filter(col("win") === "ref")
        .select(col("event_type"), expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
        .groupBy(col("event_type"))
        .agg(expr("sum(vm) div count(1)").as("target_milli"), count(lit(1)).as("n_ref"))
    }

  /** EXTERNAL-QUERY CUSUM over the STORED reference — the monitoring
    * family's serving entry point (the drift-side completion of the
    * train-once/serve-many story the index/model families already
    * have): an on-call engineer scores an arbitrary RUNTIME window
    * (`[loPct, hiPct]` percent of corpus span — in production, absolute
    * timestamps) against the published per-type target. The plan is one
    * bounds lookup + one ts-filtered scan + the per-type sequential
    * window over ONLY the queried slice — the reference half is never
    * rescanned, which is the entire point at 100 TB (the ref window is
    * historical data; the query window is a day's arrivals).
    * Same statistic/columns as [[cusumDrift]] over the queried window.
    */
  def cusumQueryStored(
      spark: org.apache.spark.sql.SparkSession,
      events: DataFrame,
      modelDir: String,
      loPct: Int,
      hiPct: Int): DataFrame = {
    val ref = spark.read
      .parquet(modelDir)
      .select(col("event_type").as("rt"), col("target_milli"))
    val bounds = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
    val slice = events
      .join(broadcast(bounds))
      .withColumn("us", unix_micros(col("ts")))
      .filter(
        col("us") > expr(s"lo + (hi - lo) * $loPct div 100") &&
          col("us") <= expr(s"lo + (hi - lo) * $hiPct div 100"))
      .select(
        col("event_type"),
        col("ts"),
        col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
    val ord = Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = slice
      .join(broadcast(ref), col("event_type") === col("rt"))
      .withColumn("p", sum(col("vm") - col("target_milli")).over(ord))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(ord)))
    s.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_win"),
        max(col("target_milli")).as("target_milli"),
        max(col("s")).as("max_s_milli"),
        sum(when(col("s") > CusumH, 1L).otherwise(0L)).as("n_crossings"),
        min(when(col("s") > CusumH, struct(col("ts"), col("event_id")))).getField("event_id")
          .as("first_cross_id"))
  }

  /** [[cusumQueryStored]] mirrored: the reference target retrained
    * inline from the same ref-half definition (the artifact builder is
    * deterministic, so stored ≡ retrained), the runtime window as
    * percent-of-span literals.
    */
  def cusumQueryStoredSql(loPct: Int, hiPct: Int): String =
    s"""WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
       |v AS (SELECT e.event_type, e.ts, e.event_id,
       |             CAST(round(value * 1000) AS BIGINT) AS vm,
       |             epoch_us(ts) AS us, b.lo, b.hi FROM events e CROSS JOIN b),
       |ref AS (SELECT event_type, CAST(sum(vm) AS BIGINT) // CAST(count(*) AS BIGINT)
       |               AS target_milli
       |        FROM v WHERE us <= lo + (hi - lo) // 2 GROUP BY 1),
       |cur AS (SELECT v.event_type, v.ts, v.event_id, v.vm, r.target_milli
       |        FROM v JOIN ref r USING (event_type)
       |        WHERE us > lo + (hi - lo) * $loPct // 100
       |          AND us <= lo + (hi - lo) * $hiPct // 100),
       |ps AS (SELECT event_type, ts, event_id, target_milli,
       |              CAST(sum(vm - target_milli) OVER (PARTITION BY event_type
       |                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |       FROM cur),
       |ss AS (SELECT *, CAST(p - least(CAST(0 AS BIGINT),
       |                min(p) OVER (PARTITION BY event_type
       |                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s
       |       FROM ps)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_win,
       |       CAST(max(target_milli) AS BIGINT) AS target_milli,
       |       CAST(max(s) AS BIGINT) AS max_s_milli,
       |       CAST(sum(CASE WHEN s > $CusumH THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
       |       CAST(min(CASE WHEN s > $CusumH THEN {'ts': ts, 'event_id': event_id} END)
       |            .event_id AS BIGINT) AS first_cross_id
       |FROM ss GROUP BY event_type""".stripMargin

  /** TRAIN-ONCE side of PSI serving: the per-(type, bin) REFERENCE
    * histogram of the ref half published through [[ModelCache]] —
    * the "stored histogram artifact" every runtime drift score probes.
    * Bins with zero reference mass are absent (they materialize as
    * zero rows at query time). Schema: `(event_type, bin, nr)`.
    */
  def writePsiModel(spark: org.apache.spark.sql.SparkSession, events: DataFrame, corpusKey: String): String =
    ModelCache.dir(s"psi-ref|$corpusKey|binw=$PsiBinWidth") {
      windowed(events)
        .filter(col("win") === "ref")
        .select(
          col("event_type"),
          floor(col("value") / lit(PsiBinWidth)).cast("long").as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("nr"))
    }

  /** EXTERNAL-QUERY PSI over the STORED reference histogram: the
    * runtime window's arrivals are binned and merged (union + hash
    * re-aggregate, no outer join) with the artifact's per-bin counts,
    * then scored by the shared [[psiFromCounts]] tail. One ts-filtered
    * scan of ONLY the queried window; the reference corpus is read as
    * |types|·|bins| artifact rows, never rescanned — the serve-many
    * cost model of a production drift dashboard.
    */
  def psiQueryStored(
      spark: org.apache.spark.sql.SparkSession,
      events: DataFrame,
      modelDir: String,
      loPct: Int,
      hiPct: Int): DataFrame = {
    val refBins = spark.read
      .parquet(modelDir)
      .select(col("event_type"), col("bin"), col("nr"), lit(0L).as("nc"))
    val bounds = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
    val curBins = events
      .join(broadcast(bounds))
      .withColumn("us", unix_micros(col("ts")))
      .filter(
        col("us") > expr(s"lo + (hi - lo) * $loPct div 100") &&
          col("us") <= expr(s"lo + (hi - lo) * $hiPct div 100"))
      .select(
        col("event_type"),
        floor(col("value") / lit(PsiBinWidth)).cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("nc"))
      .select(col("event_type"), col("bin"), lit(0L).as("nr"), col("nc"))
    val cnt = refBins
      .unionByName(curBins)
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("nr")).as("nr"), sum(col("nc")).as("nc"))
    psiFromCounts(cnt)
  }

  /** [[psiQueryStored]] mirrored: ref histogram retrained inline from
    * the same ref-half definition, runtime window as literals, same
    * union-of-bins merge and smoothing as the batch PSI.
    */
  def psiQueryStoredSql(loPct: Int, hiPct: Int): String =
    s"""WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
       |v AS (SELECT e.event_type, e.value, epoch_us(ts) AS us, b.lo, b.hi
       |      FROM events e CROSS JOIN b),
       |c AS (
       |  SELECT event_type, bin, CAST(sum(nr) AS BIGINT) AS nr,
       |         CAST(sum(nc) AS BIGINT) AS nc FROM (
       |    SELECT event_type, CAST(floor(value / $PsiBinWidth) AS BIGINT) AS bin,
       |           1 AS nr, 0 AS nc
       |    FROM v WHERE us <= lo + (hi - lo) // 2
       |    UNION ALL
       |    SELECT event_type, CAST(floor(value / $PsiBinWidth) AS BIGINT) AS bin,
       |           0 AS nr, 1 AS nc
       |    FROM v WHERE us > lo + (hi - lo) * $loPct // 100
       |      AND us <= lo + (hi - lo) * $hiPct // 100)
       |  GROUP BY 1, 2),
       |t AS (SELECT event_type AS tt, CAST(sum(nr) AS BIGINT) AS tr,
       |             CAST(sum(nc) AS BIGINT) AS tc, CAST(count(*) AS BIGINT) AS nb
       |      FROM c GROUP BY 1),
       |x AS (
       |  SELECT c.event_type, t.tr, t.tc, t.nb,
       |         CAST(c.nr + 1 AS DOUBLE) / CAST(t.tr + t.nb AS DOUBLE) AS pr,
       |         CAST(c.nc + 1 AS DOUBLE) / CAST(t.tc + t.nb AS DOUBLE) AS pc
       |  FROM c JOIN t ON c.event_type = t.tt)
       |SELECT event_type, max(tr) AS n_ref, max(tc) AS n_cur, max(nb) AS n_bins,
       |       CAST(sum(CAST(round((pc - pr) * ln(pc / pr) * 1000000.0) AS BIGINT)) AS BIGINT)
       |         AS psi_micro
       |FROM x GROUP BY event_type""".stripMargin

  /** Two-sample Kolmogorov–Smirnov drift per event type between the
    * same reference/current halves: `D = max_x |F_ref(x) − F_cur(x)|`,
    * computed ENTIRELY in integers — cumulative counts over the
    * distinct-value histogram, `D_num = max |cr·tc − cc·tr|`,
    * `d_ppm = D_num · 10⁶ div (tr·tc)` — so the statistic is
    * bit-identical cross-engine with no floating ECDF anywhere.
    * The nonparametric companion of [[psiDrift]]: PSI sees binned
    * mass shifts, KS sees any CDF separation at full resolution.
    *
    * Scale shape: the scan compresses to a (type, value) histogram
    * first (hash aggregate, map-side partials); the running sums
    * window over that COMPRESSED table, |distinct values| rows per
    * type, not |events|. At 100 TB the same query runs over the
    * binned histogram ([[quantilesBinned]]'s table) — D then carries
    * the bin-width resolution bound, the standard trade. Counts are
    * ≤ 10⁶-scaled 64-bit products; a corpus past ~3·10⁹ rows per type
    * first scales counts to ppm (the statistic is scale-free).
    *
    * Output: `(event_type, n_ref, n_cur, d_ppm)`.
    */
  def ksDrift(events: DataFrame): DataFrame = {
    val h = windowed(events)
      .groupBy(col("event_type"), col("value").as("v"))
      .agg(
        sum(when(col("win") === "ref", 1L).otherwise(0L)).as("nr"),
        sum(when(col("win") === "cur", 1L).otherwise(0L)).as("nc"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h
      .groupBy(col("event_type").as("tt"))
      .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
    h
      .withColumn("cr", sum(col("nr")).over(w))
      .withColumn("cc", sum(col("nc")).over(w))
      .join(broadcast(tot), col("event_type") === col("tt"))
      .groupBy(col("event_type"))
      .agg(
        max(col("tr")).as("n_ref"),
        max(col("tc")).as("n_cur"),
        max(abs(col("cr") * col("tc") - col("cc") * col("tr"))).as("d_num"))
      .select(
        col("event_type"),
        col("n_ref"),
        col("n_cur"),
        when(col("n_ref") * col("n_cur") === 0L, lit(null).cast("long"))
          .otherwise(expr("d_num * 1000000 div (n_ref * n_cur)"))
          .as("d_ppm"))
  }

  /** [[ksDrift]] mirrored. */
  def ksDriftSql(): String =
    s"""WITH $windowedSql,
       |h AS (
       |  SELECT event_type, value AS v,
       |         CAST(sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
       |         CAST(sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |  FROM w GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, nr, nc,
       |         sum(nr) OVER (PARTITION BY event_type ORDER BY v
       |                       ROWS UNBOUNDED PRECEDING) AS cr,
       |         sum(nc) OVER (PARTITION BY event_type ORDER BY v
       |                       ROWS UNBOUNDED PRECEDING) AS cc
       |  FROM h),
       |t AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc
       |      FROM h GROUP BY 1)
       |SELECT c.event_type, t.tr AS n_ref, t.tc AS n_cur,
       |       CASE WHEN t.tr * t.tc = 0 THEN NULL
       |            ELSE CAST(max(abs(c.cr * t.tc - c.cc * t.tr)) * 1000000 // (t.tr * t.tc)
       |                 AS BIGINT) END AS d_ppm
       |FROM cum c JOIN t USING (event_type)
       |GROUP BY c.event_type, t.tr, t.tc""".stripMargin

  /** The gap-filled hourly count series both time-series diagnostics
    * ([[acf]], [[changepoint]]) run on: epoch-hour buckets from the
    * stream's min to max hour, missing hours as explicit zero counts
    * (an ACF over only-observed buckets silently shortens every lag
    * that crosses a gap). The spine is `sequence(min_h, max_h)` — its
    * length is the TIME RANGE, not the event count, so at 100 TB it is
    * a few-thousand-row table regardless of corpus size; the per-hour
    * aggregate is the only full scan.
    */
  private def hourlySeries(events: DataFrame): DataFrame = {
    val counts = events
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("x"))
    val spine = events
      .agg(
        expr("min(unix_micros(ts) div 3600000000)").as("lo"),
        expr("max(unix_micros(ts) div 3600000000)").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    spine
      .join(counts, Seq("h"), "left_outer")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
  }

  private val hourlySeriesSql: String =
    """b AS (SELECT min(epoch_us(ts) // 3600000000) AS lo,
      |             max(epoch_us(ts) // 3600000000) AS hi FROM events),
      |spine AS (SELECT unnest(range(b.lo, b.hi + 1)) AS h FROM b),
      |cnt AS (SELECT epoch_us(ts) // 3600000000 AS h, CAST(count(*) AS BIGINT) AS x
      |        FROM events GROUP BY 1),
      |ser AS (SELECT spine.h, coalesce(cnt.x, 0) AS x
      |        FROM spine LEFT JOIN cnt ON cnt.h = spine.h)""".stripMargin

  /** Sample autocorrelation of the hourly event-count series at lags
    * 1..`maxLag` — the periodicity diagnostic behind every seasonality
    * model (a daily cycle shows as a ridge at lag 24). The standard
    * estimator r_k = Σ_{t≤T−k}(x_t−x̄)(x_{t+k}−x̄) / Σ_t(x_t−x̄)² is
    * computed on integers by scaling through by T²: with S = Σx and
    * d_t = T·x_t − S, r_k = Σ d_t·d_{t+k} / Σ d_t² — both sums exact
    * int64, so the single final double division is bit-identical
    * across engines (same two integer operands).
    *
    * Scale shape: the lag join runs on the bounded hour spine (lead
    * window over a few thousand rows), never on the event stream.
    *
    * Output: `(lag, n_pairs, acf)` — acf rounded to 6 dp.
    */
  def acf(events: DataFrame, maxLag: Int = 6): DataFrame = {
    val ser = hourlySeries(events)
    val tot = ser.agg(count(lit(1)).as("t"), sum(col("x")).as("s"))
    val d = ser
      .crossJoin(broadcast(tot))
      .select(col("h"), (col("t") * col("x") - col("s")).as("d"))
    val den = d.agg(sum(col("d") * col("d")).as("den"))
    val lags = (1 to maxLag).map { k =>
      d.alias("a")
        .join(d.alias("b"), col("b.h") === col("a.h") + k)
        .agg(count(lit(1)).as("n_pairs"), sum(col("a.d") * col("b.d")).as("num"))
        .select(lit(k.toLong).as("lag"), col("n_pairs"), col("num"))
    }.reduce(_ unionAll _)
    lags
      .crossJoin(broadcast(den))
      .select(
        col("lag"),
        col("n_pairs"),
        when(col("den") === 0L, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") / col("den").cast("double"), 6))
          .as("acf"))
  }

  /** [[acf]] mirrored. */
  def acfSql(maxLag: Int = 6): String =
    s"""WITH $hourlySeriesSql,
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t, CAST(sum(x) AS BIGINT) AS s FROM ser),
       |d AS (SELECT h, tot.t * x - tot.s AS d FROM ser CROSS JOIN tot),
       |den AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM d),
       |lags AS (SELECT unnest(range(1, ${maxLag + 1})) AS lag)
       |SELECT CAST(l.lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CASE WHEN den.den = 0 THEN NULL
       |            ELSE round(CAST(sum(a.d * b.d) AS DOUBLE) / CAST(den.den AS DOUBLE), 6)
       |       END AS acf
       |FROM lags l
       |JOIN d a ON true
       |JOIN d b ON b.h = a.h + l.lag
       |CROSS JOIN den
       |GROUP BY l.lag, den.den""".stripMargin

  /** Retrospective single-changepoint localization on the hourly count
    * series — the offline companion to the online [[cusum]] alarm: the
    * level-shift point is the hour maximizing the scaled deviation of
    * the prefix sum from the global linear trend,
    * |t·S_T − T·S_t| (the CUSUM statistic cleared of its float mean —
    * multiply through by T), an exact int64 per hour. Deterministic
    * tie-break: earliest hour. Also reports the left/right mean levels
    * in micro-events/hour (exact integer division of exact sums) so the
    * magnitude of the shift is read off the same row.
    *
    * Scale shape: one cumulative window over the bounded hour spine;
    * the argmax is an ORDER BY ... LIMIT 1 over the same spine.
    *
    * Output: one row `(t_star, dev, n_hours, left_mean_micro,
    * right_mean_micro)`.
    */
  def changepoint(events: DataFrame): DataFrame = {
    val ser = hourlySeries(events)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rn = org.apache.spark.sql.expressions.Window.orderBy(col("h"))
    val tot = ser.agg(count(lit(1)).as("tt"), sum(col("x")).as("st"))
    ser
      .withColumn("ct", sum(col("x")).over(win))
      .withColumn("t", row_number().over(rn).cast("long"))
      .crossJoin(broadcast(tot))
      .filter(col("t") < col("tt")) // a split needs a non-empty right side
      .select(
        col("h").as("t_star"),
        abs(col("t") * col("st") - col("tt") * col("ct")).as("dev"),
        col("tt").as("n_hours"),
        expr("ct * 1000000 div t").as("left_mean_micro"),
        expr("(st - ct) * 1000000 div (tt - t)").as("right_mean_micro"))
      .orderBy(col("dev").desc, col("t_star"))
      .limit(1)
  }

  /** Session-concurrency profile — the capacity question every ops
    * dashboard answers ("how many sessions were live at once, for how
    * long"): sessions (gap-based, the shared sessionizer's rule) become
    * +1/−1 boundary events, an ordered prefix sum over the boundaries
    * is the live-session count, and each count level is weighted by the
    * time spent at it. Zero-duration segments (ties at one timestamp)
    * are dropped — which also makes the output independent of tie
    * order, since only the last row of each distinct timestamp carries
    * its full delta sum. The boundary table is 2·|sessions| rows, not
    * |events|; the single ordered prefix sum over it is the one
    * sequential term (at 100 TB: range-partition boundaries + two-phase
    * prefix sums — the textbook distributed scan).
    *
    * Output: `(concurrency, micros)` — total stream-time spent at each
    * live-session level.
    */
  def concurrency(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(unix_micros(col("ts"))).as("s"),
        max(unix_micros(col("ts"))).as("e"))
    val bounds = sessions
      .select(col("s").as("t"), lit(1L).as("delta"))
      .unionAll(sessions.select(col("e").as("t"), lit(-1L).as("delta")))
    val ord = Window.orderBy(col("t"), col("delta").desc)
    bounds
      .withColumn(
        "conc",
        sum(col("delta")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_t", lead(col("t"), 1).over(ord))
      .filter(col("next_t").isNotNull && col("next_t") > col("t"))
      .groupBy(col("conc").as("concurrency"))
      .agg(sum(col("next_t") - col("t")).as("micros"))
  }

  /** [[concurrency]] mirrored. */
  def concurrencySql(gapMinutes: Int = 30): String =
    s"""WITH m AS (
       |  SELECT user_id, ts, event_id,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events),
       |sess AS (
       |  SELECT user_id,
       |         sum(CASE WHEN prev_ts IS NULL
       |                    OR CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
       |                       - CAST(epoch_us(prev_ts) AS DOUBLE) / 1000000.0
       |                       > ${gapMinutes * 60.0} THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS session_id,
       |         ts FROM m),
       |iv AS (SELECT user_id, session_id, min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
       |       FROM sess GROUP BY 1, 2),
       |bounds AS (SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM iv
       |           UNION ALL SELECT e, CAST(-1 AS BIGINT) FROM iv),
       |seg AS (
       |  SELECT sum(delta) OVER (ORDER BY t, delta DESC
       |                          ROWS UNBOUNDED PRECEDING) AS conc,
       |         t, lead(t) OVER (ORDER BY t, delta DESC) AS next_t
       |  FROM bounds)
       |SELECT CAST(conc AS BIGINT) AS concurrency,
       |       CAST(sum(next_t - t) AS BIGINT) AS micros
       |FROM seg WHERE next_t IS NOT NULL AND next_t > t
       |GROUP BY conc""".stripMargin

  /** Winsorized robust statistics per event type — the outlier-immune
    * mean every metrics pipeline reports next to the raw one: clip
    * values at the exact 5th/95th ORDER-STATISTIC fences (type-1
    * quantiles over integer milli values — no interpolation, so the
    * fences are exact integers on both engines; the interpolated-exact
    * family is [[quantiles]]) and report the clipped counts and the
    * winsorized mean in micro units. The per-(type, milli) histogram
    * compresses the stream before any window touches it — the
    * [[ksDrift]] shape.
    *
    * Output: `(event_type, n, lo_milli, hi_milli, n_clip_lo,
    * n_clip_hi, wins_mean_micro)`.
    */
  def winsorized(events: DataFrame): DataFrame = {
    val h = events
      .select(col("event_type"), expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
      .groupBy(col("event_type"), col("vm"))
      .agg(count(lit(1)).as("c"))
    val wc = Window
      .partitionBy(col("event_type"))
      .orderBy(col("vm"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = h
      .withColumn("cumc", sum(col("c")).over(wc))
      .join(
        h.groupBy(col("event_type")).agg(sum(col("c")).as("n")),
        Seq("event_type"))
    val fences = cum
      .groupBy(col("event_type"))
      .agg(
        first(col("n")).as("n"),
        min(when(col("cumc") * 20L >= col("n"), col("vm"))).as("lo"),
        min(when(col("cumc") * 20L >= col("n") * 19L, col("vm"))).as("hi"))
    cum
      .join(fences.select(col("event_type"), col("lo"), col("hi")), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c")).as("n"),
        first(col("lo")).as("lo_milli"),
        first(col("hi")).as("hi_milli"),
        sum(when(col("vm") < col("lo"), col("c")).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("vm") > col("hi"), col("c")).otherwise(0L)).as("n_clip_hi"),
        expr("sum(greatest(least(vm, hi), lo) * c) * 1000 div sum(c)").as("wins_mean_micro"))
  }

  /** [[winsorized]] mirrored. */
  def winsorizedSql(): String =
    s"""WITH h AS (
       |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS vm,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, vm, c,
       |         sum(c) OVER (PARTITION BY event_type ORDER BY vm
       |                      ROWS UNBOUNDED PRECEDING) AS cumc,
       |         sum(c) OVER (PARTITION BY event_type) AS n
       |  FROM h),
       |fences AS (
       |  SELECT event_type,
       |         min(CASE WHEN cumc * 20 >= n THEN vm END) AS lo,
       |         min(CASE WHEN cumc * 20 >= n * 19 THEN vm END) AS hi
       |  FROM cum GROUP BY 1)
       |SELECT c.event_type, CAST(sum(c.c) AS BIGINT) AS n,
       |       f.lo AS lo_milli, f.hi AS hi_milli,
       |       CAST(coalesce(sum(c.c) FILTER (c.vm < f.lo), 0) AS BIGINT) AS n_clip_lo,
       |       CAST(coalesce(sum(c.c) FILTER (c.vm > f.hi), 0) AS BIGINT) AS n_clip_hi,
       |       CAST(sum(greatest(least(c.vm, f.hi), f.lo) * c.c) * 1000 // sum(c.c)
       |            AS BIGINT) AS wins_mean_micro
       |FROM cum c JOIN fences f USING (event_type)
       |GROUP BY c.event_type, f.lo, f.hi""".stripMargin

  /** Next-event predictor evaluation — the train/serve split for the
    * [[markovTransitions]] model: transition counts from the REFERENCE
    * half of the stream (the shared midpoint split) build an argmax
    * predictor (ties to the lexicographically smallest next type), and
    * it is scored on the consecutive pairs that lie wholly in the
    * CURRENT half. Per previous-type accuracy in exact ppm — the
    * honest per-state readout (a global number hides that rare states
    * predict at chance). Unseen states get NULL accuracy, not a
    * silent drop.
    *
    * Output: `(prev_type, predicted, n_pairs, n_correct, acc_ppm)`.
    */
  def markovEval(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = windowed(events)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("win"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_win", lag(col("win"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val trained = pairs
      .filter(col("win") === "ref") // pair is train iff its LATER event is in ref
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy(col("prev_type")).orderBy(col("n").desc, col("next_type"))
    val model = trained
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("prev_type"), col("next_type").as("predicted"))
    pairs
      .filter(col("prev_win") === "cur" && col("win") === "cur")
      .join(broadcast(model), Seq("prev_type"), "left_outer")
      .groupBy(col("prev_type"), col("predicted"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("event_type") === col("predicted"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn(
        "acc_ppm",
        when(col("predicted").isNull, lit(null).cast("long"))
          .otherwise(expr("n_correct * 1000000 div n_pairs")))
  }

  /** [[markovEval]] mirrored. */
  def markovEvalSql(): String =
    s"""WITH $windowedSql,
       |p AS (
       |  SELECT user_id, event_type, win,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |           AS prev_type,
       |         lag(win) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_win
       |  FROM w),
       |trained AS (
       |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
       |  FROM p WHERE prev_type IS NOT NULL AND win = 'ref' GROUP BY 1, 2),
       |model AS (
       |  SELECT prev_type, next_type AS predicted FROM (
       |    SELECT *, row_number() OVER (PARTITION BY prev_type
       |                                 ORDER BY n DESC, next_type) AS rn
       |    FROM trained) WHERE rn = 1)
       |SELECT p.prev_type, m.predicted, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(CASE WHEN p.event_type = m.predicted THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_correct,
       |       CASE WHEN m.predicted IS NULL THEN NULL
       |            ELSE CAST(sum(CASE WHEN p.event_type = m.predicted THEN 1 ELSE 0 END)
       |                 * 1000000 // count(*) AS BIGINT) END AS acc_ppm
       |FROM p LEFT JOIN model m ON m.prev_type = p.prev_type
       |WHERE p.prev_type IS NOT NULL AND p.prev_win = 'cur' AND p.win = 'cur'
       |GROUP BY p.prev_type, m.predicted""".stripMargin

  /** Conversion attribution — first-touch vs last-touch credit for
    * every purchase event: within each user's timeline, the purchase's
    * last-touch is the latest preceding non-purchase event and its
    * first-touch the earliest one, both picked by lexicographic
    * max/min over `(ts, event_id, type)` structs inside an ordered
    * window — no per-purchase join, no pair blowup; purchases with no
    * preceding touch report as 'none' (direct conversions), never a
    * silent drop. The credit table every marketing/growth dashboard
    * starts from, in exact counts.
    *
    * Output: `(model, event_type, n_conversions)` with model ∈
    * {first_touch, last_touch}.
    */
  def attribution(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(
      col("event_type") =!= "purchase",
      struct(col("ts"), col("event_id"), col("event_type")))
    val conv = events
      .withColumn("lt", max(touch).over(w))
      .withColumn("ft", min(touch).over(w))
      .filter(col("event_type") === "purchase")
    def rollup(c: Column, model: String): DataFrame =
      conv
        .groupBy(coalesce(c.getField("event_type"), lit("none")).as("event_type"))
        .agg(count(lit(1)).as("n_conversions"))
        .select(lit(model).as("model"), col("event_type"), col("n_conversions"))
    rollup(col("ft"), "first_touch").unionAll(rollup(col("lt"), "last_touch"))
  }

  /** [[attribution]] mirrored. */
  def attributionSql(): String =
    s"""WITH t AS (
       |  SELECT event_type,
       |         max(CASE WHEN event_type <> 'purchase'
       |                  THEN (ts, event_id, event_type) END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
       |         min(CASE WHEN event_type <> 'purchase'
       |                  THEN (ts, event_id, event_type) END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft
       |  FROM events),
       |conv AS (SELECT lt, ft FROM t WHERE event_type = 'purchase')
       |SELECT 'first_touch' AS model, coalesce(ft[3], 'none') AS event_type,
       |       CAST(count(*) AS BIGINT) AS n_conversions
       |FROM conv GROUP BY 2
       |UNION ALL
       |SELECT 'last_touch', coalesce(lt[3], 'none'), CAST(count(*) AS BIGINT)
       |FROM conv GROUP BY 2""".stripMargin

  /** Two-proportion A/B test — the experiment readout run on every
    * product launch: users split into arms by `user_id % 2`, a user
    * converts if they have ≥ 1 purchase event, and the arms' rates are
    * compared with the pooled two-proportion z statistic. The whole
    * statistic reduces to one exact integer identity,
    *
    *   z² = (c₁n₂ − c₂n₁)² · N / (n₁·n₂·C·(N−C)),
    *
    * computed from five int64 counts — the final division is the only
    * float op, on identical integer operands in both engines, so the
    * micro-rounded z² is bit-stable. (A z² above ~3.84 rejects equal
    * rates at 95% — the classic χ²₁ threshold.)
    *
    * One per-user aggregate then a 2-row rollup — map-side partial all
    * the way down.
    *
    * Output: one row `(n_ctrl, conv_ctrl, n_treat, conv_treat,
    * rate_ctrl_ppm, rate_treat_ppm, z2_micro)`.
    */
  def abTest(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("conv"))
    perUser
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("conv_ctrl"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("conv_treat"))
      .select(
        col("n_ctrl"),
        col("conv_ctrl"),
        col("n_treat"),
        col("conv_treat"),
        expr("conv_ctrl * 1000000 div n_ctrl").as("rate_ctrl_ppm"),
        expr("conv_treat * 1000000 div n_treat").as("rate_treat_ppm"),
        expr(
          """CASE WHEN (conv_ctrl + conv_treat) = 0
            |       OR (conv_ctrl + conv_treat) = (n_ctrl + n_treat) THEN NULL
            |     ELSE CAST(round(
            |       1000000.0d
            |       * CAST((conv_ctrl * n_treat - conv_treat * n_ctrl)
            |              * (conv_ctrl * n_treat - conv_treat * n_ctrl) AS DOUBLE)
            |       * CAST(n_ctrl + n_treat AS DOUBLE)
            |       / (CAST(n_ctrl AS DOUBLE) * CAST(n_treat AS DOUBLE)
            |          * CAST(conv_ctrl + conv_treat AS DOUBLE)
            |          * CAST(n_ctrl + n_treat - conv_ctrl - conv_treat AS DOUBLE)))
            |       AS BIGINT) END""".stripMargin).as("z2_micro"))
  }

  /** Experiment design from observed rates — the sample-size question
    * that follows every underpowered A/B readout: with the two arms'
    * observed conversion rates as the planning assumption, the normal-
    * approximation sample size per arm to detect that gap at two-sided
    * α = 0.05 with power 0.8 is
    *
    *   n = ⌈(z_α·√(2·p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₁−p₂)²⌉.
    *
    * The z constants are fixed literals; every other operand derives
    * from the five exact counts by the SAME float-op sequence in both
    * engines (sqrt/division are correctly-rounded IEEE), so even this
    * all-double formula is bit-stable. NULL when the observed gap is 0.
    *
    * Output: one row `(rate_ctrl_ppm, rate_treat_ppm, n_per_arm)`.
    */
  def abPower(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("conv"))
    perUser
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("c1"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("c2"))
      .select(
        expr("c1 * 1000000 div n1").as("rate_ctrl_ppm"),
        expr("c2 * 1000000 div n2").as("rate_treat_ppm"),
        expr(s"""CASE WHEN c1 * n2 = c2 * n1 THEN NULL ELSE CAST(ceil(
          |  (($ZAlpha * sqrt(CAST(2 AS DOUBLE) * ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
          |      * (CAST(1 AS DOUBLE) - (CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
          |    + $ZBeta * sqrt(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          |      + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
          |   * ($ZAlpha * sqrt(CAST(2 AS DOUBLE) * ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
          |      * (CAST(1 AS DOUBLE) - (CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
          |    + $ZBeta * sqrt(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          |      + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))))
          |  / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          |     * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
          |) AS BIGINT) END""".stripMargin).as("n_per_arm"))
  }

  /** z constants for [[abPower]] (two-sided α 0.05; power 0.8). */
  val ZAlpha = "1.959963985"
  val ZBeta = "0.841621234"

  /** [[abPower]] mirrored: the identical expression text with DuckDB's
    * integer-division spelling.
    */
  def abPowerSql(): String = {
    val body = s"""(($ZAlpha * sqrt(CAST(2 AS DOUBLE) * ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
      |      * (CAST(1 AS DOUBLE) - (CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
      |    + $ZBeta * sqrt(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |      + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
      |   * ($ZAlpha * sqrt(CAST(2 AS DOUBLE) * ((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
      |      * (CAST(1 AS DOUBLE) - (CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
      |    + $ZBeta * sqrt(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |      + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))))
      |  / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
      |     * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))""".stripMargin
    s"""WITH pu AS (
       |  SELECT ((user_id % 2) + 2) % 2 AS arm,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
       |  FROM pu)
       |SELECT c1 * 1000000 // n1 AS rate_ctrl_ppm,
       |       c2 * 1000000 // n2 AS rate_treat_ppm,
       |       CASE WHEN c1 * n2 = c2 * n1 THEN NULL ELSE CAST(ceil(
       |$body
       |) AS BIGINT) END AS n_per_arm
       |FROM a""".stripMargin
  }

  /** [[abTest]] mirrored. */
  def abTestSql(): String =
    s"""WITH pu AS (
       |  SELECT ((user_id % 2) + 2) % 2 AS arm,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
       |         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_ctrl,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
       |         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_treat
       |  FROM pu)
       |SELECT n_ctrl, conv_ctrl, n_treat, conv_treat,
       |       conv_ctrl * 1000000 // n_ctrl AS rate_ctrl_ppm,
       |       conv_treat * 1000000 // n_treat AS rate_treat_ppm,
       |       CASE WHEN (conv_ctrl + conv_treat) = 0
       |              OR (conv_ctrl + conv_treat) = (n_ctrl + n_treat) THEN NULL
       |            ELSE CAST(round(
       |              CAST(1000000.0 AS DOUBLE)
       |              * CAST((conv_ctrl * n_treat - conv_treat * n_ctrl)
       |                     * (conv_ctrl * n_treat - conv_treat * n_ctrl) AS DOUBLE)
       |              * CAST(n_ctrl + n_treat AS DOUBLE)
       |              / (CAST(n_ctrl AS DOUBLE) * CAST(n_treat AS DOUBLE)
       |                 * CAST(conv_ctrl + conv_treat AS DOUBLE)
       |                 * CAST(n_ctrl + n_treat - conv_ctrl - conv_treat AS DOUBLE)))
       |              AS BIGINT) END AS z2_micro
       |FROM a""".stripMargin

  /** Seasonal-naive forecast evaluation — the baseline every real
    * forecasting model must beat before it ships: predict each hour of
    * the LAST full day as the same hour of the previous day, score
    * against actuals with MAE and sMAPE-style ppm error. Runs on the
    * gap-filled hourly spine ([[hourlySeries]]), so missing hours
    * forecast and score as zeros instead of silently shortening the
    * horizon. All errors are exact integers (|ŷ−y| sums); the single
    * readout row divides once.
    *
    * Output: one row `(n_hours, mae_milli, total_actual, total_pred,
    * smape_ppm)` — sMAPE denominator Σ(|y|+|ŷ|), NULL when that is 0.
    */
  def snaiveEval(events: DataFrame): DataFrame = {
    val ser = hourlySeries(events)
    val hi = ser.agg(max(col("h")).as("hmax"))
    val scored = ser
      .crossJoin(broadcast(hi))
      .filter(col("h") > col("hmax") - 24L) // the last day = eval window
      .select(col("h"), col("x").as("y"))
      .join(
        ser.select((col("h") + 24L).as("h"), col("x").as("yhat")),
        Seq("h"),
        "left_outer")
      .withColumn("yhat", coalesce(col("yhat"), lit(0L)))
    scored.agg(
      count(lit(1)).as("n_hours"),
      expr("sum(abs(yhat - y)) * 1000 div count(*)").as("mae_milli"),
      sum(col("y")).as("total_actual"),
      sum(col("yhat")).as("total_pred"),
      when(expr("sum(abs(y) + abs(yhat))") === 0L, lit(null).cast("long"))
        .otherwise(expr("2 * sum(abs(yhat - y)) * 1000000 div sum(abs(y) + abs(yhat))"))
        .as("smape_ppm"))
  }

  /** [[snaiveEval]] mirrored. */
  def snaiveEvalSql(): String =
    s"""WITH $hourlySeriesSql,
       |hi AS (SELECT max(h) AS hmax FROM ser),
       |scored AS (
       |  SELECT a.h, a.x AS y, coalesce(p.x, 0) AS yhat
       |  FROM ser a CROSS JOIN hi
       |  LEFT JOIN ser p ON p.h + 24 = a.h
       |  WHERE a.h > hi.hmax - 24)
       |SELECT CAST(count(*) AS BIGINT) AS n_hours,
       |       CAST(sum(abs(yhat - y)) * 1000 // count(*) AS BIGINT) AS mae_milli,
       |       CAST(sum(y) AS BIGINT) AS total_actual,
       |       CAST(sum(yhat) AS BIGINT) AS total_pred,
       |       CASE WHEN sum(abs(y) + abs(yhat)) = 0 THEN NULL
       |            ELSE CAST(2 * sum(abs(yhat - y)) * 1000000
       |                      // sum(abs(y) + abs(yhat)) AS BIGINT) END AS smape_ppm
       |FROM scored""".stripMargin

  /** Session-gap tuning sweep — the choose-the-gap pre-flight for
    * [[sessionize]] (the analogue of the k-means elbow for the session
    * boundary): the same sessionizer run at each candidate inactivity
    * gap, read out as session count, user coverage, exact
    * events-per-session (milli), and the singleton-session count (the
    * quantity that collapses as the gap grows — a gap past the knee
    * only merges real sessions). One row per candidate gap.
    *
    * Scale shape: |gaps| runs of the per-user windowed sessionizer
    * (each bounded by per-user event counts) + a global 1-row
    * aggregate each; gaps is a small constant.
    */
  def sessionGapSweep(
      events: DataFrame,
      gapsMinutes: Seq[Int] = Seq(15, 30, 60, 120)): DataFrame =
    gapsMinutes
      .map { g =>
        sessionize(events, g)
          .agg(
            count(lit(1)).as("n_sessions"),
            count_distinct(col("user_id")).as("n_users"),
            sum(col("n_events")).as("n_events"),
            sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_singletons"))
          .select(
            lit(g.toLong).as("gap_minutes"),
            col("n_sessions"),
            col("n_users"),
            col("n_events"),
            expr("n_events * 1000 div n_sessions").as("events_per_session_milli"),
            col("n_singletons"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("gap_minutes"))

  /** [[sessionGapSweep]] mirrored: one scoped session chain per gap
    * (each arm's WITH lives inside its own subquery parentheses).
    */
  def sessionGapSweepSql(gapsMinutes: Seq[Int] = Seq(15, 30, 60, 120)): String = {
    val arms = gapsMinutes
      .map { g =>
        s"""SELECT CAST($g AS BIGINT) AS gap_minutes,
           |       CAST(count(*) AS BIGINT) AS n_sessions,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           |       CAST(sum(n_events) AS BIGINT) AS n_events,
           |       CAST(sum(n_events) AS BIGINT) * 1000
           |         // CAST(count(*) AS BIGINT) AS events_per_session_milli,
           |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons
           |FROM (
           |  WITH m AS (
           |    SELECT user_id, event_id, ts,
           |           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           |    FROM events),
           |  s AS (
           |    SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > ${g * 60}.0
           |                   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_new
           |    FROM m),
           |  n AS (
           |    SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           |    FROM s)
           |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
           |  FROM n GROUP BY 1, 2)""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$arms\n) ORDER BY gap_minutes"
  }

  /** Holt linear-trend forecast evaluation — the second baseline next
    * to [[snaiveEval]]: double-exponential smoothing with α = β = ½
    * folded over the gap-filled hourly training series (everything
    * before the last day), then the last 24 hours scored against the
    * linear forecast ŷ_j = level + j·trend. Halving (×0.5) is EXACT in
    * binary floating point and the fold order is pinned (one
    * sequential list fold, identical op order in both engines), so
    * level/trend are bit-identical cross-engine — the same discipline
    * as [[graft.operators.LinAlg]]'s power iteration, no rounding grid
    * inside the recursion.
    *
    * Scale shape: the series is the bounded hourly spine (an
    * aggregate of the corpus, thousands of rows at most per window),
    * collected into ONE array fold — the corpus itself is touched only
    * by the hourly count aggregate. Same readout contract as
    * snaive: exact integer milli/ppm errors, NULL sMAPE on an
    * all-zero window.
    *
    * Output: one row `(n_train, n_eval, level_milli, trend_milli,
    * mae_milli, smape_ppm)`.
    */
  def holtEval(events: DataFrame): DataFrame = {
    val ser = hourlySeries(events)
    val hi = ser.agg(max(col("h")).as("hmax"))
    val withHi = ser.crossJoin(broadcast(hi))
    val state = withHi
      .filter(col("h") <= col("hmax") - 24L)
      .agg(
        transform(array_sort(collect_list(struct(col("h"), col("x")))), s =>
          s("x").cast("double")).as("xs"),
        count(lit(1)).as("n_train"))
      .select(
        col("n_train"),
        expr(
          """aggregate(xs,
            |  named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE), 'i', 0),
            |  (acc, x) -> IF(acc.i = 0,
            |    named_struct('l', x, 'b', CAST(0.0 AS DOUBLE), 'i', 1),
            |    named_struct(
            |      'l', 0.5D * (x + acc.l + acc.b),
            |      'b', 0.5D * (0.5D * (x + acc.l + acc.b) - acc.l + acc.b),
            |      'i', 1)))""".stripMargin).as("st"))
      .select(col("n_train"), col("st.l").as("l"), col("st.b").as("b"))
    withHi
      .filter(col("h") > col("hmax") - 24L)
      .select((col("h") - (col("hmax") - lit(24L))).as("j"), col("x").as("y"))
      .crossJoin(broadcast(state))
      .select(
        col("n_train"),
        col("l"),
        col("b"),
        (col("y") * 1000L).as("y_milli"),
        expr("CAST(round((l + CAST(j AS DOUBLE) * b) * 1000) AS BIGINT)").as("yhat_milli"))
      .agg(
        max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_eval"),
        expr("CAST(round(max(l) * 1000) AS BIGINT)").as("level_milli"),
        expr("CAST(round(max(b) * 1000) AS BIGINT)").as("trend_milli"),
        expr("sum(abs(yhat_milli - y_milli)) div count(*)").as("mae_milli"),
        when(expr("sum(abs(y_milli) + abs(yhat_milli))") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "2 * sum(abs(yhat_milli - y_milli)) * 1000000 div sum(abs(y_milli) + abs(yhat_milli))"))
          .as("smape_ppm"))
  }

  /** [[holtEval]] mirrored: the same pinned-order halving fold.
    * DuckDB's pairwise list_reduce seeds acc with the first element —
    * exactly the engine's i = 0 first-step state — and the (l, b)
    * state rides a 2-long LIST, not a struct: struct-typed lambda
    * accumulators miscompute under DuckDB 1.0.0's subexpression
    * handling (observed: the b field read stale values mid-fold).
    */
  def holtEvalSql(): String =
    s"""WITH $hourlySeriesSql,
       |hi AS (SELECT max(h) AS hmax FROM ser),
       |tr AS (SELECT list(CAST(x AS DOUBLE) ORDER BY h) AS xs,
       |              CAST(count(*) AS BIGINT) AS n_train
       |       FROM ser CROSS JOIN hi WHERE h <= hi.hmax - 24),
       |st AS (SELECT n_train,
       |         list_reduce(
       |           list_transform(xs, x -> [x, CAST(0.0 AS DOUBLE)]),
       |           (acc, e) -> [
       |             CAST(0.5 AS DOUBLE) * (e[1] + acc[1] + acc[2]),
       |             CAST(0.5 AS DOUBLE) * (CAST(0.5 AS DOUBLE) * (e[1] + acc[1] + acc[2])
       |                                    - acc[1] + acc[2])]) AS s
       |       FROM tr),
       |scored AS (
       |  SELECT st.n_train, a.x * 1000 AS y_milli,
       |         CAST(round((st.s[1] + CAST(a.h - (hi.hmax - 24) AS DOUBLE) * st.s[2]) * 1000)
       |              AS BIGINT) AS yhat_milli,
       |         st.s[1] AS l, st.s[2] AS b
       |  FROM ser a CROSS JOIN hi CROSS JOIN st
       |  WHERE a.h > hi.hmax - 24)
       |SELECT CAST(max(n_train) AS BIGINT) AS n_train,
       |       CAST(count(*) AS BIGINT) AS n_eval,
       |       CAST(round(max(l) * 1000) AS BIGINT) AS level_milli,
       |       CAST(round(max(b) * 1000) AS BIGINT) AS trend_milli,
       |       CAST(sum(abs(yhat_milli - y_milli)) // count(*) AS BIGINT) AS mae_milli,
       |       CASE WHEN sum(abs(y_milli) + abs(yhat_milli)) = 0 THEN NULL
       |            ELSE CAST(2 * sum(abs(yhat_milli - y_milli)) * 1000000
       |                      // sum(abs(y_milli) + abs(yhat_milli)) AS BIGINT)
       |       END AS smape_ppm
       |FROM scored""".stripMargin

  /** [[changepoint]] mirrored. */
  def changepointSql(): String =
    s"""WITH $hourlySeriesSql,
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS tt, CAST(sum(x) AS BIGINT) AS st FROM ser),
       |cum AS (
       |  SELECT h, sum(x) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS ct,
       |         CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS t
       |  FROM ser)
       |SELECT h AS t_star, CAST(abs(t * tot.st - tot.tt * ct) AS BIGINT) AS dev,
       |       tot.tt AS n_hours,
       |       CAST(ct * 1000000 // t AS BIGINT) AS left_mean_micro,
       |       CAST((tot.st - ct) * 1000000 // (tot.tt - t) AS BIGINT) AS right_mean_micro
       |FROM cum CROSS JOIN tot
       |WHERE t < tot.tt
       |ORDER BY dev DESC, t_star LIMIT 1""".stripMargin

  // ---- CDC snapshot diff -----------------------------------------------------

  /** Change-data-capture diff between two snapshots of the keyed state
    * derived from the append-only event log: state at time `t` = the
    * latest `value` per `(user_id, event_type)` among events with
    * `ts <= t` (ties broken by `event_id` — total order, so both engines
    * pick the same row). Every key in the later snapshot is classified:
    *
    *  - `insert` — the key did not exist at `t1`;
    *  - `update` — it existed and its latest value changed;
    *  - `unchanged` — no state transition between the snapshots.
    *
    * (An append log has no deletes; a tombstone event type would add the
    * fourth class with the same plan.) This is the CDC merge audit a
    * warehouse user runs before applying a delta — how much of the
    * target actually churns.
    *
    * Scale shape: both snapshot states are per-key window dedups
    * partitioned by the SAME key, so the outer join that compares them
    * is co-partitioned — one exchange feeds all three operators, and the
    * readout is a 3-row aggregate. At 100 TB the two snapshots come from
    * partition-pruned time-range scans of the same log.
    */
  def cdcDiff(
      events: DataFrame,
      t1: String = "2024-01-03 00:00:00",
      t2: String = "2024-01-06 00:00:00"): DataFrame = {
    def stateAt(t: String): DataFrame = {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events
        .filter(col("ts") <= lit(t).cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("value"))
    }
    val s1 = stateAt(t1).alias("s1")
    val s2 = stateAt(t2).alias("s2")
    s2.join(
        s1,
        col("s1.user_id") === col("s2.user_id") &&
          col("s1.event_type") === col("s2.event_type"),
        "left")
      .select(
        col("s2.user_id").as("user_id"),
        when(col("s1.user_id").isNull, "insert")
          .when(col("s1.value") =!= col("s2.value"), "update")
          .otherwise("unchanged")
          .as("op"))
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n_keys"), sum(col("user_id")).as("checksum"))
  }

  /** [[cdcDiff]] mirrored: same key, same tiebreak, same classification. */
  def cdcDiffSql(
      t1: String = "2024-01-03 00:00:00",
      t2: String = "2024-01-06 00:00:00"): String =
    s"""WITH e1 AS (
       |  SELECT user_id, event_type, value,
       |         row_number() OVER (PARTITION BY user_id, event_type
       |                            ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events WHERE ts <= TIMESTAMP '$t1'),
       |s1 AS (SELECT user_id, event_type, value FROM e1 WHERE rn = 1),
       |e2 AS (
       |  SELECT user_id, event_type, value,
       |         row_number() OVER (PARTITION BY user_id, event_type
       |                            ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events WHERE ts <= TIMESTAMP '$t2'),
       |s2 AS (SELECT user_id, event_type, value FROM e2 WHERE rn = 1),
       |j AS (
       |  SELECT s2.user_id,
       |         CASE WHEN s1.user_id IS NULL THEN 'insert'
       |              WHEN s1.value <> s2.value THEN 'update'
       |              ELSE 'unchanged' END AS op
       |  FROM s2 LEFT JOIN s1
       |    ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type)
       |SELECT op, CAST(count(*) AS BIGINT) AS n_keys,
       |       CAST(sum(user_id) AS BIGINT) AS checksum
       |FROM j GROUP BY op""".stripMargin

  // ---- session path mining -------------------------------------------------

  /** Top event-type PATHS — the product-analytics path-mining read
    * (which 3-step journeys dominate?): sessions cut by the same
    * silence-gap rule as [[sessionize]], events ordered (ts, event_id),
    * every in-session length-3 window concatenated `a>b>c`, global
    * top-`k` by count. The synthetic stream is sparse (~1 event/user/
    * day), so the default gap is day-scale — at a real clickstream's
    * density the same operator runs with the 30-minute gap.
    *
    * Scale shape: two per-user/per-session windows (no global sort),
    * one path-keyed hash aggregate (domain ≤ |types|³), a TakeOrdered
    * top-k. Nothing grows faster than the event count.
    *
    * Output: top `k` rows `(path, n)` by (n desc, path asc).
    */
  def eventPaths(events: DataFrame, gapMinutes: Int = 1440, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
    val bySess =
      Window.partitionBy(col("user_id"), col("session_id")).orderBy(col("ts"), col("event_id"))
    marked
      .withColumn("t2", lead(col("event_type"), 1).over(bySess))
      .withColumn("t3", lead(col("event_type"), 2).over(bySess))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** [[eventPaths]] mirrored: identical gap rule, window order, and
    * top-k tiebreak. */
  def eventPathsSql(gapMinutes: Int = 1440, k: Int = 20): String =
    s"""WITH m AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events),
       |s AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > ${gapMinutes * 60}.0
       |                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_new
       |  FROM m),
       |n AS (
       |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM s),
       |p AS (
       |  SELECT event_type || '>' || lead(event_type, 1) OVER w || '>' ||
       |         lead(event_type, 2) OVER w AS path,
       |         lead(event_type, 2) OVER w AS t3
       |  FROM n WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
       |SELECT path, CAST(count(*) AS BIGINT) AS n FROM p WHERE t3 IS NOT NULL
       |GROUP BY path ORDER BY n DESC, path LIMIT $k""".stripMargin

  // ---- heavy-tail index (Hill estimator) -------------------------------------

  /** Hill-plot k values (largest first bounds the TakeOrdered). */
  val HillKs: Seq[Int] = Seq(50, 100, 200)

  /** Hill tail-index estimator of the event-value distribution at each
    * k in [[HillKs]] — the heavy-tail read an operator runs on a
    * latency/size/amount column before trusting any mean-based alarm:
    * α̂(k) = (k−1) / Σ_{i<k} ln(x₍ᵢ₎/x₍ₖ₎) over the top-k order
    * statistics, and the three-k "Hill plot" row set is the stability
    * diagnostic itself (a real Pareto tail shows a flat stretch; a
    * thin-tailed column shows α̂ drifting up with k). Complements
    * `graph_powerlaw_fit` (discrete degree law) on the continuous side.
    *
    * Determinism: the top-max(k) set is a bounded TakeOrdered (value
    * DESC, event_id); each ln ratio rounds to integer nano-units BEFORE
    * the sum (the KL/PSI discipline) so the aggregate is order-free;
    * α̂ is integer arithmetic on the rounded sum.
    *
    * Scale shape: one corpus TakeOrdered to max(k)=200 rows (map-side
    * partial top-k), then bounded-table arithmetic only.
    *
    * Output: one row per k `(k, x_k, alpha_milli)`.
    */
  def hillTail(events: DataFrame): DataFrame = {
    val kMax = HillKs.max
    // ln(x/x_k) is only defined on a positive tail; a non-positive value
    // reaching the top-k would NaN the Spark sum and error DuckDB's ln
    val top = events
      .select(col("value"), col("event_id"))
      .filter(col("value") > 0.0d)
      .orderBy(col("value").desc, col("event_id"))
      .limit(kMax)
    // bounded 200-row frame from here on
    val ranked = Phys.materialized(
      top.withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("value").desc, col("event_id")))))
    HillKs
      .map { k =>
        val xk = ranked.filter(col("rn") === k).select(col("value").as("xk"))
        ranked
          .filter(col("rn") < k)
          .crossJoin(broadcast(xk))
          .agg(
            sum(expr("CAST(round(ln(value / xk) * 1000000000) AS BIGINT)")).as("s_nano"),
            max(col("xk")).as("x_k"))
          .select(
            lit(k.toLong).as("k"),
            col("x_k"),
            // s_nano = 0 (all top-k values equal): α̂ undefined — NULL in
            // BOTH engines (Spark div would NULL, DuckDB // would error)
            expr(s"(${k - 1} * 1000000000000) div nullif(s_nano, 0)").as("alpha_milli"))
      }
      .reduce(_ unionAll _)
  }

  /** [[hillTail]] mirrored. */
  def hillTailSql(): String = {
    val kMax = HillKs.max
    val rows = HillKs
      .map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           |       (SELECT value FROM ranked WHERE rn = $k) AS x_k,
           |       (${k - 1} * 1000000000000) // nullif((
           |         SELECT CAST(sum(CAST(round(ln(r.value / xk.value) * 1000000000) AS BIGINT)) AS BIGINT)
           |         FROM ranked r, (SELECT value FROM ranked WHERE rn = $k) xk
           |         WHERE r.rn < $k), 0) AS alpha_milli""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH top AS (
       |  SELECT value, event_id FROM events WHERE value > 0
       |  ORDER BY value DESC, event_id LIMIT $kMax),
       |ranked AS (
       |  SELECT value, row_number() OVER (ORDER BY value DESC, event_id) AS rn FROM top)
       |$rows""".stripMargin
  }

  // ---- event-time lateness audit -------------------------------------------

  /** Out-of-orderness audit: for each event, lateness = (running max of
    * event time over ARRIVAL order) − its own event time. This is THE
    * design statistic for a streaming watermark: `withWatermark(delay)`
    * drops exactly the rows whose lateness exceeds `delay`, so the
    * lateness histogram tells an operator what each candidate delay
    * would discard BEFORE deploying it (the
    * [[graft.streaming.StreamOps]] gates all take this delay as a
    * parameter; this query is how a user picks it).
    *
    * Two channels, one row each: `log` audits the append log as it
    * stands (arrival = event_id — and measures this corpus' log to be
    * perfectly time-sorted, the zero row being the finding); `replay_j8`
    * replays the same log through a deterministic reorder channel
    * (arrival key = event_id + hash-jitter < 8 positions — a simulated
    * racy multi-ingester), which is what gives the histogram machinery
    * real mass to classify.
    *
    * Scale shape: the prefix max is two-level — a partitioned window
    * inside arrival blocks of 4096 plus a per-channel cross-block prefix
    * over the n/4096-row block table (one more level of the same
    * blocking covers any realistic log before the block table itself is
    * data-scale; never an unpartitioned window over the events). The
    * final readout is one bounded aggregate.
    *
    * Output: two rows `(channel, n, on_time, le_1m, le_10m, le_1h,
    * gt_1h, max_late_us, late_ppm)`.
    */
  def latenessAudit(events: DataFrame): DataFrame = {
    val e = events.select(
      col("event_id").cast("long").as("eid"),
      expr("unix_micros(ts)").as("us"))
    val log = e.select(lit("log").as("channel"), col("eid").as("ak"), col("eid"), col("us"))
    val replay = e.select(
      lit("replay_j8").as("channel"),
      (col("eid") + (lit(1103515245L) * (col("eid") % 1000003L) + 12345L) % 2147483647L % 8L)
        .as("ak"),
      col("eid"),
      col("us"))
    val base = log.unionAll(replay).withColumn("blk", expr("ak div 4096"))
    val wIn = Window
      .partitionBy(col("channel"), col("blk"))
      .orderBy(col("ak"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inMax = base.withColumn("inmax", max(col("us")).over(wIn))
    val wBlk = Window
      .partitionBy(col("channel"))
      .orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = base
      .groupBy(col("channel"), col("blk"))
      .agg(max(col("us")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wBlk))
      .drop("bmax")
    inMax
      .join(prefix, Seq("channel", "blk"))
      .withColumn("late_us",
        greatest(col("inmax"), coalesce(col("pmax"), col("inmax"))) - col("us"))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("late_us") === 0L, 1L).otherwise(0L)).as("on_time"),
        sum(when(col("late_us") > 0L && col("late_us") <= 60000000L, 1L).otherwise(0L))
          .as("le_1m"),
        sum(when(col("late_us") > 60000000L && col("late_us") <= 600000000L, 1L).otherwise(0L))
          .as("le_10m"),
        sum(when(col("late_us") > 600000000L && col("late_us") <= 3600000000L, 1L).otherwise(0L))
          .as("le_1h"),
        sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L)).as("gt_1h"),
        max(col("late_us")).as("max_late_us"))
      .withColumn("late_ppm", expr("(n - on_time) * 1000000 div n"))
  }

  /** [[latenessAudit]] mirrored — the oracle computes the IDENTICAL
    * prefix max with one flat per-channel window (blocking is a
    * physical-plan choice, not a semantic one).
    */
  def latenessAuditSql(): String =
    s"""WITH e AS (
       |  SELECT CAST(event_id AS BIGINT) AS eid, epoch_us(ts) AS us FROM events),
       |b AS (
       |  SELECT 'log' AS channel, eid AS ak, eid, us FROM e
       |  UNION ALL
       |  SELECT 'replay_j8' AS channel,
       |         eid + (1103515245 * (eid % 1000003) + 12345) % 2147483647 % 8 AS ak,
       |         eid, us
       |  FROM e),
       |r AS (
       |  SELECT channel, us,
       |         max(us) OVER (PARTITION BY channel ORDER BY ak, eid
       |                       ROWS UNBOUNDED PRECEDING) - us AS late_us
       |  FROM b)
       |SELECT channel, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CASE WHEN late_us = 0 THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
       |       CAST(sum(CASE WHEN late_us > 0 AND late_us <= 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS le_1m,
       |       CAST(sum(CASE WHEN late_us > 60000000 AND late_us <= 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS le_10m,
       |       CAST(sum(CASE WHEN late_us > 600000000 AND late_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS le_1h,
       |       CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS gt_1h,
       |       CAST(max(late_us) AS BIGINT) AS max_late_us,
       |       (CAST(count(*) AS BIGINT) - CAST(sum(CASE WHEN late_us = 0 THEN 1 ELSE 0 END) AS BIGINT))
       |         * 1000000 // CAST(count(*) AS BIGINT) AS late_ppm
       |FROM r GROUP BY channel""".stripMargin
  // ---- Mann–Kendall trend + Theil–Sen slope ---------------------------------

  /** Mann–Kendall trend test with a Theil–Sen slope over the daily
    * event-count series — the nonparametric "is this metric trending"
    * battery a monitor runs before alerting on a drift score (Mann
    * 1945; Kendall's τ; Sen 1968): S = Σ_{i<j} sign(n_j − n_i),
    * τ = S/C(d,2), the continuity-corrected normal z, and the median
    * pairwise slope. No tie correction in Var(S) (documented; mirrored
    * identically — the verdict threshold |z| > 1.96 is unaffected at
    * these d).
    *
    * Exactness: the daily table is exact counts; S and the pair count
    * are integers; slopes round to integer micro-units per pair BEFORE
    * the median (lower median at even counts, ties ordered by the pair
    * key — fully deterministic); τ/z are fixed double forms over the
    * integers (double division, never integer div — S can be negative
    * and Spark `div` truncates where DuckDB `//` floors).
    *
    * Scale shape: one corpus scan to the d-row daily table (d = days of
    * retention, bounded); the pair join and median are over C(d,2)
    * bounded rows.
    *
    * Output: one row `(n_days, s, tau_ppm, z_milli, sen_slope_mic)`.
    */
  def mannKendall(events: DataFrame): DataFrame = {
    val daily = events
      .select(to_date(col("ts")).as("d"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"))
    val idx = Phys.materialized(
      daily.withColumn(
        "i",
        row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long")))
    val pairs = idx
      .select(col("i").as("ai"), col("n").as("an"))
      .join(
        idx.select(col("i").as("bi"), col("n").as("bn")),
        col("bi") > col("ai"))
      .select(
        col("ai"),
        col("bi"),
        signum(col("bn") - col("an")).cast("long").as("sg"),
        expr(
          "CAST(round(CAST(bn - an AS DOUBLE) * 1000000 / CAST(bi - ai AS DOUBLE)) AS BIGINT)")
          .as("slope_mic"))
    val agg = pairs.agg(
      sum(col("sg")).as("s"),
      count(lit(1)).as("m"))
    val dcount = idx.agg(count(lit(1)).as("n_days"))
    val medRank = expr("(m + 1) div 2")
    val sen = pairs
      .withColumn(
        "rk",
        row_number()
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col("slope_mic"), col("ai"), col("bi")))
          .cast("long"))
      .crossJoin(broadcast(agg.select(medRank.as("mr"))))
      .filter(col("rk") === col("mr"))
      .select(col("slope_mic").as("sen_slope_mic"))
    dcount
      .crossJoin(broadcast(agg))
      .crossJoin(broadcast(sen))
      .select(
        col("n_days"),
        col("s"),
        expr("CAST(round(CAST(s AS DOUBLE) * 1000000 / CAST(m AS DOUBLE)) AS BIGINT)")
          .as("tau_ppm"),
        expr(
          """CAST(round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
            |                WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
            |                ELSE CAST(0 AS DOUBLE) END
            |  / sqrt(CAST(n_days AS DOUBLE) * CAST(n_days - 1 AS DOUBLE)
            |         * CAST(2 * n_days + 5 AS DOUBLE) / 18.0) * 1000) AS BIGINT)"""
            .stripMargin.replace("\n", " "))
          .as("z_milli"),
        col("sen_slope_mic"))
  }

  /** [[mannKendall]] mirrored. */
  def mannKendallSql(): String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |idx AS MATERIALIZED (
       |  SELECT n, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM daily),
       |pairs AS MATERIALIZED (
       |  SELECT a.i AS ai, b.i AS bi,
       |         CAST(sign(b.n - a.n) AS BIGINT) AS sg,
       |         CAST(round(CAST(b.n - a.n AS DOUBLE) * 1000000
       |           / CAST(b.i - a.i AS DOUBLE)) AS BIGINT) AS slope_mic
       |  FROM idx a JOIN idx b ON b.i > a.i),
       |ag AS MATERIALIZED (
       |  SELECT CAST(sum(sg) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS m FROM pairs),
       |dc AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM idx),
       |sen AS (
       |  SELECT slope_mic AS sen_slope_mic FROM (
       |    SELECT slope_mic,
       |           CAST(row_number() OVER (ORDER BY slope_mic, ai, bi) AS BIGINT) AS rk
       |    FROM pairs) r CROSS JOIN ag
       |  WHERE r.rk = (ag.m + 1) // 2)
       |SELECT dc.n_days, ag.s,
       |       CAST(round(CAST(ag.s AS DOUBLE) * 1000000 / CAST(ag.m AS DOUBLE)) AS BIGINT)
       |         AS tau_ppm,
       |       CAST(round(CASE WHEN ag.s > 0 THEN CAST(ag.s - 1 AS DOUBLE)
       |                       WHEN ag.s < 0 THEN CAST(ag.s + 1 AS DOUBLE)
       |                       ELSE CAST(0 AS DOUBLE) END
       |         / sqrt(CAST(dc.n_days AS DOUBLE) * CAST(dc.n_days - 1 AS DOUBLE)
       |                * CAST(2 * dc.n_days + 5 AS DOUBLE) / 18.0) * 1000) AS BIGINT)
       |         AS z_milli,
       |       sen.sen_slope_mic
       |FROM dc CROSS JOIN ag CROSS JOIN sen""".stripMargin

  // ---- CUPED variance reduction ----------------------------------------------

  /** CUPED variance-reduction readout (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments by Utilizing
    * Pre-Experiment Data"): per user, X = pre-period value mass (first
    * half of the retention window) and Y = experiment-period mass
    * (second half); θ* = cov(X,Y)/var(X), and the adjusted metric
    * Y − θ(X − X̄) has variance var(Y)·(1 − ρ²). The ρ² row is THE
    * go/no-go number for deploying CUPED on a metric: it is exactly the
    * fraction of variance (≈ sample size) the covariate buys.
    *
    * Exactness: per-user masses are exact integer cents (conditional
    * sums); the five cross-moments are exact BIGINT; θ, the variances,
    * and ρ² are fixed double forms on the aggregated integers.
    * Zero-variance X (no pre-period signal) NULLs θ and the reduction
    * identically in both engines.
    *
    * Scale shape: one corpus scan → per-user conditional aggregate
    * (hash, map-side partial) → one 5-sum rollup. No window, no join.
    *
    * Output: one row `(n_users, theta_micro, var_y_c2, var_cuped_c2,
    * reduction_ppm)`.
    */
  def cuped(events: DataFrame): DataFrame = {
    val bounds = Phys.materialized(
      events.agg(
        min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")))
    val perUser = events
      .crossJoin(broadcast(bounds))
      .select(
        col("user_id"),
        when(
          unix_micros(col("ts")) <= expr("lo + (hi - lo) div 2"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L).as("xc"),
        when(
          unix_micros(col("ts")) > expr("lo + (hi - lo) div 2"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L).as("yc"))
      .groupBy(col("user_id"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
    // second moments in 38-digit decimals (the [[Stats.corrMatrix]]
    // discipline): Σx² passes 2^63 long before the user count does
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(d38(col("x")) * d38(col("x"))).cast("double").as("sxx"),
      sum(d38(col("x")) * d38(col("y"))).cast("double").as("sxy"),
      sum(d38(col("y")) * d38(col("y"))).cast("double").as("syy"))
    val covXY = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val varX = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val varY = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    m.select(
      col("n").as("n_users"),
      expr(s"CAST(round($covXY / nullif($varX, CAST(0 AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("theta_micro"),
      expr(s"CAST(round($varY / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)")
        .as("var_y_c2"),
      expr(
        s"""CAST(round(($varY - $covXY * $covXY / nullif($varX, CAST(0 AS DOUBLE)))
           | / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)""".stripMargin)
        .as("var_cuped_c2"),
      expr(
        s"""CAST(round($covXY * $covXY
           | / nullif($varX * $varY, CAST(0 AS DOUBLE)) * 1000000) AS BIGINT)""".stripMargin)
        .as("reduction_ppm"))
  }

  /** [[cuped]] mirrored. */
  def cupedSql(): String = {
    val covXY = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val varX = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val varY = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    s"""WITH b AS (
       |  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
       |         CAST(max(epoch_us(ts)) AS BIGINT) AS hi
       |  FROM events),
       |pu AS (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2
       |                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |         CAST(sum(CASE WHEN epoch_us(ts) > b.lo + (b.hi - b.lo) // 2
       |                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
       |  FROM events CROSS JOIN b GROUP BY user_id),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
       |         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
       |         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
       |  FROM pu)
       |SELECT n AS n_users,
       |       CAST(round($covXY / nullif($varX, CAST(0 AS DOUBLE)) * 1000000) AS BIGINT)
       |         AS theta_micro,
       |       CAST(round($varY / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS var_y_c2,
       |       CAST(round(($varY - $covXY * $covXY / nullif($varX, CAST(0 AS DOUBLE)))
       |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS var_cuped_c2,
       |       CAST(round($covXY * $covXY
       |         / nullif($varX * $varY, CAST(0 AS DOUBLE)) * 1000000) AS BIGINT) AS reduction_ppm
       |FROM m""".stripMargin
  }

  // ---- mixture SPRT (always-valid sequential test) ---------------------------

  /** Mixture sequential probability ratio test of the per-type mean
    * shift between the two halves of the retention window — the
    * ALWAYS-VALID p-value machinery that makes continuously-monitored
    * A/B dashboards honest (Johari, Koomen, Pekelis & Walsh 2017,
    * "Peeking at A/B Tests"): with δ̂ the observed mean difference,
    * V = σ̂²(1/n₁ + 1/n₂) its variance, and a N(0, τ²) mixing prior,
    * Λ = √(V/(V+τ²)) · exp(δ̂²τ² / (2V(V+τ²))), and rejecting when
    * Λ ≥ 1/α controls type-I error at EVERY look, not just a fixed
    * horizon. Reported in log space (the bloom-FPP libm lesson: ln
    * composes exactly where exp of large arguments diverges).
    *
    * Exactness: per-(type, half) statistics are exact integer cents
    * (counts/sums BIGINT; Σv² a 38-digit decimal / HUGEINT — the
    * [[cuped]] overflow discipline);
    * ln Λ is ONE fixed double expression on them, rounded to milli;
    * the reject flag derives from the ROUNDED column (≥ ln(1/0.05) =
    * 2996 milli), so both engines decide identically. Degenerate
    * inputs (a half with < 2 rows, zero pooled variance) NULL out
    * identically.
    *
    * Scale shape: one corpus scan → k-row conditional aggregate;
    * k-row arithmetic after. τ = 1 value-unit (τ² = 10⁴ cents²).
    *
    * Output: per type `(event_type, n_ref, n_cur, delta_milli,
    * ln_lambda_milli, reject)`.
    */
  def msprt(events: DataFrame): DataFrame = {
    val bounds = Phys.materialized(
      events.agg(
        min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")))
    // squared cents in 38-digit decimals (the [[cuped]] discipline):
    // Σv² passes 2^63 long before the row count does
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val g = events
      .crossJoin(broadcast(bounds))
      .select(
        col("event_type"),
        (unix_micros(col("ts")) <= expr("lo + (hi - lo) div 2")).as("is_ref"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
        sum(when(col("is_ref"), col("v")).otherwise(0L)).as("sr"),
        sum(when(col("is_ref"), d38(col("v")) * d38(col("v")))
          .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("ssr"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("is_ref"), col("v")).otherwise(0L)).as("sc_"),
        sum(when(!col("is_ref"), d38(col("v")) * d38(col("v")))
          .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("ssc"))
    val sig2 =
      "((CAST(ssr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)) " +
        "+ (CAST(ssc AS DOUBLE) - CAST(sc_ AS DOUBLE) * CAST(sc_ AS DOUBLE) / CAST(nc AS DOUBLE))) " +
        "/ nullif(CAST(nr + nc - 2 AS DOUBLE), CAST(0 AS DOUBLE))"
    val vv = s"($sig2 * (1.0 / CAST(nr AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE)))"
    val dd = "(CAST(sc_ AS DOUBLE) / CAST(nc AS DOUBLE) - CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))"
    val tau2 = "10000.0"
    // zero (or FP-negative) pooled variance would hit ln(0)/ln(<0):
    // Spark NULLs, DuckDB raises — gate the whole statistic so both
    // engines agree on NULL instead of diverging
    val lnl =
      s"(CASE WHEN $vv <= CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
        s"ELSE 0.5 * ln($vv / ($vv + $tau2)) + $dd * $dd * $tau2 / (2.0 * $vv * ($vv + $tau2)) END)"
    g.filter(col("nr") >= 2L && col("nc") >= 2L)
      .select(
        col("event_type"),
        col("nr").as("n_ref"),
        col("nc").as("n_cur"),
        expr(s"CAST(round($dd * 10) AS BIGINT)").as("delta_milli"),
        expr(s"CAST(round($lnl * 1000) AS BIGINT)").as("ln_lambda_milli"))
      .withColumn("reject", col("ln_lambda_milli") >= 2996L)
  }

  /** [[msprt]] mirrored. */
  def msprtSql(): String = {
    val sig2 =
      "((CAST(ssr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)) " +
        "+ (CAST(ssc AS DOUBLE) - CAST(sc_ AS DOUBLE) * CAST(sc_ AS DOUBLE) / CAST(nc AS DOUBLE))) " +
        "/ nullif(CAST(nr + nc - 2 AS DOUBLE), CAST(0 AS DOUBLE))"
    val vv = s"($sig2 * (1.0 / CAST(nr AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE)))"
    val dd = "(CAST(sc_ AS DOUBLE) / CAST(nc AS DOUBLE) - CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))"
    val tau2 = "10000.0"
    val lnl =
      s"(CASE WHEN $vv <= CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
        s"ELSE 0.5 * ln($vv / ($vv + $tau2)) + $dd * $dd * $tau2 / (2.0 * $vv * ($vv + $tau2)) END)"
    s"""WITH b AS (
       |  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
       |         CAST(max(epoch_us(ts)) AS BIGINT) AS hi
       |  FROM events),
       |g AS (
       |  SELECT event_type,
       |         CAST(sum(CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
       |         CAST(sum(CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sr,
       |         CAST(sum(CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2 THEN CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) AS ssr,
       |         CAST(sum(CASE WHEN epoch_us(ts) > b.lo + (b.hi - b.lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       |         CAST(sum(CASE WHEN epoch_us(ts) > b.lo + (b.hi - b.lo) // 2 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sc_,
       |         CAST(sum(CASE WHEN epoch_us(ts) > b.lo + (b.hi - b.lo) // 2 THEN CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) AS ssc
       |  FROM events CROSS JOIN b GROUP BY event_type)
       |SELECT event_type, nr AS n_ref, nc AS n_cur,
       |       CAST(round($dd * 10) AS BIGINT) AS delta_milli,
       |       CAST(round($lnl * 1000) AS BIGINT) AS ln_lambda_milli,
       |       CAST(round($lnl * 1000) AS BIGINT) >= 2996 AS reject
       |FROM g
       |WHERE nr >= 2 AND nc >= 2""".stripMargin
  }

  // ---- difference-in-differences --------------------------------------------

  /** Difference-in-differences estimator (Card & Krueger 1994 form) —
    * the quasi-experimental readout a metrics platform runs when
    * treatment was NOT randomized per-impression: treated cohort
    * (user_id odd — the same assignment hash as [[abTest]]) vs
    * control, pre vs post (the two halves of the observed window), on
    * per-event value. The parallel-trends identity: the effect is the
    * treated cohort's change MINUS the control cohort's change,
    * (m̄₁₁−m̄₁₀)−(m̄₀₁−m̄₀₀), which nets out any common time shock a
    * naive post-only comparison would absorb into the estimate. SE by
    * the unpooled four-cell variance sum Σ s²ᵢⱼ/nᵢⱼ.
    *
    * Exactness: the four cells' sufficient statistics are exact
    * integer cents (n, Σv BIGINT; Σv² decimal(38,0)/HUGEINT — the
    * [[cuped]] overflow discipline); means, effect, SE, and t are
    * fixed double forms on them, rounded to milli. Degenerate cells
    * (empty, or any cell with n < 2 for the SE) NULL the affected
    * columns identically in both engines.
    *
    * Scale shape: one corpus scan → 4-row conditional aggregate →
    * 1-row arithmetic. No window, no join.
    *
    * Output: one row `(n00, n01, n10, n11, effect_milli, se_milli,
    * t_milli)` — cell suffix = treat,post.
    */
  def did(events: DataFrame): DataFrame = {
    val bounds = Phys.materialized(
      events.agg(
        min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def cell(t: Int, p: Int, c: org.apache.spark.sql.Column, zero: org.apache.spark.sql.Column) =
      sum(when(col("treat") === t.toLong && col("post") === p.toLong, c).otherwise(zero))
    val aggCols = (for { t <- 0 to 1; p <- 0 to 1 } yield Seq(
      cell(t, p, lit(1L), lit(0L)).as(s"n$t$p"),
      cell(t, p, col("v"), lit(0L)).as(s"s$t$p"),
      cell(t, p, d38(col("v")) * d38(col("v")), lit(0).cast("decimal(38,0)"))
        .cast("double").as(s"ss$t$p"))).flatten
    val a = events
      .crossJoin(broadcast(bounds))
      .select(
        pmod(col("user_id"), lit(2L)).as("treat"),
        (unix_micros(col("ts")) > expr("lo + (hi - lo) div 2")).cast("long").as("post"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .agg(aggCols.head, aggCols.tail: _*)
    // mean of cell tp; NULL on an empty cell
    def m(t: Int, p: Int) =
      s"(CAST(s$t$p AS DOUBLE) / nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE)))"
    // unbiased cell variance over n; NULL when n < 2
    def va(t: Int, p: Int) =
      s"((CAST(ss$t$p AS DOUBLE) - CAST(s$t$p AS DOUBLE) * CAST(s$t$p AS DOUBLE) " +
        s"/ nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE))) " +
        s"/ nullif(CAST(n$t$p - 1 AS DOUBLE), CAST(0 AS DOUBLE)) " +
        s"/ nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE)))"
    val effect = s"((${m(1, 1)} - ${m(1, 0)}) - (${m(0, 1)} - ${m(0, 0)}))"
    val se = s"sqrt(${va(0, 0)} + ${va(0, 1)} + ${va(1, 0)} + ${va(1, 1)})"
    a.select(
      col("n00"), col("n01"), col("n10"), col("n11"),
      expr(s"CAST(round($effect * 10) AS BIGINT)").as("effect_milli"),
      expr(s"CAST(round($se * 10) AS BIGINT)").as("se_milli"),
      expr(s"CAST(round($effect / nullif($se, CAST(0 AS DOUBLE)) * 1000) AS BIGINT)")
        .as("t_milli"))
  }

  /** [[did]] mirrored: the same four-cell forms, HUGEINT second
    * moments.
    */
  def didSql(): String = {
    def m(t: Int, p: Int) =
      s"(CAST(s$t$p AS DOUBLE) / nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE)))"
    def va(t: Int, p: Int) =
      s"((CAST(ss$t$p AS DOUBLE) - CAST(s$t$p AS DOUBLE) * CAST(s$t$p AS DOUBLE) " +
        s"/ nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE))) " +
        s"/ nullif(CAST(n$t$p - 1 AS DOUBLE), CAST(0 AS DOUBLE)) " +
        s"/ nullif(CAST(n$t$p AS DOUBLE), CAST(0 AS DOUBLE)))"
    val effect = s"((${m(1, 1)} - ${m(1, 0)}) - (${m(0, 1)} - ${m(0, 0)}))"
    val se = s"sqrt(${va(0, 0)} + ${va(0, 1)} + ${va(1, 0)} + ${va(1, 1)})"
    val cells = (for { t <- 0 to 1; p <- 0 to 1 } yield {
      val cond = s"treat = $t AND post = $p"
      s"""CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n$t$p,
         |         CAST(sum(CASE WHEN $cond THEN v ELSE 0 END) AS BIGINT) AS s$t$p,
         |         CAST(sum(CASE WHEN $cond THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS DOUBLE) AS ss$t$p""".stripMargin
    }).mkString(",\n         ")
    s"""WITH b AS (
       |  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
       |         CAST(max(epoch_us(ts)) AS BIGINT) AS hi
       |  FROM events),
       |r AS (
       |  SELECT ((user_id % 2) + 2) % 2 AS treat,
       |         CASE WHEN epoch_us(ts) > b.lo + (b.hi - b.lo) // 2 THEN 1 ELSE 0 END AS post,
       |         CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events CROSS JOIN b),
       |a AS (
       |  SELECT $cells
       |  FROM r)
       |SELECT n00, n01, n10, n11,
       |       CAST(round($effect * 10) AS BIGINT) AS effect_milli,
       |       CAST(round($se * 10) AS BIGINT) AS se_milli,
       |       CAST(round($effect / nullif($se, CAST(0 AS DOUBLE)) * 1000) AS BIGINT) AS t_milli
       |FROM a""".stripMargin
  }

  // ---- Page–Hinkley drift detector -------------------------------------------

  /** Page–Hinkley sequential mean-shift detector (Page 1954; the
    * streaming-drift form in Gama et al. 2014's survey) over the daily
    * mean-value series: mₜ = Σᵢ≤ₜ (xᵢ − x̄ᵢ), with x̄ᵢ the running mean
    * of the first i days, and PHₜ = mₜ − minᵢ≤ₜ mᵢ — a sustained
    * upward mean shift makes mₜ climb away from its historical
    * minimum, and PHₜ > λ alarms. The day-resolution complement of
    * [[cusum]] (which tracks per-event deviations from a FIXED
    * reference half): Page–Hinkley needs no reference period — the
    * running mean adapts, so it fires only on shifts that outrun it.
    *
    * Exactness: the daily series is exact integer micro-cents
    * (Σcents·10⁶ div n — floor division on nonnegative operands,
    * identical in both engines); every recursion term (running mean,
    * mₜ cumsum, running min) is integer arithmetic over the bounded
    * day series, so the whole trace is bit-identical cross-engine with
    * NO rounding grid at all. λ = [[PhLambdaMicro]].
    *
    * Scale shape: one corpus scan → per-day aggregate (hash, map-side
    * partial) → three window passes over the BOUNDED day series
    * (≤ window length in days — never data-scale).
    *
    * Output: one row per day `(d, n_events, mean_micro, m_micro,
    * ph_micro, alarm)`.
    */
  def pageHinkley(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(to_date(col("ts")).as("d"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("s"))
      // FLOOR division spelled explicitly (x - pmod(x,y)) div y: Spark's
      // `div` truncates toward zero while DuckDB's `//` floors, so the
      // bit-exact cross-engine claim would silently break on a corpus
      // with negative daily sums — floor-div on this side matches the
      // oracle's semantics for ANY sign (identical on the current
      // nonnegative-value corpus)
      .select(
        col("d"),
        col("n_events"),
        expr("(s * 1000000 - pmod(s * 1000000, n_events)) div n_events").as("mean_micro"))
    val w = Window.orderBy(col("d"))
    val cum = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("csum", sum(col("mean_micro")).over(w))
      // running mean over the first i days, floored — exact integers
      // (same explicit floor-div as mean_micro: csum can go negative)
      .withColumn("term", col("mean_micro") - expr("(csum - pmod(csum, i)) div i"))
    cum
      .withColumn("m_micro", sum(col("term")).over(w))
      .withColumn("ph_micro", col("m_micro") - min(col("m_micro")).over(w))
      .select(
        // string day — the engine's cross-engine date convention
        date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("n_events"),
        col("mean_micro"),
        col("m_micro"),
        col("ph_micro"),
        (col("ph_micro") > PhLambdaMicro).as("alarm"))
  }

  /** [[pageHinkley]]'s alarm threshold, micro-cents (50 cents of
    * accumulated drift beyond the running mean).
    */
  val PhLambdaMicro = 50000000L

  /** [[pageHinkley]] mirrored: the same three window passes in
    * DuckDB's window spelling.
    */
  def pageHinkleySql(): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_events,
       |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) * 1000000
       |           // CAST(count(*) AS BIGINT) AS mean_micro
       |  FROM events GROUP BY 1),
       |cum AS (
       |  SELECT d, n_events, mean_micro,
       |         mean_micro - (CAST(sum(mean_micro) OVER (ORDER BY d) AS BIGINT)
       |           // CAST(row_number() OVER (ORDER BY d) AS BIGINT)) AS term
       |  FROM daily),
       |m AS (
       |  SELECT d, n_events, mean_micro,
       |         CAST(sum(term) OVER (ORDER BY d) AS BIGINT) AS m_micro
       |  FROM cum)
       |SELECT strftime(d, '%Y-%m-%d') AS d, n_events, mean_micro, m_micro,
       |       m_micro - min(m_micro) OVER (ORDER BY d) AS ph_micro,
       |       m_micro - min(m_micro) OVER (ORDER BY d) > $PhLambdaMicro AS alarm
       |FROM m""".stripMargin

}
