package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream windowing in batch form (the streaming forms live in
  * graft.streaming). Gap comparisons are done in integer MICROSECONDS
  * (`unix_micros`) — bit-exact, no floating-point epoch math.
  */
object EventWindows {

  /** Tumbling window aggregation; `width` e.g. "1 hour". */
  def tumbling(df: DataFrame, ts: Column, width: String, keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy((window(ts, width).getField("start").as("ws") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window aggregation; window() explodes each event into
    * width/slide windows. */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(ts, width, slide).getField("start").as("ws") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Trailing-window RATE ANOMALY: per key, the z-score of each
    * period's event count against the preceding `lookback` observed
    * periods — the ingestion-health alarm (a crawler going dark, a
    * source suddenly flooding) in the same family as the drift
    * monitor. z = (c − μ)/σ over the trailing frame, computed
    * tie-free:
    *   z = (c·n − S) / sqrt(n·Q − S²)
    * with S = Σc, Q = Σc² over the frame — every intermediate an
    * exact-integer-valued DOUBLE in fixed operand order (exact below
    * 2^53, the bm25 envelope: counts to ~3·10^8 per period with a
    * 24-period frame), and sqrt is IEEE-754 exactly rounded, so the
    * score is bit-deterministic with zero transcendental hazard.
    * Null z while the frame holds < `minPeriods` periods or when the
    * trailing variance is 0.
    *
    * Frame semantics: ROWS over OBSERVED periods — a key silent for a
    * while compares against its last `lookback` ACTIVE periods (gap
    * periods are zero-information here; compose with the x31 gap-fill
    * first for calendar-frame semantics).
    *
    * Scale shape: one (key, period) combiner agg, then per-key ROWS
    * windows — partition-parallel across keys, frame-bounded state.
    * Output: (ws, key, c, n_prior, z). */
  def rateAnomaly(df: DataFrame, ts: Column, width: String, keyCol: Column,
      lookback: Int = 24, minPeriods: Int = 8): DataFrame = {
    val counts = df
      .groupBy(window(ts, width).getField("start").as("ws"),
        keyCol.as("key"))
      .agg(count(lit(1)).as("c"))
    rateAnomalyFromCounts(counts, lookback, minPeriods)
  }

  /** The window + z tail of [[rateAnomaly]] over an already-built
    * (ws, key, c) counts table — shared with the streaming view
    * ([[graft.streaming.Streams.rateAnomalyView]]), whose counts come
    * from the additive ledger instead of a scan. */
  def rateAnomalyFromCounts(counts: DataFrame, lookback: Int = 24,
      minPeriods: Int = 8): DataFrame = {
    require(lookback >= 2 && minPeriods >= 2 && minPeriods <= lookback,
      s"need 2 <= minPeriods ($minPeriods) <= lookback ($lookback)")
    val frame = Window.partitionBy("key").orderBy("ws")
      .rowsBetween(-lookback, -1)
    val withMoments = counts
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__s", sum(col("c")).over(frame))
      .withColumn("__q", sum(col("c") * col("c")).over(frame))
    withMoments.select(col("ws"), col("key"), col("c"),
      coalesce(col("__n"), lit(0L)).as("n_prior"),
      when(col("__n") >= minPeriods &&
          col("__n").cast("double") * col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") > 0.0,
        (col("c").cast("double") * col("__n").cast("double") -
          col("__s").cast("double")) /
          sqrt(col("__n").cast("double") * col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double")))
        .as("z"))
  }

  /** Trailing EXPONENTIAL-MOVING-AVERAGE smoothing over per-bucket
    * counts — the damped baseline beside [[rateAnomalyFromCounts]]'
    * z-score (EMA reacts to level shifts the fixed-window mean
    * smears). α = 1/4 over the trailing ≤ `lookback` PRESENT buckets,
    * seeded at the window's oldest count:
    * ema = fold(c_old, …, c_now)(acc, x → 0.75·acc + 0.25·x).
    * The fold runs left-to-right over the frame-ordered list in IEEE
    * doubles — both engines reduce lists head-to-tail, and bucket
    * timestamps are unique per key, so the order (and the result) is
    * bit-deterministic. Row-based frame on PRESENT buckets: gaps
    * contribute nothing (callers wanting zero-filled decay compose
    * the x31 gap-fill first).
    * Input (key, ws, c); output + (ema, ratio = c/ema). */
  def emaSmooth(counts: DataFrame, lookback: Int = 8): DataFrame = {
    require(lookback >= 2, s"emaSmooth: lookback=$lookback must be >= 2")
    val frame = Window.partitionBy("key").orderBy("ws")
      .rowsBetween(-(lookback - 1), 0)
    val arr = collect_list(col("c").cast("double")).over(frame)
    counts
      .withColumn("__arr", arr)
      .withColumn("ema",
        aggregate(
          slice(col("__arr"), lit(2),
            greatest(size(col("__arr")) - 1, lit(0))),
          element_at(col("__arr"), 1),
          (acc, x) => acc * lit(0.75) + x * lit(0.25)))
      .withColumn("ratio", col("c").cast("double") / col("ema"))
      .drop("__arr")
  }

  /** Ordered FUNNEL analysis: per key, the timestamps of the first
    * occurrence of stage 1, the first stage-2 event strictly AFTER
    * it, the first stage-3 strictly after that, and so on — ordered
    * but not adjacent, the product-analytics conversion query (and,
    * for pipeline telemetry, "ingest → clean → export per shard").
    *
    * Scale shape: one conditional min-agg per stage plus one equi-join
    * per stage boundary — every agg map-side combinable on the key, NO
    * per-key window sort (the naive formulation sorts every key's
    * whole event history; this touches each stage's events once).
    * Events at exactly the same timestamp as the previous stage do NOT
    * count (strictly-after semantics, deterministic under ties).
    * Output: (key, t_1..t_n, stage) — stage = number of stages
    * reached, rows for every key that reached stage 1. */
  def funnel(df: DataFrame, ts: Column, keyCol: Column, typeCol: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct, got $stages")
    val base = df.select(keyCol.as("key"), ts.as("__ts"),
      typeCol.as("__type"))
    var acc = base.where(col("__type") === stages.head)
      .groupBy("key").agg(min(col("__ts")).as("t_1"))
    for (i <- 2 to stages.length) {
      val prev = s"t_${i - 1}"
      val next = base.where(col("__type") === stages(i - 1))
        .select(col("key"), col("__ts"))
      acc = acc.join(next, Seq("key"), "left")
        .groupBy((col("key") +: (1 until i).map(j => col(s"t_$j"))): _*)
        .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(s"t_$i"))
    }
    val stageExpr = (1 to stages.length).map(i =>
      when(col(s"t_$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    acc.withColumn("stage", stageExpr.cast("long"))
  }

  /** Cohort RETENTION triangle: keys grouped by their first-active
    * period (the cohort), then counted in every later period they
    * were active — the (cohort, offset, n_active) table every
    * retention curve is drawn from. Periods are `window(width)`
    * starts, offsets integer period counts (window starts are
    * width-aligned in UTC, so the micros difference divides exactly).
    *
    * Scale shape: one (key, period) distinct, one min-agg for the
    * cohort, one model-sized join back, one combiner agg — the
    * (key, period) distinct is the only corpus-sized shuffle.
    * Output: (cohort, offset, n_active). */
  def cohortRetention(df: DataFrame, ts: Column, keyCol: Column,
      width: String, widthMicros: Long): DataFrame = {
    require(widthMicros > 0, "widthMicros must be positive")
    val active = df.select(keyCol.as("key"),
        window(ts, width).getField("start").as("p"))
      .distinct()
    val first = active.groupBy("key").agg(min(col("p")).as("cohort"))
    active.join(first, Seq("key"))
      .select(col("cohort"),
        ((unix_micros(col("p")) - unix_micros(col("cohort"))) /
          lit(widthMicros)).cast("long").as("offset"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same key exceeds `gap`. One shuffle on the key; the
    * lag/cumsum pair is two passes over the same partitioning (no extra
    * shuffle — same window spec). */
  def sessionize(df: DataFrame, ts: Column, keyCol: Column,
      gapMicros: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ts.asc, tieBreak.asc)
    val micros = unix_micros(ts)
    val newSession = when(
      lag(micros, 1).over(w).isNull ||
        micros - lag(micros, 1).over(w) > gapMicros, 1L).otherwise(0L)
    df.withColumn("__new", newSession)
      .withColumn("sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** STATIONARY EVENT MIX — the Markov steady state of the x141
    * session-transition matrix by bounded POWER ITERATION (the x115
    * TextRank discipline on behavioral data): r' ∝ r·P with
    * P(i→j) = n_ij/t_i, renormalized each round. Where x141 reports
    * local transition probabilities, this reports where user behavior
    * SETTLES — the long-run event mix a capacity planner provisions
    * against, and a drift alarm when it walks away from the observed
    * mix.
    *
    * Determinism: each edge contribution r·n/t is one IEEE chain
    * floor-quantized into 1e-12 micro-units (a Long) before the
    * order-independent sum; the round total T is an exact Long sum,
    * and the renormalization is one double division per state. States
    * with no outgoing transitions leak their mass (absorbed then
    * renormalized away) — documented semantics, identical both
    * engines. Scale shape: the graph is EVENT-TYPE-bounded, so after
    * one sessionize pass every iteration is a model-sized join+agg;
    * ranks stay DataFrames throughout.
    * Output: (event_type, p_stationary). */
  def stationaryMix(events: DataFrame, ts: Column, user: Column,
      tie: Column, typeCol: Column, gapMicros: Long,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 10, s"stationaryMix: iters=$iters")
    val sess = sessionize(events, ts, user, gapMicros, tie)
    val w = Window.partitionBy(user, col("sid")).orderBy(ts.asc, tie.asc)
    val pairs = sess.withColumn("__prev", lag(typeCol, 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src"), typeCol.as("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds every iteration
    val t = pairs.groupBy("src").agg(sum(col("n")).as("t"))
      .localCheckpoint(true)
    val states = pairs.select(col("src").as("state"))
      .union(pairs.select(col("dst"))).distinct()
      .localCheckpoint(true)
    var rank = states.withColumn("r", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = pairs
        .join(rank.select(col("state").as("src"), col("r").as("__r")),
          Seq("src"))
        .join(t, Seq("src"))
        .select(col("dst").as("state"),
          floor(col("__r") * col("n").cast("double") /
            col("t").cast("double") * lit(1e12)).cast("long").as("c"))
      val cj = contrib.groupBy("state").agg(sum(col("c")).as("cj"))
      val tot = cj.agg(sum(col("cj")).as("T"))
      rank = states.join(cj, Seq("state"), "left")
        .crossJoin(broadcast(tot))
        .select(col("state"),
          (coalesce(col("cj"), lit(0L)).cast("double") /
            col("T").cast("double")).as("r"))
    }
    rank.select(col("state").as("event_type"),
      col("r").as("p_stationary"))
  }

  /** Session CO-OCCURRENCE lift — market-basket association on
    * behavioral data ("sessions that did X also did Y"): for every
    * unordered event-type pair, the observed-over-expected ratio
    * lift = n_ab·N / (n_a·n_b) over SESSIONS (the x141 sessionize
    * grain), where n_x counts sessions containing x at least once.
    * lift ≫ 1 = the behaviors travel together; ≪ 1 = they repel.
    * The behavioral twin of x80's token PMI.
    *
    * Determinism: counts are exact integers; lift is ONE fixed-order
    * double chain (n_ab·N)/(n_a·n_b) — products in doubles, so no
    * 64-bit overflow at any scale. Scale shape: sessionize + one
    * distinct (session, type) projection; the within-session
    * self-join fans out at most |types|² per session (event-type
    * sets are bounded like languages); output is |types|²-bounded.
    * Output: (type_a, type_b, n_ab, n_a, n_b, n_sessions, lift). */
  def sessionCooccurrence(events: DataFrame, ts: Column, user: Column,
      tie: Column, typeCol: Column, gapMicros: Long): DataFrame = {
    val sess = sessionize(events, ts, user, gapMicros, tie)
    val st = sess.select(user.as("__u"), col("sid"), typeCol.as("__t"))
      .distinct()
      .localCheckpoint(true) // feeds N, per-type counts, and the pairs
    val ns = st.select("__u", "sid").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val per = st.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val pairs = st.as("a")
      .join(st.as("b"),
        col("a.__u") === col("b.__u") && col("a.sid") === col("b.sid") &&
          col("a.__t") < col("b.__t"))
      .groupBy(col("a.__t").as("type_a"), col("b.__t").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(per.select(col("__t").as("type_a"), col("__n").as("n_a")),
        Seq("type_a"))
      .join(per.select(col("__t").as("type_b"), col("__n").as("n_b")),
        Seq("type_b"))
      .crossJoin(broadcast(ns))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_sessions"),
        ((col("n_ab").cast("double") * col("n_sessions").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
  }

  /** Spend-QUANTILE MOBILITY matrix — segment migration: users are
    * quantile-bucketed by exact decimal spend separately in the EARLY
    * and LATE halves of the observed window (midpoint =
    * (min+max)/2 micros — deterministic, no wall clock), and the
    * matrix counts users per (early bucket, late bucket). The
    * product-analytics "did my top quintile stay on top" table; mass
    * off the diagonal is churn/upsell in one view. Users active in
    * only one half drop out (no pair to report — documented).
    *
    * Determinism: exact decimal spends, NTILE over total orders
    * (spend DESC, user ASC) per half. The two NTILE windows are exact
    * global ranks per half (the x173 caveat: at 100 TB user counts
    * swap for [[Quantiles.approx]] thresholds — the matrix tail is
    * bucket-agnostic). Output: (q_early, q_late, n_users) —
    * buckets²-bounded. */
  def quantileMobility(events: DataFrame, userCol: Column, ts: Column,
      value: Column, buckets: Int = 5): DataFrame = {
    require(buckets >= 1, s"quantileMobility: buckets=$buckets")
    val D = org.apache.spark.sql.types.DecimalType(18, 4)
    val bounds = events.agg(min(unix_micros(ts)).as("__lo"),
      max(unix_micros(ts)).as("__hi"))
    val spend = events.crossJoin(broadcast(bounds))
      .withColumn("__half",
        when(unix_micros(ts) * 2 < col("__lo") + col("__hi"), 0L)
          .otherwise(1L))
      .groupBy(userCol.as("user_id"), col("__half"))
      .agg(sum(value.cast(D)).as("__m"))
    val w = Window.partitionBy("__half")
      .orderBy(col("__m").desc, col("user_id").asc)
    val q = spend.withColumn("__q", ntile(buckets).over(w).cast("long"))
    q.where(col("__half") === 0L)
      .select(col("user_id"), col("__q").as("q_early"))
      .join(q.where(col("__half") === 1L)
        .select(col("user_id"), col("__q").as("q_late")), Seq("user_id"))
      .groupBy("q_early", "q_late")
      .agg(count(lit(1)).as("n_users"))
  }

  /** RFM user segmentation (recency / frequency / monetary — the
    * classic behavioral-cohort table): per user, whole days since the
    * last event (vs the CORPUS max timestamp — a deterministic as-of,
    * no wall clock), event count, and the exact decimal value sum;
    * each metric quintiled by `buckets`-way NTILE over a TOTAL order
    * (metric, then user id — explicit tie-break, standard SQL tile
    * semantics both engines share, the x91 discipline). Bucket 1 is
    * best on every axis (most recent / most frequent / highest
    * spend).
    *
    * Scale shape: one combiner agg per user + a 1-row as-of broadcast;
    * the three NTILE windows are EXACT global ranks — one task each
    * over per-USER rows, the oracle contract. At 100 TB user counts,
    * swap the bucket stage for [[Quantiles.approx]] thresholds (the
    * x28/x132 documented arm) — the metrics agg is bucket-agnostic.
    * Output: (user_id, recency_days, frequency, monetary,
    * r_bucket, f_bucket, m_bucket). */
  def rfm(events: DataFrame, userCol: Column, ts: Column, value: Column,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 1, s"rfm: buckets=$buckets must be >= 1")
    val D = org.apache.spark.sql.types.DecimalType(18, 4)
    val dayUs = 86400000000L
    val asof = events.agg(max(unix_micros(ts)).as("__mx"))
    val per = events.groupBy(userCol.as("user_id")).agg(
      max(unix_micros(ts)).as("__last"),
      count(lit(1)).as("frequency"),
      sum(value.cast(D)).as("__m"))
    val age = col("__mx") - col("__last")
    per.crossJoin(broadcast(asof))
      .withColumn("recency_days",
        ((age - pmod(age, lit(dayUs))) / lit(dayUs)).cast("long"))
      .withColumn("r_bucket", ntile(buckets).over(Window
        .orderBy(col("recency_days").asc, col("user_id").asc)).cast("long"))
      .withColumn("f_bucket", ntile(buckets).over(Window
        .orderBy(col("frequency").desc, col("user_id").asc)).cast("long"))
      .withColumn("m_bucket", ntile(buckets).over(Window
        .orderBy(col("__m").desc, col("user_id").asc)).cast("long"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("__m").cast("double").as("monetary"),
        col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  /** KAPLAN–MEIER survival estimator (Kaplan & Meier 1958) over
    * right-censored durations — the churn/retention curve done
    * correctly: users still active at the observation horizon are
    * CENSORED, not counted as churned (the naive "lifetime histogram"
    * silently biases survival down). S(t) = Π_{s ≤ t, d_s > 0}
    * (1 − d_s / n_risk_s), with n_risk_s = subjects whose duration
    * ≥ s (censored subjects leave the risk set after their censor
    * day — the standard deaths-before-censors tie rule at equal s).
    *
    * Input: one row per SUBJECT with an integer duration (days) and
    * an event flag (true = observed event, false = censored).
    * CONTRACT: durations form a BOUNDED grid (calendar days against a
    * corpus horizon — thousands of rows at any corpus age), the
    * [[graft.ext.Stats.mannWhitneyU]] discrete-grid contract.
    *
    * Determinism: integer death/censor/risk counts are exact; each
    * day's factor is one IEEE division, and the survival column is a
    * CUMULATIVE PRODUCT folded in ascending-day order (collect_list
    * over an ordered window frame — frame order is the fold order,
    * the x175 fixed-order discipline made cumulative). No logs, no
    * exp — the boundary stays inside exactly-rounded IEEE ops.
    * Scale shape: one combiner day agg + two grid-bounded windows.
    * Output: (day, n_risk, n_events, n_censored, survival), one row
    * per observed duration day (censor-only days carry factor 1). */
  def kaplanMeier(subjects: DataFrame, duration: Column, event: Column)
      : DataFrame = {
    val perDay = subjects.select(duration.as("day"), event.as("__e"))
      .groupBy("day").agg(
        sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("n_censored"))
    val tot = broadcast(perDay.agg(
      sum(col("n_events") + col("n_censored")).as("__n")))
    val wPrev = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    perDay.crossJoin(tot)
      .withColumn("n_risk", col("__n") -
        coalesce(sum(col("n_events") + col("n_censored")).over(wPrev),
          lit(0L)))
      .withColumn("__f",
        when(col("n_events") > 0,
          lit(1.0) - col("n_events").cast("double") /
            col("n_risk").cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("survival",
        aggregate(collect_list(col("__f")).over(wCum), lit(1.0),
          (acc, x) => acc * x))
      .select(col("day"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Sequential TRIGRAM patterns at session grain — the length-3
    * extension of the x141 transition bigrams: consecutive event-type
    * triples within a session (two lags over the session's total
    * (ts, tie) order), counted corpus-wide. The "view → click →
    * purchase vs view → error → exit" pattern table behavioral
    * analysis reads beside the transition matrix and the stationary
    * mix. Scale shape: sessionize + two lag windows per (user, sid)
    * partition + one combiner count — no joins.
    * Output: (t1, t2, t3, n). */
  def sessionTrigrams(events: DataFrame, ts: Column, user: Column,
      tie: Column, typeCol: Column, gapMicros: Long): DataFrame = {
    val sess = sessionize(events, ts, user, gapMicros, tie)
    val w = Window.partitionBy(user, col("sid")).orderBy(ts, tie)
    sess
      .withColumn("__t1", lag(typeCol, 2).over(w))
      .withColumn("__t2", lag(typeCol, 1).over(w))
      .where(col("__t1").isNotNull && col("__t2").isNotNull)
      .groupBy(col("__t1").as("t1"), col("__t2").as("t2"),
        typeCol.as("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** BEHAVIOR MOVERS — which event types grew or shrank between the
    * EARLY and LATE halves of the observed window (midpoint =
    * (min+max)/2 micros, the x180 deterministic split): per type, the
    * add-½ smoothed log₂ fold change of its share plus the pooled
    * two-proportion z for the share difference — the "what changed"
    * table beside x194's when-did-it-change alarm. Comparing SHARES
    * (type count / half total), not raw counts, so a corpus that
    * merely grew does not read as every behavior rising.
    *
    * Determinism: exact integer counts on the full type grid (a type
    * absent from one half is a maximal mover — the zero-cell lesson);
    * the log₂ is quantized once at DECIMAL(28,12); z is the x182
    * pooled chain per row, NULL on zero pooled variance. Scale shape:
    * one 1-row bounds broadcast + one (type, half) combiner count +
    * a |types|-bounded tail.
    * Output: (event_type, n_early, n_late, share_early, share_late,
    * log2_fc, z). */
  def behaviorMovers(events: DataFrame, ts: Column, typeCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val L = DecimalType(28, 12)
    val bounds = broadcast(events.agg(
      min(unix_micros(ts)).as("__lo"), max(unix_micros(ts)).as("__hi")))
    val halved = events.select(typeCol.as("event_type"),
        unix_micros(ts).as("__t"))
      .crossJoin(bounds)
      .withColumn("__late",
        col("__t") * 2 > col("__lo") + col("__hi"))
    val counts = halved.groupBy("event_type").agg(
      sum(when(!col("__late"), 1L).otherwise(0L)).as("n_early"),
      sum(when(col("__late"), 1L).otherwise(0L)).as("n_late"))
    val tot = broadcast(counts.agg(sum(col("n_early")).as("__te"),
      sum(col("n_late")).as("__tl")))
    val pe = (col("n_early").cast("double") + lit(0.5)) /
      (col("__te").cast("double") + lit(0.5))
    val pl = (col("n_late").cast("double") + lit(0.5)) /
      (col("__tl").cast("double") + lit(0.5))
    val se = col("n_early").cast("double") / col("__te").cast("double")
    val sl = col("n_late").cast("double") / col("__tl").cast("double")
    val p = (col("n_early") + col("n_late")).cast("double") /
      (col("__te") + col("__tl")).cast("double")
    val sd = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("__te").cast("double") +
        lit(1.0) / col("__tl").cast("double")))
    counts.crossJoin(tot)
      .select(col("event_type"), col("n_early"), col("n_late"),
        se.as("share_early"), sl.as("share_late"),
        (log(pl / pe).cast(L).cast("double") /
          log(lit(2.0)).cast(L).cast("double")).as("log2_fc"),
        when(sd > 0, (sl - se) / sd).as("z"))
  }

  /** ASSOCIATION RULES at session grain — the directed
    * support/confidence/lift table over [[sessionCooccurrence]]'s
    * unordered pair counts (Agrawal & Srikant 1994's A → B readout
    * restricted to 1-item antecedents): for every ordered type pair,
    * support = n_ab/N, confidence = n_ab/n_a, lift =
    * n_ab·N/(n_a·n_b). Both directions of each co-occurring pair are
    * emitted (confidence is asymmetric — that is the point).
    * Determinism: exact integer session counts, three IEEE divisions
    * per row. Scale shape: the [[sessionCooccurrence]] distinct
    * session-type frame + one |types|²-bounded self-join.
    * Output: (antecedent, consequent, n_a, n_b, n_ab, support,
    * confidence, lift). */
  def associationRules(events: DataFrame, ts: Column, user: Column,
      tie: Column, typeCol: Column, gapMicros: Long): DataFrame = {
    val sess = sessionize(events, ts, user, gapMicros, tie)
    val st = sess.select(user.as("__u"), col("sid"), typeCol.as("__t"))
      .distinct()
      .localCheckpoint(true) // feeds N, per-type counts, and the pairs
    val ns = st.select("__u", "sid").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val per = st.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val pairs = st.as("a")
      .join(st.as("b"),
        col("a.__u") === col("b.__u") && col("a.sid") === col("b.sid") &&
          col("a.__t") =!= col("b.__t"))
      .groupBy(col("a.__t").as("antecedent"), col("b.__t").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(per.select(col("__t").as("antecedent"), col("__n").as("n_a")),
        Seq("antecedent"))
      .join(per.select(col("__t").as("consequent"), col("__n").as("n_b")),
        Seq("consequent"))
      .crossJoin(broadcast(ns))
      .select(col("antecedent"), col("consequent"), col("n_a"),
        col("n_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_sessions").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_ab").cast("double") * col("n_sessions").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
  }
}
