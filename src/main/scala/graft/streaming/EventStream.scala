package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` table shape.
  *
  * The reference has no streaming at all (SURVEY.md §2C) — this is the
  * forward-looking extension: the same event analytics as
  * [[graft.operators.EventOps]], expressed as an unbounded plan. Batch and
  * stream share transform logic so results can be cross-checked (the
  * batch queries are the oracle for the streaming path).
  *
  * Scale notes: watermark + tumbling window keeps state bounded (one
  * window per (hour, type) in flight); sessionization state is one small
  * case class per active user, evicted by event-time timeout — both are
  * the shapes that survive unbounded input on a 1000-executor cluster.
  */
object EventStream {

  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")

  /** File-source stream of event parquet dropped into `dir`. Files must
    * carry microsecond timestamps — the raw testdata events.parquet is
    * TIMESTAMP(NANOS), which Spark's reader rejects; stage it through
    * [[stageEvents]] first. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Normalize the raw (nanosecond-timestamp) events table into a
    * micros-precision parquet staging dir that [[readEvents]] can stream. */
  def stageEvents(spark: SparkSession, sfDir: String, stagingDir: String): Unit =
    graft.operators.Tables.events(spark, sfDir)
      .write.mode("overwrite").parquet(stagingDir)

  /** Live experiment readout — the `events_ab_welch` one-row Welch
    * t-test as an unbounded aggregation: arms by user_id % 2, the six
    * conditional moment sums maintained incrementally in the state
    * store (complete mode, one global group), the t/df algebra as a
    * projection over them. After every micro-batch the sink holds
    * exactly the decision row the batch query computes over the data
    * seen so far — the dashboard a running experiment watches. Moment
    * sums are exact decimals (order-independent), so stream == batch
    * bit-for-bit at any cut, not approximately; the state is six
    * numbers regardless of corpus size. */
  /** Live k-anonymity monitor, streaming half — `events_k_anonymity`'s
    * quasi-identifier group sizes ((event_type, hour, value-bucket) →
    * count) maintained incrementally as ONE keyed aggregation; state is
    * bounded by the quasi-identifier DOMAIN (types × 24 hours ×
    * buckets), not the stream length. The release decision ("does any
    * cell fall under k?") is [[kAnonReadout]]'s finishing fold over the
    * live cells — counts are exact integers, so stream == batch
    * bit-for-bit at any cut. */
  def kAnonCells(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), hour(col("ts")).as("hr"),
        floor(col("value") / 10.0).as("vbucket"))
      .agg(count(lit(1)).as("gsize"))

  /** Finishing fold over the live cells — mirrors the batch query's
    * per-type report expression for expression. */
  def kAnonReadout(cells: DataFrame): DataFrame =
    cells.groupBy(col("event_type"))
      .agg(min(col("gsize")).as("k"),
        count(lit(1)).as("n_groups"),
        sum(col("gsize")).as("n_rows"),
        sum(when(col("gsize") < 5, col("gsize")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("risk_share",
        round(col("rows_at_risk").cast("double") / col("n_rows"), 6))
      .orderBy(col("event_type"))

  /** Live stratified-ATE readout, streaming half — `ml_stratified_ate`
    * as an unbounded aggregation: per-stratum (event_type) treated/
    * control moment sums are ONE keyed streaming aggregation with
    * state bounded by the stratum domain; the share-weighted effect
    * table is [[ateReadout]]'s finishing fold. Decimal moment sums are
    * order-independent, so stream == batch bit-for-bit at any cut. */
  def ateCells(events: DataFrame): DataFrame = {
    def el10(c: org.apache.spark.sql.Column) =
      round(c, 10).cast("decimal(28,10)")
    val t = col("event_id") % 3 === 0
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(t, 1L)).as("n_treated"),
        sum(when(t, el10(col("value")))).as("sy1"),
        sum(when(!t, el10(col("value")))).as("sy0"))
  }

  /** Finishing fold over the live strata — mirrors the batch query's
    * share/propensity/effect tail expression for expression (the
    * corpus total rides a window over the ≤|types|-row cell table, so
    * no self-join of the memory-sink view is needed). */
  def ateReadout(cells: DataFrame): DataFrame = {
    def mean6(sum10: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      round(sum10.cast("double") / n, 6)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    cells
      .withColumn("n_all", sum(col("n")).over(wAll))
      .withColumn("share", round(col("n").cast("double") / col("n_all"), 6))
      .withColumn("propensity",
        round(col("n_treated").cast("double") / col("n"), 6))
      .withColumn("m_treated", mean6(col("sy1"), col("n_treated")))
      .withColumn("m_control", mean6(col("sy0"), col("n") - col("n_treated")))
      .withColumn("effect", round(col("m_treated") - col("m_control"), 6))
      .select(col("event_type"), col("n"), col("share"), col("propensity"),
        col("m_treated"), col("m_control"), col("effect"),
        round(col("share") * col("effect"), 6).as("ate_contrib"))
      .orderBy(col("event_type"))
  }

  /** Live SRM guardrail, streaming half — `events_srm_check` as an
    * unbounded aggregation: per-(type, arm) counts are ONE keyed
    * streaming aggregation whose state is bounded by types × 2 arms —
    * the monitor that invalidates a live experiment the moment its
    * traffic split breaks. Counts are exact integers, so stream ==
    * batch bit-for-bit at any cut. */
  def srmCells(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
      (col("user_id") % 2 === 1).as("treated"))
      .agg(count(lit(1)).as("n"))

  /** Finishing fold over the live arm counts — mirrors the batch χ²
    * tail expression for expression. */
  def srmReadout(cells: DataFrame): DataFrame =
    cells.groupBy(col("event_type"))
      .agg(sum(when(!col("treated"), col("n")).otherwise(0L)).as("n0"),
        sum(when(col("treated"), col("n")).otherwise(0L)).as("n1"))
      .withColumn("e", (col("n0") + col("n1")).cast("double") / 2)
      .withColumn("chi2", round(
        (col("n0") - col("e")) * (col("n0") - col("e")) / col("e") +
          (col("n1") - col("e")) * (col("n1") - col("e")) / col("e"), 6))
      .select(col("event_type"), col("n0"), col("n1"), col("chi2"),
        (col("chi2") > 3.841459).as("srm_flag"))
      .orderBy(col("event_type"))

  /** Live drift monitor, streaming half — `ml_psi_drift`'s population
    * stability index as an unbounded aggregation. The per-(type, bin)
    * reference/current counts are ONE keyed streaming aggregation whose
    * state is bounded by the BIN DOMAIN (types × 10 fixed bins), never
    * the stream length — the kAnonCells shape. The reference/current
    * boundary is a parameter (micros): a deployed monitor knows its
    * reference window a priori; the batch twin uses the same fixed cut.
    * Counts are exact integers, so stream == batch bit-for-bit. */
  def psiCells(events: DataFrame, cutUs: Long): DataFrame =
    events.groupBy(col("event_type"),
      least(lit(9L), greatest(lit(0L),
        floor(round(col("value"), 6) / 60).cast("long"))).as("bin"))
      .agg(sum(when(unix_micros(col("ts")) < cutUs, 1L).otherwise(0L))
        .as("na"),
        sum(when(unix_micros(col("ts")) >= cutUs, 1L).otherwise(0L))
        .as("nb"))

  /** Finishing fold over the live cells — mirrors the batch query's
    * smoothed-PSI tail (grid-densified bins, +0.5/+5.0 smoothing, 10dp
    * terms into an exact decimal sum) expression for expression. */
  def psiReadout(cells: DataFrame): DataFrame = {
    // densify the 10 fixed bins WITHOUT a self-join (the live cells
    // arrive as a memory-sink view, and grid-from-cells ⋈ cells trips
    // self-join attribute resolution): fold each type's sparse bins
    // into a map, explode the static 0..9 grid, look bins up in the map
    val t = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    cells.groupBy(col("event_type"))
      .agg(map_from_arrays(collect_list(col("bin")),
        collect_list(struct(col("na"), col("nb")))).as("m"))
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(9L))).as("bin"), col("m"))
      .select(col("event_type"), col("bin"),
        coalesce(col("m")(col("bin")).getField("na"), lit(0L)).as("na"),
        coalesce(col("m")(col("bin")).getField("nb"), lit(0L)).as("nb"))
      .withColumn("ta", sum(col("na")).over(t))
      .withColumn("tb", sum(col("nb")).over(t))
      .withColumn("p", (col("na") + 0.5) / (col("ta") + 5.0))
      .withColumn("q", (col("nb") + 0.5) / (col("tb") + 5.0))
      .withColumn("term",
        round((col("p") - col("q")) * log(col("p") / col("q")), 10)
          .cast("decimal(20,10)"))
      .groupBy(col("event_type"), col("ta"), col("tb"))
      .agg(round(sum(col("term")), 6).cast("double").as("psi"))
      .select(col("event_type"), col("psi"),
        col("ta").as("n_ref"), col("tb").as("n_cur"))
      .orderBy(col("event_type"))
  }

  /** Live difference-in-differences readout — `events_diff_in_diff` as
    * an unbounded aggregation. DiD is fully LINEAR in the event stream
    * (four conditional cell means over arm × pre/post), so unlike CUPED
    * no per-user state is needed: eight exact-decimal moment sums in
    * one global group, the DiD estimate as a projection — constant
    * state at any stream length. The exposure cut is a parameter (known
    * a priori in a live experiment; the batch twin derives the same
    * value from the data span). Decimal sums are order-independent, so
    * stream == batch bit-for-bit at any cut. */
  def didReadout(events: DataFrame, cutUs: Long): DataFrame = {
    def el10(c: org.apache.spark.sql.Column) =
      round(c, 10).cast("decimal(28,10)")
    def mean6(sum10: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      round(sum10.cast("double") / n, 6)
    val post = unix_micros(col("ts")) >= cutUs
    val treated = col("user_id") % 2 === 1
    def cellMean(c: org.apache.spark.sql.Column) =
      mean6(sum(when(c, el10(col("value")))), sum(when(c, 1L)))
    events
      .agg(
        sum(when(!treated && !post, 1L)).as("n_c_pre"),
        sum(when(!treated && post, 1L)).as("n_c_post"),
        sum(when(treated && !post, 1L)).as("n_t_pre"),
        sum(when(treated && post, 1L)).as("n_t_post"),
        cellMean(!treated && !post).as("m_c_pre"),
        cellMean(!treated && post).as("m_c_post"),
        cellMean(treated && !post).as("m_t_pre"),
        cellMean(treated && post).as("m_t_post"))
      .withColumn("did", round((col("m_t_post") - col("m_t_pre")) -
        (col("m_c_post") - col("m_c_pre")), 6))
  }

  /** Live CUPED readout, streaming half — the variance-reduced twin of
    * [[abReadout]] (`events_cuped`'s unbounded form). CUPED needs
    * per-user pre/post covariate MEANS (a ratio per user), so the
    * incremental state is the per-user moment 4-tuple (Σpre, n_pre,
    * Σpost, n_post), maintained as ONE keyed streaming aggregation —
    * the only stateful operator, which is what Structured Streaming's
    * single-stateful-op rule requires. The pre/post boundary is a
    * PARAMETER (micros): an experiment knows its exposure cut a priori;
    * the batch twin derives the same cut from the data span, and the
    * parity spec feeds that value here. State is user-bounded (4
    * numbers per user), exactly the footprint of the batch side's
    * per-user table. Sums are exact decimals → order-independent →
    * stream == batch bit-for-bit at any cut. */
  def cupedUserState(events: DataFrame, cutUs: Long): DataFrame = {
    def el10(c: org.apache.spark.sql.Column) =
      round(c, 10).cast("decimal(28,10)")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("us") < cutUs, el10(col("value")))).as("spre"),
        sum(when(col("us") < cutUs, 1L)).as("npre"),
        sum(when(col("us") >= cutUs, el10(col("value")))).as("spost"),
        sum(when(col("us") >= cutUs, 1L)).as("npost"))
  }

  /** CUPED finishing algebra over the live per-user state — the
    * dashboard view a running experiment queries after each
    * micro-batch: θ from five K-bounded moment sums, per-user
    * adjustment, two arm rows. Mirrors `events_cuped`'s rounding
    * lattice EXPRESSION FOR EXPRESSION (x/y at 6dp, θ path at 10dp,
    * outputs at 6dp) so the parity spec can require bit equality, not
    * approximation. Runs as a batch query over the sink's current
    * content — the split a real deployment uses: unbounded state in the
    * stream, constant-size readout on demand. */
  def cupedReadout(userState: DataFrame): DataFrame = {
    def el10(c: org.apache.spark.sql.Column) =
      round(c, 10).cast("decimal(28,10)")
    // exact 6dp×6dp decimal product — mirrors DetMean.prod12 (the
    // el10(x*x) 12-digit-product round was the r12 cross-engine tie
    // class; the batch twin switched with it, keeping bit parity)
    def prod12(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(a, 6).cast("decimal(18,6)") * round(b, 6).cast("decimal(18,6)")
    val ux = userState
      .filter(col("npre") > 0 && col("npost") > 0)
      .select(col("user_id"),
        round(col("spre").cast("double") / col("npre"), 6).as("x"),
        round(col("spost").cast("double") / col("npost"), 6).as("y"))
      .localCheckpoint() // two consumers: θ moments + per-user adjust
    val mom = ux.agg(count(lit(1)).as("n"),
      sum(el10(col("x"))).as("sx"),
      sum(el10(col("y"))).as("sy"),
      sum(prod12(col("x"), col("x"))).as("sxx"),
      sum(prod12(col("x"), col("y"))).as("sxy"))
    val theta = mom
      .withColumn("mx", round(col("sx").cast("double") / col("n"), 10))
      .withColumn("my", round(col("sy").cast("double") / col("n"), 10))
      .withColumn("cov", round(col("sxy").cast("double") / col("n") -
        col("mx") * col("my"), 10))
      .withColumn("varx", round(col("sxx").cast("double") / col("n") -
        col("mx") * col("mx"), 10))
      .withColumn("theta", round(col("cov") / col("varx"), 10))
      .select(col("mx"), col("theta"))
    ux.crossJoin(broadcast(theta))
      .withColumn("yadj",
        round(col("y") - col("theta") * (col("x") - col("mx")), 6))
      .withColumn("arm", col("user_id") % 2)
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(el10(col("y"))).as("sy"),
        sum(prod12(col("y"), col("y"))).as("syy"),
        sum(el10(col("yadj"))).as("sa"),
        sum(prod12(col("yadj"), col("yadj"))).as("saa"))
      .withColumn("mean_y",
        round(col("sy").cast("double") / col("n_users"), 6))
      .withColumn("mean_y_adj",
        round(col("sa").cast("double") / col("n_users"), 6))
      .select(col("arm"), col("n_users"), col("mean_y"), col("mean_y_adj"),
        round(col("syy").cast("double") / col("n_users") -
          col("mean_y") * col("mean_y"), 6).as("var_y"),
        round(col("saa").cast("double") / col("n_users") -
          col("mean_y_adj") * col("mean_y_adj"), 6).as("var_y_adj"))
      .orderBy(col("arm"))
  }

  def abReadout(events: DataFrame): DataFrame = {
    val treated = col("user_id") % 2 === 1
    def el10(c: org.apache.spark.sql.Column) =
      round(c, 10).cast("decimal(28,10)")
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L))
    events
      .agg(cnt(!treated).as("n0"), cnt(treated).as("n1"),
        sum(when(!treated, el10(col("value")))).as("sy0"),
        sum(when(treated, el10(col("value")))).as("sy1"),
        sum(when(!treated, el10(col("value") * col("value")))).as("syy0"),
        sum(when(treated, el10(col("value") * col("value")))).as("syy1"))
      .withColumn("m0", round(col("sy0").cast("double") / col("n0"), 6))
      .withColumn("m1", round(col("sy1").cast("double") / col("n1"), 6))
      .withColumn("v0", round((col("syy0").cast("double") -
        col("n0") * col("m0") * col("m0")) / (col("n0") - 1), 6))
      .withColumn("v1", round((col("syy1").cast("double") -
        col("n1") * col("m1") * col("m1")) / (col("n1") - 1), 6))
      .withColumn("se0", col("v0") / col("n0"))
      .withColumn("se1", col("v1") / col("n1"))
      .withColumn("t", round((col("m1") - col("m0")) /
        sqrt(col("se1") + col("se0")), 6))
      .withColumn("df", round(
        (col("se1") + col("se0")) * (col("se1") + col("se0")) /
          (col("se1") * col("se1") / (col("n1") - 1) +
           col("se0") * col("se0") / (col("n0") - 1)), 2))
      .select(col("n0"), col("n1"), col("m0"), col("m1"),
        col("v0"), col("v1"), col("t"), col("df"))
  }

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour watermark
    * for late data. Streaming twin of the `events_hourly` batch query —
    * the sum goes through the same decimal cast so batch and stream agree
    * bit-for-bit, not just approximately. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: purchases within the hour after each
    * click, per user — the unbounded twin of the batch
    * `events_range_join`. Native Structured Streaming join: the
    * time-range condition plus both watermarks lets the engine compute
    * exactly how long each side's state must be retained (clicks ≤
    * watermark + 1 hour, purchases ≤ watermark), so state is bounded on
    * an unbounded stream — no banding needed; the join IS the range
    * semantics here, while the batch side bands buckets for hash-join
    * efficiency. Inner join: a pair emits once both sides have arrived. */
  def conversionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    c.join(p, expr(
      """c_user = p_user AND
        |p_ts > c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  // --- custom state: session tracking via flatMapGroupsWithState ---

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Emits a session row when 30 minutes pass with no events for a user
    * (event-time timeout) — the streaming twin of `events_sessions`. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastTs), s.nEvents))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.lastTs > gapMs =>
                  closed += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastTs), s.nEvents)
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
                case Some(s) =>
                  // out-of-order events (late but above watermark) merge
                  // into the session: bounds extend monotonically, never
                  // regress — a late event must not reset lastTs backwards
                  // and fabricate a split on the next on-time event
                  cur = Some(SessionState(
                    math.min(s.sessionStart, e.ts.getTime),
                    math.max(s.lastTs, e.ts.getTime),
                    s.nEvents + 1))
                case None =>
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.iterator
          }
      }
  }

  // --- streaming event dedup: the events_dedup_window twin ---

  /** Drop retried/replayed events on an unbounded stream: keep the
    * first arrival per (user, type, 5-minute bucket) via Spark's
    * built-in `dropDuplicatesWithinWatermark` — per-key state expires
    * once the watermark passes, so memory is bounded by keys ACTIVE in
    * the watermark horizon, not stream history. Under in-order replay
    * the first arrival is the bucket's min-ts event, i.e. exactly the
    * batch `events_dedup_window` keep rule (spec-pinned). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("bucket", expr("unix_micros(ts) div 300000000"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket")

  // --- streaming funnel state machine: the events_funnel twin ---

  case class FunnelState(vTs: Long, cTs: Long, pTs: Long)
  case class StageAdvance(user_id: Long, stage: String, ts: Timestamp)

  /** Per-user funnel progression (view → click-after-view →
    * purchase-after-click) as a streaming state machine: one 3-long
    * state row per user, a `StageAdvance` emitted the moment a user
    * first reaches each stage — the real-time version of the batch
    * `events_funnel` count (which a downstream
    * `count(distinct user) per stage` reproduces exactly; pinned by the
    * spec against the batch min-ts chaining). Greedy-first semantics
    * match the batch formulation because events replay in time order:
    * the first view IS min(view ts), the first click after it IS
    * min(click ts > v_ts), and so on. Strict `>` comparisons mirror the
    * batch query. State is user-bounded and never grows with the
    * stream. */
  def funnelStages(events: Dataset[Ev]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    val unset = Long.MinValue
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[FunnelState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
          sorted.foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if st.vTs == unset =>
                st = st.copy(vTs = t)
                out += StageAdvance(userId, "view", e.ts)
              case "click" if st.vTs != unset && t > st.vTs && st.cTs == unset =>
                st = st.copy(cTs = t)
                out += StageAdvance(userId, "click_after_view", e.ts)
              case "purchase" if st.cTs != unset && t > st.cTs && st.pTs == unset =>
                st = st.copy(pTs = t)
                out += StageAdvance(userId, "purchase_after_click", e.ts)
              case _ =>
            }
          }
          state.update(st)
          out.iterator
      }
  }

  // --- streaming transition pairs: the events_transitions twin ---

  case class TransState(lastTs: Long, lastId: Long, lastType: String)
  case class TransPair(user_id: Long, prev: String, next: String)

  /** Per-user (prev, next) event-type transition pairs over an unbounded
    * stream — the streaming twin of the batch `events_transitions`
    * matrix (count the emitted pairs downstream to materialize it).
    *
    * State is ONE row per user (the last seen event), so memory is
    * user-bounded, not stream-bounded, and chaining works ACROSS
    * micro-batches: the first event of batch n pairs with the last
    * event of batch n-1 through the stored state — exactly the lag
    * semantics, not per-batch windows. Within a batch, events sort by
    * (ts, event_id) — the established tie-break. Events later than the
    * stored state (late but above watermark) chain in arrival order
    * against the newest state rather than re-sorting history: a
    * documented at-least-approximate contract under disorder, and
    * bit-equal to the batch lag when the source replays in order
    * (pinned by the spec). */
  def transitionPairs(events: Dataset[Ev]): Dataset[TransPair] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[TransState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[TransPair]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += TransPair(userId, p.lastType, e.event_type))
            prev = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  // --- streaming burst detection: the events_burst twin ---

  case class BurstState(buf: Vector[Long], n: Long, peak: Long, peakAt: Long)
  case class BurstPeriod(user_id: Long, n_events: Long, peak_1h: Long,
      peak_at_us: Long)

  /** Per-user 1-hour rolling peak rate on an unbounded stream — the
    * streaming twin of the batch `events_burst` RANGE-frame query,
    * reshaped as BURST PERIODS: maintain each user's events inside the
    * trailing hour (the same frame content the batch window holds) and
    * the running peak; when the window EMPTIES — a ≥1 h quiet gap
    * in-stream, or event-time timeout at the end — emit the completed
    * period's report and reset. The reshape is exact, not approximate:
    * a (t−1 h, t] frame can never span a ≥1 h gap, so the batch global
    * peak is exactly max(period peaks), n_events is their sum, and the
    * batch's earliest-peak-moment argmax is min(peak_at) over the max
    * periods (the in-period rule already keeps the EARLIEST moment via
    * strictly-greater updates; RANGE peers reach the same final count at
    * the same us, so equal-timestamp batches agree too). Pinned
    * per-user against the batch window in EventStreamSpec.
    *
    * State = one Vector of the user's last hour of event times — the
    * identical bound the batch RANGE frame pays per row, user-bounded
    * and self-trimming, never stream-bounded. In-order replay matches
    * the batch bit-for-bit (the [[transitionPairs]] disorder contract);
    * within a micro-batch events sort by (ts, event_id). */
  def burstPeaks(events: Dataset[Ev]): Dataset[BurstPeriod] = {
    import events.sparkSession.implicits._
    val hourUs = 3600L * 1000000L
    def micros(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, BurstPeriod](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[BurstState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(BurstPeriod(userId, s.n, s.peak, s.peakAt))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[BurstPeriod]
            var s = state.getOption.getOrElse(BurstState(Vector.empty, 0L, 0L, 0L))
            evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val us = micros(e.ts)
              if (s.buf.nonEmpty && us - s.buf.last >= hourUs) {
                // rolling window emptied: the burst period is complete
                out += BurstPeriod(userId, s.n, s.peak, s.peakAt)
                s = BurstState(Vector.empty, 0L, 0L, 0L)
              }
              val buf = (s.buf :+ us).filter(_ > us - hourUs)
              val roll = buf.size.toLong
              s =
                if (roll > s.peak) BurstState(buf, s.n + 1, roll, us)
                else BurstState(buf, s.n + 1, s.peak, s.peakAt)
            }
            if (s.n > 0) {
              state.update(s)
              // quiet for 1h = the frame can no longer grow; +2h watermark
              // delay means no on-time event can reopen it first
              state.setTimeoutTimestamp(s.buf.last / 1000 + 3600L * 1000)
            }
            out.iterator
          }
      }
  }

  /** Streaming value quantiles per event type via the
    * [[graft.functions.SketchQuantiles]] UDAF — a mergeable fixed-
    * capacity summary is streaming-legal by construction, so the batch
    * aggregate becomes per-group stream state with zero reformulation
    * (the [[graft.streaming.DocStream.topkTokens]] discipline, here
    * round-tripping the histogram buffer through the state store
    * between micro-batches). Values round to integers before the
    * sketch so the fixture's cardinality sits inside the sized-to-
    * domain EXACT regime (capacity ≥ distinct rounded values ⇒ the
    * running output equals the batch aggregate over everything
    * ingested so far — EventStreamSpec pins final state == batch on
    * the real table). Complete/update output modes; state per group is
    * the capacity-bounded histogram, never the value set.
    *
    * Capacity headroom: the fixture's `value` domain is bounded (rounded
    * values observed < 600 at sf0.1 and capped by the generator, ~330
    * distinct), but distinct count grows with fixture size — a 512
    * default sat at ~64% full at sf0.1 and would silently cross into
    * the approximate regime (where micro-batch merge order makes stream
    * and batch diverge) at a larger fixture. 2048 keeps the exact
    * regime with ≥3× headroom over the capped domain; EventStreamSpec
    * asserts the sf0.1 domain still fits. If the domain ever becomes
    * unbounded, the exact-regime pin must move to a property gate. */
  def valueQuantiles(events: DataFrame, capacity: Int = 2048,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame =
    events
      .select(col("event_type"), round(col("value"), 0).as("v"))
      .groupBy(col("event_type"))
      .agg(graft.functions.SketchQuantiles
        .column(col("v"), capacity, probs).as("qs"))
}
