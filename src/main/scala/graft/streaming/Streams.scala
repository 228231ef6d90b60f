package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Structured Streaming operators over the events stream (SURVEY.md
  * §2.B.10). Every transform is a plain DataFrame→DataFrame function, so
  * the SAME code path runs in batch (where `q_win_tumble`/`q_sessionize`
  * oracle-check it against DuckDB) and under `readStream` (where
  * StreamsSpec drives it through MemoryStream with out-of-order input).
  *
  * Scale posture: streaming state is partitioned by group key exactly like
  * a batch shuffle; watermarks bound state size (late data beyond the
  * watermark is dropped, so state for closed windows is evicted). At
  * 100 TB/day the knobs are partition count and watermark width — the
  * operator code is unchanged.
  */
object Streams {

  /** Normalized event record for typed stateful ops. */
  final case class Ev(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Open-session state for [[statefulSessionize]] (fixed-size per key). */
  final case class S(start: Long, end: Long, n: Long)

  /** Tumbling-window counts per event type. */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.engine.GQuery.dsum(col("value"), 6).as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window counts (width, slide). */
  def slidingAgg(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows with an inactivity gap (built-in session_window). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Watermarked variant — required for append-mode streaming aggregation;
    * late rows beyond `delay` are dropped and window state is evicted. */
  def tumblingAggWatermarked(events: DataFrame, width: String,
      delay: String): DataFrame =
    tumblingAgg(events.withWatermark("ts", delay), width)

  /** Streaming dedup by event_id with bounded state. */
  def dedupWithinWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * session row when `gapSeconds` of event-time inactivity passes (state
    * timeout), bounding per-key state to one open session. */
  def statefulSessionize(events: Dataset[Ev], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Ev],
        state: GroupState[S]): Iterator[SessionOut] = {
      val gapMs = gapSeconds * 1000L
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(
          SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var out = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(S(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              out ::= SessionOut(userId, new Timestamp(s.start),
                new Timestamp(s.end), s.n)
              cur = Some(S(t, t, 1))
            case None =>
              cur = Some(S(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's signups within `windowSeconds` BEFORE the purchase. Both
    * sides carry watermarks so the join state is bounded — signups are
    * evicted once the watermark passes signup_ts + window. The same
    * function works on batch DataFrames (unbounded state is fine there).
    */
  def purchaseSignupJoin(events: DataFrame, windowSeconds: Long,
      delay: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", delay)
    purchases.join(signups,
      col("user_id") === col("s_user_id") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("signup_id"), col("signup_ts"))
  }

  /** LEFT OUTER stream-stream interval join — [[purchaseSignupJoin]]'s
    * hard sibling: purchases with NO qualifying signup still emit (with
    * null signup columns), but only once the watermark proves no matching
    * signup can arrive anymore. That proof is exactly why outer
    * stream-stream joins REQUIRE both the watermark and the event-time
    * range condition: they bound how long an unmatched left row must be
    * held before the null-extended result is safe to emit. State stays
    * watermark-bounded on both sides. */
  def purchaseSignupJoinOuter(events: DataFrame, windowSeconds: Long,
      delay: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", delay)
    purchases.join(signups,
      col("user_id") === col("s_user_id") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSeconds SECONDS"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("signup_id"), col("signup_ts"))
  }

  /** Stream-static enrichment join: each micro-batch left-joins the
    * (small) static dimension, broadcast so the stream side never
    * shuffles. Spark re-plans the static side per micro-batch, so a dim
    * backed by a lake path picks up slowly-changing updates between
    * batches — the standard streaming enrichment pattern. No watermark
    * needed: the static side holds no streaming state. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming ingest-time dedup gate: flag documents in an unbounded
    * stream whose banded minhash signature collides with the standing
    * corpus's PRECOMPUTED signature table (see
    * [[graft.llm.NearDup.bandedSignatures]] — 4 short rows per corpus
    * doc, refreshed between micro-batches like any stream-static dim).
    * Signatures for stream rows come from
    * [[graft.llm.NearDup.bandedSignaturesPerRow]], which is pure per-row
    * expression work — no aggregation, NO STREAMING STATE — so the gate
    * is stateless end to end: per-row signatures + one stream-static
    * equi-join. Emits (doc_id, band_id, corpus_id) candidate rows; a doc
    * matching the same corpus doc in several bands emits several rows —
    * the downstream exact-verify (batch `incrementalNearDups` on the
    * flagged slice) dedups, keeping this gate free of dropDuplicates
    * state. */
  def corpusDupCandidates(streamDocs: DataFrame,
      corpusSigs: DataFrame): DataFrame =
    graft.llm.NearDup.bandedSignaturesPerRow(streamDocs)
      .join(corpusSigs
        .select(col("id").as("corpus_id"), col("band_id"), col("sig")),
        Seq("band_id", "sig"))
      .select(col("id").as("doc_id"), col("band_id"), col("corpus_id"))

  /** Streaming PARAGRAPH-level dedup gate — q_dedup_para's ingest twin,
    * the same stateless shape as [[corpusDupCandidates]]: each incoming
    * doc is chunked per-row into 20-word paragraphs and digested
    * ([[graft.llm.NearDup.paragraphDigestsPerRow]] — pure projection, NO
    * STREAMING STATE), then probed against the standing corpus's
    * keep-first paragraph digest table
    * ([[graft.llm.NearDup.paragraphDigestTable]], a lake table refreshed
    * between micro-batches like any stream-static dim). Emits one
    * (doc_id, pos, corpus_id, corpus_pos) row per copied paragraph; a
    * fully novel doc emits nothing. Downstream either drops the flagged
    * chunks (boilerplate strip) or routes the doc to the batch exact
    * verifier — this gate stays free of dropDuplicates state either way. */
  def paragraphDupCandidates(streamDocs: DataFrame,
      corpusParas: DataFrame): DataFrame =
    graft.llm.NearDup.paragraphDigestsPerRow(streamDocs)
      .join(corpusParas
        .select(col("ph"), col("doc_id").as("corpus_id"),
          col("pos").as("corpus_pos")),
        Seq("ph"))
      .select(col("id").as("doc_id"), col("pos"),
        col("corpus_id"), col("corpus_pos"))

  /** Streaming CONTENT-DEFINED-CHUNK dedup gate — q_dedup_cdc's ingest
    * twin, the same stateless shape as [[paragraphDupCandidates]]: each
    * incoming doc is chunked per-row by the fused CdcChunks kernel (pure
    * projection, NO STREAMING STATE) and probed against the standing
    * corpus chunk table ([[graft.llm.NearDup.cdcChunkTable]]). Because
    * CDC boundaries re-synchronize after edits, a prefix-edited
    * near-clone still hits its source's chunks — the case the
    * fixed-width paragraph gate structurally misses. Emits one
    * (doc_id, ch, tok, corpus_id) row per shared chunk; a novel doc
    * emits nothing. */
  def cdcDupCandidates(streamDocs: DataFrame,
      corpusChunks: DataFrame): DataFrame =
    graft.llm.NearDup.cdcChunkDigestsPerRow(streamDocs)
      .join(corpusChunks.select(col("ch"), col("corpus_id")), Seq("ch"))
      .select(col("id").as("doc_id"), col("ch"), col("tok"),
        col("corpus_id"))

  /** Streaming 64-BIT SIMHASH near-dup gate — q_neardup_simhash64's
    * ingest twin, the same stateless shape as [[cdcDupCandidates]]: each
    * incoming doc is fingerprinted per-row by the fused SimHash64 kernel
    * (pure projection, NO STREAMING STATE), its four 16-bit band keys
    * probe the standing corpus band table
    * ([[graft.llm.NearDup.simHash64BandTable]]), and exact Hamming ≤
    * `maxHamming` is verified inline on the joined fingerprints (all
    * integer popcounts). By pigeonhole the band probe loses nothing at
    * Hamming ≤ 3. Emits one (doc_id, corpus_id, hamming) row PER SHARED
    * BAND — up to 4 per pair; the downstream batch pass dedups, keeping
    * the gate state-free. A novel doc emits nothing. */
  def simhashDupCandidates(streamDocs: DataFrame,
      corpusBands: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.llm.NearDup
      .simHash64Bands(graft.llm.NearDup.simHash64PerRow(streamDocs))
      .join(corpusBands, Seq("band_id", "val"))
      .select(col("id").as("doc_id"), col("corpus_id"),
        (expr("bit_count(fp_lo ^ c_lo)") + expr("bit_count(fp_hi ^ c_hi)"))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** 1-row centroid pack for [[centroidAssign]]: (k = 1, cents = sorted
    * array of (g, cent[dim]) structs) built from a relational (g, i, c)
    * centroid table — e.g. the batch Lloyd output (q_kmeans_lloyd).
    * collect_list order is nondeterministic, so BOTH nesting levels are
    * array_sort'ed (the r13 deterministic re-assembly rule). */
  def centroidsOneRow(cent: DataFrame): DataFrame =
    cent.groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
      .select(col("g"), expr("transform(ic, s -> s.c)").as("cent"))
      .groupBy(lit(1).as("k"))
      .agg(array_sort(collect_list(struct(col("g"), col("cent"))))
        .as("cents"))

  /** Streaming CENTROID-ASSIGNMENT gate — q_kmeans_lloyd's scoring twin,
    * the stateless shape of [[simhashDupCandidates]]: each arriving
    * embedding stream-static-joins the broadcast 1-row centroid pack
    * (re-planned per micro-batch like any dimension) and is assigned
    * per-row — NO streaming state, no shuffle; a pure projection the
    * cluster scales by adding executors.
    *
    * EXACT batch parity by integer staging: each squared-difference term
    * is floor(t·1e12 + 0.5) — t < 2250 keeps the 12-dp round-trip exact
    * (ulp(t) < 0.5e-12), so the term is an exact integer < 2⁵³ held in a
    * LONG — and the per-centroid fold sums longs, so the distance equals
    * the batch Lloyd pass's decimal(30,12)-staged sum × 1e12 BIT-EXACTLY
    * in any fold or arrival order; argmin is the lexicographic struct
    * min (min distance, ties by min g) — the batch argmin's exact
    * tiebreak. Emits (vec_id, cluster, dist_e12). */
  def centroidAssign(streamVecs: DataFrame,
      centroids1Row: DataFrame): DataFrame =
    streamVecs
      .withColumn("k", lit(1))
      .join(broadcast(centroids1Row), Seq("k"))
      .select(col("vec_id"),
        expr("""array_min(transform(cents, s -> struct(
                 aggregate(zip_with(embedding, s.cent,
                   (x, c) -> cast(floor((cast(x as double) - c) *
                     (cast(x as double) - c) * 1e12 + 0.5) as bigint)),
                   0L, (acc, v) -> acc + v) AS d,
                 s.g AS g)))""").as("best"))
      .select(col("vec_id"), col("best.g").as("cluster"),
        col("best.d").as("dist_e12"))

  /** Streaming TIME-DECAY ATTRIBUTION gate — q_attribution_decay's
    * ingest twin, the same stateless shape as [[corpusDupCandidates]]:
    * each arriving view/click touch stream-static-joins the standing
    * purchase lake table (user equi-join + the 7-day interval conjunct,
    * purchases re-planned per micro-batch like any dimension) and emits
    * one (p_id, channel, wt) UNNORMALIZED credit row, wt = 1/2^Δdays.
    * The weights are dyadic rationals (integer shiftleft, Δdays ≤ 6), so
    * the downstream batch normalization — one groupBy(p_id) over the
    * emitted rows, see q_attribution_decay — sums them EXACTLY in any
    * arrival order: the streamed credits bit-match the batch query no
    * matter how the touch stream is batched. Per-purchase normalization
    * deliberately stays OUT of the gate: it would need per-purchase
    * state that never expires (a purchase's touch set is only closed
    * once the stream passes p_ts, which the batch pass already handles),
    * while the gate itself holds NO streaming state at all. */
  def touchCreditCandidates(streamTouches: DataFrame,
      purchases: DataFrame): DataFrame =
    streamTouches
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
      .join(broadcast(purchases
          .select(col("p_user"), col("p_id"), col("p_ts"))),
        col("p_user") === col("t_user") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"))
      .withColumn("dd", expr(
        "(unix_timestamp(p_ts) - unix_timestamp(t_ts)) div 86400"))
      .withColumn("wt",
        lit(1.0) / expr("shiftleft(1L, cast(dd as int))").cast("double"))
      .select(col("p_id"), col("channel"), col("wt"))

  /** Windowed approximate-distinct users — the streaming cardinality
    * monitor (uniques per window). The HyperLogLog++ buffer per window is
    * CONSTANT-SIZE regardless of user count, so streaming state stays
    * bounded where an exact `countDistinct` (which streaming aggregation
    * rejects anyway) would grow with |users|. HLL register-merge is a
    * max — order- and batching-insensitive — so the streaming result
    * equals the batch twin exactly on the same input. */
  def approxDistinctPerWindow(events: DataFrame, width: String = "1 hour",
      rsd: Double = 0.02): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("win"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"),
        col("approx_users"), col("n_events"))

  /** Watermarked variant for append-mode emission. */
  def approxDistinctPerWindowWatermarked(events: DataFrame, width: String,
      delay: String, rsd: Double = 0.02): DataFrame =
    approxDistinctPerWindow(events.withWatermark("ts", delay), width, rsd)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Spark 4.x `transformWithState` processor: per-user running event
    * count + value total in a ValueState, emitted on every update.
    * Requires the RocksDB state store provider (see [[transformRunningTotals]]).
    */
  private class RunningTotalsProcessor
      extends StatefulProcessor[Long, Ev, UserRunning] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val (n0, v0) = if (state.exists()) state.get() else (0L, 0.0)
      var n = n0; var v = v0
      rows.foreach { e => n += 1; v += e.value }
      state.update((n, v))
      Iterator.single(UserRunning(key, n, v))
    }
  }

  /** Per-user running totals via the Spark 4.x transformWithState API
    * (the successor to flatMapGroupsWithState: typed state variables,
    * TTL, timers). The caller's session must set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
    */
  def transformRunningTotals(events: Dataset[Ev]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class DriftAlert(event_type: String, at_ts: Timestamp,
      direction: String, magnitude: Double, n_since_reset: Long)

  /** Per-key CUSUM state: positive/negative cumulative deviation and the
    * sample count since the last alert reset (fixed-size per key). */
  final case class CusumS(pos: Double, neg: Double, n: Long)

  /** STREAMING CUSUM DRIFT MONITOR — the online twin of q_changepoint's
    * offline detector: per event type, accumulate the one-sided
    * cumulative deviations of `value` from `target` (pos ← max(0,
    * pos + (v − target)), neg symmetric) and emit a [[DriftAlert]] the
    * moment either side crosses `threshold`, then reset both — the
    * classic Page test, O(1) state per key. Rows within a micro-batch
    * are processed in (ts, event_id) order so replays and shuffle
    * arrival order can't change the alert sequence; the watermark
    * bounds out-of-orderness across batches (later-than-delay stragglers
    * are dropped by the engine, same as every stateful op here). At
    * scale this runs per (metric, shard) key with millions of keys —
    * the state is three numbers per key. */
  def driftCusum(events: Dataset[Ev], target: Double, threshold: Double,
      watermarkDelay: String = "10 minutes"): Dataset[DriftAlert] = {
    import events.sparkSession.implicits._

    def update(key: String, rows: Iterator[Ev],
        state: GroupState[CusumS]): Iterator[DriftAlert] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var s = state.getOption.getOrElse(CusumS(0.0, 0.0, 0L))
        var out = List.empty[DriftAlert]
        sorted.foreach { e =>
          val pos = math.max(0.0, s.pos + (e.value - target))
          val neg = math.min(0.0, s.neg + (e.value - target))
          val n = s.n + 1
          if (pos > threshold)
            { out ::= DriftAlert(key, e.ts, "up", pos, n)
              s = CusumS(0.0, 0.0, 0L) }
          else if (-neg > threshold)
            { out ::= DriftAlert(key, e.ts, "down", -neg, n)
              s = CusumS(0.0, 0.0, 0L) }
          else s = CusumS(pos, neg, n)
        }
        state.update(s)
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class TopKOut(event_type: String, user_id: Long,
      est_count: Long, err_bound: Long, rank: Int)

  /** SPACE-SAVING HEAVY HITTERS — bounded-state streaming top-k: per
    * event type, track at most `capacity` user counters; an untracked
    * arrival evicts the MINIMUM counter and inherits its count (+1),
    * recording that count as the new entry's error bound — the classic
    * Metwally et al. guarantee: true_count ≤ est ≤ true_count + err,
    * and any user with true frequency > N/capacity is guaranteed
    * tracked. State is exactly `capacity` (user, est, err) triples per
    * key no matter how many distinct users flow past — the property
    * that makes per-key top-k viable on an unbounded stream where an
    * exact counter map would grow with the key cardinality. Emits the
    * current top-k (count desc, user asc — deterministic) each batch
    * in Update mode. Ties on eviction break by SMALLEST user id, and
    * batch rows process in (ts, event_id) order, so replays produce
    * identical streams of snapshots. */
  def spaceSavingTopK(events: Dataset[Ev], capacity: Int = 10, k: Int = 3,
      watermarkDelay: String = "10 minutes"): Dataset[TopKOut] = {
    import events.sparkSession.implicits._

    def update(key: String, rows: Iterator[Ev],
        state: GroupState[Map[Long, (Long, Long)]]): Iterator[TopKOut] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var m = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
        sorted.foreach { e =>
          m.get(e.user_id) match {
            case Some((c, err)) => m = m.updated(e.user_id, (c + 1, err))
            case None if m.size < capacity =>
              m = m.updated(e.user_id, (1L, 0L))
            case None =>
              val (victim, (minC, _)) =
                m.minBy { case (u, (c, _)) => (c, u) }
              m = (m - victim).updated(e.user_id, (minC + 1, minC))
          }
        }
        state.update(m)
        m.toSeq
          .map { case (u, (c, err)) => (u, c, err) }
          .sortBy { case (u, c, _) => (-c, u) }
          .take(k)
          .zipWithIndex
          .map { case ((u, c, err), i) =>
            TopKOut(key, u, c, err, i + 1) }
          .iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class AnomalyOut(event_type: String, event_id: Long,
      at_ts: Timestamp, value: Double, zscore: Double)

  /** Welford running-moment state: count, mean, and M2 (sum of squared
    * deviations) — numerically stable, three numbers per key. */
  final case class WelfordS(n: Long, mean: Double, m2: Double)

  /** STREAMING Z-SCORE ANOMALY GATE — the online twin of q_anomaly /
    * q_zscore: per event type, maintain running mean/variance with
    * Welford's update (no Σx² cancellation blow-up on long streams) and
    * emit each event whose |z| exceeds `z` once at least `minN` samples
    * have been absorbed. The anomalous value still updates the moments
    * (a level shift eventually becomes the new normal — the CUSUM
    * monitor above is the one that ALERTS on the shift itself).
    * Deterministic per-batch ordering as in [[driftCusum]]. */
  def welfordZscore(events: Dataset[Ev], minN: Long = 30L, z: Double = 3.0,
      watermarkDelay: String = "10 minutes"): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._

    def update(key: String, rows: Iterator[Ev],
        state: GroupState[WelfordS]): Iterator[AnomalyOut] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var s = state.getOption.getOrElse(WelfordS(0L, 0.0, 0.0))
        var out = List.empty[AnomalyOut]
        sorted.foreach { e =>
          if (s.n >= minN) {
            val sd = math.sqrt(s.m2 / (s.n - 1))
            if (sd > 0) {
              val zi = (e.value - s.mean) / sd
              if (math.abs(zi) > z)
                out ::= AnomalyOut(key, e.event_id, e.ts, e.value, zi)
            }
          }
          val n = s.n + 1
          val d = e.value - s.mean
          val mean = s.mean + d / n
          s = WelfordS(n, mean, s.m2 + d * (e.value - mean))
        }
        state.update(s)
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class HoltS(n: Long, level: Double, trend: Double)

  /** Both arms' cumulative integer moments — six longs, constant size. */
  final case class SeqS(n0: Long, s0: Long, ss0: Long,
      n1: Long, s1: Long, ss1: Long)

  final case class SeqOut(n0: Long, n1: Long, z: Option[Double],
      crossed: Option[Boolean])

  /** The engine's md5 variant split (CLAUDE.md cross-engine idiom) in
    * driver/executor Scala: first 8 hex chars of md5(user_id-as-string)
    * parsed base-16, mod 2 — identical to the batch queries'
    * conv(substring(md5(...), 1, 8), 16, 10) % 2. */
  private[graft] def md5Variant(userId: Long): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
    val hex = h.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % 2).toInt
  }

  /** STREAMING SEQUENTIAL A/B MONITOR — q_group_seq's online twin: one
    * constant-size state cell (six int64 moments, both arms) absorbs
    * each micro-batch's events and emits the cumulative Welch z vs the
    * same flat 2.413 boundary after every batch. Because the moments
    * are INTEGER sums (cents), state is exact and order-free: after any
    * batching of the same events, the final emitted z BIT-MATCHES the
    * batch query's last-week row (StreamsSpec pins this). Single
    * constant key: the state is 48 bytes total, so keying by a constant
    * is the correct shape (no skew concern — there is exactly one
    * monitor); the per-event work (hash split + cents floor) is
    * embarrassingly parallel upstream of the one-row state. */
  def seqMonitor(events: Dataset[Ev], boundary: Double = 2.413)
      : Dataset[SeqOut] = {
    import events.sparkSession.implicits._
    def update(key: Int, rows: Iterator[Ev],
        state: GroupState[SeqS]): Iterator[SeqOut] = {
      var s = state.getOption.getOrElse(SeqS(0L, 0L, 0L, 0L, 0L, 0L))
      rows.foreach { e =>
        val cents = math.floor(e.value * 100.0 + 0.5).toLong
        if (md5Variant(e.user_id) == 0)
          s = s.copy(n0 = s.n0 + 1, s0 = s.s0 + cents,
            ss0 = s.ss0 + cents * cents)
        else
          s = s.copy(n1 = s.n1 + 1, s1 = s.s1 + cents,
            ss1 = s.ss1 + cents * cents)
      }
      state.update(s)
      val z =
        if (s.n0 > 1 && s.n1 > 1) {
          val (n0, n1) = (s.n0.toDouble, s.n1.toDouble)
          val v0 = (n0 * s.ss0.toDouble - s.s0.toDouble * s.s0.toDouble) /
            (n0 * (n0 - 1.0))
          val v1 = (n1 * s.ss1.toDouble - s.s1.toDouble * s.s1.toDouble) /
            (n1 * (n1 - 1.0))
          val raw = (s.s1.toDouble / n1 - s.s0.toDouble / n0) /
            math.sqrt(v1 / n1 + v0 / n0)
          Some(math.floor(raw * 1e6 + 0.5) / 1e6)
        } else None
      Iterator.single(
        SeqOut(s.n0, s.n1, z, z.map(v => math.abs(v) > boundary)))
    }
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class HoltOut(event_type: String, event_id: Long,
      at_ts: Timestamp, value: Double, forecast: Double, residual: Double,
      level: Double, trend: Double)

  /** STREAMING HOLT SMOOTHER — the online twin of q_holt: per key,
    * maintain (level, trend) with the double-exponential update
    * l' = αx + (1−α)(l+b), b' = β(l'−l) + (1−β)b and emit each
    * observation with its one-step-ahead forecast (l+b BEFORE absorbing
    * the value) and residual — the rolling forecast monitor behind
    * q_backtest_snaive-style accuracy tracking, in O(1) state per key.
    * Initialization matches the batch fold exactly (l₀ = x₀, b₀ = 0),
    * so a replayed stream bit-matches q_holt's terminal (l, b) on the
    * same sequence — pinned by the golden test. Deterministic per-batch
    * ordering as in [[driftCusum]]. */
  def holtSmooth(events: Dataset[Ev], alpha: Double = 0.5,
      beta: Double = 0.3, watermarkDelay: String = "10 minutes")
      : Dataset[HoltOut] = {
    import events.sparkSession.implicits._

    def update(key: String, rows: Iterator[Ev],
        state: GroupState[HoltS]): Iterator[HoltOut] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var s = state.getOption.getOrElse(HoltS(0L, 0.0, 0.0))
        var out = List.empty[HoltOut]
        sorted.foreach { e =>
          val s2 =
            if (s.n == 0L) HoltS(1L, e.value, 0.0)
            else {
              val f = s.level + s.trend
              val l2 = alpha * e.value + (1 - alpha) * f
              HoltS(s.n + 1, l2,
                beta * (l2 - s.level) + (1 - beta) * s.trend)
            }
          val forecast = if (s.n == 0L) e.value else s.level + s.trend
          out ::= HoltOut(key, e.event_id, e.ts, e.value,
            forecast, e.value - forecast, s2.level, s2.trend)
          s = s2
        }
        state.update(s)
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Open-interval occupancy state: the current coalesced interval
    * [curStart, curEnd) plus the covered total of all CLOSED intervals —
    * four numbers per user, regardless of stream length. */
  final case class OccS(curStart: Long, curEnd: Long, closed: Long, n: Long)

  final case class OccOut(user_id: Long, event_id: Long,
      at_ts: Timestamp, covered_s: Long, n_events: Long)

  /** STREAMING INTERVAL UNION (occupancy) — the online twin of
    * q_interval_union: per user, each event spans [ts, ts + max(1,
    * round(value)) s); the state keeps ONE open coalesced interval plus
    * the closed-coverage total (O(1) per key — the sweep needs nothing
    * else because events arrive time-ordered within a key), emitting
    * the running covered seconds after each event. On a replayed
    * stream the terminal covered_s per user equals the batch query's
    * integer exactly — pinned by the golden test. Late events BEHIND
    * the open interval's start are clamped to it (the watermark bounds
    * how late they can be); the batch query is the exact backfill. */
  def intervalUnion(events: Dataset[Ev],
      watermarkDelay: String = "10 minutes"): Dataset[OccOut] = {
    import events.sparkSession.implicits._

    def update(key: Long, rows: Iterator[Ev],
        state: GroupState[OccS]): Iterator[OccOut] = {
      if (state.hasTimedOut) Iterator.empty
      else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var s = state.getOption.getOrElse(OccS(0L, 0L, 0L, 0L))
        var out = List.empty[OccOut]
        sorted.foreach { e =>
          val st = e.ts.getTime / 1000L
          val dur = math.max(1L, math.round(e.value))
          val en = st + dur
          s =
            if (s.n == 0L) OccS(st, en, 0L, 1L)
            else if (st > s.curEnd)
              OccS(st, en, s.closed + (s.curEnd - s.curStart), s.n + 1)
            else
              OccS(s.curStart, math.max(s.curEnd, en), s.closed, s.n + 1)
          out ::= OccOut(key, e.event_id, e.ts,
            s.closed + (s.curEnd - s.curStart), s.n)
        }
        state.update(s)
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Append the stream to a parquet directory with exactly-once file-sink
    * semantics (the sink's transaction log in `checkpoint` makes replays
    * idempotent). The durable landing path for raw events at scale —
    * readers see only committed files. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()

  /** Keep-latest dedup of one micro-batch (within-batch ties broken by
    * the version column only — the merge handles cross-batch versions). */
  private def latestPerKey(batch: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Streaming upsert via foreachBatch: every micro-batch is keep-latest
    * deduped (within the batch) and merged into the parquet snapshot at
    * `path` with [[graft.operators.Upsert.mergeByKey]] — the streaming
    * materialized-view pattern without a table format. foreachBatch gives
    * at-least-once; the merge is idempotent by key+version, so replayed
    * batches converge to the same snapshot.
    *
    * All file manipulation goes through the Hadoop [[FileSystem]] bound to
    * `path`, so the same code runs against local disk (`file:`), HDFS, or
    * an object store — never `java.io.File`, which silently breaks off
    * the local filesystem. The full-snapshot stage-and-swap is the small
    * snapshot's path; when the snapshot outgrows one rewrite, use
    * [[upsertToPartitionedParquet]], which rewrites only dirty partitions. */
  def upsertToParquet(df: DataFrame, path: String, checkpoint: String,
      keyCols: Seq[String], versionCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val latest = latestPerKey(batch, keyCols, versionCol)
        val target = new org.apache.hadoop.fs.Path(path)
        val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(target))
            graft.operators.Upsert.mergeByKey(
              spark.read.parquet(path), latest, keyCols, versionCol)
          else latest
        // stage-and-swap: write the new snapshot next to the old one and
        // rename into place — never materialize on the driver, never read
        // and overwrite the same directory in one job
        val staging = new org.apache.hadoop.fs.Path(path + "__staging")
        merged.write.mode("overwrite").parquet(staging.toString)
        fs.delete(target, true)
        if (!fs.rename(staging, target))
          throw new java.io.IOException(
            s"rename $staging -> $target failed on ${fs.getScheme}")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Partitioned streaming upsert: the scale form of [[upsertToParquet]].
    * Each micro-batch merges ONLY the partitions it touches — the base
    * snapshot is semi-joined to the batch's distinct partition values
    * (broadcast; a micro-batch touches few partitions), merged keep-latest,
    * and written back with dynamic partition overwrite. A 100 TB snapshot
    * with a daily delta rewrites ~a day of partitions, not the table.
    * The touched base slice is localCheckpoint'd to cut the self-overwrite
    * lineage (read-and-rewrite of the same directory in one micro-batch).
    * Keys must not migrate across partition values (partition columns are
    * part of the key's identity), the standard lake-upsert contract. */
  def upsertToPartitionedParquet(df: DataFrame, path: String,
      checkpoint: String, keyCols: Seq[String], versionCol: String,
      partitionCols: Seq[String])
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val latest = latestPerKey(batch, keyCols, versionCol)
        val target = new org.apache.hadoop.fs.Path(path)
        val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(target)) {
            val touched = latest.select(partitionCols.map(col): _*).distinct()
            val baseTouched = spark.read.parquet(path)
              .join(broadcast(touched), partitionCols, "left_semi")
              .localCheckpoint(true)
            graft.operators.Upsert.mergeByKey(
              baseTouched, latest, keyCols, versionCol)
          } else latest
        graft.operators.Upsert.overwritePartitions(merged, path, partitionCols)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
