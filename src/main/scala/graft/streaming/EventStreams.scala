package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: watermarked windowed
  * aggregation and stateful sessionization. The same transforms run
  * identically on a batch DataFrame (tested batch-vs-stream) — Spark's
  * unified model means the streaming path at scale is the batch logic
  * plus a watermark.
  */
object EventStreams {

  /** Parquet schema for streaming reads (readStream needs it up front).
    * ts is INT64 TIMESTAMP(NANOS) in the files; Spark 4.1+ reads that
    * natively as TIMESTAMP_NTZ at µs precision (the driver data is
    * µs-exact, so nothing truncates), which is what we declare here.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize ts to TimestampType, same rule as Tables.events: a
    * nanos-long divides down to µs; an NTZ read retags under the UTC
    * session timezone (same wall clock, same micros).
    */
  private def withTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => df
    }

  /** The file stream source wants a directory; the testdata dir holds all
    * tables, so filter to the events file.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    withTs(spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))

  /** Tumbling-window counts/sums per event type with a watermark: the
    * streaming form of `groupBy(window(ts), type).agg(...)`. Late data
    * beyond 30 min is dropped; state is bounded — this is what survives
    * an unbounded stream.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact-dedup: drop repeat keys while bounding state with
    * the watermark — the streaming form of the LLM-pipeline exact dedup
    * (state for a key can be evicted once the watermark passes it).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner join bounded in event time: pairs a left row
    * with right rows of the same key whose timestamp falls in
    * [leftTs - lookback, leftTs]. Both sides are watermarked so the
    * join state is bounded — without the time bound (and the watermark)
    * a stream-stream join buffers both streams forever. Column names
    * must be disjoint across the two sides.
    */
  def timeBoundedJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      lookback: String, watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs).between(
            col(leftTs) - expr(s"INTERVAL $lookback"), col(leftTs)))

  /** Stream-static dimension enrichment: every streaming event joined
    * to a STATIC (batch) dimension table — the canonical "attach user/
    * product attributes as events arrive" shape. The static side is
    * broadcast per micro-batch (no stream state, no watermark needed —
    * unlike a stream-stream join there is nothing to buffer), so the
    * stream never shuffles; at production scale the dimension refresh
    * is a re-broadcast, not a state migration. Left join preserves
    * events with no dimension row (dim columns null) — an enrichment
    * must never drop facts.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  // ---- Sessionization ---------------------------------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)
  // NOT private: the streaming state encoder's generated code must be
  // able to resolve the accessors (batch execution never serializes
  // state, so the visibility problem only appears on a real stream)
  case class SessionState(start: Long, end: Long, n: Long)

  val SessionGapMs: Long = 30 * 60 * 1000

  /** Batch-mode sessionization (ground truth for the stateful variant):
    * a session breaks when the gap to the previous event exceeds 30 min.
    * Pure window functions — shuffle keyed by user only.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > SessionGapMs)
          .cast("long"))
      .withColumn("session_no", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
  }

  /** Streaming sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout: one state object per user, a session is emitted
    * when the gap closes it, and an idle session is flushed when the
    * watermark passes its end + gap — on a live stream, NoTimeout state
    * for a user who never returns is never emitted and never evicted
    * (unbounded state). Batch execution of the same function (where
    * timeouts don't exist) skips the timeout registration and flushes
    * nothing early — identical session boundaries, tested both ways.
    */
  def sessionizeStateful(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, if (streaming) GroupStateTimeout.EventTimeTimeout
          else GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap with no new events: the session
            // can never be extended — emit and evict
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.end), st.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.end <= SessionGapMs =>
                  cur = Some(st.copy(end = t, n = st.n + 1))
                case Some(st) =>
                  out += Session(userId, new java.sql.Timestamp(st.start),
                    new java.sql.Timestamp(st.end), st.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              if (streaming) state.setTimeoutTimestamp(st.end + SessionGapMs)
            }
            out.result().iterator
          }
      }
  }

  // ---- Rate limiting ----------------------------------------------------

  // NOT private (same encoder-visibility rule as SessionState)
  case class LimiterState(started: Boolean, tokens: Long, lastUs: Long,
      admitted: Long, denied: Long)
  case class Admission(user_id: Long, n_events: Long, n_admitted: Long,
      n_denied: Long, final_units: Long)

  /** q228's token bucket as LIVE streaming state — the enforcement
    * twin of the batch replay (RelationalOps.q228RateLimitReplay, which
    * answers the planning question offline): one bucket per user via
    * mapGroupsWithState, capacity 3 tokens, 1 token/day refill, 1
    * token/event, IDENTICAL integer µtoken arithmetic (refill =
    * Δµs / 86400, truncating — non-negative operands). Update mode:
    * each micro-batch emits the user's running admission counters;
    * counters are monotone, so the max-n_events row per user is the
    * current truth. Within a batch events order by (ts, event_id);
    * across batches the order is ingestion order — causal on a live
    * stream, and exact batch-replay parity needs time-ordered files
    * (the suite replays day-split files and asserts equality with
    * q228's fold). State is one 5-field struct per user — bounded by
    * the user population, the same state budget as sessionization.
    */
  def rateLimitStateful(events: Dataset[Event]): Dataset[Admission] = {
    import events.sparkSession.implicits._
    val Cap = 3000000L; val Cost = 1000000L; val RefillDiv = 86400L
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[LimiterState, Admission](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[LimiterState]) =>
          var st = state.getOption
            .getOrElse(LimiterState(false, 0L, 0L, 0L, 0L))
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            st = if (!st.started)
              LimiterState(true, Cap - Cost, us, 1L, 0L)
            else {
              val tk1 = math.min(Cap,
                st.tokens + (us - st.lastUs) / RefillDiv)
              if (tk1 >= Cost)
                LimiterState(true, tk1 - Cost, us, st.admitted + 1,
                  st.denied)
              else LimiterState(true, tk1, us, st.admitted,
                st.denied + 1)
            }
          }
          state.update(st)
          Admission(uid, st.admitted + st.denied, st.admitted, st.denied,
            st.tokens)
      }
  }

  // ---- Sequential testing ----------------------------------------------

  // NOT private (same encoder-visibility rule as SessionState)
  case class SprtState(nObs: Long, nHits: Long, llr: Long,
      decision: String, nAt: Long, llrStop: Long)
  case class SprtStatus(user_id: Long, n_obs: Long, n_hits: Long,
      decision: String, n_at_decision: Option[Long], llr_e9: Long)

  /** q256's Wald SPRT as LIVE streaming state — the early-stopping
    * monitor an experimentation platform actually runs (decide each
    * user's H₀ p ≤ 0.3 vs H₁ p ≥ 0.5 the moment the log-likelihood
    * random walk crosses ±ln 19, then FREEZE — later events update
    * counters but never reopen the decision, exactly like the batch
    * replay's first-crossing rule). Same FixedLn integer increments,
    * same boundaries, so batch execution replays q256 row-for-row and
    * the file-stream run must carry (llr, decision) state across
    * micro-batches. State = one 6-field struct per user; update-mode
    * emissions are monotone in n_obs, so max-n_obs per user is the
    * current truth (the q228 limiter contract).
    */
  def sprtStateful(events: Dataset[Event]): Dataset[SprtStatus] = {
    import events.sparkSession.implicits._
    val l1 = graft.functions.FixedLn.lnE9(5, 3)
    val l0 = -graft.functions.FixedLn.lnE9(7, 5)
    val bound = graft.functions.FixedLn.lnE9(19, 1)
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SprtState, SprtStatus](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SprtState]) =>
          var st = state.getOption
            .getOrElse(SprtState(0L, 0L, 0L, "continue", 0L, 0L))
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val x = if (e.event_type == "purchase") 1L else 0L
            val llr = st.llr + (if (x == 1L) l1 else l0)
            val (dec, nAt, lStop) =
              if (st.decision != "continue")
                (st.decision, st.nAt, st.llrStop)
              else if (llr >= bound) ("accept_h1", st.nObs + 1, llr)
              else if (llr <= -bound) ("accept_h0", st.nObs + 1, llr)
              else ("continue", 0L, 0L)
            st = SprtState(st.nObs + 1, st.nHits + x, llr, dec, nAt,
              lStop)
          }
          state.update(st)
          SprtStatus(uid, st.nObs, st.nHits, st.decision,
            if (st.decision == "continue") None else Some(st.nAt),
            if (st.decision == "continue") st.llr else st.llrStop)
      }
  }

  /** 144 (stage 1). Tumbling-hour per-user event counts with a
    * watermark — the streaming aggregate feeding [[trendingTopK]].
    * State is (open windows × active users) and the watermark evicts
    * closed windows, so it survives an unbounded stream.
    */
  def windowedUserCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("user_id"),
        col("n_events"))

  /** 144 (stage 2). Streaming trending top-k: the k noisiest users per
    * closed hour — the "trending now"/abuse monitor. Append mode emits
    * a window only once the watermark CLOSES it, so each window's
    * counts arrive complete in exactly one micro-batch; the top-k cut
    * is then a per-batch [[graft.plans.TopK.perKey]] heap inside
    * foreachBatch — ranking never runs on open state, so the result is
    * exact and deterministic (count desc, user_id tie-break) and
    * equals the batch computation over the same closed windows. No
    * driver-side loop: each batch's cut is one bounded distributed
    * job; `sink` receives ≤ k rows per closed window.
    */
  def trendingTopK(counts: DataFrame, k: Int)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    counts.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.plans.TopK.perKey(batch, keys = Seq("window_start"),
          order = Seq(("n_events", true), ("user_id", false)), k = k))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming percentile monitor: hourly p50/p95/p99 of `value` per
    * event type via the DETERMINISTIC DDSketch bucket aggregate
    * (`functions/DdSketch.scala`) — the streaming face of the q176
    * rollup, and the thing a latency SLO dashboard actually runs.
    * The sketch's element-wise-add merge is exactly what a streaming
    * aggregation needs: partials combine per micro-batch and across
    * state updates in ANY order with zero drift, so stream output ≡
    * the batch computation over the same closed windows
    * (suite-asserted). Watermark bounds state; append mode emits each
    * window once, closed. The bucket array is 16 KB per open
    * (window, type) cell — bounded state, RocksDB-friendly.
    */
  def windowedSketches(events: DataFrame): DataFrame = {
    val dd = udaf(new graft.functions.DdSketchAgg,
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .filter(col("value").isNotNull)
      .withColumn("u",
        (col("value").cast("decimal(18,4)") * 10000).cast("long"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(dd(col("u")).as("sk"), count(lit(1)).cast("long").as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("sk"), col("n"))
  }

  /** Start the monitor: closed windows' sketches arrive per batch
    * (append mode), and the percentile extraction runs in foreachBatch
    * — a BATCH computation on the bounded closed-window artifact (the
    * trendingTopK shape; window functions after a streaming aggregate
    * are not expressible inside the continuous plan).
    */
  def percentileMonitor(events: DataFrame)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowedSketches(events).writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(percentilesFromSketch(batch))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming EXACT windowed distinct users — the q161/q181 chunked
    * bitmap algebra as streaming state, where the row-48 HLL variant
    * only estimates: one 1024-word OR-mergeable buffer per (window,
    * type, occupied 2¹⁶-chunk of the user-id space), watermark-bounded
    * like any windowed aggregate; micro-batch partials combine in any
    * order (word-wise OR is commutative ⇒ zero drift, stream ≡ batch
    * on closed windows). State cost ∝ occupied chunks, never the
    * domain — the same scale story as the batch operator.
    */
  def windowedDistinctChunks(events: DataFrame): DataFrame = {
    val bm = udaf(new graft.functions.BitmapAgg(1L << 16),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .filter(col("user_id").isNotNull)
      .withColumn("_chunk", shiftrightunsigned(col("user_id"), 16))
      .withColumn("_off", col("user_id").bitwiseAND(lit(65535L)))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        col("_chunk"))
      .agg(bm(col("_off")).as("bits"), count(lit(1)).cast("long").as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("_chunk"), col("bits"), col("n"))
  }

  /** Distinct counts from the closed-window chunk artifact — batch
    * work in foreachBatch (the percentileMonitor shape): per-chunk
    * popcounts SUM exactly because chunks partition the key domain.
    */
  private[graft] def distinctFromChunks(agg: DataFrame): DataFrame = {
    def pop(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, w => bit_count(w).cast("long")), lit(0L),
        (acc, x) => acc + x)
    agg
      .withColumn("_pop", pop(col("bits")))
      .groupBy(col("window_start"), col("event_type"))
      .agg(sum(col("_pop")).cast("long").as("distinct_users"),
        sum(col("n")).cast("long").as("n_events"))
  }

  /** Start the exact-distinct monitor: closed windows' chunk bitmaps
    * arrive per batch (append mode), popcount rollup runs in
    * foreachBatch on the bounded artifact.
    */
  def distinctMonitor(events: DataFrame)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowedDistinctChunks(events).writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(distinctFromChunks(batch))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Nearest-rank p50/p95/p99 from a DDSketch bucket-count column
    * `sk` with count column `n`, correlated by the NATURAL key columns
    * (window_start, event_type) — a synthetic monotonically-increasing
    * id would be re-evaluated nondeterministically on the two sides of
    * the self-join and scramble it. Posexplode the bounded 2048-bucket
    * artifact, per-key running sum, first bucket reaching ⌈q·n⌉ —
    * exact over the artifact, never over raw rows.
    */
  private[graft] def percentilesFromSketch(agg: DataFrame): DataFrame = {
    val keys = Seq("window_start", "event_type")
    val kc = keys.map(col)
    val buckets = agg
      .select(kc ++ Seq(col("n"),
        posexplode(col("sk")).as(Seq("pos", "c"))): _*)
      .filter(col("c") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(kc: _*).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = buckets.withColumn("cum", sum(col("c")).over(w))
    def est(c: org.apache.spark.sql.Column) =
      when(c === 0, lit(0L)).otherwise(
        round(lit(2.0) * pow(lit(graft.functions.DdSketch.Gamma), c) /
          lit(graft.functions.DdSketch.Gamma + 1.0), 0).cast("long"))
    def firstBucket(q: Double, name: String) =
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("pos")))
        .as(name)
    val idx = cum.groupBy(kc: _*)
      .agg(firstBucket(0.50, "_i50"), firstBucket(0.95, "_i95"),
        firstBucket(0.99, "_i99"))
    agg.join(idx, keys)
      .withColumn("p50_units", est(col("_i50")))
      .withColumn("p95_units", est(col("_i95")))
      .withColumn("p99_units", est(col("_i99")))
      .drop("_i50", "_i95", "_i99", "sk")
  }
}
