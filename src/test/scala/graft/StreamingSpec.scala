package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streaming windowed agg (availableNow) equals batch computation") {
    val stream = EventStreams.readEventStream(spark, Sf)
    val q = EventStreams.windowedAgg(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("win_agg").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("win_agg")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    // same transform on the batch DataFrame (watermark is a no-op there)
    val batch = EventStreams.windowedAgg(Tables.events(spark, Sf))
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    // append mode only emits windows closed by the watermark; every
    // emitted window must match batch, and most windows must be emitted
    assert(got.subsetOf(batch))
    assert(got.size >= (batch.size * 0.8).toInt, s"${got.size}/${batch.size}")
  }

  test("streaming trending top-k equals the batch cut on every closed " +
      "window (exact, deterministic)") {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, Long, Long)]
    val q = EventStreams.trendingTopK(
      EventStreams.windowedUserCounts(
        EventStreams.readEventStream(spark, Sf)), k = 3) { top =>
      buf.synchronized {
        buf ++= top.collect().map(r =>
          (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      }
    }
    q.awaitTermination(120000)
    val got = buf.toSet
    val emittedWindows = got.map(_._1)
    assert(emittedWindows.nonEmpty)
    val batch = graft.plans.TopK.perKey(
        EventStreams.windowedUserCounts(Tables.events(spark, Sf)),
        keys = Seq("window_start"),
        order = Seq(("n_events", true), ("user_id", false)), k = 3)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .filter(x => emittedWindows.contains(x._1)).toSet
    assert(got == batch)
    assert(got.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("streaming dedup with watermark drops repeat keys") {
    val stream = EventStreams.readEventStream(spark, Sf)
    val q = EventStreams.streamingDedup(stream, Seq("user_id"))
      .select("user_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_out").count()
    val distinctUsers = Tables.events(spark, Sf)
      .select("user_id").distinct().count()
    assert(got == distinctUsers)
  }

  test("stream-static dim enrichment equals the batch join, drops " +
      "no events") {
    val dim = Tables.customer(spark, Sf)
      .select(col("c_custkey"), col("c_name"))
    val q = EventStreams.enrichWithDim(
        EventStreams.readEventStream(spark, Sf), dim,
        "user_id", "c_custkey")
      .select("event_id", "user_id", "c_name")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("enrich_out").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val batch = EventStreams.enrichWithDim(
        Tables.events(spark, Sf), dim, "user_id", "c_custkey")
      .select("event_id", "user_id", "c_name").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == batch)
    assert(got.size == Tables.events(spark, Sf).count())
    assert(got.values.exists(_.isDefined)) // enrichment actually fires
  }

  test("stream-stream time-bounded join (engine API) matches batch") {
    def sides(df: org.apache.spark.sql.DataFrame) = {
      val p = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val c = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      (p, c)
    }

    val (ps, cs) = sides(EventStreams.readEventStream(spark, Sf))
    val q = EventStreams.timeBoundedJoin(ps, "p_user", "p_ts",
        cs, "c_user", "c_ts", lookback = "10 MINUTES", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val (pb, cb) = sides(Tables.events(spark, Sf))
    val batchCount = EventStreams.timeBoundedJoin(pb, "p_user", "p_ts",
      cb, "c_user", "c_ts", lookback = "10 MINUTES", watermark = "1 hour")
      .count()
    assert(spark.table("ssj_out").count() == batchCount)
    assert(batchCount > 0)
  }

  test("approx distinct sketch lands within 5% of exact") {
    val ev = Tables.events(spark, Sf)
    val exact = ev.select("user_id").distinct().count().toDouble
    val approx = ev.agg(approx_count_distinct("user_id"))
      .first().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("batch sessionization splits on the 30-minute gap") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L),
      (2L, t("2024-01-01 10:10:00"), 7L),
      (3L, t("2024-01-01 11:30:00"), 7L), // 80-min gap → new session
      (4L, t("2024-01-01 09:00:00"), 8L))
      .toDF("event_id", "ts", "user_id")
    val sessions = EventStreams.sessionizeBatch(ev).collect()
    assert(sessions.length == 3)
    val u7 = sessions.filter(_.getAs[Long]("user_id") == 7L)
      .sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
    assert(u7.length == 2)
    assert(u7(0).getAs[Long]("n_events") == 2L)
    assert(u7(1).getAs[Long]("n_events") == 1L)
  }

  test("stateful sessionization emits the closed sessions") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      Event(1L, t("2024-01-01 10:00:00"), 7L, "click", 1.0),
      Event(2L, t("2024-01-01 10:10:00"), 7L, "click", 1.0),
      Event(3L, t("2024-01-01 12:00:00"), 7L, "click", 1.0),
      Event(4L, t("2024-01-01 13:00:00"), 7L, "click", 1.0)).toDS()
    // batch (non-streaming) execution of the stateful function: all
    // groups flush, the still-open trailing session stays in state
    val sessions = EventStreams.sessionizeStateful(ev).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.n_events).sorted.toSeq == Seq(1L, 2L))
  }

  test("streaming sessionization flushes an idle session via event-time timeout") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sess").toString

    def addFile(name: String, rows: Seq[Event]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_w")
      rows.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(srcDir, name))
    }

    // file 1: one open session for user 7; file 2 (later mod time): a
    // much-later event from ANOTHER user advances the watermark past
    // user 7's end + gap, so only the event-time timeout can flush it
    addFile("f1.parquet", Seq(
      Event(1L, t("2024-01-01 10:00:00"), 7L, "click", 1.0),
      Event(2L, t("2024-01-01 10:10:00"), 7L, "click", 1.0)))
    Thread.sleep(1500)
    addFile("f2.parquet", Seq(
      Event(3L, t("2024-01-01 18:00:00"), 8L, "click", 1.0)))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .as[Event]
    val q = EventStreams.sessionizeStateful(stream, "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("sess_out")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    // user 7's idle session flushed by the timeout; user 8's session is
    // still open (watermark hasn't passed its end + gap) and unemitted
    assert(got.toSeq == Seq((7L, 2L)), got.mkString(","))
  }

  test("streaming deduped ingest: one survivor per dup class across " +
      "micro-batches, fresh docs admitted") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ingest").toString
    val srcDir = s"$root/src"
    val tableDir = s"$root/corpus"
    val base = Tables.documents(spark, Sf)
      .select("doc_id", "text").filter(col("doc_id") < 30)
    // file 1: base docs; file 2: near-dup copies (first token dropped,
    // offset ids); file 3: fresh disjoint-vocabulary docs — written as
    // separate files, streamed one file per micro-batch
    base.coalesce(1).write.parquet(s"$srcDir/f=1")
    base.select((col("doc_id") + 2000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      .coalesce(1).write.parquet(s"$srcDir/f=2")
    (0 until 10).map(i => (3000000L + i,
        s"zz$i yy$i xx$i ww$i vv$i uu$i tt$i ss$i"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/f=3")

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, f INT")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = graft.streaming.CorpusIngest.dedupedIngest(stream, tableDir)
    q.awaitTermination(180000)

    val admitted = graft.sources.ParquetUpsertSink.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // one survivor per dup CLASS: each base doc + its perturbed copy,
    // collapsed further by the testdata's own natural near-dups inside
    // base (docs 8/12 share their shingle set at sf0.001) — class count
    // = connected components of the base near-dup relation
    val naturalPairs = graft.operators.DedupOps
      .minhashCandidates(base, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    naturalPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val baseIds = base.collect().map(_.getLong(0))
    val nClasses = baseIds.map(find).distinct.length.toLong
    assert(admitted.count(id => id < 30 || (id >= 2000000L && id < 3000000L))
      == nClasses, s"dup classes: ${admitted.size}")
    assert((0 until 10).forall(i => admitted.contains(3000000L + i)))
    assert(admitted.size == nClasses + 10)
  }

  test("streaming dq monitor: per-batch reports with exact ppm, " +
      "idempotent under full replay") {
    import graft.operators.StatsOps
    val root = java.nio.file.Files
      .createTempDirectory("graft_dq").toString
    val srcDir = s"$root/src"; val repDir = s"$root/report"
    // batch f=1 clean; batch f=2: one null key, one duplicate id, one
    // orphan key
    Seq((1L, Option(10L)), (2L, Option(20L)), (3L, Option(30L)),
      (4L, Option(40L)))
      .toDF("id", "k").coalesce(1).write.parquet(s"$srcDir/f=1")
    Seq((5L, Option(50L)), (6L, None: Option[Long]), (6L, Option(70L)),
      (8L, Option(99L)))
      .toDF("id", "k").coalesce(1).write.parquet(s"$srcDir/f=2")
    val dim = Seq(10L, 20L, 30L, 40L, 50L, 70L).toDF("dk")
    val checks = Seq(StatsOps.Completeness("k"), StatsOps.Uniqueness("id"),
      StatsOps.Referential("k", dim, "dk"))
    def run(): Unit = {
      val stream = spark.readStream.schema("id LONG, k LONG, f INT")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = graft.streaming.DqMonitor.monitored(stream, checks, repDir)
      q.awaitTermination(120000)
    }
    run()
    val rep = graft.sources.ParquetUpsertSink.read(spark, repDir).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("check_name"))
        -> ((r.getAs[Long]("metric_ppm"), r.getAs[Boolean]("pass")))).toMap
    assert(rep.size == 6)
    assert(rep((0L, "completeness_k")) == ((1000000L, true)))
    assert(rep((0L, "uniqueness_id")) == ((1000000L, true)))
    assert(rep((0L, "referential_k")) == ((1000000L, true)))
    assert(rep((1L, "completeness_k")) == ((750000L, false)))
    assert(rep((1L, "uniqueness_id")) == ((750000L, false)))
    assert(rep((1L, "referential_k")) == ((500000L, false)))
    // full replay (fresh query, same source): same batch ids, keyed
    // insert-new-only appends nothing
    run()
    val again = graft.sources.ParquetUpsertSink.read(spark, repDir)
      .collect()
    assert(again.length == 6, s"replay appended rows: ${again.length}")
  }

  test("streaming percentile monitor equals the batch DDSketch path " +
      "on every closed window and tracks exact percentiles within 1%") {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, String, Long, Long, Long, Long)]
    val q = EventStreams.percentileMonitor(
      EventStreams.readEventStream(spark, Sf)) { out =>
      buf.synchronized {
        buf ++= out
          .select("window_start", "event_type", "n", "p50_units",
            "p95_units", "p99_units")
          .collect().map(r => (r.getTimestamp(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      }
    }
    q.awaitTermination(120000)
    val got = buf.toSet
    assert(got.nonEmpty)
    val emitted = got.map(x => (x._1, x._2))
    val batch = EventStreams.percentilesFromSketch(
        EventStreams.windowedSketches(Tables.events(spark, Sf)))
      .select("window_start", "event_type", "n", "p50_units",
        "p95_units", "p99_units")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .filter(x => emitted.contains((x._1, x._2))).toSet
    assert(got == batch)
    // emitted estimates track the exact per-window percentiles
    val exact = Tables.events(spark, Sf)
      .selectExpr("window(ts, '1 hour').start AS w", "event_type",
        "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS LONG) AS u")
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)),
        r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
      .toMap
    got.foreach { case (w, t, n, p50, p95, p99) =>
      val xs = exact((w, t))
      assert(n == xs.length.toLong)
      for ((qq, est) <- Seq((0.5, p50), (0.95, p95), (0.99, p99))) {
        val ex = xs(math.max(1, math.ceil(qq * xs.length).toInt) - 1)
        assert(math.abs(est - ex) <= 0.011 * ex + 1,
          s"($w,$t) q=$qq est=$est exact=$ex")
      }
    }
  }

  test("streaming exact-distinct monitor equals batch countDistinct " +
      "EXACTLY on every closed window (bitmap state, zero drift)") {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, String, Long, Long)]
    val q = EventStreams.distinctMonitor(
      EventStreams.readEventStream(spark, Sf)) { out =>
      buf.synchronized {
        buf ++= out
          .select("window_start", "event_type", "distinct_users",
            "n_events")
          .collect().map(r => (r.getTimestamp(0), r.getString(1),
            r.getLong(2), r.getLong(3)))
      }
    }
    q.awaitTermination(120000)
    val got = buf.toSet
    assert(got.nonEmpty)
    val emitted = got.map(x => (x._1, x._2))
    val batch = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("window(ts, '1 hour').start AS w", "event_type",
        "user_id")
      .groupBy("w", "event_type")
      .agg(countDistinct(col("user_id")).as("d"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      .filter(x => emitted.contains((x._1, x._2))).toSet
    assert(got == batch, "streaming bitmap distinct must be EXACT")
  }

  test("stateful rate limiter (batch execution) equals the q228 fold") {
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    val got = EventStreams.rateLimitStateful(ev)
      .collect().map(a => (a.user_id,
        (a.n_events, a.n_admitted, a.n_denied, a.final_units))).toMap
    val exp = graft.operators.RelationalOps
      .q228RateLimitReplay(spark, Sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_admitted"),
          r.getAs[Long]("n_denied"), r.getAs[Long]("final_units"))))
      .toMap
    assert(got == exp, "batch execution of the streaming limiter must " +
      "replay q228 exactly")
  }

  test("streaming rate limiter carries bucket state across time-ordered " +
      "micro-batches and matches the batch replay") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rl").toString
    def addFile(name: String, rows: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_rl_w")
      rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(srcDir, name))
    }
    // three chronological slices of the real event log — the bucket
    // state (tokens + last refill time) must survive batch boundaries
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cuts = ev.selectExpr(
      "percentile_approx(unix_micros(ts), 0.34) AS a",
      "percentile_approx(unix_micros(ts), 0.67) AS b").collect()(0)
    val (ca, cb) = (cuts.getLong(0), cuts.getLong(1))
    addFile("f1.parquet", ev.filter(unix_micros(col("ts")) <= ca))
    Thread.sleep(1200)
    addFile("f2.parquet", ev.filter(unix_micros(col("ts")) > ca &&
      unix_micros(col("ts")) <= cb))
    Thread.sleep(1200)
    addFile("f3.parquet", ev.filter(unix_micros(col("ts")) > cb))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .as[Event]
    val q = EventStreams.rateLimitStateful(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("rl_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // counters are monotone — the max-n_events emission per user is the
    // final state
    val got = spark.table("rl_out")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("n_admitted"),
        col("n_denied"), col("final_units"))).as("s"))
      .select(col("user_id"), col("s.*"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exp = graft.operators.RelationalOps
      .q228RateLimitReplay(spark, Sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_admitted"),
          r.getAs[Long]("n_denied"), r.getAs[Long]("final_units"))))
      .toMap
    assert(got == exp, "time-ordered streaming replay must equal the " +
      "batch token-bucket fold")
  }

  private def q256Rows(): Map[Long, (Long, Long, String, Option[Long],
      Long)] =
    graft.operators.StatsOps.q256Sprt(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))).toMap

  test("stateful SPRT (batch execution) equals the q256 replay") {
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    val got = EventStreams.sprtStateful(ev)
      .collect().map(s => s.user_id -> ((s.n_obs, s.n_hits, s.decision,
        s.n_at_decision, s.llr_e9))).toMap
    assert(got == q256Rows(), "batch execution of the streaming SPRT " +
      "must replay q256 exactly")
  }

  test("streaming SPRT freezes decisions across time-ordered " +
      "micro-batches and matches the q256 batch replay") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sprt")
      .toString
    def addFile(name: String, rows: org.apache.spark.sql.DataFrame)
        : Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sprt_w")
      rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(srcDir, name))
    }
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cuts = ev.selectExpr(
      "percentile_approx(unix_micros(ts), 0.34) AS a",
      "percentile_approx(unix_micros(ts), 0.67) AS b").collect()(0)
    val (ca, cb) = (cuts.getLong(0), cuts.getLong(1))
    addFile("f1.parquet", ev.filter(unix_micros(col("ts")) <= ca))
    Thread.sleep(1200)
    addFile("f2.parquet", ev.filter(unix_micros(col("ts")) > ca &&
      unix_micros(col("ts")) <= cb))
    Thread.sleep(1200)
    addFile("f3.parquet", ev.filter(unix_micros(col("ts")) > cb))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Event].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .as[Event]
    val q = EventStreams.sprtStateful(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("sprt_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // n_obs is monotone — the max-n_obs emission per user is current
    val got = spark.table("sprt_out")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_obs"), col("n_hits"), col("decision"),
        col("n_at_decision"), col("llr_e9"))).as("s"))
      .select(col("user_id"), col("s.*"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))).toMap
    assert(got == q256Rows(), "time-ordered streaming SPRT must equal " +
      "the q256 first-crossing replay")
  }
}
