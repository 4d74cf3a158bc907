package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's relational/ETL capabilities re-expressed as
  * declarative Spark programs over the TPC-H-ish test tables.
  *
  * Reference capabilities covered here (SURVEY.md §2 rows 1–22):
  * column-select extracts (api_extract.py:221-225), predicate filters
  * (api_extract.py:217), derived flags (api_extract.py:212), concat keys
  * (api_extract.py:216), timestamp parse with coercion
  * (api_extract.py:213-214), season windows (helper_functions.py:7-85),
  * incremental loads (etl_pipeline_script.py:40-48,128-137), MERGE upserts
  * (db_ops.py:62-148), purge cascades (db_ops.py:53-59), and the SQL
  * analytics views/procs (sql/db_creation_script.sql:185-242).
  *
  * Scale notes: every incremental op is a join (anti/semi) or a window —
  * never a driver-side key set (the reference collects existing keys into a
  * Python set at etl_pipeline_script.py:43; at 100 TB that is a driver OOM).
  * Dimension joins are explicitly broadcast. Top-K filters to the target
  * group before any sort so no global sort of the fact table ever happens.
  */
object RelationalOps {

  /** 1. Scan + projection — column pruning must reach the parquet reader. */
  def q01ScanProject(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderpriority")

  /** 2. Predicate filter (reference: game_mode == 'pathOfLegend'). */
  def q02Filter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")

  /** 3. Derived boolean column (reference: is_win = crowns > opp_crowns). */
  def q03DerivedFlag(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) > 30000)
        .as("high_value"))

  /** 4. String concat surrogate key (reference: match_key = time_id). */
  def q04ConcatKey(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      concat(date_format(col("ts"), "yyyyMMddHHmmss"), lit("_"),
        col("user_id")).as("match_key"))

  /** 5. Timestamp parse with explicit format + coerce-to-null
    * (reference: pd.to_datetime(..., errors='coerce')). Rows flagged as
    * 'error' events carry an unparseable string and must become NULL.
    */
  def q05TsParse(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyyMMdd'T'HHmmss.SSSSSS'Z'"
    Tables.events(s, d)
      .select(col("event_id"),
        when(col("event_type") === "error", lit("not-a-timestamp"))
          .otherwise(date_format(col("ts"), fmt)).as("raw_ts"))
      .select(col("event_id"),
        try_to_timestamp(col("raw_ts"), lit(fmt)).as("parsed_ts"))
  }

  /** First Monday of the month containing `monthStart` (a month-truncated
    * timestamp), as a timestamp at the season reset instant 09:05 UTC.
    * Pure column arithmetic — no per-row UDF, no join (the reference loops
    * a pandas frame per row at helper_functions.py:82-84).
    */
  private def seasonStart(monthStart: Column): Column = {
    // dayofweek: Sunday=1 … Saturday=7; Monday=2.
    val firstMonday = date_add(to_date(monthStart),
      (lit(9) - dayofweek(monthStart)) % 7)
    to_timestamp(firstMonday) + expr("INTERVAL 9 HOURS 5 MINUTES")
  }

  /** 6. Season assignment from event time (reference battle_time_to_sid):
    * seasons run first-Monday-of-month 09:05 UTC to the next one; an event
    * before its month's reset belongs to the previous month's season.
    */
  def q06SeasonAssign(s: SparkSession, d: String): DataFrame = {
    val m0 = date_trunc("month", col("ts"))
    Tables.events(s, d).select(
      col("event_id"),
      when(col("ts") >= seasonStart(m0), date_format(m0, "yyyy-MM"))
        .otherwise(date_format(add_months(m0, -1), "yyyy-MM"))
        .as("season_id"))
  }

  /** 7. Union + dedup by key (reference: pd.concat + drop_duplicates).
    * Two overlapping extract windows unioned, one row kept per key.
    */
  def q07UnionDedup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val older = o.filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val newer = o.filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")))
    older.unionByName(newer).dropDuplicates("o_orderkey")
  }

  /** 8. Insert-new-only (reference: keys not in existing table →
    * etl_pipeline_script.py:128-133). Left-anti join, never a collected
    * key set.
    */
  def q08InsertNewOnly(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val existing = Tables.lineitem(s, d).select(col("l_orderkey"))
    o.join(existing, o("o_orderkey") === existing("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
  }

  /** 9. Semi-join membership filter (reference: df[col.isin(keys)]). */
  def q09SemiJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bigParts = Tables.part(s, d).filter(col("p_size") > 45)
      .select(col("p_partkey"))
    li.join(broadcast(bigParts), li("l_partkey") === bigParts("p_partkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  }

  /** 10. Static blocklist filter (reference: dropped_players.json skip). */
  def q10Blocklist(s: SparkSession, d: String): DataFrame = {
    val blocked = Seq(1L, 7L, 13L, 42L, 99L)
    Tables.customer(s, d)
      .filter(!col("c_custkey").isin(blocked: _*))
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** 11. Inner join fact→mapping (reference: match_cards ⋈ key mapping,
    * etl_pipeline_script.py:144).
    */
  def q11InnerJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .select("l_orderkey", "l_linenumber", "l_partkey", "o_custkey",
        "o_orderdate")
  }

  /** 12. Upsert last-write-wins by key (reference MERGE, db_ops.py:62-148).
    * Latest event per user wins; window + row_number, shuffle keyed on the
    * upsert key — the scalable MERGE.
    */
  def q12UpsertLastWins(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_event_type"), col("value").as("last_value"))
  }

  /** 13. Purge cascade by key (reference: DELETE per dropped player,
    * db_ops.py:53-59). Anti-join against the purge set.
    */
  def q13PurgeKeys(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val purged = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    li.join(broadcast(purged), li("l_suppkey") === purged("s_suppkey"),
        "left_anti")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
  }

  /** 14. DISTINCT column extraction (reference: SELECT DISTINCT col,
    * db_ops.py:32-35).
    */
  def q14Distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()

  /** 15. Nested JSON flatten (reference: clan.tag access + battlelog
    * normalization, api_extract.py:39-49,179-196) over events.props.
    */
  def q15JsonFlatten(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** 16. Guarded array element extraction (reference:
    * princess_towers_hp[0]/[1] with length guard, api_extract.py:218-219).
    */
  def q16ArrayGuard(s: SparkSession, d: String): DataFrame = {
    def guarded(i: Int): Column =
      when(size(col("embedding")) >= i, element_at(col("embedding"), i))
        .otherwise(lit(0f)).cast("double")
    Tables.embeddings(s, d).select(
      col("vec_id"), guarded(1).as("e1"), guarded(2).as("e2"))
  }

  /** 17. Array explode to rows (reference: cards-per-match → rows,
    * api_extract.py:230-241).
    */
  def q17Explode(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"), col("v").cast("double").as("val"))

  /** 18. Type cast + null masking (reference: astype(str) + Int64 mask,
    * api_extract.py:129,154-157).
    */
  def q18CastNull(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      col("p_partkey").cast("string").as("pk_str"),
      when(col("p_size") > 40, lit(null)).otherwise(col("p_size"))
        .cast("long").as("size_masked"),
      round(col("p_retailprice") * 100).cast("long").as("retail_cents"))

  /** 19. Top-K within the latest group (reference vw_recent_rankings,
    * sql/db_creation_script.sql:185-195): restrict to max(period) first
    * (broadcast single-row scalar), then sort-limit — no global sort.
    */
  def q19RecentTopK(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("period_m", date_trunc("month", col("o_orderdate")))
    val latest = o.agg(max(col("period_m")).as("m"))
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    val top = o.join(broadcast(latest), col("period_m") === col("m"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
    // global window over the LIMIT-100 artifact — bounded, benign
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("o_totalprice").desc,
          col("o_orderkey"))).cast("long"))
      .select(date_format(col("m"), "yyyy-MM").as("period"),
        col("o_orderkey"), col("c_name"), col("o_totalprice"), col("rank"))
  }

  /** 20. Dimension join view (reference vw_player_clan, sql:197-205):
    * customer ⋈ nation ⋈ region with small dims broadcast.
    */
  def q20DimJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("c_custkey", "c_name", "n_name", "r_name")
  }

  /** 21. Filtered group-by ratio with zero-guard (reference
    * usp_player_win_rate, sql:209-222): per-customer rate of fulfilled
    * orders in a period.
    */
  def q21WinRate(s: SparkSession, d: String): DataFrame =
    winRate(Tables.orders(s, d), since = "1997-01-01")

  /** The PARAMETERIZED win-rate proc shape (reference
    * usp_player_win_rate(@player_tag, @season) —
    * sql/db_creation_script.sql:209-222): season = orders on/after
    * `since`, player = optional single-customer filter (None = every
    * customer, the view shape; Some(k) = the point-lookup proc call).
    * q21 is the gate instantiation (`since=1997-01-01`, all
    * customers); RelationalSpec drives a second (player, season)
    * instantiation against an independent replay.
    */
  def winRate(orders: DataFrame, since: String,
      custkey: Option[Long] = None): DataFrame = {
    val seasonal = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(since)))
    val scoped = custkey.fold(seasonal)(k =>
      seasonal.filter(col("o_custkey") === k))
    scoped
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("wins"))
      .select(col("o_custkey"),
        when(col("n_orders") === 0, lit(null))
          .otherwise(round(lit(100.0) * col("wins") / col("n_orders"), 2))
          .as("win_rate"),
        col("n_orders").cast("long").as("n_orders"))
  }

  /** 41. Table statistics collection (ANALYZE-style): per-column
    * min/max/count/distinct over the fact table in ONE pass — the
    * numbers a cost-based optimizer and a data-quality report both need.
    */
  def q41TableStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_shipdate")).as("min_shipdate"),
      max(col("l_shipdate")).as("max_shipdate"),
      sum(col("l_quantity")).as("sum_qty"))

  /** 42. Running aggregates per key (lag/running-sum window analytics):
    * per customer, each order with its running spend and the gap in days
    * since the previous order.
    */
  def q42RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      // decimal accumulation: float window-sums are order-dependent and
      // engines disagree (DuckDB sums via a segment tree)
      sum(col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double").as("running_spend"),
      datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
        .cast("long").as("days_since_prev"))
  }

  /** 43. Hierarchical totals (ROLLUP): doc counts and char totals per
    * (lang, source), per lang, and grand total in one pass.
    */
  def q43Rollup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** 115. GROUPING SETS with an explicit, non-hierarchical set list —
    * the shape neither ROLLUP (q43's prefix chain) nor CUBE (every
    * subset) can express: (lang × source) detail, per-source totals
    * (ACROSS languages — not a rollup child of lang), and the grand
    * total, in ONE pass. Spark expands the sets with a single Expand
    * node feeding one partial-aggregated shuffle — k set replays of the
    * scan would read the table k times. `grouping_id()` (bit i set ⇔
    * column i aggregated away, matching DuckDB's GROUPING(lang, source))
    * disambiguates a genuinely-null key from a subtotal row — without
    * it the two are indistinguishable in the output.
    */
  def q100GroupingSets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .select("lang", "source", "gid", "n_docs", "total_chars")
  }

  /** 135. Behavioral flow scoring: every user's event stream scored by
    * the MEAN transition probability of its consecutive-event pairs
    * under the corpus-wide Markov model (q113) — the q111 LM-scoring
    * idea applied to behavior: users riding common transitions score
    * high, anomalous flows (bots, broken clients, abuse scripts) sink
    * toward the floor. Same two-stage round-half-up integer ppm as
    * q111 (model ppm per transition type, then the per-user mean), so
    * the whole model-apply pipeline is engine-exact — an anomaly
    * threshold is a mean-probability threshold.
    *
    * The pair table is built ONCE (one user_id-shuffle `lead` window)
    * and feeds both the model aggregate and the scoring join; the
    * model is |types|²-bounded so the scoring join BROADCASTS it — the
    * corpus-scale pair table never shuffles again; the per-user mean
    * is one map-side-combined aggregation.
    */
  def q119FlowScore(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"))
      .localCheckpoint(false)
    val model = pairs
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      .withColumn("c_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"),
        expr("(2000000 * n + c_from) DIV (2 * c_from)").as("p_ppm"))
    pairs.join(broadcast(model), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_transitions"),
        expr("(2 * sum(p_ppm) + count(1)) DIV (2 * count(1))")
          .as("flow_ppm"))
  }

  /** 133. CUBE: every grouping subset of (lang, source) — detail, each
    * one-dimension margin, and the grand total — completing the OLAP
    * grouping family (q43 ROLLUP = the prefix chain, q100 GROUPING
    * SETS = an explicit list, CUBE = the full 2ᵏ lattice). Same single
    * Expand → one partial-aggregated shuffle plan as q100 — the 4
    * subsets never re-scan the table; `grouping_id()` separates a
    * genuinely-null key from a margin row (q100 rule; bit order matches
    * DuckDB `GROUPING(lang, source)`). Aggregates stay integer-exact
    * (counts + a DECIMAL sum of the 4-decimal doubles per the
    * determinism rule).
    */
  def q117Cube(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .cube(col("lang"), col("source"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .select("lang", "source", "gid", "n_docs", "total_chars")

  /** 44. Pivot: events per user pivoted into one column per event type
    * (fixed type list → deterministic schema).
    */
  def q44Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .select(col("user_id") +: types.map(t => col(t).as(s"n_$t")): _*)
  }

  /** 45. Percentiles (exact, linear interpolation) of extended price per
    * return flag — computed as distributed order statistics: rank within
    * group, keep ONLY the two rows flanking each target position, and
    * interpolate. The built-in exact `percentile` aggregate builds and
    * merges a value→count hash map per partition (~200k entries here).
    * Ranking runs on DistributedRank (range partition + parallel local
    * ranks + offsets) because a `PARTITION BY l_returnflag` window has
    * only 3 groups — three reducers would each sort a third of the
    * table at any scale.
    */
  def q45Percentiles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_extendedprice"))
    val targets = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        explode(array(lit(0.5), lit(0.95))).as("p"))
      .withColumn("pos", (col("n") - 1) * col("p"))
      .withColumn("lo_rn", floor(col("pos")).cast("long") + 1)
      .withColumn("hi_rn", ceil(col("pos")).cast("long") + 1)
    val ranked = DistributedRank.withRank(li, Seq("l_returnflag"),
      Seq("l_extendedprice"), "rn")
    ranked.join(broadcast(targets), Seq("l_returnflag"))
      .filter(col("rn") === col("lo_rn") || col("rn") === col("hi_rn"))
      .groupBy(col("l_returnflag"), col("p"), col("pos"))
      .agg(min(when(col("rn") === col("lo_rn"), col("l_extendedprice")))
          .as("v_lo"),
        min(when(col("rn") === col("hi_rn"), col("l_extendedprice")))
          .as("v_hi"))
      .withColumn("q", round(col("v_lo") +
        (col("pos") - floor(col("pos"))) * (col("v_hi") - col("v_lo")), 4))
      .groupBy(col("l_returnflag"))
      .agg(min(when(col("p") === 0.5, col("q"))).as("p50"),
        min(when(col("p") === 0.95, col("q"))).as("p95"))
  }

  /** 46. Calendar/dimension generation: the seasons table (reference
    * last_n_completed_seasons, helper_functions.py:7-37) materialized
    * from a month sequence — season start is the first Monday of each
    * month at 09:05 UTC, end is one second before the next start.
    */
  def q46SeasonsTable(s: SparkSession, d: String): DataFrame = {
    val months = Tables.events(s, d)
      .select(date_trunc("month", col("ts")).as("m0"))
      .distinct()
      .select(explode(array(add_months(col("m0"), -1), col("m0"),
        add_months(col("m0"), 1))).as("m"))
      .distinct()
    months.select(
        date_format(col("m"), "yyyy-MM").as("season_id"),
        seasonStart(col("m")).as("sn_start_date"),
        (seasonStart(add_months(col("m"), 1)) - expr("INTERVAL 1 SECOND"))
          .as("sn_end_date"))
  }

  /** 55. Full-outer join with null-side handling: every customer and
    * every order bucket, including customers with no orders.
    */
  def q55FullOuter(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_recent"))
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_recent"), lit(0L)).as("n_recent"))
  }

  /** 56. Set operations: customers ordering in BOTH 1997 and 1998
    * (INTERSECT) and in 1997 but NOT 1998 (EXCEPT).
    */
  def q56SetOps(s: SparkSession, d: String): DataFrame = {
    def custsIn(year: Int) = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$year-01-01")) &&
        col("o_orderdate") < to_timestamp(lit(s"${year + 1}-01-01")))
      .select(col("o_custkey"))
    val both = custsIn(1997).intersect(custsIn(1998))
      .select(col("o_custkey"), lit("both").as("bucket"))
    val only97 = custsIn(1997).except(custsIn(1998))
      .select(col("o_custkey"), lit("only_1997").as("bucket"))
    both.unionByName(only97)
  }

  /** 48. Referential-integrity validation — the engine's form of the
    * reference's FK constraints (sql/db_creation_script.sql:119-159):
    * count orphaned rows per declared relationship via anti-joins.
    */
  def q48FkCheck(s: SparkSession, d: String): DataFrame = {
    def orphans(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.join(parent, child(childKey) === parent(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_orphans"))
    Seq(
      orphans("lineitem_orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      orphans("orders_customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      orphans("customer_nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      orphans("nation_region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey"))
      .reduce(_ unionByName _)
  }

  /** The q60 artifact with BOTH the sketch answers and their exact
    * counterparts side by side — the suite's tolerance assertions and
    * q60's gated booleans read from here. Every validation aggregate is
    * map-side combinable: exact NDV is a two-level count (distinct
    * pairs, then count — never a multi-countDistinct Expand), and the
    * median claim is verified by computing the EXACT RANK of the approx
    * value (two conditional counts against the broadcast approx row)
    * instead of buffering exact percentiles — the first cut of this
    * used `percentile(...)` + 2 countDistincts in one agg and cost 35 s
    * at sf0.1 vs ~3 s for this shape.
    */
  private[graft] def sketchStatsRaw(s: SparkSession, d: String)
      : DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val ap = li.groupBy(col("l_returnflag"))
      .agg(
        // rsd 2%: the sketch is still KBs — precision is the cheap dial
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_p50"),
        count(lit(1)).cast("long").as("n_rows"))
    def ndv(c: String, out: String) = li.select(col("l_returnflag"),
        col(c)).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as(out))
    // exact rank window of the approx median: rows strictly below and
    // ≤ the approx value — one broadcast join + conditional counts
    val rk = li
      .join(broadcast(ap.select(col("l_returnflag"),
        col("approx_p50").as("_ap"))), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("l_extendedprice") < col("_ap"), 1L)
          .otherwise(0L)).as("_r_lt"),
        sum(when(col("l_extendedprice") <= col("_ap"), 1L)
          .otherwise(0L)).as("_r_le"))
    ap.join(ndv("l_orderkey", "_x_orders"), "l_returnflag")
      .join(ndv("l_partkey", "_x_parts"), "l_returnflag")
      .join(rk, "l_returnflag")
  }

  /** 60. Sketch aggregates — the 100-TB alternative to exact
    * distinct/percentile shuffles: HyperLogLog++ distinct counts and
    * quantile sketches combine map-side (constant memory per
    * partition), so the shuffle carries sketches, not values. DRIVER-
    * GATED like q162 (r9 upgrade from rows-only): the approximate
    * values themselves have no ANSI oracle (different sketches per
    * engine), so the output carries the operator's CLAIMS as
    * engine-exact fields — exact row counts plus booleans asserting the
    * HLL estimates sit within 3·rsd (+small-group slack) of exact and
    * the approx median's EXACT rank window [r_lt+1, r_le] intersecting
    * the ±0.001·n band around n/2 (10× its rank guarantee, in pure
    * integer arithmetic). Sketches are deterministic, so the booleans
    * are reproducible facts; the suite asserts the same claims with
    * per-flag messages (diagnose there first — see the q162 oracle
    * coupling note).
    */
  def q60SketchStats(s: SparkSession, d: String): DataFrame =
    sketchStatsRaw(s, d).select(col("l_returnflag"), col("n_rows"),
      (abs(col("approx_orders") - col("_x_orders")) * 100 <=
        col("_x_orders") * 6 + 100).as("orders_ndv_ok"),
      (abs(col("approx_parts") - col("_x_parts")) * 100 <=
        col("_x_parts") * 6 + 100).as("parts_ndv_ok"),
      ((col("_r_lt") + 1) * 1000 <= col("n_rows") * 501 &&
        col("_r_le") * 1000 >= col("n_rows") * 499).as("p50_rank_ok"))

  /** 22. 3-way join + scalar-subquery usage/win rate (reference
    * usp_card_usage_wins, sql:224-242): per-brand share of line items in
    * the season plus per-brand win rate. The season total comes from an
    * unpartitioned window over the ~25 brand rows — not a re-scan.
    */
  def q22UsageRate(s: SparkSession, d: String): DataFrame =
    usageRate(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.part(s, d), since = "1998-01-01")

  /** The PARAMETERIZED usage/win-rate proc shape (reference
    * usp_card_usage_wins(@card_name, @season) —
    * sql/db_creation_script.sql:224-242): season = orders on/after
    * `since`, card = optional single-brand filter applied AFTER the
    * season-share window so a brand's usage_rate is its share of the
    * WHOLE season (the proc's scalar-subquery semantics), not of the
    * filtered remainder. q22 is the gate instantiation.
    */
  def usageRate(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
      since: String, brand: Option[String] = None): DataFrame = {
    val li = lineitem.select("l_orderkey", "l_partkey", "l_returnflag")
    val o = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(since)))
      .select("o_orderkey")
    val p = part.select("p_partkey", "p_brand")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
    val byBrand = joined.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_uses"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0)).as("wins"))
    val rated = byBrand
      .withColumn("total", sum(col("n_uses")).over(Window.partitionBy()))
      .select(col("p_brand"),
        round(lit(100.0) * col("n_uses") / col("total"), 2).as("usage_rate"),
        round(lit(100.0) * col("wins") / col("n_uses"), 2).as("win_rate"),
        col("n_uses").cast("long").as("n_uses"))
    brand.fold(rated)(b => rated.filter(col("p_brand") === b))
  }

  /** 87. Event-sequence export: each user's time-ordered action string
    * (capped at the first 50 events) — raw event logs turned into
    * behavioral training sequences.
    *
    * The cap is applied BEFORE the gather, on the TopKPerKey heap
    * operator: the shuffle carries ≤ 50 rows per (partition, user), and
    * `collect_list` only ever sees capped groups. A groupBy that
    * collects everything and slices afterwards holds a hot user's
    * entire history in one reducer — a bot with 10⁸ events is a
    * straight OOM at corpus scale. `n_events` (the true total) comes
    * from a partially-aggregated count that ships one long per
    * (partition, user), co-partitioned with the sequence join. In-group
    * ordering is `array_sort` on (ts, event_id) structs — field-order
    * struct comparison, deterministic, never a global sort.
    */
  def q72UserSeq(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val capped = graft.plans.TopK.perKey(ev, keys = Seq("user_id"),
      order = Seq(("ts", false), ("event_id", false)), k = 50)
    val seqs = capped.groupBy(col("user_id"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("ord"))
      .select(col("user_id"),
        concat_ws(" ", expr("transform(ord, x -> x.event_type)")).as("seq"))
    val counts = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    seqs.join(counts, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("seq"))
  }

  /** 88. Snapshot diff (CDC between two table versions): full-outer
    * join on the key, classify each key as added / removed / changed by
    * direct column comparison, drop the unchanged majority. The two
    * "versions" are derived deterministically from `orders` (every
    * 97th key absent from the old snapshot, every 89th absent from the
    * new, every 31st reprioritized) so an exact oracle can reproduce
    * them. At scale this is one co-partitioned shuffle join emitting
    * only the delta — the pattern for incremental corpus refreshes,
    * where re-processing the unchanged 99% is the cost to avoid.
    */
  def q73SnapDiff(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    val old = o.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("a_st"),
        col("o_orderpriority").as("a_pr"))
    val nw = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 31 === 0,
          concat(lit("X-"), col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("b_st"),
        col("o_orderpriority").as("b_pr"))
    old.join(nw, Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("a_st").isNull, "added")
          .when(col("b_st").isNull, "removed")
          .when(col("a_st") =!= col("b_st") || col("a_pr") =!= col("b_pr"),
            "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("k").as("o_orderkey"), col("change_type"))
  }

  /** 92. Per-group winsorization: clip `l_extendedprice` at its
    * return-flag group's exact p95 — the outlier-capping step of a
    * feature/metrics pipeline. The p95 comes from the same
    * range-partitioned exact-percentile machinery as q45
    * ([[DistributedRank.withRank]] over a 2-column projection — never a
    * per-group single-reducer window), lands in a 3-row table that
    * broadcasts back onto the fact scan, and is ROUND-4-pinned so the
    * clip compares bit-identical values in every engine.
    */
  def q78Winsor(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      col("l_linenumber"), col("l_returnflag"), col("l_extendedprice"))
    val targets = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pos", (col("n") - 1) * lit(0.95))
      .withColumn("lo_rn", floor(col("pos")).cast("long") + 1)
      .withColumn("hi_rn", ceil(col("pos")).cast("long") + 1)
    val ranked = DistributedRank.withRank(
      li.select("l_returnflag", "l_extendedprice"),
      Seq("l_returnflag"), Seq("l_extendedprice"), "rn")
    val p95 = ranked.join(broadcast(targets), Seq("l_returnflag"))
      .filter(col("rn") === col("lo_rn") || col("rn") === col("hi_rn"))
      .groupBy(col("l_returnflag"), col("pos"))
      .agg(min(when(col("rn") === col("lo_rn"), col("l_extendedprice")))
          .as("v_lo"),
        min(when(col("rn") === col("hi_rn"), col("l_extendedprice")))
          .as("v_hi"))
      .select(col("l_returnflag"),
        round(col("v_lo") +
          (col("pos") - floor(col("pos"))) * (col("v_hi") - col("v_lo")), 4)
          .as("p95"))
    li.join(broadcast(p95), Seq("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(least(col("l_extendedprice"), col("p95")), 4).as("price_w"),
        (col("l_extendedprice") > col("p95")).as("clipped"))
  }

  /** 95. Batch sessionization: gap-based sessions over the event log
    * (reference pulls per-player battle logs, api_extract.py:201-254;
    * sessions are the batch counterpart of the streaming sessionizer,
    * EventStreams.scala). A new session starts when a user's inter-event
    * gap exceeds 4 h; each session row carries its bounds, event count,
    * and duration.
    *
    * Scale: the only shuffle is the hash partition on `user_id`, and the
    * per-user window never concentrates — group size is one user's
    * events (bounded by human behavior, ~10³), while user count carries
    * the 100-TB growth across executors. Gap arithmetic is integer µs
    * and the order is pinned by (ts, event_id), so the session split is
    * engine-exact.
    */
  def q79Sessions(s: SparkSession, d: String): DataFrame = {
    val gapUs = 4L * 3600 * 1000000 // 4 h in µs
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("_us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        expr("(MAX(_us) - MIN(_us)) DIV 1000000").as("duration_sec"))
  }

  /** 96. Funnel analysis: ordered step progression signup → click →
    * purchase per user (each step's timestamp must be strictly after the
    * previous step's), reported as per-step converted-user counts — the
    * engine's form of the reference's per-player battle-progression
    * reporting (sql/db_creation_script.sql:209-242 computes per-player
    * conversion-style ratios).
    *
    * Scale: ONE hash shuffle on `user_id`, then k unbounded
    * conditional-min window passes over the same partition (no sort —
    * unbounded frames are order-free) and a tiny global roll-up. The
    * per-user window state is k timestamps; user cardinality carries
    * the growth. Never a self-join per step (k-step funnel as k joins
    * re-shuffles the log k times). q80 is the 3-step instantiation of
    * [[funnel]].
    */
  def q80Funnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d), Seq("signup", "click", "purchase"))

  /** The k=4 instantiation of [[funnel]] (signup → view → click →
    * purchase) — driver-visible evidence that the parameterized chain
    * produces the oracle's nested conditional-min semantics at any k,
    * still on ONE user_id shuffle.
    */
  def q90Funnel4(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d), Seq("signup", "view", "click", "purchase"))

  /** Parameterized k-step funnel: `steps(i)` converts a user iff an
    * event of that type occurs strictly after the user's step-(i−1)
    * conversion time. Output is one row per step: (step_ord, step
    * label, converted-user count), labels `first` then
    * `next_after_prev` — the q80 shape at any k.
    *
    * Scale: still ONE hash shuffle on `user_id` regardless of k — the
    * k conditional-min passes are unbounded-frame window aggregates
    * over the same partition (order-free, no sort), evaluated in one
    * Window operator; per-user state is k timestamps. The alternative
    * (one self-join per step) re-shuffles the event log k times.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perUser = funnelUserStages(events, steps)
    val labels = steps.head +: steps.zip(steps.tail).map {
      case (prev, next) => s"${next}_after_$prev"
    }
    perUser.agg(count(col("t1")).as("n1"),
        steps.indices.tail.map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
      .select(explode(array(steps.indices.map { i =>
        struct(lit((i + 1).toLong).as("step_ord"),
          lit(labels(i)).as("step"), col(s"n${i + 1}").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step_ord"), col("r.step"), col("r.n_users"))
  }

  /** [[funnel]]'s per-user frame — one row per user with the
    * conversion timestamp of each step (`t1..tk`, null where the
    * chain broke). Exposed so downstream ops (q127 latency
    * percentiles) reuse the one-shuffle staged build.
    */
  private[graft] def funnelUserStages(events: DataFrame,
      steps: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val ev = events.select(col("user_id"), col("ts"), col("event_type"))
    val staged = steps.zipWithIndex.foldLeft(ev) { case (df, (step, i)) =>
      val hit = col("event_type") === step
      val cond = if (i == 0) hit else hit && col("ts") > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(cond, col("ts"))).over(w))
    }
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"),
        steps.indices.tail.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}")): _*)
  }

  /** 97. Cohort retention: users grouped by first-seen ISO week; for
    * each (cohort week, week offset) the count of distinct cohort
    * members active that week — the standard engagement-retention grid
    * (the reference's season-over-season player tracking,
    * helper_functions.py:7-85 + vw_recent_rankings, recast as cohorts).
    *
    * Scale: one shuffle on `user_id` for the first-seen window (no
    * sort — unbounded min frame), then distinct (cohort, offset, user)
    * tuples — bounded by users × active weeks — and a count per grid
    * cell. No self-join of the event log against itself.
    */
  def q81Retention(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d).select(col("user_id"), col("ts"))
      .withColumn("cohort_week",
        date_trunc("week", min(col("ts")).over(w)).cast("date"))
      .withColumn("week_offset",
        (datediff(date_trunc("week", col("ts")).cast("date"),
          col("cohort_week")) / 7).cast("long"))
      .select(col("cohort_week"), col("week_offset"), col("user_id"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** 98. Robust outlier detection: per-group median/MAD z-score flags
    * (|0.6745·(x−med)/MAD| > 3.5, the standard robust rule) over the
    * event value stream — quality-gating numeric feeds the way the
    * reference hard-drops malformed rows (api_extract.py:154-157), but
    * data-driven instead of schema-driven.
    *
    * Both the median and the MAD are EXACT distributed order statistics
    * on the q45 machinery (range partition → parallel local ranks →
    * broadcast offsets — never a per-group single-reducer window). Two
    * ranking passes (values, then absolute deviations vs the broadcast
    * group-cardinality median table), then the flag applies those caps
    * broadcast onto the fact scan — the event log is never re-shuffled.
    * The outlier test is integer arithmetic on fixed-point values
    * (6745·dev > 35000·MAD) so the boundary decision is engine-exact,
    * never a float ulp.
    */
  def q83Outliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      col("event_id"), col("value"))
    // r14: both exact medians (value, then |value − med|) derive from
    // ONE map-combined (type, value) HISTOGRAM whenever its row count
    // fits the driver gate — the two DistributedRank passes cost 36
    // jobs of scheduling floor for order statistics a weighted-median
    // walk over the bounded histogram reproduces exactly (ranks among
    // equal values share the value, and the interpolation is the same
    // IEEE double tree: vLo + (pos − ⌊pos⌋)·(vHi − vLo)). Null values
    // would change rank accounting — any null routes to the relational
    // path rather than replicating null-first ordering driver-side.
    val maxHist = s.conf.getOption("spark.graft.outliers.driverMaxHist")
      .map(_.toLong).getOrElse(1000000L)
    val medMad: Option[DataFrame] = if (maxHist <= 0) None else {
      val hist = ev.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("_c"))
      // r15 (ADVICE low): ONE limit-bounded collect decides the gate
      // AND carries the histogram — the old localCheckpoint+count
      // fully materialized a histogram the fallback path then threw
      // away (a large wasted write at the 100 TB shape). The wasted
      // work past the gate is now capped at maxHist+1 driver rows.
      val lim = math.min(maxHist + 1, Int.MaxValue.toLong - 8).toInt
      val rows = hist.limit(lim).collect()
      if (rows.length > maxHist) None
      else {
        if (rows.exists(_.isNullAt(1))) None
        else {
          // weighted lower/upper-rank median with linear interpolation
          // — identical arithmetic to groupMedian's target/interp exprs
          def wMedian(vc: Seq[(Double, Long)]): Double = {
            val sorted = vc.sortBy(_._1)
            val n = sorted.map(_._2).sum
            val pos = (n - 1) * 0.5
            val loRn = math.floor(pos).toLong + 1
            val hiRn = math.ceil(pos).toLong + 1
            var cum = 0L
            var vLo = 0.0; var vHi = 0.0
            sorted.foreach { case (v, c) =>
              if (cum < loRn && loRn <= cum + c) vLo = v
              if (cum < hiRn && hiRn <= cum + c) vHi = v
              cum += c
            }
            vLo + (pos - math.floor(pos)) * (vHi - vLo)
          }
          val byType = rows.map(r => (r.getString(0),
            r.getDouble(1), r.getLong(2))).groupBy(_._1)
          val out = byType.toSeq.map { case (t, vs) =>
            val med = wMedian(vs.toSeq.map(v => (v._2, v._3)))
            val mad = wMedian(vs.toSeq.map(v =>
              (math.abs(v._2 - med), v._3)))
            org.apache.spark.sql.Row(t, med, mad)
          }
          import scala.jdk.CollectionConverters._
          Some(s.createDataFrame(out.asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("event_type",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("med",
                org.apache.spark.sql.types.DoubleType),
              org.apache.spark.sql.types.StructField("mad",
                org.apache.spark.sql.types.DoubleType)))))
        }
      }
    }
    medMad match {
      case Some(mm) =>
        ev.join(broadcast(mm), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
          .withColumn("dev_i", round(col("dev") * 10000).cast("long"))
          .withColumn("mad_i", round(col("mad") * 10000).cast("long"))
          .filter(col("dev_i") * 6745 > col("mad_i") * 35000)
          .select(col("event_type"), col("event_id"), col("value"),
            round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"))
      case None =>
        val med = groupMedian(ev.select(col("event_type"), col("value")),
          "event_type", "value", "med")
        val devs = ev.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = groupMedian(devs.select(col("event_type"), col("dev")),
          "event_type", "dev", "mad")
        devs.join(broadcast(mad), "event_type")
          .withColumn("dev_i", round(col("dev") * 10000).cast("long"))
          .withColumn("mad_i", round(col("mad") * 10000).cast("long"))
          .filter(col("dev_i") * 6745 > col("mad_i") * 35000)
          .select(col("event_type"), col("event_id"), col("value"),
            round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"))
    }
  }

  /** Exact per-group median (linear interpolation) via DistributedRank —
    * the p=0.5 slice of the q45 percentile machinery, reused by the
    * outlier pass for both the value median and the deviation median.
    */
  private def groupMedian(df: DataFrame, group: String, value: String,
      out: String): DataFrame = {
    val targets = df.groupBy(col(group)).agg(count(lit(1)).as("n"))
      .withColumn("pos", (col("n") - 1) * lit(0.5))
      .withColumn("lo_rn", floor(col("pos")).cast("long") + 1)
      .withColumn("hi_rn", ceil(col("pos")).cast("long") + 1)
    val ranked = DistributedRank.withRank(df.select(col(group), col(value)),
      Seq(group), Seq(value), "rn")
    ranked.join(broadcast(targets), Seq(group))
      .filter(col("rn") === col("lo_rn") || col("rn") === col("hi_rn"))
      .groupBy(col(group), col("pos"))
      .agg(min(when(col("rn") === col("lo_rn"), col(value))).as("v_lo"),
        min(when(col("rn") === col("hi_rn"), col(value))).as("v_hi"))
      .select(col(group), (col("v_lo") + (col("pos") - floor(col("pos"))) *
        (col("v_hi") - col("v_lo"))).as(out))
  }

  /** SCD Type-2 history: collapse a keyed, timestamped attribute stream
    * into versioned validity intervals — one row per run of consecutive
    * equal values, with `valid_from` / `valid_to` (start of the next
    * run, NULL on the open current version) and `is_current`. The
    * history-keeping sibling of the reference's last-write-wins MERGE
    * (db_ops.py:62-148, q12): where that overwrites, this appends the
    * full change history a dimension table needs for point-in-time
    * joins.
    *
    * Run detection is gaps-and-islands: a null-safe lag-inequality
    * marker, a running sum to number the runs, one groupBy per run, and
    * a lead() for the interval end — three window passes and one
    * aggregate, all over the SAME hash partitioning on `key` (one
    * shuffle; per-key windows stay bounded by that key's row count, so
    * no single-reducer concentration at any scale).
    *
    * Ordering within a key is pinned by (`ts`, `tieBreak`) so runs are
    * deterministic under same-instant updates.
    */
  def scd2(df: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame =
    scd2WithTie(df, key, attr, ts, tieBreak).drop("first_tie")

  /** [[scd2]] plus each run's `first_tie` — the tie-break of the run's
    * FIRST row (min by (ts, tieBreak), not min(tieBreak): a later-ts
    * row may carry a smaller tie). `first_tie` makes the history
    * REPLAYABLE: (valid_from, first_tie) is exactly the original first
    * row's order key, so re-running the collapse over run-start events
    * reproduces the original run order even through same-instant
    * chains — the property [[incrementalScd2]] needs.
    */
  def scd2WithTie(df: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame = {
    require(!df.columns.exists(Set("_chg", "_run")),
      "input must not carry _chg/_run columns (the run-detection keys)")
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val runs = df
      .withColumn("_chg",
        when(lag(col(attr), 1).over(byKey) <=> col(attr), 0L).otherwise(1L))
      .withColumn("_run",
        sum(col("_chg")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(key), col("_run"))
      .agg(min(col(attr)).as("attr_value"), // constant within a run
        min(col(ts)).as("valid_from"), count(lit(1)).as("n_rows"),
        min(struct(col(ts), col(tieBreak))).getField(tieBreak)
          .as("first_tie"))
    val byRun = Window.partitionBy(col(key)).orderBy(col("_run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_run")
  }

  /** Incremental SCD2 maintenance: apply an APPEND-ONLY CDC batch to an
    * existing [[scd2WithTie]] history without recomputing untouched
    * keys — the lakehouse type-2 MERGE. Keys absent from the delta pass
    * through by anti-join (at a real deployment the unchanged files are
    * not even rewritten — ParquetUpsertSink's MERGE path); for touched
    * keys the existing runs re-enter the collapse as run-START events
    * ((valid_from, first_tie) = the original first row's order key —
    * consecutive runs alternate values so they never re-collapse among
    * themselves) together with the delta's raw rows, through the same
    * single-key-shuffle machinery. The recompute therefore carries
    * |delta| + |touched history| rows, never the base table.
    *
    * PRECONDITION (the standard CDC contract): per key, every delta
    * row's (ts, tieBreak) sorts after all rows already folded into the
    * history. A mid-history insert can split an old run whose interior
    * duplicates were collapsed away, which no run-start replay can
    * reconstruct — those keys need the full recompute path.
    *
    * Output schema = [[scd2WithTie]] minus `n_rows` (interior
    * duplicate counts are not reconstructible from run starts — and
    * not part of the interval contract), so refreshes CHAIN: the
    * output feeds the next delta directly.
    */
  def incrementalScd2(history: DataFrame, delta: DataFrame, key: String,
      attr: String, ts: String, tieBreak: String): DataFrame = {
    // null-SAFE key membership: scd2's groupBy treats a NULL key as a
    // normal group, so the touched/untouched split must too — plain
    // equality joins would keep NULL-key history in `untouched` AND
    // drop it from the replay, yielding two overlapping interval
    // chains for the NULL key
    val touchedKeys = delta.select(col(key).as("_tk")).distinct()
    val out = Seq(col(key), col("attr_value"), col("valid_from"),
      col("first_tie"), col("valid_to"), col("is_current"))
    val untouched = history.join(touchedKeys,
        history(key) <=> touchedKeys("_tk"), "left_anti")
      .select(out: _*)
    val startEvents = history.join(touchedKeys,
        history(key) <=> touchedKeys("_tk"), "left_semi")
      .select(col(key), col("attr_value").as(attr),
        col("valid_from").as(ts), col("first_tie").as(tieBreak))
    val events = startEvents.unionByName(
      delta.select(col(key), col(attr), col(ts), col(tieBreak)))
    untouched.unionByName(
      scd2WithTie(events, key, attr, ts, tieBreak).drop("n_rows")
        .select(out: _*))
  }

  /** 117. The incremental refresh, externally verified by the strongest
    * oracle available: history folded from pre-1997 orders, the 1997+
    * orders applied as the CDC batch — the split-by-date guarantees the
    * per-key append-only precondition — and the stitched result must
    * EQUAL the full-history recompute over all of orders (the q92
    * oracle chain, minus the run row counts).
    */
  def q102IncrScd2(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val cut = to_timestamp(lit("1997-01-01 00:00:00"))
    val history = scd2WithTie(orders.filter(col("o_orderdate") < cut),
      "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    val delta = orders.filter(col("o_orderdate") >= cut)
    incrementalScd2(history, delta,
      "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("custkey"),
        col("attr_value").as("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** 106. Customer order-priority history: each customer's orders over
    * time define their current-priority attribute; SCD2 collapses the
    * stream into validity intervals. The oracle replays the same
    * lag/sum/lead chain in DuckDB SQL.
    */
  def q92Scd2(s: SparkSession, d: String): DataFrame =
    scd2(Tables.orders(s, d), "o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("custkey"),
        col("attr_value").as("priority"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("n_rows").as("n_orders"))

  /** Algebraic partial-aggregate merge: combine per-partition aggregate
    * tables (counts and sums are associative) into the aggregate of the
    * union WITHOUT rescanning the inputs — the incremental
    * materialized-view maintenance pattern. A CDC refresh recomputes
    * only the delta's aggregate and merges it into the stored one; the
    * 100-TB base table is never re-read (the reference's incremental
    * load, etl_pipeline_script.py:40-48, lifted from rows to
    * aggregates). Retractions are negative deltas: the same merge
    * subtracts them. AVG and other algebraic aggregates decompose into
    * (sum, count) parts and derive after the merge.
    */
  def mergeAggregates(parts: Seq[DataFrame], keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "need at least one aggregate part")
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head)).as(sums.head),
        sums.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** 112. Incremental aggregate maintenance, verified by the strongest
    * oracle available: the merged (base ⊕ delta) aggregate must EQUAL
    * the full recompute over all of orders. Money rides 4-decimal
    * fixed-point longs; the merged AVG derives by integer round-half-up
    * (2·total + n) DIV (2·n) — never a float.
    */
  def q97IncrAgg(s: SparkSession, d: String): DataFrame = {
    val scaled = Tables.orders(s, d).select(col("o_custkey"),
      col("o_orderkey"),
      (col("o_totalprice").cast("decimal(18,4)") * 10000).cast("long")
        .as("_price_i"))
    def aggOf(df: DataFrame): DataFrame = df.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("_price_i")).as("total_i"))
    // the stored aggregate (base) and the CDC refresh (delta)
    val base = aggOf(scaled.filter(pmod(col("o_orderkey"), lit(97)) =!= 0))
    val delta = aggOf(scaled.filter(pmod(col("o_orderkey"), lit(97)) === 0))
    mergeAggregates(Seq(base, delta), Seq("o_custkey"),
      Seq("n_orders", "total_i"))
      .select(col("o_custkey").as("custkey"), col("n_orders"),
        col("total_i"),
        expr("(2 * total_i + n_orders) DIV (2 * n_orders)").as("avg_i"))
  }

  /** 113. Point-in-time (bitemporal) join: each fact row joins the
    * dimension VERSION that was valid at the fact's timestamp — the
    * consumer of q92's SCD2 history, composed from two existing
    * operators: because SCD2 intervals are contiguous per key
    * ([valid_from, next valid_from)), "the version valid at ts" IS
    * "the latest version with valid_from ≤ ts", i.e. an as-of join
    * ([[AsOfJoin.lastPrior]] — one key-clustered shuffle, no interval
    * explosion needed). Same-instant version chains (several runs
    * sharing one valid_from) produce empty intervals for all but the
    * last; those can never match and are filtered so the as-of pick is
    * unique and deterministic.
    *
    * Demo: each lineitem's customer order-priority state at ship time.
    */
  def q98PitJoin(s: SparkSession, d: String): DataFrame = {
    val dim = q92Scd2(s, d)
      .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
      .select(col("custkey"), col("valid_from"), col("priority"))
    val facts = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey").as("custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
        col("l_shipdate"))
    AsOfJoin.lastPrior(facts, dim, Seq("custkey"),
      "l_shipdate", "valid_from", Seq("priority"))
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
        col("asof_priority").as("priority_at_ship"))
  }

  /** Time-series resample to a complete per-key daily spine with
    * gap-fill and last-observation-carried-forward: aggregate to one
    * row per (key, day), then densify — every day between a key's first
    * and last active day appears, absent days resample to n = 0 with a
    * null measurement, and the LOCF window carries the latest prior
    * measurement across the gap.
    *
    * Scale shape: the spine derives from the DAILY AGGREGATE's per-key
    * min/max (never from the raw fact table), so the explode factor is
    * bounded by each key's date span — at 100 TB the spine is
    * |keys| × span rows regardless of fact cardinality, generated
    * distributed (no driver-side calendar). Spine ⋈ daily and the LOCF
    * window both cluster on the key, and the measurement rides DECIMAL
    * internally so LOCF picks are engine-exact; callers that dump the
    * result cast to e4 longs first (no DECIMAL output columns —
    * CLAUDE.md determinism rule).
    */
  def gapFillDaily(facts: DataFrame, key: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = facts
      .groupBy(col(key), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("day_value"))
    val spine = daily.groupBy(col(key))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(key), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val locf = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(key, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(locf))
  }

  /** 114. Per-user daily activity resampled to a dense calendar:
    * gap days surface with n_events = 0 and a null day_value_e4, while
    * filled_value_e4 carries the last active day's sum forward (never
    * null — the spine starts at each user's first active day). Values
    * are integer e4 longs in the output (internal math is DECIMAL; a
    * DECIMAL output column would hash differently across engines).
    */
  def q99GapFill(s: SparkSession, d: String): DataFrame =
    gapFillDaily(Tables.events(s, d), "user_id", "ts", "value")
      .select(col("user_id"), col("day"), col("n_events"),
        (col("day_value") * 10000).cast("long").as("day_value_e4"),
        (col("filled_value") * 10000).cast("long").as("filled_value_e4"))

  /** 108. Time-RANGE sliding window: per-user rolling 1-hour event count
    * and value sum — a RANGE frame over the event-time axis (q42's
    * running total is the ROWS-frame sibling; a RANGE frame bounds by
    * VALUE distance, so it is insensitive to tie order by construction).
    * One hash shuffle on user_id; frames never leave the user partition.
    * Sums ride DECIMAL so the frame-add/frame-subtract accumulation and
    * DuckDB's segment tree agree exactly; the FINAL output is integer
    * e4 units (LONG) — never a DECIMAL column, which the driver's
    * hasher normalizes differently per engine (CLAUDE.md rule).
    */
  def q94SlidingWindow(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("_us"))
      .rangeBetween(-hourUs, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("_us"),
        col("value").cast("decimal(18,4)").as("_v"))
      .withColumn("n_hour", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_hour_e4",
        (sum(col("_v")).over(w) * 10000).cast("long"))
      .select("event_id", "user_id", "n_hour", "sum_hour_e4")
  }

  /** 128. Markov transition matrix over per-user event streams: for
    * every (from_type → to_type) pair of CONSECUTIVE events of one
    * user, the count and the row-normalized transition probability —
    * the session-flow model behind next-event prediction, anomaly
    * scoring ("this transition never happens") and the funnel's
    * unordered complement (q80 asks "did the ordered chain complete";
    * this asks "what does the user do next from each state").
    *
    * Consecutive = `lead` over (ts, event_id) per user — the q79/q94
    * one-user_id-shuffle shape; per-user streams are bounded, so the
    * window never sees a degenerate partition. The transition table is
    * |types|²-bounded (tiny), the probability is round-half-up integer
    * ppm over the from-state total (q21 ratio rule — engine-exact, no
    * float division), and the per-from totals come from a window over
    * the TINY aggregated table, not a second pass over events.
    */
  def q113Markov(s: SparkSession, d: String): DataFrame =
    markovTransitions(Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  /** [[q113Markov]]'s core over any (user_id, ts, event_id, event_type)
    * frame.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("c_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(2000000 * n + c_from) DIV (2 * c_from)").as("p_ppm"))
  }

  /** 130. Equi-depth binning (the feature-engineering quantile
    * discretizer): every lineitem assigned its global 16-quantile price
    * bin — `bin = ⌊(rank−1)·B / n⌋` over the (price, orderkey,
    * linenumber)-total order, so bin populations differ by at most one
    * row and the cut points ARE the empirical quantiles.
    *
    * The naive formulation is `ntile(16) OVER (ORDER BY price)` — a
    * GLOBAL window, the single-reducer shape that dies first at scale
    * (100 TB through one task). Here the global rank is
    * [[DistributedRank.withRank]] with EMPTY group columns: range
    * partition on the order key → parallel per-slice ranks → broadcast
    * per-partition offsets (a #partitions-row table), then the bin is
    * pure long arithmetic — engine-exact, no percentile estimation
    * anywhere (q45 computes the quantile VALUES; this labels every
    * row, which is what a feature pipeline joins back).
    */
  def q115EquidepthBins(s: SparkSession, d: String): DataFrame = {
    val bins = 16L
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ranked = DistributedRank.withRank(li, Seq.empty,
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), "rk")
    ranked
      .crossJoin(broadcast(li.agg(count(lit(1)).as("_n"))))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        expr(s"((rk - 1) * $bins) DIV _n").as("bin"))
  }

  /** 138. Skyline / Pareto frontier (Börzsönyi, Kossmann & Stocker
    * 2001, "The Skyline Operator"): every part not dominated on
    * (maximize p_size, minimize p_retailprice) — the multi-objective
    * "best tradeoffs" set the reference's dashboards eyeball on the
    * usage-vs-win-rate scatter (helper_functions.py:27-52,
    * sql/db_creation_script.sql:185-242 pick single-axis TOP-1s; the
    * skyline is every defensible choice at once).
    *
    * The naive plan is the quadratic NOT-EXISTS self-join (exactly the
    * oracle SQL — n² dominance tests). The distributed plan exploits
    * 2-D dominance structure: ONE corpus-scale shuffle computes the
    * per-size minimum price (a |distinct size|-bounded staircase —
    * TPC-H sizes are 1..50); a running min over strictly-larger sizes
    * on that BOUNDED aggregate (the window runs over ≤|sizes| rows,
    * never the corpus) gives the dominance threshold per size; the
    * frontier is then a broadcast join back: keep rows at their size's
    * min price that beat every larger size's best. Equal (size, price)
    * ties don't dominate each other — both kept, matching NOT EXISTS
    * strictness. Price compares are exact (4-decimal parquet doubles,
    * no accumulation); output is integer e4 units (a DECIMAL output
    * column would hash differently across engines — CLAUDE.md rule).
    */
  def q122Skyline(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val stairs = part.groupBy("p_size")
      .agg(min(col("p_retailprice")).as("mp"))
    // global window over the distinct-p_size stairs (≤ |sizes| rows
    // at any scale) — bounded, benign
    val w = Window.orderBy(col("p_size").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = stairs.withColumn("hi_mp", min(col("mp")).over(w))
    part.join(broadcast(frontier), "p_size")
      .filter(col("p_retailprice") === col("mp") &&
        (col("hi_mp").isNull || col("p_retailprice") < col("hi_mp")))
      .select(col("p_partkey"), col("p_size"),
        (col("p_retailprice").cast("decimal(18,4)") * 10000)
          .cast("long").as("price_e4"))
  }

  /** 139. Multi-touch attribution: every `purchase` credits the user's
    * preceding `view`/`click` touches within a 7-day lookback under
    * the three standard models at once — `first` (full value to the
    * earliest touch), `last` (full value to the latest), `linear`
    * (value split evenly) — plus a `direct` channel for purchases with
    * no touch in the window (the funnel/session family q79/q80/q113
    * answers "what happened"; attribution answers "what gets the
    * credit", the reference's win-rate-by-deck question
    * (sql/db_creation_script.sql:185-242) asked causally).
    *
    * Shapes: ONE user_id equi-join (touch↔purchase; per-user streams
    * are bounded so the 7-day band filter is a post-join predicate,
    * not a blow-up), per-PURCHASE windows for first/last/n (purchase
    * keys are unique — no skew), then one explode emits all three
    * model credits per touch pair in a single pass (no 3× re-scan of
    * the join), and the final aggregate is |channels|×|models|-bounded.
    * Money math is integer ten-thousandths end to end: the linear
    * share is round-half-up `(2v+n) DIV 2n` (the q21 ratio rule), so
    * sums are engine-exact BIGINTs — no float credit ever exists.
    */
  def q123Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val v4 = (coalesce(col("value"), lit(0.0d)).cast("decimal(18,4)")
      * 10000).cast("long")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"), v4.as("v"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("tid"), col("user_id"),
        col("ts").as("tts"), col("event_type").as("channel"))
    val pt = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") <= col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val wFirst = Window.partitionBy(col("pid"))
      .orderBy(col("tts").asc, col("tid").asc)
    val wLast = Window.partitionBy(col("pid"))
      .orderBy(col("tts").desc, col("tid").desc)
    val wN = Window.partitionBy(col("pid"))
    val credits = pt
      .withColumn("rn_f", row_number().over(wFirst))
      .withColumn("rn_l", row_number().over(wLast))
      .withColumn("n", count(lit(1)).over(wN))
      .select(col("channel"), explode(array(
        struct(lit("linear").as("model"),
          expr("(v * 2 + n) DIV (2 * n)").as("credit")),
        struct(lit("first").as("model"),
          when(col("rn_f") === 1, col("v")).as("credit")),
        struct(lit("last").as("model"),
          when(col("rn_l") === 1, col("v")).as("credit"))
      )).as("c"))
      .select(col("channel"), col("c.model"), col("c.credit"))
      .filter(col("credit").isNotNull)
    val direct = purchases
      .join(pt.select("pid").distinct(), Seq("pid"), "left_anti")
      .select(lit("direct").as("channel"),
        explode(typedlit(Seq("first", "last", "linear"))).as("model"),
        col("v").as("credit"))
    credits.unionByName(direct)
      .groupBy(col("channel"), col("model"))
      .agg(sum(col("credit")).as("credit_e4"),
        count(lit(1)).as("n_credits"))
  }

  /** 143. Funnel time-to-convert percentiles: for users completing the
    * full signup → click → purchase chain, the p50/p90/p99 of
    * end-to-end conversion latency — the "how fast does the funnel
    * convert" report that turns q80's HOW-MANY into HOW-LONG (the
    * reference's per-player progression views count outcomes only,
    * sql/db_creation_script.sql:209-242).
    *
    * Exactness: latency is integer seconds (µs difference DIV 10⁶) and
    * the percentile is NEAREST-RANK (⌈p·n/100⌉-th order statistic) —
    * an actual observed value selected by integer arithmetic, so the
    * result is engine-exact with no interpolation float (q45
    * interpolates and ROUNDs; a latency SLO wants an observed order
    * statistic anyway). Scale: the staged build is [[funnel]]'s ONE
    * user_id shuffle; the global rank over converted users is
    * [[DistributedRank.withRank]] with empty groups (range partition +
    * offsets — never `row_number() OVER ()`'s single reducer, the q115
    * rule); n is a 1-row broadcast and the 3 target rows fall out of
    * one rank-membership filter.
    */
  def q127ConvertLatency(s: SparkSession, d: String): DataFrame = {
    val st = funnelUserStages(Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type")),
      Seq("signup", "click", "purchase"))
    val conv = st.filter(col("t3").isNotNull)
      .select(col("user_id"),
        expr("(unix_micros(t3) - unix_micros(t1)) DIV 1000000").as("lat_s"))
    val ranked = DistributedRank.withRank(conv, Seq.empty,
      Seq("lat_s", "user_id"), "rn")
    ranked
      .crossJoin(broadcast(conv.agg(count(lit(1)).as("n"))))
      .select(col("lat_s"), col("rn"), col("n"),
        explode(typedlit(Seq(50L, 90L, 99L))).as("p"))
      .filter(col("rn") === expr("(p * n + 99) DIV 100"))
      .select(col("p"), col("n").as("n_converted"),
        col("lat_s").as("latency_s"))
  }

  /** 145. Deterministic negative sampling: for every customer, 2
    * part-items they never bought — the contrastive-training staple
    * (recommendation/embedding losses need negatives per positive; a
    * training-data engine must mint them reproducibly). `rand()`
    * negatives differ per run/retry/engine; here candidate i for
    * customer c is `md5(c || '|' || i) mod |parts|` — an md5-keyed
    * draw (the q68/q69 hash-randomness rule; TPC-H partkeys are dense
    * 0..P−1, so `mod` IS the item index, no dictionary join needed —
    * with sparse ids you'd compose the q54 surrogate-key map).
    *
    * Shapes: 6 candidate draws explode per customer (bounded fan-out,
    * pure per-row hash arithmetic, no shuffle); accidental positives
    * leave via ONE anti-join on (cust, item) — the only corpus-scale
    * shuffle; duplicate draws collapse to their first attempt; the
    * keep-2 cut is the TopKPerKey heap (first surviving attempts,
    * item tie-break). Heavy buyers can exhaust the 6 draws and yield
    * <2 negatives — the margin is a parameter, not a retry loop.
    */
  def q128NegativeSampling(s: SparkSession, d: String): DataFrame = {
    val pos = Tables.orders(s, d)
      .select(col("o_custkey").as("cust"), col("o_orderkey").as("ok"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item")),
        "ok")
      .select("cust", "item").distinct()
    val nParts = Tables.part(s, d).agg(count(lit(1)).as("np"))
    val cand = pos.select("cust").distinct()
      .crossJoin(broadcast(nParts))
      .select(col("cust"), col("np"),
        explode(sequence(lit(0), lit(5))).as("attempt"))
      .withColumn("item", expr(
        """CAST(conv(substring(md5(CAST(concat(CAST(cust AS STRING), '|',
           CAST(attempt AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT)
           % np"""))
    val neg = cand.join(pos, Seq("cust", "item"), "left_anti")
      .groupBy("cust", "item").agg(min("attempt").as("attempt"))
    graft.plans.TopK.perKey(neg, keys = Seq("cust"),
        order = Seq(("attempt", false), ("item", false)), k = 2)
      .select(col("cust"), col("item"), col("attempt").cast("long"))
  }

  /** 146. Peak-concurrency sweep line: per day, the maximum number of
    * user sessions open at once — the capacity-planning statistic
    * (how many concurrent players does the service carry; the
    * reference's battle-log extract has the raw timestamps but no
    * concurrency view, api_extract.py:201-254). Sessions are q79's
    * 4-hour-gap sessions; each contributes a +1 at its start and a −1
    * at its (inclusive) end, and the classic sweep line reads the
    * running sum at every transition point. Ends sort before starts at
    * an equal timestamp (delta ascending), so a session ending exactly
    * when another starts never inflates the peak.
    *
    * Scale: the textbook formulation — `SUM(delta) OVER (ORDER BY us)`
    * — is a GLOBAL ordered window, i.e. every delta of the 100-TB
    * event log through ONE reducer. Here the running sum is
    * [[DistributedRank.withRunningSum]] with empty groups: range
    * partition by (us, delta, …) into ordered slices, parallel local
    * prefix sums, plus broadcast per-partition offsets. The per-day
    * max then combines map-side. Deltas are ±1 longs, so every engine
    * sums them exactly regardless of accumulation order; the peak is
    * additionally tie-order-free because among equal timestamps the
    * maximum is reached only after all +1s apply.
    */
  def q129PeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = q79Sessions(s, d).select(
      col("user_id"), col("session_id"),
      unix_micros(col("session_start")).as("sus"),
      unix_micros(col("session_end")).as("eus"))
    val deltas = sess.select(col("user_id"), col("session_id"),
        col("sus").as("us"), lit(1L).as("delta"))
      .unionAll(sess.select(col("user_id"), col("session_id"),
        col("eus").as("us"), lit(-1L).as("delta")))
    val run = DistributedRank.withRunningSum(deltas, Seq.empty,
      Seq("us", "delta", "user_id", "session_id"), "delta", "_excl")
    run.withColumn("conc", col("_excl") + col("delta"))
      .withColumn("day", to_date(timestamp_micros(col("us"))))
      .groupBy("day")
      .agg(max(col("conc")).as("peak_concurrent"))
  }

  /** 157. q140: behavioral trigram motifs with second-order lift — the
    * top event-type trigrams by observed count, each scored against
    * what q113's FIRST-order Markov chain would predict:
    * pred(a→b→c) = n(a,b) · n(b,c) / c(b), so
    * lift = obs · c(b) / (n(a,b) · n(b,c)). Lift ≈ 1 means the chain
    * explains the motif (b's next step doesn't care how you reached
    * b); lift >> 1 is genuine second-order structure — the
    * "signup→click→purchase happens as a UNIT" signal that funnel
    * design (q80) takes as input, detected instead of assumed.
    *
    * Shapes: the corpus is scanned ONCE — one user_id window shuffle
    * produces both lead columns, and a single grouped aggregate over
    * (e1, e2, e3) WITH null e3 kept captures trigrams and bigrams
    * together (every bigram instance is either inside some trigram or
    * a boundary (e1, e2, null) row, so the bigram table is the
    * marginal of this one aggregate — no second corpus pass). The
    * aggregate is |event_type|-bounded (≤ T³+T² rows), checkpointed so
    * its four consumers don't re-run the corpus scan, and every
    * enrichment join broadcasts. Lift is cross-multiplied integer ppm
    * in DECIMAL(38,0) (obs·c_b·10⁶ passes long range at cluster
    * scale), round-half-up, no float. A trigram's constituent bigrams
    * are always present (each instance contributes to both), so the
    * ratio is never 0/0.
    */
  def q140TrigramMotifs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
    val g3 = seq.filter(col("e2").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val bi = g3.groupBy(col("e1").as("b1"), col("e2").as("b2"))
      .agg(sum(col("n")).as("nb"))
    val fromTot = bi.groupBy(col("b1")).agg(sum(col("nb")).as("cb"))
    val tri = g3.filter(col("e3").isNotNull)
    tri
      .join(broadcast(bi.select(col("b1").as("e1"), col("b2").as("e2"),
        col("nb").as("n12"))), Seq("e1", "e2"))
      .join(broadcast(bi.select(col("b1").as("e2"), col("b2").as("e3"),
        col("nb").as("n23"))), Seq("e2", "e3"))
      .join(broadcast(fromTot.select(col("b1").as("e2"), col("cb"))),
        Seq("e2"))
      .select(col("e1"), col("e2"), col("e3"), col("n"),
        expr("""CAST((2 * CAST(n AS DECIMAL(38,0)) * cb * 1000000
            + CAST(n12 AS DECIMAL(38,0)) * n23)
          DIV (2 * CAST(n12 AS DECIMAL(38,0)) * n23) AS BIGINT)""")
          .as("lift_ppm"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(25)
  }

  /** 158. q141: behavioral-diversity score — per-user Gini impurity of
    * the event-type mix, 1 − Σ(cᵢ/n)² = (n² − Σcᵢ²)/n². The
    * concentration diagnostic (Herfindahl complement): ~0 = a bot
    * hammering one action, high = organic mixed behavior — and unlike
    * Shannon entropy it is a RATIONAL statistic, so it reports as an
    * exact round-half-up integer ppm with no `ln` to diverge in the
    * last ulp across libms (the q58 rule). One (user, type) aggregate
    * + one user-level fold, both map-side combined; Σc² in
    * DECIMAL(38,0) for cluster-scale counts.
    */
  def q141BehaviorDiversity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).cast("long").as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("""CAST((2 * (CAST(n_events AS DECIMAL(38,0)) * n_events - s2)
            * 1000000 + CAST(n_events AS DECIMAL(38,0)) * n_events)
          DIV (2 * CAST(n_events AS DECIMAL(38,0)) * n_events)
          AS BIGINT)""").as("diversity_ppm"))

  /** 163. q146: Pareto / ABC classification — parts ranked by revenue,
    * classed A while the revenue accumulated BEFORE them is under 80%
    * of the total, B under 95%, else C (the inventory-management
    * 80/15/5 cut; the boundary item that crosses a line joins the
    * richer class). Output is the 3-row class summary: how many parts
    * carry how much revenue.
    *
    * Scale shape: one part-level revenue aggregate, then the
    * descending cumulative revenue via ONE
    * [[DistributedRank.withRunningSum]] prefix pass over the
    * (−revenue, partkey) total order — `SUM(rev) OVER (ORDER BY rev
    * DESC)` is the single-reducer shape this module exists to avoid —
    * with the grand total broadcast back. Classification compares
    * 100·cumExcl against 80·T / 95·T in exact decimal ×100 integer
    * units; shares are round-half-up ppm; no float anywhere.
    */
  def q146ParetoAbc(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(28,4)").as("rev"))
      // exact ×100 integer units make the running sum a LONG — the
      // withRunningSum contract — and negation gives the desc order
      .select(col("l_partkey"), (col("rev") * 100).cast("long").as("r100"),
        (-(col("rev") * 100)).cast("long").as("nr100"))
    val cum = DistributedRank.withRunningSum(rev, Seq.empty,
      Seq("nr100", "l_partkey"), "r100", "cum_excl")
    val tot = rev.agg(sum(col("r100")).cast("long").as("t100"))
    cum.crossJoin(broadcast(tot))
      .withColumn("cls",
        when(expr("""CAST(cum_excl AS DECIMAL(38,0)) * 100
            < CAST(t100 AS DECIMAL(38,0)) * 80"""), "A")
          .when(expr("""CAST(cum_excl AS DECIMAL(38,0)) * 100
            < CAST(t100 AS DECIMAL(38,0)) * 95"""), "B")
          .otherwise("C"))
      .groupBy(col("cls"), col("t100"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("r100")).cast("long").as("rev100"))
      .select(col("cls"), col("n_parts"),
        round(col("rev100").cast("double") / 100.0, 2).as("revenue"),
        expr("""CAST((2 * CAST(rev100 AS DECIMAL(38,0)) * 1000000
            + t100) DIV (2 * CAST(t100 AS DECIMAL(38,0))) AS BIGINT)""")
          .as("share_ppm"))
  }

  /** 164. q147: exact largest-remainder proration (Hamilton method) —
    * each order's total, in integer cents, is allocated across its
    * lineitems proportionally to extended price such that the
    * allocated cents SUM EXACTLY to the order total: floor shares
    * `(t·w) DIV W` first, then the `t − Σfloor` leftover cents go one
    * each to the largest remainders (linenumber ties ascending). The
    * financial-allocation primitive naive `ROUND(t·w/W)` gets wrong —
    * rounded shares drift off the total by ±n/2 cents and the books
    * don't close (the reference stores money as raw floats and never
    * reconciles, helper_functions.py:34-60).
    *
    * Determinism: pure integer arithmetic end to end — weights and
    * totals pin to ×100 integer cents through DECIMAL(18,4), products
    * t·w stay under 2⁶³ at data scale, and DIV/%/comparisons are
    * engine-identical on non-negative longs (zero-weight lines are
    * excluded by contract — they receive nothing and cannot divide by
    * a zero group weight).
    *
    * Scale shape: one orderkey equi-join, then ONE orderkey exchange
    * shared by the group-sum and row_number windows — per-group
    * windows are safe here precisely because groups are bounded (≤7
    * lineitems) and keys are millions (the q38/q83 single-reducer rule
    * does not apply to bounded-group many-key partitions).
    */
  def prorate(items: DataFrame, keyCol: String, lineCol: String,
      weightCol: String, totals: DataFrame, totalKeyCol: String,
      totalCol: String): DataFrame = {
    val li = items
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull)
      .select(col(keyCol).as("_k"), col(lineCol).as("_line"),
        (col(weightCol).cast("decimal(18,4)") * 100).cast("long").as("_w"))
      .filter(col("_w") > 0)
    val t = totals
      .filter(col(totalKeyCol).isNotNull && col(totalCol).isNotNull)
      .select(col(totalKeyCol).as("_k"),
        (col(totalCol).cast("decimal(18,4)") * 100).cast("long").as("_t"))
    val grp = Window.partitionBy(col("_k"))
    // the testdata carries DUPLICATE (orderkey, linenumber) pairs, so
    // the bonus-cent order includes the weight: rows then tie only when
    // fully identical, making the output MULTISET deterministic (either
    // assignment among identical rows yields the same rows)
    val ord = Window.partitionBy(col("_k"))
      .orderBy(col("_rem").desc, col("_line"), col("_w"))
    li.join(t, Seq("_k"))
      .withColumn("_ww", sum(col("_w")).over(grp))
      .withColumn("_base", expr("(_t * _w) DIV _ww"))
      .withColumn("_rem", expr("(_t * _w) % _ww"))
      .withColumn("_leftover", col("_t") - sum(col("_base")).over(grp))
      .withColumn("_rk", row_number().over(ord).cast("long"))
      .select(col("_k").as(keyCol), col("_line").as(lineCol),
        (col("_base") + when(col("_rk") <= col("_leftover"), 1L)
          .otherwise(0L)).as("alloc_cents"))
  }

  /** q147: o_totalprice allocated across the order's lineitems by
    * extended-price weight; Σ alloc_cents per order ≡ the order's
    * total cents. */
  def q147Proration(s: SparkSession, d: String): DataFrame =
    prorate(Tables.lineitem(s, d), "l_orderkey", "l_linenumber",
      "l_extendedprice", Tables.orders(s, d), "o_orderkey",
      "o_totalprice")

  /** q163: business-day SLA arithmetic — each order's due date is the
    * 3rd business day strictly after its order date, skipping weekends
    * and company holidays (first Monday of each month — the reference's
    * first-Monday season anchor, helper_functions.py:7-85, repurposed
    * as a holiday rule). The classic calendar-dimension pattern: a
    * BOUNDED day grid (span + 40-day pad) carries a running
    * business-day count, so "k business days after d" is pure rank
    * arithmetic — rank(due) = bd_count(d) + k — and the fact table
    * resolves it with TWO BROADCAST joins (date → bd_count, rank →
    * date): the orders never shuffle, the same plan at 100 TB. The
    * single-partition running count is over the ~2.5 k-row calendar
    * artifact, not data (the PQ-codebook bounded-artifact rule).
    */
  def q163BusinessDays(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderdate"))
    val span = orders.agg(to_date(min(col("o_orderdate"))).as("lo"),
      to_date(max(col("o_orderdate"))).as("hi"))
    val cal = span
      .select(explode(expr(
        "sequence(lo, date_add(hi, 40), INTERVAL 1 DAY)")).as("day"))
      // Spark dayofweek: 1=Sun..7=Sat; Monday = 2
      .withColumn("_bday", dayofweek(col("day")).between(2, 6) &&
        !(dayofweek(col("day")) === 2 && dayofmonth(col("day")) <= 7))
      .withColumn("bd_count", // calendar-bounded global window
        sum(when(col("_bday"), 1L).otherwise(0L)).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // timestamp_ntz: o_orderdate reads as NTZ from parquet on Spark
    // 4.1 — keep the output homogeneous (and oracle-comparable)
    val ranks = cal.filter(col("_bday"))
      .select(col("bd_count").as("_target"),
        col("day").cast("timestamp_ntz").as("sla_due"))
    orders
      .join(broadcast(cal.select(col("day"), col("bd_count"))),
        to_date(col("o_orderdate")) === col("day"))
      .withColumn("_target", col("bd_count") + 3L)
      .join(broadcast(ranks), Seq("_target"))
      .select(col("o_orderkey"), col("o_orderdate"), col("sla_due"))
  }

  /** As-of snapshot (time travel) over an SCD2 history: the dimension
    * exactly as it stood at `at` — the read side of the type-2 contract
    * ([[scd2]] builds it, [[incrementalScd2]] maintains it, this
    * reconstructs any past state without storing per-day copies). A
    * pure interval filter: valid_from ≤ at < valid_to (open current
    * rows qualify via NULL valid_to) — pushed to the scan, no shuffle
    * at all. Reference counterpart: the warehouse's point-in-time
    * reporting views, sql/db_creation_script.sql:185-242.
    */
  def asOfSnapshot(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** q164: the customer-priority dimension as of 1995-06-01. */
  def q164AsOfSnapshot(s: SparkSession, d: String): DataFrame =
    asOfSnapshot(q92Scd2(s, d), lit("1995-06-01").cast("timestamp_ntz"))
      .select(col("custkey"), col("priority"), col("valid_from"),
        col("valid_to"))

  /** q161: EXACT distinct users per event type via the fixed-domain
    * bitmap aggregate (`functions/BitmapDistinct.scala`) — the
    * countDistinct answer WITHOUT shuffling the distinct keyset: the
    * word-wise-OR buffer map-side-combines, so the wire carries one
    * ⌈domain/64⌉-word bitmap per (partition × group). The domain comes
    * from parquet FOOTER column statistics (`TableStatistics
    * .parquetLongColumnMax`) — catalog metadata, no sizing job (the
    * q85 BloomJoin rule). Oracle = plain COUNT(DISTINCT): exactness is
    * externally checkable, unlike any sketch.
    */
  /** Key domains the single dense bitmap covers; larger domains chunk.
    * Conf-overridable so tests can force the chunked path.
    */
  private def denseBitmapMax(s: SparkSession): Long =
    s.conf.getOption("spark.graft.bitmap.denseMaxDomain")
      .map(_.toLong).getOrElse(1L << 26)

  /** Exact distinct keys + row count per group. Domains ≤
    * [[denseBitmapMax]] ride ONE dense bitmap per group; above that —
    * where a dense buffer would outgrow executor memory — the key
    * space chunks into 2¹⁶-wide slices and the SAME dense aggregate
    * runs per (group, chunk): the roaring-bitmap idea expressed
    * relationally. Chunks partition the domain, so per-chunk distinct
    * counts SUM exactly; the shuffle carries one 1024-word buffer per
    * (partition × group × occupied chunk) — proportional to occupied
    * key space, never to the domain — and the map-side combine is the
    * same word-wise OR. No cap, no loud failure, still exact.
    */
  private[graft] def bitmapDistinctPerGroup(df: DataFrame, groupCol: String,
      keyCol: String, domain: Long): DataFrame = {
    val s = df.sparkSession
    if (domain <= denseBitmapMax(s)) {
      val bitmap = udaf(new graft.functions.BitmapDistinct(domain),
        org.apache.spark.sql.Encoders.scalaLong)
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(groupCol))
        .agg(bitmap(col(keyCol)).as("distinct_users"),
          count(lit(1)).cast("long").as("n_events"))
    } else {
      val bitmap = udaf(new graft.functions.BitmapDistinct(1L << 16),
        org.apache.spark.sql.Encoders.scalaLong)
      df.filter(col(keyCol).isNotNull)
        .select(col(groupCol), shiftrightunsigned(col(keyCol), 16)
          .as("_chunk"), col(keyCol).bitwiseAND(lit(65535L)).as("_off"))
        .groupBy(col(groupCol), col("_chunk"))
        .agg(bitmap(col("_off")).as("_d"),
          count(lit(1)).cast("long").as("_n"))
        .groupBy(col(groupCol))
        .agg(sum(col("_d")).cast("long").as("distinct_users"),
          sum(col("_n")).cast("long").as("n_events"))
    }
  }

  def q161BitmapDistinct(s: SparkSession, d: String): DataFrame = {
    val maxUser = graft.sources.TableStatistics
      .parquetLongColumnMax(s, s"$d/events.parquet", "user_id")
      .getOrElse(throw new IllegalStateException(
        "events.user_id lacks parquet footer statistics"))
    bitmapDistinctPerGroup(Tables.events(s, d), "event_type", "user_id",
      maxUser + 1)
  }

  /** q175: sequence-gap detection — the missing RANGES of a surrogate
    * key (here o_orderkey): each output row is one maximal hole
    * [gap_start, gap_end] in the observed sequence. The completeness
    * audit a warehouse load runs after every ingest (did the extract
    * skip ids?) — the sequence-side complement of q55's FK-orphan
    * check (reference dedup/insert contract,
    * etl_pipeline_script.py:40-48). The classic gaps-and-islands
    * formulation needs each key's successor: a GLOBAL lead() window is
    * a single-reducer sort, so instead the keys get a `DistributedRank`
    * rank and successors come from an EQUI-join on rank+1 — hash-
    * partitioned by rank, no single reducer anywhere, identical
    * result. Output is bounded by the number of holes, not rows.
    */
  def sequenceGaps(df: DataFrame, keyCol: String): DataFrame = {
    val keys = df.select(col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isNotNull).distinct()
    val ranked = DistributedRank.withRank(keys, Nil, Seq("_k"), "_rn")
    ranked.as("a")
      .join(ranked.as("b"), col("b._rn") === col("a._rn") + 1)
      .filter(col("b._k") - col("a._k") > 1)
      .select((col("a._k") + 1).as("gap_start"),
        (col("b._k") - 1).as("gap_end"),
        (col("b._k") - col("a._k") - 1).as("n_missing"))
  }

  /** q175: holes in lineitem's l_orderkey coverage — order-key ranges
    * that ship zero lines (the o_orderkey space itself is dense, so
    * the fact side is where completeness can actually break). */
  def q175KeyGaps(s: SparkSession, d: String): DataFrame =
    sequenceGaps(Tables.lineitem(s, d), "l_orderkey")

  /** q169: exact audience-overlap matrix by bitmap algebra — for every
    * pair of event types, |users(A) ∩ users(B)| and the exact Jaccard,
    * computed from ONE fact scan: per-type membership BITMAPS
    * (`functions/BitmapAgg`) are the k-row artifact; every pairwise
    * intersection is then a word-wise AND + popcount on that artifact
    * — k(k−1)/2 EXACT overlap cardinalities with the fact table never
    * rescanned or self-joined (the naive plan is a per-pair
    * distinct-join — k² passes over the corpus; the oracle runs the
    * one-pass SQL equivalent). The k²-row pair table is bounded-
    * artifact work, so the interpreted HOF popcount is off the hot
    * path. Jaccard in round-half-up integer ppm (q58 rule).
    */
  /** The q169 core over any (group, key) frame. Past [[denseBitmapMax]]
    * the bitmaps chunk like [[bitmapDistinctPerGroup]]: per-(group,
    * chunk) 1024-word bitmaps, pairwise AND joined ON THE CHUNK (only
    * co-occupied chunks ever meet — sparse domains never touch absent
    * slices), popcounts summed per pair. Same algebra, any domain.
    */
  private[graft] def overlapMatrix(df: DataFrame, groupCol: String,
      keyCol: String, domain: Long): DataFrame = {
    val s = df.sparkSession
    def pop(c: Column): Column =
      aggregate(transform(c, w => bit_count(w).cast("long")), lit(0L),
        (acc, x) => acc + x)
    def jaccard(pairs: DataFrame): DataFrame = pairs
      .withColumn("jaccard_ppm", expr(
        """CAST((2 * CAST(overlap AS DECIMAL(38,0)) * 1000000
            + (n_a + n_b - overlap))
          DIV (2 * CAST(n_a + n_b - overlap AS DECIMAL(38,0)))
          AS BIGINT)"""))
    val keyed = df.filter(col(keyCol).isNotNull)
    if (domain <= denseBitmapMax(s)) {
      val bm = udaf(new graft.functions.BitmapAgg(domain),
        org.apache.spark.sql.Encoders.scalaLong)
      val sets = keyed.groupBy(col(groupCol))
        .agg(bm(col(keyCol)).as("_bits"))
      val a = sets.select(col(groupCol).as("type_a"),
        col("_bits").as("_ba"))
      val b = sets.select(col(groupCol).as("type_b"),
        col("_bits").as("_bb"))
      jaccard(a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          pop(zip_with(col("_ba"), col("_bb"),
            (x, y) => x.bitwiseAND(y))).as("overlap"),
          pop(col("_ba")).as("n_a"), pop(col("_bb")).as("n_b")))
    } else {
      val bm = udaf(new graft.functions.BitmapAgg(1L << 16),
        org.apache.spark.sql.Encoders.scalaLong)
      val sets = keyed
        .select(col(groupCol), shiftrightunsigned(col(keyCol), 16)
          .as("_chunk"), col(keyCol).bitwiseAND(lit(65535L)).as("_off"))
        .groupBy(col(groupCol), col("_chunk"))
        .agg(bm(col("_off")).as("_bits"))
        .withColumn("_pop", pop(col("_bits")))
        .localCheckpoint(false) // feeds sizes + both pair sides
      val sizes = sets.groupBy(col(groupCol))
        .agg(sum(col("_pop")).cast("long").as("_n"))
      val a = sets.select(col(groupCol).as("type_a"), col("_chunk"),
        col("_bits").as("_ba"))
      val b = sets.select(col(groupCol).as("type_b"), col("_chunk"),
        col("_bits").as("_bb"))
      val overlaps = a
        .join(b, a("_chunk") === b("_chunk") &&
          col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(pop(zip_with(col("_ba"), col("_bb"),
          (x, y) => x.bitwiseAND(y)))).cast("long").as("overlap"))
      // pair skeleton from the bounded sizes table: pairs sharing NO
      // occupied chunk never meet in the chunk join but still owe a
      // zero-overlap row (the dense path emits every pair)
      val skeleton = sizes
        .select(col(groupCol).as("type_a"), col("_n").as("n_a"))
        .join(sizes.select(col(groupCol).as("type_b"),
          col("_n").as("n_b")), col("type_a") < col("type_b"))
      jaccard(skeleton
        .join(overlaps, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          coalesce(col("overlap"), lit(0L)).as("overlap"),
          col("n_a"), col("n_b")))
    }
  }

  def q169OverlapMatrix(s: SparkSession, d: String): DataFrame = {
    val maxUser = graft.sources.TableStatistics
      .parquetLongColumnMax(s, s"$d/events.parquet", "user_id")
      .getOrElse(throw new IllegalStateException(
        "events.user_id lacks parquet footer statistics"))
    overlapMatrix(Tables.events(s, d), "event_type", "user_id",
      maxUser + 1)
  }

  /** q180: customer tier migration matrix — every customer tiered by
    * 1995 and 1996 order count (none/one-time/repeat/loyal at 0, 1,
    * 2–3, 4+) and the year-over-year transition counts, including the
    * churn row (active → none) and acquisition row (none → active):
    * the retention snapshot a subscription business reads weekly (the
    * temporal completion of q166's static RFM cut). ONE fact scan —
    * both years come from conditional aggregates in a single
    * map-side-combined groupBy (the q177 rule), tiers are CASE
    * arithmetic, the matrix is a ≤16-cell aggregate. Migration share
    * within each origin tier in round-half-up ppm.
    */
  def q180TierMigration(s: SparkSession, d: String): DataFrame = {
    def tier(c: Column): Column =
      when(c === 0, "none").when(c === 1, "one_time")
        .when(c <= 3, "repeat").otherwise("loyal")
    val per = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .withColumn("_yr", year(col("o_orderdate")))
      .filter(col("_yr").isin(1995, 1996))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("_yr") === 1995, 1L).otherwise(0L)).as("c1"),
        sum(when(col("_yr") === 1996, 1L).otherwise(0L)).as("c2"))
      .select(tier(col("c1")).as("tier_from"),
        tier(col("c2")).as("tier_to"))
    val cells = per.groupBy(col("tier_from"), col("tier_to"))
      .agg(count(lit(1)).cast("long").as("n_customers"))
    val fromTot = cells.groupBy(col("tier_from"))
      .agg(sum(col("n_customers")).cast("long").as("_ft"))
    cells.join(broadcast(fromTot), "tier_from")
      .select(col("tier_from"), col("tier_to"), col("n_customers"),
        expr("""CAST((2 * CAST(n_customers AS DECIMAL(38,0)) * 1000000
            + _ft) DIV (2 * CAST(_ft AS DECIMAL(38,0))) AS BIGINT)""")
          .as("share_ppm"))
  }

  /** q178: repeat-purchase decay curve — for each order depth n, how
    * many customers ever reach their n-th order, the share of the
    * customer base (ppm), and the n→n+1 continuation rate (ppm): the
    * "how sticky is purchase #2" curve that cohort grids (q81) hide by
    * slicing on calendar time instead of depth. One fact aggregate
    * (orders per customer, map-side combined) → one bounded
    * (depth, count) table via explode-free ≥-counting: customers with
    * c orders contribute to depths 1..c, which is a join against the
    * TINY depth spine (≤ maxDepth rows, broadcast) — the fact table
    * shuffles once. All ratios round-half-up integer ppm.
    */
  def q178RepeatDecay(s: SparkSession, d: String): DataFrame = {
    val maxDepth = 12
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = per.agg(count(lit(1)).cast("long").as("n_cust"))
    val spine = s.range(1, maxDepth + 1).toDF("depth")
    val reached = per.join(broadcast(spine), col("c") >= col("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).cast("long").as("n_reached"))
    val w = Window.orderBy(col("depth")) // bounded ≤ maxDepth rows
    reached.crossJoin(broadcast(tot))
      .withColumn("_next", lead(col("n_reached"), 1).over(w))
      .select(col("depth"), col("n_reached"),
        expr("""CAST((2 * CAST(n_reached AS DECIMAL(38,0)) * 1000000
            + n_cust) DIV (2 * CAST(n_cust AS DECIMAL(38,0)))
          AS BIGINT)""").as("share_ppm"),
        when(col("_next").isNotNull, expr(
          """CAST((2 * CAST(_next AS DECIMAL(38,0)) * 1000000
              + n_reached) DIV (2 * CAST(n_reached AS DECIMAL(38,0)))
            AS BIGINT)""")).as("continue_ppm"))
  }

  /** q179: inter-purchase gap distribution — per customer, the day
    * gaps between consecutive orders; reported as the gap histogram in
    * week buckets plus each bucket's share (ppm): the replenishment-
    * cycle profile behind churn prediction (q149's survival input) and
    * campaign timing. The per-entity lag runs in a customer-keyed
    * window (the q79 sessionization shape — bounded per entity, no
    * global sort); the histogram is one map-side-combined aggregate.
    * Same-day repeat orders land in bucket 0; gaps ≥ 52 weeks clamp
    * into the tail bucket (CASE-mirrored in the oracle).
    */
  def q179PurchaseGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .withColumn("_prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(least(
        expr("(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "- unix_micros(CAST(_prev AS TIMESTAMP))) DIV 604800000000"),
        lit(52L)).as("week_bucket"))
    val hist = gaps.groupBy(col("week_bucket"))
      .agg(count(lit(1)).cast("long").as("n_gaps"))
    val tot = hist.agg(sum(col("n_gaps")).cast("long").as("n_total"))
    hist.crossJoin(broadcast(tot))
      .select(col("week_bucket"), col("n_gaps"),
        expr("""CAST((2 * CAST(n_gaps AS DECIMAL(38,0)) * 1000000
            + n_total) DIV (2 * CAST(n_total AS DECIMAL(38,0)))
          AS BIGINT)""").as("share_ppm"))
  }

  /** q177: price–volume variance decomposition — the FP&A bridge
    * explaining a revenue change: per brand, Δrev between 1995 and
    * 1996 splits EXACTLY into a price effect (r₂ − q₂·p₁, what revenue
    * moved because unit price moved) and a volume effect (q₂·p₁ − r₁,
    * what moved because quantity moved), with p₁ = r₁/q₁ kept RATIONAL
    * — the two effects are (r₂·q₁ − r₁·q₂)/q₁ and r₁·(q₂ − q₁)/q₁,
    * integer numerators in DECIMAL(38,0) over the exact cents/units
    * sums, so price_eff + vol_eff ≡ Δrev identically before the final
    * round-half-up to cents (SIGNED → the q148/q153 sign-split rule).
    * The generalization of the reference's season-over-season usage
    * delta views (sql/db_creation_script.sql:224-242).
    *
    * ONE fact scan: both periods come from conditional aggregates in a
    * single map-side-combined groupBy (no self-join of the fact
    * table); the brand dimension broadcasts. Brands missing a period
    * report Δrev with NULL effects (no p₁ to price against) —
    * CASE-mirrored in the oracle.
    */
  def q177PriceVolumeMix(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate").isNotNull)
      .withColumn("_yr", year(col("l_shipdate")))
      .filter(col("_yr").isin(1995, 1996))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    def su(yr: Int, c: Column) =
      sum(when(col("_yr") === yr, c).otherwise(lit(0L)))
        .cast("decimal(38,0)")
    val agg = li.groupBy(col("p_brand"))
      .agg(
        su(1995, (col("l_extendedprice").cast("decimal(18,4)") * 100)
          .cast("long")).as("r1"),
        su(1996, (col("l_extendedprice").cast("decimal(18,4)") * 100)
          .cast("long")).as("r2"),
        su(1995, (col("l_quantity").cast("decimal(18,4)") * 10000)
          .cast("long")).as("q1"),
        su(1996, (col("l_quantity").cast("decimal(18,4)") * 10000)
          .cast("long")).as("q2"))
    def sdiv(num: String, den: String) = expr(
      s"""CASE WHEN $num >= 0
            THEN CAST((2 * $num + $den) DIV (2 * $den) AS BIGINT)
            ELSE -CAST((2 * (-($num)) + $den) DIV (2 * $den) AS BIGINT)
          END""")
    agg
      .withColumn("_pe_num", expr("r2 * q1 - r1 * q2"))
      .withColumn("_ve_num", expr("r1 * (q2 - q1)"))
      .select(col("p_brand"),
        col("r1").cast("long").as("rev1_cents"),
        col("r2").cast("long").as("rev2_cents"),
        (col("r2") - col("r1")).cast("long").as("delta_cents"),
        when(col("q1") > 0 && col("q2") > 0,
          sdiv("_pe_num", "q1")).as("price_eff_cents"),
        when(col("q1") > 0 && col("q2") > 0,
          sdiv("_ve_num", "q1")).as("volume_eff_cents"))
  }

  /** q176: re-aggregatable QUANTILE rollup — per-(type, day) DDSketch
    * bucket arrays (`functions/DdSketch.scala`) merge to per-type
    * p50/p95/p99 WITHOUT rescanning rows: the q162 rollup pattern for
    * percentiles, with a sketch that is deterministic BY CONSTRUCTION
    * (fixed log-γ buckets, element-wise-add merge) where the
    * DataSketches KLL/REQ family compacts by random sampling and
    * breaks the determinism contract. The daily bucket table is the
    * persisted KB-scale artifact; any grain derives from `LongVectorSum`
    * merges at artifact scale; quantile extraction walks the bounded
    * k×2048 exploded artifact (per-type running sum + first bucket
    * reaching ⌈q·n⌉ — nearest-rank, the q52 convention). Estimates
    * carry the DDSketch ≤ 1% relative-error guarantee (suite-asserted
    * vs exact). FULL hash oracle (r9): bucket boundaries and estimates
    * are exact rationals (⌊(102/100)^i⌋ by BigInteger — see
    * [[graft.functions.DdSketch.BoundaryUnits]]), so DuckDB replays the
    * whole pipeline from a literal (pos, lo, hi, est) range table and
    * the integer nearest-rank rule — no libm anywhere on either side.
    */
  def q176QuantileRollup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val dd = udaf(new graft.functions.DdSketchAgg, Encoders.scalaLong)
    val vsum = udaf(new graft.functions.LongVectorSum,
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Long]]())
    val daily = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long")
          .as("u"))
      .groupBy(col("event_type"), col("day"))
      .agg(dd(col("u")).as("sk"), count(lit(1)).cast("long").as("n"))
    val merged = daily.groupBy(col("event_type"))
      .agg(vsum(col("sk")).as("sk"),
        sum(col("n")).cast("long").as("n_events"),
        count(lit(1)).cast("long").as("n_days"))
    val ex = merged
      .select(col("event_type"), col("n_events"), col("n_days"),
        posexplode(col("sk")).as(Seq("pos", "c")))
      .filter(col("c") > 0)
    val w = Window.partitionBy(col("event_type")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ex.withColumn("cum", sum(col("c")).over(w))
    // nearest-rank target in pure integers: cum ≥ ⌈p·n/100⌉ ⇔
    // 100·cum ≥ p·n — no double ceil, engine-exact (the q21 ratio rule)
    def firstBucket(p: Int, name: String) =
      min(when(col("cum") * 100 >= lit(p) * col("n_events"), col("pos")))
        .as(name)
    // bucket estimate from the exact integer table (a 2048-long
    // broadcast literal), not a double pow rounded at the ulp
    val estArr = lit(graft.functions.DdSketch.EstimateUnits)
    def est(c: Column): Column = element_at(estArr, (c + 1).cast("int"))
    cum.groupBy(col("event_type"), col("n_events"), col("n_days"))
      .agg(firstBucket(50, "_i50"), firstBucket(95, "_i95"),
        firstBucket(99, "_i99"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        est(col("_i50")).as("p50_units"),
        est(col("_i95")).as("p95_units"),
        est(col("_i99")).as("p99_units"))
  }

  /** The q162 artifact: per-(type, day) HLL sketches unioned to
    * per-type estimates WITHOUT rescanning rows (Spark 4 DataSketches
    * `hll_sketch_agg`/`hll_union_agg`) — the materialized-rollup
    * pattern a 100 TB metrics store runs on: the daily sketch table is
    * the persisted artifact (KBs per cell), any coarser grain derives
    * from sketch unions at artifact scale. Exposes the raw estimate
    * for the suite's tolerance checks.
    */
  private[graft] def sketchRollupDaily(s: SparkSession, d: String)
      : DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        count(lit(1)).cast("long").as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("n")).cast("long").as("n_events"),
        expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .as("est_users"))
  }

  /** q162: re-aggregatable NDV rollup, DRIVER-GATED. The estimate
    * itself has no ANSI oracle (DuckDB's HLL is a different sketch),
    * so the output carries the operator's CLAIMS as engine-exact
    * fields instead: exact day/event counts plus two booleans the
    * oracle asserts TRUE — `merge_invariant` (day→type, day→week→type,
    * and direct single-pass sketches all estimate identically: the
    * union is a slot-wise coupon max, associative and commutative, so
    * re-aggregation depth never skews the estimate) and
    * `est_within_2pct` (integer-arithmetic |est−exact|·100 ≤ 2·exact
    * + 100 against an in-query exact countDistinct — affordable at
    * gate scale; production trusts the sketch and drops this column).
    * Sketches are deterministic, so both booleans are reproducible
    * facts, not flaky tolerances — this upgrades q162 from a
    * rows-only check to a full hash oracle.
    */
  def q162SketchRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        count(lit(1)).cast("long").as("n"))
      .localCheckpoint(false) // feeds both rollup shapes
    val viaDay = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("n")).cast("long").as("n_events"),
        expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("_e_day"))
    val viaWeek = daily
      .groupBy(col("event_type"), date_trunc("week", col("day")).as("wk"))
      .agg(expr("hll_union_agg(sk, true)").as("skw"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(skw, true))")
        .as("_e_wk"))
    val direct = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .as("_e_direct"),
        countDistinct(col("user_id")).as("_exact"))
    viaDay.join(viaWeek, "event_type").join(direct, "event_type")
      .select(col("event_type"), col("n_days"), col("n_events"),
        (col("_e_day") === col("_e_wk") &&
          col("_e_day") === col("_e_direct")).as("merge_invariant"),
        (abs(col("_e_day") - col("_exact")) * 100 <=
          col("_exact") * 2 + 100).as("est_within_2pct"))
  }

  /** q181: EXACT trailing-7-day distinct users per day — the sliding-
    * window NDV every activity dashboard wants (WAU per day), which
    * naive SQL computes by re-scanning 7 days of facts PER output day
    * (the oracle does exactly that; at 100 TB that is 7× amortized
    * corpus re-read, and `approx_count_distinct` windows give up
    * exactness). Here the corpus is scanned ONCE into per-(day, 2¹⁶-
    * chunk) membership bitmaps — the q161/q169 chunked algebra, cost ∝
    * occupied key space — and the sliding union runs entirely on that
    * CALENDAR × chunks artifact: a banded self-join of the day spine
    * against the daily bitmaps, word-wise OR per (day, chunk)
    * ([[graft.functions.BitmapOr]] — the same persisted-artifact merge
    * that lets yesterday's bitmaps roll into any future window without
    * ever re-reading facts), then popcounts summed across chunks
    * (chunks partition the domain, so per-chunk distincts ADD
    * exactly). Deterministic, exact, re-aggregatable — and the window
    * length is a constant in the artifact join, not a fact-table scan
    * multiplier.
    */
  def q181RollingDistinct(s: SparkSession, d: String): DataFrame = {
    val bm = udaf(new graft.functions.BitmapAgg(1L << 16),
      org.apache.spark.sql.Encoders.scalaLong)
    val orAgg = udaf(new graft.functions.BitmapOr())
    def pop(c: Column): Column =
      aggregate(transform(c, w => bit_count(w).cast("long")), lit(0L),
        (acc, x) => acc + x)
    val daily = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"),
        shiftrightunsigned(col("user_id"), 16).as("_chunk"),
        col("user_id").bitwiseAND(lit(65535L)).as("_off"))
      .groupBy(col("day"), col("_chunk"))
      .agg(bm(col("_off")).as("_bits"),
        count(lit(1)).cast("long").as("_n"))
      .localCheckpoint(false) // feeds the spine and the banded join
    val spine = daily.groupBy(col("day"))
      .agg(sum(col("_n")).cast("long").as("n_events"))
    spine.as("s")
      .join(daily.as("t"),
        col("t.day").between(date_sub(col("s.day"), 6), col("s.day")))
      .groupBy(col("s.day").as("day"), col("s.n_events").as("n_events"),
        col("t._chunk"))
      .agg(orAgg(col("t._bits")).as("_u"))
      .groupBy(col("day"), col("n_events"))
      .agg(sum(pop(col("_u"))).cast("long").as("users_7d"))
      .select(col("day"), col("n_events"), col("users_7d"))
  }

  /** q183: k-step absorption probability into the `purchase` state —
    * "from each behavioral state, how likely does the user CONVERT
    * within 8 transitions" (Kemeny & Snell 1960 absorbing-chain
    * analysis; q113 gives the one-step matrix, q119 scores observed
    * flows — this answers the forward-looking question marketing
    * actually asks). `purchase` is MODELED absorbing: its outgoing
    * row is dropped and its value pins to 10⁶ ppm every round.
    *
    * Engine-exact like q105's PageRank: the one-step matrix is q113's
    * round-half-up integer ppm, and each iteration is
    * aₜ₊₁(s) = Σ_s' (p_ppm(s,s')·aₜ(s')) DIV 10⁶ — truncating
    * division on non-negative longs (Spark DIV ≡ DuckDB //), sums of
    * longs (order-free), so the 8-round fixed point is bit-identical
    * anywhere and the oracle replays it as 8 UNROLLED CTE steps.
    *
    * Scale shape: ONE corpus pass (the q113 per-user lead window)
    * producing the |types|²-bounded matrix — a SCHEMA constant (≤ a
    * few dozen rows at any corpus size), so collecting it and running
    * the 8 matrix-vector steps driver-side is bounded-artifact work
    * (the BPE-argmax/MMR-seeds rationale), not a distributed loop's 8
    * job floors. The corpus is never touched again.
    */
  def q183Absorption(s: SparkSession, d: String): DataFrame = {
    val absorbing = "purchase"
    val iters = 8
    val m = markovTransitions(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type")))
      .select(col("from_type"), col("to_type"), col("p_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (m.map(_._1) ++ m.map(_._2)).distinct
    val trans = m.filter(_._1 != absorbing)
    var a = states.map(st =>
      st -> (if (st == absorbing) 1000000L else 0L)).toMap
    for (_ <- 0 until iters) {
      val nxt = trans.groupBy(_._1).map { case (f, rows) =>
        f -> rows.map { case (_, t, p) => (p * a(t)) / 1000000L }.sum
      }
      a = states.map(st => st ->
        (if (st == absorbing) 1000000L else nxt.getOrElse(st, 0L))).toMap
    }
    import s.implicits._
    states.sorted.toSeq.map(st => (st, a(st)))
      .toDF("state", "p_convert_ppm")
  }

  /** q184: duplicate-payment audit — order pairs from the SAME
    * customer whose amounts agree within 5% and dates within 7 days
    * (the classic accounts-payable double-charge screen; the exact-key
    * q07/q23 dedups can't see these, q91's edit-distance join is the
    * text sibling). Blocking is the customer key: ONE equi-shuffle on
    * o_custkey, and per-customer order counts are bounded (≤ tens), so
    * the within-block pair build never explodes — the amount and date
    * bands are post-join predicates (the q123 band rule), NOT join
    * dimensions. Amount test in integer e4: |a−b|·100 ≤ min(a,b)·5 —
    * engine-exact, no float ratio; day gap from date arithmetic.
    */
  def q184DupPayments(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      col("o_orderkey"), to_date(col("o_orderdate")).as("day"),
      (col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("long").as("amt"))
    o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey"))
      .filter(abs(datediff(col("a.day"), col("b.day"))) <= 7 &&
        abs(col("a.amt") - col("b.amt")) * 100 <=
          least(col("a.amt"), col("b.amt")) * 5)
      .select(col("a.o_custkey").as("custkey"),
        col("a.o_orderkey").as("orderkey_a"),
        col("b.o_orderkey").as("orderkey_b"),
        abs(datediff(col("a.day"), col("b.day"))).cast("long")
          .as("day_gap"),
        col("a.amt").as("amt_a_e4"), col("b.amt").as("amt_b_e4"))
  }

  /** q185: cohort lifetime-value curve — customers cohorted by first
    * order month; for each (cohort, months-since-first) the cumulative
    * revenue per cohort member (the LTV curve finance reads against
    * CAC; q81's retention grid counts WHO came back, this sums what
    * they were WORTH). Month arithmetic is integer y·12+m on both
    * engines (never float months_between); revenue rides e4 longs with
    * DECIMAL(38,0) accumulation; the cumulative window runs on the
    * BOUNDED cohorts×ages grid (a calendar square, never the fact
    * table), cohort sizes join back broadcast-size, and
    * ltv = cum_rev DIV n_customers is truncating division on
    * non-negatives (engine-identical).
    */
  def q185CohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("ym"),
      (col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("long").as("amt"))
    val coh = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("cym"))
      .localCheckpoint(false) // feeds sizes + the fact re-join
    val sizes = coh.groupBy(col("cym"))
      .agg(count(lit(1)).cast("long").as("n_customers"))
    val cells = o.join(coh, "o_custkey")
      .groupBy(col("cym"), (col("ym") - col("cym")).as("age_months"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(col("amt").cast("decimal(38,0)")).as("_rev"))
    val w = Window.partitionBy(col("cym")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("_cum", sum(col("_rev")).over(w))
      .join(broadcast(sizes), "cym")
      .select(expr("cym DIV 12").as("cohort_year"),
        (col("cym") % 12 + 1).as("cohort_month"),
        col("age_months"), col("n_customers"), col("n_orders"),
        expr("CAST(_cum DIV n_customers AS BIGINT)").as("ltv_e4"))
  }

  /** q182: market-concentration suite per customer segment — the three
    * standard inequality statistics over per-customer spend, all exact
    * rationals in ONE pass over the ranked artifact:
    *  - Gini coefficient G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    *    ascending (spend, custkey) total order (tie permutations leave
    *    Σ i·xᵢ unchanged, so the tie-break affects nothing),
    *  - Herfindahl–Hirschman index HHI = Σ xᵢ² / (Σx)²,
    *  - top-1 share = max(x)/Σx.
    * Spend rides e4 longs; the rank is [[DistributedRank]] with group
    * columns (range slices + broadcast offsets — never a per-segment
    * single-reducer window); moments accumulate in DECIMAL(38,0)
    * (order-free, engine-identical) and every output is round-half-up
    * integer ppm (q21 rule) — numerators provably non-negative, so no
    * signed-division trap. The reference eyeballs "who dominates" on
    * its win-rate views (sql/db_creation_script.sql:185-242); this is
    * that question made a calibrated statistic.
    */
  def q182Concentration(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000)
          .cast("long").as("_x"))
      .groupBy(col("o_custkey")).agg(sum(col("_x")).cast("long").as("x"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), "o_custkey")
    val ranked = DistributedRank.withRank(spend, Seq("segment"),
      Seq("x", "o_custkey"), "i")
    ranked.groupBy(col("segment"))
      .agg(count(lit(1)).cast("long").as("n_customers"),
        sum(col("x").cast("decimal(38,0)")).as("_sx"),
        sum(col("x").cast("decimal(38,0)") * col("i")).as("_six"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("_sxx"),
        max(col("x")).as("_xmax"))
      .select(col("segment"), col("n_customers"),
        // G = (2·Σix − (n+1)·Σx) / (n·Σx), ppm round-half-up
        expr("""CAST((2 * (2*_six - (n_customers+1)*_sx) * 1000000
              + n_customers*_sx)
            DIV (2 * n_customers * _sx) AS BIGINT)""").as("gini_ppm"),
        expr("""CAST((2 * _sxx * 1000000 + _sx*_sx)
            DIV (2 * _sx * _sx) AS BIGINT)""").as("hhi_ppm"),
        expr("""CAST((2 * CAST(_xmax AS DECIMAL(38,0)) * 1000000 + _sx)
            DIV (2 * _sx) AS BIGINT)""").as("top1_ppm"))
  }

  /** q190: golden-record survivorship merge (MDM master-data rule
    * stack): every order is an OBSERVATION of its customer, and the
    * golden record fuses conflicting observations per key with one
    * rule per attribute — MODE (most frequent status, ties to the
    * smallest value), LATEST (priority from the most recent order,
    * same-day ties to the highest orderkey), MAX (largest amount),
    * MIN (first-seen day) — then the CRM dimension wins outright for
    * its own attribute (segment). The multi-source upgrade of q12's
    * last-write-wins MERGE (db_ops.py:62-148): q12 keeps whole-row
    * winners; survivorship composes a row that never existed from
    * per-attribute winners.
    *
    * Shape: TWO map-side-combined aggregates (value-frequency, then
    * per-key fuse via struct-max argmax — no window over the fact
    * table, no per-key sort) + one broadcast dimension join. The
    * struct-max trick keeps every rule inside ONE hash aggregate, so
    * the fact table is scanned once and shuffled once on the key.
    */
  def q190GoldenRecord(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"), col("o_orderstatus"),
        col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000).cast("long")
          .as("amt_e4"))
    // MODE with deterministic ties: max over (cnt, -, value) is wrong
    // for "smallest value wins ties", so invert the count and take the
    // struct-MIN of (-cnt, value).
    val mode = obs.groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("o_custkey"))
      .agg(min(struct((-col("_c")).as("_nc"), col("o_orderstatus")))
        .as("_m"))
      .select(col("o_custkey"), col("_m.o_orderstatus").as("mode_status"))
    val fused = obs.groupBy(col("o_custkey"))
      .agg(
        max(struct(col("day"), col("o_orderkey"), col("o_orderpriority")))
          .as("_l"),
        max(col("amt_e4")).as("max_amount_e4"),
        min(col("day")).as("first_seen_day"),
        count(lit(1)).cast("long").as("n_obs"))
      .select(col("o_custkey"), col("_l.o_orderpriority")
        .as("latest_priority"), col("max_amount_e4"),
        col("first_seen_day"), col("n_obs"))
    fused.join(mode, "o_custkey")
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_custkey").as("custkey"), col("mode_status"),
        col("latest_priority"), col("max_amount_e4"),
        col("first_seen_day"), col("n_obs"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
  }

  /** q191: functional-dependency DISCOVERY via the g₃ error
    * (Kivinen & Mannila 1995; the TANE/metanome profiling metric):
    * for each candidate FD A→B, the minimum fraction of rows that
    * must be removed for the dependency to hold exactly —
    * g₃ = 1 − (Σ_a max_b count(a,b)) / n. Scores a fixed candidate
    * set over lineitem; g₃ = 0 certifies the FD (the schema-key
    * discovery the reference hardcodes as PRIMARY KEY choices in
    * sql/db_creation_script.sql — here it is MEASURED from data).
    *
    * Shape per candidate: a 2-column pruned scan → (A,B) count
    * aggregate → per-A max → one global sum. All map-side-combined;
    * the candidate list is a constant, so the union is a fixed fan of
    * independent 2-column passes (column pruning keeps each scan to
    * exactly its pair — the q01 pushdown rule). Violation ratio in
    * integer e4 round-half-up (non-negative, so no sign split).
    */
  def q191FdDiscovery(s: SparkSession, d: String): DataFrame = {
    val cands = Seq(
      ("l_orderkey", "l_returnflag"), ("l_orderkey", "l_linestatus"),
      ("l_partkey", "l_suppkey"), ("l_suppkey", "l_returnflag"),
      ("l_partkey", "l_returnflag"))
    cands.map { case (lhs, rhs) =>
      Tables.lineitem(s, d)
        .select(col(lhs).as("_a"), col(rhs).cast("string").as("_b"))
        .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
        .groupBy(col("_a")).agg(max(col("_c")).as("_mc"),
          sum(col("_c")).as("_n"))
        .agg(sum(col("_mc")).cast("long").as("keep_rows"),
          sum(col("_n")).cast("long").as("n_rows"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_rows"),
          col("keep_rows"),
          expr("""CAST((2 * (n_rows - keep_rows) * 10000 + n_rows)
                  DIV (2 * n_rows) AS BIGINT)""").as("g3_e4"))
    }.reduce(_ unionByName _)
  }

  /** q192: UNPIVOT / melt — the wide-to-long reshape (the inverse of
    * q44's pivot): a per-nation metric table (revenue, orders,
    * customers) melts into (nation, metric, value) rows, the layout
    * every generic KPI store and charting sink wants. Uses Spark's
    * native `unpivot` (Expand under the hood: one projection per
    * metric, zero shuffle beyond the feeding aggregate); metrics are
    * cast to one type (long — revenue in e4) because melt stacks them
    * into a single column.
    *
    * Shape: broadcast dim joins (nation is tiny) → one shuffle on
    * nationkey for the aggregate → Expand. The melt itself is
    * pipeline-local and costs |metrics|× the aggregate's (bounded)
    * row count, never the fact table's.
    */
  def q192Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum((col("o_totalprice").cast("decimal(18,4)") * 10000)
          .cast("long"))).cast("long").as("revenue_e4"),
        count(lit(1)).cast("long").as("n_orders"),
        countDistinct(col("o_custkey")).cast("long").as("n_customers"))
    wide.unpivot(Array(col("n_name")),
      Array(col("revenue_e4"), col("n_orders"), col("n_customers")),
      "metric", "value")
  }

  /** q196: LINEAR-interpolation gap fill of per-nation daily revenue —
    * the straight-line sibling of q99's LOCF resample (LOCF answers
    * "what was the last known state"; interpolation answers "what is
    * the best between-points estimate", the standard choice for
    * continuous KPIs before window/seasonal math). Every nation's
    * calendar spine runs from its first to its last observed day, so
    * every gap has both anchors and no null survives.
    *
    * Determinism: anchors via last/first IGNORE NULLS frames (both
    * engines); the interpolated increment is integer round-half-up
    * with the q148/q153 sign split (revenue deltas go negative), and
    * the division happens on the INCREMENT (v1−v0)·(t−t0)/(t1−t0) so
    * both engines round the identical rational.
    *
    * Scale shape: one broadcast-dim fact aggregate → the spine is the
    * bounded nations×days grid (sequence + explode, never a fact-scan
    * multiplier); windows partition by nation over the grid.
    */
  def q196InterpFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("long")).cast("long").as("v"))
      .localCheckpoint(false) // feeds the spine bounds AND the join
    val spine = daily.groupBy(col("n_name"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("n_name"),
        explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val wPrev = Window.partitionBy(col("n_name")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // "first over CURRENT..UNBOUNDED FOLLOWING" is Spark's from-scratch
    // O(n²) frame; the same anchor as a DESC running frame is O(n)
    val wNext = Window.partitionBy(col("n_name")).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("n_name", "day"), "left")
      .withColumn("_pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("_pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wPrev))
      .withColumn("_nv", last(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("_nd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wNext))
      .select(col("n_name"), col("day"),
        when(col("v").isNotNull, col("v")).otherwise(col("_pv") + expr(
          """CASE WHEN (_nv - _pv) >= 0
               THEN (2 * (_nv - _pv) * datediff(day, _pd)
                     + datediff(_nd, _pd)) DIV (2 * datediff(_nd, _pd))
               ELSE -((2 * (_pv - _nv) * datediff(day, _pd)
                       + datediff(_nd, _pd)) DIV (2 * datediff(_nd, _pd)))
             END""")).as("value_e4"),
        col("v").isNull.as("is_interp"))
  }

  /** q197: order-independent table fingerprint — the anti-entropy /
    * Merkle-leaf checksum for replica reconciliation and sink
    * validation (the integrity side of q41's ANALYZE stats and the
    * cheap precursor to q73's full snapshot diff: compare per-month
    * checksums first, diff ONLY the months that disagree). Each row
    * hashes to a 60-bit integer (15 hex chars of md5 over a
    * '|'-joined canonical payload — md5 because it must match the
    * oracle engine, the q23/q29 rule; floats enter as e4 longs, never
    * as engine-formatted float strings) and a month's checksum is the
    * BIT_XOR of its row hashes — commutative, associative, and
    * self-inverse, so it is map-side combinable, order-free, and a
    * replica diff localizes to the months whose XOR differs.
    *
    * Scale shape: ONE scan, ONE map-side-combined aggregate over the
    * bounded month grid; no joins, no windows.
    */
  def q197TableChecksum(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(coalesce(date_format(col("o_orderdate"), "yyyy-MM"),
        lit("unknown")).as("month"),
        conv(substring(md5(concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"),
          coalesce(col("o_orderstatus"), lit("∅")),
          (col("o_totalprice").cast("decimal(18,4)") * 10000)
            .cast("long").cast("string"),
          coalesce(to_date(col("o_orderdate")).cast("string"), lit("∅")),
          coalesce(col("o_orderpriority"), lit("∅")))), 1, 15), 16, 10)
          .cast("long").as("_h"))
      .groupBy(col("month"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        expr("bit_xor(_h)").cast("long").as("cksum"))

  /** q201: calendar revenue recognition — each order's e4 total spread
    * EVENLY across the months its fulfillment spans (order month →
    * last ship month), with the division remainder allocated to the
    * EARLIEST months (largest-remainder over a date range — the
    * finance-closing sibling of q147's per-group proration; deferred-
    * revenue schedules, subscription amortization, capacity planning
    * all want exactly this reshape). Conservation is exact BY
    * CONSTRUCTION: per order, Σ month allocations ≡ total (base·k +
    * rem), so the monthly table reconciles to the books to the unit.
    *
    * Shapes: one lineitem aggregate for the per-order ship horizon
    * (map-side combined), one orders join, then each order explodes to
    * its ≤ |calendar| month span — output is calendar-scale. All
    * integer: base = total DIV k, month j gets +1 iff j < total MOD k.
    * Orders with no shipped lineitem have no recognition horizon and
    * drop (inner join, documented).
    */
  def q201RevenueRecognition(s: SparkSession, d: String): DataFrame = {
    val ship = Tables.lineitem(s, d)
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(max(date_trunc("month", col("l_shipdate"))).as("_m_end"))
    Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("_m_start"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000)
          .cast("long").as("_total"))
      .join(ship, col("o_orderkey") === col("l_orderkey"))
      .withColumn("_k", greatest(months_between(col("_m_end"),
        col("_m_start")).cast("long"), lit(0L)) + 1)
      .select(col("_total"), col("_k"), col("_m_start"),
        explode(sequence(lit(0L), col("_k") - 1)).as("_j"))
      .select(
        add_months(col("_m_start").cast("date"), col("_j").cast("int"))
          .as("month"),
        (expr("_total DIV _k") +
          when(col("_j") < col("_total") % col("_k"), 1L)
            .otherwise(0L)).as("_alloc"))
      .groupBy(col("month"))
      .agg(sum(col("_alloc")).cast("long").as("recognized_units"),
        count(lit(1)).cast("long").as("n_orders"))
  }

  /** q202: state dwell-time attribution — per event type, how long
    * users SIT in that state before their next action (gap to the
    * user's next event, capped at 30 min so session ends don't
    * attribute overnight idle to the last click). The engagement
    * decomposition behind "where does time go" product analytics; the
    * duration complement of q113's transition COUNTS.
    *
    * One user-keyed window (the q79/q94 single-shuffle shape) + one
    * map-combined aggregate. Engine-exact integers: gaps in µs, the
    * cap applied with `least` only AFTER the null next-event rows are
    * filtered (the q179 LEAST-skips-NULL rule), mean ms round-half-up
    * (non-negative — no sign split needed).
    */
  def q202DwellTime(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("_next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("_next_us").isNotNull) // BEFORE the cap, both engines
      .select(col("event_type"),
        least(col("_next_us") - unix_micros(col("ts")),
          lit(1800000000L)).as("_gap_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_intervals"),
        sum(col("_gap_us")).cast("long").as("total_dwell_us"))
      .withColumn("mean_dwell_ms", expr(
        "(2 * total_dwell_us + 1000 * n_intervals) DIV (2000 * n_intervals)"))
  }

  /** q204: semi-Markov transition latency — per (from_type → to_type)
    * consecutive-event edge, the EXACT nearest-rank median and p90 of
    * the time gap. q113 gives the transition probabilities; this gives
    * the tempo (queueing diagnosis: which edges are slow, not just
    * likely). Exact percentiles over |types|²-bounded groups whose
    * member counts are corpus-scale, so the ranking is
    * [[DistributedRank.withRank]] (range-partitioned — never a
    * per-group single-reducer sort on the two hottest edges), targets
    * picked by pure-integer ceil ranks, µs→ms round-half-up
    * (non-negative).
    */
  def q204TransitionLatency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("_nt", lead(col("event_type"), 1).over(w))
      .withColumn("_nus", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("_nt").isNotNull)
      .select(col("event_type").as("from_type"), col("_nt").as("to_type"),
        (col("_nus") - unix_micros(col("ts"))).as("_gap_us"),
        col("user_id"), col("event_id"))
      // r15: two consumers (the rank pass and the per-edge counts)
      // each re-ran the events scan + user window — materialize once
      .localCheckpoint(false)
    val ranked = DistributedRank.withRank(gaps,
      Seq("from_type", "to_type"),
      Seq("_gap_us", "user_id", "event_id"), "_rk")
    val counts = gaps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    ranked.join(broadcast(counts), Seq("from_type", "to_type"))
      .filter(col("_rk") === expr("(n + 1) DIV 2") ||
        col("_rk") === expr("(9 * n + 9) DIV 10"))
      .groupBy(col("from_type"), col("to_type"), col("n"))
      .agg(
        min(when(col("_rk") === expr("(n + 1) DIV 2"), col("_gap_us")))
          .as("_med_us"),
        min(when(col("_rk") === expr("(9 * n + 9) DIV 10"),
          col("_gap_us"))).as("_p90_us"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(2 * _med_us + 1000) DIV 2000").as("median_gap_ms"),
        expr("(2 * _p90_us + 1000) DIV 2000").as("p90_gap_ms"))
  }

  /** q203: contribution / share-of-parent rollup — nation revenue with
    * its ppm share WITHIN its region, and the region's ppm share of
    * the global total (the drill-down every exec dashboard renders
    * next to q43's ROLLUP totals; rollup gives the totals, this gives
    * the mix). ONE fact aggregate to nation grain (dims broadcast);
    * every parent total then derives from the BOUNDED nation table —
    * no window, no second fact scan. DECIMAL(38,0) internal sums
    * (100 TB e4 revenue), integer round-half-up ppm (non-negative),
    * long outputs.
    */
  def q203ShareOfParent(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables.region(s, d)
      .select(col("r_regionkey"), col("r_name"))
    val natRev = Tables.orders(s, d)
      .filter(col("o_totalprice").isNotNull)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum((col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("long")).cast("decimal(38,0)").as("_rev"))
    val regTot = natRev.groupBy(col("region"))
      .agg(sum(col("_rev")).cast("decimal(38,0)").as("_rr"))
    val global = regTot.agg(sum(col("_rr")).cast("decimal(38,0)")
      .as("_g"))
    natRev.join(broadcast(regTot), "region").crossJoin(broadcast(global))
      .select(col("region"), col("nation"),
        col("_rev").cast("long").as("rev_units"),
        expr("CAST((2000000 * _rev + _rr) DIV (2 * _rr) AS BIGINT)")
          .as("nation_share_ppm"),
        col("_rr").cast("long").as("region_rev_units"),
        expr("CAST((2000000 * _rr + _g) DIV (2 * _g) AS BIGINT)")
          .as("region_share_ppm"))
  }

  /** q206: session ENTRY paths — the first ≤3 event types of every
    * 4-h-gap session (q79's session convention), concatenated in
    * order, with the top-20 most common paths. "How do sessions
    * start" is the product question q79's durations and q80's fixed
    * funnel don't answer; the path table is what landing-page and
    * onboarding work is prioritized from. Two user-keyed windows (one
    * shuffle key) + a session-grain aggregate; the top-20 is a total
    * order (count desc, path) so the LIMIT is deterministic in both
    * engines.
    */
  def q206EntryPaths(s: SparkSession, d: String): DataFrame = {
    val gapUs = 4L * 3600 * 1000000
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("_us", unix_micros(col("ts")))
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("user_id"), col("_sid"))
      .orderBy(col("ts"), col("event_id"))
    sess.withColumn("_rn", row_number().over(ws))
      .filter(col("_rn") <= 3)
      .groupBy(col("user_id"), col("_sid"))
      .agg(concat_ws(" > ", transform(
        array_sort(collect_list(struct(col("_rn").as("r"),
          col("event_type").as("t")))),
        e => e.getField("t"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** q208: TIME-weighted average price per brand (TWAP — the
    * market-data convention): each observed price weighted by how long
    * it stood until the next observation, over the brand's full
    * observation span. An arithmetic mean over-weights bursts of
    * quotes; TWAP is what "average price over the period" actually
    * means for irregular event-time series (metering, spot pricing,
    * sensor rollups). One brand-keyed window + one map-combined
    * aggregate; Σ price·Δt in DECIMAL(38,0) (µs spans × e4 prices
    * overflow long), round-half-up to e4 units.
    *
    * Determinism under same-timestamp ties: ordering adds (price,
    * orderkey, linenumber) after the timestamp, so zero-width
    * segments pair identically in both engines — and rows that remain
    * ambiguous are full duplicates, where the order cannot change the
    * sum. Brands with a single observation have no span and emit NULL
    * twap (no time to average over).
    */
  def q208Twap(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.lineitem(s, d)
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        unix_micros(date_trunc("day", col("l_shipdate"))).as("_us"),
        (col("l_extendedprice").cast("decimal(18,4)") * 10000)
          .cast("long").as("_p"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("_us"), col("_p"), col("l_orderkey"),
        col("l_linenumber"))
    obs
      .withColumn("_nus", lead(col("_us"), 1).over(w))
      .filter(col("_nus").isNotNull)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("long").as("n_segments"),
        sum(col("_p").cast("decimal(19,0)") *
          (col("_nus") - col("_us"))).cast("decimal(38,0)").as("_num"),
        sum(col("_nus") - col("_us")).cast("decimal(38,0)").as("_den"))
      .select(col("p_brand"), col("n_segments"),
        when(col("_den") > 0,
          expr("CAST((2 * _num + _den) DIV (2 * _den) AS BIGINT)"))
          .as("twap_units"))
  }

  /** q215: period-over-period TOP MOVERS — which brands drove the
    * 1995→1996 revenue change, each with its signed ppm contribution
    * to the total ABSOLUTE change (the "why did the number move"
    * decomposition an exec review starts from; q177 splits ONE
    * brand's change into price/volume, this ranks the movers across
    * brands). One fact aggregate + broadcast part dim; Σ|Δ| is the
    * stable denominator (a net-zero quarter would blow up shares of
    * net Δ); signed ppm uses the q148/q153 sign split; the top-15 cut
    * is a total order (|Δ| desc, brand) over the BOUNDED brand table.
    */
  def q215TopMovers(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate").isNotNull)
      .withColumn("_yr", year(col("l_shipdate")))
      .filter(col("_yr").isin(1995, 1996))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    def su(yr: Int) = sum(when(col("_yr") === yr,
      (col("l_extendedprice").cast("decimal(18,4)") * 10000)
        .cast("long")).otherwise(lit(0L))).cast("decimal(38,0)")
    val agg = li.groupBy(col("p_brand"))
      .agg(su(1995).as("_r1"), su(1996).as("_r2"))
      .withColumn("_d", col("_r2") - col("_r1"))
    val tot = agg.agg(sum(abs(col("_d"))).cast("decimal(38,0)")
      .as("_ta"))
    agg.crossJoin(broadcast(tot))
      .select(col("p_brand"),
        col("_r1").cast("long").as("rev1_units"),
        col("_r2").cast("long").as("rev2_units"),
        col("_d").cast("long").as("delta_units"),
        expr("""CASE WHEN _d >= 0
             THEN CAST((2000000 * _d + _ta) DIV (2 * _ta) AS BIGINT)
             ELSE -CAST((2000000 * (-_d) + _ta) DIV (2 * _ta) AS BIGINT)
           END""").as("contrib_ppm"))
      .orderBy(abs(col("delta_units")).desc, col("p_brand"))
      .limit(15)
  }

  /** q205: k-anonymity audit over the (nation, market-segment) quasi-
    * identifier — for each disclosure threshold k, how many identifier
    * groups fall below k members and how many ROWS sit in them (the
    * re-identification exposure). The privacy screen a training-data
    * release runs before publishing joins of user attributes; the
    * reference has no analogue (its data is public game stats) but any
    * pipeline exporting per-user tables needs exactly this report.
    * One group-size aggregate (map-combined) + a constant threshold
    * fan over the BOUNDED group-size table; risk share in integer ppm.
    */
  def q205KAnonymity(s: SparkSession, d: String): DataFrame = {
    val sizes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).cast("long").as("_g"))
      .localCheckpoint(false) // bounded: |nations|×|segments| rows
    val tot = sizes.agg(sum(col("_g")).cast("long").as("_n"),
      count(lit(1)).cast("long").as("n_groups"),
      min(col("_g")).cast("long").as("min_group_size"))
    Seq(2L, 5L, 10L, 25L).map { k =>
      sizes.filter(col("_g") < k)
        .agg(coalesce(count(lit(1)), lit(0L)).cast("long")
            .as("n_groups_below"),
          coalesce(sum(col("_g")), lit(0L)).cast("long")
            .as("rows_at_risk"))
        .withColumn("k", lit(k))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_groups"), col("min_group_size"),
        col("n_groups_below"), col("rows_at_risk"),
        expr("(2000000 * rows_at_risk + _n) DIV (2 * _n)")
          .as("risk_ppm"))
  }

  /** q212: SHAPLEY-VALUE channel attribution (Shapley 1953; the
    * data-driven attribution model behind Google's DDA, Zhao et al.
    * 2018) — the game-theoretic answer to "which channel deserves the
    * conversion credit" that q123's rule-based position weights
    * approximate. Journeys are user-days; the characteristic function
    * v(S) = converted journeys whose touched channel set ⊆ S; channel
    * i's credit is φᵢ = Σ_{S∌i} |S|!(n−1−|S|)!/n! · (v(S∪{i}) − v(S)).
    * Satisfies efficiency exactly: Σφᵢ = v(N) − v(∅) (conversions not
    * explained by the no-touch baseline) — the suite asserts it.
    *
    * Scale shape: the ONLY corpus-scale work is one map-combined
    * bit-OR aggregate to (user, day) journeys and one count rollup to
    * ≤2ⁿ exact touch-set rows; everything after runs on the bounded
    * 2ⁿ lattice (n = |channels|, here 4): v(S) by a broadcast
    * subset-containment join, φ by an n·2ⁿ⁻¹-pair self-join. All
    * arithmetic exact: factorial weights as long literals, sums in
    * DECIMAL(38,0) (n!·v(N) at 10⁹ journeys × n=10 tops 3.6×10¹⁵),
    * φ scaled by n! until the final integer round-half-up emission.
    * Reference analogue: the battlelog win-attribution views
    * (sql/db_creation_script.sql:185-242) generalized from single-card
    * credit to coalition credit.
    */
  def q212ShapleyAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
    // bounded artifact: the channel alphabet (distinct event types)
    val chans = ev.filter(col("event_type").isNotNull
        && col("event_type") =!= "purchase")
      .select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val n = chans.length
    // fact(n) overflows Long at n ≥ 21 and the 2^n coalition lattice
    // explodes well before that — fail loudly instead of silently
    // overflowing if the channel alphabet ever grows past exact range
    require(n <= 20,
      s"q212ShapleyAttribution: $n channels — the exact 2^n lattice " +
        "and n! weights need n <= 20; sample or bucket channels first")
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val nf = fact(n)
    // w(|S|) = |S|!·(n−1−|S|)! for |S| = 0..n−1
    val wArr = array((0 until n).map(sz =>
      lit(fact(sz) * fact(n - 1 - sz))): _*)
    val bitOf = chans.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (c, i)) =>
        when(col("event_type") === c, lit(1L << i)).otherwise(acc)
    }
    val journeys = ev
      .select(col("user_id"), to_date(col("ts")).as("day"),
        bitOf.as("_bit"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("_p"))
      .groupBy(col("user_id"), col("day"))
      .agg(coalesce(expr("bit_or(_bit)"), lit(0L)).as("mask"),
        max(col("_p")).as("_conv"))
    val jm = journeys.groupBy(col("mask"))
      .agg(sum(col("_conv")).cast("long").as("_c"))
    val vs = s.range(0, 1L << n).toDF("vmask")
      .join(broadcast(jm),
        col("mask").bitwiseAND(col("vmask")) === col("mask"), "left")
      .groupBy(col("vmask"))
      .agg(coalesce(sum(col("_c")), lit(0L)).cast("long").as("v"))
    val chanDf = chans.zipWithIndex.toSeq
      .map { case (c, i) => (c, 1L << i) }.toDF("channel", "bit")
    val phi = chanDf
      .join(vs.as("s0"), col("s0.vmask").bitwiseAND(col("bit")) === 0)
      .join(vs.as("t0"), col("t0.vmask") === col("s0.vmask") + col("bit"))
      .select(col("channel"),
        (element_at(wArr, bit_count(col("s0.vmask")) + 1)
          .cast("decimal(38,0)")
          * (col("t0.v") - col("s0.v")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("_term"))
      .groupBy(col("channel"))
      .agg(sum(col("_term")).cast("decimal(38,0)").as("_phi"))
    val tot = phi.agg(sum(col("_phi")).cast("decimal(38,0)").as("_tot"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"),
        expr(s"CAST((2 * 10000 * _phi + $nf) DIV (2 * $nf) AS BIGINT)")
          .as("phi_users_e4"),
        expr("""CASE WHEN _tot = 0 THEN NULL
                ELSE CAST((2 * 1000000 * _phi + _tot) DIV (2 * _tot)
                          AS BIGINT) END""").as("share_ppm"))
  }

  /** q213: RECOMMENDER RANKING EVALUATION — Hit@10 / MRR@10 / MAP@10
    * of a train-period popularity recommender against each customer's
    * held-out purchases (the offline eval harness every recommender /
    * retrieval system ships with; the metrics are the classic IR
    * ones, e.g. Manning et al. IR ch.8). Time split at the 80% point
    * of the order-date span (integer day arithmetic — no config);
    * recommend the 10 most-purchased parts of the train period
    * (popularity baseline — the eval MACHINERY is the operator);
    * evaluate on customers with ≥1 post-split purchase.
    *
    * Exactness: reciprocal ranks in 1/2520 units (2520 = lcm(1..10))
    * and AP terms in 1/6350400 units (2520² is divisible by any
    * rank·min(m,10) product, both ≤ 10) — every per-user metric is an
    * exact scaled integer, corpus means emit by integer round-half-up
    * from DECIMAL(38,0) sums. Scale shape: train popularity is one
    * map-combined count + a global top-10 (catalog-bounded — for
    * per-key variants [[TopKPerKey]] is the operator); the 10-row
    * list broadcasts into the test join; per-user scoring is one
    * groupBy over (customer, part) distincts; hit terms unfold by
    * posexplode on ≤10-element arrays. No driver loops, no doubles.
    */
  def q213RecEval(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("day"))
    val span = o.agg(min(col("day")).as("_mn"), max(col("day")).as("_mx"))
      .select(expr(
        "date_add(_mn, CAST((4 * datediff(_mx, _mn)) DIV 5 AS INT))")
        .as("_split"))
    val od = o.crossJoin(broadcast(span))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
    val top10 = od.filter(col("day") < col("_split"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("l_partkey").asc).limit(10)
      .select(col("l_partkey").as("_rec"), row_number().over(
        // global window over the LIMIT-10 artifact — bounded, benign
        Window.orderBy(col("_n").desc, col("l_partkey").asc))
        .cast("long").as("_rnk"))
    val testParts = od.filter(col("day") >= col("_split"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("_cust"), col("l_partkey").as("_part"))
      .distinct()
    val perUser = testParts
      .join(broadcast(top10), col("_part") === col("_rec"), "left")
      .groupBy(col("_cust"))
      .agg(count(lit(1)).cast("long").as("_m"),
        min(col("_rnk")).as("_minr"),
        sort_array(collect_list(col("_rnk"))).as("_ranks"))
      .select(col("_cust"), col("_ranks"),
        least(col("_m"), lit(10L)).as("_k"),
        expr("coalesce(2520 DIV _minr, 0)").as("_rr"),
        when(col("_minr").isNotNull, 1L).otherwise(0L).as("_hit"))
    val base = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("_u"),
      sum(col("_hit")).cast("decimal(38,0)").as("_h"),
      sum(col("_rr")).cast("decimal(38,0)").as("_srr"))
    val ap = perUser
      .select(col("_k"), posexplode_outer(col("_ranks")))
      .agg(coalesce(sum(
        expr("6350400 * (pos + 1) DIV (col * _k)")), lit(0L))
        .cast("decimal(38,0)").as("_sap"))
    base.crossJoin(broadcast(ap))
      .select(col("_u").cast("long").as("n_users"),
        expr("CAST((2 * 1000000 * _h + _u) DIV (2 * _u) AS BIGINT)")
          .as("hit_rate_ppm"),
        expr("""CAST((2 * 1000000 * _srr + 2520 * _u)
                DIV (2 * 2520 * _u) AS BIGINT)""").as("mrr_ppm"),
        expr("""CAST((2 * 1000000 * _sap + 6350400 * _u)
                DIV (2 * 6350400 * _u) AS BIGINT)""").as("map_ppm"))
  }

  /** q216: revenue GROWTH ACCOUNTING — the 1995→1996 change per nation
    * decomposed into the four customer-level bridges every subscription
    * /repeat-revenue review runs on: NEW (no prior-period revenue),
    * EXPANSION (grew), CONTRACTION (shrank but stayed), CHURNED (went
    * to zero). q215 ranks movers across brands and q177 splits one
    * brand into price×volume; this explains the same delta by customer
    * lifecycle — "did we grow by acquiring or by expanding, and how
    * much walked out the door". The identity net = new + expansion +
    * contraction + churn holds to the unit by construction (every
    * customer's Δ lands in exactly one bucket; flat customers
    * contribute 0) — the suite asserts it against rev2−rev1.
    *
    * Scale shape: ONE orders aggregate to customer grain (map-side
    * combined conditional sums), one shuffle join to the same-grain
    * customer dim for the nation key (co-keyed; at 100 TB orders ≫
    * customers and both sides hash on custkey), one broadcast nation
    * join, one bounded-output rollup. Per-customer sums stay in long
    * (e4 units); nation rollups accumulate in DECIMAL(38,0). No
    * windows, no second fact scan. Reference analogue: the season-over-
    * season player-trophy deltas (sql/db_creation_script.sql:185-242)
    * lifted from single-entity diffs to a population bridge.
    */
  def q216GrowthAccounting(s: SparkSession, d: String): DataFrame = {
    def su(yr: Int) = sum(when(col("_yr") === yr,
      (col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("long")).otherwise(lit(0L))).cast("long")
    val byCust = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .withColumn("_yr", year(col("o_orderdate")))
      .filter(col("_yr").isin(1995, 1996))
      .groupBy(col("o_custkey"))
      .agg(su(1995).as("_r1"), su(1996).as("_r2"))
    val classed = byCust.withColumn("_cls",
      when(col("_r1") === 0L, lit("new"))
        .when(col("_r2") === 0L, lit("churned"))
        .when(col("_r2") > col("_r1"), lit("expansion"))
        .when(col("_r2") < col("_r1"), lit("contraction"))
        .otherwise(lit("flat")))
    def nOf(c: String) = sum(when(col("_cls") === c, 1L)
      .otherwise(0L)).cast("long")
    def dOf(c: String) = sum(when(col("_cls") === c,
      col("_r2") - col("_r1")).otherwise(lit(0L)))
      .cast("decimal(38,0)").cast("long")
    classed
      .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(nOf("new").as("n_new"), nOf("expansion").as("n_expanded"),
        nOf("contraction").as("n_contracted"),
        nOf("churned").as("n_churned"),
        dOf("new").as("new_units"),
        dOf("expansion").as("expansion_units"),
        dOf("contraction").as("contraction_units"),
        dOf("churned").as("churn_units"),
        sum(col("_r2") - col("_r1")).cast("decimal(38,0)")
          .cast("long").as("net_units"))
  }

  /** q220: interval-UNION coverage per user — each event opens a
    * 30-minute activity window; overlapping/touching windows merge,
    * and the report is the exact union length, segment count and
    * utilization of the user's active span. The "how much wall-clock
    * was this user actually active" metric (billing meters, SLA
    * uptime, engagement depth) that a plain SUM of windows
    * double-counts and q129's concurrency sweep doesn't answer —
    * THE classic sweep-line union, done as one pass.
    *
    * Scale shape: ONE user-keyed window (running max of interval end
    * over a deterministic (ts, event_id) total order) + one
    * map-combined aggregate — no self-join, no explode. Integer
    * determinism: pure-µs longs; the overlap clamp is an explicit
    * integer CASE (never GREATEST/LEAST around a NULL first-row lag —
    * the q179 rule); touching intervals (gap 0) merge in both
    * engines by the same us > pme strict compare.
    */
  def q220IntervalCoverage(s: SparkSession, d: String): DataFrame = {
    val L = 1800000000L // 30 min in µs
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("_us", unix_micros(col("ts")))
      .withColumn("_pme", max(unix_micros(col("ts")) + L).over(w))
      .select(col("user_id"), col("_us"),
        expr(s"""CASE WHEN _pme IS NULL THEN $L
                 WHEN _us >= _pme THEN $L
                 WHEN _us + $L > _pme THEN _us + $L - _pme
                 ELSE 0 END""").as("_cov"),
        expr("""CASE WHEN _pme IS NULL OR _us > _pme THEN 1
                ELSE 0 END""").as("_seg"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("_seg")).cast("long").as("n_segments"),
        sum(col("_cov")).cast("long").as("covered_us"),
        (max(col("_us")) + lit(L) - min(col("_us"))).cast("long")
          .as("span_us"))
      .withColumn("util_ppm", expr(
        // DECIMAL(38,0) internally: 2e6 × a multi-year µs span tops long
        """CAST((2 * 1000000 * CAST(covered_us AS DECIMAL(38,0))
           + span_us) DIV (2 * span_us) AS BIGINT)"""))
  }

  /** q222: CHANGELOG COMPACTION — collapse a CDC op stream (insert /
    * update / delete per key) to its NET effect, the batch form of
    * Kafka log compaction / Debezium snapshot merging and the step
    * that turns a day of change events into one applyable delta (q12
    * upserts last-write-wins VALUES; this compacts OPERATIONS, where
    * I→…→D must vanish and D→…→I must become an update). The net op
    * needs only the FIRST and LAST op per key — existence-before is
    * first=I, existence-after is last≠D; interior churn is provably
    * irrelevant — so the whole operator is ONE map-side-combinable
    * aggregate: min/max over (ts, event_id, op) structs, no window,
    * no sort, no second scan. Op stream derived from events (signup →
    * I, error → D, else U); payload = last non-delete value in exact
    * e4 units via the same lexicographic struct-max.
    */
  def q222ChangelogCompact(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("_us"),
        col("event_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("_op"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long")
          .as("_v"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_ops"),
        min(col("_us")).as("first_us"),
        max(col("_us")).as("last_us"),
        min(struct(col("_us"), col("event_id"), col("_op")))
          .getField("_op").as("_fop"),
        max(struct(col("_us"), col("event_id"), col("_op")))
          .getField("_op").as("_lop"),
        // _v IS NOT NULL mirrors DuckDB arg_max, which skips rows whose
        // ARG is NULL — without the filter a trailing null-valued
        // update would win here but be skipped by the oracle (silent
        // divergence; testdata has no null event.value today, so the
        // gate can't catch it)
        max(when(col("_op") =!= "D" && col("_v").isNotNull,
          struct(col("_us"), col("event_id"), col("_v"))))
          .getField("_v").as("_lv"))
      .select(col("user_id"),
        expr("""CASE WHEN _lop = 'D' THEN
                  CASE WHEN _fop = 'I' THEN 'none' ELSE 'delete' END
                WHEN _fop = 'I' THEN 'insert'
                ELSE 'upsert' END""").as("net_op"),
        col("n_ops"), col("first_us"), col("last_us"),
        when(col("_lop") =!= "D", col("_lv")).as("value_units"))
  }

  /** q228: TOKEN-BUCKET ADMISSION REPLAY — batch re-simulation of a
    * per-user rate limiter over the event log (the token-bucket
    * algorithm of every API gateway / quota system; RFC 6585's
    * 429-shaping): capacity 3 tokens, refill 1 token/day, cost 1
    * token/event. The batch replay answers the capacity-planning
    * question a 100 TB event archive gets asked — "under quota Q, how
    * much of each user's historical traffic would have been shed?" —
    * without a streaming re-run (reference analogue: the API fetch
    * layer's client-side rate limiting, api_extract.py:59-110, turned
    * into an analyzable operator).
    *
    * The bucket state is inherently sequential per user, so it runs as
    * an ordered `aggregate` fold over `sort_array(collect_list(us,
    * event_id))` per user — the q200 per-series-recursion pattern. The
    * per-user array is bounded here (≤86 events/user at every SF; at
    * unbounded per-key volume the fold chunks by epoch with carried
    * state, same as the q66 packing machinery). All arithmetic is
    * integer µtokens (1 token = 1e6): refill = Δµs DIV 86400 — Δµs and
    * the balance are non-negative so Spark's truncating DIV and
    * DuckDB's flooring // agree (the q148 sign rule never triggers).
    * Oracle: lockstep recursive CTE stepping rn→rn+1 per user.
    */
  def q228RateLimitReplay(s: SparkSession, d: String): DataFrame = {
    val Cap = 3000000L // 3 tokens in µtokens
    val Cost = 1000000L // 1 token per event
    val RefillDiv = 86400L // 1e6 µtok per 86400e6 µs = 1 token/day
    val ev = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val zero = struct(lit(false).as("s"), lit(0L).as("tk"),
      lit(0L).as("lu"), lit(0L).as("ad"), lit(0L).as("dn"))
    // exact long division for non-negative x (Column./ is double
    // division; subtracting the pmod first makes the quotient an
    // integer-valued double well under 2^53, so the cast is exact)
    def idiv(x: Column): Column =
      ((x - pmod(x, lit(RefillDiv))) / lit(RefillDiv)).cast("long")
    def step(acc: Column, e: Column): Column = {
      val tk1 = least(lit(Cap),
        acc.getField("tk") +
          idiv(e.getField("us") - acc.getField("lu")))
      val admit = tk1 >= Cost
      when(!acc.getField("s"),
        // first event: bucket starts full and always admits
        struct(lit(true).as("s"), lit(Cap - Cost).as("tk"),
          e.getField("us").as("lu"), lit(1L).as("ad"), lit(0L).as("dn")))
        .otherwise(struct(lit(true).as("s"),
          when(admit, tk1 - Cost).otherwise(tk1).as("tk"),
          e.getField("us").as("lu"),
          (acc.getField("ad") + when(admit, 1L).otherwise(0L)).as("ad"),
          (acc.getField("dn") + when(admit, 0L).otherwise(1L)).as("dn")))
    }
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"))))
        .as("_arr"))
      .select(col("user_id"),
        size(col("_arr")).cast("long").as("n_events"),
        aggregate(col("_arr"), zero, step).as("_st"))
      .select(col("user_id"), col("n_events"),
        col("_st.ad").as("n_admitted"), col("_st.dn").as("n_denied"),
        col("_st.tk").as("final_units"))
  }

  /** q230: nDCG@10 RANKING EVALUATION (Järvelin & Kekäläinen 2002) —
    * the position-discounted companion of q213's Hit/MRR/MAP over the
    * SAME popularity-recommender harness (identical 80%-span day
    * split, identical top-10, identical holdout), plus macro-averaged
    * precision@10 and recall@10. nDCG's 1/log2(r+1) discounts are
    * irrational, so cross-engine exactness comes from a FIXED e6
    * integer discount table (the same 10 literals in both engines —
    * the q58 "score with integer arithmetic" rule applied to libm
    * log2): DCG and ideal-DCG are exact integer sums, per-user nDCG
    * is integer round-half-up ppm, and the corpus mean averages those
    * exact per-user values (macro average, the standard IR protocol).
    *
    * Scale shape: identical to q213 — one train-side count + global
    * top-10 (catalog-bounded), the 10-row list broadcast into the
    * holdout join, per-user scoring one groupBy; the discount lookup
    * is element_at on a 10-literal array. No windows over the corpus,
    * no doubles anywhere.
    */
  def q230NdcgEval(s: SparkSession, d: String): DataFrame = {
    // round(1e6 / log2(r+1)), r = 1..10, and its prefix sums — shared
    // literal constants with the oracle SQL
    val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L)
    val idcg = disc.scanLeft(0L)(_ + _).tail
    val discArr = array(disc.map(lit): _*)
    val idcgArr = array(idcg.map(lit): _*)
    val o = Tables.orders(s, d).filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("day"))
    val span = o.agg(min(col("day")).as("_mn"), max(col("day")).as("_mx"))
      .select(expr(
        "date_add(_mn, CAST((4 * datediff(_mx, _mn)) DIV 5 AS INT))")
        .as("_split"))
    val od = o.crossJoin(broadcast(span))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
    val top10 = od.filter(col("day") < col("_split"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("l_partkey").asc).limit(10)
      .select(col("l_partkey").as("_rec"), row_number().over(
        // global window over the LIMIT-10 artifact — bounded, benign
        Window.orderBy(col("_n").desc, col("l_partkey").asc))
        .cast("long").as("_rnk"))
    val testParts = od.filter(col("day") >= col("_split"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("_cust"), col("l_partkey").as("_part"))
      .distinct()
    val perUser = testParts
      .join(broadcast(top10), col("_part") === col("_rec"), "left")
      .groupBy(col("_cust"))
      .agg(count(lit(1)).cast("long").as("_m"),
        sum(when(col("_rnk").isNotNull,
          element_at(discArr, col("_rnk").cast("int")))
          .otherwise(0L)).cast("long").as("_dcg"),
        sum(when(col("_rnk").isNotNull, 1L).otherwise(0L))
          .cast("long").as("_h"))
      .select(col("_cust"), col("_h"),
        element_at(idcgArr, least(col("_m"), lit(10L)).cast("int"))
          .as("_idcg"),
        col("_dcg"), col("_m"))
      .select(
        expr("CAST((2 * 1000000 * _dcg + _idcg) DIV (2 * _idcg) AS BIGINT)")
          .as("_ndcg"),
        (col("_h") * 100000L).as("_prec"),
        expr("CAST((2 * 1000000 * _h + _m) DIV (2 * _m) AS BIGINT)")
          .as("_rec"))
    perUser.agg(count(lit(1)).cast("decimal(38,0)").as("_u"),
        sum(col("_ndcg")).cast("decimal(38,0)").as("_sn"),
        sum(col("_prec")).cast("decimal(38,0)").as("_sp"),
        sum(col("_rec")).cast("decimal(38,0)").as("_sr"))
      .select(col("_u").cast("long").as("n_users"),
        expr("CAST((2 * _sn + _u) DIV (2 * _u) AS BIGINT)")
          .as("ndcg_ppm"),
        expr("CAST((2 * _sp + _u) DIV (2 * _u) AS BIGINT)")
          .as("precision_ppm"),
        expr("CAST((2 * _sr + _u) DIV (2 * _u) AS BIGINT)")
          .as("recall_ppm"))
  }

  /** q232: SEQUENTIAL PATTERN MINING — support of every event-type
    * subsequence of length ≤ 3 within 4-h-gap sessions (the GSP /
    * PrefixSpan problem, Srikant & Agrawal 1996, at the exact small-
    * alphabet grain): "view → click → purchase happens in 4.1% of
    * sessions" is the behavioral-motif table funnels (q80: ONE fixed
    * path) and adjacent-trigram motifs (q140: contiguous only) can't
    * produce — subsequences allow gaps, so interleaved noise doesn't
    * break the match.
    *
    * Scale shape: the pattern lattice is generated PER SESSION from
    * the session's own distinct types (|d|≤|session|, so the work is
    * Σ|d|²·|arr| array scans — self-bounding, no global alphabet
    * blowup and no session×pattern cross join; containment rows leave
    * the session grain only for patterns actually contained). Sessions
    * build with one per-user window (the q80 gap rule); per-session
    * arrays are bounded (≤86 events/user at every SF). Subsequence
    * containment is the greedy earliest-match (complete for
    * existence): first a, first b after it, any c after that — pure
    * array_position/slice integer logic, bit-identical cross-engine.
    * Oracle: the same sessions via LAG + running SUM, containment as
    * DISTINCT inequality self-joins (quadratic per session by design).
    */
  def q232SeqPatterns(s: SparkSession, d: String): DataFrame = {
    val GapUs = 14400000000L // 4 h
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val sess = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("_brk",
        when(col("us") - lag(col("us"), 1).over(w) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(transform(
        sort_array(collect_list(struct(col("us"), col("event_id"),
          col("event_type").as("t")))),
        e => e.getField("t")).as("arr"))
      .select(col("arr"), array_distinct(col("arr")).as("d"))
      // r15: materialize the session arrays ONCE — the interpreted
      // containment tower below ran twice (total-count branch +
      // pattern explode); the total is now counted from this cheap
      // artifact and the tower runs once
      .localCheckpoint(false)
    // greedy earliest-match containment over the session's type array.
    // r15: native graft_seq_patterns — the nested transform/slice HOF
    // tower ran interpreted per element and dominated the query;
    // SeqPatternsSpec pins native ≡ HOF (multiset) on real sessions
    val contained = sess.select(graft.functions.SeqPatterns
      .patterns(s, col("arr")).as("pats"))
    // contained is row-for-row sess (a projection) — count the cheap
    // side, never the HOF tower
    val tot = sess.agg(count(lit(1)).cast("long").as("_n"))
    contained.select(explode(col("pats")).as("pattern"))
      .groupBy(col("pattern"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .crossJoin(broadcast(tot))
      .select(col("pattern"),
        size(split(col("pattern"), ">")).cast("long").as("k"),
        col("n_sessions"),
        expr("""CAST((2 * 1000000 * n_sessions + _n) DIV (2 * _n)
            AS BIGINT)""").as("support_ppm"))
  }

  /** q236: INTERVAL-INTERVAL OVERLAP JOIN — every user activity
    * session that overlaps an error-burst incident window, with the
    * exact overlap duration. Completes the temporal-join family: q39
    * matches a point to the latest PRECEDING point (as-of), q99 a
    * point INSIDE an interval (banded range join), this an interval
    * AGAINST an interval — the blast-radius question ("whose sessions
    * were in flight during the incident?") behind every outage
    * postmortem and SLA-credit calculation. Sessions are the 4-h-gap
    * user sessions (q232's rule, [min,max] event time); incidents are
    * maximal ≤5-min-gap runs of ≥3 error events (a burst, not a lone
    * error), detected on the FILTERED error slice — the one global
    * window runs over that bounded slice only, never the full log (at
    * 100 TB the error stream after severity filtering is orders
    * smaller than traffic; were it not, incident detection would move
    * to the q66-style chunked fold).
    *
    * Scale shape: the standard day-cell banding — each interval
    * explodes to the UTC days it spans (sessions ≪ a day, incidents
    * minutes — the explode is ~1 row per interval), the join is an
    * EQUI-join on the day cell, a pair sharing several days dedups
    * through DISTINCT on ids BEFORE the overlap arithmetic, and the
    * exact inclusive overlap test + duration are integer µs. Output
    * keys are the interval start times (sessions and incidents are
    * both uniquely keyed by start within their stream).
    */
  def q236IntervalOverlapJoin(s: SparkSession, d: String): DataFrame = {
    val DayUs = 86400000000L
    val ev = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val uw = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val sessions = ev
      .withColumn("_brk",
        when(col("us") - lag(col("us"), 1).over(uw) > 14400000000L, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_brk")).over(
        uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(min(col("us")).as("s_start"), max(col("us")).as("s_end"))
    // incident windows: global 5-min-gap runs over the error slice
    val ew = Window.orderBy(col("us"), col("event_id"))
    val incidents = ev.filter(col("event_type") === "error")
      .withColumn("_brk",
        when(col("us") - lag(col("us"), 1).over(ew) > 300000000L, 1L)
          .otherwise(0L))
      .withColumn("_iid", sum(col("_brk")).over(
        ew.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("_iid"))
      .agg(min(col("us")).as("i_start"), max(col("us")).as("i_end"),
        count(lit(1)).as("_n"))
      .filter(col("_n") >= 3)
      .select(col("i_start"), col("i_end"))
    val sx = sessions.select(col("user_id"), col("s_start"), col("s_end"),
      explode(sequence(expr(s"s_start DIV $DayUs"),
        expr(s"s_end DIV $DayUs"))).as("cell"))
    val ix = incidents.select(col("i_start"), col("i_end"),
      explode(sequence(expr(s"i_start DIV $DayUs"),
        expr(s"i_end DIV $DayUs"))).as("cell"))
    sx.join(ix, Seq("cell"))
      .filter(col("s_start") <= col("i_end") &&
        col("i_start") <= col("s_end"))
      .select(col("user_id"), col("s_start"), col("i_start"),
        col("s_end"), col("i_end"))
      .distinct() // a pair spanning several shared days appears once
      .select(col("user_id"),
        col("s_start").as("sess_start_us"),
        col("i_start").as("inc_start_us"),
        (least(col("s_end"), col("i_end")) -
          greatest(col("s_start"), col("i_start"))).as("overlap_us"))
  }

  /** q241: USER GROWTH ACCOUNTING — weekly active users decomposed
    * into the standard four buckets every growth review runs on
    * (the WAU accounting identity): NEW (first week ever), RETAINED
    * (also active the previous week), RESURRECTED (active before, but
    * not last week), plus the week's CHURN-OUT (last week's actives
    * who didn't return). active = new + retained + resurrected holds
    * to the unit by construction (each active user lands in exactly
    * one bucket — the q216 identity argument at user grain; q216
    * bridges REVENUE across two fixed years, q81 grids retention by
    * cohort — this is the per-period population bridge). Weeks are
    * date_trunc Mondays (identical in both engines); churn for week w
    * counts only OBSERVED weeks (no phantom week after the data ends).
    *
    * Scale shape: one distinct to (user, week) grain, one user-keyed
    * lag window on that reduced frame, one anti-join for churn —
    * the event log is scanned once. Integer counts; weeks emit as
    * epoch-µs longs (the q222 timestamp-output rule).
    */
  def q241UserGrowth(s: SparkSession, d: String): DataFrame = {
    val uw = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
      .localCheckpoint(false) // classing, churn probe, week spine
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val agg = uw
      .withColumn("_pv", lag(col("wk"), 1).over(w))
      .groupBy(col("wk"))
      .agg(count(lit(1)).cast("long").as("n_active"),
        sum(when(col("_pv").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_new"),
        sum(when(col("_pv") === col("wk") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).cast("long").as("n_retained"),
        sum(when(col("_pv").isNotNull &&
          col("_pv") < col("wk") - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).cast("long").as("n_resurrected"))
    val churn = uw
      .withColumn("_nw", col("wk") + expr("INTERVAL 7 DAYS"))
      .join(uw.select(col("user_id"), col("wk").as("_nw")),
        Seq("user_id", "_nw"), "left_anti")
      .join(uw.select(col("wk").as("_nw")).distinct(), Seq("_nw"))
      .groupBy(col("_nw").as("wk"))
      .agg(count(lit(1)).cast("long").as("_ch"))
    agg.join(churn, Seq("wk"), "left")
      .select(unix_micros(col("wk")).as("week_us"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        coalesce(col("_ch"), lit(0L)).as("n_churned"))
  }

  /** q242: TRACE CONFORMANCE CHECKING (process mining — van der Aalst
    * 2011's alignment problem at the edit-distance grain): every 4-h
    * session's event-type trace scored by Levenshtein distance to the
    * canonical funnel trace "vcp" (view → click → purchase), reported
    * as the (trace length × distance) histogram — "how far does real
    * behavior deviate from the designed process, and does deviation
    * grow with session length". q80 counts sessions that CONTAIN the
    * funnel; conformance measures HOW WRONG the rest are (inserts,
    * skips, wrong order all priced 1 edit).
    *
    * Determinism: event types map to their distinct first letters, so
    * a trace is a plain string and both engines run the same unit-cost
    * Levenshtein DP (the q91 rule). Traces cap at 20 events — the DP
    * is O(len·3) per session, bounded; the cap is part of the operator
    * contract, not a shortcut (conformance beyond a screenful of
    * events is process noise).
    */
  def q242Conformance(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("_brk",
        when(col("us") - lag(col("us"), 1).over(w) > 14400000000L, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(array_join(slice(transform(
        sort_array(collect_list(struct(col("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")))),
        e => e.getField("c")), 1, 20), "").as("_trace"))
      .select(length(col("_trace")).cast("long").as("trace_len"),
        levenshtein(col("_trace"), lit("vcp")).cast("long").as("dist"))
      .groupBy(col("trace_len"), col("dist"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
  }

  /** q251: RECENCY-DECAYED ENGAGEMENT SCORING — per user,
    * Σ_events exp(−Δt/τ) with τ = 30 days, "now" = the corpus's max
    * event time: the exponential-recency prior every ranking/
    * recommendation/churn system keeps per entity (Ding & Li CIKM
    * 2005's time-weighted collaborative filtering is this weight). A
    * [[graft.functions.FixedExp]] family operator (r11) — exponential
    * TIME decay was structurally oracle-blocked while exp went through
    * libm; q160's EWMA decays by ROW with dyadic weights, this decays
    * by WALL-CLOCK and is the form product scoring actually uses.
    *
    * Engine-exact: gap µs → e9 decay argument by the exact integer
    * DIV 2592 (τ_µs/1e9), clamped at 20e9 (weight < 2.1e-9 — below
    * the output quantum), per-event weight = round-half-up 1e18/exp
    * in pure longs (2e18 + a < 2^63), per-user score = exact integer
    * sum. The whole chain is codegen'd column arithmetic — one scan,
    * one map-combined groupBy, a 1-row max broadcast.
    */
  def q251DecayedEngagement(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val mx = ev.agg(max(col("us")).as("_mx"))
    val base = ev.crossJoin(broadcast(mx))
      .withColumn("_x", expr(
        "LEAST((_mx - us) DIV 2592, 20000000000)"))
    // r15: native graft_exp_e9 — per-EVENT scan, the q272 shape
    val withExp = base.withColumn("_a",
      graft.functions.FixedPointExpressions.expE9(s, col("_x")))
    withExp
      // w = round-half-up(1e18 / a): a ≤ exp(20)·1e9 ≈ 4.9e17, so
      // 2e18 + a stays in long — no decimal in the per-row hot path
      .withColumn("_w", expr(
        "(2000000000000000000 + _a) DIV (2 * _a)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("_w")).cast("long").as("engagement_e9"),
        expr("CAST(min(_mx - us) DIV 86400000000 AS BIGINT)")
          .as("days_since_last"))
  }

  /** The (quasi-identifier, sensitive-band) cell counts shared by the
    * q253/q254 privacy audits: QI = (nation, market segment) — the
    * same identifier q205's k-anonymity audits — and the SENSITIVE
    * attribute is the account-balance band (the column a release would
    * actually leak). Bands are integer threshold cuts on the exact
    * DECIMAL balance — engine-identical.
    */
  private def acctBandCells(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("""CASE WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 0 THEN 'neg'
                     WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 2500 THEN 'low'
                     WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 7500 THEN 'mid'
                     ELSE 'high' END""").as("band"))
      .groupBy(col("nationkey"), col("mktsegment"), col("band"))
      .agg(count(lit(1)).cast("long").as("n_band"))

  /** q253: l-DIVERSITY audit (Machanavajjhala et al. ICDE 2006) — the
    * k-anonymity follow-up q205 stops short of: a group can have k
    * members yet leak everything if they all share the SENSITIVE
    * value. Per (nation, segment) QI class over the customer table:
    * distinct-l (how many balance bands appear), the entropy of the
    * band distribution, and entropy-l = exp(H) — the "effective number
    * of sensitive values" an attacker faces (entropy l-diversity holds
    * iff exp(H) ≥ l). The release gate a per-user training-data export
    * runs after q205 says the groups are big enough; reference
    * analogue: the players table (sql/db_creation_script.sql:40-55)
    * is exactly such a per-user attribute export.
    *
    * Engine-exact (FixedLn + FixedExp, both on the BOUNDED class×band
    * artifact): band shares in round-half-up ppm clamped ≥ 1,
    * H_e9 = round-half-up Σ ppm·lnE9(1e6, ppm) / 1e6 (each term an
    * exact long product), eff_classes_e3 = round-half-up expE9(H)/1e6
    * — H ≤ ln 4 ≪ the 20.7e9 exp domain. Corpus cost = ONE
    * map-combined groupBy; everything after runs on ≤ |nations|×
    * |segments|×|bands| rows.
    */
  def q253LDiversity(s: SparkSession, d: String): DataFrame = {
    val cells = acctBandCells(s, d).localCheckpoint(false)
    val byClass = cells.groupBy(col("nationkey"), col("mktsegment"))
      .agg(sum(col("n_band")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("distinct_l"))
    val ppm = cells.join(byClass, Seq("nationkey", "mktsegment"))
      .select(col("nationkey"), col("mktsegment"),
        expr("GREATEST((2000000 * n_band + n_rows) DIV (2 * n_rows), 1)")
          .as("_ppm"))
      .withColumn("_p", lit(1000000L))
      .withColumn("_q", col("_ppm"))
    // r15: native graft_ln_e9 / graft_exp_e9 (band-cell scale)
    val withLn = ppm.withColumn("_nl9",
      graft.functions.FixedPointExpressions.lnE9(s, col("_p"), col("_q")))
    val ent = withLn.groupBy(col("nationkey"), col("mktsegment"))
      .agg(expr("""CAST((2 * sum(_ppm * _nl9) + 1000000)
                   DIV (2 * 1000000) AS BIGINT)""").as("entropy_e9"))
      .withColumn("_x", col("entropy_e9"))
    val withExp = ent.withColumn("_a",
      graft.functions.FixedPointExpressions.expE9(s, col("_x")))
    byClass.join(withExp.select(col("nationkey"), col("mktsegment"),
        col("entropy_e9"),
        expr("(2 * _a + 1000000) DIV (2 * 1000000)")
          .as("eff_classes_e3")),
      Seq("nationkey", "mktsegment"))
      .select(col("nationkey"), col("mktsegment"), col("n_rows"),
        col("distinct_l"), col("entropy_e9"), col("eff_classes_e3"),
        (col("distinct_l") >= 3).as("ok_l3"))
  }

  /** q254: t-CLOSENESS audit (Li, Li & Venkatasubramanian ICDE 2007)
    * — the third rung of the release ladder: a group can be l-diverse
    * yet still leak by SKEW (90% of one band where the population has
    * 25%). Per QI class, t = total-variation distance between the
    * class's sensitive-band distribution and the GLOBAL one (TV = the
    * t-closeness EMD under uniform ground distance on a categorical
    * domain), flagged at the conventional t > 0.2. Completes
    * q205 (size) → q253 (diversity) → q254 (representativeness);
    * the q124/q171 TV machinery pointed at privacy.
    *
    * Engine-exact: both distributions in round-half-up ppm over the
    * SAME band grid (classes × observed bands, built by a broadcast
    * cross join so zero-count cells contribute their full global
    * share), t_ppm = round-half-up Σ|Δppm|/2 — pure longs. Corpus
    * cost = the one shared groupBy; the grid is bounded.
    */
  def q254TCloseness(s: SparkSession, d: String): DataFrame = {
    val cells = acctBandCells(s, d).localCheckpoint(false)
    val byClass = cells.groupBy(col("nationkey"), col("mktsegment"))
      .agg(sum(col("n_band")).cast("long").as("n_rows"))
    val global = cells.groupBy(col("band"))
      .agg(sum(col("n_band")).cast("long").as("_ng"))
    val gTot = global.agg(sum(col("_ng")).cast("long").as("_nt"))
    val gPpm = global.crossJoin(broadcast(gTot))
      .select(col("band"),
        expr("(2000000 * _ng + _nt) DIV (2 * _nt)").as("g_ppm"))
    val grid = byClass.crossJoin(broadcast(gPpm))
    grid.join(cells, Seq("nationkey", "mktsegment", "band"), "left")
      .select(col("nationkey"), col("mktsegment"), col("n_rows"),
        col("g_ppm"),
        expr("""(2000000 * coalesce(n_band, 0) + n_rows)
                DIV (2 * n_rows)""").as("c_ppm"))
      .groupBy(col("nationkey"), col("mktsegment"))
      .agg(max(col("n_rows")).as("n_rows"),
        expr("""CAST((sum(abs(c_ppm - g_ppm)) + 1) DIV 2 AS BIGINT)""")
          .as("t_ppm"))
      .withColumn("breach_t02", col("t_ppm") > 200000L)
  }

  /** q277: RETENTION HALF-LIFE per signup cohort — fit the exponential
    * decay retention(t) = r₀·e^{−λt} by log-linear OLS over week
    * offsets 1..8 and report the half-life ln2/λ in weeks: the ONE
    * number a growth team quotes from q81's whole retention grid
    * (exponential decay is the standard churn shape — the discrete
    * dual of q149's Kaplan–Meier curve). Cohort weeks are integer
    * µs-epoch DIV 604800e6 (Thursday-anchored like Unix weeks —
    * consistent within the query, engine-identical; q81's calendar
    * date_trunc is Monday-anchored and feeds the human-facing grid).
    *
    * ENGINE-EXACT (FixedLn): retention in rhu ppm clamped ≥ 1,
    * y = signed lnE9(ppm vs 1e6) (retention ≤ 100% ⇒ y ≤ 0 — the
    * sign-split rule), x = offset 1..8; OLS in exact longs on ≤ 8
    * points per cohort; slope_e9 signed rhu; half-life only for
    * genuinely decaying cohorts (slope < 0) = rhu(100·ln2E9, −slope).
    * Scale shape: one min-week window per user + one distinct to
    * (cohort, offset, user) grain; everything after is
    * cohort×8-bounded.
    */
  def q277RetentionHalflife(s: SparkSession, d: String): DataFrame = {
    val wk = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 604800000000").as("week"))
    val w = Window.partitionBy(col("user_id"))
    val act = wk.withColumn("cohort_week", min(col("week")).over(w))
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("off"), col("user_id"))
      .distinct()
      .localCheckpoint(false) // feeds cohort sizes AND offset counts
    val size = act.filter(col("off") === 0L)
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).cast("long").as("n_users"))
    val ret = act.filter(col("off").between(1L, 8L))
      .groupBy(col("cohort_week"), col("off"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .join(broadcast(size), "cohort_week")
      .select(col("cohort_week"), col("n_users"), col("off"),
        expr("""GREATEST((2000000 * n_active + n_users)
                DIV (2 * n_users), 1)""").as("_ppm"))
      .withColumn("_p", greatest(col("_ppm"), lit(1000000L)))
      .withColumn("_q", least(col("_ppm"), lit(1000000L)))
      .withColumn("_sgn", when(col("_ppm") >= 1000000L, 1L)
        .otherwise(-1L))
    // r15: native graft_ln_e9
    val withLn = ret.withColumn("_l9",
      graft.functions.FixedPointExpressions.lnE9(s, col("_p"), col("_q")))
      .select(col("cohort_week"), col("n_users"), col("off"),
        (col("_sgn") * col("_l9")).as("y"))
    withLn.groupBy(col("cohort_week"))
      .agg(max(col("n_users")).as("n_users"),
        count(lit(1)).cast("long").as("n_points"),
        sum(col("off")).cast("long").as("_sx"),
        sum(col("y")).cast("long").as("_sy"),
        sum(col("off") * col("y")).cast("long").as("_sxy"),
        sum(col("off") * col("off")).cast("long").as("_sxx"))
      .filter(col("n_points") >= 3L)
      .withColumn("_num", expr(
        """CAST(n_points AS DECIMAL(38,0)) * _sxy
           - CAST(_sx AS DECIMAL(38,0)) * _sy"""))
      .withColumn("_den", expr(
        """CAST(n_points AS DECIMAL(38,0)) * _sxx
           - CAST(_sx AS DECIMAL(38,0)) * _sx"""))
      .filter(col("_den") > 0)
      .withColumn("slope_e9", expr(
        """CASE WHEN _num >= 0
             THEN CAST((2 * _num + _den) DIV (2 * _den) AS BIGINT)
             ELSE -CAST((2 * (-_num) + _den) DIV (2 * _den) AS BIGINT)
           END"""))
      .select(col("cohort_week"), col("n_users"), col("n_points"),
        col("slope_e9"),
        expr(s"""CASE WHEN slope_e9 < 0 THEN
               CAST((2 * 100 * ${graft.functions.FixedLn.Ln2E9}
                     + (-slope_e9))
                    DIV (2 * (-slope_e9)) AS BIGINT)
             END""").as("halflife_weeks_e2"))
  }

  /** q270: GEOMETRIC-MECHANISM NOISY-COUNT RELEASE (Ghosh, Roughgarden
    * & Sundararajan STOC 2009 — the UTILITY-OPTIMAL integer mechanism
    * for ε-differentially-private counting): the (nation, segment)
    * histogram released with two-sided geometric noise G₁ − G₂,
    * Gᵢ = ⌊−ln Uᵢ⌋ at ε = 1, clamped at 0 — the final rung of the
    * privacy ladder (q205 size → q253 diversity → q254
    * representativeness → RELEASE). IMPORTANT, documented limitation:
    * the uniforms here derive from md5 of the group key, which makes
    * the release REPRODUCIBLE (a cross-engine test-harness property)
    * but NOT differentially private — real DP needs secret fresh
    * randomness; swap `uniformPpm` for a real RNG in production. The
    * mechanism algebra (inverse-CDF geometric sampling, exact integer
    * noise, post-processing clamp) is the genuine article.
    *
    * ENGINE-EXACT: the uniform is 6 md5 hex chars decoded by instr
    * arithmetic (both engines lack a hex→int builtin; the per-char
    * positional decode is identical), mapped to [1, 999999] ppm;
    * G = lnE9(1e6, u) DIV 1e9 is the exact ⌊−ln U⌋ via FixedLn (both
    * operands non-negative — floor = truncate). All on the bounded
    * cell table; the corpus pays one map-combined groupBy.
    */
  def q270DpRelease(s: SparkSession, d: String): DataFrame = {
    def hexDecode(c: String): String =
      (1 to 6).map(i =>
        s"(instr('0123456789abcdef', substring($c, $i, 1)) - 1) " +
          s"* ${1L << (4 * (6 - i))}")
        .mkString("CAST((", " + ", ") % 999999 + 1 AS BIGINT)")
    val counts = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).cast("long").as("_n"))
      .withColumn("_h1", expr(
        "md5(concat(cast(nationkey as string), ':', mktsegment, ':1'))"))
      .withColumn("_h2", expr(
        "md5(concat(cast(nationkey as string), ':', mktsegment, ':2'))"))
      .withColumn("_u1", expr(hexDecode("_h1")))
      .withColumn("_u2", expr(hexDecode("_h2")))
    // r15: native graft_ln_e9 for both geometric draws
    val g1 = counts
      .withColumn("_l1", graft.functions.FixedPointExpressions
        .lnE9(s, lit(1000000L), col("_u1")))
      .select(col("nationkey"), col("mktsegment"), col("_n"),
        col("_u2"), expr("_l1 DIV 1000000000").as("_g1"))
    val g2 = g1
      .withColumn("_l2", graft.functions.FixedPointExpressions
        .lnE9(s, lit(1000000L), col("_u2")))
      .select(col("nationkey"), col("mktsegment"), col("_n"),
        col("_g1"), expr("_l2 DIV 1000000000").as("_g2"))
    g2.select(col("nationkey"), col("mktsegment"),
      (col("_g1") - col("_g2")).as("noise"),
      greatest(col("_n") + col("_g1") - col("_g2"), lit(0L))
        .as("noisy_n"))
  }

  /** q255: FIFO INVENTORY COSTING / realized-COGS rollup — per part,
    * purchase lots are consumed front-to-back by total issue demand
    * and the cost of goods sold prices each consumed unit at ITS lot's
    * unit cost (the inventory-valuation method GAAP/IFRS default to;
    * the lot-matching problem behind every realized-P&L report).
    * Lots = 'F'-status lineitems, issues = 'O'-status (a documented
    * deterministic stand-in assignment); lot order = (shipdate,
    * orderkey, linenumber, qty, price) — multiset-deterministic even
    * where (orderkey, linenumber) repeats, because equal-key rows are
    * interchangeable under a cumulative matching. Reference analogue:
    * the season-partitioned ranking history (sql/db_creation_script
    * .sql:31-38) is consumed newest-first; this is the costed
    * oldest-first dual.
    *
    * THE SCALE INSIGHT: FIFO needs no lot×issue pair join at all —
    * consumed(lot) = clamp(cum_end, D) − clamp(cum_start, D) against
    * the part's total demand D, so the whole operator is ONE window
    * cumsum over lots + ONE map-combined issue aggregate + a per-part
    * join (pair enumeration would be quadratic on hot parts). All
    * money in exact e4/e8 integers: unit cost = round-half-up
    * extprice/qty e4, per-lot consumed value exact long products
    * summed in DECIMAL(38,0), final COGS one round-half-up DIV back
    * to e4.
    */
  def q255FifoCosting(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_partkey").as("partkey"), col("l_linestatus").as("st"),
      col("l_shipdate").as("sd"), col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln"),
      expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        .as("qty_e4"),
      expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)""").as("price_e4"))
    val lotW = Window.partitionBy(col("partkey"))
      .orderBy(col("sd"), col("ok"), col("ln"), col("qty_e4"),
        col("price_e4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lots = li.filter(col("st") === "F")
      .withColumn("cum_end", sum(col("qty_e4")).over(lotW))
      .withColumn("cum_start", col("cum_end") - col("qty_e4"))
      .withColumn("unit_e4", expr(
        "(2 * price_e4 * 10000 + qty_e4) DIV (2 * qty_e4)"))
    val demand = li.filter(col("st") === "O")
      .groupBy(col("partkey"))
      .agg(count(lit(1)).cast("long").as("n_issues"),
        sum(col("qty_e4")).cast("long").as("issued_qty_e4"))
    lots.join(demand, Seq("partkey"))
      .withColumn("_cons", expr(
        """LEAST(cum_end, issued_qty_e4)
           - LEAST(cum_start, issued_qty_e4)"""))
      .groupBy(col("partkey"))
      .agg(count(lit(1)).cast("long").as("n_lots"),
        max(col("n_issues")).as("n_issues"),
        max(col("issued_qty_e4")).as("issued_qty_e4"),
        sum(col("_cons")).cast("long").as("consumed_qty_e4"),
        expr("""CAST((2 * sum(CAST(_cons AS DECIMAL(38,0)) * unit_e4)
                      + 10000)
                DIV (2 * 10000) AS BIGINT)""").as("cogs_e4"),
        expr("""CAST((2 * sum(CAST(qty_e4 - _cons AS DECIMAL(38,0))
                          * unit_e4) + 10000)
                DIV (2 * 10000) AS BIGINT)""").as("end_inventory_e4"))
  }

  /** q264: RENDEZVOUS-HASHING RESHARDING AUDIT (highest-random-weight
    * hashing, Thaler & Ravishankar 1998 — what Riak/Ceph-class systems
    * use to place keys): every customer key is assigned to
    * argmax_s md5(key:s) over 8 shards and again over 9, and the
    * report shows per old shard how many keys MOVE — the rendezvous
    * guarantee says only ~1/(N+1) of keys move and ALL of them to the
    * new shard (n_moved_elsewhere is the violation audit column,
    * identically 0). The capacity-planning dual of q137's skew
    * profile: q137 asks "are my shards balanced", this asks "what
    * does adding one cost". Reference analogue: the season-partitioned
    * rankings (sql/db_creation_script.sql:31-38) reshard every season.
    *
    * ENGINE-EXACT: the weight is the md5 hex STRING itself (lexical
    * argmax — md5 agrees byte-for-byte across engines, the q23 rule);
    * both assignments come out of ONE 9-way fan-out pass (old = argmax
    * over s ≤ 7 via a null-skipped struct max). Scale shape: 9×
    * key-scale fan-out, one map-combined groupBy, bounded output.
    */
  def q264RendezvousShards(s: SparkSession, d: String): DataFrame = {
    val shards = s.range(0, 9).select(col("id").as("sh"))
    val scored = Tables.customer(s, d).select(col("c_custkey").as("key"))
      .crossJoin(broadcast(shards))
      .select(col("key"), col("sh"),
        md5(concat(col("key").cast("string"), lit(":"),
          col("sh").cast("string"))).as("h"))
    val assigned = scored.groupBy(col("key"))
      .agg(max(when(col("sh") <= 7L, struct(col("h"), col("sh"))))
          .getField("sh").as("old_shard"),
        max(struct(col("h"), col("sh"))).getField("sh").as("new_shard"))
    assigned.groupBy(col("old_shard").as("shard"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum(when(col("new_shard") =!= col("old_shard"), 1L)
          .otherwise(0L)).cast("long").as("n_moved"),
        sum(when(col("new_shard") =!= col("old_shard")
            && col("new_shard") =!= 8L, 1L).otherwise(0L))
          .cast("long").as("n_moved_elsewhere"))
      .withColumn("moved_ppm", expr(
        "CAST((2000000 * n_moved + n_keys) DIV (2 * n_keys) AS BIGINT)"))
  }
}
