package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The crawl engine's relational stages (SURVEY.md §2) expressed over
  * the driver's TPC-H-ish tables so the DuckDB oracle can check them:
  * anti-join (J1), budget-window admission (A3), host aggregation (A2),
  * union+distinct (U1/M5), broadcast dim join (J2), substring predicate
  * (P3), top-k priority (per-host priority queue), tumbling-window
  * metrics. Filters and projections stay declarative so Catalyst pushes
  * them into the parquet scans.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Driver's canonical example (kept verbatim as the smoke query). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_qty"))
      .select($"l_returnflag", $"sum_qty")
  }

  /** J1 — left-anti join, the novelty check's shape: customers with no
    * order above 150k (predicate pushed into the right side's scan). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = t(spark, dir, "orders").filter($"o_totalprice" > 150000.0)
      .select($"o_custkey".as("c_custkey"))
    t(spark, dir, "customer").select($"c_custkey")
      .join(big, Seq("c_custkey"), "left_anti")
  }

  /** Left-semi join (EXISTS): customers with at least one order above
    * 100k. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = t(spark, dir, "orders").filter($"o_totalprice" > 100000.0)
      .select($"o_custkey".as("c_custkey"))
    t(spark, dir, "customer").select($"c_custkey")
      .join(big, Seq("c_custkey"), "left_semi")
  }

  /** A3 — the 257-cap admission window, with a cap of 5 so it binds on
    * this data: first 5 events per user in (ts, event_id) order. */
  def budgetAdmission(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_admitted"))
  }

  /** A2 — per-host visit counting. */
  def hostVisits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events").groupBy($"user_id")
      .agg(count(lit(1)).as("visits"))
  }

  /** U1/M5 — union of two tagged projections then distinct, the
    * page-links ∪ image-links shape. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = t(spark, dir, "orders").select(lit("page").as("kind"), $"o_custkey".as("key"))
    val b = t(spark, dir, "customer").select(lit("image").as("kind"), $"c_custkey".as("key"))
    a.unionByName(b).distinct()
  }

  /** J2 — broadcast join against a small dimension (the budget/robots
    * table shape): customers per nation name. */
  def broadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"))
  }

  /** P3 — the scheme predicate is substring containment, not equality;
    * same shape here over event_type. */
  def substringFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .filter($"event_type".contains("ur")) // 'purchase'
      .select($"event_id", $"event_type")
  }

  /** Per-host priority queue — top-3 orders per customer by
    * (price desc, key). */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rnk")
  }

  /** As-of join — for each event, the most recent order of the same
    * user at or before the event time (latest (o_orderdate, o_orderkey)
    * wins ties). Spark-first shape: NOT an inequality join (quadratic
    * per key at scale) — both streams union on the key and ONE window
    * pass carries the latest order id forward (`last(..., ignoreNulls)`
    * over rows-unbounded-preceding): a single shuffle on the key,
    * linear state, the same shape a 100 TB event/dimension alignment
    * needs. Orders sort before events at equal timestamps (tag), so
    * "at or before" includes same-instant orders. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .select($"user_id".as("key"), $"ts".as("t"), lit(1).as("tag"),
        $"event_id", lit(null).cast("bigint").as("oid"))
    val od = t(spark, dir, "orders")
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"), lit(0).as("tag"),
        lit(null).cast("bigint").as("event_id"), $"o_orderkey".as("oid"))
    val w = Window.partitionBy($"key").orderBy($"t", $"tag", $"oid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(od)
      .withColumn("last_order", last($"oid", ignoreNulls = true).over(w))
      .filter($"tag" === 1 && $"last_order".isNotNull)
      .select($"event_id", $"key".as("user_id"), $"t".as("ts"), $"last_order")
  }

  /** Interval/range join — the conversion-window count: per 'view'
    * event, purchases by the same user within the 3 days at-or-after
    * the view. The equality key (user) carries the one shuffle; the
    * range predicate filters inside the joined partitions — never a
    * cross join / BNLJ (PlanSpec-gated shape family).
    *
    * r5: reformulated events×events — the previous orders×events form
    * was VACUOUS on the driver fixtures (orders end 2001, events start
    * 2024 → 0 rows every round); both sides of this one live in the
    * same 2024 window, so the oracle row is a real check. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
    ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
      .join(ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"ts".as("p_ts")),
        $"p_user" === $"user_id" &&
          $"p_ts" >= $"ts" &&
          $"p_ts" < $"ts" + expr("INTERVAL 3 DAYS"))
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_purchases"))
  }

  /** Grouping sets (ROLLUP) — per (event_type, hour-of-day), per
    * event_type, and grand-total counts in one pass (map-side partial
    * aggregation covers all grouping sets). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .rollup($"event_type", hour($"ts").cast("bigint").as("hod"))
      .agg(count(lit(1)).as("n"))
  }

  /** Running total per user in event order — the cumulative-budget
    * shape (A2's continuous analog). Summed in INTEGER cents
    * (floor(value*100)): DuckDB evaluates windowed sums with a segment
    * tree, so a double running sum differs from Spark's in the last
    * ulp — integer accumulation is association-free and the oracle is
    * exact. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        sum(floor($"value" * 100).cast("bigint")).over(w).as("running_cents"))
  }

  /** lead/lag — previous and next event type per user in event order
    * (the transition-analysis shape). */
  def leadLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        lag($"event_type", 1).over(w).as("prev_type"),
        lead($"event_type", 1).over(w).as("next_type"))
  }

  /** PIVOT — per day-of-week event counts spread into one column per
    * event type. The pivot VALUES are pinned (the scale rule: an
    * unpinned pivot first runs a distinct job over the full table just
    * to discover the columns). Catalyst compiles it two-phase: one
    * full-data aggregation on (dow, event_type) with map-side partials,
    * then PivotFirst over the already-reduced dow x type table (35
    * rows here — sketch-sized at any input scale). Empty cells are 0
    * on both engines (Spark pivot yields null there; na.fill aligns it
    * with DuckDB's FILTER count). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy(dayofweek($"ts").cast("bigint").as("dow"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /** INTERSECT (distinct set intersection) — customers holding BOTH a
    * high-value and an urgent order; compiles to a left-semi join over
    * distinct keys, the same equi-join family as the rest of the set
    * ops (U1/U2). */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = t(spark, dir, "orders")
    o.filter($"o_totalprice" > 150000.0).select($"o_custkey")
      .intersect(o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"))
  }

  /** Grouping sets (CUBE) — all four aggregation granularities of
    * (event_type, day-of-week) in one Expand pass. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .cube($"event_type", dayofweek($"ts").cast("bigint").as("dow"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-wave metrics shape: tumbling hourly counts per event type. */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
  }

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",
    "q_pivot" ->
      """SELECT dayofweek(ts) + 1 AS dow,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey FROM customer c WHERE NOT EXISTS
        |(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey FROM customer c WHERE EXISTS
        |(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)""".stripMargin,
    "q_budget_admission" ->
      """SELECT user_id, count(*) AS n_admitted FROM (
        |  SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 5 GROUP BY user_id""".stripMargin,
    "q_host_visits" ->
      "SELECT user_id, count(*) AS visits FROM events GROUP BY user_id",
    "q_union_distinct" ->
      """SELECT DISTINCT kind, key FROM (
        |  SELECT 'page' AS kind, o_custkey AS key FROM orders
        |  UNION ALL SELECT 'image' AS kind, c_custkey AS key FROM customer)""".stripMargin,
    "q_broadcast_join" ->
      """SELECT n_name, count(*) AS n_customers FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin,
    "q_substring_filter" ->
      "SELECT event_id, event_type FROM events WHERE contains(event_type, 'ur')",
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, ts, o_orderkey AS last_order FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin,
    "q_range_join" ->
      """SELECT v.event_id, count(*) AS n_purchases
        |FROM events v JOIN events p
        |  ON p.user_id = v.user_id AND v.event_type = 'view'
        |     AND p.event_type = 'purchase'
        |     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 3 DAY
        |GROUP BY v.event_id""".stripMargin,
    "q_rollup_agg" ->
      """SELECT event_type, hour(ts) AS hod, count(*) AS n
        |FROM events GROUP BY ROLLUP (event_type, hod)""".stripMargin,
    // DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based
    "q_cube_agg" ->
      """SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS n
        |FROM events GROUP BY CUBE (event_type, dow)""".stripMargin,
    "q_running_total" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM events""".stripMargin,
    "q_lead_lag" ->
      """SELECT event_id, user_id, event_type,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin
  )
}
