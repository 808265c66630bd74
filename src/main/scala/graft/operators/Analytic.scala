package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Analytic / SQL-surface extensions beyond the core relational set
  * (SURVEY §2B q47–q54, q57–q60, q72–q77, q82, q84–q89): ordered string
  * aggregation, correlated + LATERAL subqueries, distribution and
  * navigation windows, calendar densification, MapType + JSON surface,
  * skew-safe salted aggregation and join, GROUPING SETS, upsert/merge,
  * schema-evolution union, error-tolerant casts, funnel/cohort/TWA/
  * share/latency product analytics, and snapshot reconciliation.
  *
  * Scale notes: every aggregate here shuffles once on its real group
  * key with partial aggregation; the salted variant (q53) demonstrates
  * the two-stage shuffle that bounds any single reducer's load under
  * key skew — the pattern to reach for when one group key carries a
  * disproportionate share of a 100 TB input.
  */
object Analytic {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Ordered string aggregation: deterministic comma-joined sorted
    // distinct sources per language. collect_set shuffles once (partial
    // sets merge map-side); the sort happens per-row on the final
    // bounded array, never as a global order.
    "q47_string_agg" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          array_join(array_sort(collect_set(col("source"))), ",")
            .as("sources"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
                string_agg(DISTINCT source, ',' ORDER BY source) AS sources
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Correlated scalar subquery: customers with a balance above every
    // same-nation supplier's. Catalyst decorrelates the MAX subquery
    // into an aggregate + join (one shuffle on the correlation key) —
    // the subquery never executes per-row. MAX keeps the comparison
    // exact (no float summation); a supplier-less nation yields a NULL
    // bound, which both engines filter identically.
    "q48_corr_subquery" -> QueryDef(
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("g_customer")
        table(s, dir, "supplier").createOrReplaceTempView("g_supplier")
        table(s, dir, "nation").createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name, COUNT(*) AS n_above
                 FROM g_customer c JOIN g_nation n
                   ON c.c_nationkey = n.n_nationkey
                 WHERE c.c_acctbal > (SELECT MAX(s.s_acctbal)
                                      FROM g_supplier s
                                      WHERE s.s_nationkey = c.c_nationkey)
                 GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, COUNT(*) AS n_above
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
              WHERE c.c_acctbal > (SELECT MAX(s.s_acctbal) FROM supplier s
                                   WHERE s.s_nationkey = c.c_nationkey)
              GROUP BY n_name ORDER BY n_name""")),

    // Distribution window functions: quartile (ntile), percent_rank and
    // cume_dist per order priority. The unique (o_totalprice,
    // o_orderkey) sort key makes every rank deterministic; the ratios
    // are integer divisions evaluated identically by both engines.
    // High-cardinality partition key ⇒ the window parallelizes.
    "q49_window_dist" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        table(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"),
            col("o_orderkey"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy("o_orderpriority", "quartile")
          .agg(count(lit(1)).as("n"),
            round(min(col("pr")), 4).as("min_pr"),
            round(max(col("cd")), 4).as("max_cd"))
          .orderBy("o_orderpriority", "quartile")
      },
      Some("""WITH t AS (SELECT o_orderpriority,
                  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
                  PERCENT_RANK() OVER w AS pr,
                  CUME_DIST() OVER w AS cd
                FROM orders
                WINDOW w AS (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey))
              SELECT o_orderpriority, quartile, COUNT(*) AS n,
                ROUND(MIN(pr), 4) AS min_pr, ROUND(MAX(cd), 4) AS max_cd
              FROM t GROUP BY 1, 2 ORDER BY o_orderpriority, quartile""")),

    // Calendar densification: explode a generated month series between
    // the data's bounds and left-join the per-month counts so empty
    // months surface as zero (the gap-filling primitive time-series
    // reporting needs). The series is generated from a 1-row aggregate
    // — no driver-side loop, no cross join against data rows.
    "q50_date_series" -> QueryDef(
      (s, dir) => {
        val m = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n"))
        val series = m.agg(min("month").as("lo"), max("month").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 month"))).as("month"))
        series.join(m, Seq("month"), "left")
          .select(col("month"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("month")
      },
      Some("""WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                  COUNT(*) AS n
                FROM orders GROUP BY 1),
              b AS (SELECT MIN(month) AS lo, MAX(month) AS hi FROM m),
              s AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH))
                      AS month FROM b)
              SELECT s.month AS month, CAST(COALESCE(m.n, 0) AS BIGINT) AS n
              FROM s LEFT JOIN m ON s.month = m.month ORDER BY month""")),

    // MapType end-to-end: build a map<string,string> from columns,
    // explode it to (key, value) rows (generator projection, map-only),
    // aggregate per entry. Exercises map construction + the map
    // generator without any engine-specific map encoding in the output.
    "q51_map_explode" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(explode(map(
          lit("event_type"), col("event_type"),
          lit("value_bucket"),
          when(col("value") >= 50d, lit("high")).otherwise(lit("low")))))
        .groupBy("key", "value")
        .agg(count(lit(1)).as("n"))
        .orderBy("key", "value"),
      Some("""SELECT key, value, COUNT(*) AS n FROM (
                SELECT 'event_type' AS key, event_type AS value FROM events
                UNION ALL
                SELECT 'value_bucket',
                  CASE WHEN value >= 50 THEN 'high' ELSE 'low' END
                FROM events) t
              GROUP BY key, value ORDER BY key, value""")),

    // JSON key introspection: top-level key frequency across the event
    // props blobs — the schema-discovery scan you run before declaring
    // a from_json schema over semi-structured data.
    "q52_json_keys" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(explode(expr("json_object_keys(props)")).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, COUNT(*) AS n FROM (
                SELECT UNNEST(json_keys(props)) AS k FROM events) t
              GROUP BY k ORDER BY k""")),

    // Skew-safe salted aggregation: stage 1 groups on (key, salt) so a
    // hot key spreads across `Salt` reducers; stage 2 merges the ≤Salt
    // partials per key. Deterministic salt (hash of the row key, not
    // rand()) keeps the plan replayable. Result is provably identical
    // to the direct groupBy — the oracle is the plain GROUP BY.
    "q53_salted_agg" -> QueryDef(
      (s, dir) => {
        val Salt = 8
        table(s, dir, "lineitem")
          .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(Salt)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(count(lit(1)).as("pn"), dsum(col("l_quantity")).as("pq"))
          .groupBy("l_returnflag")
          .agg(sum(col("pn")).as("n"),
            round(sum(col("pq")), 2).cast("double").as("qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS qty
              FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // Explicit GROUPING SETS (beyond q10's rollup / q42's cube): the
    // (nation, segment) detail, per-nation subtotal, and grand total in
    // one pass. gid leads the ordering so the NULL super-aggregate rows
    // sort identically in both engines.
    "q54_grouping_sets" -> QueryDef(
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("g_customer")
        table(s, dir, "nation").createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name, c_mktsegment,
                   CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
                   COUNT(*) AS n
                 FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
                 GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
                 ORDER BY gid, n_name, c_mktsegment""")
      },
      Some("""SELECT n_name, c_mktsegment,
                CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid,
                COUNT(*) AS n
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
              ORDER BY gid, n_name, c_mktsegment""")),

    // Correlated LATERAL subquery: top-2 customers per nation, written
    // as the per-row subquery a SQL user reaches for. Catalyst
    // decorrelates the correlated ORDER BY ... LIMIT into a window
    // (rank-per-nation) plan — one shuffle on the correlation key, no
    // per-nation re-execution (the decorrelated shape is exactly q12's
    // top-k-per-group plan).
    "q58_lateral_topk" -> QueryDef(
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("g_customer")
        table(s, dir, "nation").createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name, c.c_custkey, c.c_acctbal
                 FROM g_nation n,
                 LATERAL (SELECT c_custkey, c_acctbal FROM g_customer
                          WHERE c_nationkey = n_nationkey
                          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
                 ORDER BY n_name, c_acctbal DESC, c_custkey""")
      },
      Some("""SELECT n_name, c.c_custkey, c.c_acctbal
              FROM nation n,
              LATERAL (SELECT c_custkey, c_acctbal FROM customer
                       WHERE c_nationkey = n_nationkey
                       ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
              ORDER BY n_name, c_acctbal DESC, c_custkey""")),

    // Map higher-order functions: per-user event-type histogram as a
    // map column (map_from_entries over collected pairs), doubled with
    // transform_values, thresholded with map_filter, exploded back to
    // rows. Map entry order is whatever collect_list produced — the
    // total ORDER BY makes the output deterministic, and the oracle is
    // the equivalent flat GROUP BY ... HAVING.
    "q59_map_hof" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .filter(col("user_id") <= 50)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(
          collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(col("user_id"),
          explode(map_filter(
            transform_values(col("m"), (_, v) => v * 2),
            (_, v) => v >= 4)))
        .select(col("user_id"), col("key").as("event_type"),
          col("value").as("n2"))
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, COUNT(*) * 2 AS n2
              FROM events WHERE user_id <= 50
              GROUP BY 1, 2 HAVING COUNT(*) * 2 >= 4
              ORDER BY user_id, event_type""")),

    // Time-based RANGE window frame: per event, the count and exact sum
    // of the same type's events in the trailing hour — the sliding
    // aggregation behind rate limits / rolling metrics. Frame
    // membership is VALUE-based (epoch seconds ± 3600), so ties and
    // evaluation order can't change it, and the decimal sum keeps the
    // result order-independent. The window partitions on event_type and
    // slides in O(n) per partition.
    "q60_range_frame" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("epoch"))
          .rangeBetween(-3600L, Window.currentRow)
        table(s, dir, "events")
          .withColumn("epoch", unix_timestamp(col("ts")))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            round(sum(col("value").cast("decimal(18,4)")).over(w), 2)
              .cast("double"))
          .select("event_id", "event_type", "n_1h", "sum_1h")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
                COUNT(*) OVER w AS n_1h,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 2)
                  AS DOUBLE) AS sum_1h
              FROM (SELECT *, CAST(FLOOR(epoch(ts)) AS BIGINT) AS e
                    FROM events) t
              WINDOW w AS (PARTITION BY event_type ORDER BY e
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")),

    // HLL sketch contract: exact distinct count alongside an assertion
    // that Spark's HLL++ estimate (rsd 2%) lands within 5% of it. The
    // estimate itself is deterministic — sketch merge is register-wise
    // max, so partition order can't change it — but its VALUE is
    // Spark-implementation-specific, so the oracle can't reproduce it;
    // instead the oracle states the error contract (within_5pct = 1)
    // and the hash compare FAILS if the sketch ever drifts outside
    // tolerance. At 100 TB the sketch is the only affordable distinct
    // count: fixed-size state, map-side partials, no distinct shuffle
    // of the key universe.
    "q57_sketch_distinct" -> QueryDef(
      // no Q.spread here, by measurement: the countDistinct first stage
      // re-shuffles on (flag, partkey) anyway, so a pre-exchange of the
      // raw rows only added cost (1.62 s → 1.97 s at sf0.1)
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          approx_count_distinct(col("l_partkey"), 0.02).as("est"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("est") - col("exact_nd")) <=
            col("exact_nd") * 0.05).cast("long").as("within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                COUNT(DISTINCT l_partkey) AS exact_nd, 1 AS within_5pct
              FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // Upsert / merge (last-writer-wins): an updates batch (every 10th
    // order re-priced, plus brand-new keys) merged into the base —
    // anti-join survivors ∪ updates, the engine-level MERGE INTO. One
    // shuffle on the merge key (or none if both sides are bucketed on
    // it); verified by per-status counts + exact sums over the merged
    // result. The +1000.00 re-price is exact in decimal.
    "q72_upsert_merge" -> QueryDef(
      (s, dir) => {
        val base = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        val updates = base.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"))
          .unionByName(base.filter(col("o_orderkey") % 1000 === 7)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("o_orderstatus"), col("o_totalprice")))
        base.join(updates.select("o_orderkey"), Seq("o_orderkey"),
            "left_anti")
          .unionByName(updates)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), money(col("o_totalprice")).as("tot"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM orders),
              upd AS (SELECT o_orderkey, o_orderstatus,
                  o_totalprice + 1000.0 AS o_totalprice
                FROM base WHERE o_orderkey % 10 = 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
                FROM base WHERE o_orderkey % 1000 = 7),
              merged AS (SELECT * FROM base
                WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
                UNION ALL SELECT * FROM upd)
              SELECT o_orderstatus, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS tot
              FROM merged GROUP BY 1 ORDER BY o_orderstatus""")),

    // Schema evolution: union two frames with different column sets by
    // NAME (allowMissingColumns — the append path when a pipeline adds
    // a column mid-stream); absent columns surface as NULL, verified by
    // null-aware counts. Positional union would silently misalign.
    "q73_union_by_name" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val old = ev.filter(col("event_id") % 2 === 0)
          .select(col("event_id"), col("event_type"))
        val newer = ev.filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("event_type"), col("value"))
        old.unionByName(newer, allowMissingColumns = true)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("value")).as("n_with_value"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (SELECT event_id, event_type,
                  CAST(NULL AS DOUBLE) AS value
                FROM events WHERE event_id % 2 = 0
                UNION ALL
                SELECT event_id, event_type, value
                FROM events WHERE event_id % 2 = 1)
              SELECT event_type, COUNT(*) AS n,
                COUNT(value) AS n_with_value
              FROM u GROUP BY 1 ORDER BY event_type""")),

    // Error-tolerant ingest: try_cast turns unparseable values into
    // NULL instead of failing the job — the dirty-data path of a
    // schema-on-read pipeline. Mixed column: numeric JSON field for
    // low values, non-numeric event_type otherwise; per-type parse
    // success/failure counts.
    "q74_try_cast" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .withColumn("raw",
          when(col("value") < 50.0,
            get_json_object(col("props"), "$.k"))
            .otherwise(col("event_type")))
        .withColumn("parsed", expr("try_cast(raw AS BIGINT)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("parsed")).as("n_parsed"),
          sum(when(col("parsed").isNull, 1L).otherwise(0L))
            .as("n_failed"))
        .orderBy("event_type"),
      Some("""WITH t AS (SELECT event_type,
                  TRY_CAST(CASE WHEN value < 50.0
                    THEN json_extract_string(props, '$.k')
                    ELSE event_type END AS BIGINT) AS parsed
                FROM events)
              SELECT event_type, COUNT(*) AS n,
                COUNT(parsed) AS n_parsed,
                CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_failed
              FROM t GROUP BY 1 ORDER BY event_type""")),

    // Navigation window functions: first/last/nth order price per
    // customer over the full partition frame (last_value needs the
    // explicit unbounded-following frame — the default frame ends at
    // the current row). Unique (date, key) sort keeps every value
    // deterministic; high-cardinality partition key parallelizes.
    "q75_window_nav" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        table(s, dir, "orders")
          .filter(col("o_custkey") <= 100)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_totalprice")).over(w).as("first_price"),
            last(col("o_totalprice")).over(w).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                FIRST_VALUE(o_totalprice) OVER w AS first_price,
                LAST_VALUE(o_totalprice) OVER w AS last_price,
                NTH_VALUE(o_totalprice, 2) OVER w AS second_price
              FROM orders WHERE o_custkey <= 100
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_custkey, o_orderkey""")),

    // Funnel analysis: users whose first click precedes their first
    // view precedes their first purchase — the ordered-milestone
    // conversion count. One aggregation per user (conditional MIN per
    // stage — no joins, no per-stage scans), then a count rollup:
    // exactly two shuffles at any event volume.
    "q76_funnel" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "click", col("ts"))).as("t1"),
          min(when(col("event_type") === "view", col("ts"))).as("t2"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t3"))
        .select(
          (col("t1").isNotNull && col("t2").isNotNull &&
            col("t3").isNotNull && col("t1") < col("t2") &&
            col("t2") < col("t3")).as("converted"),
          (col("t1").isNotNull && col("t2").isNotNull &&
            col("t1") < col("t2")).as("reached_view"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("reached_view").cast("long")).as("n_click_then_view"),
          sum(col("converted").cast("long")).as("n_converted")),
      Some("""WITH u AS (SELECT user_id,
                  MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t2,
                  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
                FROM events GROUP BY user_id)
              SELECT COUNT(*) AS n_users,
                CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
                  AND t1 < t2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_click_then_view,
                CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
                  AND t3 IS NOT NULL AND t1 < t2 AND t2 < t3
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
              FROM u""")),

    // Gap filling by last-observation-carried-forward: purchases carry
    // their value forward over the user's subsequent non-purchase
    // events (`last(..., ignoreNulls)` over the time-ordered per-user
    // frame) — the sparse→dense imputation step of feature pipelines.
    // Unique (ts, event_id) sort key; per-user windows parallelize;
    // decimal sum keeps the filled total order-independent.
    "q77_locf" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "events")
          .withColumn("sparse",
            when(col("event_type") === "purchase", col("value")))
          .withColumn("filled",
            last(col("sparse"), ignoreNulls = true).over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("filled")).as("n_filled"),
            money(col("filled")).as("filled_sum"))
          .orderBy("event_type")
      },
      Some("""WITH t AS (SELECT event_type,
                  LAST_VALUE(CASE WHEN event_type = 'purchase'
                      THEN value END IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS filled
                FROM events)
              SELECT event_type, COUNT(*) AS n,
                COUNT(filled) AS n_filled,
                CAST(ROUND(SUM(CAST(filled AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS filled_sum
              FROM t GROUP BY 1 ORDER BY event_type""")),

    // Schema-full JSON normalization: from_json with a declared schema
    // expands the props blob into typed columns in one codegen'd
    // projection (vs q19's per-key get_json_object path) — the
    // semi-structured→relational step of ingest. Integer-exact stats
    // over the extracted field.
    "q82_json_normalize" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .select(col("event_type"), col("p.k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          sum("k").as("sum_k"),
          round(sum(col("k")).cast("double") / count(col("k")), 4)
            .as("avg_k"))
        .orderBy("event_type"),
      Some("""WITH t AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
                FROM events)
              SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
                MIN(k) AS min_k, MAX(k) AS max_k,
                CAST(SUM(k) AS BIGINT) AS sum_k,
                ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 4) AS avg_k
              FROM t GROUP BY 1 ORDER BY event_type""")),

    // Time-weighted average: each event's value weighted by the seconds
    // until the user's next event (lead window over the per-user
    // timeline), Σ(v·dt)/Σdt per event type. dt is an exact integer
    // second diff; the weighted sum is decimal-exact; one window + one
    // aggregation, both keyed on real columns.
    "q84_time_weighted_avg" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        table(s, dir, "events")
          .withColumn("e", unix_timestamp(col("ts")))
          .withColumn("dt", lead(col("e"), 1).over(w) - col("e"))
          .filter(col("dt").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("dt").as("dt_total"),
            round(money(col("value") * col("dt")) /
              sum(col("dt")), 4).as("twa"))
          .orderBy("event_type")
      },
      Some("""WITH t AS (SELECT event_type, value,
                  LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dt
                FROM events)
              SELECT event_type, COUNT(*) AS n,
                CAST(SUM(dt) AS BIGINT) AS dt_total,
                ROUND(CAST(ROUND(SUM(CAST(value * dt AS DECIMAL(18,4))), 2)
                    AS DOUBLE) / SUM(dt), 4) AS twa
              FROM t WHERE dt IS NOT NULL
              GROUP BY 1 ORDER BY event_type""")),

    // Retention cohorts: users grouped by first-activity WEEK, counted
    // by week offset of each later active week — the cohort-triangle
    // query of product analytics. Week index is the exact integer
    // epoch-seconds div 604800 (no fractional months_between double
    // ever enters), and week granularity makes the fixture's ~30-day
    // span exercise real nonzero offsets. The cohort table is
    // |users|-sized, joined on user_id — a shuffle join at real scale,
    // both sides partitioned on the key.
    "q85_retention_cohorts" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("wi", expr("unix_timestamp(ts) div 604800"))
        val cohort = ev.groupBy("user_id").agg(min("wi").as("cohort_wi"))
        ev.select("user_id", "wi").distinct()
          .join(cohort, "user_id")
          .groupBy(col("cohort_wi"), (col("wi") - col("cohort_wi"))
            .as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_wi", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS wi
                FROM events),
              c AS (SELECT user_id, MIN(wi) AS cohort_wi
                    FROM e GROUP BY 1),
              a AS (SELECT DISTINCT user_id, wi FROM e)
              SELECT c.cohort_wi, a.wi - c.cohort_wi AS week_offset,
                COUNT(DISTINCT a.user_id) AS n_users
              FROM a JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY cohort_wi, week_offset""")),

    // Percent-of-total (ratio_to_report): each status's share of the
    // exact grand total — window sum over an already-aggregated frame
    // (the window input is |groups| rows, never the fact table). The
    // grand total is summed in DECIMAL inside the window (double
    // addition in arbitrary window order would re-open the
    // order-independence hole Q.dsum exists to close); only the final
    // division runs in doubles.
    "q86_pct_of_total" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy()
        table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(round(dsum(col("o_totalprice")), 2).as("tot_dec"))
          .select(col("o_orderstatus"),
            col("tot_dec").cast("double").as("tot"),
            round(col("tot_dec").cast("double") /
              sum(col("tot_dec")).over(w).cast("double") * 100, 4)
              .as("share"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH g AS (SELECT o_orderstatus,
                  ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS tot_dec
                FROM orders GROUP BY 1)
              SELECT o_orderstatus, CAST(tot_dec AS DOUBLE) AS tot,
                ROUND(CAST(tot_dec AS DOUBLE) /
                  CAST(SUM(tot_dec) OVER () AS DOUBLE) * 100, 4) AS share
              FROM g ORDER BY o_orderstatus""")),

    // Conversion latency: exact percentiles of the click→purchase
    // seconds per user (first of each) — the time-to-convert
    // distribution behind funnel (q76) counts. Integer second diffs
    // feed the interpolated percentile, identical in both engines.
    "q87_conversion_latency" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "click",
            unix_timestamp(col("ts")))).as("t1"),
          min(when(col("event_type") === "purchase",
            unix_timestamp(col("ts")))).as("t3"))
        .filter(col("t1").isNotNull && col("t3").isNotNull &&
          col("t3") > col("t1"))
        .select((col("t3") - col("t1")).as("lat"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lat, 0.5)"), 2).as("med_sec"),
          round(expr("percentile(lat, 0.9)"), 2).as("p90_sec"),
          min("lat").as("min_sec"), max("lat").as("max_sec")),
      Some("""WITH u AS (SELECT user_id,
                  MIN(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t1,
                  MIN(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t3
                FROM events GROUP BY 1),
              l AS (SELECT t3 - t1 AS lat FROM u
                    WHERE t1 IS NOT NULL AND t3 IS NOT NULL AND t3 > t1)
              SELECT COUNT(*) AS n_converted,
                ROUND(quantile_cont(lat, 0.5), 2) AS med_sec,
                ROUND(quantile_cont(lat, 0.9), 2) AS p90_sec,
                MIN(lat) AS min_sec, MAX(lat) AS max_sec FROM l""")),

    // Skew-safe salted JOIN (q53's pattern for joins): the fact side
    // gets a deterministic salt, the dim side explodes ×Salt replicas,
    // and the join key becomes (key, salt) — a hot key's rows spread
    // over Salt reducers instead of one. Result provably equals the
    // plain join (oracle = unsalted join); dim replication cost is
    // |dim|·Salt, the price of bounding the hottest reducer at 100 TB.
    "q88_salted_skew_join" -> QueryDef(
      (s, dir) => {
        val Salt = 8
        val fact = table(s, dir, "lineitem")
          // Salt must vary WITHIN a join key: hashing the key alone gives
          // every row of a hot key the same salt (still one reducer), so
          // mix in l_linenumber — deterministic, yet spreads a hot key
          // across all Salt partitions.
          .withColumn("salt",
            pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salt)))
        val dim = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
          .withColumn("salt",
            explode(sequence(lit(0L), lit(Salt - 1L))))
        fact.join(dim,
            fact("l_orderkey") === dim("o_orderkey") &&
              fact("salt") === dim("salt"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), money(col("l_extendedprice")).as("rev"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS rev
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1 ORDER BY o_orderpriority""")),

    // Snapshot reconciliation: diff two dataset versions (re-priced,
    // dropped, and added keys) via one full outer join, categorize
    // every key as added / removed / changed / unchanged — the audit
    // step between pipeline runs. One shuffle on the join key; the
    // category rollup is a tiny second aggregation.
    "q89_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val base = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val next = table(s, dir, "orders")
          .filter(col("o_orderkey") % 97 =!= 0) // dropped keys
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 10 === 0,
              col("o_totalprice") + 1000.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"))
          .unionByName(table(s, dir, "orders") // added keys
            .filter(col("o_orderkey") % 1000 === 7)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("o_totalprice")))
        base.select(col("o_orderkey"), col("o_totalprice").as("old_p"))
          .join(next.select(col("o_orderkey"),
            col("o_totalprice").as("new_p")), Seq("o_orderkey"), "full_outer")
          .select(when(col("old_p").isNull, "added")
            .when(col("new_p").isNull, "removed")
            .when(col("old_p") =!= col("new_p"), "changed")
            .otherwise("unchanged").as("category"))
          .groupBy("category").agg(count(lit(1)).as("n"))
          .orderBy("category")
      },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice AS old_p
                FROM orders),
              nxt AS (SELECT o_orderkey,
                  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                       ELSE o_totalprice END AS new_p
                FROM orders WHERE o_orderkey % 97 <> 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_totalprice
                FROM orders WHERE o_orderkey % 1000 = 7),
              j AS (SELECT CASE
                  WHEN base.old_p IS NULL THEN 'added'
                  WHEN nxt.new_p IS NULL THEN 'removed'
                  WHEN base.old_p <> nxt.new_p THEN 'changed'
                  ELSE 'unchanged' END AS category
                FROM base FULL OUTER JOIN nxt USING (o_orderkey))
              SELECT category, COUNT(*) AS n FROM j
              GROUP BY 1 ORDER BY category""")),

    // Markov transition matrix over per-user event sequences: the
    // sequence-modeling profile a pipeline computes before training on
    // behavioral logs (which state follows which, and how often). The
    // LEAD window partitions by user_id — each user's history sorts
    // independently, so the stage scales with the user count, never a
    // global sort. The transition rollup shuffles once onto a key space
    // bounded by |event_type|^2 (25 here) at ANY corpus size; the
    // per-from-state share runs as a window over that bounded frame.
    // Ties on ts break on event_id for a deterministic sequence.
    "q220_event_transitions" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("tot",
            sum("n").over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("(20000 * n + tot) div (2 * tot)").as("share_bp"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH o AS (SELECT event_type AS from_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS to_type
                FROM events),
              c AS (SELECT from_type, to_type, COUNT(*) AS n
                FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2),
              t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
              SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
                CAST((20000 * c.n + t.tot) // (2 * t.tot) AS BIGINT)
                  AS share_bp
              FROM c JOIN t USING (from_type)
              ORDER BY c.from_type, c.to_type""")),

    // SCD2-style validity intervals by gaps-and-islands: collapse each
    // user's consecutive runs of the same event_type into
    // [valid_from, valid_to) intervals (the type-2 dimension-history
    // build every warehouse runs on change streams), then roll up per
    // state: interval count, still-open count, and the exact closed
    // duration in epoch milliseconds. Change points come from a
    // null-safe LAG compare; island ids from a running sum — both
    // windows partition by user_id, so the stage scales with users.
    // The island collapse is one groupBy on (user, island); the final
    // rollup key space is |event_type|. Integer-only output
    // (unix_millis diffs), so the oracle hash is exact.
    "q221_scd2_intervals" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val islands = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w) <=> col("event_type"),
              0L).otherwise(1L))
          .withColumn("island", sum("chg").over(wRun))
          .groupBy("user_id", "island")
          .agg(min("event_type").as("event_type"),
            min("ts").as("valid_from"),
            count(lit(1)).as("n_events"))
        val wIsl = Window.partitionBy("user_id").orderBy("island")
        islands
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wIsl))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_intervals"),
            sum(when(col("valid_to").isNull, 1L).otherwise(0L))
              .as("n_open"),
            sum(when(col("valid_to").isNotNull,
              unix_millis(col("valid_to")) -
                unix_millis(col("valid_from"))).otherwise(0L))
              .as("closed_dur_ms"),
            sum("n_events").as("n_events"))
          .orderBy("event_type")
      },
      Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
                  CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS NOT DISTINCT FROM
                      event_type THEN 0 ELSE 1 END AS chg
                FROM events),
              i AS (SELECT user_id, event_type, ts,
                  SUM(chg) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS island
                FROM o),
              g AS (SELECT user_id, island,
                  MIN(event_type) AS event_type,
                  MIN(ts) AS valid_from, COUNT(*) AS n_events
                FROM i GROUP BY 1, 2),
              v AS (SELECT event_type, valid_from, n_events,
                  LEAD(valid_from) OVER (PARTITION BY user_id
                    ORDER BY island) AS valid_to
                FROM g)
              SELECT event_type, COUNT(*) AS n_intervals,
                CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_open,
                CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
                  epoch_ms(valid_to) - epoch_ms(valid_from) ELSE 0 END)
                  AS BIGINT) AS closed_dur_ms,
                CAST(SUM(n_events) AS BIGINT) AS n_events
              FROM v GROUP BY 1 ORDER BY event_type""")),

    // Sliding-window distinct users (trailing 7 days, per calendar
    // day) WITHOUT a per-day distinct scan: the naive plan re-counts
    // every user 7× per week of data; the scalable form turns each
    // user's active days into coverage intervals [d, d+6], merges
    // overlapping ones per user (gaps-and-islands, window PARTITIONED
    // by user), and emits ±1 difference-array events at interval
    // edges. The day-level delta agg shuffles onto the bounded
    // calendar key space, and the final running sum windows over that
    // bounded frame only — corpus-sized data never crosses a window
    // unpartitioned. The oracle is the naive day×activity join, so
    // the compare proves the interval algebra exactly.
    "q223_sliding_distinct" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct().managedPersist
        val w = Window.partitionBy("user_id").orderBy("d")
        val wRun = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val spans = e
          .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
          .withColumn("brk",
            when(col("gap").isNull || col("gap") > 6, 1L).otherwise(0L))
          .withColumn("isl", sum("brk").over(wRun))
          .groupBy("user_id", "isl")
          .agg(min("d").as("cov_start"),
            date_add(max("d"), 7).as("cov_stop")) // exclusive stop
        val deltas = spans
          .select(col("cov_start").as("day"), lit(1L).as("delta"))
          .unionByName(spans.select(col("cov_stop").as("day"),
            lit(-1L).as("delta")))
          .groupBy("day").agg(sum("delta").as("delta"))
        val b = e.agg(min("d").as("lo"), max("d").as("hi")).head()
        val cal = s.range(1).select(explode(sequence(
          lit(b.getDate(0)), lit(b.getDate(1)))).as("day"))
        cal.join(deltas, Seq("day"), "left")
          .na.fill(0L, Seq("delta"))
          .withColumn("n_active_7d",
            sum("delta").over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("day"), col("n_active_7d"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id,
                  CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
              cal AS (SELECT CAST(unnest(generate_series(
                  CAST((SELECT MIN(d) FROM e) AS TIMESTAMP),
                  CAST((SELECT MAX(d) FROM e) AS TIMESTAMP),
                  INTERVAL 1 DAY)) AS DATE) AS day)
              SELECT cal.day,
                CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active_7d
              FROM cal LEFT JOIN e
                ON e.d BETWEEN cal.day - 6 AND cal.day
              GROUP BY 1 ORDER BY cal.day"""))
  )
}
