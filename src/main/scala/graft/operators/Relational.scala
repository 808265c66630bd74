package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Declared relational capability surface Q01–Q21 (SURVEY §2B): scans,
  * filters, aggregates, the full join menu, rollup, windows, top-k, set
  * ops, and the scalar-function families — all pure
  * `org.apache.spark.sql`, no custom Catalyst (predicate pushdown, column
  * pruning, partial aggregation, join selection, AQE, and
  * TakeOrderedAndProject come from Catalyst for free, SURVEY §4).
  *
  * Every query carries a DuckDB oracle with identical column names and a
  * total ORDER BY. Floating aggregates use the decimal-sum pattern from
  * [[Q.dsum]] so hashes are stable across engines and partial-agg orders.
  */
object Relational {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Q01 scan + projection: column pruning reaches the parquet scan
    // (ReadSchema carries only 3 of 11 lineitem columns).
    "q01_scan_project" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
        // so the ORDER BY covers every output column: identical rows are
        // interchangeable, making the sorted sequence (and its 100-prefix)
        // fully determined.
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""")),

    // Q02 filter: all three predicates push to the parquet scan.
    "q02_filter" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 10 && col("l_returnflag") =!= "A")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
              FROM lineitem
              WHERE l_discount BETWEEN CAST(0.02 AS DOUBLE) AND CAST(0.04 AS DOUBLE)
                AND l_quantity < 10 AND l_returnflag <> 'A'
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""")),

    // Q03 hash aggregate (TPC-H Q1 shape): Catalyst plans partial+final
    // HashAggregate — map-side combine before the 8-group shuffle.
    "q03_agg_tpchq1" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          round(dsum(col("l_quantity")), 2).cast("double").as("sum_qty"),
          round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .cast("double").as("revenue"),
          davg(col("l_discount")).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
                CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
                CAST(ROUND(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
                ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2) AS avg_disc
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Q04 equi inner join: customer is the small dim side — explicit
    // broadcast keeps the orders side shuffle-free at any scale.
    "q04_join_inner" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .join(broadcast(table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Q05 multi-way join: both dims broadcast; join order left to
    // Catalyst/AQE.
    "q05_join_multiway" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("r_name"),
      Some("""SELECT r_name, COUNT(*) AS n_cust
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name ORDER BY r_name""")),

    // Q06 left outer + null-aware aggregate: customers with zero orders.
    "q06_join_left_outer" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .filter(col("n_orders") === 0)
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey HAVING COUNT(o_orderkey) = 0
              ORDER BY c_custkey""")),

    // Q07 left semi (EXISTS): the filter on orders is applied before the
    // join, so the semi probe side is already pruned.
    "q07_join_semi" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 100000)
              ORDER BY c_custkey""")),

    // Q08 left anti (NOT EXISTS).
    "q08_join_anti" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // Q09 theta (non-equi) join → broadcast nested loop; output is a single
    // count so no ORDER BY is needed.
    "q09_join_theta" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .join(broadcast(table(s, dir, "supplier")),
          col("p_size") < col("s_suppkey"))
        .agg(count(lit(1)).as("n_pairs")),
      Some("""SELECT COUNT(*) AS n_pairs FROM part, supplier
              WHERE p_size < s_suppkey""")),

    // Q10 rollup + GROUPING(): ordering leads with grp so the all-NULL
    // total row sorts deterministically in both engines (their NULL
    // ordering defaults differ).
    "q10_rollup" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"),
          grouping(col("n_name")).cast("int").as("grp"))
        .select("n_name", "grp", "n_cust")
        .orderBy("grp", "n_name"),
      Some("""SELECT n_name, CAST(GROUPING(n_name) AS INTEGER) AS grp,
                COUNT(c_custkey) AS n_cust
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY ROLLUP(n_name) ORDER BY grp, n_name""")),

    // Q11 distinct aggregates: Catalyst expands to a two-phase plan with a
    // partial distinct — no driver-side distinct anywhere.
    "q11_distinct_agg" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
                COUNT(DISTINCT l_suppkey) AS nd_supp
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Q12 window ranking: top-3 orders per customer.
    "q12_window_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Q13 window analytic + frame: LAG and a running decimal-exact sum.
    "q13_window_frame" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        table(s, dir, "orders")
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("running_total",
            round(sum(col("o_totalprice").cast(DecimalType(18, 4)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .cast("double"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "prev_price",
            "running_total")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                LAG(o_totalprice, 1) OVER w AS prev_price,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                  AS running_total
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Q14 global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    // top-10 heaps, no full sort, no full shuffle.
    "q14_topk" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Q15 set ops: UNION (distinct) / INTERSECT / EXCEPT, tagged and
    // stacked so one query exercises all three.
    "q15_setops" -> QueryDef(
      (s, dir) => {
        val sup = table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val cust = table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val u = sup.union(cust).distinct().withColumn("op", lit("union"))
        val i = sup.intersect(cust).withColumn("op", lit("intersect"))
        val e = sup.except(cust).withColumn("op", lit("except"))
        u.union(i).union(e).select("op", "nationkey").orderBy("op", "nationkey")
      },
      Some("""WITH s AS (SELECT s_nationkey AS nationkey FROM supplier),
                   c AS (SELECT c_nationkey AS nationkey FROM customer),
                   u AS (SELECT nationkey FROM s UNION SELECT nationkey FROM c),
                   i AS (SELECT nationkey FROM s INTERSECT SELECT nationkey FROM c),
                   e AS (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
              SELECT op, nationkey FROM (
                SELECT 'union' AS op, nationkey FROM u
                UNION ALL SELECT 'intersect', nationkey FROM i
                UNION ALL SELECT 'except', nationkey FROM e) t
              ORDER BY op, nationkey""")),

    // Q16 string functions (all codegen'd built-ins).
    "q16_strings" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_brand")).as("brand_l"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          trim(col("p_name")).as("name_trim"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_brand) AS brand_l,
                SUBSTRING(p_name, 1, 5) AS name5,
                CAST(LENGTH(p_name) AS BIGINT) AS name_len,
                TRIM(p_name) AS name_trim,
                CONCAT(p_brand, '#', p_type) AS brand_type,
                REPLACE(p_type, ' ', '_') AS type_u
              FROM part ORDER BY p_partkey""")),

    // Q17 date/time functions per order month.
    "q17_datetime" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(count(lit(1)).as("n_orders"),
          datediff(to_date(max(col("o_orderdate"))),
            to_date(min(col("o_orderdate")))).cast("long").as("day_span"))
        .orderBy("o_year", "o_month"),
      Some("""SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
                CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
                DATE_TRUNC('month', o_orderdate) AS month_start,
                COUNT(*) AS n_orders,
                CAST(DATE_DIFF('day', CAST(MIN(o_orderdate) AS DATE),
                  CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS day_span
              FROM orders GROUP BY 1, 2, 3 ORDER BY o_year, o_month""")),

    // Q18 conditional + math functions per price bucket.
    "q18_conditional" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small"))
        .withColumn("status",
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")))
        .groupBy("bucket", "status")
        .agg(count(lit(1)).as("n"),
          round(dsum(col("o_totalprice")), 2).cast("double").as("tot"),
          ceil(max(col("o_totalprice"))).cast("long").as("hi"),
          floor(min(col("o_totalprice"))).cast("long").as("lo"),
          round(min(abs(col("o_totalprice"))), 2).as("min_abs"))
        .orderBy("bucket", "status"),
      Some("""SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
                          WHEN o_totalprice > 100000 THEN 'mid'
                          ELSE 'small' END AS bucket,
                COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status,
                COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS tot,
                CAST(CEIL(MAX(o_totalprice)) AS BIGINT) AS hi,
                CAST(FLOOR(MIN(o_totalprice)) AS BIGINT) AS lo,
                ROUND(MIN(ABS(o_totalprice)), 2) AS min_abs
              FROM orders GROUP BY 1, 2 ORDER BY bucket, status""")),

    // Q19 JSON scalar extraction from the events.props string column.
    "q19_json" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      // NULLS FIRST pins DuckDB to Spark's ASC null ordering in case a
      // row ever lacks the key (none do today; latent-divergence guard)
      Some("""SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k,
                COUNT(*) AS n
              FROM events GROUP BY k ORDER BY k NULLS FIRST""")),

    // Q20 array functions over embeddings: size / element_at / per-row
    // sequential fold (deterministic in both engines), then exact decimal
    // sums across rows.
    "q20_arrays" -> QueryDef(
      (s, dir) => table(s, dir, "embeddings")
        .withColumn("dim", size(col("embedding")).cast("long"))
        .withColumn("e_first", element_at(col("embedding"), 1))
        .withColumn("e_last", element_at(col("embedding"), -1))
        .withColumn("row_sum",
          // round-then-decimal: the fold result is an arbitrary double;
          // rounding to 10 places first keeps the later DECIMAL(28,10)
          // cast a single well-defined step in both engines
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 10))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          max(col("dim")).as("dim"),
          round(sum(col("e_first").cast(DecimalType(18, 6))), 4)
            .cast("double").as("sum_first"),
          round(sum(col("e_last").cast(DecimalType(18, 6))), 4)
            .cast("double").as("sum_last"),
          round(sum(col("row_sum").cast(DecimalType(28, 10))), 2)
            .cast("double").as("sum_all"))
        .orderBy("label"),
      Some("""WITH per_row AS (
                SELECT label,
                  CAST(LEN(embedding) AS BIGINT) AS dim,
                  embedding[1] AS e_first,
                  embedding[LEN(embedding)] AS e_last,
                  ROUND((SELECT SUM(CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)), 10) AS row_sum
                FROM embeddings)
              SELECT label, COUNT(*) AS n_vecs, MAX(dim) AS dim,
                CAST(ROUND(SUM(CAST(e_first AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_first,
                CAST(ROUND(SUM(CAST(e_last AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_last,
                CAST(ROUND(SUM(CAST(row_sum AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_all
              FROM per_row GROUP BY label ORDER BY label""")),

    // Q21 tumbling time window, batch-checkable form (the streaming
    // variant with watermarks is graft.streaming.StreamingOps.tumbling).
    "q21_time_window" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 2).cast("double").as("sum_value"))
        .orderBy("event_type", "hour_start"),
      Some("""SELECT event_type, DATE_TRUNC('hour', ts) AS hour_start,
                COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY event_type, hour_start""")),

    // Q35 batch sessionization: session_window with a 30-minute gap per
    // event_type. Spark closes a session when the next event is ≥ gap
    // after the last one; the oracle states the same semantics as a
    // gaps-and-islands window (break when ts − prev ≥ 30 min).
    "q35_sessionize" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 2).cast("double").as("sum_value"))
        .select(col("session_window.start").as("sess_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("event_type", "sess_start"),
      Some("""WITH e AS (SELECT event_type, event_id, ts, value,
                  CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
              g AS (SELECT event_type, ts, value,
                  SUM(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM e)
              SELECT MIN(ts) AS sess_start, event_type, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                  AS sum_value
              FROM g GROUP BY event_type, sid
              ORDER BY event_type, sess_start""")),

    // Q36 as-of join: each purchase joined to the user's most recent
    // click at-or-before it. Spark form is the scalable union+window
    // trick — tag both streams, one shuffle on user_id, running
    // last(click_ts) — no range-join explosion and no custom Catalyst;
    // clicks sort before purchases at equal ts (tag order) to match
    // ASOF's `>=`. Oracle is DuckDB's native ASOF LEFT JOIN.
    "q36_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("tag"),
            lit(null).cast("long").as("event_id"), col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"),
            col("event_id"), lit(null).cast("timestamp").as("click_ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "tag")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("last_click_ts",
            last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("last_click_ts"),
            expr("(unix_micros(ts) - unix_micros(last_click_ts)) div 1000000")
              .as("wait_sec"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              c AS (SELECT DISTINCT user_id, ts AS click_ts FROM events
                    WHERE event_type = 'click')
              SELECT p.event_id, p.user_id, p.ts,
                c.click_ts AS last_click_ts,
                (epoch_us(p.ts) - epoch_us(c.click_ts)) // 1000000 AS wait_sec
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts >= c.click_ts
              ORDER BY event_id""")),

    // Q37 range (interval-proximity) join: click/view pairs of the same
    // user within one hour of each other. The naive plan is an
    // inequality join (nested loop over every same-user pair); the scale
    // form used here is TIME-BUCKET BANDING — the build side buckets
    // once at the gap width, the probe side explodes to its bucket ±1,
    // and the join is a plain equi-join on (user, bucket) with an exact
    // residual filter. Each qualifying pair lands in exactly one probed
    // bucket (the view's), so no dedup is needed.
    "q37_range_join" -> QueryDef(
      (s, dir) => {
        val gapUs = 3600L * 1000000L
        val ev = table(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            unix_micros(col("ts")).as("vus"))
          .withColumn("bucket", expr(s"vus div ${gapUs}L"))
        val probes = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            unix_micros(col("ts")).as("cus"))
          .withColumn("b0", expr(s"cus div ${gapUs}L"))
          .withColumn("bucket",
            explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
        probes.join(views, Seq("user_id", "bucket"))
          .filter(abs(col("cus") - col("vus")) <= gapUs)
          .select(col("click_id"), col("view_id"),
            expr("abs(cus - vus) div 1000000").as("diff_sec"))
          .orderBy("click_id", "view_id")
      },
      Some("""WITH c AS (SELECT event_id AS click_id, user_id,
                    epoch_us(ts) AS cus
                  FROM events WHERE event_type = 'click'),
              v AS (SELECT event_id AS view_id, user_id,
                    epoch_us(ts) AS vus
                  FROM events WHERE event_type = 'view')
              SELECT click_id, view_id,
                ABS(cus - vus) // 1000000 AS diff_sec
              FROM c JOIN v USING (user_id)
              WHERE ABS(cus - vus) <= 3600000000
              ORDER BY click_id, view_id"""))
  )
}
