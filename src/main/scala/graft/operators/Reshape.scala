package graft.operators

import org.apache.spark.sql.functions._
import Q._

/** Reshaping + order-statistics operators: pivot (long→wide), unpivot
  * (wide→long), and exact percentiles. All pure `org.apache.spark.sql`;
  * pivot compiles to conditional aggregation (one shuffle, partial
  * aggs), unpivot to a generator projection (map-only), and exact
  * `percentile` to a sort-based aggregate per group.
  */
object Reshape {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Pivot: per event hour-of-day, one count column per event_type.
    // Explicit value list keeps the plan single-pass (no distinct scan).
    "q38_pivot" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .withColumn("hour_of_day", hour(col("ts")).cast("long"))
        .groupBy("hour_of_day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("hour_of_day"),
      Some("""SELECT CAST(HOUR(ts) AS BIGINT) AS hour_of_day,
                COUNT(*) FILTER (event_type = 'click') AS click,
                COUNT(*) FILTER (event_type = 'view') AS view,
                COUNT(*) FILTER (event_type = 'purchase') AS purchase,
                COUNT(*) FILTER (event_type = 'signup') AS signup,
                COUNT(*) FILTER (event_type = 'error') AS error
              FROM events GROUP BY 1 ORDER BY hour_of_day""")),

    // Unpivot (wide→long): lineitem per-row charge components melted to
    // (measure, value) rows, then aggregated per measure.
    "q39_unpivot" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"),
          round(dsum(col("val"), 6), 2).cast("double").as("total"))
        .orderBy("measure"),
      Some("""SELECT measure, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(val AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
              FROM (SELECT l_orderkey, l_linenumber, measure, val
                    FROM lineitem
                    UNPIVOT (val FOR measure IN
                      (l_extendedprice, l_discount, l_tax))) u
              GROUP BY measure ORDER BY measure""")),

    // Cube: all grouping combinations of (status, priority) with
    // GROUPING_ID distinguishing the aggregation level; ordering leads
    // with gid so the NULL super-aggregate rows sort identically in
    // both engines.
    "q42_cube" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority,
                CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                COUNT(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              ORDER BY gid, o_orderstatus, o_orderpriority""")),

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicities (vs q15's distinct-set variants).
    "q43_setops_all" -> QueryDef(
      (s, dir) => {
        val sup = table(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey"))
        val cust = table(s, dir, "customer")
          .select(col("c_nationkey").as("nationkey"))
        val i = sup.intersectAll(cust).withColumn("op", lit("intersect_all"))
        val e = cust.exceptAll(sup).withColumn("op", lit("except_all"))
        i.union(e)
          .groupBy("op", "nationkey")
          .agg(count(lit(1)).as("n"))
          .orderBy("op", "nationkey")
      },
      Some("""WITH s AS (SELECT s_nationkey AS nationkey FROM supplier),
                   c AS (SELECT c_nationkey AS nationkey FROM customer),
                   i AS (SELECT nationkey FROM s INTERSECT ALL
                         SELECT nationkey FROM c),
                   e AS (SELECT nationkey FROM c EXCEPT ALL
                         SELECT nationkey FROM s)
              SELECT op, nationkey, COUNT(*) AS n FROM (
                SELECT 'intersect_all' AS op, nationkey FROM i
                UNION ALL SELECT 'except_all', nationkey FROM e) t
              GROUP BY op, nationkey ORDER BY op, nationkey""")),

    // Array higher-order functions over embeddings: per-row filter
    // count + extrema (float→double widening is exact, so no rounding
    // is needed anywhere), aggregated per label.
    "q44_array_hof" -> QueryDef(
      (s, dir) => table(s, dir, "embeddings")
        .withColumn("n_pos",
          size(filter(col("embedding"), x => x > 0f)).cast("long"))
        .withColumn("e_max", array_max(col("embedding")).cast("double"))
        .withColumn("e_min", array_min(col("embedding")).cast("double"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("n_pos")).as("total_pos"),
          max(col("e_max")).as("lab_max"),
          min(col("e_min")).as("lab_min"))
        .orderBy("label"),
      Some("""SELECT label, COUNT(*) AS n,
                CAST(SUM(LEN(list_filter(embedding, x -> x > 0))) AS BIGINT)
                  AS total_pos,
                MAX(CAST(list_max(embedding) AS DOUBLE)) AS lab_max,
                MIN(CAST(list_min(embedding) AS DOUBLE)) AS lab_min
              FROM embeddings GROUP BY label ORDER BY label""")),

    // Exact order statistics per order priority: median and p90 via the
    // sort-based exact percentile (both engines interpolate linearly on
    // the same exact doubles; results surfaced rounded).
    "q40_percentiles" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("med"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
                ROUND(quantile_cont(o_totalprice, 0.5), 2) AS med,
                ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
              FROM orders GROUP BY 1 ORDER BY o_orderpriority"""))
  )
}
