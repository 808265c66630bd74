package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Q

/** Bucketed co-located join: pre-bucketing both sides of a recurring
  * join on the join key lets Spark plan a sort-merge join with ZERO
  * exchanges — the 100 TB technique for fact-fact joins that would
  * otherwise shuffle terabytes on every query. Verifies (a) the plan
  * has no Exchange on either side, and (b) the result is identical to
  * the plain shuffled join.
  */
class BucketJoinSpec extends SparkSpec {

  test("bucketed tables join without any exchange and match the shuffled join") {
    val tmp = Files.createTempDirectory("graft-bucketed")
    val orders = Q.table(spark, sfDir, "orders")
    val customer = Q.table(spark, sfDir, "customer")
    try {
      orders.write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders_b").saveAsTable("orders_b")
      customer.write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer_b").saveAsTable("customer_b")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("orders_b")
          .join(spark.table("customer_b"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), Q.money(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
        val rows = joined.collect()
        val plan = joined.queryExecution.executedPlan.toString

        assert(plan.contains("SortMergeJoin"))
        // bucket co-location: the join consumes the bucketed scans
        // directly, so the ONLY hashpartitioning exchange in the final
        // plan is the downstream groupBy's (an unbucketed join has 3).
        // AQE's toString appends the pre-adaptive "Initial Plan" —
        // count only the final section.
        val finalPlan = plan.split("== Initial Plan ==")(0)
        assert(finalPlan.contains("Bucketed: true"))
        val exchanges =
          "Exchange hashpartitioning".r.findAllIn(finalPlan).length
        assert(exchanges <= 1,
          s"bucketed join still shuffled its inputs ($exchanges exchanges)\n$plan")

        val expected = orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), Q.money(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
          .collect()
        assert(rows.toSeq == expected.toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
