package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Q

/** Source/sink formats beyond parquet: schema-explicit CSV and JSON
  * round-trips (schema-on-read — never infer on a 100 TB input, which
  * would scan everything twice) and partitioned parquet layout with
  * partition pruning verified in the plan (the directory-level analog
  * of the bucket join: a filter on the partition column must skip
  * non-matching directories entirely, before any row is read).
  */
class SourcesSpec extends SparkSpec {

  private lazy val events = Q.table(spark, sfDir, "events")

  test("JSON round-trip with explicit schema preserves every value") {
    val tmp = Files.createTempDirectory("graft-json")
    // default timestampFormat truncates to millis — pin micros
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events.write.mode("overwrite")
      .option("timestampFormat", fmt).json(s"$tmp/events")
    val back = spark.read.schema(events.schema)
      .option("timestampFormat", fmt).json(s"$tmp/events")
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
    // value-level identity via order-insensitive checksum
    def sig(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(bit_xor(col("h"))).first().getLong(0)
    assert(sig(back) == sig(events))
  }

  test("CSV round-trip with explicit schema and timestamp format") {
    val tmp = Files.createTempDirectory("graft-csv")
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", fmt)
      .csv(s"$tmp/events")
    val back = spark.read.schema(events.schema)
      .option("header", "true").option("timestampFormat", fmt)
      .csv(s"$tmp/events")
    assert(back.count() == events.count())
    val a = back.orderBy("event_id").collect()
    val b = events.orderBy("event_id").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("ORC round-trip preserves schema and values; predicates push down") {
    val tmp = Files.createTempDirectory("graft-orc")
    events.write.mode("overwrite").orc(s"$tmp/events")
    val back = spark.read.orc(s"$tmp/events")
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(bit_xor(col("h"))).first().getLong(0)
    assert(sig(back) == sig(events))
    // ORC scans take pushed filters like parquet — the 100 TB contract
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      "predicate did not reach the ORC scan")
  }

  test("malformed CSV rows: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST raises") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-corrupt")
    Files.writeString(tmp.resolve("data.csv"),
      "1,10.5\n2,not_a_number\n3,30.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val path = s"$tmp/data.csv"
    val permissive = spark.read.schema(schema).csv(path)
    assert(permissive.count() == 3)
    val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("_corrupt_record")
      .contains("not_a_number"))
    // DROPMALFORMED/FAILFAST judge malformedness against the DATA
    // schema — the corrupt-record column must not be declared there
    val dataSchema = StructType(schema.dropRight(1))
    val dropped = spark.read.schema(dataSchema)
      .option("mode", "DROPMALFORMED").csv(path)
    // collect, not count: a CSV count() skips value parsing entirely
    // (column pruning), so malformed rows would never be judged
    assert(dropped.collect().length == 2)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(dataSchema).option("mode", "FAILFAST").csv(path)
        .collect()
    }
  }

  test("partitioned parquet write prunes directories on a partition filter") {
    val tmp = Files.createTempDirectory("graft-part")
    events.write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$tmp/events")
    val back = spark.read.parquet(s"$tmp/events")
      .filter(col("event_type") === "click")
    val expected = events.filter(col("event_type") === "click").count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition filter in plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      "event_type filter did not reach partition pruning")
    // pruned scan must touch only the matching directory
    val scannedDirs = Files.list(java.nio.file.Paths.get(s"$tmp/events"))
      .toArray.map(_.toString).count(_.contains("event_type="))
    assert(scannedDirs > 1, "fixture needs >1 partition for pruning to matter")
  }
}
