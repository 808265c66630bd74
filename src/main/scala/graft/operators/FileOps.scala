package graft.operators

import java.net.URI
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration
import graft.core.BlueprintError
import graft.sources.FileManifest

/** Executor-parallel file copy / move / delete over a manifest.
  *
  * The reference executes one sequential driver-side loop per pipeline
  * (download_file.py:254-262, upload_file.py:242-253, move_file.py:185-196,
  * remove_file.py:156-158); here the manifest rows are partitioned across
  * executors and each partition opens its own `FileSystem` handles — the
  * single biggest designed improvement for the 100 TB goal (SURVEY §4-P1).
  * Bytes stream through `FileUtil.copy` on the executor; nothing is ever
  * materialized on the driver.
  *
  * Retry/speculation safety: per-file work is idempotent — a retried
  * partition that finds the source already gone but the destination
  * present (a completed move from the first attempt) skips the file
  * instead of failing, and the returned count is the planned row count,
  * not a task-retry-inflated accumulator.
  *
  * Expected columns: `bucket`, `path` (+ `dest` for copy/move; `destBucket`
  * optional — defaults to the source bucket).
  */
object FileOps {

  /** Upper bound on copy tasks. One file per task would drown in task
    * overhead for millions of small files; fewer tasks than cores wastes
    * executors. `min(rows, 4 × defaultParallelism)` keeps partitions
    * balanced under skewed file sizes at any manifest size.
    */
  private def parallelism(spark: SparkSession, rows: Long): Int =
    math.max(1, math.min(rows, 4L * spark.sparkContext.defaultParallelism).toInt)

  /** Copy each manifest row `bucket/path` -> `destBucket|bucket` / `dest`.
    * `deleteSource=true` turns copy into move (copy-then-delete, same
    * non-atomicity as the reference's copy_blob+delete, move_file.py:147-153,
    * but with a verify-before-delete guard, SURVEY §4-P4).
    *
    * Fails fast with [[BlueprintError.DestinationCollision]] when two
    * planned rows map to the same destination object: the reference's
    * sequential loop silently overwrote last-wins
    * (move_file.py:185-196); executor-parallel execution would make the
    * winner nondeterministic — and for a move BOTH sources get deleted
    * with one surviving copy — so collisions are rejected up front.
    */
  def copy(
      df: DataFrame,
      destBucketDefault: Option[String] = None,
      deleteSource: Boolean = false,
      overwrite: Boolean = true): Long = {
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(FileManifest.hadoopConf(spark))
    val hasDestBucket = df.columns.contains("destBucket")
    val cols = Seq("bucket", "path", "dest") ++
      (if (hasDestBucket) Seq("destBucket") else Nil)
    val rows = df.selectExpr(cols: _*).cache()
    try {
      val n = rows.count()
      if (n == 0) return 0L
      val destKey = if (hasDestBucket) Seq("destBucket", "dest") else Seq("dest")
      val collision = rows.groupBy(destKey.map(col): _*)
        .agg(count(lit(1)).as("w"), min(col("path")).as("p"))
        .filter(col("w") > 1).limit(1).collect()
      if (collision.nonEmpty)
        throw BlueprintError.DestinationCollision(
          collision.head.getAs[String]("dest"))
      rows.repartition(parallelism(spark, n)).foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          val c = conf.value
          it.foreach { r =>
            val srcBucket = r.getString(0)
            val srcPath = new Path(s"$srcBucket/${r.getString(1)}")
            val dstBucket =
              if (hasDestBucket && !r.isNullAt(3)) r.getString(3)
              else destBucketDefault.getOrElse(srcBucket)
            val dstPath = new Path(s"$dstBucket/${r.getString(2)}")
            val srcFs = FileSystem.get(new URI(srcBucket), c)
            val dstFs = FileSystem.get(new URI(dstBucket), c)
            // no .crc sidecars: object stores don't have them, and the
            // reference's byte copy writes exactly one object per file
            dstFs.setWriteChecksum(false)
            val srcExists = srcFs.exists(srcPath)
            if (!srcExists) {
              // idempotent retry: a completed move from a previous attempt
              // leaves dest present and source gone — skip, don't fail
              if (!(deleteSource && dstFs.exists(dstPath)))
                throw BlueprintError.FileNotFound(srcPath.toString)
            } else if (!overwrite && dstFs.exists(dstPath)) {
              // overwrite=false: an existing destination wins; skip
            } else {
              dstFs.mkdirs(dstPath.getParent)
              if (dstFs.exists(dstPath)) dstFs.delete(dstPath, false)
              FileUtil.copy(srcFs, srcPath, dstFs, dstPath, false, c)
              if (deleteSource) {
                // verify-then-delete: never drop the source unless the copy landed
                if (dstFs.exists(dstPath) &&
                    dstFs.getFileStatus(dstPath).getLen ==
                      srcFs.getFileStatus(srcPath).getLen)
                  srcFs.delete(srcPath, false)
              }
            }
          }
      }
      n
    } finally rows.unpersist()
  }

  /** Delete each manifest row (remove_file.py:117-123, executor-parallel).
    * Idempotent under retry: deleting an already-deleted file is a no-op.
    * Returns the planned row count.
    */
  def delete(df: DataFrame): Long = {
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(FileManifest.hadoopConf(spark))
    val rows = df.selectExpr("bucket", "path")
    val n = rows.count()
    if (n == 0) return 0L
    rows.repartition(parallelism(spark, n)).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val c = conf.value
        it.foreach { r =>
          val fs = FileSystem.get(new URI(r.getString(0)), c)
          fs.delete(new Path(s"${r.getString(0)}/${r.getString(1)}"), false)
        }
    }
    n
  }

  /** Driver-only single-file copy for the exact-match access path — no Spark
    * job, mirroring the reference's point-lookup fast path (SURVEY §3.4).
    */
  def copyOne(
      spark: SparkSession,
      srcBucket: String,
      srcPath: String,
      dstBucket: String,
      dstPath: String,
      deleteSource: Boolean = false): Unit = {
    val c = FileManifest.hadoopConf(spark)
    val src = new Path(s"$srcBucket/$srcPath")
    val dst = new Path(s"$dstBucket/$dstPath")
    val srcFs = FileSystem.get(new URI(srcBucket), c)
    val dstFs = FileSystem.get(new URI(dstBucket), c)
    dstFs.setWriteChecksum(false)
    if (!srcFs.exists(src)) throw BlueprintError.FileNotFound(srcPath)
    dstFs.mkdirs(dst.getParent)
    if (dstFs.exists(dst)) dstFs.delete(dst, false)
    FileUtil.copy(srcFs, src, dstFs, dst, false, c)
    if (deleteSource &&
        dstFs.getFileStatus(dst).getLen == srcFs.getFileStatus(src).getLen)
      srcFs.delete(src, false)
  }

  /** Driver-only single-file delete. */
  def deleteOne(spark: SparkSession, bucket: String, path: String): Unit = {
    val c = FileManifest.hadoopConf(spark)
    val fs = FileSystem.get(new URI(bucket), c)
    val p = new Path(s"$bucket/$path")
    if (!fs.exists(p)) throw BlueprintError.FileNotFound(path)
    fs.delete(p, false)
  }
}
