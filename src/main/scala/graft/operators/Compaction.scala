package graft.operators

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.sources.FileManifest

/** Small-file compaction — the operational fix for the many-small-files
  * problem the reference's one-file-per-CLI-run model produces at scale
  * (a 100 TB landing zone of KB-size objects makes every downstream
  * listing and scan pay per-object overhead). Two halves:
  *
  *  - [[plan]]: assign every manifest row to a `bundle` by the same
  *    streaming bin-pack rule as the q139 shard planner — bundle =
  *    floor(bytes_before / targetBytes) over the EXCLUSIVE prefix sum
  *    of file sizes in path order. Deterministic, partitioning-
  *    invariant, and computed with the two-level prefix-sum
  *    decomposition (partition-local running sums + broadcast
  *    per-partition offsets), so no stage collapses the manifest onto
  *    one task.
  *  - [[compact]]: per bundle, stream-concatenate the member files in
  *    path order into `bundle-NNNNN.bin` under the destination folder,
  *    alongside a `bundle-NNNNN.idx` sidecar of tab-separated
  *    `(path, offset, length)` lines so readers can seek any original
  *    object without unpacking. Bytes stream executor-side through
  *    8 MiB buffers — nothing is materialized on the driver, matching
  *    [[FileOps]]'s execution contract.
  *
  * Retry/speculation safety: a bundle is written through
  * `fs.create(..., overwrite = true)` and the sidecar last, so a
  * retried task simply rewrites its bundles from scratch — the member
  * list and order are deterministic, making the rewrite byte-identical.
  */
object Compaction {

  final case class CompactStats(bundles: Long, files: Long, bytes: Long)

  /** Bundle assignment over a file manifest (`bucket`, `path`, `size`
    * columns required; others ride along). Files larger than
    * `targetBytes` occupy their own bundle by the streaming rule; every
    * bundle except possibly the last holds at least `targetBytes` minus
    * one file of slack, and no file is ever split.
    */
  def plan(manifest: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val parts = math.max(1,
      manifest.sparkSession.sparkContext.defaultParallelism)
    val m = manifest
      .repartitionByRange(parts, col("path"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy("path")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the per-partition totals frame is ≤ `parts` rows — the
    // unpartitioned window below is a bounded scan, not a data collapse
    val offs = m.groupBy("pid").agg(sum("size").as("psum"))
      .withColumn("off",
        coalesce(sum("psum").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    m.withColumn("lc", sum("size").over(wLocal))
      .join(broadcast(offs), "pid")
      .withColumn("bundle", expr(s"(lc + off - size) div $targetBytes"))
      .drop("pid", "lc", "off")
  }

  /** Execute a [[plan]]: write one `bundle-NNNNN.bin` + `.idx` pair per
    * bundle under `destBucket/destFolder`. Rows arrive grouped by
    * repartitioning on `bundle` and sorting within partitions on
    * `(bundle, path)`, so each bundle's files are consecutive in one
    * task and concatenation order is the plan's path order.
    */
  def compact(
      planned: DataFrame,
      destBucket: String,
      destFolder: String): CompactStats = {
    val spark = planned.sparkSession
    val conf = new SerializableConfiguration(FileManifest.hadoopConf(spark))
    val rows = planned.select("bucket", "path", "size", "bundle").cache()
    try {
      val agg = rows.agg(count(lit(1)), countDistinct(col("bundle")),
        coalesce(sum("size"), lit(0L))).head()
      val (nFiles, nBundles, totBytes) =
        (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      if (nFiles == 0) return CompactStats(0L, 0L, 0L)
      val folder = graft.core.PathAlg.cleanFolderName(destFolder)
      val prefix = if (folder.isEmpty) "" else s"$folder/"
      val tasks = math.max(1, math.min(nBundles,
        4L * spark.sparkContext.defaultParallelism).toInt)
      rows.repartition(tasks, col("bundle"))
        .sortWithinPartitions("bundle", "path")
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val c = conf.value
          val fsCache =
            scala.collection.mutable.HashMap.empty[String, FileSystem]
          def fsFor(bucket: String): FileSystem =
            fsCache.getOrElseUpdate(bucket, {
              val fs = FileSystem.get(new URI(bucket), c)
              fs.setWriteChecksum(false)
              fs
            })
          val buf = new Array[Byte](8 << 20)
          var bundle = -1L
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var idx: StringBuilder = null
          var offset = 0L
          def closeBundle(): Unit = if (out != null) {
            out.close()
            // sidecar written AFTER the data: its presence marks a
            // complete bundle, and a retry overwrites both
            val idxOut = fsFor(destBucket).create(
              new Path(s"$destBucket/${prefix}bundle-%05d.idx".format(bundle)),
              true)
            idxOut.write(idx.toString.getBytes(StandardCharsets.UTF_8))
            idxOut.close()
            out = null
          }
          it.foreach { r =>
            val b = r.getLong(3)
            if (b != bundle) {
              closeBundle()
              bundle = b
              out = fsFor(destBucket).create(
                new Path(s"$destBucket/${prefix}bundle-%05d.bin".format(b)),
                true)
              idx = new StringBuilder
              offset = 0L
            }
            val srcFs = fsFor(r.getString(0))
            val in = srcFs.open(new Path(s"${r.getString(0)}/${r.getString(1)}"))
            var n = in.read(buf)
            var len = 0L
            while (n >= 0) {
              if (n > 0) { out.write(buf, 0, n); len += n }
              n = in.read(buf)
            }
            in.close()
            idx.append(r.getString(1)).append('\t')
              .append(offset).append('\t').append(len).append('\n')
            offset += len
          }
          closeBundle()
        }
      CompactStats(nBundles, nFiles, totBytes)
    } finally rows.unpersist()
  }
}
