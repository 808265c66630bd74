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
  * Retry/speculation safety: each bundle (and its sidecar) is written
  * to a task-attempt-unique `*.tmp` name and renamed into place on
  * completion, sidecar last — a speculative attempt or a zombie
  * original running concurrently with its retry each write their OWN
  * temp files, and the rename is per-file atomic on the filesystems
  * that matter, so destination bytes can never interleave across
  * attempts (ADVICE r10). The member list and order are deterministic
  * — total order `(bucket, path)`, unique even when two buckets hold
  * identical relative paths — so whichever attempt commits last leaves
  * byte-identical output.
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
    // total order on (bucket, path) when a bucket column exists: path
    // alone ties between two buckets holding the same relative path,
    // and a nondeterministic tie order would break the byte-identical
    // rewrite guarantee (ADVICE r10). Streamed batches carry absolute
    // unique paths and no bucket column — path order suffices there.
    val ordCols =
      if (manifest.columns.contains("bucket")) Seq(col("bucket"), col("path"))
      else Seq(col("path"))
    val m = manifest
      .repartitionByRange(parts, ordCols: _*)
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy(ordCols: _*)
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
        .sortWithinPartitions("bundle", "bucket", "path")
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
          // attempt-unique temp suffix: a speculative attempt (or a
          // zombie original racing its retry) writes its own temp file;
          // only the rename touches the destination path
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(tc => s"${tc.stageAttemptNumber}-${tc.taskAttemptId}")
            .getOrElse("d")
          def commitFile(tmp: Path, dest: Path): Unit = {
            val fs = fsFor(destBucket)
            if (fs.exists(dest)) fs.delete(dest, false)
            if (!fs.rename(tmp, dest))
              throw new java.io.IOException(s"rename $tmp -> $dest failed")
          }
          val buf = new Array[Byte](8 << 20)
          var bundle = -1L
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var outTmp: Path = null
          var idx: StringBuilder = null
          var offset = 0L
          def binDest(b: Long): Path =
            new Path(s"$destBucket/${prefix}bundle-%05d.bin".format(b))
          def closeBundle(): Unit = if (out != null) {
            out.close()
            val idxDest =
              new Path(s"$destBucket/${prefix}bundle-%05d.idx".format(bundle))
            // sidecar-FIRST removal (ADVICE r11): the idx marks a
            // complete bundle, so on a re-commit it must disappear
            // before the bin it describes is swapped — a reader
            // honoring the sidecar protocol then never observes an idx
            // pointing at a missing/mid-swap bin. Commit order: drop
            // idx, swap bin, re-commit idx last.
            val dfs = fsFor(destBucket)
            if (dfs.exists(idxDest)) dfs.delete(idxDest, false)
            commitFile(outTmp, binDest(bundle))
            val idxTmp = idxDest.suffix(s".$attempt.tmp")
            val idxOut = dfs.create(idxTmp, true)
            idxOut.write(idx.toString.getBytes(StandardCharsets.UTF_8))
            idxOut.close()
            commitFile(idxTmp, idxDest)
            out = null
          }
          it.foreach { r =>
            val b = r.getLong(3)
            if (b != bundle) {
              closeBundle()
              bundle = b
              outTmp = binDest(b).suffix(s".$attempt.tmp")
              out = fsFor(destBucket).create(outTmp, true)
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
      // failed attempts leave orphan *.tmp files the rename never
      // consumed (ADVICE r11); sweep them once the write completed —
      // a zombie task whose temp vanishes fails at its rename, which
      // is harmless after the real attempt committed
      sweepTmp(spark, destBucket, prefix)
      CompactStats(nBundles, nFiles, totBytes)
    } finally rows.unpersist()
  }

  /** Delete stale attempt temp files (`*bundle-*.tmp`) under the
    * destination folder — the leftovers of failed or superseded task
    * attempts. Driver-side, one glob; scoped to the bundle naming
    * pattern so unrelated files are never touched.
    */
  private def sweepTmp(
      spark: SparkSession, destBucket: String, prefix: String): Unit = {
    try {
      val fs = FileSystem.get(new URI(destBucket),
        FileManifest.hadoopConf(spark))
      val hits = fs.globStatus(new Path(s"$destBucket/$prefix*bundle-*.tmp"))
      if (hits != null) hits.foreach { st =>
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => () }
      }
    } catch { case _: java.io.IOException => () }
  }

  /** The sidecar catalog of a compacted folder as a DataFrame:
    * `(bundle_path, path, offset, length)` — one row per original
    * object. The `.idx` files are tiny (one line per member), so
    * `spark.read.text` over them is a metadata-scale scan no matter
    * how large the packed data is; `input_file_name()` recovers which
    * bundle each row belongs to.
    */
  def catalog(
      spark: SparkSession, destBucket: String,
      destFolder: String): DataFrame = {
    val folder = graft.core.PathAlg.cleanFolderName(destFolder)
    val prefix = if (folder.isEmpty) "" else s"$folder/"
    spark.read.textFile(s"$destBucket/$prefix*.idx")
      .select(
        regexp_replace(input_file_name(), "\\.idx$", ".bin")
          .as("bundle_path"),
        split(col("value"), "\t").as("f"))
      .select(col("bundle_path"), col("f").getItem(0).as("path"),
        col("f").getItem(1).cast("long").as("offset"),
        col("f").getItem(2).cast("long").as("length"))
  }

  /** Distributed un-pack read: every original object's bytes, straight
    * out of the bundles, as `(path, length, content)`. Rows co-locate
    * by bundle (one repartition on the bundle path) and sort by offset
    * within it, so each task opens its bundle ONCE and reads forward
    * sequentially — the IO pattern that matters when the bundles are
    * remote-store objects with per-open latency. No bundle is ever
    * buffered whole; each member is read exactly at its sidecar slice.
    */
  def readBundled(
      spark: SparkSession, destBucket: String,
      destFolder: String): DataFrame = {
    val conf = new SerializableConfiguration(FileManifest.hadoopConf(spark))
    val cat = catalog(spark, destBucket, destFolder)
    val tasks = math.max(1, spark.sparkContext.defaultParallelism)
    import spark.implicits._
    cat.select("bundle_path", "path", "offset", "length")
      .repartition(tasks, col("bundle_path"))
      .sortWithinPartitions("bundle_path", "offset")
      .as[(String, String, Long, Long)]
      .mapPartitions { it =>
        val c = conf.value
        var opened: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        var fs: FileSystem = null
        val out = it.map { case (bp, path, off, len) =>
          if (bp != opened) {
            if (in != null) in.close()
            if (fs == null) fs = FileSystem.get(new URI(bp), c)
            in = fs.open(new Path(bp))
            opened = bp
          }
          val body = new Array[Byte](len.toInt)
          in.readFully(off, body, 0, len.toInt)
          (path, len, body)
        }
        // the iterator is fully drained by the consuming operator, so
        // the final stream closes with the last element
        new Iterator[(String, Long, Array[Byte])] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          def next(): (String, Long, Array[Byte]) = out.next()
        }
      }
      .toDF("path", "length", "content")
  }

  /** The landing-zone loop as a Structured Streaming job: watch
    * `landingUri` for newly-arrived files (the `binaryFile` source
    * tracks what's been processed in the checkpoint), and per
    * micro-batch bin-pack the NEW files into bundles under
    * `destBucket/destFolder` — bundle files carry the batch id
    * (`b<batchId>-bundle-NNNNN`), so a replayed batch (foreachBatch's
    * retry contract: same files, same id) overwrites its own bundles
    * byte-identically instead of duplicating them. Sidecar paths are
    * relativized against the landing root, so [[catalog]] /
    * [[readBundled]] / [[readObject]] read streamed and batch-compacted
    * folders the same way. Per-batch work is bounded by
    * `maxFilesPerTrigger`; the accumulated bundle store is never
    * re-read or re-written.
    */
  def compactStream(
      spark: SparkSession,
      landingUri: String,
      destBucket: String,
      destFolder: String,
      targetBytes: Long,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // the binaryFile source's fixed schema, stated explicitly —
    // streaming sources don't infer
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // the compactor's subject IS small files; don't silently skip big ones
      .load(s"$landingUri/*")
      .select(col("path"), col("length").as("size"), col("content"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          compactBatch(batch.toDF(), id, landingUri, destBucket,
            destFolder, targetBytes)
      }
      .start()
  }

  /** One micro-batch of [[compactStream]]: the [[plan]] bin-pack rule
    * over the batch manifest (bytes already in the `content` column —
    * the landing files are never re-opened), then one
    * repartition-on-bundle write pass sharing [[compact]]'s
    * sidecar-last layout.
    */
  private def compactBatch(
      batch: DataFrame, batchId: Long, landingUri: String,
      destBucket: String, destFolder: String, targetBytes: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val conf = new SerializableConfiguration(FileManifest.hadoopConf(spark))
    val folder = graft.core.PathAlg.cleanFolderName(destFolder)
    val prefix = if (folder.isEmpty) "" else s"$folder/"
    val rootUri = new Path(new URI(landingUri)).toUri
    val planned = plan(batch, targetBytes)
      .select("bundle", "path", "content")
    val tasks = math.max(1, spark.sparkContext.defaultParallelism)
    planned.repartition(tasks, col("bundle"))
      .sortWithinPartitions("bundle", "path")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val c = conf.value
        var fs: FileSystem = null
        def destFs(): FileSystem = {
          if (fs == null) fs = FileSystem.get(new URI(destBucket), c)
          fs
        }
        def rel(p: String): String = {
          val u = new Path(p).toUri
          val r = rootUri.relativize(u)
          if (r.isAbsolute) u.getPath else r.getPath
        }
        // same attempt-unique temp + rename commit as [[compact]]: a
        // replayed batch already overwrites its own bundles, but only
        // the rename protocol makes a CONCURRENT zombie/speculative
        // attempt safe (ADVICE r10)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.stageAttemptNumber}-${tc.taskAttemptId}")
          .getOrElse("d")
        def commitFile(tmp: Path, dest: Path): Unit = {
          if (destFs().exists(dest)) destFs().delete(dest, false)
          if (!destFs().rename(tmp, dest))
            throw new java.io.IOException(s"rename $tmp -> $dest failed")
        }
        var bundle = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var outTmp: Path = null
        var idx: StringBuilder = null
        var offset = 0L
        def name(ext: String): Path = new Path(
          s"$destBucket/${prefix}b$batchId-bundle-%05d.$ext".format(bundle))
        def closeBundle(): Unit = if (out != null) {
          out.close()
          // sidecar-first removal, as in [[compact]] (ADVICE r11)
          if (destFs().exists(name("idx"))) destFs().delete(name("idx"), false)
          commitFile(outTmp, name("bin"))
          val idxTmp = name("idx").suffix(s".$attempt.tmp")
          val idxOut = destFs().create(idxTmp, true)
          idxOut.write(idx.toString.getBytes(StandardCharsets.UTF_8))
          idxOut.close()
          commitFile(idxTmp, name("idx"))
          out = null
        }
        it.foreach { r =>
          val b = r.getLong(0)
          if (b != bundle) {
            closeBundle()
            bundle = b
            outTmp = name("bin").suffix(s".$attempt.tmp")
            out = destFs().create(outTmp, true)
            idx = new StringBuilder
            offset = 0L
          }
          val body = r.getAs[Array[Byte]](2)
          out.write(body)
          idx.append(rel(r.getString(1))).append('\t')
            .append(offset).append('\t').append(body.length).append('\n')
          offset += body.length
        }
        closeBundle()
      }
    sweepTmp(spark, destBucket, prefix)
  }

  /** Point lookup of one original object inside a compacted folder —
    * the O(1) promise of the sidecar: one catalog probe for the slice
    * coordinates, then ONE positioned read of exactly `length` bytes
    * from the bundle. Throws [[graft.core.BlueprintError.FileNotFound]]
    * when the path was never packed, matching the manifest layer's
    * point-lookup contract (SURVEY §2A-O2).
    */
  def readObject(
      spark: SparkSession, destBucket: String, destFolder: String,
      path: String): Array[Byte] = {
    val hit = catalog(spark, destBucket, destFolder)
      .filter(col("path") === path)
      .select("bundle_path", "offset", "length")
      .limit(1).collect()
    if (hit.isEmpty)
      throw graft.core.BlueprintError.FileNotFound(
        s"$destBucket/$destFolder/$path (not in any bundle sidecar)")
    val r = hit(0)
    val fs = FileSystem.get(new URI(r.getString(0)),
      FileManifest.hadoopConf(spark))
    val in = fs.open(new Path(r.getString(0)))
    try {
      val body = new Array[Byte](r.getLong(2).toInt)
      in.readFully(r.getLong(1), body, 0, body.length)
      body
    } finally in.close()
  }
}
