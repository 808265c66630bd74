package graft.sources

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{BlueprintError, EnumeratePolicy, PathAlg}

/** One object in a bucket-like store. `path` is the bucket-relative object
  * name (the reference's `blob.name`), `name` its basename.
  */
final case class FileEntry(
    bucket: String,
    path: String,
    name: String,
    size: Long,
    modificationTime: java.sql.Timestamp)

/** File-manifest layer: listings as DataFrames.
  *
  * Replaces the reference's driver-side blob listing
  * (download_file.py:147-152 `find_google_cloud_storage_file_names`) with a
  * lazy manifest `Dataset[FileEntry]` over Hadoop `FileSystem`, so that
  * filters/projections/sinks compose as Spark plans and the copy/delete
  * actions run executor-parallel (SURVEY §4-P1). Prefix pushdown (the
  * reference's server-side `list_blobs(prefix=…)`, download_file.py:248-249)
  * maps to scoping the listing root to `bucket/prefix`.
  *
  * Scale note (100 TB / 10^8 objects): listing runs on the driver through a
  * `RemoteIterator` (streamed, not materialized) and becomes a distributed
  * Dataset immediately; for object stores the listing itself is the GCS/S3
  * List API, which is already server-side paginated. Manifests of ~10^7
  * entries are a few GB of rows — comfortably a Spark dataset, never a
  * driver array of file contents.
  */
object FileManifest {

  /** List all files under `bucketUri/prefix` into a manifest Dataset.
    * `bucketUri` e.g. `file:///tmp/bucket-a` or `gs://bucket`.
    */
  def scan(
      spark: SparkSession,
      bucketUri: String,
      prefix: String = "",
      recursive: Boolean = true): Dataset[FileEntry] = {
    import spark.implicits._
    val root = bucketUri.stripSuffix("/")
    val cleanPrefix = PathAlg.cleanFolderName(prefix)
    val listRoot = if (cleanPrefix.isEmpty) root else s"$root/$cleanPrefix"
    val fs = fileSystemFor(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath))
      throw BlueprintError.InvalidBucket(bucketUri)
    val listPath = new Path(listRoot)
    val entries =
      if (!fs.exists(listPath)) Seq.empty[FileEntry]
      else {
        val it = fs.listFiles(listPath, recursive)
        val buf = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
        val rootStr = fs.makeQualified(rootPath).toString.stripSuffix("/")
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile) {
            val full = st.getPath.toString
            val rel = full.stripPrefix(rootStr).stripPrefix("/")
            buf += FileEntry(
              bucket = root,
              path = rel,
              name = st.getPath.getName,
              size = st.getLen,
              modificationTime =
                new java.sql.Timestamp(st.getModificationTime))
          }
        }
        buf.toSeq
      }
    spark.createDataset(entries)
  }

  /** Exact-match point lookup (no listing, no Spark job) — the reference's
    * keyed `get_blob` access path (download_file.py:211-225, SURVEY §4-R2).
    */
  def lookup(
      spark: SparkSession,
      bucketUri: String,
      folderName: String,
      fileName: String): FileEntry = {
    val root = bucketUri.stripSuffix("/")
    val rel = PathAlg.combine(folderName, fileName)
    val fs = fileSystemFor(spark, root)
    if (!fs.exists(new Path(root)))
      throw BlueprintError.InvalidBucket(bucketUri)
    val p = new Path(s"$root/$rel")
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile)
      throw BlueprintError.FileNotFound(rel)
    val st = fs.getFileStatus(p)
    FileEntry(root, rel, p.getName, st.getLen,
      new java.sql.Timestamp(st.getModificationTime))
  }

  /** Regex predicate over the bucket-relative object name — the reference's
    * `re.search` filter (download_file.py:155-164): unanchored substring
    * semantics, which `rlike` (Java regex) shares for the common dialect
    * subset (SURVEY §2A-O3). Pattern validity is checked eagerly so a bad
    * pattern maps to a typed error (move_file.py:174-183 behavior).
    */
  def regexFilter(manifest: Dataset[FileEntry], pattern: String): Dataset[FileEntry] = {
    try java.util.regex.Pattern.compile(pattern)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw BlueprintError.BadRegex(pattern, e.getMessage)
    }
    manifest.filter(col("path").rlike(pattern))
  }

  /** Project destination object names onto a manifest.
    *
    * Mirrors `determine_destination_file_name` + enumeration
    * (download_file.py:74-106): explicit name, enumerated `name_{i}.ext`, or
    * basename of the source. The running counter is `row_number()` ordered
    * by `path` — explicit and deterministic where the reference implicitly
    * relied on GCS's lexicographic listing order (SURVEY §4-P5).
    *
    * Output columns: manifest columns + `dest` (bucket-relative destination).
    */
  def withDestination(
      manifest: Dataset[FileEntry],
      destinationFolderName: String,
      destinationFileName: Option[String],
      policy: EnumeratePolicy): DataFrame = {
    val folder = PathAlg.cleanFolderName(destinationFolderName)
    val n = row_number().over(Window.orderBy("path"))
    val total = count(lit(1)).over(Window.partitionBy())
    val baseName = element_at(split(col("path"), "/"), -1)
    val destName = destinationFileName match {
      case None => baseName
      case Some(dest) =>
        val dotIdx = dest.indexOf('.')
        def enumerated(i: org.apache.spark.sql.Column) =
          if (dotIdx < 0) concat(lit(dest + "_"), i)
          else concat(lit(dest.substring(0, dotIdx) + "_"), i,
            lit(dest.substring(dotIdx)))
        policy match {
          case EnumeratePolicy.Always => enumerated(n)
          case EnumeratePolicy.IfMultiple =>
            when(total > 1, enumerated(n)).otherwise(lit(dest))
        }
    }
    val dest =
      if (folder.isEmpty) destName
      else concat(lit(folder + "/"), destName)
    manifest.withColumn("dest", dest)
  }

  private[graft] def fileSystemFor(spark: SparkSession, uri: String): FileSystem =
    FileSystem.get(new URI(uri), hadoopConf(spark))

  private[graft] def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration
}
