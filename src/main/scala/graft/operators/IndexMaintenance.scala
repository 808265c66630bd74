package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path

/** Maintenance for the persisted index families (bands / grams /
  * IVF codes / spans): every streaming ingest loop appends to its
  * bucketed external table one `insertInto` per micro-batch, and each
  * append lays down up to one file PER BUCKET — after K batches a
  * 32-bucket table holds up to 32·K small parquet files, and the probe
  * join's exchange-free scan pays K file opens per bucket. Compaction
  * rewrites the table to ONE file per bucket under the SAME bucket
  * spec, so probe plans (and their exchange-free property) are
  * untouched while scan fan-out returns to the build-time constant.
  * This is the nightly maintenance job every real index store runs;
  * at 100 TB it is a single shuffle-by-bucket-key rewrite, linear in
  * the table, with no driver-side data movement.
  *
  * Correctness gate: q172 probes a band index that was built, twice
  * appended, and compacted — its DuckDB oracle recomputes the expected
  * near-dup pairs from the raw corpus, so a compaction that loses or
  * corrupts rows breaks the hash. CompactionSpec asserts the
  * mechanical invariants (row multiset preserved, file count reduced
  * to ≤ buckets, plan still exchange-free on the stored side).
  */
object IndexMaintenance {

  /** Files-before / files-after of one table's compaction. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int)

  private def dataFiles(
      spark: SparkSession, dir: Path): Seq[Path] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
  }

  /** Rewrite a bucketed external parquet table to one file per bucket,
    * preserving its bucket/sort spec and its canonical location (the
    * artifact path other sessions re-register via
    * [[IndexCatalog.registerBucketed]] must not drift).
    *
    * One file per bucket comes from repartitioning on the writer's own
    * bucket-id function — `pmod(hash(bucketCols), n)`, the exact
    * expression Spark-native bucketing assigns file ids with — so each
    * bucket's rows land wholly in one task and every task emits one
    * file per bucket id it holds (32 total). Repartitioning on the raw
    * column is NOT enough: measured on this Spark, a plain
    * `repartition(n, col)` over a table scan landed ~3 writer-buckets
    * per task (91 files for 32 buckets); the explicit bucket-id key is
    * correct by construction regardless of how the shuffle places
    * partitions.
    *
    * Swap discipline (single-writer maintenance window, like every
    * real compactor): the rewrite lands complete at `<path>.compact
    * .tmp`; the live dir moves aside to `<path>.pre-compact`; the tmp
    * moves in; the table re-registers; the old dir deletes last. A
    * crash between the renames leaves EITHER the live dir or two
    * complete copies (`.pre-compact` to restore, `.compact.tmp` to
    * promote) — never a partial table at the canonical path.
    */
  def compactBucketed(
      spark: SparkSession, table: String): CompactStats = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(
        s"$table has no bucket spec — compactBucketed is for the " +
          "bucketed index tables"))
    val bucketCols = spec.bucketColumnNames
    // ADVICE r12: the rewrite and re-registration below carry exactly
    // one bucket column (matching registerBucketed's single-column
    // contract). A multi-column spec would be silently re-registered
    // on bucketCols.head alone, changing bucket placement and making
    // downstream exchange-free probe joins read the wrong buckets —
    // refuse loudly instead.
    require(bucketCols.size == 1,
      s"compactBucketed supports single-column bucket specs only " +
        s"(registerBucketed contract); $table is bucketed on " +
        s"${bucketCols.mkString(",")}")
    val bucketCol = bucketCols.head
    val buckets = spec.numBuckets
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, loc).size

    val tmpTable = s"${table}__compact"
    val tmpPath = new Path(loc.getParent, loc.getName + ".compact.tmp")
    val oldPath = new Path(loc.getParent, loc.getName + ".pre-compact")
    fs.delete(tmpPath, true)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    spark.table(table)
      .repartition(buckets,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(bucketCols.map(col): _*),
          org.apache.spark.sql.functions.lit(buckets)))
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", tmpPath.toString).saveAsTable(tmpTable)
    // external tables: DROP removes only the catalog entry, never files
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    fs.delete(oldPath, true)
    if (!fs.rename(loc, oldPath))
      throw new java.io.IOException(s"rename $loc -> $oldPath failed")
    if (!fs.rename(tmpPath, loc))
      throw new java.io.IOException(s"rename $tmpPath -> $loc failed")
    IndexCatalog.registerBucketed(
      spark, table, loc.toString, bucketCol, buckets)
    fs.delete(oldPath, true)
    CompactStats(before, dataFiles(spark, loc).size)
  }
}
