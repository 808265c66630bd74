package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Batch-id-tagged side artifact making the index-growing ingest loops
  * replay-idempotent (ADVICE r10).
  *
  * The hazard: a `foreachBatch` body that (a) decides which rows are
  * novel by probing a persisted index and (b) appends those rows' keys
  * to the same index violates the retry contract on its own — if the
  * batch fails AFTER the append but BEFORE the checkpoint commit, the
  * replay re-probes an index that already contains the batch's keys,
  * every previously-novel row scores as a duplicate, and the batch's
  * admitted set silently shrinks to empty (admitted-data loss).
  *
  * The fix: before mutating the index, the batch writes its admitted
  * ids under `<table location>/_ingest_ledger/batch=<id>` (atomic via
  * the parquet `_SUCCESS` marker; the underscore prefix hides the dir
  * from the table's own file listing). A replayed batch finds the
  * committed ledger and reproduces the SAME admitted set from it
  * instead of re-probing. `_APPEND_DONE` additionally marks that the
  * index mutation completed, so replays of loops whose append is not
  * naturally idempotent know whether to re-run the (guarded) append.
  *
  * Ledgers are tiny (one id column, one batch's admissions) and prune
  * trivially by batch id; a deployment can garbage-collect ledgers
  * older than the checkpoint horizon.
  */
private[graft] object IngestLedger {

  /** Ledger dir for one (index table, micro-batch) pair. */
  def dirFor(spark: SparkSession, table: String, batchId: Long): Path = {
    val loc = new Path(
      spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
        .location)
    new Path(loc, s"_ingest_ledger/batch=$batchId")
  }

  /** Tagged variant for COMPOSED loops: a pipeline that chains several
    * gates commits ONE admitted set per batch under its own namespace,
    * so it can share an index with a standalone loop without the two
    * ever reading each other's ledgers.
    */
  def dirFor(spark: SparkSession, table: String, batchId: Long,
      tag: String): Path = {
    val loc = new Path(
      spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
        .location)
    new Path(loc, s"_ingest_ledger/$tag/batch=$batchId")
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Has a prior attempt of this batch committed its admitted set? */
  def committed(spark: SparkSession, dir: Path): Boolean =
    fsOf(spark, dir).exists(new Path(dir, "_SUCCESS"))

  /** Did a prior attempt finish the index append for this batch? */
  def appendDone(spark: SparkSession, dir: Path): Boolean =
    fsOf(spark, dir).exists(new Path(dir, "_APPEND_DONE"))

  def markAppendDone(spark: SparkSession, dir: Path): Unit =
    fsOf(spark, dir).create(new Path(dir, "_APPEND_DONE"), true).close()

  /** Write the admitted-id frame (one key column). Overwrite mode: a
    * half-written ledger from a crashed attempt (no `_SUCCESS`) is
    * simply replaced by the retry.
    */
  def write(ids: DataFrame, dir: Path): Unit =
    ids.coalesce(1).write.mode("overwrite").parquet(dir.toString)

  def read(spark: SparkSession, dir: Path): DataFrame =
    spark.read.parquet(dir.toString)
}
