package graft.operators

import org.apache.spark.sql.SparkSession

/** Re-attachment of write-once index artifacts in a NEW SparkSession.
  *
  * Every persisted index (band / gram / IVF-SQ8 / IVF-PQ) is a set of
  * external parquet tables: the artifact's truth is the bucketed files
  * under its path — the catalog entry is per-session state that dies
  * with the metastore. A fresh session (the nightly probe job, a
  * different cluster) re-declares the tables here before probing.
  *
  * The column schema is INFERRED from the parquet footers rather than
  * hand-maintained in DDL — a drifted copy of a schema is exactly the
  * kind of silent skew a checksummed artifact exists to prevent — and
  * only the bucket spec (which parquet does not carry) is declared,
  * matching what the write laid down so probes stay exchange-free
  * (IndexStoreSpec proves drop → register → probe result-identity and
  * the preserved bucketed scan).
  */
private[graft] object IndexCatalog {

  /** Collision-proof artifact tag for a corpus directory: md5 of the
    * CANONICAL path, first 12 hex chars. Replaces the earlier
    * `math.abs(dir.hashCode)` tag, which (a) can collide across two
    * different corpus dirs (32-bit, non-cryptographic) — silently
    * probing the wrong persisted index — and (b) is negative for
    * `Int.MinValue`. 48 digest bits make an accidental collision
    * between corpus paths on one machine implausible.
    */
  def dirTag(dir: String): String = {
    val canonical =
      try new java.io.File(dir).getCanonicalPath
      catch { case _: java.io.IOException => new java.io.File(dir).getAbsolutePath }
    md5Tag(canonical)
  }

  /** The one 48-bit tag arithmetic both tag kinds share — md5 over
    * UTF-8 bytes, first 12 hex chars. A single definition so a future
    * width/digest change cannot diverge the two.
    */
  private def md5Tag(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(6).map(b => f"$b%02x").mkString
  }

  /** Collision-proof tag for a CONTENT fingerprint string (the
    * [[QueryDef.tableFingerprint]] output a fixture-store name embeds
    * so a corpus regenerated at the same path rebuilds the store):
    * md5, first 12 hex chars — the same 48-bit discipline as
    * [[dirTag]]. Replaces the earlier `String.hashCode` idiom at the
    * fixture-store sites, whose 32-bit non-cryptographic tag could
    * collide after a corpus regeneration and silently probe a stale
    * store (ADVICE r15).
    */
  def fpTag(fingerprint: String): String = md5Tag(fingerprint)

  /** Declare a bucketed external parquet table over existing files. */
  def registerBucketed(
      spark: SparkSession,
      table: String,
      path: String,
      bucketCol: String,
      buckets: Int): Unit = {
    val schema = spark.read.parquet(path).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schema)
         |USING PARQUET
         |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
         |INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }

  /** Declare an unbucketed external parquet table over existing files. */
  def registerPlain(
      spark: SparkSession, table: String, path: String): Unit = {
    val schema = spark.read.parquet(path).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schema)
         |USING PARQUET
         |LOCATION '$path'""".stripMargin)
  }
}
