package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions
import Q._

/** Deduplication operators over the `documents` table (LLM-data-pipeline
  * extension surface, SURVEY §2B Q22 + the near-dup family):
  *
  *  - exact dedup: one survivor per distinct `text` (deterministic: the
  *    row with the minimum `doc_id`), a single hash-shuffle on the text —
  *    never an all-pairs comparison;
  *  - MinHash + LSH near-dup: 3-gram shingles → 128-slot MinHash
  *    signature ([[graft.functions.MinHashSignature]]) → 32 bands × 4
  *    rows → candidate pairs join **on band hash** (bucket join, no
  *    cartesian) → exact-Jaccard verification of candidates only;
  *  - SimHash near-dup: 64-bit fingerprint ([[graft.functions.SimHashMd5]])
  *    → 4 × 16-bit bands; by pigeonhole any pair within Hamming distance 3
  *    shares at least one band, so the band join is *exhaustive* for the
  *    declared distance, not approximate.
  *
  * Scale notes (100 TB): every join here shuffles on a hash key (band
  * hash / fingerprint band) whose bucket sizes are bounded by collision
  * rates, so the plans survive a 1000-executor scale-up; the only O(n²)
  * work is the exact-Jaccard check *within* candidate buckets, which is
  * the standard LSH contract. The q25 oracle is the brute-force exact
  * Jaccard join — the LSH margin on this corpus (min true-pair Jaccard
  * 0.90 vs next pair 0.07, recall 1-(1-0.9⁴)³² ≈ 1-2e-15) makes the
  * approximate pipeline's output equal the exact answer.
  */
object Dedup {

  private[operators] val Bands = 32
  private val RowsPerBand = HashFunctions.MinHashK / Bands // 4

  /** The near-dup Jaccard threshold — one constant shared by the
    * production pipeline (neardupPairs) and the q90 recall contract so
    * tuning it can't silently decouple the contract from the pipeline.
    */
  private val MinJaccard = 0.8

  /** Documents shingled into distinct 3-gram sets (the near-dup unit).
    * Repartition before the CPU-bound sketch stage: a small parquet
    * input arrives as ONE split, which would serialize shingling +
    * minhash on a single core (at 100 TB the file count provides the
    * fan-out; the explicit repartition makes it unconditional).
    */
  private def shingled(s: org.apache.spark.sql.SparkSession, dir: String) =
    shingledOf(s, table(s, dir, "documents"))

  /** Df-based shingling (same contract) — shared with the composed
    * corpus pipeline (q100), which shingles intermediate survivor sets
    * rather than the raw table.
    */
  private[graft] def shingledOf(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    HashFunctions.register(s)
    // spread BEFORE the shingle projection only when the input is
    // under-partitioned (the Stress inflation path hits exactly this);
    // see [[Q.spread]] — the unconditional doc_id repartition this
    // replaces cost q29/q34/q99 1.5-2.5x of pure extra shuffle
    // (VERDICT r10 wrong #2)
    Q.spread(docs)
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Serialized bloom filter over a single-column gram frame (null when
    * the frame is empty — callers treat that as "nothing can match").
    * One aggregation job; the driver holds only the fixed-size filter.
    * Shared by q101 and the composed pipeline's decontamination
    * pre-filter so the two bloom paths can never drift.
    */
  private[operators] def gramBloom(
      g: org.apache.spark.sql.DataFrame): Array[Byte] =
    g.agg(expr(s"graft_bloom_build(xxhash64(${g.columns.head}), 1048576L)"))
      .head().getAs[Array[Byte]](0)

  /** doc_ids from a (doc_id, g) gram stream with ≥ `minHits` bloom hits —
    * the map-only membership probe plus ONE skinny per-doc count that
    * replaces a cross-corpus gram shuffle at scale. Grams are distinct
    * per doc upstream ([[graft.functions.WordShingles]]), so the count
    * is a distinct-gram hit count.
    */
  private[operators] def bloomHitDocs(
      corpusG: org.apache.spark.sql.DataFrame,
      bloom: Array[Byte],
      minHits: Int): org.apache.spark.sql.DataFrame =
    if (bloom == null) corpusG.select("doc_id").limit(0)
    else corpusG
      .filter(call_function("graft_bloom_contains",
        lit(bloom), xxhash64(col("g"))))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") >= minHits)
      .select("doc_id")

  /** LSH candidate pairs (da < db) from banded minhash signatures: 32
    * band hashes per doc (xxhash64 over band idx + 4 signature slots —
    * a long key, so the candidate join shuffles on a scalar), band
    * equi-join, distinct pairs. The single definition of the banding
    * layout — shared by [[neardupPairs]] and the q90 recall contract
    * so the two can never drift apart.
    */
  /** The banded MinHash index of a shingled frame: 32 scalar band-hash
    * rows per doc — the unit a persisted "band index" stores at scale
    * (bucketed on `band`, this is what each ingest batch probes).
    * Single definition of the banding layout, shared by the self-join
    * candidates, the q90 recall contract, and the incremental q115
    * probe.
    */
  private[graft] def bandedOf(
      sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bandedLayout(sh, Bands, RowsPerBand)

  /** Parameterized banding — same signature, any (bands × rowsPerBand)
    * split of the 128 slots. The 32×4 default is tuned for the 0.8
    * near-dup threshold; the 64×2 layout trades candidate precision
    * for recall at LOW thresholds (catch probability per band is J^r,
    * so r=2 keeps 1-(1-J²)^64 ≈ 1 at J = 0.5 where r=4 would miss ~13%
    * of true pairs) — the fuzzy-decontamination operating point.
    */
  private[graft] def bandedLayout(
      sh: org.apache.spark.sql.DataFrame,
      bands: Int, rowsPerBand: Int): org.apache.spark.sql.DataFrame = {
    require(bands * rowsPerBand <= HashFunctions.MinHashK)
    val sig = sh.withColumn("sig", expr("graft_minhash(sh)"))
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
  }

  /** Per-band-bucket occupancy cap — the guard that keeps the LSH
    * candidate join linear under adversarial skew. A boilerplate
    * template family of m near-identical documents (one byte apart, so
    * exact dedup keeps them all) lands all m members in the SAME band
    * bucket, and an uncapped bucket self-join fans out m(m−1)/2
    * candidate rows before the verify filter — the classic LSH skew
    * killer: invisible at sf0.1, the job that never finishes at 100 TB
    * of template-heavy crawl. Buckets at or under the cap pair
    * all-ways as before; an over-full bucket routes through the
    * bucket-as-cluster STAR instead — band equality at 4 signature
    * slots makes co-bucketed members mutually similar with HIGH
    * PROBABILITY (P[collide] = J⁴ per band; this is probabilistic, not
    * a guarantee), so each member is verified once against the
    * bucket's min-doc_id hub (O(m) verify work) and connected-
    * component clustering stitches the family together as the
    * all-pairs list would. DECLARED precision/recall tradeoff past the
    * cap: a pair whose members share a hot bucket but whose Jaccards
    * to the HUB differ across the threshold is not emitted (on the
    * probe path there is no CC pass to recover it) — the accepted
    * price of keeping adversarial skew linear; below the cap,
    * semantics are exact. 64 matches the gram index's df ≤ 64
    * discipline (q29/q124/q199): a bucket past it carries cluster
    * membership, not pair evidence. The guard is LOUD, not silent:
    * q234_band_occupancy's cap_ok/n_over_cap contract bits go red in
    * the correctness gate the moment the fixture corpus ever grows a
    * past-cap bucket — and the q25-family oracles already carry the
    * capped semantics PRE-ARMED behind the identical-shingle-set
    * group-size proxy ([[cappedGroupSql]], round 17), so a template
    * family past the cap changes nothing except q234's occupancy
    * numbers; DedupSpec asserts the O(m) candidate count on a planted
    * 500-doc template family and engine==mirror equality on a planted
    * 140-member past-cap corpus.
    */
  private[graft] val BandOccupancyCap = 64

  /** A banded frame annotated with its bucket occupancy and hub
    * (min doc id): ONE hash-shuffle on `band` — the same key every
    * consumer joins on next, so the exchange is shared, and on the
    * persisted band index (bucketed + sorted on `band`) the window
    * consumes the bucketed layout with no exchange and no sort.
    */
  private def bandAnnotated(
      banded: org.apache.spark.sql.DataFrame,
      docCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("band")
    banded.withColumn("occ", count(lit(1)).over(w))
      .withColumn("hub", min(col(docCol)).over(w))
  }

  private def lshCandidatePairs(
      sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cappedSelfCandidates(bandedOf(sh))

  /** Occupancy-capped candidate pairs from a banded self-join
    * (da < db): buckets ≤ cap pair all-ways; over-full buckets emit
    * the hub star only. The hub is the bucket min, so da < db holds
    * by construction on the star rows too.
    */
  private[graft] def cappedSelfCandidates(
      banded: org.apache.spark.sql.DataFrame,
      cap: Int = BandOccupancyCap): org.apache.spark.sql.DataFrame = {
    // persist the annotated frame: it feeds THREE plan branches (both
    // cold self-join sides + the hot star), and a self-join duplicates
    // uncached subtrees — without this the minhash sketch and the
    // occupancy window would each run three times per query (the
    // r16 bench measured the q25 family at ~2× without the cache).
    // The frame is skinny (four longs × 32 rows/doc — the same shape
    // a persisted band index stores), so executor-local residency is
    // cheap at any corpus size.
    val ann = bandAnnotated(banded, "doc_id")
      .managedPersist
    val cold = ann.filter(col("occ") <= cap)
      .select(col("doc_id"), col("band"))
    val coldPairs = cold.select(col("doc_id").as("da"), col("band"))
      .join(cold.select(col("doc_id").as("db"), col("band")), Seq("band"))
      .filter(col("da") < col("db"))
      .select("da", "db")
    val hotStar = ann
      .filter(col("occ") > cap && col("doc_id") =!= col("hub"))
      .select(col("hub").as("da"), col("doc_id").as("db"))
    coldPairs.union(hotStar).distinct()
  }

  /** Occupancy-capped base-vs-batch candidates (`baseIdx` = (da, band),
    * `batchBands` = (db, band)): cold base buckets join all members
    * against the batch; a hot base bucket contributes ONLY its hub, so
    * per-batch-doc fan-out is ≤ cap + 1 per band regardless of how
    * many template-family members the accumulated corpus holds. Shared
    * by the in-plan incremental build (q115) and the persisted-index
    * probe ([[probeBandIndex]]) so the two shapes cannot drift.
    */
  private[graft] def cappedProbeCandidates(
      baseIdx: org.apache.spark.sql.DataFrame,
      batchBands: org.apache.spark.sql.DataFrame,
      cap: Int = BandOccupancyCap): org.apache.spark.sql.DataFrame = {
    val ann = bandAnnotated(baseIdx, "da")
    // a hot bucket keeps exactly its hub's OWN row (the hub is the
    // bucket min, so that row exists) — a pure FILTER, not a
    // union/distinct, so the window's band partitioning flows through
    // to the join and the bucketed store side still never exchanges
    // (IndexStoreSpec asserts ≤ 1 band exchange on the probe plan)
    val pruned = ann
      .filter(col("occ") <= cap || col("da") === col("hub"))
      .select(col("da"), col("band"))
    pruned.join(batchBands, Seq("band"))
      .select("da", "db")
      .distinct()
  }

  /** MinHash-LSH verified near-dup pairs (da < db, exact jaccard `j` ≥
    * `minJ`): 128-slot signature → 32 band hashes → SKINNY (doc_id,
    * band) self-join for candidates — shipping the shingle payloads
    * through the 32×-exploded join would multiply the shuffle by band
    * count × shingle bytes (the 100 TB killer); the arrays join back on
    * the surviving pairs only, where exact Jaccard (ratio of exact ints,
    * bitwise engine-identical) verifies. Shared by q25 / q41 / q45.
    */
  private def neardupPairs(
      s: org.apache.spark.sql.SparkSession, dir: String,
      minJ: Double = MinJaccard): org.apache.spark.sql.DataFrame = {
    // the shingle table feeds three plan branches (signatures + both
    // sides of the verify join) — cache it so the CPU-bound shingling
    // runs once per query, not three times (MEMORY_AND_DISK: at corpus
    // scale the executor-local spill is still far cheaper than
    // recomputing the sketch stage)
    val sh = shingled(s, dir)
      .managedPersist
    verifiedPairsOf(sh, minJ)
  }

  /** LSH-candidate → exact-Jaccard-verified pairs over an
    * already-shingled (and ideally persisted) frame — the df-based core
    * of [[neardupPairs]], shared with the composed corpus pipeline
    * (q100) so the banding layout and verify arithmetic have exactly
    * one definition.
    */
  private[graft] def verifiedPairsOf(
      sh: org.apache.spark.sql.DataFrame,
      minJ: Double = MinJaccard): org.apache.spark.sql.DataFrame =
    verifyCand(lshCandidatePairs(sh), sh, minJ)

  /** Exact-Jaccard verification of a (da, db) candidate list against
    * the shingle table — the arithmetic shared by the self-join path
    * and the incremental base-vs-batch path (q115).
    */
  private[graft] def verifyCand(
      candidates: org.apache.spark.sql.DataFrame,
      sh: org.apache.spark.sql.DataFrame,
      minJ: Double): org.apache.spark.sql.DataFrame =
    verifyCandTwo(candidates, sh, sh, minJ)

  /** Two-sided variant: `da` shingles from `shA`, `db` shingles from
    * `shB` — the shape the persisted-index probe needs, where the base
    * side's shingles come from the index store and the batch side's
    * are computed in-plan. One arithmetic definition for both.
    */
  private def verifyCandTwo(
      candidates: org.apache.spark.sql.DataFrame,
      shA: org.apache.spark.sql.DataFrame,
      shB: org.apache.spark.sql.DataFrame,
      minJ: Double): org.apache.spark.sql.DataFrame = {
    val cand = candidates
      .join(shA.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
      .join(shB.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
    val inter = size(array_intersect(col("sha"), col("shb")))
    val union = size(col("sha")) + size(col("shb")) - inter
    cand
      .withColumn("j", inter.cast("double") / union)
      .filter(col("j") >= minJ)
      .select("da", "db", "j")
  }

  /** Write-once banded MinHash index artifacts — the build-ONCE/
    * probe-many path of the nightly near-dup ingest loop (q115 proves
    * the probe SHAPE in-plan; this persists the base side so the next
    * batch never re-shingles or re-hashes the accumulated corpus).
    * Two bucketed external tables under `name`:
    *
    *  - `<name>_bands` (doc_id, band), BUCKETED on `band` — the probe
    *    join's key, so a batch's candidate join consumes the bucketed
    *    layout with ZERO exchange on the corpus side (only the small
    *    batch frame shuffles; asserted in IndexStoreSpec);
    *  - `<name>_shingles` (doc_id, sh), BUCKETED on `doc_id` — the
    *    exact-Jaccard verify side, joined only for surviving
    *    candidates, likewise exchange-free on the stored side.
    *
    * Banding layout is [[bandedOf]] — the exact definition the in-plan
    * pipeline uses, so a persisted index and a fresh build can never
    * disagree on bucketing.
    */
  def writeBandIndex(
      docs: org.apache.spark.sql.DataFrame,
      name: String,
      path: String,
      buckets: Int = 32): Unit = {
    val s = docs.sparkSession
    // plain persist (not managed): the write below is the only consumer
    // and the finally releases it synchronously
    val sh = shingledOf(s, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bandedOf(sh).write
        .mode("overwrite")
        .bucketBy(buckets, "band").sortBy("band")
        .option("path", s"$path/bands").saveAsTable(s"${name}_bands")
      sh.write
        .mode("overwrite")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .option("path", s"$path/shingles").saveAsTable(s"${name}_shingles")
      // staleness bookkeeping (q192): shingled-doc count at build —
      // counted off the persisted input frame, NOT a table read-back
      // (an early read would cache the file listing in THIS session's
      // catalog, and appends from foreachBatch's cloned sessions do
      // not invalidate it — the stale-guard hazard the Dedup append
      // variants now refresh against)
      IndexMaintenance.writeBuildMeta(s, path, sh.count())
    } finally sh.unpersist(blocking = false)
  }

  /** Re-attach a [[writeBandIndex]] artifact in a NEW SparkSession —
    * the write-once index outlives the session that built it (its
    * truth is the bucketed parquet under `path`; the catalog entry is
    * session state), so the nightly probe job starts by registering
    * the on-disk tables with the exact bucket spec they were written
    * under. DDL-declared spec == write-time spec, so probes stay
    * exchange-free (IndexStoreSpec proves drop → register → probe is
    * result-identical and still consumes the bucketed layout).
    */
  def registerBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      path: String,
      buckets: Int = 32): Unit = {
    IndexCatalog.registerBucketed(spark, s"${name}_bands",
      s"$path/bands", "band", buckets)
    IndexCatalog.registerBucketed(spark, s"${name}_shingles",
      s"$path/shingles", "doc_id", buckets)
  }

  /** [[registerBandIndex]]'s twin for the [[writeGramIndex]] artifact. */
  def registerGramIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      path: String,
      buckets: Int = 32): Unit =
    IndexCatalog.registerBucketed(spark, s"${name}_grams",
      s"$path/grams", "g", buckets)

  /** Append a batch's bands + shingles to a persisted [[writeBandIndex]]
    * index — the other half of the nightly loop (probe, then fold the
    * surviving docs in so the NEXT batch dedups against them too).
    * `insertInto` honors the target table's bucket spec, so appends
    * keep the exchange-free probe property; both writes are
    * position-based against the exact schemas [[writeBandIndex]] laid
    * down ((doc_id, band) and (doc_id, sh)).
    */
  def appendToBandIndex(
      docs: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val s = docs.sparkSession
    val sh = shingledOf(s, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bandedOf(sh).write.mode("append").insertInto(s"${name}_bands")
      sh.write.mode("append").insertInto(s"${name}_shingles")
    } finally sh.unpersist(blocking = false)
  }

  /** [[appendToBandIndex]] guarded against rows already present — the
    * REPLAY path of the streaming ingest loop ([[graft.streaming
    * .IngestLedger]]): a retried micro-batch whose original attempt
    * died mid-append re-runs this instead of the plain append, and
    * each table receives only the docs it does not already hold.
    * Costs a distinct-doc scan of both stored tables, which is why the
    * happy path keeps the unguarded append; assumes the default
    * job-atomic file commit (a table never holds a PARTIAL doc).
    */
  def appendToBandIndexDedup(
      docs: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val s = docs.sparkSession
    // the guard MUST see current table state: a replay typically runs
    // in a different session than the appends it guards against (the
    // original attempt ran in foreachBatch's cloned session), and a
    // cached file listing in this session's catalog would make the
    // anti-join silently re-admit rows the table already holds
    s.catalog.refreshTable(s"${name}_bands")
    s.catalog.refreshTable(s"${name}_shingles")
    val sh = shingledOf(s, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val inBands =
        s.table(s"${name}_bands").select("doc_id").distinct()
      bandedOf(sh).join(inBands, Seq("doc_id"), "left_anti")
        .write.mode("append").insertInto(s"${name}_bands")
      val inShingles =
        s.table(s"${name}_shingles").select("doc_id").distinct()
      sh.join(inShingles, Seq("doc_id"), "left_anti")
        .write.mode("append").insertInto(s"${name}_shingles")
    } finally sh.unpersist(blocking = false)
  }

  /** Write-once DISTINCT-GRAM index — the third persisted artifact
    * family (bands for near-dup, cells/codes for ANN, GRAMS for the
    * novelty/decontamination scans): one bucketed external table
    * `<name>_grams` holding the corpus's distinct 3-gram shingles,
    * BUCKETED AND SORTED on `g` — the key every probe joins on. q110's
    * plan note ("at scale the base side is the previous release's
    * persisted gram index") made concrete: a release writes this once,
    * and every incremental batch's novelty/leakage scan anti-joins it
    * with ZERO exchange on the stored side (only the batch's distinct
    * grams shuffle — asserted in IndexStoreSpec).
    */
  def writeGramIndex(
      docs: org.apache.spark.sql.DataFrame,
      name: String,
      path: String,
      buckets: Int = 32): Unit = {
    val s = docs.sparkSession
    shingledOf(s, docs)
      .select(explode(col("sh")).as("g")).distinct()
      .write
      .mode("overwrite")
      .bucketBy(buckets, "g").sortBy("g")
      .option("path", s"$path/grams").saveAsTable(s"${name}_grams")
    // staleness bookkeeping (q192): distinct-gram count at build
    IndexMaintenance.writeBuildMeta(s, path,
      s.table(s"${name}_grams").count())
  }

  /** Append a batch's distinct grams to a persisted [[writeGramIndex]]
    * index. The stored table stays distinct: only grams the index does
    * not already contain are written (one anti-join probe — itself
    * exchange-free on the stored side — feeding a bucket-spec-
    * preserving `insertInto`).
    */
  def appendToGramIndex(
      docs: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val s = docs.sparkSession
    // exact-once depends on seeing CURRENT table state: appends from a
    // foreachBatch clone session don't invalidate this session's
    // cached file listing (appendToBandIndexDedup's hazard note)
    s.catalog.refreshTable(s"${name}_grams")
    shingledOf(s, docs)
      .select(explode(col("sh")).as("g")).distinct()
      .join(s.table(s"${name}_grams"), Seq("g"), "left_anti")
      .write.mode("append").insertInto(s"${name}_grams")
  }

  /** q110's novelty scan against the persisted gram index: per-lang
    * distinct-gram and novel-gram counts of `batch` vs the stored
    * corpus — identical output to the in-plan q110 build on the same
    * split (IndexStoreSpec asserts result identity). The anti-join
    * consumes the bucketed layout, so the stored side — the 100 TB
    * side — never shuffles and never re-shingles.
    */
  def probeGramNovelty(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val newG = batchDistinctGrams(spark, batch).managedPersist
    val novel = novelGramsOf(spark, name, newG)
      .groupBy("lang").agg(count(lit(1)).as("n_novel"))
    newG.groupBy("lang").agg(count(lit(1)).as("n_new_grams"))
      .join(novel, Seq("lang"), "left")
      .select(col("lang"), col("n_new_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .orderBy("lang")
  }

  /** A batch's per-doc distinct-gram stream (doc_id, g) — shared by
    * the streaming gram-novelty ingest gate. Grams are distinct per
    * doc by construction ([[graft.functions.WordShingles]]).
    */
  private[graft] def docGrams(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    shingledOf(spark, docs)
      .select(col("doc_id"), explode(col("sh")).as("g"))

  /** A batch's distinct (lang, g) gram frame — the probe's input. */
  private[graft] def batchDistinctGrams(
      spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    shingledOf(spark, batch)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(batch.select("doc_id", "lang"), "doc_id")
      .select("lang", "g").distinct()

  /** The probe CORE: batch grams the stored index does not contain —
    * one LEFT ANTI join consuming the bucketed layout directly (the
    * stored side never shuffles; IndexStoreSpec plan-asserts on exactly
    * this frame).
    */
  private[graft] def novelGramsOf(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      newG: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    newG.join(spark.table(s"${name}_grams"), Seq("g"), "left_anti")

  /** Near-dup a new batch against a persisted [[writeBandIndex]] index:
    * verified (da ∈ base, db ∈ batch, j) pairs, identical semantics to
    * the in-plan base-vs-batch build (IndexStoreSpec asserts result
    * equality). Candidate work is O(|batch| × bands × bucket
    * occupancy) — independent of the accumulated corpus size — and the
    * corpus-side band scan is exchange-free off the bucketed table.
    */
  def probeBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      batch: org.apache.spark.sql.DataFrame,
      minJ: Double = MinJaccard): org.apache.spark.sql.DataFrame = {
    val shBatch = shingledOf(spark, batch)
      .managedPersist
    val baseIdx = spark.table(s"${name}_bands")
      .select(col("doc_id").as("da"), col("band"))
    val batchBands = bandedOf(shBatch)
      .select(col("doc_id").as("db"), col("band"))
    val cand = cappedProbeCandidates(baseIdx, batchBands)
    verifyCandTwo(cand, spark.table(s"${name}_shingles"), shBatch, minJ)
  }

  /** Min-label propagation to FIXPOINT over an undirected pair list
    * (`da`, `db`) — one shuffle of the skinny (vertex, label) frame per
    * round against the edge list, scalar-aggregate fixpoint test (the
    * label sum is monotonically decreasing, so equal sums ⇒ converged),
    * O(component diameter) rounds. There is deliberately NO silent
    * round cap: the loop runs until the fixpoint and THROWS past
    * `maxRounds` — a duplicate chain deeper than the cap must fail
    * loud, never return plausible-but-wrong labels (the cap exists only
    * to turn a propagation bug into an error instead of an infinite
    * loop; diameter > 1000 on a near-dup graph is pathological input).
    */
  private[graft] def minLabelPropagate(
      pairs: org.apache.spark.sql.DataFrame,
      maxRounds: Int = 1000): org.apache.spark.sql.DataFrame = {
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
      .persist()
    def labelSum(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(coalesce(sum("lbl"), lit(0L))).first().getLong(0)
    var cur = edges.groupBy("a").agg(min("b").as("mn"))
      .select(col("a").as("v"), least(col("a"), col("mn")).as("lbl"))
      .persist()
    var curSum = labelSum(cur)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // localCheckpoint (eager) materializes the round AND truncates
      // lineage: label frames are metadata-sized (two longs per
      // near-dup doc), and deep chains must not accrete a logical plan
      // of unbounded depth round over round
      val next = edges.join(cur, edges("b") === cur("v"))
        .select(edges("a").as("v"), col("lbl"))
        .union(cur.select(col("v"), col("lbl")))
        .groupBy("v").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      converged = nextSum == curSum
      // only the round-0 frame sits in the cache manager; later rounds
      // are localCheckpoint'd RDDs (Dataset.unpersist is a no-op on
      // those — the ContextCleaner reclaims them once unreferenced)
      if (rounds == 0) cur.unpersist()
      cur = next; curSum = nextSum; rounds += 1
    }
    edges.unpersist()
    if (!converged) {
      throw new IllegalStateException(
        s"connected components did not converge after $maxRounds rounds " +
          "(component diameter exceeds the round cap — raise maxRounds; " +
          "refusing to return unconverged labels)")
    }
    // cur stays materialized for the caller's consumption; the
    // ContextCleaner releases it once the query's reference is GC'd
    cur
  }

  /** Connected-component labels (vertex, lbl) over the verified
    * near-dup pair graph. Shared by q45 (cluster sizes) and q83
    * (survivor selection).
    */
  private def ccLabels(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val pairs = neardupPairs(s, dir).select("da", "db").persist()
    val labels = minLabelPropagate(pairs)
    pairs.unpersist()
    labels
  }

  /** The PRE-ARMED capped-semantics oracle mirror (VERDICT r16 ask
    * #5): identical-shingle-set groups as the SQL-computable proxy for
    * the engine's band-bucket occupancy. An over-cap band bucket in
    * practice means a template family — docs whose distinct-shingle
    * SETS are equal share ALL 32 band hashes, so a group of m > cap
    * identical sets forces every one of its buckets over the cap and
    * the engine routes the family through its hub star. The mirror
    * annotates each doc with its identical-set group size `n` and
    * group-min `hub`, and keeps a verified pair only when each
    * endpoint is either in an at/under-cap group, its group's hub, or
    * paired WITH its group's hub — exactly the star's emission rule.
    * (For the smaller endpoint `da` the paired-with-hub branch is
    * unsatisfiable — the hub is the group MIN and da < db — so its
    * predicate carries only the two live clauses.)
    * On a corpus with no over-cap group (every current fixture —
    * q234's `cap_ok` gates this) each predicate is vacuously true and
    * the mirror IS the brute-force oracle, so arming it changes
    * nothing today. DECLARED boundary (the probabilistic semantics
    * [[BandOccupancyCap]]'s doc states): near-identical-but-unequal
    * sets co-bucket only probabilistically, so a fixture that grows
    * (a) two over-cap families mutually above the threshold or (b) a
    * sub-family satellite doc with an id below the family hub would
    * diverge mirror from engine — q234's occupancy row is the tripwire
    * either way, and DedupSpec proves the mirror exact on the planted
    * single-family shape a real fixture would grow.
    */
  private def cappedGroupSql(memberFilter: String): String =
    s"""grp AS (SELECT doc_id,
       |    md5(array_to_string(list_sort(s), chr(31))) AS gk
       |  FROM sh $memberFilter),
       |ann AS (SELECT grp.doc_id, g.n, g.hub
       |  FROM grp JOIN (SELECT gk, COUNT(*) AS n, MIN(doc_id) AS hub
       |                 FROM grp GROUP BY gk) g USING (gk))"""
      .stripMargin

  /** Cross-side (even base × odd batch) exact-Jaccard oracle with the
    * capped-base mirror — shared by q115 (in-plan incremental build)
    * and q116/q172 (persisted-index probe), which must return
    * identical answers. The base-side annotation mirrors
    * [[cappedProbeCandidates]]: a non-hub member of an over-cap BASE
    * group probes through its hub only, so pairs keep a base endpoint
    * only when its base-side group is at/under cap or it is that
    * group's hub.
    */
  private val crossPairJaccardSql =
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |sh AS (SELECT doc_id,
       |    list_distinct([array_to_string(t[i:i+2], ' ')
       |                   for i in range(1, len(t)-1)]) AS s
       |  FROM toks WHERE len(t) >= 3),
       |${cappedGroupSql("WHERE doc_id % 2 = 0")},
       |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
       |  FROM sh a JOIN sh b
       |    ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
       |SELECT da, db, ROUND(j, 4) AS jaccard FROM p
       |JOIN ann za ON za.doc_id = p.da
       |WHERE j >= 0.8
       |  AND (za.n <= $BandOccupancyCap OR p.da = za.hub)
       |ORDER BY da, db""".stripMargin

  /** Token-grain content-defined chunking (q203's core): a chunk
    * boundary falls AFTER token i iff md5(token_i) starts with '0' or
    * '1' (expected chunk length 8 tokens). The cut decision is a pure
    * per-token function — no rolling state — so chunking is entirely
    * in-row HOFs over the token array: no window, no per-doc shuffle,
    * and an edit anywhere re-synchronizes at the first cut point after
    * it (the LBFS/FastCDC property fixed windows lack; DedupSpec pins
    * the re-sync against the fixed-window strawman). Input (doc_id,
    * lang, text) → one row per chunk (doc_id, lang, h = md5 of the
    * space-joined chunk tokens, l = token count).
    */
  def cdcChunks(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = d
    .select(col("doc_id"), col("lang"),
      TextAnalysis.tokens(col("text")).as("t"))
    .withColumn("n", size(col("t")))
    .filter(col("n") >= 1)
    .withColumn("bounds", expr(
      """concat(array(0),
        |  IF(n >= 2, filter(sequence(1, n - 1),
        |    i -> substring(md5(element_at(t, i)), 1, 1)
        |           IN ('0', '1')),
        |    CAST(array() AS array<int>)),
        |  array(n))""".stripMargin))
    .select(col("doc_id"), col("lang"), explode(expr(
      """transform(sequence(1, size(bounds) - 1), j -> named_struct(
        |  'h', md5(array_join(slice(t, element_at(bounds, j) + 1,
        |         element_at(bounds, j + 1) - element_at(bounds, j)),
        |       ' ')),
        |  'l', element_at(bounds, j + 1) - element_at(bounds, j)))"""
        .stripMargin)).as("c"))
    .select(col("doc_id"), col("lang"), col("c.h").as("h"),
      col("c.l").cast("long").as("l"))

  /** The q216 dedup-stage yield cascade over any (doc_id, text) frame:
    * the declared stage ladder (exact → normalized → 8-token prefix →
    * 8-token suffix), each stage keeping the min-doc_id survivor per
    * key among the PREVIOUS stage's survivors, with per-stage marginal
    * counts. Returns (stage_order, stage, n_in, n_removed, n_out) —
    * a 4-row local frame; the corpus passes run eagerly (one key
    * shuffle + one survivor semi-join per stage). Public so DedupSpec
    * can drive handcrafted corpora through the exact cascade.
    */
  def dedupStageYield(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    val toks = TextAnalysis.tokens(col("text"))
    val d = docs
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(lower(col("text")), "\\s+", " "))
          .as("ntext"),
        array_join(slice(toks, 1, 8), " ").as("p8"),
        array_join(slice(toks,
          greatest(lit(1), size(toks) - lit(7)), lit(8)), " ")
          .as("s8"))
      .managedPersist
    def survive(df: org.apache.spark.sql.DataFrame,
        key: String): org.apache.spark.sql.DataFrame = {
      val keep = df.groupBy(col(key))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      df.join(keep, Seq("doc_id"), "left_semi")
    }
    val stages = Seq("text" -> "exact", "ntext" -> "normalized",
      "p8" -> "prefix8", "s8" -> "suffix8")
    val (counts, _) = stages.foldLeft(
      (Seq((0L, d.count())), d)) { case ((acc, cur), (key, _)) =>
      val nxt = survive(cur, key).managedPersist
      (acc :+ (acc.last._2, nxt.count()), nxt)
    }
    val rows = stages.zipWithIndex.map { case ((_, nm), i) =>
      val (nIn, nOut) = counts(i + 1)
      ((i + 1).toLong, nm, nIn, nIn - nOut, nOut)
    }
    s.createDataFrame(rows)
      .toDF("stage_order", "stage", "n_in", "n_removed", "n_out")
  }

  /** The q116/q234 fixture store: ONE persisted band index over the
    * even-doc_id half per (sfDir), built on first use in the session —
    * the probe (q116) and the occupancy audit (q234) share it the way
    * a deployment's health report reads the same nightly artifact the
    * ingest loop probes.
    */
  private def bandStoreFixture(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    // the tag carries the corpus CONTENT fingerprint, not just the
    // dir: a fixture regenerated at the same path mid-session must
    // rebuild the store — q234 cross-compares store counts against
    // the current documents table, and a stale store would flip its
    // contract bits (the ADVICE r15 fixture-tag discipline)
    val fp = IndexCatalog.fpTag(tableFingerprint(s, dir, "documents"))
    val tag = s"${IndexCatalog.dirTag(dir)}_$fp"
    val name = s"graft_q116_$tag"
    if (!s.catalog.tableExists(s"${name}_bands")) {
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-q116-$tag")
      writeBandIndex(
        table(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        name, path.toString)
    }
    name
  }

  /** Numeric band-bucket occupancy profile of a banded (doc_id, band)
    * frame — the operational health numbers a dedup owner reads before
    * trusting a nightly near-dup pass (the band-store analogue of
    * q122's IVF cell balance and q132's PQ code balance): bucket
    * count, max and mean occupancy (mean as half-up ×100 — the q219
    * integer idiom, no engine-divergent doubles), and how many buckets
    * exceed [[BandOccupancyCap]] (every one of those routed through
    * the O(m) hub star instead of the m² pair join). ONE groupBy on
    * `band` + a single-row rollup; on the persisted store the groupBy
    * consumes the bucketed layout exchange-free.
    */
  def bandOccupancyStats(
      banded: org.apache.spark.sql.DataFrame,
      cap: Int = BandOccupancyCap): org.apache.spark.sql.DataFrame =
    banded.groupBy("band").agg(count(lit(1)).as("occ"))
      // empty-frame guard (ADVICE r16): a degenerate corpus with zero
      // band rows must report zeros, not nulls — sum/max over an empty
      // rollup are null and a null would propagate into q234's
      // contract bits where the oracle has integer literals
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(sum("occ"), lit(0L)).as("occ_sum"),
        coalesce(max("occ"), lit(0L)).as("max_occ"),
        coalesce(sum(when(col("occ") > cap, 1L).otherwise(0L)), lit(0L))
          .as("n_over_cap"))
      .select(col("n_buckets"), col("occ_sum"), col("max_occ"),
        when(col("n_buckets") === 0, lit(0L))
          .otherwise(expr("(200 * occ_sum + n_buckets) div (2 * n_buckets)"))
          .as("mean_occ_x100"),
        col("n_over_cap"))

  val defs: Seq[(String, QueryDef)] = Seq(

    // Band-bucket occupancy HEALTH audit — the row a dedup owner reads
    // next to q122 (IVF cells) and q132 (PQ codes) before signing off
    // a crawl-scale near-dup pass: for the in-plan corpus banding AND
    // the persisted band-index artifact (the q116 fixture store, even
    // half), is every band bucket within [[BandOccupancyCap]], how
    // many are over (each such bucket runs the O(m) hub star, not the
    // m² pair join), and do the bucket totals reconcile with the
    // corpus? Contract columns (the q122 discipline — booleans the
    // oracle can recompute from raw parquet, no engine-specific hash
    // values in the hashed output):
    //   occ_sum_ok    — Σ occupancy == 32 bands × shingled-doc count
    //                   (every shingled doc emits exactly 32 band rows);
    //   dup_floor_ok  — max occupancy ≥ the largest exact-duplicate
    //                   text group (exact dups share ALL bands, so any
    //                   banding reporting less has lost rows);
    //   cap_ok        — max occupancy ≤ cap (the health bit: 0 means
    //                   the star path is live and the corpus has a
    //                   template family worth investigating);
    //   n_over_cap    — how many buckets are over (0 here; planted
    //                   template families drive it in DedupSpec, which
    //                   also asserts the O(m) candidate count).
    // Plan at 100 TB: one groupBy per store on the band key — the
    // stored side exchange-free off the bucketed layout — plus two
    // scalar rollups; nothing pairwise anywhere.
    "q234_band_occupancy" -> QueryDef(
      (s, dir) => {
        // single consumer of the shingle frame (the banding) — no
        // persist; the store side reads the fixture artifact instead
        val sh = shingled(s, dir)
        val storeName = bandStoreFixture(s, dir)
        def row(stats: org.apache.spark.sql.DataFrame,
            store: String, docCount: org.apache.spark.sql.Column,
            docs: org.apache.spark.sql.DataFrame) = {
          // dup groups keyed on md5(text) — the q222 discipline: the
          // shuffle moves 16-byte keys, never document text
          val maxDup = docs.groupBy(md5(col("text")).as("h"))
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(max("n"), lit(0L)).as("max_dup"))
          stats
            .crossJoin(docs.agg(docCount.as("n_docs")))
            .crossJoin(maxDup)
            .select(lit(store).as("store"), col("n_docs"),
              (col("occ_sum") === col("n_docs") * Bands)
                .cast("long").as("occ_sum_ok"),
              (col("max_occ") >= col("max_dup"))
                .cast("long").as("dup_floor_ok"),
              (col("max_occ") <= BandOccupancyCap)
                .cast("long").as("cap_ok"),
              col("n_over_cap"))
        }
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .managedPersist
        val corpusRow = row(bandOccupancyStats(bandedOf(sh)),
          "corpus", count(lit(1)), docs)
        val storeRow = row(
          bandOccupancyStats(
            s.table(s"${storeName}_bands").select("doc_id", "band")),
          "store_even", count(lit(1)),
          docs.filter(col("doc_id") % 2 === 0))
        corpusRow.unionByName(storeRow).orderBy("store")
      },
      Some("""WITH toks AS (SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id, text FROM toks WHERE len(t) >= 3)
              SELECT 'corpus' AS store,
                (SELECT COUNT(*) FROM sh) AS n_docs,
                CAST(1 AS BIGINT) AS occ_sum_ok,
                CAST(1 AS BIGINT) AS dup_floor_ok,
                CAST(1 AS BIGINT) AS cap_ok,
                CAST(0 AS BIGINT) AS n_over_cap
              UNION ALL
              SELECT 'store_even',
                (SELECT COUNT(*) FROM sh WHERE doc_id % 2 = 0),
                CAST(1 AS BIGINT), CAST(1 AS BIGINT),
                CAST(1 AS BIGINT), CAST(0 AS BIGINT)
              ORDER BY store""")),

    // q203: CONTENT-DEFINED chunk dedup — the LBFS/FastCDC idea at
    // token grain, the granularity q112's fixed windows structurally
    // miss: a single inserted prefix shifts every fixed window (zero
    // dup chunks detected on a re-crawl with an added banner), while
    // content-defined cut points re-synchronize at the first boundary
    // after the edit. Cut rule: a chunk boundary falls AFTER token i
    // iff md5(token_i) starts with '0' or '1' (expected chunk length
    // 16/2 = 8 tokens; q46's proven cross-engine hex-gate recipe —
    // deterministic, no rolling state, so chunking is a pure in-row
    // function of the token array). The fixture plants re-crawls: every
    // doc_id % 9 == 4 doc re-appears under a fresh id with a 2-token
    // banner prepended — only its FIRST chunk differs, every chunk
    // after the first cut point dedups against the original. Per lang:
    // chunk instances, distinct chunks, duplicate chunks/tokens, dup
    // share (half-up bp), mean chunk tokens (integer div). Plan at
    // 100 TB: chunking is ALL in-row HOFs (no window, no per-doc
    // shuffle — compare q112); the only exchange is the (lang, hash)
    // partial agg, and chunk hashes are 32-hex keys, never chunk text.
    "q203_cdc_chunk_dedup" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val d = docs.select(col("doc_id"), col("lang"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 9 === 4)
            .select((-col("doc_id") - 1).as("doc_id"), col("lang"),
              concat(lit("zznew1 zzname2 "), col("text")).as("text")))
        cdcChunks(d).groupBy("lang", "h")
          .agg(count(lit(1)).as("cnt"), min("l").as("l"))
          .groupBy("lang")
          .agg(sum("cnt").as("n_chunks"),
            count(lit(1)).as("n_unique"),
            sum(col("cnt") - 1).as("dup_chunks"),
            sum((col("cnt") - 1) * col("l")).as("dup_tokens"))
          .select(col("lang"), col("n_chunks"), col("n_unique"),
            col("dup_chunks"), col("dup_tokens"),
            expr("(20000 * dup_chunks + n_chunks) div (2 * n_chunks)")
              .as("dup_bp"))
          .orderBy("lang")
      },
      Some(s"""WITH d AS (SELECT doc_id, lang, text FROM documents
                UNION ALL
                SELECT -doc_id - 1, lang, 'zznew1 zzname2 ' || text
                FROM documents WHERE doc_id % 9 = 4),
              toks AS (SELECT doc_id, lang,
                  list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> '') AS t
                FROM d),
              b AS (SELECT doc_id, lang, t,
                  [0] || [i for i in range(1, len(t))
                          if substring(md5(t[i]), 1, 1) IN ('0', '1')]
                    || [len(t)] AS bounds
                FROM toks WHERE len(t) >= 1),
              ch AS (SELECT lang,
                  UNNEST([md5(array_to_string(
                      t[bounds[j] + 1:bounds[j + 1]], ' '))
                    for j in range(1, len(bounds))]) AS h,
                  UNNEST([CAST(bounds[j + 1] - bounds[j] AS BIGINT)
                    for j in range(1, len(bounds))]) AS l
                FROM b),
              per AS (SELECT lang, h, COUNT(*) AS cnt, MIN(l) AS l
                      FROM ch GROUP BY 1, 2)
              SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_chunks,
                COUNT(*) AS n_unique,
                CAST(SUM(cnt - 1) AS BIGINT) AS dup_chunks,
                CAST(SUM((cnt - 1) * l) AS BIGINT) AS dup_tokens,
                CAST((20000 * SUM(cnt - 1) + SUM(cnt)) //
                  (2 * SUM(cnt)) AS BIGINT) AS dup_bp
              FROM per GROUP BY lang ORDER BY lang""")),

    // Q22 exact dedup on text: survivors = min-doc_id row per distinct
    // text (one shuffle, partial agg), then per-lang survivor counts.
    "q22_dedup" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .groupBy("text")
        .agg(min_by(col("lang"), col("doc_id")).as("lang"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs FROM (
                SELECT arg_min(lang, doc_id) AS lang
                FROM documents GROUP BY text) t
              GROUP BY lang ORDER BY lang""")),

    // q216: dedup-stage YIELD waterfall — the budget artifact a
    // pipeline owner reads before sizing a dedup run: the declared
    // stage ladder (exact bytes → whitespace/case-normalized →
    // 8-token prefix → 8-token suffix, cheapest-first, the q121
    // filter-funnel shape applied to dedup) applied SEQUENTIALLY, with
    // each stage's marginal removals counted against the previous
    // stage's survivors. Stage k's key is NOT a coarsening of stage
    // k-1's (a case change moves the prefix key too), so the marginal
    // counts genuinely depend on the cascade order — this is the
    // number the one-stage reports (q22/q113/q118/q148) cannot give.
    // Survivor rule everywhere: min doc_id per key (q83's canonical
    // pick). Exactness: pure integer counts. Plan at 100 TB: the
    // keyed projection is map-only; each stage is ONE partial-agg key
    // shuffle plus a semi-join of the (shrinking) survivor set on
    // doc_id; the report itself is a 4-row local frame of scalars
    // (q192's report shape).
    "q216_dedup_stage_yield" -> QueryDef(
      (s, dir) => dedupStageYield(table(s, dir, "documents"))
        .orderBy("stage_order"),
      Some("""WITH t0 AS (SELECT doc_id, text,
                  trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                    AS ntext,
                  list_filter(string_split_regex(text, '\s+'),
                    x -> x <> '') AS t
                FROM documents),
              d AS (SELECT doc_id, text, ntext,
                  array_to_string(t[1:8], ' ') AS p8,
                  array_to_string(t[greatest(1, len(t)-7):len(t)], ' ')
                    AS s8
                FROM t0),
              s1 AS (SELECT * FROM d QUALIFY
                  doc_id = MIN(doc_id) OVER (PARTITION BY text)),
              s2 AS (SELECT * FROM s1 QUALIFY
                  doc_id = MIN(doc_id) OVER (PARTITION BY ntext)),
              s3 AS (SELECT * FROM s2 QUALIFY
                  doc_id = MIN(doc_id) OVER (PARTITION BY p8)),
              s4 AS (SELECT * FROM s3 QUALIFY
                  doc_id = MIN(doc_id) OVER (PARTITION BY s8)),
              c AS (SELECT
                  (SELECT COUNT(*) FROM d) AS n0,
                  (SELECT COUNT(*) FROM s1) AS n1,
                  (SELECT COUNT(*) FROM s2) AS n2,
                  (SELECT COUNT(*) FROM s3) AS n3,
                  (SELECT COUNT(*) FROM s4) AS n4)
              SELECT * FROM (
                SELECT CAST(1 AS BIGINT) AS stage_order,
                  'exact' AS stage, n0 AS n_in, n0 - n1 AS n_removed,
                  n1 AS n_out FROM c
                UNION ALL
                SELECT CAST(2 AS BIGINT), 'normalized', n1, n1 - n2, n2
                FROM c
                UNION ALL
                SELECT CAST(3 AS BIGINT), 'prefix8', n2, n2 - n3, n3
                FROM c
                UNION ALL
                SELECT CAST(4 AS BIGINT), 'suffix8', n3, n3 - n4, n4
                FROM c
              ) ORDER BY stage_order""")),

    // MinHash-LSH near-dup: banded bucket join for candidates, exact
    // Jaccard (ratio of exact ints — bitwise engine-identical) on the
    // candidates only. Oracle is the brute-force exact join with the
    // PRE-ARMED capped mirror ([[cappedGroupSql]]): on every current
    // fixture (no over-cap group, q234-gated) the mirror predicates
    // are vacuous and this IS the plain brute force; a fixture that
    // grows a >cap template family flips the engine to hub-star
    // emission and the mirror follows without an oracle emergency.
    // graft_shingles ≡ array_distinct(shingles(tokens(text), 3)) —
    // equivalence proved in DedupSpec against the composable form.
    "q25_neardup_minhash" -> QueryDef(
      (s, dir) => neardupPairs(s, dir)
        .select(col("da"), col("db"), round(col("j"), 4).as("jaccard"))
        .orderBy("da", "db"),
      Some(s"""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              ${cappedGroupSql("")},
              p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
              SELECT da, db, ROUND(j, 4) AS jaccard FROM p
              JOIN ann za ON za.doc_id = p.da
              JOIN ann zb ON zb.doc_id = p.db
              WHERE j >= 0.8
                AND (za.n <= $BandOccupancyCap OR p.da = za.hub)
                AND (zb.n <= $BandOccupancyCap OR p.db = zb.hub
                     OR p.da = zb.hub)
              ORDER BY da, db""")),

    // Winnowing (rolling-hash) fingerprint dedup: docs sharing ≥ 5 RARE
    // selected fingerprints (document frequency ≤ 64). The join shuffles
    // on the fingerprint value (inverted-index bucket join, never
    // all-pairs); the df cap bounds each bucket's pair fan-out at 64² —
    // without it a template 5-gram shared by m documents emits m² pair
    // rows (the standard df-capped design for fingerprint dedup at
    // scale; common fingerprints carry no dedup signal anyway). The
    // md5-based gram hash makes the whole pipeline SQL-mirrorable.
    "q29_winnow_fingerprint" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        // feeds the df count and both join sides — winnow once
        val fp = table(s, dir, "documents")
          .select(col("doc_id"),
            explode(expr("graft_winnow(text, 5, 4)")).as("fp"))
          .managedPersist
        val rare = fp
          .groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 64)
          .select("fp")
        val rareFp = fp.join(rare, Seq("fp"))
        rareFp.select(col("doc_id").as("da"), col("fp"))
          .join(rareFp.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
          .filter(col("da") < col("db"))
          .groupBy("da", "db")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 5)
          .orderBy("da", "db")
      },
      Some("""WITH grams AS (SELECT doc_id,
                  [substring(md5(substring(text, i, 5)), 1, 16)
                   for i in range(1, LENGTH(text) - 5 + 2)] AS hs
                FROM documents WHERE LENGTH(text) >= 5),
              fps AS (SELECT doc_id, UNNEST(list_distinct(
                  [list_aggregate(hs[j:j+3], 'min')
                   for j in range(1, GREATEST(LEN(hs) - 3, 1) + 1)])) AS fp
                FROM grams),
              rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64),
              rfps AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp))
              SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_shared
              FROM rfps a JOIN rfps b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 5
              ORDER BY da, db""")),

    // Corpus-level dedup analysis: exact Jaccard between SOURCE-level
    // 3-gram shingle sets. Set union is distributed ((source, shingle)
    // distinct — one shuffle on the pair), intersections come from a
    // shingle-keyed equi-join; only pairs sharing ≥1 shingle emit.
    // The sketch-based alternative for when exact sets are too big is
    // HashFunctions.MinHashUnionAgg (estimate tested in DedupSpec).
    // CONTAINMENT near-duplication (Broder 1997's other resemblance
    // measure): C(A→B) = |A∩B| / |A| over distinct 3-gram sets — the
    // case the Jaccard threshold structurally MISSES: a document
    // embedded whole inside a larger aggregator page has containment
    // ≈ 1.0 but Jaccard ≈ |A|/|B|, far below any near-dup threshold
    // (and MinHash-LSH estimates Jaccard, so the band index can't
    // recall it either). Reported: every ordered pair with
    // containment-of-the-smaller ≥ 0.80 alongside its Jaccard, so the
    // delta column IS the blind spot measured. Fixture (the q178
    // cross-reference discipline): every doc_id % 83 = 2 doc appends
    // the FULL text of partner (doc_id·7+3) % 400 — containment 1.0,
    // Jaccard pinned low by the host's own mass. All statistics live
    // over the df ≤ 64 gram universe (declared — the q124/q166 df-cap
    // discipline that keeps the pair join's per-gram fan-out bounded;
    // a boilerplate gram shared by thousands of docs carries no
    // containment evidence). Gates are integer cross-multiplications;
    // ratios surface as half-up bp. Plan at 100 TB: one distinct-gram
    // shuffle, a df-capped self-join (≤ 64²-bounded fan-out per gram),
    // and a pair-keyed partial agg — q34's shape at doc grain.
    "q199_containment_dup" -> QueryDef(
      (s, dir) => {
        containmentPairs(
          table(s, dir, "documents").select(col("doc_id"), col("text")))
          .select(col("da"), col("db"), col("na"), col("nb"),
            col("shared"),
            expr("(20000 * shared + m) div (2 * m)").as("containment_bp"),
            expr("(20000 * shared + (na + nb - shared)) div " +
              "(2 * (na + nb - shared))").as("jaccard_bp"))
          .orderBy("da", "db")
      },
      Some("""WITH d0 AS (SELECT doc_id, text FROM documents),
              agg0 AS (SELECT doc_id, (doc_id * 7 + 3) % 400 AS pid, text
                       FROM d0 WHERE doc_id % 83 = 2),
              fixed AS (
                SELECT a.doc_id, CASE WHEN p.text IS NOT NULL
                    THEN a.text || ' ' || p.text ELSE a.text END AS text
                FROM agg0 a LEFT JOIN d0 p ON p.doc_id = a.pid
                UNION ALL
                SELECT doc_id, text FROM d0 WHERE doc_id % 83 <> 2),
              sh AS (SELECT DISTINCT doc_id, UNNEST(list_distinct(
                  [array_to_string(t[i:i+2], ' ')
                   for i in range(1, len(t)-1)])) AS g
                FROM (SELECT doc_id,
                    list_filter(string_split_regex(text, '\s+'),
                      x -> x <> '') AS t
                  FROM fixed) z WHERE len(t) >= 3),
              keep AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 64),
              capped AS (SELECT doc_id, g FROM sh
                         WHERE g IN (SELECT g FROM keep)),
              sizes AS (SELECT doc_id, COUNT(*) AS n
                        FROM capped GROUP BY 1),
              shared AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  COUNT(*) AS shared
                FROM capped a JOIN capped b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
              SELECT da, db, x.n AS na, y.n AS nb, shared,
                CAST((20000 * shared + LEAST(x.n, y.n)) //
                  (2 * LEAST(x.n, y.n)) AS BIGINT) AS containment_bp,
                CAST((20000 * shared + (x.n + y.n - shared)) //
                  (2 * (x.n + y.n - shared)) AS BIGINT) AS jaccard_bp
              FROM shared
              JOIN sizes x ON x.doc_id = da
              JOIN sizes y ON y.doc_id = db
              WHERE shared * 5 >= LEAST(x.n, y.n) * 4
              ORDER BY da, db""")),

    "q34_source_jaccard" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        // feeds the size agg and both join sides — shingle once
        val sh = table(s, dir, "documents")
          .select(col("source"), explode(expr("graft_shingles(text, 3)")).as("sh"))
          .distinct()
          .managedPersist
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val common = sh.select(col("source").as("sa"), col("sh"))
          .join(sh.select(col("source").as("sb"), col("sh")), Seq("sh"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("c"))
        common
          .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
          .select(col("sa"), col("sb"),
            (col("c").cast("double") / (col("na") + col("nb") - col("c")))
              .as("jaccard"))
          .orderBy("sa", "sb")
      },
      Some("""WITH sh AS (SELECT DISTINCT source, UNNEST(list_distinct(
                  [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS s
                FROM (SELECT source,
                    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                  FROM documents) z WHERE len(t) >= 3),
              sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
              common AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
                GROUP BY 1, 2)
              SELECT sa, sb,
                CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
              FROM common
              JOIN sizes x ON x.source = sa
              JOIN sizes y ON y.source = sb
              ORDER BY sa, sb""")),

    // Edit-distance verification of near-dup candidates: the LSH bucket
    // join proposes pairs (exactly as q25), exact Jaccard ≥ 0.8 gates
    // them, and levenshtein (identical integer DP in both engines)
    // quantifies the character-level damage. Edit distance is O(len²)
    // per pair — running it ONLY on LSH survivors is the point; the
    // oracle brute-forces the same pair set.
    "q41_neardup_editdist" -> QueryDef(
      (s, dir) => {
        val texts = table(s, dir, "documents").select(col("doc_id"), col("text"))
        neardupPairs(s, dir)
          .join(texts.select(col("doc_id").as("da"), col("text").as("ta")), "da")
          .join(texts.select(col("doc_id").as("db"), col("text").as("tb")), "db")
          .select(col("da"), col("db"),
            levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
          .orderBy("da", "db")
      },
      Some(s"""WITH toks AS (SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id, text,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              ${cappedGroupSql("")},
              p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  a.text AS ta, b.text AS tb,
                  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
              SELECT da, db, CAST(levenshtein(ta, tb) AS BIGINT) AS edit_dist
              FROM p
              JOIN ann za ON za.doc_id = p.da
              JOIN ann zb ON zb.doc_id = p.db
              WHERE j >= 0.8
                AND (za.n <= $BandOccupancyCap OR p.da = za.hub)
                AND (zb.n <= $BandOccupancyCap OR p.db = zb.hub
                     OR p.da = zb.hub)
              ORDER BY da, db""")),

    // SimHash near-dup: 64-bit fingerprints, 4×16-bit band buckets —
    // exhaustive for Hamming ≤ 3 by pigeonhole (banding equals brute
    // force: proved in DedupSpec). The per-token hash is md5-derived
    // (SimHashMd5) so the oracle reproduces every bit in SQL; the
    // banding itself is unverifiable in SQL, which is fine — the oracle
    // states the brute-force answer and the banded plan must equal it.
    "q26_neardup_simhash" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        val fp = table(s, dir, "documents")
          // token-less docs are excluded (the oracle's UNNEST drops them;
          // an all-zero fingerprint would otherwise pair empty docs)
          .filter(col("text").rlike("\\S"))
          .select(col("doc_id"),
            expr("graft_simhash_md5(filter(split(text, '\\\\s+'), t -> t != ''))")
              .as("fp"))
        val bandCols = (0 until 4).map { b =>
          struct(lit(b).as("b"),
            shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("v"))
        }
        val banded = fp.select(col("doc_id"), col("fp"),
          explode(array(bandCols: _*)).as("band"))
        banded.select(col("doc_id").as("da"), col("fp").as("fpa"), col("band"))
          .join(banded.select(col("doc_id").as("db"), col("fp").as("fpb"),
            col("band")), Seq("band"))
          .filter(col("da") < col("db"))
          .dropDuplicates("da", "db")
          .withColumn("hamming",
            bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("long"))
          .filter(col("hamming") <= 3)
          .select("da", "db", "hamming")
          .orderBy("da", "db")
      },
      // brute-force md5-bit simhash: bit j (LSB) of a token's hash is
      // bit j%4 of hex digit 16 - j/4 of md5(token)
      Some("""WITH toks AS (SELECT doc_id, UNNEST(list_filter(
                  string_split_regex(text, '\s+'), x -> x <> '')) AS tok
                FROM documents),
              bitsum AS (SELECT doc_id, r.j,
                  SUM(CASE WHEN
                    ((strpos('0123456789abcdef',
                        substring(md5(tok), CAST(16 - r.j // 4 AS INT), 1)) - 1)
                      >> (r.j % 4)) & 1 = 1
                    THEN 1 ELSE -1 END) AS s
                FROM toks CROSS JOIN range(0, 64) AS r(j)
                GROUP BY doc_id, r.j),
              bits AS (SELECT doc_id, j,
                  CASE WHEN s > 0 THEN 1 ELSE 0 END AS bit
                FROM bitsum),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
                FROM bits a JOIN bits b ON a.j = b.j AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
              SELECT da, db, CAST(h AS BIGINT) AS hamming
              FROM p WHERE h <= 3 ORDER BY da, db""")),

    // Duplicate-cluster formation: connected components over the
    // verified near-dup pair graph (the step a training pipeline runs
    // after pair detection — keep one survivor per component). Labels
    // propagate by iterative hash-min: label(v) ← min(label(v),
    // min(label(neighbor))) until fixpoint, i.e. the standard
    // min-label-propagation / small-star style CC that converges in
    // O(component diameter) rounds — near-dup clusters are shallow
    // (chains of revisions), so a handful of rounds suffice. Every round
    // is one shuffle of the skinny (vertex, label) frame joined against
    // the edge list; nothing is ever collected to the driver, and the
    // fixpoint test is a scalar aggregate (label sum is monotonically
    // decreasing, so equal sums ⇒ converged).
    "q45_dup_clusters" -> QueryDef(
      (s, dir) => ccLabels(s, dir)
        .groupBy("lbl").agg(count(lit(1)).as("csize"))
        .select(col("lbl").as("cluster_id"), col("csize"))
        .orderBy("cluster_id"),
      // transitive closure via recursive CTE over the same verified pairs
      Some("""WITH RECURSIVE toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              edges AS (SELECT da AS a, db AS b FROM p
                        UNION SELECT db, da FROM p),
              reach AS (SELECT a, a AS b
                          FROM (SELECT DISTINCT a FROM edges) n
                        UNION
                        SELECT r.a, e.b
                          FROM reach r JOIN edges e ON r.b = e.a),
              labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                         FROM reach GROUP BY a)
              SELECT cluster_id, COUNT(*) AS csize FROM labels
              GROUP BY cluster_id ORDER BY cluster_id""")),

    // End-to-end dedup with canonical survivors: the full pipeline a
    // training corpus runs — LSH candidates → exact-Jaccard verify →
    // connected components → keep the min-doc_id survivor per cluster,
    // drop the rest. Removal is a broadcast-able anti-join of the
    // skinny non-canonical vertex list against the corpus; per-language
    // before/after counts verify the survivorship arithmetic.
    "q83_dedup_survivors" -> QueryDef(
      (s, dir) => {
        val removed = ccLabels(s, dir)
          .filter(col("v") =!= col("lbl"))
          .select(col("v").as("doc_id"))
        table(s, dir, "documents")
          .join(removed, Seq("doc_id"), "left_anti")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_survivors"),
            min("doc_id").as("min_id"))
          .join(table(s, dir, "documents").groupBy("lang")
            .agg(count(lit(1)).as("n_docs")), "lang")
          .select(col("lang"), col("n_docs"), col("n_survivors"),
            (col("n_docs") - col("n_survivors")).as("n_removed"),
            col("min_id"))
          .orderBy("lang")
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              edges AS (SELECT da AS a, db AS b FROM p
                        UNION SELECT db, da FROM p),
              reach AS (SELECT a, a AS b
                          FROM (SELECT DISTINCT a FROM edges) n
                        UNION
                        SELECT r.a, e.b
                          FROM reach r JOIN edges e ON r.b = e.a),
              labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                         FROM reach GROUP BY a),
              removed AS (SELECT doc_id FROM labels
                          WHERE doc_id <> cluster_id),
              surv AS (SELECT * FROM documents
                       WHERE doc_id NOT IN (SELECT doc_id FROM removed)),
              t AS (SELECT lang, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1)
              SELECT s2.lang, t.n_docs, s2.n_survivors,
                t.n_docs - s2.n_survivors AS n_removed, s2.min_id
              FROM (SELECT lang, COUNT(*) AS n_survivors,
                      MIN(doc_id) AS min_id FROM surv GROUP BY 1) s2
              JOIN t ON s2.lang = t.lang ORDER BY s2.lang""")),

    // LSH recall contract (q57's pattern for the dedup sketch): exact
    // near-dup pairs come from a shingle-inverted-index join (exact —
    // J ≥ 0.8 pairs must share a shingle), LSH candidates from the
    // banded signatures; the output asserts the banding recovered
    // ≥ 99.9 % of the exact pairs. The oracle can't reproduce FNV
    // minhash bands, so it states the contract (recall_ok = 1). The
    // floor (not n_hit = n_exact) keeps the contract honest to the
    // sketch's probabilistic nature: a J = 0.8 pair misses all 32
    // bands with p ≈ 5e-8, so at a large enough SF an occasional miss
    // is expected and must not fail the compare, while a real banding
    // regression (which drops pairs wholesale) still does. n_hit
    // itself is therefore NOT an output column — only the exact count
    // and the contract bit are hashed.
    "q90_lsh_recall" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        val sh = shingled(s, dir)
          .managedPersist
        // exact pairs: inverted index on shingles → candidate pairs
        // sharing ≥1 shingle → exact-Jaccard filter (no LSH involved)
        val inv = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val shared = inv.select(col("doc_id").as("da"), col("g"))
          .join(inv.select(col("doc_id").as("db"), col("g")), Seq("g"))
          .filter(col("da") < col("db"))
          .select("da", "db")
          .distinct()
        val withSets = shared
          .join(sh.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
          .join(sh.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
        val inter = size(array_intersect(col("sha"), col("shb")))
        val union = size(col("sha")) + size(col("shb")) - inter
        val exact = withSets
          .filter(inter.cast("double") / union >= MinJaccard)
          .select("da", "db")
          .managedPersist
        // LSH candidates from the shared banding definition
        val cand = lshCandidatePairs(sh)
        val hit = exact.join(cand, Seq("da", "db"), "left_semi")
        // n_missed_over_floor: misses BEYOND the tolerated 0.1 % —
        // deterministically 0 while the floor holds (chance misses
        // inside the floor can't flake the hash), but a real banding
        // regression surfaces its MAGNITUDE in the compare diff, not
        // just a flipped contract bit
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact"),
            (col("n_hit") >= ceil(col("n_exact").cast("double") * 0.999))
              .cast("long").as("recall_ok"),
            greatest(lit(0L),
              ceil(col("n_exact").cast("double") * 0.999).cast("long")
                - col("n_hit")).as("n_missed_over_floor"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8)
              SELECT COUNT(*) AS n_exact,
                CAST(1 AS BIGINT) AS recall_ok,
                CAST(0 AS BIGINT) AS n_missed_over_floor FROM p""")),

    // Duplicate-rate by source: per-source docs vs distinct texts and
    // the integer-exact dup rate — the per-provenance contamination
    // metric that decides which upstream feed needs attention. Two
    // count aggregations, both with map-side partials.
    "q94_dup_rate_by_source" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct"),
          round((count(lit(1)) - countDistinct(col("text")))
            .cast("double") / count(lit(1)), 4).as("dup_rate"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs,
                COUNT(DISTINCT text) AS n_distinct,
                ROUND(CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE) /
                  COUNT(*), 4) AS dup_rate
              FROM documents GROUP BY 1 ORDER BY source""")),

    // Benchmark decontamination: corpus documents sharing ≥ 5 3-gram
    // shingles with any "benchmark" document (every 50th doc stands in
    // for the eval set) are flagged — the overlap scan every training
    // corpus runs before release. The shingle-keyed equi-join shuffles
    // on the gram (never all-pairs); with a real fixed-size eval set
    // the bench side broadcasts by stats, and the corpus side streams
    // map-only through explode + join.
    "q96_decontamination" -> QueryDef(
      (s, dir) => {
        // sh feeds both join sides — persist so shingling runs once
        val sh = shingled(s, dir)
          .managedPersist
        val bench = sh.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
        val corpus = sh.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        // no broadcast hint: a REAL eval set is a fixed small table the
        // optimizer broadcasts on its own; this stand-in is a corpus
        // fraction, and forcing it to the driver is unbounded at scale
        val flagged = corpus.join(bench, "g")
          .groupBy("doc_id", "bench_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 5)
          .select("doc_id").distinct()
        table(s, dir, "documents")
          .filter(col("doc_id") % 50 =!= 0)
          .join(flagged.withColumn("contaminated", lit(1L)),
            Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("contaminated"), lit(0L)))
              .as("n_contaminated"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              bg AS (SELECT doc_id AS bench_id, UNNEST(s) AS g
                     FROM sh WHERE doc_id % 50 = 0),
              cg AS (SELECT doc_id, UNNEST(s) AS g
                     FROM sh WHERE doc_id % 50 <> 0),
              fl AS (SELECT DISTINCT doc_id FROM (
                  SELECT cg.doc_id, bg.bench_id, COUNT(*) AS n_shared
                  FROM cg JOIN bg USING (g) GROUP BY 1, 2
                  HAVING COUNT(*) >= 5) z)
              SELECT d.lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated
              FROM documents d LEFT JOIN fl ON d.doc_id = fl.doc_id
              WHERE d.doc_id % 50 <> 0
              GROUP BY 1 ORDER BY d.lang""")),

    // Sketch-estimated source Jaccard — q34's answer recomputed from
    // group-level MinHash sketches instead of exact shingle sets: each
    // doc's 128-slot signature union-aggregates per source through
    // [[HashFunctions.MinHashUnionAgg]] (elementwise min — fixed-size
    // mergeable state, ONE partial-aggregating shuffle), and estimated
    // Jaccard between two sources is the fraction of equal slots. This
    // is the q34-at-scale path: exact source sets are O(corpus shingle
    // volume) per group, the sketch is 1 KiB per group forever. The
    // contract joins the estimate against q34's exact Jaccard and
    // asserts every pair sits within 3σ = 3/√128 ≈ 0.27 — both sides
    // are fully deterministic (FNV minhash, commutative min agg, exact
    // int-ratio Jaccard), so the bit can't flake. `est` itself is NOT
    // an output column (it would pin the oracle to FNV internals);
    // only the exact Jaccard and the contract bit are hashed.
    "q99_sketch_jaccard" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        import s.implicits._
        // no upfront repartition: the exact side re-keys on `sh` and the
        // sketch side on `source` anyway, so a doc_id shuffle here is a
        // pure extra exchange of the widest frame in the query
        val docs = table(s, dir, "documents")
        // exact side: q34's shingle-set Jaccard, same plan shape
        val sh = docs
          .select(col("source"), explode(expr("graft_shingles(text, 3)")).as("sh"))
          .distinct()
          .managedPersist
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val exact = sh.select(col("source").as("sa"), col("sh"))
          .join(sh.select(col("source").as("sb"), col("sh")), Seq("sh"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("c"))
          .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
          .select(col("sa"), col("sb"),
            (col("c").cast("double") / (col("na") + col("nb") - col("c")))
              .as("jaccard"))
        // sketch side: row signatures → per-source union sketch
        val usig = docs
          .select(col("source"), expr("graft_shingles(text, 3)").as("sh0"))
          .filter(size(col("sh0")) > 0)
          .select(col("source"), expr("graft_minhash(sh0)").as("sig"))
          .as[(String, Array[Long])]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(HashFunctions.MinHashUnionAgg.toColumn.name("usig"))
          .toDF("source", "usig")
        val est = aggregate(
          zip_with(col("ua"), col("ub"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)
          .cast("double") / HashFunctions.MinHashK
        val tol = 3.0 / math.sqrt(HashFunctions.MinHashK.toDouble)
        exact
          .join(usig.select(col("source").as("sa"), col("usig").as("ua")), "sa")
          .join(usig.select(col("source").as("sb"), col("usig").as("ub")), "sb")
          .select(col("sa"), col("sb"), col("jaccard"),
            (abs(est - col("jaccard")) <= tol).cast("long").as("est_ok"))
          .orderBy("sa", "sb")
      },
      Some("""WITH sh AS (SELECT DISTINCT source, UNNEST(list_distinct(
                  [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS s
                FROM (SELECT source,
                    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                  FROM documents) z WHERE len(t) >= 3),
              sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
              common AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
                GROUP BY 1, 2)
              SELECT sa, sb,
                CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard,
                CAST(1 AS BIGINT) AS est_ok
              FROM common
              JOIN sizes x ON x.source = sa
              JOIN sizes y ON y.source = sb
              ORDER BY sa, sb""")),

    // Bloom-filter decontamination — q96-at-scale. The shingle-keyed
    // equi-join (q96) shuffles the ENTIRE corpus gram stream on the
    // gram; at 100 TB that is the dominant shuffle of a release run.
    // But an eval set is a fixed small input, so its gram set fits a
    // ~1 MiB bloom filter forever: build it with Spark's own
    // BloomFilterAggregate (one partial-aggregating pass over bench
    // grams; bit-OR merge is commutative+idempotent → deterministic),
    // ship it to every executor as a literal, and the corpus side
    // becomes a MAP-ONLY membership probe (codegen'd
    // BloomFilterMightContain) + one per-doc count — the cross-corpus
    // gram shuffle disappears. Flag rule: a corpus doc is contaminated
    // when ≥ 5 of its distinct 3-gram shingles hit the eval gram set
    // (the union-set variant of q96's per-bench-doc rule — the classic
    // n-gram-overlap decontamination test).
    //
    // Contract (q98/q99 style): the query runs the exact union-set
    // join alongside the bloom path and emits per-lang
    //   bloom_no_miss — every exactly-flagged doc is bloom-flagged
    //     (structural: blooms have NO false negatives; anything else
    //     is a bug, so the oracle pins 1), and
    //   bloom_fp_ok — spurious bloom flags ≤ max(2, n_docs/50): a doc
    //     is falsely flagged only when ≥ 5 *distinct* grams all
    //     false-positive (p ≈ fpp⁵ at ~1e-9 per doc), so the 2 % slack
    //     is orders of magnitude above the expectation.
    // Only exact counts and the two contract bits are hashed — bloom
    // hit counts never appear in output, so the oracle is not pinned
    // to Spark's bloom internals.
    "q101_bloom_decontamination" -> QueryDef(
      (s, dir) => {
        HashFunctions.register(s)
        // sh feeds the bench build, the exact side, and the bloom
        // probe side — shingle once
        val sh = shingled(s, dir)
          .managedPersist
        val benchG = sh.filter(col("doc_id") % 50 === 0)
          .select(explode(col("sh")).as("g")).distinct()
        // one aggregation job → serialized filter on the driver
        // ([[gramBloom]]: ~1 MiB regardless of corpus size — the bloom
        // is sized by the EVAL set, which is fixed). Scale path:
        // map-only probe + ONE skinny per-doc count ([[bloomHitDocs]];
        // empty eval set ⇒ nothing flagged, matching the exact side).
        val corpusG = sh.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        val bloomFlag = bloomHitDocs(corpusG, gramBloom(benchG), minHits = 5)
          .select(col("doc_id"), lit(1L).as("bl"))
        // exact baseline: same rule via the gram equi-join (grams are
        // distinct per doc and benchG is distinct, so count = distinct
        // shared grams)
        val exactFlag = corpusG.join(benchG, "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
          .filter(col("n_hit") >= 5)
          .select(col("doc_id"), lit(1L).as("ex"))
        table(s, dir, "documents")
          .filter(col("doc_id") % 50 =!= 0)
          .join(exactFlag, Seq("doc_id"), "left")
          .join(bloomFlag, Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("ex"), lit(0L))).as("n_flagged"),
            min(when(col("ex") === 1L && col("bl").isNull, 0L)
              .otherwise(1L)).as("bloom_no_miss"),
            ((sum(coalesce(col("bl"), lit(0L)))
                - sum(coalesce(col("ex"), lit(0L))))
              <= greatest(lit(2L), count(lit(1)).cast("long") / 50L))
              .cast("long").as("bloom_fp_ok"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              bg AS (SELECT DISTINCT UNNEST(s) AS g
                     FROM sh WHERE doc_id % 50 = 0),
              cg AS (SELECT doc_id, UNNEST(s) AS g
                     FROM sh WHERE doc_id % 50 <> 0),
              fl AS (SELECT doc_id FROM cg JOIN bg USING (g)
                     GROUP BY doc_id HAVING COUNT(*) >= 5)
              SELECT d.lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_flagged,
                CAST(1 AS BIGINT) AS bloom_no_miss,
                CAST(1 AS BIGINT) AS bloom_fp_ok
              FROM documents d LEFT JOIN fl ON d.doc_id = fl.doc_id
              WHERE d.doc_id % 50 <> 0
              GROUP BY 1 ORDER BY d.lang""")),

    // Cross-document repeated n-grams — the corpus-level duplicated-text
    // measure (substring-granularity cousin of whole-doc dedup, in the
    // spirit of train-set "deduplicate repeated n-grams" analyses): a
    // 3-gram shingle is *duplicated* when it appears in ≥ 2 distinct
    // documents; per document we count how many of its distinct grams
    // are duplicated, and per language report total/duplicated gram
    // volume plus the count of "heavy" docs (≥ half their grams shared
    // with some other doc — copy-paste boilerplate candidates).
    //
    // Plan at 100 TB: explode is map-only; gram doc-frequency is ONE
    // count shuffle (grams are already distinct per doc, so COUNT(1)
    // per gram IS the doc frequency — no count-distinct expansion);
    // flagging joins the skinny (gram → dup bit) frame back on the
    // gram key; per-doc and per-lang aggs both partial-aggregate.
    // All output columns are integers — nothing float-ordering-
    // sensitive can flake the oracle hash.
    "q102_repeated_ngrams" -> QueryDef(
      (s, dir) => {
        // g feeds both the docfreq agg and the flag join — shingle once
        val g = shingled(s, dir)
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .managedPersist
        val dup = g.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
          .select(col("g"), lit(1L).as("dup"))
        val perDoc = g.join(dup, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
        table(s, dir, "documents")
          .join(perDoc, Seq("doc_id"), "left") // < 3-token docs: no grams
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_grams"), lit(0L))).as("total_grams"),
            sum(coalesce(col("n_dup"), lit(0L))).as("dup_grams"),
            sum(when(col("n_dup") * 2 >= col("n_grams"), 1L)
              .otherwise(0L)).as("n_heavy"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              g AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
              dup AS (SELECT g, CAST(1 AS BIGINT) AS dup FROM g
                      GROUP BY g HAVING COUNT(*) >= 2),
              pd AS (SELECT doc_id, COUNT(*) AS n_grams,
                       SUM(COALESCE(dup.dup, 0)) AS n_dup
                     FROM g LEFT JOIN dup USING (g) GROUP BY doc_id)
              SELECT d.lang, COUNT(*) AS n_docs,
                CAST(SUM(COALESCE(pd.n_grams, 0)) AS BIGINT) AS total_grams,
                CAST(SUM(COALESCE(pd.n_dup, 0)) AS BIGINT) AS dup_grams,
                CAST(SUM(CASE WHEN pd.n_dup * 2 >= pd.n_grams
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
              FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
              GROUP BY 1 ORDER BY d.lang""")),

    // Train→test split-leakage scan — q46's hash split crossed with
    // q96's overlap rule: a TEST-split document sharing ≥ 5 distinct
    // 3-gram shingles with ANY train-split document is leaked, and a
    // held-out eval on it overstates the model. This is the in-corpus
    // counterpart of benchmark decontamination (q96/q101), run before
    // any internal eval is trusted.
    //
    // Plan at 100 TB: the train gram set is a partial-aggregated
    // DISTINCT (never doc pairs); leakage is a gram-keyed equi-join of
    // the test gram stream against it plus ONE skinny per-doc count —
    // the same never-all-pairs shape as q96. The shingle table is
    // built once and persisted across its two consumers. All output
    // columns are integers.
    "q108_split_leakage" -> QueryDef(
      (s, dir) => {
        val hex = substring(md5(col("doc_id").cast("string")), 1, 1)
        val split = when(hex.isin("c", "d"), "val")
          .when(hex.isin("e", "f"), "test")
          .otherwise("train")
        val docs = table(s, dir, "documents")
          .withColumn("split", split)
        val g = shingled(s, dir)
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .join(docs.select("doc_id", "split"), "doc_id")
          .managedPersist
        val trainG = g.filter(col("split") === "train")
          .select("g").distinct()
        val leaked = g.filter(col("split") === "test")
          .join(trainG, "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
          .filter(col("n_hit") >= 5)
          .select(col("doc_id"), lit(1L).as("lk"))
        docs.filter(col("split") === "test")
          .join(leaked, Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_test"),
            sum(coalesce(col("lk"), lit(0L))).as("n_leaked"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              sp AS (SELECT doc_id, CASE
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('c', 'd') THEN 'val'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('e', 'f') THEN 'test'
                  ELSE 'train' END AS split
                FROM documents),
              g AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
              tg AS (SELECT DISTINCT g.g FROM g JOIN sp USING (doc_id)
                     WHERE sp.split = 'train'),
              lk AS (SELECT g.doc_id FROM g
                     JOIN sp USING (doc_id)
                     JOIN tg ON g.g = tg.g
                     WHERE sp.split = 'test'
                     GROUP BY g.doc_id HAVING COUNT(*) >= 5)
              SELECT d.lang, COUNT(*) AS n_test,
                CAST(SUM(CASE WHEN lk.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_leaked
              FROM documents d
              JOIN sp ON d.doc_id = sp.doc_id
              LEFT JOIN lk ON d.doc_id = lk.doc_id
              WHERE sp.split = 'test'
              GROUP BY 1 ORDER BY d.lang""")),

    // Incremental-ingest gram novelty — the content-drift measure an
    // incremental pipeline reads before deciding a new batch is worth
    // training on: of the new batch's distinct grams (per language),
    // how many were never seen in the base corpus (even/odd doc_id
    // stand in for base/new). Plan at 100 TB: two partial-aggregated
    // DISTINCT gram frames and ONE gram-keyed LEFT ANTI join — the
    // novelty probe never forms doc pairs and never ships payloads;
    // at scale the base side would be the persisted gram index of the
    // previous release, making this join the only moving part.
    "q110_gram_novelty" -> QueryDef(
      (s, dir) => {
        val g = shingled(s, dir)
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .join(table(s, dir, "documents").select("doc_id", "lang"),
            "doc_id")
          .managedPersist
        val baseG = g.filter(col("doc_id") % 2 === 0)
          .select("g").distinct()
        val newG = g.filter(col("doc_id") % 2 === 1)
          .select("lang", "g").distinct()
        val novel = newG.join(baseG, Seq("g"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("n_novel"))
        newG.groupBy("lang").agg(count(lit(1)).as("n_new_grams"))
          .join(novel, Seq("lang"), "left")
          .select(col("lang"), col("n_new_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              g AS (SELECT s.doc_id, d.lang, UNNEST(s.s) AS g
                    FROM sh s JOIN documents d ON s.doc_id = d.doc_id),
              bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
              ng AS (SELECT DISTINCT lang, g FROM g WHERE doc_id % 2 = 1),
              nv AS (SELECT lang, COUNT(*) AS n_novel FROM ng
                     WHERE g NOT IN (SELECT g FROM bg) GROUP BY lang)
              SELECT ng.lang, COUNT(*) AS n_new_grams,
                CAST(COALESCE(MIN(nv.n_novel), 0) AS BIGINT) AS n_novel
              FROM ng LEFT JOIN nv ON ng.lang = nv.lang
              GROUP BY 1 ORDER BY ng.lang""")),

    // Q189: gram-novelty saturation curve - the diminishing-returns
    // signal of CONTINUED data collection: with ingest order declared
    // as doc_id order, every distinct 3-gram is attributed to the
    // ingest decile that saw it FIRST (min doc_id per gram - one gram
    // shuffle), and each decile reports how many new grams its docs
    // contributed vs how many gram instances it carried - the marginal
    // novelty rate a collection owner reads to decide whether the next
    // crawl tranche is worth its cost (q110 answers "is THIS batch
    // novel"; this draws the whole curve). Gram unit = per-doc distinct
    // 3-grams (the same unit the gram index stores). All integer to
    // the two share-first-rounded bp edges. Plan at 100 TB: one
    // min-agg shuffle on the gram key + one decile partial agg over
    // the same persisted shingle frame; deciles come from an integer
    // division against the broadcast max id - no sort, no window over
    // the corpus.
    "q189_novelty_curve" -> QueryDef(
      (s, dir) => {
        val g = shingled(s, dir)
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .managedPersist
        val mx = table(s, dir, "documents")
          .agg(max(col("doc_id")).as("mx"))
        val newPer = g.groupBy("g").agg(min("doc_id").as("fd"))
          .crossJoin(broadcast(mx))
          .groupBy(expr("(fd * 10) div (mx + 1)").as("decile"))
          .agg(count(lit(1)).as("new_grams"))
        val occPer = g.crossJoin(broadcast(mx))
          .groupBy(expr("(doc_id * 10) div (mx + 1)").as("decile"))
          .agg(count(lit(1)).as("gram_tokens"))
        val docsPer = table(s, dir, "documents")
          .crossJoin(broadcast(mx))
          .groupBy(expr("(doc_id * 10) div (mx + 1)").as("decile"))
          .agg(count(lit(1)).as("n_docs"))
        val w = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        docsPer
          .join(occPer, Seq("decile"), "left")
          .join(newPer, Seq("decile"), "left")
          .select(col("decile"), col("n_docs"),
            coalesce(col("gram_tokens"), lit(0L)).as("gram_tokens"),
            coalesce(col("new_grams"), lit(0L)).as("new_grams"))
          .withColumn("cum_new_grams", sum("new_grams").over(w))
          .withColumn("cum_share_bp",
            round((col("cum_new_grams").cast("double") /
              sum("new_grams").over(wAll).cast("double")) * lit(10000.0))
              .cast("long"))
          .withColumn("marginal_novelty_bp",
            when(col("gram_tokens") > 0,
              round((col("new_grams").cast("double") /
                col("gram_tokens").cast("double")) * lit(10000.0))
                .cast("long")).otherwise(lit(0L)))
          .orderBy("decile")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              g AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
              mx AS (SELECT MAX(doc_id) AS mx FROM documents),
              np AS (SELECT (fd * 10) // (mx + 1) AS decile,
                  COUNT(*) AS new_grams
                FROM (SELECT g, MIN(doc_id) AS fd FROM g GROUP BY g), mx
                GROUP BY 1),
              op AS (SELECT (doc_id * 10) // (mx + 1) AS decile,
                  COUNT(*) AS gram_tokens
                FROM g, mx GROUP BY 1),
              dp AS (SELECT (doc_id * 10) // (mx + 1) AS decile,
                  COUNT(*) AS n_docs
                FROM documents, mx GROUP BY 1),
              j AS (SELECT dp.decile, dp.n_docs,
                  CAST(COALESCE(op.gram_tokens, 0) AS BIGINT)
                    AS gram_tokens,
                  CAST(COALESCE(np.new_grams, 0) AS BIGINT) AS new_grams
                FROM dp LEFT JOIN op ON op.decile = dp.decile
                LEFT JOIN np ON np.decile = dp.decile),
              c AS (SELECT decile, n_docs, gram_tokens, new_grams,
                  CAST(SUM(new_grams) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new_grams,
                  CAST(SUM(new_grams) OVER () AS BIGINT) AS tot
                FROM j)
              SELECT CAST(decile AS BIGINT) AS decile, n_docs,
                gram_tokens, new_grams, cum_new_grams,
                CAST(ROUND((CAST(cum_new_grams AS DOUBLE) /
                  CAST(tot AS DOUBLE)) * 10000.0) AS BIGINT)
                  AS cum_share_bp,
                CASE WHEN gram_tokens > 0
                  THEN CAST(ROUND((CAST(new_grams AS DOUBLE) /
                    CAST(gram_tokens AS DOUBLE)) * 10000.0) AS BIGINT)
                  ELSE 0 END AS marginal_novelty_bp
              FROM c ORDER BY decile""")),

    // Incremental near-dup — the nightly-ingest shape of the q25
    // pipeline: dedup a NEW batch (odd doc_id) against the existing
    // BASE corpus (even doc_id) without ever re-pairing base×base.
    // The base side's banded MinHash index ([[bandedOf]] — at scale a
    // persisted table bucketed on `band`) is probed by the batch's
    // bands only, so candidate work is O(|batch| × bands × bucket
    // occupancy), independent of how big the accumulated corpus has
    // grown; exact Jaccard then verifies the survivors exactly as the
    // full pipeline does (one [[verifyCand]] definition for both).
    // Oracle = brute-force exact Jaccard restricted to cross-side
    // pairs, so the banding's recall on the declared ≥ 0.8 margin is
    // hash-asserted here just like q25's.
    "q115_incremental_neardup" -> QueryDef(
      (s, dir) => {
        val sh = shingled(s, dir)
          .managedPersist
        val banded = bandedOf(sh)
        val baseIdx = banded.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id").as("da"), col("band"))
        val batch = banded.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id").as("db"), col("band"))
        val cand = cappedProbeCandidates(baseIdx, batch)
        verifyCand(cand, sh, MinJaccard)
          .select(col("da"), col("db"), round(col("j"), 4).as("jaccard"))
          .orderBy("da", "db")
      },
      Some(crossPairJaccardSql)),

    // The write-ONCE/probe-many form of q115: same semantics, same
    // oracle, but the base side comes from the PERSISTED band index
    // ([[writeBandIndex]] — bucketed band + shingle tables) instead of
    // being rebuilt in-plan. This is the loop a real 100 TB deployment
    // runs nightly: the index write is idempotent per corpus (skipped
    // when the session catalog already holds it), so a bench's warmup
    // pays the one-time build and the timed passes measure exactly
    // what an ingest batch pays — batch shingling, the exchange-free
    // bucketed band join, exact verify of survivors. Hash-matching
    // q115's oracle proves the persisted path cannot drift from the
    // in-plan one (IndexStoreSpec asserts the same at the API level).
    "q116_band_index_probe" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val name = bandStoreFixture(s, dir)
        probeBandIndex(s, name, docs.filter(col("doc_id") % 2 === 1))
          .select(col("da"), col("db"), round(col("j"), 4).as("jaccard"))
          .orderBy("da", "db")
      },
      Some(crossPairJaccardSql)),

    // Compacted-index probe — the maintenance half of the ingest loop:
    // each streaming micro-batch append lays down up to one parquet
    // file per bucket, so a long-lived index accumulates K files per
    // bucket and every probe pays K file opens per bucket task.
    // [[IndexMaintenance.compactBucketed]] rewrites the table to ONE
    // file per bucket under the same bucket/sort spec at the same
    // canonical path. This query gates the op end-to-end: build the
    // band index from a third of the even docs, APPEND the other two
    // thirds in two batches (the fragmentation a nightly loop
    // produces), compact both tables, then probe the odd half — the
    // oracle recomputes the expected near-dup pairs from the raw
    // corpus, so a compaction that loses, corrupts, or re-buckets rows
    // breaks the hash (q116 gates the same probe UNcompacted; matching
    // both proves compaction is invisible to results). CompactionSpec
    // asserts the mechanical half: row multiset preserved, file count
    // down to ≤ buckets, stored-side scan still exchange-free. At
    // 100 TB compaction is one shuffle-by-bucket-key rewrite, linear
    // in the table; the probe after it is q116's plan with build-time
    // file fan-out restored.
    "q172_compacted_index_probe" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "documents"))
        val name = s"graft_q172_$tag"
        if (!s.catalog.tableExists(s"${name}_bands")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q172-$tag")
          writeBandIndex(docs.filter(col("doc_id") % 6 === 0), name,
            path.toString)
          appendToBandIndex(docs.filter(col("doc_id") % 6 === 2), name)
          appendToBandIndex(docs.filter(col("doc_id") % 6 === 4), name)
          IndexMaintenance.compactBucketed(s, s"${name}_bands")
          IndexMaintenance.compactBucketed(s, s"${name}_shingles")
        }
        probeBandIndex(s, name, docs.filter(col("doc_id") % 2 === 1))
          .select(col("da"), col("db"), round(col("j"), 4).as("jaccard"))
          .orderBy("da", "db")
      },
      Some(crossPairJaccardSql)),

    // Contamination SPAN detection — q96/q101 decide WHETHER a document
    // overlaps a benchmark doc (≥ 5 shared distinct grams); this says
    // HOW MUCH, as the longest run of consecutive matched 3-gram
    // positions: a 30-token verbatim quote and 30 scattered common
    // grams both pass q96's count gate, but only the quote is a span —
    // the difference between "delete the document" and "keep it". Span
    // arithmetic is the gaps-and-islands trick: among a (doc, bench)
    // pair's matched gram START positions, pos − row_number() is
    // constant exactly on consecutive runs, and a run of L consecutive
    // 3-gram starts covers L + 2 tokens. Plan at 100 TB: positioned
    // grams are a map-only generator projection (never stored distinct
    // — position matters); the eval side is the tiny fixed benchmark
    // set, so the gram join broadcasts it and the q101 bloom pre-filter
    // drops in unchanged; the islands window partitions on (doc, bench)
    // over MATCHED rows only — bounded by doc length, nothing global.
    // Top-15 is TakeOrderedAndProject.
    "q124_contamination_span" -> QueryDef(
      (s, dir) => {
        val t = table(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
        val g = t.select(col("doc_id"),
            posexplode(transform(sequence(lit(1), size(col("toks")) - 2),
              i => concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2)))))
          .select(col("doc_id"), (col("pos") + 1).as("pos"),
            col("col").as("grm"))
        val bench = g.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("grm")).distinct()
        val m = g.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(bench), "grm")
          .select("doc_id", "bench_id", "pos")
        val w = Window.partitionBy("doc_id", "bench_id").orderBy("pos")
        val spans = m
          .withColumn("grp", col("pos") - row_number().over(w))
          .groupBy("doc_id", "bench_id", "grp")
          .agg(count(lit(1)).as("run"))
        spans.groupBy("doc_id", "bench_id")
          .agg(max(col("run") + 2).as("max_span_tokens"),
            sum("run").as("n_matched_grams"))
          .orderBy(desc("max_span_tokens"), col("doc_id"), col("bench_id"))
          .limit(15)
      },
      Some("""WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              pg AS (SELECT doc_id,
                  UNNEST([array_to_string(toks[i:i+2], ' ')
                          for i in range(1, len(toks) - 1)]) AS grm,
                  UNNEST(range(1, len(toks) - 1)) AS pos
                FROM t WHERE len(toks) >= 3),
              bj AS (SELECT DISTINCT doc_id AS bench_id, grm FROM pg
                     WHERE doc_id % 50 = 0),
              m AS (SELECT pg.doc_id, bj.bench_id, pg.pos
                    FROM pg JOIN bj USING (grm) WHERE pg.doc_id % 50 <> 0),
              i AS (SELECT doc_id, bench_id,
                  pos - ROW_NUMBER() OVER (PARTITION BY doc_id, bench_id
                    ORDER BY pos) AS grp
                FROM m),
              sp AS (SELECT doc_id, bench_id, COUNT(*) AS run
                     FROM i GROUP BY doc_id, bench_id, grp)
              SELECT doc_id, bench_id,
                CAST(MAX(run + 2) AS BIGINT) AS max_span_tokens,
                CAST(SUM(run) AS BIGINT) AS n_matched_grams
              FROM sp GROUP BY 1, 2
              ORDER BY max_span_tokens DESC, doc_id, bench_id LIMIT 15""")),

    // Truncation-duplicate scan — documents that are exact token-
    // boundary PREFIXES of longer documents (a re-crawl cut off by a
    // size limit, a feed that ships the first N paragraphs): exact
    // dedup (q22) can't see them (different hashes) and near-dup (q25)
    // only catches them while the length ratio keeps Jaccard high, so
    // a corpus build that keeps both trains twice on the shared head.
    // A pair is (short, long) with long = short + ' ' + rest, which
    // makes short's token list a prefix of long's — so both share
    // their first-2-token key, and q118's bounded prefix key is a
    // COMPLETE candidate generator (no pair can be missed). Plan at
    // 100 TB: one equi-join on the scalar prefix key + a codegen'd
    // startswith check per candidate — never all-pairs; hot template
    // heads make skewed groups, which is exactly what q118 measures,
    // and a group cap (or salting the one hot key) bounds the worst
    // reducer the same way q111 documents.
    "q125_truncation_dup" -> QueryDef(
      (s, dir) => {
        val d = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("text"),
            array_join(slice(col("toks"), 1, 2), " ").as("pk"),
            length(col("text")).cast("long").as("len"))
        val short = d.select(col("doc_id").as("short_id"),
          col("text").as("st"), col("pk"), col("len").as("short_len"))
        val long = d.select(col("doc_id").as("long_id"),
          col("text").as("lt"), col("pk"), col("len").as("long_len"))
        short.join(long, Seq("pk"))
          .filter(startswith(col("lt"), concat(col("st"), lit(" "))))
          .select("short_id", "long_id", "short_len", "long_len")
          .orderBy("short_id", "long_id")
      },
      Some("""WITH d AS (SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              f AS (SELECT doc_id, text,
                  CAST(LENGTH(text) AS BIGINT) AS len
                FROM d WHERE len(toks) >= 2)
              SELECT a.doc_id AS short_id, b.doc_id AS long_id,
                a.len AS short_len, b.len AS long_len
              FROM f a JOIN f b ON starts_with(b.text, a.text || ' ')
              ORDER BY short_id, long_id""")),

    // Near-dup threshold calibration sweep — before a production run
    // commits to ONE Jaccard threshold, measure what each candidate
    // threshold would do to the corpus: pairs flagged, documents
    // touched, and the dup rate, at 0.80 / 0.85 / 0.90 / 0.95, all
    // from a single LSH + verify pass (the banding is recall-complete
    // down to the q25 base threshold 0.80, so every stricter cut is a
    // pure filter over the same verified pair set — one candidate
    // generation, four read-outs). Threshold tests are integer
    // cross-multiplications (i·den ≥ u·num), never float-vs-float at a
    // boundary, so both engines bucket identically. Plan: the verified
    // pair table is persisted once and read by the pair-count and the
    // touched-docs branches; the threshold explode multiplies PAIRS
    // (already tiny), not the corpus.
    "q142_dup_threshold_sweep" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val sh = shingled(s, dir).managedPersist
        val cand = lshCandidatePairs(sh)
          .join(sh.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
          .join(sh.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
        val inter = size(array_intersect(col("sha"), col("shb"))).cast("long")
        val union = (size(col("sha")) + size(col("shb"))).cast("long") - inter
        val thr = Seq((80L, 4L, 5L), (85L, 17L, 20L),
          (90L, 9L, 10L), (95L, 19L, 20L))
        val byT = cand
          .select(col("da"), col("db"), inter.as("i"), union.as("u"))
          .filter(col("i") * 5 >= col("u") * 4)
          .select(explode(array(thr.map { case (t, num, den) =>
            struct(lit(t).as("t"), lit(num).as("num"), lit(den).as("den"))
          }: _*)).as("th"), col("da"), col("db"), col("i"), col("u"))
          .filter(col("i") * col("th.den") >= col("u") * col("th.num"))
          .select(col("th.t").as("t"), col("da"), col("db"))
          .managedPersist
        val nPairs = byT.groupBy("t").agg(count(lit(1)).as("n_pairs"))
        val nDocs = byT
          .select(col("t"), explode(array(col("da"), col("db"))).as("d"))
          .groupBy("t").agg(countDistinct("d").as("n_dup_docs"))
        thr.map(_._1).toDF("t")
          .join(nPairs, Seq("t"), "left_outer")
          .join(nDocs, Seq("t"), "left_outer")
          .na.fill(0L, Seq("n_pairs", "n_dup_docs"))
          .crossJoin(broadcast(
            table(s, dir, "documents").agg(count(lit(1)).as("n_total"))))
          .select(col("t"), col("n_pairs"), col("n_dup_docs"),
            round(col("n_dup_docs").cast("double") / col("n_total"), 4)
              .as("dup_rate"))
          .orderBy("t")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS t
                FROM documents),
              sh AS (SELECT doc_id, list_distinct(
                  [array_to_string(t[i:i+2], ' ')
                   for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS i,
                  CAST(len(a.s) + len(b.s)
                    - len(list_intersect(a.s, b.s)) AS BIGINT) AS u
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
              f AS (SELECT * FROM p WHERE i * 5 >= u * 4),
              th(t, num, den) AS (VALUES (80, 4, 5), (85, 17, 20),
                (90, 9, 10), (95, 19, 20)),
              j AS (SELECT th.t, f.da, f.db FROM th
                JOIN f ON f.i * th.den >= f.u * th.num),
              np AS (SELECT t, COUNT(*) AS n_pairs FROM j GROUP BY t),
              nd AS (SELECT t, COUNT(DISTINCT d) AS n_dup_docs
                FROM (SELECT t, UNNEST([da, db]) AS d FROM j) GROUP BY t)
              SELECT CAST(th.t AS BIGINT) AS t,
                CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
                CAST(COALESCE(nd.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
                ROUND(CAST(COALESCE(nd.n_dup_docs, 0) AS DOUBLE)
                  / (SELECT COUNT(*) FROM documents), 4) AS dup_rate
              FROM th
              LEFT JOIN np ON np.t = th.t
              LEFT JOIN nd ON nd.t = th.t
              ORDER BY t""")),

    // Source-similarity by unigram DISTRIBUTION — q34 asks "do two
    // sources share shingles?" (set overlap); this asks "do they use
    // the same words at the same rates?" (cosine over term-frequency
    // vectors), the signal that catches a mirror site whose wording
    // matches even when its shingle set drifted. Counts stay integers;
    // the three quadratic sums (Σca·cb, Σca², Σcb²) accumulate as
    // DECIMAL(38,0) — at corpus scale a per-term count reaches ~10¹²
    // and its square 10²⁴, past any BIGINT — then one double
    // conversion, two sqrts, one division, rounded. Plan: the term
    // join is keyed on the token (vocab-bounded frame joined to
    // itself, never the corpus), norms are one more pass over the same
    // persisted tf table.
    "q143_source_unigram_cosine" -> QueryDef(
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tf = table(s, dir, "documents")
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
          .managedPersist
        val norms = tf.groupBy("source")
          .agg(sum((col("c") * col("c")).cast(dec)).as("nsq"))
        tf.select(col("source").as("sa"), col("w"), col("c").as("ca"))
          .join(tf.select(col("source").as("sb"), col("w"),
            col("c").as("cb")), Seq("w"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb")
          .agg(sum((col("ca") * col("cb")).cast(dec)).as("dot"))
          .join(norms.select(col("source").as("sa"),
            col("nsq").as("na")), "sa")
          .join(norms.select(col("source").as("sb"),
            col("nsq").as("nb")), "sb")
          .select(col("sa"), col("sb"),
            round(col("dot").cast("double") /
              (sqrt(col("na").cast("double")) *
                sqrt(col("nb").cast("double"))), 4).as("cosine"))
          .orderBy("sa", "sb")
      },
      Some("""WITH tf AS (SELECT source, w, COUNT(*) AS c
                FROM (SELECT source,
                    UNNEST(list_filter(string_split_regex(text, '\s+'),
                      x -> x <> '')) AS w
                  FROM documents) z
                GROUP BY source, w),
              norms AS (SELECT source,
                  SUM(CAST(c * c AS DECIMAL(38,0))) AS nsq
                FROM tf GROUP BY source),
              dots AS (SELECT a.source AS sa, b.source AS sb,
                  SUM(CAST(a.c * b.c AS DECIMAL(38,0))) AS dot
                FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
                GROUP BY 1, 2)
              SELECT sa, sb,
                ROUND(CAST(dot AS DOUBLE) /
                  (SQRT(CAST(x.nsq AS DOUBLE)) *
                   SQRT(CAST(y.nsq AS DOUBLE))), 4) AS cosine
              FROM dots
              JOIN norms x ON x.source = sa
              JOIN norms y ON y.source = sb
              ORDER BY sa, sb""")),

    // Duplicate-cluster SIZE distribution — q45 lists the clusters;
    // this is the release-dashboard rollup of the same graph: how many
    // clusters of each size, how many documents they hold, with the
    // singleton row (docs in no near-dup pair) completing the census so
    // n_docs sums to the corpus. A corpus whose mass sits in a few
    // giant clusters dedups very differently (one survivor kills
    // thousands) than one with many pairs — this is the shape check
    // run before committing a dedup pass. Plan: the CC labels are the
    // q45 fixpoint (bounded rounds, fail-loud); everything after is
    // two bounded aggregations and one scalar cross-join — the
    // histogram frame is at most max-cluster-size rows.
    "q146_cluster_size_histogram" -> QueryDef(
      (s, dir) => {
        val sizes = ccLabels(s, dir)
          .groupBy("lbl").agg(count(lit(1)).as("csize"))
          .managedPersist
        val hist = sizes.groupBy("csize")
          .agg(count(lit(1)).as("n_clusters"), sum("csize").as("n_docs"))
        val single = table(s, dir, "documents")
          .agg(count(lit(1)).as("n_total"))
          .crossJoin(broadcast(
            sizes.agg(coalesce(sum("csize"), lit(0L)).as("n_clustered"))))
          .select(lit(1L).as("csize"),
            (col("n_total") - col("n_clustered")).as("n_clusters"),
            (col("n_total") - col("n_clustered")).as("n_docs"))
        hist.unionByName(single).orderBy("csize")
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              edges AS (SELECT da AS a, db AS b FROM p
                        UNION SELECT db, da FROM p),
              reach AS (SELECT a, a AS b
                          FROM (SELECT DISTINCT a FROM edges) n
                        UNION
                        SELECT r.a, e.b
                          FROM reach r JOIN edges e ON r.b = e.a),
              labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                         FROM reach GROUP BY a),
              sizes AS (SELECT cluster_id, COUNT(*) AS csize
                        FROM labels GROUP BY 1),
              h AS (SELECT csize, COUNT(*) AS n_clusters,
                  CAST(SUM(csize) AS BIGINT) AS n_docs
                FROM sizes GROUP BY 1)
              SELECT * FROM h
              UNION ALL
              SELECT CAST(1 AS BIGINT) AS csize,
                (SELECT COUNT(*) FROM documents)
                  - CAST(COALESCE((SELECT SUM(csize) FROM sizes), 0)
                    AS BIGINT) AS n_clusters,
                (SELECT COUNT(*) FROM documents)
                  - CAST(COALESCE((SELECT SUM(csize) FROM sizes), 0)
                    AS BIGINT) AS n_docs
              ORDER BY csize""")),

    // Cross-source copy matrix — the near-dup pair graph rolled up by
    // SOURCE pair: q34 asks "do two sources share shingle sets?"
    // (set-level), q143 "do they word things the same?" (distribution-
    // level); this answers "how many actual near-duplicate DOCUMENT
    // pairs link them?" — the mirror-site / syndication report a crawl
    // operator reads before blocklisting a domain. Unordered source
    // pair (least/greatest), so a→b and b→a copies accumulate in one
    // cell; the diagonal (s1 = s2) is within-source duplication. Plan:
    // the pair frame is the q25 LSH+verify output (tiny vs the
    // corpus); two skinny broadcast-joinable (doc_id → source) lookups
    // and ONE bounded-key (≤ sources²) aggregation — the corpus is
    // never re-read beyond the shared shingle scan.
    "q147_source_copy_matrix" -> QueryDef(
      (s, dir) => {
        val src = table(s, dir, "documents").select(col("doc_id"), col("source"))
        neardupPairs(s, dir)
          .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
          .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
          .select(least(col("sa"), col("sb")).as("s1"),
            greatest(col("sa"), col("sb")).as("s2"),
            col("da"), col("db"))
          .groupBy("s1", "s2")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("da")).as("n_da"),
            countDistinct(col("db")).as("n_db"))
          .orderBy("s1", "s2")
      },
      Some("""WITH toks AS (SELECT doc_id, source,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS t
                FROM documents),
              sh AS (SELECT doc_id, source,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  a.source AS sa, b.source AS sb
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8)
              SELECT LEAST(sa, sb) AS s1, GREATEST(sa, sb) AS s2,
                COUNT(*) AS n_pairs,
                COUNT(DISTINCT da) AS n_da,
                COUNT(DISTINCT db) AS n_db
              FROM p GROUP BY 1, 2 ORDER BY s1, s2""")),

    // Suffix-duplicate scan — q125's mirror: documents that are exact
    // token-boundary SUFFIXES of longer documents (shared boilerplate
    // footer, a feed that re-ships the closing paragraphs, a page
    // whose header was stripped in one crawl but not the other). Same
    // completeness argument flipped to the tail: long = rest + ' ' +
    // short means short's token list is a suffix of long's, so both
    // share their LAST-2-token key — a bounded-domain complete
    // candidate generator; the verifier is one codegen'd endswith per
    // candidate. Same skew caveat as q125 (hot footer keys are q118's
    // measurable case, boundable by group cap/salting per q111).
    "q148_suffix_dup" -> QueryDef(
      (s, dir) => {
        val d = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("text"),
            array_join(slice(col("toks"), -2, 2), " ").as("sk"),
            length(col("text")).cast("long").as("len"))
        val short = d.select(col("doc_id").as("short_id"),
          col("text").as("st"), col("sk"), col("len").as("short_len"))
        val long = d.select(col("doc_id").as("long_id"),
          col("text").as("lt"), col("sk"), col("len").as("long_len"))
        short.join(long, Seq("sk"))
          .filter(endswith(col("lt"), concat(lit(" "), col("st"))))
          .select("short_id", "long_id", "short_len", "long_len")
          .orderBy("short_id", "long_id")
      },
      Some("""WITH d AS (SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              f AS (SELECT doc_id, text,
                  CAST(LENGTH(text) AS BIGINT) AS len
                FROM d WHERE len(toks) >= 2)
              SELECT a.doc_id AS short_id, b.doc_id AS long_id,
                a.len AS short_len, b.len AS long_len
              FROM f a JOIN f b ON ends_with(b.text, ' ' || a.text)
              ORDER BY short_id, long_id""")),

    // Fuzzy decontamination — q96 flags docs sharing ≥ 5 exact shingles
    // with an eval doc; this is the NEAR-DUP form (the Llama-style
    // fuzzy rule): corpus docs whose exact Jaccard against ANY eval
    // stand-in reaches 0.5 — catching lightly-edited eval copies whose
    // shared-gram count stays under an absolute threshold because the
    // doc is short. Candidates come from the 64-band × 2-row MinHash
    // layout ([[bandedLayout]]): at τ=0.5 the catch probability per
    // band is J² = 0.25, so a true pair survives with
    // 1-(1-0.25)^64 ≈ 1-1e-8 — and on this corpus the margin is far
    // wider (true cross pairs measure J ≈ 0.96, background J < 0.05,
    // the q25-style margin argument), so the LSH+verify output equals
    // the oracle's brute force. The threshold test is the integer
    // cross-multiplication 2·|∩| ≥ |∪| — no float at the boundary.
    // Plan: eval bands are a fixed-size frame (the real eval set
    // broadcasts by stats); candidate work is O(corpus × bands ×
    // occupancy) with NO corpus×corpus pairing; exact verification
    // joins shingle payloads for surviving candidates only.
    "q152_fuzzy_decontamination" -> QueryDef(
      (s, dir) => {
        val sh = shingled(s, dir)
          .managedPersist
        val benchSh = sh.filter(col("doc_id") % 50 === 0)
        val corpusSh = sh.filter(col("doc_id") % 50 =!= 0)
        val benchB = bandedLayout(benchSh, 64, 2)
          .select(col("doc_id").as("bench_id"), col("band"))
        val corpusB = bandedLayout(corpusSh, 64, 2)
        val cand = corpusB.join(benchB, "band")
          .select(col("doc_id"), col("bench_id")).distinct()
        val flagged = cand
          .join(corpusSh.select(col("doc_id"), col("sh").as("sha")),
            "doc_id")
          .join(benchSh.select(col("doc_id").as("bench_id"),
            col("sh").as("shb")), "bench_id")
          .withColumn("inter",
            size(array_intersect(col("sha"), col("shb"))).cast("long"))
          .withColumn("un",
            size(col("sha")) + size(col("shb")) - col("inter"))
          .filter(lit(2L) * col("inter") >= col("un"))
          .select("doc_id").distinct()
        table(s, dir, "documents")
          .filter(col("doc_id") % 50 =!= 0)
          .join(flagged.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_fuzzy_contaminated"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              e AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 = 0),
              c AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
              fl AS (SELECT DISTINCT c.doc_id
                FROM c JOIN e ON 2 * len(list_intersect(c.s, e.s)) >=
                  (len(c.s) + len(e.s) - len(list_intersect(c.s, e.s))))
              SELECT d.lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_fuzzy_contaminated
              FROM documents d LEFT JOIN fl ON d.doc_id = fl.doc_id
              WHERE d.doc_id % 50 <> 0
              GROUP BY 1 ORDER BY d.lang""")),

    // Automatic source blocklisting — the release decision q94/q147
    // feed: a source whose share of near-dup-involved documents
    // reaches 8% (800 bps, integer half-up) is blocked, and the
    // report says what dropping those sources costs per language.
    // This is the mirror-site kill switch: compute it from the corpus
    // instead of maintaining a hand-curated domain list. Plan: the
    // verified pair frame is q25's LSH+verify output (tiny vs the
    // corpus); involved-doc and per-source stats are bounded-key
    // aggregations; the blocklist is a ≤|sources|-row frame that
    // BROADCASTS back onto one corpus scan for the kept/dropped
    // rollup — the corpus is read once beyond the shared shingle scan.
    "q153_source_blocklist" -> QueryDef(
      (s, dir) => {
        val pairs = neardupPairs(s, dir)
        val involved = pairs.select(col("da").as("doc_id"))
          .union(pairs.select(col("db").as("doc_id"))).distinct()
        val docs = table(s, dir, "documents")
        val srcStat = docs
          .join(involved.withColumn("dup", lit(1L)), Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("dup"), lit(0L))).as("n_dup_docs"))
          .withColumn("share_bps",
            expr("(10000 * n_dup_docs * 2 + n_docs) div (2 * n_docs)"))
        val blocked = srcStat.filter(col("share_bps") >= 800)
          .select(col("source"))
        val nBlocked = blocked.agg(count(lit(1)).as("n_blocked_sources"))
        docs
          .join(broadcast(blocked.withColumn("blk", lit(1L))),
            Seq("source"), "left")
          .groupBy("lang")
          .agg(sum(when(col("blk").isNull, 1L).otherwise(0L)).as("n_kept"),
            sum(coalesce(col("blk"), lit(0L))).as("n_dropped"))
          .crossJoin(broadcast(nBlocked))
          .select("lang", "n_kept", "n_dropped", "n_blocked_sources")
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                  (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              inv AS (SELECT DISTINCT doc_id FROM
                (SELECT da AS doc_id FROM p UNION SELECT db FROM p) u),
              st AS (SELECT d.source, COUNT(*) AS n_docs,
                  COUNT(inv.doc_id) AS n_dup_docs
                FROM documents d LEFT JOIN inv USING (doc_id)
                GROUP BY 1),
              blk AS (SELECT source FROM st
                WHERE (10000 * n_dup_docs * 2 + n_docs) // (2 * n_docs)
                  >= 800),
              nb AS (SELECT COUNT(*) AS n_blocked_sources FROM blk)
              SELECT d.lang,
                CAST(SUM(CASE WHEN b.source IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
                CAST(SUM(CASE WHEN b.source IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dropped,
                nb.n_blocked_sources
              FROM documents d LEFT JOIN blk b USING (source), nb
              GROUP BY 1, nb.n_blocked_sources ORDER BY d.lang""")),

    // Quality-aware dedup survivors — q83 keeps the MIN-doc_id member
    // of each near-dup cluster; a real release keeps the BEST member:
    // survivor = argmin (q31 integer badness, doc_id) per cluster.
    // Report: per-lang corpus/survivor/removed counts + mean survivor
    // badness (integer half-up), plus n_requalified — clusters whose
    // quality-chosen survivor differs from the min-id choice (the docs
    // this rule actually improves). All-integer ⇒ hash-exact. Plan:
    // CC labels are q45's bounded-round fixpoint over the tiny pair
    // graph; the badness map is q31's row-local arithmetic (one corpus
    // scan); survivor selection windows over CLUSTER MEMBERS only
    // (graph vertices, not the corpus); the removed list is the skinny
    // broadcastable frame q83 documents.
    "q159_quality_survivors" -> QueryDef(
      (s, dir) => {
        val bad = TextAnalysis.qualitySignals(table(s, dir, "documents"))
          .withColumn("badness",
            when(col("n_tokens") === 0, 10000L)
              .otherwise(expr("(20000*n_stop + n_tokens) div (2*n_tokens)")))
          .select("doc_id", "lang", "badness")
          .managedPersist
        val members = ccLabels(s, dir)
          .join(bad.select(col("doc_id").as("v"), col("badness")), "v")
        val w = Window.partitionBy("lbl")
          .orderBy(col("badness"), col("v"))
        val ranked = members.withColumn("rk", row_number().over(w))
        val removed = ranked.filter(col("rk") =!= 1)
          .select(col("v").as("doc_id"))
        val requalified = ranked
          .groupBy("lbl").agg(min(col("v")).as("min_id"),
            min_by(col("v"), struct(col("badness"), col("v"))).as("q_id"))
          .agg(sum((col("q_id") =!= col("min_id")).cast("long"))
            .as("n_requalified"))
          .select(coalesce(col("n_requalified"), lit(0L))
            .as("n_requalified"))
        bad.join(removed.withColumn("rm", lit(1L)), Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("rm"), lit(0L))).as("n_removed"),
            sum(when(col("rm").isNull, col("badness")).otherwise(0L))
              .as("kept_sum"))
          .withColumn("n_survivors", col("n_docs") - col("n_removed"))
          .withColumn("mean_kept_badness",
            expr("(kept_sum * 2 + n_survivors) div (2 * n_survivors)"))
          .crossJoin(broadcast(requalified))
          .select("lang", "n_docs", "n_survivors", "n_removed",
            "mean_kept_badness", "n_requalified")
          .orderBy("lang")
      },
      Some(s"""WITH RECURSIVE toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              edges AS (SELECT da AS a, db AS b FROM p
                        UNION SELECT db, da FROM p),
              reach AS (SELECT a, a AS b
                          FROM (SELECT DISTINCT a FROM edges) n
                        UNION
                        SELECT r.a, e.b
                          FROM reach r JOIN edges e ON r.b = e.a),
              labels AS (SELECT a AS v, MIN(b) AS lbl
                         FROM reach GROUP BY a),
              q AS (SELECT doc_id, lang,
                  CASE WHEN n_tokens = 0 THEN 10000
                    ELSE (20000 * n_stop + n_tokens) // (2 * n_tokens)
                    END AS badness
                FROM (SELECT d.doc_id, d.lang,
                        CAST(LEN(tk.t) AS BIGINT) AS n_tokens,
                        CAST(LEN(list_filter(tk.t,
                          x -> x IN (${TextAnalysis.stopwordsSql})))
                          AS BIGINT) AS n_stop
                      FROM toks tk JOIN documents d
                        ON d.doc_id = tk.doc_id) z),
              m AS (SELECT l.lbl, l.v, q.badness
                    FROM labels l JOIN q ON q.doc_id = l.v),
              ch AS (SELECT lbl, v,
                  ROW_NUMBER() OVER (PARTITION BY lbl
                    ORDER BY badness, v) AS rk,
                  MIN(v) OVER (PARTITION BY lbl) AS min_id
                FROM m),
              rm AS (SELECT v AS doc_id FROM ch WHERE rk <> 1),
              rq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_requalified
                     FROM ch WHERE rk = 1 AND v <> min_id),
              rep AS (SELECT q.lang, COUNT(*) AS n_docs,
                  CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                  CAST(SUM(CASE WHEN rm.doc_id IS NULL
                    THEN q.badness ELSE 0 END) AS BIGINT) AS kept_sum
                FROM q LEFT JOIN rm ON q.doc_id = rm.doc_id
                GROUP BY 1)
              SELECT lang, n_docs, n_docs - n_removed AS n_survivors,
                n_removed,
                (kept_sum * 2 + (n_docs - n_removed))
                  // (2 * (n_docs - n_removed)) AS mean_kept_badness,
                rq.n_requalified
              FROM rep, rq ORDER BY lang""")),

    // Exact-substring (sorted-suffix) dedup — VARIABLE-LENGTH verbatim
    // copied spans across arbitrary doc pairs, the granularity the rest
    // of the dedup triad structurally misses (VERDICT r10 missing #3):
    // q22/q113 need whole-doc equality, q25 needs high whole-doc
    // Jaccard, q102 counts how many fixed 3-grams are shared ANYWHERE
    // in the corpus (a 30-token verbatim quote and 30 scattered common
    // grams are indistinguishable to it), and q124 measures spans only
    // against the tiny benchmark side. This is the public
    // suffix-array recipe (Lee et al. 2022, "Deduplicating Training
    // Data Makes Language Models Better") re-expressed relationally:
    // two docs share a token span of length ≥ s ⟺ they share an
    // s-token seed gram, so positioned seed grams are the suffix
    // table, grams repeated in ≥ 2 docs are the "repeated suffix" set,
    // and a run of consecutive matching seed positions on one pair
    // diagonal (pa − pb constant — q124's gaps-and-islands trick) IS
    // the maximal copied span: run R covers R + s − 1 tokens.
    //
    // Declared fixture (the corpus carries no natural long cross-doc
    // quotes): every (doc_id % 17 = 3) doc with ≥ 25 tokens spawns a
    // quoting doc (id = −doc_id − 1) embedding tokens 6..25 of it
    // between two unique filler tokens — a 20-token span whose
    // per-gram footprint is far below q102's ≥-half heaviness gate
    // (DedupSpec proves q102's rule misses exactly this shape).
    //
    // Plan at 100 TB: positioned seed grams are a map-only generator
    // projection; the ≥2-docs filter is one partial-agg on the gram
    // key and kills the singleton tail (almost all grams — the join
    // fan-out is bounded by TRUE duplication, the suffix-array
    // property); the df cap (≤ 128 docs per gram) bounds the df² pair
    // blow-up of boilerplate grams exactly like q111 caps hot domains
    // — a span shared by thousands of docs still surfaces through its
    // rarer flanking grams or the near-dup path; the islands window
    // partitions on (da, db, diag) over MATCHED rows only — bounded by
    // span length, nothing global. Integer output only.
    "q165_substring_dup" -> QueryDef(
      (s, dir) => {
        val d0 = table(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        val quotes = d0
          .filter(col("doc_id") % 17 === 3 && size(col("toks")) >= 25)
          .select((-col("doc_id") - 1).as("qid"),
            concat(
              array(concat(lit("qpre"), col("doc_id").cast("string"))),
              slice(col("toks"), 6, 20),
              array(concat(lit("qpost"), col("doc_id").cast("string"))))
              .as("toks"))
          .withColumnRenamed("qid", "doc_id")
        substringDupSpans(d0.unionByName(quotes), seedLen = 5,
          minSpan = 8, maxDf = 128)
          .orderBy(desc("max_span_tokens"), col("da"), col("db"))
          .limit(20)
      },
      Some("""WITH t0 AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              q AS (SELECT -doc_id - 1 AS doc_id,
                  ['qpre' || CAST(doc_id AS VARCHAR)] || toks[6:25] ||
                  ['qpost' || CAST(doc_id AS VARCHAR)] AS toks
                FROM t0 WHERE doc_id % 17 = 3 AND len(toks) >= 25),
              t AS (SELECT * FROM t0 UNION ALL SELECT * FROM q),
              pg AS (SELECT doc_id,
                  UNNEST([substring(md5(array_to_string(toks[i:i+4], ' ')),
                                    1, 16)
                          for i in range(1, len(toks) - 3)]) AS gk,
                  UNNEST(range(1, len(toks) - 3)) AS pos
                FROM t WHERE len(toks) >= 5),
              rep AS (SELECT gk FROM (SELECT DISTINCT doc_id, gk FROM pg) z
                      GROUP BY gk HAVING COUNT(*) BETWEEN 2 AND 128),
              gr AS (SELECT pg.doc_id, pg.pos, pg.gk
                     FROM pg JOIN rep USING (gk)),
              m AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
                           a.pos - b.pos AS diag
                    FROM gr a JOIN gr b
                      ON a.gk = b.gk AND a.doc_id < b.doc_id),
              i AS (SELECT da, db, diag,
                  pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
                    ORDER BY pa) AS grp
                FROM m),
              sp AS (SELECT da, db, COUNT(*) AS run
                     FROM i GROUP BY da, db, diag, grp),
              mx AS (SELECT da, db,
                       CAST(MAX(run + 4) AS BIGINT) AS max_span_tokens
                     FROM sp GROUP BY 1, 2)
              SELECT da, db, max_span_tokens FROM mx
              WHERE max_span_tokens >= 8
              ORDER BY max_span_tokens DESC, da, db LIMIT 20""")),

    // Persisted SPAN-INDEX probe — q165's nightly-ingest form, the
    // fourth write-once index family (bands q116 / grams q110 / PQ
    // q126 / SPANS here): the release writes its positioned seed
    // grams once ([[writeSpanIndex]] — bucketed on the gram key, each
    // gram's document frequency materialized so the probe's df cap is
    // a map-side filter), and every ingest batch's copied-span scan
    // ([[probeSpanIndex]]) joins the store EXCHANGE-FREE on the
    // stored side — only the batch's grams shuffle; the islands
    // window runs over matched rows only. Fixture: the EVEN half is
    // the indexed release, the batch is the ODD half plus quoting
    // docs excerpted from indexed evens (−id−1, the q165 pattern) —
    // so the probe must surface both the planted 20-token quotes and
    // whatever natural cross-half spans the corpus carries. Like
    // q116, the index build is idempotent per corpus and the timed
    // bench passes pay the probe, not the build.
    "q166_span_index_probe" -> QueryDef(
      (s, dir) => {
        val d0 = table(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "documents"))
        val name = s"graft_q166_$tag"
        if (!s.catalog.tableExists(s"${name}_pgrams")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q166-$tag")
          writeSpanIndex(d0.filter(col("doc_id") % 2 === 0), name,
            path.toString)
        }
        // quotes excerpt INDEXED (even) docs: doc_id % 10 = 4 ⇒ even
        val quotes = d0
          .filter(col("doc_id") % 10 === 4 && size(col("toks")) >= 25)
          .select((-col("doc_id") - 1).as("qid"),
            concat(
              array(concat(lit("qpre"), col("doc_id").cast("string"))),
              slice(col("toks"), 6, 20),
              array(concat(lit("qpost"), col("doc_id").cast("string"))))
              .as("toks"))
          .withColumnRenamed("qid", "doc_id")
        val batch = d0.filter(col("doc_id") % 2 === 1).unionByName(quotes)
        probeSpanIndex(s, name, batch, seedLen = 5, minSpan = 8,
          maxDf = 128)
          .orderBy(desc("max_span_tokens"), col("da"), col("db"))
          .limit(20)
      },
      Some("""WITH t0 AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              q AS (SELECT -doc_id - 1 AS doc_id,
                  ['qpre' || CAST(doc_id AS VARCHAR)] || toks[6:25] ||
                  ['qpost' || CAST(doc_id AS VARCHAR)] AS toks
                FROM t0 WHERE doc_id % 10 = 4 AND len(toks) >= 25),
              batch AS (SELECT doc_id, toks FROM t0 WHERE doc_id % 2 = 1
                        UNION ALL SELECT doc_id, toks FROM q),
              bg AS (SELECT doc_id,
                  UNNEST([substring(md5(array_to_string(toks[i:i+4], ' ')),
                                    1, 16)
                          for i in range(1, len(toks) - 3)]) AS gk,
                  UNNEST(range(1, len(toks) - 3)) AS pos
                FROM t0 WHERE doc_id % 2 = 0 AND len(toks) >= 5),
              keep AS (SELECT gk FROM (SELECT DISTINCT doc_id, gk FROM bg) z
                       GROUP BY gk HAVING COUNT(*) <= 128),
              sg AS (SELECT bg.doc_id, bg.pos, bg.gk
                     FROM bg JOIN keep USING (gk)),
              pg AS (SELECT doc_id,
                  UNNEST([substring(md5(array_to_string(toks[i:i+4], ' ')),
                                    1, 16)
                          for i in range(1, len(toks) - 3)]) AS gk,
                  UNNEST(range(1, len(toks) - 3)) AS pos
                FROM batch WHERE len(toks) >= 5),
              m AS (SELECT pg.doc_id AS da, sg.doc_id AS db, pg.pos AS pa,
                           pg.pos - sg.pos AS diag
                    FROM pg JOIN sg USING (gk)),
              i AS (SELECT da, db, diag,
                  pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
                    ORDER BY pa) AS grp
                FROM m),
              sp AS (SELECT da, db, COUNT(*) AS run
                     FROM i GROUP BY da, db, diag, grp),
              mx AS (SELECT da, db,
                       CAST(MAX(run + 4) AS BIGINT) AS max_span_tokens
                     FROM sp GROUP BY 1, 2)
              SELECT da, db, max_span_tokens FROM mx
              WHERE max_span_tokens >= 8
              ORDER BY max_span_tokens DESC, da, db LIMIT 20""")),

    // Span-removal AUDIT — q165 detects verbatim copied spans; this
    // runs the transform that PRODUCES the deduplicated corpus
    // ([[removeDupSpans]] — Lee et al. 2022's actual output: every
    // duplicated span ≥ minSpan cut from all-but-the-lowest-id
    // occurrence at token boundaries) over the same declared quote
    // fixture, and reports what a release audit needs: per source lang,
    // how many docs were touched and how many tokens came out — plus
    // the RESIDUAL bit, earned by genuinely re-running the q165
    // detector on the cleaned corpus and counting surviving pairs
    // (zero ⇔ the cut removed every detected span). Quote docs
    // (−id−1) report under their source doc's lang. The removal rule
    // always cuts the HIGHER doc id of a pair, so the planted quote
    // docs (negative ids — the lowest in every pairing) keep their
    // excerpt and the positive source docs lose theirs: asymmetric on
    // purpose, deterministic by construction. Plan: the detector's
    // scan twice (find + residual re-scan — the audit's declared cost
    // order) plus one doc_id shuffle of the bounded removal-position
    // sets; the cut is a map-only indexed filter.
    "q168_span_removal" -> QueryDef(
      (s, dir) => {
        val d0 = table(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        val quotes = d0
          .filter(col("doc_id") % 17 === 3 && size(col("toks")) >= 25)
          .select((-col("doc_id") - 1).as("qid"),
            concat(
              array(concat(lit("qpre"), col("doc_id").cast("string"))),
              slice(col("toks"), 6, 20),
              array(concat(lit("qpost"), col("doc_id").cast("string"))))
              .as("toks"))
          .withColumnRenamed("qid", "doc_id")
        val cleaned = removeDupSpans(d0.unionByName(quotes), seedLen = 5,
          minSpan = 8, maxDf = 128).managedPersist
        val langs = table(s, dir, "documents")
          .select(col("doc_id").as("src"), col("lang"))
        val perLang = cleaned
          .withColumn("src", when(col("doc_id") >= 0, col("doc_id"))
            .otherwise(-col("doc_id") - 1))
          .join(langs, "src")
          .groupBy("lang")
          .agg(sum((col("tokens_removed") > 0).cast("long"))
              .as("docs_touched"),
            sum("tokens_removed").as("tokens_removed"))
        val resid = substringDupSpans(cleaned.select("doc_id", "toks"),
          seedLen = 5, minSpan = 8, maxDf = 128)
          .agg(count(lit(1)).as("n_residual"))
        perLang.crossJoin(resid)
          .select(col("lang"), col("docs_touched"), col("tokens_removed"),
            col("n_residual"),
            (col("n_residual") === 0).cast("long").as("residual_ok"))
          .orderBy("lang")
      },
      Some("""WITH t0 AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    AS toks
                FROM documents),
              q AS (SELECT -doc_id - 1 AS doc_id,
                  ['qpre' || CAST(doc_id AS VARCHAR)] || toks[6:25] ||
                  ['qpost' || CAST(doc_id AS VARCHAR)] AS toks
                FROM t0 WHERE doc_id % 17 = 3 AND len(toks) >= 25),
              t AS (SELECT * FROM t0 UNION ALL SELECT * FROM q),
              pg AS (SELECT doc_id,
                  UNNEST([substring(md5(array_to_string(toks[i:i+4], ' ')),
                                    1, 16)
                          for i in range(1, len(toks) - 3)]) AS gk,
                  UNNEST(range(1, len(toks) - 3)) AS pos
                FROM t WHERE len(toks) >= 5),
              rep AS (SELECT gk FROM (SELECT DISTINCT doc_id, gk FROM pg) z
                      GROUP BY gk HAVING COUNT(*) BETWEEN 2 AND 128),
              gr AS (SELECT pg.doc_id, pg.pos, pg.gk
                     FROM pg JOIN rep USING (gk)),
              m AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
                           b.pos AS pb, a.pos - b.pos AS diag
                    FROM gr a JOIN gr b
                      ON a.gk = b.gk AND a.doc_id < b.doc_id),
              i AS (SELECT da, db, diag, pa, pb,
                  pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
                    ORDER BY pa) AS grp
                FROM m),
              runs AS (SELECT da, db, diag, grp, COUNT(*) AS run,
                         MIN(pb) AS pb0
                       FROM i GROUP BY 1, 2, 3, 4
                       HAVING COUNT(*) + 4 >= 8),
              rmpos AS (SELECT DISTINCT doc_id, pos FROM (
                  SELECT db AS doc_id,
                    UNNEST(range(pb0, pb0 + run + 4)) AS pos
                  FROM runs) z),
              rms AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nrm,
                        list(pos) AS rmlist
                      FROM rmpos GROUP BY 1),
              clean AS (SELECT t.doc_id,
                  CASE WHEN rms.doc_id IS NULL THEN t.toks
                    ELSE [t.toks[i] for i in range(1, len(t.toks) + 1)
                          if NOT list_contains(rms.rmlist, i)] END AS toks,
                  COALESCE(rms.nrm, 0) AS tokens_removed
                FROM t LEFT JOIN rms USING (doc_id)),
              pg2 AS (SELECT doc_id,
                  UNNEST([substring(md5(array_to_string(toks[i:i+4], ' ')),
                                    1, 16)
                          for i in range(1, len(toks) - 3)]) AS gk,
                  UNNEST(range(1, len(toks) - 3)) AS pos
                FROM clean WHERE len(toks) >= 5),
              rep2 AS (SELECT gk
                       FROM (SELECT DISTINCT doc_id, gk FROM pg2) z
                       GROUP BY gk HAVING COUNT(*) BETWEEN 2 AND 128),
              gr2 AS (SELECT pg2.doc_id, pg2.pos, pg2.gk
                      FROM pg2 JOIN rep2 USING (gk)),
              m2 AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
                            a.pos - b.pos AS diag
                     FROM gr2 a JOIN gr2 b
                       ON a.gk = b.gk AND a.doc_id < b.doc_id),
              i2 AS (SELECT da, db, diag,
                  pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
                    ORDER BY pa) AS grp
                FROM m2),
              sp2 AS (SELECT da, db, COUNT(*) AS run
                      FROM i2 GROUP BY da, db, diag, grp),
              mx2 AS (SELECT da, db FROM sp2 GROUP BY 1, 2
                      HAVING MAX(run + 4) >= 8),
              res AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_residual
                      FROM mx2),
              rep_out AS (SELECT d.lang,
                  CAST(SUM(CASE WHEN c.tokens_removed > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_touched,
                  CAST(SUM(c.tokens_removed) AS BIGINT) AS tokens_removed
                FROM clean c JOIN documents d
                  ON d.doc_id = CASE WHEN c.doc_id >= 0 THEN c.doc_id
                                     ELSE -c.doc_id - 1 END
                GROUP BY 1)
              SELECT lang, docs_touched, tokens_removed, res.n_residual,
                CAST(CASE WHEN res.n_residual = 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS residual_ok
              FROM rep_out, res ORDER BY lang""")),

    // Duplicate ARRIVAL-LAG histogram: for every duplicate row (same
    // 8-token prefix key — q118/q125's affix-duplicate family, the key
    // with real duplicate mass at every SF; doc_id = ingest order),
    // how far behind its group's first copy did it land? Gap =
    // doc_id − first_id, bucketed by floor(log2) via the
    // binary-string length (pure integer — no float log). This is the
    // observability artifact that sizes a STREAMING dedup window: the
    // bucket where the histogram's mass ends is the lookback an
    // incremental pass (q115's shape) needs to catch 100 % of
    // duplicates. Scale: the group key is the md5 of the bounded
    // prefix, so the shuffle moves 16-byte keys, never text; one fp
    // groupBy + one fp equi-join + a ≤64-key histogram agg — no
    // windows, no pairs.
    "q222_dup_arrival_lag" -> QueryDef(
      (s, dir) => {
        val f = table(s, dir, "documents")
          .select(col("doc_id"),
            md5(array_join(slice(TextAnalysis.tokens(col("text")),
              1, 8), " ")).as("fp"))
        val g = f.groupBy("fp").agg(min("doc_id").as("first_id"))
        f.join(g, "fp")
          .filter(col("doc_id") > col("first_id"))
          .select((col("doc_id") - col("first_id"))
            .cast("long").as("gap"))
          .groupBy((length(bin(col("gap"))) - 1).cast("long")
            .as("bucket"))
          .agg(count(lit(1)).as("n_dups"),
            min("gap").as("min_gap"), max("gap").as("max_gap"))
          .orderBy("bucket")
      },
      Some("""WITH f AS (SELECT doc_id,
                  md5(array_to_string(list_filter(
                    string_split_regex(text, '\s+'),
                    x -> x <> '')[1:8], ' ')) AS fp
                FROM documents),
              g AS (SELECT fp, MIN(doc_id) AS first_id
                FROM f GROUP BY 1),
              d AS (SELECT CAST(f.doc_id - g.first_id AS BIGINT) AS gap
                FROM f JOIN g USING (fp) WHERE f.doc_id > g.first_id)
              SELECT CAST(length(bin(gap)) - 1 AS BIGINT) AS bucket,
                COUNT(*) AS n_dups,
                CAST(MIN(gap) AS BIGINT) AS min_gap,
                CAST(MAX(gap) AS BIGINT) AS max_gap
              FROM d GROUP BY 1 ORDER BY bucket""")),

    // Multi-suite decontamination MATRIX — q96 guards one eval set;
    // a release guards many, and per (suite × source) attribution is
    // what tells the pipeline owner WHICH crawl slice leaks WHICH
    // benchmark. Three eval-suite stand-ins (doc_id residues 41/43/47),
    // contamination = a training doc sharing ≥ 3 distinct 3-gram
    // shingles with any suite member (a lower bar than q96's ≥ 5 —
    // the matrix's job is surfacing the weaker cross-suite signal the
    // single-suite gate would miss). The full zero-filled grid is
    // emitted so a clean (suite, source) cell is an auditable 0, not
    // an absent row. Scale: ONE shingling pass feeds both join sides;
    // the candidate join moves (suite, doc, bench, shingle) posting
    // rows keyed on the shingle; the grid is |suites|·|sources| —
    // bounded — and broadcast-joined against the flag counts.
    "q228_decontamination_matrix" -> QueryDef(
      (s, dir) => {
        val suites = Seq(("suiteA", 41), ("suiteB", 43), ("suiteC", 47))
        val isEval = suites.map { case (_, m) => col("doc_id") % m === 0 }
          .reduce(_ || _)
        val sh = shingled(s, dir).managedPersist
        val bench = suites.map { case (nm, m) =>
          sh.filter(col("doc_id") % m === 0)
            .select(lit(nm).as("suite"), col("doc_id").as("bench_id"),
              explode(col("sh")).as("g"))
        }.reduce(_ unionByName _)
        val train = sh.filter(!isEval)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        val flagged = train.join(bench, "g")
          .groupBy("suite", "doc_id", "bench_id")
          .agg(count(lit(1)).as("ns"))
          .filter(col("ns") >= 3)
          .select("suite", "doc_id").distinct()
        val trainDocs = table(s, dir, "documents").filter(!isEval)
          .select(col("doc_id"), col("source"))
        val counts = flagged.join(trainDocs, "doc_id")
          .groupBy("suite", "source")
          .agg(count(lit(1)).as("n_flagged"))
        val grid = trainDocs.groupBy("source")
          .agg(count(lit(1)).as("n_train"))
          .crossJoin(s.createDataFrame(suites.map(p => Tuple1(p._1)))
            .toDF("suite"))
        grid.join(broadcast(counts), Seq("suite", "source"), "left")
          .na.fill(0L, Seq("n_flagged"))
          .select(col("suite"), col("source"), col("n_flagged"),
            col("n_train"),
            expr("(20000 * n_flagged + n_train) div (2 * n_train)")
              .as("flagged_bp"))
          .orderBy("suite", "source")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                    x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              bg AS (SELECT su.suite, sh.doc_id AS bench_id,
                  UNNEST(sh.s) AS g
                FROM sh, (VALUES ('suiteA', 41), ('suiteB', 43),
                  ('suiteC', 47)) su(suite, m)
                WHERE sh.doc_id % su.m = 0),
              tr AS (SELECT doc_id, source FROM documents
                WHERE doc_id % 41 <> 0 AND doc_id % 43 <> 0
                  AND doc_id % 47 <> 0),
              cg AS (SELECT sh.doc_id, UNNEST(sh.s) AS g FROM sh
                WHERE sh.doc_id % 41 <> 0 AND sh.doc_id % 43 <> 0
                  AND sh.doc_id % 47 <> 0),
              fl AS (SELECT DISTINCT suite, doc_id FROM (
                  SELECT bg.suite, cg.doc_id, bg.bench_id,
                    COUNT(*) AS ns
                  FROM cg JOIN bg USING (g) GROUP BY 1, 2, 3) z
                WHERE ns >= 3),
              cnt AS (SELECT fl.suite, tr.source, COUNT(*) AS n_flagged
                FROM fl JOIN tr USING (doc_id) GROUP BY 1, 2),
              grid AS (SELECT su.suite, t2.source, t2.n_train FROM
                (SELECT source, COUNT(*) AS n_train FROM tr
                 GROUP BY 1) t2,
                (VALUES ('suiteA'), ('suiteB'), ('suiteC')) su(suite))
              SELECT grid.suite, grid.source,
                CAST(COALESCE(cnt.n_flagged, 0) AS BIGINT) AS n_flagged,
                grid.n_train,
                CAST((20000 * COALESCE(cnt.n_flagged, 0) + grid.n_train)
                  // (2 * grid.n_train) AS BIGINT) AS flagged_bp
              FROM grid LEFT JOIN cnt
                ON cnt.suite = grid.suite AND cnt.source = grid.source
              ORDER BY grid.suite, grid.source""")),

    // Contamination SEVERITY direction for q228's flagged pairs: a
    // training doc whose overlap covers the bench doc's ENTIRE shingle
    // set (ns == |bench shingles|) contains the benchmark verbatim-ish
    // — an immediate drop; a majority overlap (2·ns ≥ |bench|) is a
    // paraphrase-grade leak; the rest are shared-boilerplate noise a
    // reviewer triages. Per suite: pair count and the two severity
    // tallies. Same shingle-keyed posting join as q228 (ONE shingling
    // pass, no doc pairs outside the candidate set); the bench-side
    // set size rides the posting rows as a constant per bench doc, so
    // severity classification costs nothing extra.
    "q232_contamination_severity" -> QueryDef(
      (s, dir) => {
        val suites = Seq(("suiteA", 41), ("suiteB", 43), ("suiteC", 47))
        val isEval = suites.map { case (_, m) => col("doc_id") % m === 0 }
          .reduce(_ || _)
        val sh = shingled(s, dir).managedPersist
        val bench = suites.map { case (nm, m) =>
          sh.filter(col("doc_id") % m === 0)
            .select(lit(nm).as("suite"), col("doc_id").as("bench_id"),
              size(col("sh")).cast("long").as("blen"),
              explode(col("sh")).as("g"))
        }.reduce(_ unionByName _)
        val train = sh.filter(!isEval)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        train.join(bench, "g")
          .groupBy("suite", "doc_id", "bench_id")
          .agg(min("blen").as("blen"), count(lit(1)).as("ns"))
          .filter(col("ns") >= 3)
          .groupBy("suite")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("ns") === col("blen"), 1L).otherwise(0L))
              .as("n_superset"),
            sum(when(col("ns") * 2 >= col("blen") &&
              col("ns") < col("blen"), 1L).otherwise(0L))
              .as("n_major"))
          .orderBy("suite")
      },
      Some("""WITH toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                    x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              bg AS (SELECT su.suite, sh.doc_id AS bench_id,
                  len(sh.s) AS blen, UNNEST(sh.s) AS g
                FROM sh, (VALUES ('suiteA', 41), ('suiteB', 43),
                  ('suiteC', 47)) su(suite, m)
                WHERE sh.doc_id % su.m = 0),
              cg AS (SELECT doc_id, UNNEST(s) AS g FROM sh
                WHERE doc_id % 41 <> 0 AND doc_id % 43 <> 0
                  AND doc_id % 47 <> 0),
              pairs AS (SELECT bg.suite, cg.doc_id, bg.bench_id,
                  MIN(bg.blen) AS blen, COUNT(*) AS ns
                FROM cg JOIN bg USING (g) GROUP BY 1, 2, 3
                HAVING COUNT(*) >= 3)
              SELECT suite, COUNT(*) AS n_pairs,
                CAST(SUM(CASE WHEN ns = blen THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_superset,
                CAST(SUM(CASE WHEN 2 * ns >= blen AND ns < blen
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_major
              FROM pairs GROUP BY 1 ORDER BY suite""")),

    // Mixture drift under dedup — the feedback edge every pipeline
    // owner forgets: near-dup removal (q83's cluster survivors) does
    // NOT shrink sources uniformly, so sampling weights computed on
    // the raw corpus (q104/q198's apportionment inputs) are stale the
    // moment dedup runs. Per source: token mass before/after removal
    // and the exact share drift in bp (integer half-up on both shares,
    // then a plain subtraction — negative drift means the source was
    // duplicate-heavy and lost mixture mass). Scale: the removed list
    // is the skinny CC vertex frame (broadcastable); token sums are
    // partial-agg scans; the share windows run over the bounded
    // |sources| frame only.
    "q229_dedup_mixture_drift" -> QueryDef(
      (s, dir) => {
        val removed = ccLabels(s, dir)
          .filter(col("v") =!= col("lbl"))
          .select(col("v").as("doc_id"))
        val d = table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("n_tok"))
          .managedPersist
        val before = d.groupBy("source")
          .agg(sum("n_tok").as("tok_before"))
        val after = d.join(removed, Seq("doc_id"), "left_anti")
          .groupBy("source").agg(sum("n_tok").as("tok_after"))
        // denominators come from the UN-joined frames (a source whose
        // every doc was removed must still weigh in tb and appear in
        // the report with tok_after = 0), as a 1-row broadcast — not
        // a window over the join result
        val totals = before.agg(sum("tok_before").as("tb"))
          .crossJoin(after.agg(sum("tok_after").as("ta")))
        before.join(after, Seq("source"), "left")
          .na.fill(0L, Seq("tok_after"))
          .crossJoin(broadcast(totals))
          .select(col("source"), col("tok_before"), col("tok_after"),
            expr("(20000 * tok_before + tb) div (2 * tb)")
              .as("share_before_bp"),
            expr("(20000 * tok_after + ta) div (2 * ta)")
              .as("share_after_bp"),
            (expr("(20000 * tok_after + ta) div (2 * ta)") -
              expr("(20000 * tok_before + tb) div (2 * tb)"))
              .as("drift_bp"))
          .orderBy("source")
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                    x -> x <> '') AS t
                FROM documents),
              sh AS (SELECT doc_id,
                  list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t)-1)]) AS s
                FROM toks WHERE len(t) >= 3),
              p AS (SELECT a.doc_id AS da, b.doc_id AS db
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8),
              edges AS (SELECT da AS a, db AS b FROM p
                        UNION SELECT db, da FROM p),
              reach AS (SELECT a, a AS b
                          FROM (SELECT DISTINCT a FROM edges) n
                        UNION
                        SELECT r.a, e.b
                          FROM reach r JOIN edges e ON r.b = e.a),
              labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                         FROM reach GROUP BY a),
              removed AS (SELECT doc_id FROM labels
                          WHERE doc_id <> cluster_id),
              dt AS (SELECT doc_id, source,
                  CAST(len(t) AS BIGINT) AS n_tok FROM toks
                JOIN documents USING (doc_id)),
              bf AS (SELECT source, SUM(n_tok) AS tok_before
                     FROM dt GROUP BY 1),
              af AS (SELECT source, SUM(n_tok) AS tok_after FROM dt
                     WHERE doc_id NOT IN (SELECT doc_id FROM removed)
                     GROUP BY 1),
              tt AS (SELECT (SELECT SUM(tok_before) FROM bf) AS tb,
                            (SELECT SUM(tok_after) FROM af) AS ta)
              SELECT bf.source,
                CAST(bf.tok_before AS BIGINT) AS tok_before,
                CAST(COALESCE(af.tok_after, 0) AS BIGINT) AS tok_after,
                CAST((20000 * bf.tok_before + tt.tb) // (2 * tt.tb)
                  AS BIGINT) AS share_before_bp,
                CAST((20000 * COALESCE(af.tok_after, 0) + tt.ta)
                  // (2 * tt.ta) AS BIGINT) AS share_after_bp,
                CAST((20000 * COALESCE(af.tok_after, 0) + tt.ta)
                  // (2 * tt.ta) -
                  (20000 * bf.tok_before + tt.tb) // (2 * tt.tb)
                  AS BIGINT) AS drift_bp
              FROM bf LEFT JOIN af USING (source), tt
              ORDER BY bf.source"""))
  )

  /** Maximal cross-doc verbatim token spans (the q165 operator, reusable
    * over any (doc_id, toks) frame): every unordered doc pair sharing a
    * copied span of ≥ `minSpan` tokens, with the longest such span.
    * `seedLen` is the seed-gram size (spans shorter than it are
    * invisible — the Lee et al. suffix-array threshold); `maxDf` drops
    * seed grams present in more than that many docs before the pair
    * join (the df² guard for boilerplate; capped grams lose only pairs
    * whose ENTIRE overlap is that common — see q165's plan note).
    */
  def substringDupSpans(
      docs: org.apache.spark.sql.DataFrame,
      seedLen: Int,
      minSpan: Int,
      maxDf: Int): org.apache.spark.sql.DataFrame = {
    require(seedLen >= 2 && minSpan >= seedLen,
      s"need seedLen >= 2 and minSpan >= seedLen: $seedLen, $minSpan")
    spansOfMatches(matchedSeedGrams(docs, seedLen, maxDf), seedLen, minSpan)
  }

  /** The matched positioned-seed-gram pair frame shared by the span
    * REPORT ([[substringDupSpans]]) and the span REMOVAL transform
    * ([[removeDupSpans]]): every cross-doc seed-gram co-occurrence as
    * (da < db, pa, pb, diag = pa − pb), after the ≥2-docs repeated
    * filter and the `maxDf` boilerplate cap. One definition so the
    * detector and the remover cannot disagree about what a matched
    * gram is.
    */
  private def matchedSeedGrams(
      docs: org.apache.spark.sql.DataFrame,
      seedLen: Int,
      maxDf: Int): org.apache.spark.sql.DataFrame = {
    val g = positionedGrams(docs, seedLen).managedPersist
    val rep = g.select("doc_id", "gk").distinct()
      .groupBy("gk").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2 && col("ndocs") <= maxDf)
      .select("gk")
    val gr = g.join(rep, "gk")
    val a = gr.select(col("gk"), col("doc_id").as("da"), col("pos").as("pa"))
    val b = gr.select(col("gk"), col("doc_id").as("db"), col("pos").as("pb"))
    a.join(b, Seq("gk"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
  }

  /** Duplicate-span REMOVAL — the transform [[substringDupSpans]] only
    * reports: emit the corpus with every cross-doc verbatim span of
    * ≥ `minSpan` tokens CUT from all-but-the-lowest-id occurrence, at
    * token boundaries — the actual output of the Lee et al. 2022
    * suffix-array dedup ("Deduplicating Training Data Makes Language
    * Models Better" §3: remove all but one occurrence of each
    * sufficiently long duplicated substring). Rule: for every matched
    * pair (da < db), every maximal run of consecutive matching seed
    * positions covering ≥ `minSpan` tokens marks the db-side token
    * interval [pb₀, pb₀ + run + seedLen − 2] for removal; a doc's
    * marked positions are unioned across all its higher-id pairings,
    * so the lowest-id holder of a span is the one occurrence that
    * survives. Returns (doc_id, toks, tokens_removed).
    *
    * Residual property (DedupSpec): re-running [[substringDupSpans]]
    * with the same (seedLen, minSpan, maxDf) on the output finds zero
    * pairs — every detected span had all-but-one occurrence cut, and
    * a cut can only shorten runs, never extend one past `minSpan`.
    *
    * Plan at 100 TB: the matched-gram frame is the detector's (same
    * bounded fan-out argument as q165); removal positions explode only
    * from qualifying runs (bounded by TRUE duplication volume), the
    * per-doc position sets shuffle once on doc_id, and the cut itself
    * is a map-only indexed `filter` over each doc's token array — no
    * driver-side anything, no second corpus shuffle.
    */
  def removeDupSpans(
      docs: org.apache.spark.sql.DataFrame,
      seedLen: Int,
      minSpan: Int,
      maxDf: Int): org.apache.spark.sql.DataFrame = {
    require(seedLen >= 2 && minSpan >= seedLen,
      s"need seedLen >= 2 and minSpan >= seedLen: $seedLen, $minSpan")
    val m = matchedSeedGrams(docs, seedLen, maxDf)
    val w = Window.partitionBy("da", "db", "diag").orderBy("pa")
    val runs = m.withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("da", "db", "diag", "grp")
      .agg(count(lit(1)).as("run"), min("pb").as("pb0"))
      .filter(col("run") + (seedLen - 1) >= minSpan)
    val rmpos = runs.select(col("db").as("doc_id"),
        explode(sequence(col("pb0").cast("long"),
          (col("pb0") + col("run") + lit(seedLen - 2)).cast("long")))
          .as("pos"))
      .distinct()
    val rmset = rmpos.groupBy("doc_id")
      .agg(collect_set(col("pos").cast("int")).as("rmset"))
    docs.join(rmset, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("rmset").isNull, col("toks"))
          .otherwise(filter(col("toks"),
            (_, i) => !array_contains(col("rmset"), (i + 1).cast("int"))))
          .as("toks"),
        coalesce(size(col("rmset")).cast("long"), lit(0L))
          .as("tokens_removed"))
  }

  /** Positioned seed grams of a (doc_id, toks) frame: one row per gram
    * start — (doc_id, pos [1-based], gk = 16-hex md5 of the
    * space-joined seedLen tokens). Map-only generator projection,
    * shared by [[substringDupSpans]] and the span-index family.
    */
  /** q199's fixture + candidate pipeline, ONE definition shared with
    * the Stress containment probe (so the probe can never measure a
    * different shape than the query it calibrates): plant aggregator
    * docs (doc_id % 83 = 2 appends partner (id·7+3) % 400's full text;
    * left-join passthrough keeps hosts whose partner id is beyond the
    * SF), distinct 3-grams capped at df ≤ 64, pair the capped grams,
    * and keep pairs with containment-of-the-smaller ≥ 0.80. Returns
    * `(da, db, na, nb, shared, m)`.
    */
  private[graft] def containmentPairs(
      d0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = d0.sparkSession
    HashFunctions.register(s)
    val agg0 = d0.filter(col("doc_id") % 83 === 2)
      .withColumn("pid", (col("doc_id") * 7 + 3) % 400)
    val fixed = agg0
      .join(d0.select(col("doc_id").as("pid"),
        col("text").as("ptext")), Seq("pid"), "left")
      .select(col("doc_id"),
        when(col("ptext").isNotNull,
          concat(col("text"), lit(" "), col("ptext")))
          .otherwise(col("text")).as("text"))
      .unionByName(d0.filter(col("doc_id") % 83 =!= 2))
    val sh = fixed
      .select(col("doc_id"),
        explode(expr("graft_shingles(text, 3)")).as("g"))
      .distinct()
      .managedPersist
    val keep = sh.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 64).select("g")
    val capped = sh.join(keep, Seq("g"), "left_semi").managedPersist
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
    capped.select(col("doc_id").as("da"), col("g"))
      .join(capped.select(col("doc_id").as("db"), col("g")), Seq("g"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")),
        "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")),
        "db")
      .withColumn("m", least(col("na"), col("nb")))
      .filter(col("shared") * 5 >= col("m") * 4)
  }

  private[operators] def positionedGrams(
      docs: org.apache.spark.sql.DataFrame,
      seedLen: Int): org.apache.spark.sql.DataFrame =
    // spread before the per-gram md5 explode (r17): callers hand this
    // a tokenized projection straight off a one-split scan
    Q.spread(docs).filter(size(col("toks")) >= seedLen)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")) - (seedLen - 1)),
          i => substring(md5(concat_ws(" ",
            (0 until seedLen).map(o => element_at(col("toks"), i + o)): _*)),
            1, 16))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gk"))

  /** Gaps-and-islands maximal spans of a matched-gram frame
    * (da, db, pa, diag): per (da, db), the longest run of consecutive
    * matching seed positions — run R covers R + seedLen − 1 tokens.
    */
  private def spansOfMatches(
      m: org.apache.spark.sql.DataFrame,
      seedLen: Int,
      minSpan: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("da", "db", "diag").orderBy("pa")
    m.withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("da", "db", "diag", "grp")
      .agg(count(lit(1)).as("run"))
      .groupBy("da", "db")
      .agg(max(col("run") + (seedLen - 1)).as("max_span_tokens"))
      .filter(col("max_span_tokens") >= minSpan)
  }

  /** Write-once POSITIONED-GRAM (span) index — the fourth persisted
    * artifact family (bands / grams / ANN cells / SPANS): one bucketed
    * external table `<name>_pgrams` of the corpus's positioned seed
    * grams (doc_id, pos, gk, df_gk), BUCKETED AND SORTED on `gk` — the
    * key every probe joins on — with each gram's corpus document
    * frequency MATERIALIZED at build time so the probe's df cap is a
    * map-side filter on the bucketed scan, not a per-batch
    * re-aggregation of the store. q165's plan note made incremental:
    * a release writes this once, and every ingest batch's
    * copied-span scan ([[probeSpanIndex]]) joins it with ZERO exchange
    * on the stored side. Write-once by design: appending would
    * invalidate the materialized df_gk — periodic rebuild, like the
    * PQ index's retrain split.
    */
  def writeSpanIndex(
      docs: org.apache.spark.sql.DataFrame,
      name: String,
      path: String,
      seedLen: Int = 5,
      buckets: Int = 32): Unit = {
    val s = docs.sparkSession
    val g = positionedGrams(docs, seedLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val df = g.select("doc_id", "gk").distinct()
        .groupBy("gk").agg(count(lit(1)).as("df_gk"))
      g.join(df, "gk").write
        .mode("overwrite")
        .bucketBy(buckets, "gk").sortBy("gk")
        .option("path", s"$path/pgrams").saveAsTable(s"${name}_pgrams")
      // staleness bookkeeping (q192): positioned-gram rows at build
      IndexMaintenance.writeBuildMeta(s, path,
        s.table(s"${name}_pgrams").count())
    } finally g.unpersist(blocking = false)
  }

  /** Re-attach a [[writeSpanIndex]] artifact in a NEW SparkSession —
    * same contract as [[registerBandIndex]].
    */
  def registerSpanIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      path: String,
      buckets: Int = 32): Unit =
    IndexCatalog.registerBucketed(spark, s"${name}_pgrams",
      s"$path/pgrams", "gk", buckets)

  /** Probe a persisted [[writeSpanIndex]] index with an ingest batch:
    * every (batch doc `da`, stored doc `db`) pair sharing a verbatim
    * token span of ≥ `minSpan` tokens, with the longest such span —
    * the incremental form of [[substringDupSpans]] (batch-vs-store
    * pairs only; batch-internal pairs are the in-plan operator's job).
    * The stored side is read through the bucketed `gk` layout
    * (exchange-free — only the batch's grams shuffle) after the
    * map-side `df_gk ≤ maxDf` cap; a batch gram matching ANY stored
    * doc is repeated by construction, so no batch-side df pass is
    * needed. IndexStoreSpec asserts probe ≡ the in-plan rule's
    * cross pairs on a split corpus.
    */
  def probeSpanIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      batch: org.apache.spark.sql.DataFrame,
      seedLen: Int = 5,
      minSpan: Int = 8,
      maxDf: Int = 128): org.apache.spark.sql.DataFrame = {
    val stored = spark.table(s"${name}_pgrams")
      .filter(col("df_gk") <= maxDf)
      .select(col("gk"), col("doc_id").as("db"), col("pos").as("pb"))
    val m = positionedGrams(batch, seedLen)
      .select(col("gk"), col("doc_id").as("da"), col("pos").as("pa"))
      .join(stored, Seq("gk"))
      .select(col("da"), col("db"), col("pa"),
        (col("pa") - col("pb")).as("diag"))
    spansOfMatches(m, seedLen, minSpan)
  }

}
