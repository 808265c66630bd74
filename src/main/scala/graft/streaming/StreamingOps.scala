package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Typed event for the stateful operators. */
final case class UserEvent(
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Arbitrary per-key state output: running totals per user. */
final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

/** Minimal doc-with-provenance record for the per-domain admission cap. */
final case class SourcedDoc(ts: java.sql.Timestamp, doc_id: Long, source: String)

/** Structured-Streaming windowed aggregations over the `events` stream
  * (SURVEY §2B closing paragraph / §5 item 5). Each builder takes any
  * events DataFrame — batch or `readStream` — with `ts: timestamp`,
  * `event_type: string`, `value: double`, so the batch-checked Q21
  * semantics and the streaming variants share one definition.
  *
  * Watermarks bound state (late rows beyond the watermark are dropped
  * and windows older than it are finalized + evicted); the shuffle key
  * is `(window, event_type)`, so state is hash-partitioned across
  * executors — the plan scales the same way the batch aggregate does.
  */
object StreamingOps {

  private def sumValue: Column =
    round(sum(col("value").cast(DecimalType(18, 4))), 2)
      .cast("double").as("sum_value")

  /** Q21's streaming form: tumbling 1-hour windows, 10-minute watermark. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue)
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling-window approximate distinct users — the sketch family
    * (SURVEY q57/q67/q99/q101/q103) meeting the streaming surface: per
    * (hour, event_type), HLL++-estimated distinct user_ids. The HLL
    * register state is fixed-size and merges by register max —
    * commutative and idempotent — so the estimate is DETERMINISTIC for
    * a given data set regardless of partitioning, arrival order, or
    * micro-batch boundaries: the streaming run equals the batch run
    * exactly (StreamingSpec asserts it). At ingest scale this is the
    * only affordable per-window distinct — exact distinct state grows
    * with cardinality, HLL state is ~KBs per open window.
    */
  def tumblingDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("approx_users"))

  /** Sliding windows: 10-minute length every 5 minutes (each event lands
    * in two windows).
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows: events closer than the 30-minute gap merge into one
    * session per event_type.
    */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue)
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on an id column: duplicates arriving within
    * the watermark delay are dropped; state for ids older than the
    * watermark is evicted, so state size is bounded by the id arrival
    * rate × delay — the streaming half of the Q22 dedup operator (an
    * at-least-once source in front of a training-data ingest emits
    * exactly-once records out).
    */
  def dedupWithinWatermark(events: DataFrame, idCol: String): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming NEAR-dup suppression on a text column — the streaming
    * half of the q25 family, at signature granularity: each record's
    * 3-gram MinHash signature collapses to one 64-bit key (xxhash64
    * over the 128 slots), and records whose key was already seen
    * within the watermark are dropped. Identical-signature ⇒ the
    * shingle sets are near-identical (the sketch's whole point), so
    * this suppresses the retry/boilerplate near-clones an ingest feed
    * emits — while the state store holds one LONG per surviving doc
    * per watermark window, not the text. Catching lower-Jaccard pairs
    * is the batch LSH pipeline's job downstream; a streaming band-OR
    * would need 32 keyed dedups and 32× the state for recall the
    * nightly batch already guarantees.
    */
  def neardupSuppressWithinWatermark(
      docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.HashFunctions.register(docs.sparkSession)
    docs
      .withColumn("sig",
        expr(s"graft_minhash(graft_shingles($textCol, 3))"))
      .withColumn("sig_key", xxhash64(col("sig")))
      .drop("sig")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("sig_key")
  }

  /** Streaming decontamination gate — q101's bloom probe as a stream
    * filter: drop any document whose distinct 3-gram shingles score
    * `minHits`+ hits against the (fixed, broadcast) eval-set bloom.
    * The per-doc hit count is computed INSIDE the row with a
    * higher-order filter over the shingle array, so the operator is
    * completely STATELESS — a map-only select/filter that runs
    * identically in batch and readStream mode (no watermark, no state
    * store, no shuffle), which is exactly what an ingest-time
    * contamination gate must be at any throughput. Blooms have no
    * false negatives, so nothing contaminated survives; the ~1e-9
    * per-doc false-flag probability (5 independent gram FPs) is the
    * q101 contract.
    */
  def decontaminateStream(
      docs: DataFrame, bloom: Array[Byte], textCol: String,
      minHits: Int = 5): DataFrame = {
    graft.functions.HashFunctions.register(docs.sparkSession)
    if (bloom == null) docs // empty eval set: nothing can be contaminated
    else docs.filter(
      size(filter(expr(s"graft_shingles($textCol, 3)"),
        g => call_function("graft_bloom_contains",
          lit(bloom), xxhash64(g)))) < minHits)
  }

  /** Streaming per-domain admission cap — q111's crawl-hygiene rule at
    * ingest time: admit at most `k` documents per source over the life
    * of the stream, first-come (within a batch, deterministic
    * (ts, doc_id) order). State is ONE Long per domain — bounded by
    * the domain count, not the document count — via
    * `flatMapGroupsWithState`, the arbitrary-keyed-state tool; the
    * stream shuffles once on the domain key, the same partitioning the
    * batch window uses. Runs in batch mode too (state starts empty,
    * one "batch" = the whole frame), so the admission rule has one
    * definition in both modes.
    */
  def perDomainAdmitCap(
      docs: Dataset[SourcedDoc], k: Int): Dataset[SourcedDoc] = {
    import docs.sparkSession.implicits._
    // iterator order within a batch is partition-arrival order, not
    // stable — admission must be by deterministic (ts, doc_id) order.
    // But materializing the whole group to sort it would load a hot
    // domain's entire batch into one task's heap (the r8 ADVICE): a
    // bounded max-heap of the best `quota` keys streams the iterator
    // instead, so task memory is O(k - admitted_so_far), never the
    // group size — matching the "state is ONE Long per domain" claim
    // in spirit as well as letter. A null ts sorts LAST (an undated
    // doc never displaces a dated one inside the quota).
    def key(d: SourcedDoc): (Long, Long) =
      (if (d.ts == null) Long.MaxValue else d.ts.getTime, d.doc_id)
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, SourcedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SourcedDoc], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L)
          val quota = math.max(0L, k - n).toInt
          if (quota == 0) { state.update(n); Iterator.empty }
          else {
            val ord = Ordering.Tuple2[Long, Long]
            // max-heap on the key: the root is the WORST of the kept
            // candidates and is evicted when a better one streams in
            val heap = new java.util.PriorityQueue[SourcedDoc](
              quota + 1, (a: SourcedDoc, b: SourcedDoc) =>
                ord.compare(key(b), key(a)))
            rows.foreach { d =>
              heap.add(d)
              if (heap.size > quota) heap.poll()
            }
            val admitted = Array.fill(heap.size)(heap.poll())
              .sortBy(key)(ord)
            state.update(n + admitted.length)
            admitted.iterator
          }
      }
  }

  /** Stream-stream interval join: each purchase pairs with the same
    * user's clicks from the preceding hour (the streaming counterpart
    * of the q36/q37 temporal joins). BOTH sides carry watermarks and
    * the join condition bounds event time on both sides, so the state
    * store evicts rows once they can no longer match — state is
    * O(arrival rate × (interval + watermark)), not unbounded. The join
    * shuffles both streams on `user_id`, the same key-partitioned shape
    * as the batch plan.
    */
  def clickPurchaseJoin(
      clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(c, expr(
      """c_user = p_user AND
         click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"""))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("click_ts"), col("value"))
  }

  /** Left-outer variant: every purchase emits, with a NULL click when
    * no same-user click landed in the trailing hour. The null-matched
    * row can only be emitted once the watermark proves no matching
    * click can still arrive — so unmatched purchases surface with
    * watermark latency, and state stays bounded exactly as in the
    * inner join.
    */
  def clickPurchaseJoinOuter(
      clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(c, expr(
      """c_user = p_user AND
         click_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts"""),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("click_ts"), col("value"))
  }

  /** Arbitrary keyed state (`flatMapGroupsWithState`, SURVEY §2B closing
    * paragraph): running per-user event count + value total, updated per
    * micro-batch. State is hash-partitioned on `user_id` across
    * executors and carried by the state store — the per-key footprint is
    * one [[UserStat]], so state size scales with |users|, not |events|.
    */
  def userRunningStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserStat(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Same running stats on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed state handles) — the successor to
    * `flatMapGroupsWithState` with composable named state variables,
    * timers, and TTL. Requires the RocksDB state store provider (the
    * store that scales state past executor memory: SST files +
    * changelog checkpointing). Same scale shape as above: state is
    * hash-partitioned on user_id, one fixed-size value per key.
    */
  def userRunningStatsTws(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Streaming incremental near-dup against a PERSISTED band index —
    * the full nightly-ingest loop ([[graft.operators.Dedup.writeBandIndex]]
    * builds the base once; this keeps it current): per micro-batch,
    *
    *  1. probe the index (`Dedup.probeBandIndex`) — candidate work is
    *     O(|batch| × bands × occupancy), never touching base×base;
    *  2. hand the batch's NOVEL docs (no verified base near-dup) to
    *     `onNovel` — the sink that admits them into the corpus;
    *  3. if `growIndex`, append the novel docs' bands + shingles to
    *     the index (`Dedup.appendToBandIndex`, bucket-spec-preserving),
    *     so later batches dedup against earlier ones too.
    *
    * The STREAM carries no state at all — the persisted index IS the
    * state, on disk, surviving restarts and shared with the batch
    * pipeline; `foreachBatch` is the standard bridge for sinks that
    * need batch-only operations (bucketed writes, multi-output).
    * `docs` must carry `doc_id` and `text`.
    */
  /** Streaming embedding ingest against a PERSISTED IVF-PQ index
    * ([[graft.operators.Ann.writePqIndex]] builds the base once; this
    * keeps it current) — the ANN mirror of
    * [[neardupProbeIndexStream]]: per micro-batch,
    *
    *  1. probe the index (`Ann.ivfPqProbe`, batch vectors as queries) —
    *     candidate work reads the bucketed m-byte code table
    *     exchange-free and never re-encodes the accumulated corpus;
    *  2. vectors whose nearest indexed neighbor scores ≥ `simFloor`
    *     are near-duplicates of already-ingested mass and are dropped;
    *     the rest go to `onNovel` (the sink that admits them);
    *  3. if `growIndex`, the novel vectors append to the index under
    *     the FROZEN quantizer (`Ann.appendToPqIndex`,
    *     bucket-spec-preserving), so later batches search against
    *     earlier ones.
    *
    * The stream carries no state — the persisted index IS the state,
    * on disk, shared with the batch pipeline and surviving restarts.
    * `vecs` must carry `vec_id` and `embedding`.
    */
  def annIngestStream(
      vecs: DataFrame,
      indexName: String,
      simFloor: Double,
      growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        annIngestBatch(batch.toDF(), id, indexName, simFloor, growIndex,
          onNovel)
      }
      .start()

  /** One micro-batch of [[annIngestStream]] — replay idempotency
    * (ADVICE r10): with growIndex, deciding novelty by probing the
    * same index the batch then appends to breaks foreachBatch's retry
    * contract — a replay after the append re-probes its own keys and
    * drops the whole admitted set. The batch therefore commits its
    * admitted vec_ids to a batch-id-tagged [[IngestLedger]] BEFORE
    * mutating the index, and a replay reproduces the admitted set from
    * the ledger. Package-private so StreamingSpec can replay a batch
    * under its original id — the exact retry the contract promises.
    */
  private[graft] def annIngestBatch(
      batch: DataFrame, id: Long, indexName: String, simFloor: Double,
      growIndex: Boolean, onNovel: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    val ledger =
      if (growIndex)
        Some(IngestLedger.dirFor(s, s"${indexName}_codes", id))
      else None
    val replayed = ledger.exists(IngestLedger.committed(s, _))
    val novel = (if (replayed)
      batch.join(IngestLedger.read(s, ledger.get),
        Seq("vec_id"), "left_semi")
    else {
      val dup = graft.operators.Ann
        .ivfPqProbe(s, indexName, batch, k = 1)
        .filter(col("sim") >= simFloor)
        .select(col("q_id").as("vec_id")).distinct()
      batch.join(dup, Seq("vec_id"), "left_anti")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!replayed)
        ledger.foreach(IngestLedger.write(novel.select("vec_id"), _))
      onNovel(novel, id)
      if (growIndex && !ledger.exists(IngestLedger.appendDone(s, _))) {
        // a replay re-appends through the guarded variant: the
        // original attempt may have died mid-append, and a blind
        // re-append would duplicate code rows
        if (replayed)
          graft.operators.Ann.appendToPqIndexDedup(novel, indexName)
        else graft.operators.Ann.appendToPqIndex(novel, indexName)
        ledger.foreach(IngestLedger.markAppendDone(s, _))
      }
    } finally novel.unpersist(blocking = false)
  }

  /** Streaming content-novelty gate over a persisted GRAM index
    * ([[graft.operators.Dedup.writeGramIndex]] builds the base once) —
    * the third member of the ingest-loop family (bands suppress
    * near-DUPLICATES, this suppresses near-REDUNDANCE): per
    * micro-batch,
    *
    *  1. the batch's per-doc distinct grams anti-join the stored gram
    *     table (exchange-free on the stored side — the corpus never
    *     re-shuffles or re-shingles);
    *  2. docs whose NOVEL-gram share reaches `minNovelShare` are
    *     admitted via `onAdmit` — a doc that mostly repeats grams the
    *     corpus already holds (boilerplate, syndicated copy, template
    *     spam) drops even when no single stored doc is a near-dup of
    *     it (the case the band index structurally cannot catch);
    *     docs too short to shingle (< 3 tokens) carry no evidence of
    *     novelty and drop;
    *  3. if `growIndex`, the admitted docs' grams fold into the index
    *     ([[graft.operators.Dedup.appendToGramIndex]], distinct- and
    *     bucket-spec-preserving), so later batches measure novelty
    *     against earlier admissions too.
    *
    * The stream carries no state — the persisted index IS the state,
    * on disk, shared with the batch pipeline. `docs` must carry
    * `doc_id` and `text`.
    */
  def gramNoveltyIngestStream(
      docs: DataFrame,
      indexName: String,
      minNovelShare: Double,
      growIndex: Boolean,
      onAdmit: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        gramNoveltyBatch(batch.toDF(), id, indexName, minNovelShare,
          growIndex, onAdmit)
      }
      .start()

  /** One micro-batch of [[gramNoveltyIngestStream]] — replay
    * idempotency (ADVICE r10): with growIndex, a replay after the
    * append would re-probe an index already holding the admitted docs'
    * grams — they'd score zero novelty and silently vanish from
    * onAdmit. Admitted doc_ids commit to a batch-id-tagged
    * [[IngestLedger]] BEFORE the index mutation; a replay reproduces
    * the same admitted set from the ledger. The re-append itself is
    * naturally exact-once here: appendToGramIndex only writes grams
    * the index does not already contain. Package-private so
    * StreamingSpec can replay a batch under its original id.
    */
  private[graft] def gramNoveltyBatch(
      batch: DataFrame, id: Long, indexName: String,
      minNovelShare: Double, growIndex: Boolean,
      onAdmit: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    val ledger =
      if (growIndex)
        Some(IngestLedger.dirFor(s, s"${indexName}_grams", id))
      else None
    val replayed = ledger.exists(IngestLedger.committed(s, _))
    if (replayed) {
      val admitted = batch.join(IngestLedger.read(s, ledger.get),
        Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        onAdmit(admitted, id)
        graft.operators.Dedup.appendToGramIndex(admitted, indexName)
      } finally admitted.unpersist(blocking = false)
    } else {
      val g = graft.operators.Dedup.docGrams(s, batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val tot = g.groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"))
        val nov = g
          .join(s.table(s"${indexName}_grams"), Seq("g"), "left_anti")
          .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
        val admitIds = tot
          .join(nov, Seq("doc_id"), "left")
          .filter(coalesce(col("n_novel"), lit(0L)) >=
            col("n_grams") * lit(minNovelShare))
          .select("doc_id")
        val admitted = batch.join(admitIds, Seq("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          ledger.foreach(
            IngestLedger.write(admitted.select("doc_id"), _))
          onAdmit(admitted, id)
          if (growIndex)
            graft.operators.Dedup.appendToGramIndex(admitted, indexName)
        } finally admitted.unpersist(blocking = false)
      } finally g.unpersist(blocking = false)
    }
  }

  /** Streaming copied-span gate over a persisted SPAN index
    * ([[graft.operators.Dedup.writeSpanIndex]] builds the release's
    * positioned-gram table once) — the fourth ingest-loop family
    * member (bands suppress near-DUPLICATES, grams suppress
    * near-REDUNDANCE, this suppresses VERBATIM REUSE): per
    * micro-batch, every doc's longest copied span against the stored
    * release is measured ([[graft.operators.Dedup.probeSpanIndex]] —
    * stored side exchange-free), and docs whose span reaches
    * `maxSpanTokens` drop (a quote that long is re-ingested release
    * content — the Lee et al. dedup rule at ingest time); the rest go
    * to `onAdmit`. The index is WRITE-ONCE (df_gk is materialized at
    * build — no grow knob), so the loop is replay-idempotent by
    * construction: a retried batch re-probes an unchanged store and
    * reproduces the same admitted set without any ledger.
    */
  def spanDupIngestStream(
      docs: DataFrame,
      indexName: String,
      maxSpanTokens: Int,
      onAdmit: (DataFrame, Long) => Unit): streaming.StreamingQuery = {
    // spans shorter than the probe's seed grams are invisible — a gate
    // configured below the seed length would silently never fire
    // (ADVICE r11); the same require guards substringDupSpans, but this
    // call reaches probeSpanIndex directly with its default seedLen = 5
    require(maxSpanTokens >= 5,
      s"maxSpanTokens must be >= seedLen (5): $maxSpanTokens")
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = batch.sparkSession
        val toks = batch.toDF()
          .withColumn("toks",
            graft.operators.TextAnalysis.tokens(col("text")))
        val hit = graft.operators.Dedup
          .probeSpanIndex(s, indexName, toks,
            minSpan = maxSpanTokens)
          .select(col("da").as("doc_id")).distinct()
        val admitted = batch.toDF().join(hit, Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try onAdmit(admitted, id)
        finally {
          admitted.unpersist(blocking = false)
          graft.operators.Q.releaseManaged()
        }
      }
      .start()
  }

  /** Streaming coreset admission — the fifth index-growing ingest loop
    * (bands/grams/PQ/spans suppress REDUNDANCE; this curates for
    * DIVERSITY): fixed-radius online k-center (the streaming
    * relaxation of q182's greedy traversal — admit a point iff it is
    * farther than sqrt(r2) from every admitted center). Per
    * micro-batch: the store gate is one broadcast-centers scan (the
    * packing argument bounds the center count, so the stored side
    * always broadcasts), the declared within-batch greedy runs on the
    * gate's survivors in ascending vec_id order, admitted ids commit
    * to the batch-id-tagged [[IngestLedger]] BEFORE the center table
    * grows, and a replayed batch reproduces its admitted set from the
    * ledger with the append guarded against double-writes — the same
    * replay-idempotency contract the other four loops carry
    * (StreamingSpec replays a batch under its original id).
    */
  def coresetIngestStream(
      vecs: DataFrame,
      indexName: String,
      r2: Double,
      onAdmit: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        coresetIngestBatch(batch.toDF(), id, indexName, r2, onAdmit)
      }
      .start()

  /** Score-gated diversity admission (VERDICT r12 ask #8) — the actual
    * curation deployment shape: q183's fitted linear probe gates each
    * arriving embedding FIRST (cheap, stateless, map-only — the same
    * [[probeGateStream]] scoring expression, so the composed gate
    * cannot drift from the standalone one), and only the keepers enter
    * the coreset admission ([[coresetIngestBatch]] — fixed-radius
    * online k-center against the persisted center store). Quality
    * cuts before diversity: the probe drop is per-row and free, while
    * a coreset admission permanently occupies a center slot — gating
    * after would let low-quality outliers crowd the center store.
    *
    * Replay idempotency is inherited intact: the probe gate is a
    * deterministic pure function of the row, so a replayed batch
    * re-derives the identical keeper set, and the coreset loop's
    * batch-id ledger then reproduces the admitted set and guards the
    * center append exactly as in the ungated loop (StreamingSpec
    * replays a gated batch under its original id).
    */
  def gatedCoresetIngestStream(
      vecs: DataFrame,
      indexName: String,
      r2: Double,
      w: Array[Double],
      b: Double,
      onAdmit: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        gatedCoresetIngestBatch(batch.toDF(), id, indexName, r2, w, b,
          onAdmit)
      }
      .start()

  /** One micro-batch of [[gatedCoresetIngestStream]] — package-private
    * so StreamingSpec can replay a batch under its original id.
    */
  private[graft] def gatedCoresetIngestBatch(batch: DataFrame, id: Long,
      indexName: String, r2: Double, w: Array[Double], b: Double,
      onAdmit: (DataFrame, Long) => Unit): Unit =
    // own ledger namespace: a gated and an ungated loop sharing one
    // center store must never read each other's batch ledgers (the
    // corpus_pipeline isolation argument — both checkpoints count
    // batches from 0, so untagged they'd collide on batch ids and
    // 'replay' the other loop's admitted set)
    coresetIngestBatch(
      probeGateStream(batch, w, b).filter(col("keep") === 1L),
      id, indexName, r2, onAdmit, ledgerTag = Some("gated_coreset"))

  /** One micro-batch of [[coresetIngestStream]] — package-private so
    * StreamingSpec can replay a batch under its original id.
    */
  private[graft] def coresetIngestBatch(batch: DataFrame, id: Long,
      indexName: String, r2: Double,
      onAdmit: (DataFrame, Long) => Unit,
      ledgerTag: Option[String] = None): Unit = {
    val s = batch.sparkSession
    val table = s"${indexName}_centers"
    val ledger = ledgerTag
      .map(IngestLedger.dirFor(s, table, id, _))
      .getOrElse(IngestLedger.dirFor(s, table, id))
    val replayed = IngestLedger.committed(s, ledger)
    val admitted = (if (replayed)
      batch.select(col("vec_id"), col("embedding"))
        .join(IngestLedger.read(s, ledger), Seq("vec_id"), "left_semi")
    else graft.operators.Learn.coresetAdmit(batch, indexName, r2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!replayed)
        IngestLedger.write(admitted.select("vec_id"), ledger)
      onAdmit(admitted, id)
      if (!IngestLedger.appendDone(s, ledger)) {
        // a replay's original attempt may have died mid-append: guard
        // with a vec_id anti-join so center rows never duplicate; the
        // guard must see CURRENT table state (a replay usually runs in
        // a different session than the append it guards against —
        // Dedup.appendToBandIndexDedup's hazard note)
        s.catalog.refreshTable(table)
        admitted
          .join(s.table(table).select("vec_id"), Seq("vec_id"),
            "left_anti")
          .write.mode("append").insertInto(table)
        IngestLedger.markAppendDone(s, ledger)
      }
    } finally {
      admitted.unpersist(blocking = false)
      graft.operators.Q.releaseManaged()
    }
  }

  /** Streaming PII gate — q167's scrub as an ingest-time transform:
    * redact every PII pattern in `textCol` (the shared
    * [[graft.operators.TextAnalysis.piiScrub]] chain — one definition
    * with the batch audit, so the two modes cannot drift) and keep a
    * per-row `pii_hits` count plus the `pii_clean` zero-residual bit.
    * Like [[decontaminateStream]], this is completely STATELESS —
    * map-only codegen'd regex projections, no watermark, no state
    * store, no shuffle — so it runs identically over a batch frame and
    * a readStream micro-batch at any throughput (StreamingSpec asserts
    * batch ≡ stream on the same rows).
    */
  /** Streaming quality gate — q183's fitted linear probe applied at
    * ingest time: score every arriving embedding under the trained
    * (w, b) (the weights ride the plan as literals — the nightly-loop
    * split: heavy training in batch via [[graft.operators.Learn
    * .probeFit]], cheap application in the stream) and emit the
    * floor-micro score plus the `keep` bit at the declared 0.5
    * threshold. The scoring expression is [[graft.operators.Learn
    * .probeScore]] — ONE definition with the batch gate, so the two
    * modes cannot drift. Completely STATELESS — map-only fold, no
    * watermark, no state store, no shuffle — so it runs identically
    * over a batch frame and a readStream micro-batch (StreamingSpec
    * asserts batch ≡ stream on the same rows).
    */
  def probeGateStream(vecs: DataFrame, w: Array[Double], b: Double,
      embCol: String = "embedding"): DataFrame = {
    graft.functions.VectorFunctions.register(vecs.sparkSession)
    vecs
      // staged so the score fold evaluates once per row
      .withColumn("sc", graft.operators.Learn.probeScore(col(embCol), w, b))
      .withColumn("score_micro", floor(col("sc") * lit(1e6)).cast("long"))
      .withColumn("keep", (col("sc") >= lit(0.5)).cast("long"))
      .drop("sc")
  }

  def piiScrubStream(docs: DataFrame, textCol: String): DataFrame = {
    val t = graft.operators.TextAnalysis
    docs
      .withColumn("pii_hits", t.piiCount(col(textCol)).cast("long"))
      .withColumn(textCol, t.piiScrub(col(textCol)))
      .withColumn("pii_clean",
        (t.piiCount(col(textCol)) === 0).cast("long"))
  }

  /** Streaming boilerplate-line scrub — q173's cut at ingest time:
    * the corpus pass (q173) finds the boilerplate line set (lines in
    * ≥ minDf docs — small by construction, it's the HAVING-bounded
    * side q173 broadcasts); this applies it to arriving documents,
    * removing every line whose exact text is in the set and keeping a
    * per-row `lines_removed` count. The set rides the plan as a
    * literal IN-list (the nightly-loop split: heavy corpus statistics
    * in batch, cheap application in the stream — the q101 bloom gate's
    * pattern). Like [[piiScrubStream]], completely STATELESS — map-only
    * split/filter/rejoin HOFs, no watermark, no state store, no
    * shuffle — so batch and stream modes cannot drift (StreamingSpec
    * asserts batch ≡ stream on the same rows).
    */
  def lineScrubStream(
      docs: DataFrame, boilerLines: Seq[String],
      textCol: String, sep: String = "\n"): DataFrame = {
    if (boilerLines.isEmpty) return docs
      .withColumn("lines_removed", lit(0L))
    docs
      .withColumn("__lines", split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .withColumn("lines_removed",
        size(filter(col("__lines"),
          l => l.isInCollection(boilerLines))).cast("long"))
      .withColumn(textCol,
        array_join(filter(col("__lines"),
          l => !l.isInCollection(boilerLines)), sep))
      .drop("__lines")
  }

  /** Configuration of the composed nightly ingest loop
    * ([[corpusIngestStream]]): the three persisted index families the
    * chain reads (band = near-dup suppression, gram = novelty floor,
    * span = verbatim-reuse gate; the span index is write-once, the
    * other two grow with admissions when `growIndexes`), the corpus
    * boilerplate line set the line scrub applies, and the two gate
    * thresholds.
    */
  final case class CorpusIngestConfig(
      bandIndex: String,
      gramIndex: String,
      spanIndex: String,
      boilerLines: Seq[String],
      maxSpanTokens: Int = 10,
      minNovelShare: Double = 0.5,
      growIndexes: Boolean = true,
      // optional stages 6-7 (VERDICT r13 ask #7), both requiring an
      // `embedding` column on the batch: the q183 probe gate drops
      // low-quality survivors after the gram gate (quality cuts before
      // a center slot is spent — gatedCoresetIngestStream's argument,
      // now inside the composed chain), and the coreset stage admits
      // diverse survivors as centers of `<coresetIndex>_centers` under
      // the SAME single ledger commit (the ledger gains a `center`
      // marker column; zero duplicate center rows across replays)
      probeWeights: Option[(Array[Double], Double)] = None,
      coresetIndex: Option[String] = None,
      coresetR2: Double = 1.0,
      // optional per-family rebuild scheduling (VERDICT r13 ask #8):
      // every `maintainEvery` batches the loop reads the q192
      // staleness report for the band family AFTER the batch's appends
      // commit; if the rebuild bit trips, the actuator
      // (IndexMaintenance.rebuildFamily) rebuilds the store in place
      // from `rebuildCorpus()` — the caller's view of the CURRENT
      // corpus (base + admitted docs) — between micro-batches.
      // `onRebuild(family, batchId)` observes each firing (specs
      // assert exactly-once). Admission semantics are unchanged
      // across the swap: the rebuilt store holds the same docs, the
      // ledger is untouched, and every guarded append re-reads
      // current table state.
      maintainEvery: Int = 0,
      bandStorePath: Option[String] = None,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None)

  /** The composed streaming ingest pipeline (VERDICT r12 ask #2) — the
    * nightly loop a deployment actually runs, chaining the existing
    * gates over ONE micro-batch stream with ONE admitted set and ONE
    * [[IngestLedger]] commit per batch:
    *
    *   1. PII scrub            ([[piiScrubStream]] — stateless
    *                            transform, q167's shared chain)
    *   2. boilerplate-line cut ([[lineScrubStream]] — stateless,
    *                            q173's corpus line set as a literal)
    *   3. span gate            (probe the write-once span index; a doc
    *                            quoting ≥ maxSpanTokens of the stored
    *                            release drops — Lee et al. at ingest)
    *   4. band near-dup gate   (probe the band index; near-dups of the
    *                            corpus OR of earlier admissions drop)
    *   5. gram novelty gate    (novel-gram share ≥ minNovelShare —
    *                            boilerplate-shaped redundance drops
    *                            even when no single doc is a near-dup)
    *   6. probe quality gate   (OPTIONAL, `probeWeights` — q183's
    *                            fitted linear probe over the batch's
    *                            `embedding` column; stateless map-only)
    *   7. coreset admission    (OPTIONAL, `coresetIndex` — survivors'
    *                            embeddings through the fixed-radius
    *                            online k-center against the persisted
    *                            center store; picks ride the SAME
    *                            ledger commit as a `center` marker
    *                            column, VERDICT r13 ask #7)
    *
    * Stage order is the batch release pipeline's cost order
    * ([[graft.operators.Pipeline]] q100): the map-only scrubs run
    * before anything shuffles, the cheapest index probe (span —
    * bounded-df seed grams) cuts before the shingle-heavy band probe,
    * and the gram scan sees only survivors.
    *
    * Replay idempotency is END-TO-END, not per gate: the chain decides
    * the batch's admitted set, commits the doc_ids ONCE to a
    * batch-id-tagged ledger (namespaced `corpus_pipeline`, anchored at
    * the band index's shingle table), and only then mutates the two
    * growable indexes. A replayed batch re-applies the deterministic
    * scrubs (stateless — identical text), reproduces the admitted set
    * from the ledger WITHOUT re-probing any index (the indexes may
    * already contain the batch's own keys), and re-runs the appends
    * through the guarded variants so no band/shingle/gram row ever
    * duplicates — the same contract the standalone loops carry, now
    * with one ledger across all grown indexes.
    *
    * The admitted frame handed to `onAdmit` carries the SCRUBBED text
    * plus the scrub audit columns (`pii_hits`, `pii_clean`,
    * `lines_removed`); the indexes likewise grow on scrubbed text, so
    * batch attempts can never disagree about what was indexed.
    */
  def corpusIngestStream(
      docs: DataFrame,
      cfg: CorpusIngestConfig,
      onAdmit: (DataFrame, Long) => Unit): streaming.StreamingQuery = {
    require(cfg.maxSpanTokens >= 5,
      s"maxSpanTokens must be >= seedLen (5): ${cfg.maxSpanTokens}")
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        corpusIngestBatch(batch.toDF(), id, cfg, onAdmit)
      }
      .start()
  }

  /** One micro-batch of [[corpusIngestStream]] — package-private so
    * StreamingSpec can (a) run it over a static frame (batch mode —
    * one definition, two modes) and (b) replay a batch under its
    * original id, the exact retry foreachBatch promises.
    */
  private[graft] def corpusIngestBatch(
      batch: DataFrame, id: Long, cfg: CorpusIngestConfig,
      onAdmit: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    // startup/retry recovery BEFORE any probe touches the family's
    // tables (ADVICE r15): a rebuild that crashed in its catalog or
    // rename window must not wedge the loop — healthy catalog = no-op
    if (cfg.maintainEvery > 0)
      for (path <- cfg.bandStorePath; corpus <- cfg.rebuildCorpus)
        graft.operators.IndexMaintenance.recoverFamily(
          s, "band", cfg.bandIndex, path, corpus())
    val ledger = IngestLedger.dirFor(
      s, s"${cfg.bandIndex}_shingles", id, tag = "corpus_pipeline")
    val replayed = IngestLedger.committed(s, ledger)
    // stages 1-2: deterministic stateless transforms — re-applied on
    // replay, byte-identical text
    val scrubbed = lineScrubStream(
      piiScrubStream(batch, "text"), cfg.boilerLines, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stage-5 gram frame: persisted for its two consumers (total and
    // novel counts); released with the batch, AFTER the admitted set
    // materializes (an early unpersist would silently recompute the
    // shingling on the first action)
    var g: Option[DataFrame] = None
    try {
      // stage 6 (optional): the q183 probe gate — deterministic
      // stateless scoring, so it re-applies identically on replay
      // (either as the gate or as pure column re-derivation over the
      // ledgered set — probeGateStream is ONE definition either way)
      def probeScored(df: DataFrame): DataFrame =
        cfg.probeWeights.fold(df) { case (w, b) =>
          probeGateStream(df, w, b) }
      val admitted = (if (replayed)
        probeScored(scrubbed.join(IngestLedger.read(s, ledger),
          Seq("doc_id"), "left_semi"))
      else {
        // stage 3: span gate against the write-once release index
        val toks = scrubbed.withColumn("toks",
          graft.operators.TextAnalysis.tokens(col("text")))
        val spanHit = graft.operators.Dedup
          .probeSpanIndex(s, cfg.spanIndex, toks,
            minSpan = cfg.maxSpanTokens)
          .select(col("da").as("doc_id")).distinct()
        val s3 = scrubbed.join(spanHit, Seq("doc_id"), "left_anti")
        // stage 4: band near-dup gate (stored side exchange-free)
        val dup = graft.operators.Dedup
          .probeBandIndex(s, cfg.bandIndex, s3)
          .select(col("db").as("doc_id")).distinct()
        val s4 = s3.join(dup, Seq("doc_id"), "left_anti")
        // stage 5: gram novelty floor (the gramNoveltyBatch predicate)
        val grams = graft.operators.Dedup.docGrams(s, s4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        g = Some(grams)
        val tot = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val nov = grams
          .join(s.table(s"${cfg.gramIndex}_grams"), Seq("g"),
            "left_anti")
          .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
        val admitIds = tot
          .join(nov, Seq("doc_id"), "left")
          .filter(coalesce(col("n_novel"), lit(0L)) >=
            col("n_grams") * lit(cfg.minNovelShare))
          .select("doc_id")
        // the semi-join keeps the scrub columns on the admitted frame;
        // stage 6 then drops probe-gate failures (quality cuts before
        // anything is indexed or a center slot is spent)
        val s5 = probeScored(s4.join(admitIds, Seq("doc_id"), "left_semi"))
        if (cfg.probeWeights.isDefined) s5.filter(col("keep") === 1L)
        else s5
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // stage 7 (optional): coreset admission over the admitted
        // survivors' embeddings. On replay the center set comes from
        // the ledger's marker column — the center store may already
        // hold this batch's centers, so admission must NOT re-run.
        val centers = cfg.coresetIndex.map { cs =>
          val vecs = admitted
            .select(col("doc_id").as("vec_id"), col("embedding"))
          if (replayed) {
            // a ledger written BEFORE the coreset stage was enabled
            // (config upgraded between runs) has no `center` marker
            // column — that batch spent no center slots, so its replay
            // reproduces ZERO centers rather than failing the read
            // (ADVICE r14)
            val led = IngestLedger.read(s, ledger)
            val centerIds =
              if (led.columns.contains("center"))
                led.filter(col("center") === 1L)
              else led.limit(0)
            vecs.join(centerIds.select(col("doc_id").as("vec_id")),
              Seq("vec_id"), "left_semi")
          }
          else graft.operators.Learn.coresetAdmit(vecs, cs, cfg.coresetR2)
        }.map(_.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        try {
          // ONE commit for the whole chain, BEFORE any index mutation —
          // the center picks ride the same ledger as a marker column
          if (!replayed) {
            val ids = admitted.select("doc_id")
            val ledgerFrame = centers.fold(ids) { c =>
              ids.join(c.select(col("vec_id").as("doc_id"),
                  lit(1L).as("center")), Seq("doc_id"), "left")
                .select(col("doc_id"),
                  coalesce(col("center"), lit(0L)).as("center"))
            }
            IngestLedger.write(ledgerFrame, ledger)
          }
          onAdmit(admitted, id)
          if (cfg.growIndexes && !IngestLedger.appendDone(s, ledger)) {
            // a replay's original attempt may have died between the
            // appends: the band append takes the row-guarded variant on
            // replay, the gram append is naturally exact-once (it only
            // writes grams the index does not already hold), and the
            // center append is anti-join-guarded against current table
            // state — zero duplicate rows in any index across replays
            if (replayed)
              graft.operators.Dedup
                .appendToBandIndexDedup(admitted, cfg.bandIndex)
            else
              graft.operators.Dedup
                .appendToBandIndex(admitted, cfg.bandIndex)
            graft.operators.Dedup
              .appendToGramIndex(admitted, cfg.gramIndex)
            centers.foreach { c =>
              val table = s"${cfg.coresetIndex.get}_centers"
              s.catalog.refreshTable(table)
              c.join(s.table(table).select("vec_id"), Seq("vec_id"),
                  "left_anti")
                .write.mode("append").insertInto(table)
            }
            IngestLedger.markAppendDone(s, ledger)
          }
        } finally centers.foreach(_.unpersist(blocking = false))
      } finally admitted.unpersist(blocking = false)
      // scheduled maintenance (ask #8): after this batch's appends are
      // durable, read the staleness report every `maintainEvery`
      // batches and actuate a rebuild when the bit trips — the
      // between-micro-batches window is the loop's natural
      // single-writer maintenance slot
      if (cfg.maintainEvery > 0 && (id + 1) % cfg.maintainEvery == 0)
        for (path <- cfg.bandStorePath; corpus <- cfg.rebuildCorpus) {
          import graft.operators.IndexMaintenance
          val row = IndexMaintenance.stalenessReport(s, Seq(
            IndexMaintenance.FamilySpec("band",
              s"${cfg.bandIndex}_shingles"))).collect().head
          if (row.getLong(6) == 1L) {
            IndexMaintenance.rebuildFamily(
              s, "band", cfg.bandIndex, path, corpus())
            cfg.onRebuild.foreach(_("band", id))
          }
        }
    } finally {
      g.foreach(_.unpersist(blocking = false))
      scrubbed.unpersist(blocking = false)
      // probeBandIndex managed-persists the batch shingles per batch
      graft.operators.Q.releaseManaged()
    }
  }

  /** Streaming perceptual MEDIA near-dup ingest — the band-index loop's
    * shape for the multimodal column: each micro-batch of binary
    * assets is hashed modality-dispatched ([[graft.operators.MultiModal
    * .mediaHashOf]]: dHash for images, envelope hash for audio — one
    * 64-bit space), probed against the persisted phash index (the
    * bucketed `bk` store side never shuffles), and an asset is
    * admitted only when it has NO near-dup within Hamming ≤ 3 in the
    * store OR earlier in its own micro-batch — intra-batch pairs run
    * through the same [[graft.operators.MultiModal.perceptualPairs]]
    * banding and the LOWER asset_id of each pair wins (deterministic;
    * without it two near-dup assets arriving together would both be
    * admitted and the near-dup rows would live in the store forever —
    * ADVICE r14). `growIndex` folds admissions in so the NEXT batch
    * dedups against them too — with the same batch-id ledger replay
    * contract as every grown index (commit admitted ids before
    * mutation; a replay reproduces the set from the ledger and
    * re-appends through the asset-guarded variant, so no banded row
    * ever duplicates). An UNDECODABLE asset has no hash, so it is
    * admitted and never indexed — perceptual identity cannot be
    * computed for it, and byte-identical re-uploads are the content-
    * digest scan's job (q136), not this loop's.
    *
    * Optional scheduled maintenance (the band loop's r13-ask-#8
    * discipline applied to the media family, VERDICT r14 ask #2):
    * every `maintainEvery` batches, after the appends are durable, the
    * loop reads the q192 staleness row for the phash family and — when
    * the rebuild bit trips — runs [[graft.operators.IndexMaintenance
    * .rebuildFamily]] from `rebuildCorpus()` (the caller's (asset_id,
    * hash) view of the CURRENT media corpus) between micro-batches.
    * Admission semantics are unchanged across the swap: same assets in
    * the rebuilt store, ledgers carried, guarded appends re-read
    * current state.
    */
  def mediaIngestStream(
      assets: DataFrame,
      indexName: String,
      growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit,
      maintainEvery: Int = 0,
      storePath: Option[String] = None,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None): streaming.StreamingQuery =
    assets.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        mediaIngestBatch(batch.toDF(), id, indexName, growIndex, onNovel,
          maintainEvery, storePath, rebuildCorpus, onRebuild)
      }
      .start()

  /** One micro-batch of [[mediaIngestStream]] — package-private so
    * StreamingSpec can replay a batch under its original id.
    */
  private[graft] def mediaIngestBatch(
      batch: DataFrame, id: Long, indexName: String, growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit,
      maintainEvery: Int = 0,
      storePath: Option[String] = None,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    // startup/retry recovery BEFORE the probe (ADVICE r15): a rebuild
    // that crashed in its catalog/rename window must not wedge the
    // loop — healthy catalog = no-op
    if (maintainEvery > 0)
      for (path <- storePath; corpus <- rebuildCorpus)
        graft.operators.IndexMaintenance.recoverFamily(
          s, "phash", indexName, path, corpus())
    val ledger =
      if (growIndex)
        Some(IngestLedger.dirFor(s, s"${indexName}_phash", id))
      else None
    val replayed = ledger.exists(IngestLedger.committed(s, _))
    // the hash stage is deterministic (exact integer comparisons over
    // decoded bytes), so replays re-derive identical hashes
    val hashes = graft.operators.MultiModal.mediaHashOf(
        batch.as[graft.operators.MediaAsset])
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val novel = (if (replayed)
        batch.join(IngestLedger.read(s, ledger.get),
          Seq("asset_id"), "left_semi")
      else {
        val dup = graft.operators.MultiModal
          .probePhashIndex(s, indexName, hashes)
          .select(col("b").as("asset_id")).distinct()
        // intra-batch near-dups (ADVICE r14): perceptualPairs returns
        // (a, b) with a < b, so dropping every b keeps the LOWEST
        // asset_id of each pair — two near-dup assets arriving in the
        // same micro-batch admit exactly one
        val intra = graft.operators.MultiModal
          .perceptualPairs(hashes)
          .select(col("b").as("asset_id")).distinct()
        batch.join(dup.unionByName(intra).distinct(),
          Seq("asset_id"), "left_anti")
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (!replayed)
          ledger.foreach(IngestLedger.write(novel.select("asset_id"), _))
        onNovel(novel, id)
        if (growIndex && !ledger.exists(IngestLedger.appendDone(s, _))) {
          val novelHashes = hashes
            .join(novel.select("asset_id"), Seq("asset_id"), "left_semi")
          if (replayed)
            graft.operators.MultiModal
              .appendToPhashIndexDedup(novelHashes, indexName)
          else
            graft.operators.MultiModal
              .appendToPhashIndex(novelHashes, indexName)
          ledger.foreach(IngestLedger.markAppendDone(s, _))
        }
      } finally novel.unpersist(blocking = false)
      // scheduled maintenance (VERDICT r14 ask #2 — the band loop's
      // r13-ask-#8 window for the media family): after this batch's
      // appends are durable, read the staleness row every
      // `maintainEvery` batches and actuate the rebuild when the bit
      // trips — between micro-batches is the loop's single-writer slot
      if (maintainEvery > 0 && (id + 1) % maintainEvery == 0)
        for (path <- storePath; corpus <- rebuildCorpus) {
          import graft.operators.IndexMaintenance
          val row = IndexMaintenance.stalenessReport(s, Seq(
            IndexMaintenance.FamilySpec("phash",
              s"${indexName}_phash"))).collect().head
          if (row.getLong(6) == 1L) {
            IndexMaintenance.rebuildFamily(
              s, "phash", indexName, path, corpus())
            onRebuild.foreach(_("phash", id))
          }
        }
    } finally hashes.unpersist(blocking = false)
  }

  /** Streaming VIDEO ingest — [[mediaIngestStream]]'s discipline at
    * the FRAME grain: each micro-batch of video assets is frame-hashed
    * ([[graft.operators.MultiModal.videoFrameHashes]], map-only),
    * probed against the persisted video index
    * ([[graft.operators.MultiModal.probeVideoIndex]] — batch-side
    * containment over the exchange-free bucketed store), and a video
    * is admitted only when
    *
    *  - NO stored asset already holds ≥ ⌈`minSharedFrac` × its frame
    *    count⌉ of its frames (re-encodes, clips, and light edits of
    *    stored content drop; genuinely new footage passes), and
    *  - no earlier video IN THE SAME BATCH duplicates it: intra-batch
    *    pairs run through
    *    [[graft.operators.MultiModal.videoPairsHigherSide]] — the
    *    HIGHER asset of a pair drops when the shared frames cover ≥
    *    ⌈`minSharedFrac` × ITS OWN frame count⌉ (the same self-
    *    relative containment the store probe uses; measuring against
    *    the lower side would discard a long novel video because a
    *    short clip of it sorted first), lower asset_id wins.
    *
    * Ledger replay contract identical to the other grown indexes
    * (commit admitted ids before mutation, tag-namespaced so a media
    * loop on the same store family never shares a ledger; replays
    * reproduce the set and re-append through the fid-guarded variant).
    * A video with NO decodable frames is admitted and never indexed —
    * the media loop's undecodable-asset rule at frame grain.
    * The optional maintenance window mirrors the media loop — the
    * video store IS the phash family, so catalog repair, the q192
    * staleness row, and the rebuild actuator apply unchanged
    * (`rebuildCorpus()` returns the CURRENT corpus as a raw
    * (asset_id, frame_idx, hash) frame).
    */
  def videoIngestStream(
      assets: DataFrame,
      indexName: String,
      growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit,
      minSharedFrac: Double = 0.5,
      maintainEvery: Int = 0,
      storePath: Option[String] = None,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None): streaming.StreamingQuery =
    assets.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        videoIngestBatch(batch.toDF(), id, indexName, growIndex, onNovel,
          minSharedFrac, maintainEvery, storePath, rebuildCorpus,
          onRebuild)
      }
      .start()

  /** One micro-batch of [[videoIngestStream]] — package-private so
    * StreamingSpec can replay a batch under its original id.
    */
  private[graft] def videoIngestBatch(
      batch: DataFrame, id: Long, indexName: String, growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit,
      minSharedFrac: Double = 0.5,
      maintainEvery: Int = 0,
      storePath: Option[String] = None,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    import graft.operators.MultiModal
    // startup/retry recovery BEFORE the probe (ADVICE r15) — the
    // media loop's discipline at frame grain
    if (maintainEvery > 0)
      for (path <- storePath; corpus <- rebuildCorpus)
        graft.operators.IndexMaintenance.recoverFamily(
          s, "phash", indexName, path, MultiModal.packFids(corpus()))
    val ledger =
      if (growIndex)
        Some(IngestLedger.dirFor(s, s"${indexName}_phash", id,
          tag = "video_ingest"))
      else None
    val replayed = ledger.exists(IngestLedger.committed(s, _))
    val fh = MultiModal.videoFrameHashes(
        batch.as[graft.operators.MediaAsset])
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val novel = (if (replayed)
        batch.join(IngestLedger.read(s, ledger.get),
          Seq("asset_id"), "left_semi")
      else {
        val nf = fh.groupBy("asset_id").agg(count(lit(1)).as("nf"))
        val storeDup = MultiModal.probeVideoIndex(s, indexName, fh)
          .groupBy("b").agg(max("matched").as("mx"))
          .join(nf.select(col("asset_id").as("b"), col("nf")), "b")
          .filter(col("mx") >= ceil(lit(minSharedFrac) * col("nf")))
          .select(col("b").as("asset_id"))
        // the intra-batch containment is measured against the asset
        // that would be DROPPED (the higher id), exactly like the
        // store probe measures the arriving asset — thresholding on
        // the lower side would discard a long novel video because a
        // short clip of it sorted first (ADVICE r15)
        val intra = MultiModal.videoPairsHigherSide(fh)
          .join(nf.select(col("asset_id").as("b"), col("nf").as("nb")),
            "b")
          .filter(col("matched") >=
            ceil(lit(minSharedFrac) * col("nb")))
          .select(col("b").as("asset_id"))
        batch.join(storeDup.unionByName(intra).distinct(),
          Seq("asset_id"), "left_anti")
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (!replayed)
          ledger.foreach(IngestLedger.write(novel.select("asset_id"), _))
        onNovel(novel, id)
        if (growIndex && !ledger.exists(IngestLedger.appendDone(s, _))) {
          val novelFh = fh
            .join(novel.select("asset_id"), Seq("asset_id"), "left_semi")
          if (replayed)
            MultiModal.appendToVideoIndexDedup(novelFh, indexName)
          else MultiModal.appendToVideoIndex(novelFh, indexName)
          ledger.foreach(IngestLedger.markAppendDone(s, _))
        }
      } finally novel.unpersist(blocking = false)
      if (maintainEvery > 0 && (id + 1) % maintainEvery == 0)
        for (path <- storePath; corpus <- rebuildCorpus) {
          import graft.operators.IndexMaintenance
          val row = IndexMaintenance.stalenessReport(s, Seq(
            IndexMaintenance.FamilySpec("phash",
              s"${indexName}_phash"))).collect().head
          if (row.getLong(6) == 1L) {
            IndexMaintenance.rebuildFamily(s, "phash", indexName, path,
              MultiModal.packFids(corpus()))
            onRebuild.foreach(_("phash", id))
          }
        }
    } finally fh.unpersist(blocking = false)
  }

  /** Incremental connected-components maintenance over a stream of
    * directed edges — the graph family's ingest-loop member (bands
    * suppress near-dups, grams redundance, spans verbatim reuse; this
    * keeps the LINK-GRAPH component state current as a crawl
    * discovers edges). Per micro-batch the persistent star store
    * absorbs the batch ([[graft.operators.Graph.mergeComponentStore]]
    * — cost tracks |stars| + |batch|, the raw edge history is never
    * re-read), then `onMerged` receives the post-merge census
    * ([[graft.operators.Graph.storeCensus]]). UNIQUELY among the
    * ingest loops this one needs NO replay ledger: the merge is
    * idempotent by the star identity (contract(stars(G) ∪ E) =
    * stars(G ∪ E), so re-merging an absorbed batch rewrites the
    * byte-identical fixpoint) — there is no bookkeeping to get wrong,
    * and StreamingSpec replays a batch to pin it.
    */
  def ccIngestStream(
      edges: DataFrame,
      storeName: String,
      path: String,
      onMerged: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    edges.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        ccIngestBatch(batch.toDF(), id, storeName, path, onMerged)
      }
      .start()

  /** One micro-batch of [[ccIngestStream]] — package-private so
    * StreamingSpec can replay a batch under its original id.
    */
  private[graft] def ccIngestBatch(
      batch: DataFrame, id: Long, storeName: String, path: String,
      onMerged: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    graft.operators.Graph.mergeComponentStore(s, batch, storeName, path)
    onMerged(graft.operators.Graph.storeCensus(s, storeName), id)
  }

  def neardupProbeIndexStream(
      docs: DataFrame,
      indexName: String,
      growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        neardupProbeBatch(batch.toDF(), id, indexName, growIndex, onNovel)
      }
      .start()

  /** One micro-batch of [[neardupProbeIndexStream]] — same replay-
    * idempotency ledger as the gram/ANN loops (ADVICE r10): commit
    * novel doc_ids before the index mutation; a replay reproduces the
    * set from the ledger, and re-appends through the doc-guarded
    * variant (a blind re-append would duplicate band/shingle rows and
    * corrupt jaccard counts). Package-private so StreamingSpec can
    * replay a batch under its original id.
    */
  private[graft] def neardupProbeBatch(
      batch: DataFrame, id: Long, indexName: String, growIndex: Boolean,
      onNovel: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    val ledger =
      if (growIndex)
        Some(IngestLedger.dirFor(s, s"${indexName}_shingles", id))
      else None
    val replayed = ledger.exists(IngestLedger.committed(s, _))
    val novel = (if (replayed)
      batch.join(IngestLedger.read(s, ledger.get),
        Seq("doc_id"), "left_semi")
    else {
      val dup = graft.operators.Dedup
        .probeBandIndex(s, indexName, batch)
        .select(col("db").as("doc_id")).distinct()
      batch.join(dup, Seq("doc_id"), "left_anti")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!replayed)
        ledger.foreach(IngestLedger.write(novel.select("doc_id"), _))
      onNovel(novel, id)
      if (growIndex && !ledger.exists(IngestLedger.appendDone(s, _))) {
        if (replayed)
          graft.operators.Dedup.appendToBandIndexDedup(novel, indexName)
        else graft.operators.Dedup.appendToBandIndex(novel, indexName)
        ledger.foreach(IngestLedger.markAppendDone(s, _))
      }
    } finally {
      novel.unpersist(blocking = false)
      // probeBandIndex managed-persists the batch shingles; this
      // loop is the only consumer, so release per batch
      graft.operators.Q.releaseManaged()
    }
  }

  /** Config for the TEXT-RETRIEVAL index ingest loop — the lifecycle
    * the lexical (BM25) and positional families were missing (VERDICT
    * r15 ask #7). The two families get DIFFERENT treatments, each
    * deliberate:
    *
    *  - '''positional''': guarded APPEND per batch — a posting
    *    (t, doc_id, pos) is doc-local with no frozen corpus statistic,
    *    so appending new docs' postings is semantically exact (the
    *    band/gram discipline; replay goes through the doc-guarded
    *    variant, fragmentation through `compactBucketed`);
    *  - '''lexical''': REBUILD-ONLY — df and avgdl freeze at build, so
    *    an append would serve BM25 scores mixing old statistics with
    *    new postings (silently wrong ranks, not stale ranks). The loop
    *    never appends it; instead the maintenance window reads the
    *    q192 staleness row (rows_now = the CURRENT corpus postings)
    *    and actuates `rebuildFamily` when the append-pressure bit
    *    trips. Between rebuilds, probes serve the frozen store — stale
    *    by a declared bounded fraction, never wrong.
    */
  final case class TextIndexIngestConfig(
      lexicalIndex: String,
      positionalIndex: String,
      lexicalPath: String,
      maintainEvery: Int = 1,
      rebuildCorpus: Option[() => DataFrame] = None,
      onRebuild: Option[(String, Long) => Unit] = None,
      // store path of the positional family — when set, the loop runs
      // the same startup recovery for positional that it runs for
      // lexical (ADVICE r16: the store this loop MUTATES every batch
      // was the one family it never recovered, so a fresh-session loop
      // start or a crashed positional compaction wedged the append)
      positionalPath: Option[String] = None)

  /** Streaming text-retrieval index ingest ([[TextIndexIngestConfig]]
    * for the two-family policy). Batch rows: (doc_id, lang, text).
    */
  def textIndexIngestStream(
      docs: DataFrame,
      cfg: TextIndexIngestConfig,
      onLanded: (DataFrame, Long) => Unit): streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        textIndexIngestBatch(batch.toDF(), id, cfg, onLanded)
      }
      .start()

  /** One micro-batch of [[textIndexIngestStream]] — package-private so
    * StreamingSpec can drive batch mode and replay under the original
    * id (one definition, two modes — the house loop discipline).
    */
  private[graft] def textIndexIngestBatch(
      batch: DataFrame, id: Long, cfg: TextIndexIngestConfig,
      onLanded: (DataFrame, Long) => Unit): Unit = {
    val s = batch.sparkSession
    // startup/retry recovery BEFORE any store touch: a lexical rebuild
    // that crashed in its catalog/rename window must not wedge the
    // loop — healthy catalog = no-op (the media-loop discipline)
    if (cfg.maintainEvery > 0)
      for (corpus <- cfg.rebuildCorpus)
        graft.operators.IndexMaintenance.recoverFamily(
          s, "lexical", cfg.lexicalIndex, cfg.lexicalPath, corpus())
    // positional recovery runs UNCONDITIONALLY when its path is known:
    // this loop appends the positional store every batch, so a missing
    // catalog entry (fresh session) or a crashed compaction's catalog
    // window must repair before the insertInto below, not wedge it.
    // With no rebuild corpus the catalog-repair half still runs (the
    // store files are the truth; re-registering them is always safe).
    // When a recovery FIRED, the append below must go through the doc
    // guard regardless of the ledger: a destroyed-store recovery
    // rebuilds from the caller's landed corpus, which by the loop's
    // convention already includes THIS batch — the plain append would
    // double-index every batch doc (round-17 review finding).
    val positionalRecovered = cfg.positionalPath.exists { pp =>
      cfg.rebuildCorpus match {
        case Some(corpus) =>
          graft.operators.IndexMaintenance.recoverFamily(
            s, "positional", cfg.positionalIndex, pp, corpus())
        case None =>
          graft.operators.IndexMaintenance.repairFamilyCatalog(
            s, "positional", cfg.positionalIndex, pp)
      }
    }
    val ledger = IngestLedger.dirFor(
      s, s"${cfg.positionalIndex}_postings", id, tag = "text_index")
    val replayed = IngestLedger.committed(s, ledger)
    // the landed set is the whole batch (dedup/quality gating is the
    // corpus loop's job upstream; this loop owns index freshness) —
    // commit it BEFORE any index mutation, the one-ledger rule
    if (!replayed) IngestLedger.write(batch.select("doc_id"), ledger)
    onLanded(batch, id)
    if (!IngestLedger.appendDone(s, ledger)) {
      // positional: exact-once append — doc-guarded on replay AND
      // after a recovery (the recovered store may already hold this
      // batch's docs via the rebuild corpus)
      if (replayed || positionalRecovered)
        graft.operators.TextAnalysis
          .appendToPositionalIndexDedup(batch, cfg.positionalIndex)
      else
        graft.operators.TextAnalysis
          .appendToPositionalIndex(batch, cfg.positionalIndex)
      IngestLedger.markAppendDone(s, ledger)
    }
    // lexical: NEVER appended — the maintenance window decides when
    // the frozen store has fallen far enough behind to re-cut
    if (cfg.maintainEvery > 0 && (id + 1) % cfg.maintainEvery == 0)
      for (corpus <- cfg.rebuildCorpus) {
        import graft.operators.{IndexMaintenance, TextAnalysis}
        val cur = corpus()
        // rows_now = the postings the CURRENT corpus would index —
        // q192's lexical override (distinct (doc, term) pairs)
        val lexNow = cur
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("t"))
          .agg(countDistinct(col("doc_id"), col("t")))
          .head().getLong(0)
        val row = IndexMaintenance.stalenessReport(s, Seq(
          IndexMaintenance.FamilySpec("lexical",
            s"${cfg.lexicalIndex}_postings",
            rowsNow = Some(lexNow)))).collect().head
        if (row.getLong(6) == 1L) {
          IndexMaintenance.rebuildFamily(
            s, "lexical", cfg.lexicalIndex, cfg.lexicalPath, cur)
          cfg.onRebuild.foreach(_("lexical", id))
        }
      }
    graft.operators.Q.releaseManaged()
  }
}

/** StatefulProcessor behind [[StreamingOps.userRunningStatsTws]]: one
  * named ValueState[UserStat] per user, updated per micro-batch.
  */
class RunningStatsProcessor
    extends streaming.StatefulProcessor[Long, UserEvent, UserStat] {
  @transient private var st: streaming.ValueState[UserStat] = _

  override def init(outputMode: OutputMode,
      timeMode: streaming.TimeMode): Unit =
    st = getHandle.getValueState[UserStat]("stats",
      org.apache.spark.sql.Encoders.product[UserStat],
      streaming.TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
      timerValues: streaming.TimerValues): Iterator[UserStat] = {
    val prev = if (st.exists()) st.get() else UserStat(uid, 0L, 0.0)
    var n = prev.n_events
    var tot = prev.total_value
    rows.foreach { e => n += 1; tot += e.value }
    val next = UserStat(uid, n, tot)
    st.update(next)
    Iterator.single(next)
  }
}
