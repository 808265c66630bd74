package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

final case class Ev(ts: Timestamp, event_type: String, value: Double)

final case class EvId(
    event_id: Long, ts: Timestamp, event_type: String, value: Double)

final case class Doc(ts: Timestamp, doc_id: Long, text: String)

final case class Vec(ts: Timestamp, vec_id: Long, embedding: Array[Float])

/** MemoryStream behavior tests for the streaming surface (SURVEY §5
  * item 5): tumbling/sliding/session window contents, watermark-driven
  * finalization in append mode, and late-data dropping.
  */
class StreamingSpec extends SparkSpec {

  private def t(minutes: Int): Timestamp =
    new Timestamp(minutes * 60L * 1000L) // epoch-based, UTC session

  private def runBatches(
      mode: OutputMode,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[Ev]]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = build(input.toDF())
      .writeStream.format("memory").outputMode(mode)
      .queryName("sink_" + System.nanoTime()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(q.name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling windows aggregate per (hour, event_type) in update mode") {
    val rows = runBatches(OutputMode.Update(), StreamingOps.tumbling, Seq(Seq(
      Ev(t(5), "click", 1.0), Ev(t(20), "click", 2.0), Ev(t(70), "click", 4.0),
      Ev(t(10), "view", 8.0))))
    val byKey = rows.map(r => (r.getTimestamp(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(byKey((t(0), "click")) == (2L, 3.0))
    assert(byKey((t(60), "click")) == (1L, 4.0))
    assert(byKey((t(0), "view")) == (1L, 8.0))
  }

  test("append mode finalizes a window only after the watermark passes") {
    val rows1 = runBatches(OutputMode.Append(), StreamingOps.tumbling, Seq(
      Seq(Ev(t(5), "click", 1.0)))) // watermark still inside hour 0
    assert(rows1.isEmpty)

    val rows2 = runBatches(OutputMode.Append(), StreamingOps.tumbling, Seq(
      Seq(Ev(t(5), "click", 1.0)),
      // 130min − 10min watermark = 120min ≥ hour-0 end ⇒ hour 0 finalized
      Seq(Ev(t(130), "click", 2.0))))
    assert(rows2.map(r => (r.getTimestamp(0), r.getLong(2))) ==
      Seq((t(0), 1L)))
  }

  test("late events beyond the watermark are dropped") {
    val rows = runBatches(OutputMode.Append(), StreamingOps.tumbling, Seq(
      Seq(Ev(t(5), "click", 1.0)),
      Seq(Ev(t(130), "click", 2.0)), // advances watermark to 120min
      Seq(Ev(t(6), "click", 100.0)), // hour-0 event, 114min late: dropped
      Seq(Ev(t(260), "click", 4.0)))) // finalize hour 2
    val hour0 = rows.filter(_.getTimestamp(0) == t(0))
    assert(hour0.map(r => (r.getLong(2), r.getDouble(3))) == Seq((1L, 1.0)))
  }

  test("sliding windows place one event in two windows") {
    val rows = runBatches(OutputMode.Update(), StreamingOps.sliding, Seq(
      Seq(Ev(t(7), "click", 1.0))))
    val starts = rows.map(_.getTimestamp(0)).toSet
    assert(starts == Set(t(0), t(5)))
  }

  test("session windows merge events within the gap and split beyond it") {
    // session aggregation streams in append mode only: sessions emit once
    // the watermark passes their end, so push it forward with a sentinel
    val rows = runBatches(OutputMode.Append(), StreamingOps.session, Seq(
      Seq(Ev(t(0), "click", 1.0), Ev(t(20), "click", 2.0), // gap 20 < 30: merge
        Ev(t(120), "click", 4.0)), // separate session
      Seq(Ev(t(500), "flush", 0.0)))) // watermark 490min > both session ends
    val sessions = rows.filter(_.getString(2) == "click")
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1.getTime)
    assert(sessions == Seq(
      (t(0), t(50), 2L, 3.0),    // merged session ends 20min+30min gap
      (t(120), t(150), 1L, 4.0)))
  }

  test("flatMapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    import graft.streaming.UserEvent
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = StreamingOps.userRunningStats(input.toDS())
      .writeStream.format("memory").outputMode(OutputMode.Update())
      .queryName("state_" + System.nanoTime()).start()
    try {
      input.addData(
        UserEvent(t(1), 7L, "click", 1.0), UserEvent(t(2), 7L, "click", 2.0),
        UserEvent(t(3), 9L, "view", 10.0))
      q.processAllAvailable()
      input.addData(UserEvent(t(4), 7L, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table(q.name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 emissions
      assert(rows.contains((7L, 2L, 3.0)))
      assert(rows.contains((9L, 1L, 10.0)))
      // batch 2: state for user 7 accumulated, user 9 untouched
      assert(rows.contains((7L, 3L, 7.0)))
      assert(rows.count(_._1 == 9L) == 1)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups re-sent events across batches") {
    import spark.implicits._
    import graft.streaming.UserEvent
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    // id = (user_id): re-sent rows for the same user within the
    // watermark window must come out exactly once
    val q = StreamingOps.dedupWithinWatermark(input.toDF(), "user_id")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("dedup_" + System.nanoTime()).start()
    try {
      input.addData(UserEvent(t(1), 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        UserEvent(t(2), 1L, "click", 1.0), // duplicate id within watermark
        UserEvent(t(3), 2L, "view", 2.0))
      q.processAllAvailable()
      val users = spark.table(q.name).collect().map(_.getLong(1)).sorted
      assert(users.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window clicks only") {
    import spark.implicits._
    import graft.streaming.UserEvent
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val purchases = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("ssjoin_" + System.nanoTime()).start()
    try {
      clicks.addData(
        UserEvent(t(10), 1L, "click", 0.0),   // in window for t(30) purchase
        UserEvent(t(20), 2L, "click", 0.0),   // other user
        UserEvent(t(200), 1L, "click", 0.0))  // after the purchase
      purchases.addData(UserEvent(t(30), 1L, "purchase", 9.5))
      q.processAllAvailable()
      val rows = spark.table(q.name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getDouble(3))).toSeq
      // only user 1's click at t(10) is within [purchase-1h, purchase]
      assert(rows == Seq((1L, t(30), t(10), 9.5)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null-matched purchases after the watermark") {
    import spark.implicits._
    import graft.streaming.UserEvent
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val purchases = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("ssouter_" + System.nanoTime()).start()
    try {
      clicks.addData(UserEvent(t(10), 1L, "click", 0.0))
      purchases.addData(
        UserEvent(t(30), 1L, "purchase", 9.5),   // matched
        UserEvent(t(30), 2L, "purchase", 4.0))   // no click: null-matched
      q.processAllAvailable()
      // the null-matched row needs the watermark to pass the join
      // window: advance both streams far beyond it
      clicks.addData(UserEvent(t(500), 9L, "click", 0.0))
      purchases.addData(UserEvent(t(500), 9L, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table(q.name).collect()
        .filter(_.getTimestamp(1) == t(30))
        .map(r => (r.getLong(0),
          if (r.isNullAt(2)) null else r.getTimestamp(2), r.getDouble(3)))
        .toSet
      assert(rows == Set((1L, t(10), 9.5), (2L, null, 4.0)))
    } finally q.stop()
  }

  test("streaming tumbling over the events table equals the batch result") {
    // one definition, two modes, same data: write the driver's events
    // table (normalized to micros), stream it back with readStream, and
    // the update-mode output must equal the batch aggregation exactly
    import graft.operators.Q
    val events = Q.table(spark, sfDir, "events")
      .select("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-eq")
    // one file ⇒ one micro-batch ⇒ update mode emits each window exactly once
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events")
    val streamed = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/events")
    val q = StreamingOps.tumbling(streamed)
      .writeStream.format("memory").outputMode(OutputMode.Update())
      .queryName("eq_" + System.nanoTime()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(q.name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1.getTime, x._2))
      val want = StreamingOps.tumbling(events).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1.getTime, x._2))
      assert(got.nonEmpty && got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("streaming windowed HLL distinct-users equals the batch estimate exactly") {
    // register-max merge is commutative + idempotent, so the HLL
    // estimate cannot depend on micro-batch boundaries or partition
    // order — streaming and batch must agree to the integer
    import graft.operators.Q
    val events = Q.table(spark, sfDir, "events")
      .select("ts", "event_type", "user_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-hll")
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events")
    val streamed = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/events")
    val q = StreamingOps.tumblingDistinctUsers(streamed)
      .writeStream.format("memory").outputMode(OutputMode.Update())
      .queryName("hll_" + System.nanoTime()).start()
    try {
      q.processAllAvailable()
      val got = spark.table(q.name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1.getTime, x._2))
      val want = StreamingOps.tumblingDistinctUsers(events).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1.getTime, x._2))
      assert(got.nonEmpty && got.toSeq == want.toSeq)
      // sanity: estimates sit within the 2% rsd band of exact counts
      val exact = events
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 hour"),
          org.apache.spark.sql.functions.col("event_type"))
        .agg(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("user_id")).as("n"))
        .collect().map(r => (r.getStruct(0).getTimestamp(0),
          r.getString(1)) -> r.getLong(2)).toMap
      got.foreach { case (t, et, est) =>
        val ex = exact((t, et))
        assert(math.abs(est - ex) <= math.max(2L, (ex * 0.10).toLong),
          s"HLL estimate $est too far from exact $ex for ($t, $et)")
      }
    } finally q.stop()
  }

  test("transformWithState running stats match flatMapGroupsWithState (RocksDB)") {
    import spark.implicits._
    import graft.streaming.UserEvent
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = StreamingOps.userRunningStatsTws(input.toDS())
      .writeStream.format("memory").outputMode(OutputMode.Update())
      .queryName("tws_" + System.nanoTime()).start()
    try {
      input.addData(
        UserEvent(t(1), 7L, "click", 1.0), UserEvent(t(2), 7L, "click", 2.0),
        UserEvent(t(3), 9L, "view", 10.0))
      q.processAllAvailable()
      input.addData(UserEvent(t(4), 7L, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table(q.name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // identical emission contract to the flatMapGroupsWithState test
      assert(rows.contains((7L, 2L, 3.0)))
      assert(rows.contains((9L, 1L, 10.0)))
      assert(rows.contains((7L, 3L, 7.0)))
      assert(rows.count(_._1 == 9L) == 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("dedupWithinWatermark resend stream equals the batch answer (one definition, two modes)") {
    import spark.implicits._
    import graft.operators.Q
    implicit val sqlCtx = spark.sqlContext
    // real events resent across micro-batches (an at-least-once source):
    // the streamed output must be exactly-once and equal the batch
    // dedup of the same doubled input through the same builder
    val base = Q.table(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
      .orderBy("event_id").limit(200).as[EvId].collect().toSeq
    val input = MemoryStream[EvId]
    val q = StreamingOps.dedupWithinWatermark(input.toDF(), "event_id")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("dedupeq_" + System.nanoTime()).start()
    try {
      input.addData(base)
      q.processAllAvailable()
      input.addData(base.take(100)) // resend half
      q.processAllAvailable()
      val got = spark.table(q.name).collect().map(_.getLong(0)).sorted.toSeq
      // the batch reference is dropDuplicates: Spark rejects
      // dropDuplicatesWithinWatermark on batch frames, and its contract
      // IS batch-dedup semantics whenever resends land inside the delay
      val want = (base ++ base.take(100)).toDF()
        .dropDuplicates("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got.nonEmpty && got == want)
      assert(got == got.distinct, "an id was emitted more than once")
    } finally q.stop()
  }

  test("neardupSuppressWithinWatermark drops signature-identical near-clones, keeps distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val distinctDoc = "completely different content with no shared trigrams at all here"
    val input = MemoryStream[Doc]
    val q = StreamingOps.neardupSuppressWithinWatermark(input.toDF(), "text")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("neardup_" + System.nanoTime()).start()
    try {
      // doc 1; an exact resend (id differs — id-dedup would MISS it);
      // a distinct doc — all inside the watermark window
      input.addData(Seq(
        Doc(t(1), 1L, a), Doc(t(2), 2L, a), Doc(t(3), 3L, distinctDoc)))
      q.processAllAvailable()
      // batch 2 only advances the watermark (batches run against the
      // PREVIOUS batch's watermark, so eviction is visible one batch
      // later); batch 3's resend of `a` then finds doc 1's state gone
      input.addData(Seq(Doc(t(130), 4L, distinctDoc + " v2")))
      q.processAllAvailable()
      input.addData(Seq(Doc(t(135), 5L, a)))
      q.processAllAvailable()
      val got = spark.table(q.name).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      // 2 suppressed (same signature as 1, inside the delay); 3 and 4
      // kept (distinct signatures); 5 kept (1's key evicted once the
      // watermark passed t(1) + 10 min)
      assert(got == Seq(1L, 3L, 4L, 5L), s"got $got")
    } finally q.stop()
  }

  test("decontaminateStream drops bloom-flagged docs statelessly; batch mode agrees") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{explode, expr}
    implicit val sqlCtx = spark.sqlContext
    graft.functions.HashFunctions.register(spark)
    // contaminated shares 6 trigrams with the eval doc (>= the 5-hit
    // rule); clean shares none
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val contaminated = "alpha beta gamma delta epsilon zeta eta theta lambda mu"
    val clean = "one two three four five six seven eight nine ten"
    val bloom = Seq(evalText).toDF("text")
      .select(explode(expr("graft_shingles(text, 3)")).as("g"))
      .agg(expr("graft_bloom_build(xxhash64(g), 1048576L)"))
      .head().getAs[Array[Byte]](0)
    val input = MemoryStream[Doc]
    val q = StreamingOps.decontaminateStream(input.toDF(), bloom, "text")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("decon_" + System.nanoTime()).start()
    try {
      input.addData(Seq(Doc(t(1), 1L, contaminated), Doc(t(2), 2L, clean)))
      q.processAllAvailable()
      val got = spark.table(q.name).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(got == Seq(2L), s"got $got")
    } finally q.stop()
    // one definition, two modes: the same builder over a batch frame
    val batch = StreamingOps.decontaminateStream(
      Seq(Doc(t(1), 1L, contaminated), Doc(t(2), 2L, clean)).toDF(),
      bloom, "text")
    assert(batch.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    // and a null bloom (empty eval set) passes everything through
    val all = StreamingOps.decontaminateStream(
      Seq(Doc(t(1), 1L, contaminated)).toDF(), null, "text")
    assert(all.count() == 1)
  }

  test("coresetIngestStream admits by fixed radius; replay reproduces the admitted set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-coreset-test").toString
    val name = "corestream_" + System.nanoTime()
    try {
      graft.operators.Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        name, dir)
      val admittedBy = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def onAdmit(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        admittedBy(id) = df.select("vec_id").collect()
          .map(_.getLong(0)).sorted.toSeq
      val input = MemoryStream[Vec]
      val q = StreamingOps.coresetIngestStream(
        input.toDF().drop("ts"), name, r2 = 1.0, onAdmit)
      val b2 = Seq(
        Vec(t(5), 5L, Array(2.2f, 0.0f)),   // 0.04 from center 2 -> drop
        Vec(t(6), 6L, Array(-3.0f, 0.0f)))  // far from all -> admit
      try {
        input.addData(Seq(
          Vec(t(1), 1L, Array(0.5f, 0.0f)),  // 0.25 from seed -> drop
          Vec(t(2), 2L, Array(2.0f, 0.0f)),  // admit
          Vec(t(3), 3L, Array(2.5f, 0.0f)),  // 0.25 from 2 (in-batch) -> drop
          Vec(t(4), 4L, Array(0.0f, 3.0f)))) // admit
        q.processAllAvailable()
        input.addData(b2)
        q.processAllAvailable()
      } finally q.stop()
      assert(admittedBy(0L) == Seq(2L, 4L), s"batch 0: $admittedBy")
      assert(admittedBy(1L) == Seq(6L), s"batch 1: $admittedBy")
      val centers = spark.table(s"${name}_centers")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(centers == Seq(0L, 2L, 4L, 6L))
      // replay batch 1 under its original id: the ledger reproduces
      // the admitted set and the guarded append adds no duplicate rows
      StreamingOps.coresetIngestBatch(
        b2.toDF().drop("ts"), 1L, name, r2 = 1.0, onAdmit)
      assert(admittedBy(1L) == Seq(6L), "replay changed the admitted set")
      val after = spark.table(s"${name}_centers")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(after == Seq(0L, 2L, 4L, 6L), s"replay duplicated rows: $after")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_centers")
  }

  test("gatedCoresetIngestStream cuts by probe score before diversity; replay contract intact") {
    // VERDICT r12 ask #8: q183's probe gate composed in front of the
    // coreset loop — low-score rows never reach the center store even
    // when they are geometrically diverse, and the batch-id ledger
    // still makes replays exact.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gatedcoreset").toString
    val name = "gatedcore_" + System.nanoTime()
    try {
      graft.operators.Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        name, dir)
      // keep iff w·e + b >= 0, i.e. iff e(0) >= 0 here
      val w = Array(1.0, 0.0); val b = 0.0
      val batch = Seq(
        Vec(t(1), 1L, Array(2.0f, 0.0f)),   // keep + far      -> admit
        Vec(t(2), 2L, Array(-3.0f, 0.0f)),  // far but SCORE-DROPPED
        Vec(t(3), 3L, Array(0.5f, 0.0f)),   // keep, near seed -> drop
        Vec(t(4), 4L, Array(0.0f, 3.0f)))   // boundary keep + far -> admit
      val admittedBy = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        admittedBy(id) = df.select("vec_id").collect()
          .map(_.getLong(0)).sorted.toSeq
      val input = MemoryStream[Vec]
      val q = StreamingOps.gatedCoresetIngestStream(
        input.toDF().drop("ts"), name, r2 = 1.0, w, b, cb)
      try {
        input.addData(batch)
        q.processAllAvailable()
      } finally q.stop()
      assert(admittedBy(0L) == Seq(1L, 4L), s"admitted: $admittedBy")
      val centers = spark.table(s"${name}_centers")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(centers == Seq(0L, 1L, 4L),
        s"score-dropped row reached the store: $centers")
      // replay under the original id: same admitted set, no dup rows
      StreamingOps.gatedCoresetIngestBatch(
        batch.toDF().drop("ts"), 0L, name, r2 = 1.0, w, b, cb)
      assert(admittedBy(0L) == Seq(1L, 4L), "replay changed the set")
      val after = spark.table(s"${name}_centers")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(after == Seq(0L, 1L, 4L), s"replay duplicated rows: $after")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_centers")
  }

  test("gated and ungated coreset loops on one store never read each other's ledgers") {
    // Both loops' checkpoints count batches from 0: with a shared
    // (untagged) ledger namespace, whichever loop commits batch 0
    // first would make the other loop's batch 0 read committed=true
    // and 'replay' the FOREIGN admitted set — silently dropping its
    // own novel rows. The gated loop therefore commits under its own
    // tag; this pins the isolation.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-coreset-iso").toString
    val name = "coreiso_" + System.nanoTime()
    try {
      graft.operators.Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        name, dir)
      val got = scala.collection.mutable.Map.empty[String, Seq[Long]]
      def cb(tag: String)(df: org.apache.spark.sql.DataFrame,
          id: Long): Unit =
        got(tag) = df.select("vec_id").collect()
          .map(_.getLong(0)).sorted.toSeq
      // ungated loop commits ITS batch 0 first (admits 1)
      StreamingOps.coresetIngestBatch(
        Seq((1L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding"),
        0L, name, r2 = 1.0, cb("plain"))
      assert(got("plain") == Seq(1L), s"plain: $got")
      // the gated loop's batch 0 carries a DIFFERENT novel vector; a
      // ledger collision would semi-join it against {1} and admit
      // nothing
      StreamingOps.gatedCoresetIngestBatch(
        Seq((2L, Array(-3.0f, 0.0f))).toDF("vec_id", "embedding"),
        0L, name, r2 = 1.0, Array(-1.0, 0.0), 0.0, cb("gated"))
      assert(got("gated") == Seq(2L),
        s"gated batch 0 read the ungated loop's ledger: $got")
      val centers = spark.table(s"${name}_centers")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(centers == Seq(0L, 1L, 2L), s"centers: $centers")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_centers")
  }

  test("coresetAdmit chunked driver collects match the one-shot greedy exactly") {
    // VERDICT r12 ask #3: the admission greedy consumes the far set in
    // bounded ascending-vec_id chunks. Chunking must be invisible: a
    // chunk size smaller than the batch yields the identical admitted
    // set (and a driver-side reference greedy agrees with both).
    import spark.implicits._
    import graft.operators.Learn
    val dir = java.nio.file.Files
      .createTempDirectory("graft-coreset-chunk").toString
    val name = "corechunk_" + System.nanoTime()
    try {
      Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        name, dir)
      val r2 = 1.0
      // a chain straddling chunk boundaries: 2 admits, 3 is within r
      // of 2 (must be dropped even when 2 and 3 land in different
      // chunks), 4/6/8 admit, 5/7 drop against in-batch admits, 9/10
      // drop against the store seed
      val pts = Seq(
        1L -> Array(0.5f, 0.0f), 2L -> Array(2.0f, 0.0f),
        3L -> Array(2.5f, 0.0f), 4L -> Array(0.0f, 3.0f),
        5L -> Array(0.1f, 3.1f), 6L -> Array(-3.0f, 0.0f),
        7L -> Array(-3.5f, 0.0f), 8L -> Array(0.0f, -3.0f),
        9L -> Array(0.0f, 0.9f), 10L -> Array(-0.9f, 0.0f))
      // driver-side reference greedy in ascending vec_id order
      val ref = scala.collection.mutable.ArrayBuffer(
        (0L, Array(0.0f, 0.0f)))
      val expect = pts.flatMap { case (id, e) =>
        if (ref.forall(a => Learn.dist2f(a._2, e) > r2)) {
          ref += ((id, e)); Some(id)
        } else None
      }
      val batch = pts.toDF("vec_id", "embedding")
      def admitted(chunk: Int): Seq[Long] =
        Learn.coresetAdmit(batch, name, r2, chunk)
          .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(admitted(4096) == expect, "one-shot-sized chunk diverged")
      assert(admitted(3) == expect, "chunk=3 diverged from the greedy")
      assert(admitted(1) == expect, "chunk=1 diverged from the greedy")
      // ADVICE r13 worst case: a batch where EVERY row is far (all
      // admit), spanning many chunks — the shape whose accumulated
      // farFrom chain used to recompute quadratically. The per-4-chunk
      // localCheckpoint keeps plan depth bounded; correctness pin is
      // the same greedy identity on a > 2× chunk batch (24 points,
      // chunk=2 → 12 chunks, 3 checkpoint truncations).
      val far = (1 to 24).map(i =>
        (100L + i, Array(i * 10.0f, 0.0f)))
      val farBatch = far.toDF("vec_id", "embedding")
      val gotFar = Learn.coresetAdmit(farBatch, name, r2, chunk = 2)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(gotFar == far.map(_._1),
        s"all-far multi-chunk batch must admit every row: $gotFar")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_centers")
  }

  test("probeGateStream scores statelessly; batch ≡ stream; keep matches the threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hand-picked weights: score is driven by the first two dims
    val w = Array(2.0, -2.0, 0.0)
    val b = -0.25
    val vecs = Seq(
      Vec(t(1), 1L, Array(1.0f, 0.0f, 0.3f)),   // m = 1.75  -> keep
      Vec(t(2), 2L, Array(0.0f, 1.0f, 0.3f)),   // m = -2.25 -> drop
      Vec(t(3), 3L, Array(0.125f, 0.0f, 0.0f)), // m = 0     -> keep (s = 0.5)
      Vec(t(4), 4L, Array(0.0f, 0.0f, 9.9f)))   // m = -0.25 -> drop
    val input = MemoryStream[Vec]
    val q = StreamingOps.probeGateStream(input.toDF(), w, b)
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("probe_" + System.nanoTime()).start()
    val streamed = try {
      input.addData(vecs)
      q.processAllAvailable()
      spark.table(q.name).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("keep")))
        .sortBy(_._1).toSeq
    } finally q.stop()
    assert(streamed.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(streamed.map(_._3) == Seq(1L, 0L, 1L, 0L),
      s"keep bits wrong: $streamed")
    // keep is exactly (score >= 0.5): every kept score_micro >= 500000
    assert(streamed.forall(r => (r._2 >= 500000L) == (r._3 == 1L)))
    // m = 0.125*2 - 0.25 = 0 exactly: the boundary row scores 0.5
    assert(streamed.find(_._1 == 3L).get._2 == 500000L)
    // one definition, two modes: identical rows from the batch frame
    val batch = StreamingOps.probeGateStream(vecs.toDF(), w, b)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("keep")))
      .sortBy(_._1).toSeq
    assert(batch == streamed, s"batch/stream drift:\n$batch\n$streamed")
  }

  test("piiScrubStream redacts statelessly; batch mode produces identical rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one doc per exposure class plus a clean one — the scrub must
    // redact all of them and the residual bit must come back earned
    val docs = Seq(
      Doc(t(1), 1L, "mail me at a.user@example.com today"),
      Doc(t(2), 2L, "host 10.0.42.7 answered"),
      Doc(t(3), 3L, "card 4111 1111 1111 1111 on file"),
      Doc(t(4), 4L, "call 555-0123-4567 or +41791234567"),
      Doc(t(5), 5L, "ticket 12345678 escalated"),
      Doc(t(6), 6L, "nothing sensitive here"))
    val input = MemoryStream[Doc]
    val q = StreamingOps.piiScrubStream(input.toDF(), "text")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("pii_" + System.nanoTime()).start()
    val streamed = try {
      input.addData(docs)
      q.processAllAvailable()
      spark.table(q.name).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          r.getAs[Long]("pii_hits"), r.getAs[Long]("pii_clean")))
        .sortBy(_._1).toSeq
    } finally q.stop()
    // every PII doc scrubbed (clean bit earned), the clean doc untouched
    assert(streamed.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(streamed.forall(_._4 == 1L),
      s"residual PII after scrub: $streamed")
    assert(streamed.filter(_._1 != 6L).forall(_._3 > 0L),
      s"planted PII not counted: $streamed")
    assert(streamed.find(_._1 == 6L).get._2 == "nothing sensitive here",
      "clean doc must pass through unmodified")
    assert(streamed.find(_._1 == 3L).get._2.contains("<CARD>"))
    assert(streamed.find(_._1 == 4L).get._2.contains("<PHONE>"))
    // one definition, two modes: the batch frame must produce the
    // exact same rows
    val batch = StreamingOps.piiScrubStream(docs.toDF(), "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("pii_hits"), r.getAs[Long]("pii_clean")))
      .sortBy(_._1).toSeq
    assert(batch == streamed, s"batch/stream drift:\n$batch\n$streamed")
  }

  test("lineScrubStream cuts boilerplate lines statelessly; batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val boiler = Seq("follow us for more updates.", "copyright 2020 corp")
    val docs = Seq(
      Doc(t(1), 1L, "real content here\nfollow us for more updates.\nmore text"),
      Doc(t(2), 2L, "copyright 2020 corp\nfollow us for more updates."),
      Doc(t(3), 3L, "untouched document"))
    val input = MemoryStream[Doc]
    val q = StreamingOps.lineScrubStream(input.toDF(), boiler, "text")
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("lines_" + System.nanoTime()).start()
    val streamed = try {
      input.addData(docs)
      q.processAllAvailable()
      spark.table(q.name).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          r.getAs[Long]("lines_removed")))
        .sortBy(_._1).toSeq
    } finally q.stop()
    assert(streamed == Seq(
      (1L, "real content here\nmore text", 1L),
      (2L, "", 2L),
      (3L, "untouched document", 0L)), s"unexpected scrub: $streamed")
    val batch = StreamingOps.lineScrubStream(docs.toDF(), boiler, "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("lines_removed")))
      .sortBy(_._1).toSeq
    assert(batch == streamed, s"batch/stream drift:\n$batch\n$streamed")
  }

  test("spanDupIngestStream rejects a gate below the seed length") {
    // ADVICE r11: spans shorter than the probe's seed grams are
    // invisible — a misconfigured gate must fail loudly, not silently
    // admit everything
    import spark.implicits._
    val dummy = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.spanDupIngestStream(dummy, "nosuch_idx",
        maxSpanTokens = 4, (_, _) => ())
    }
    assert(e.getMessage.contains("seedLen"), e.getMessage)
  }

  test("perDomainAdmitCap admits at most k per source across batches; batch mode agrees") {
    import spark.implicits._
    import graft.streaming.SourcedDoc
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SourcedDoc]
    val q = StreamingOps.perDomainAdmitCap(input.toDS(), k = 2)
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("cap_" + System.nanoTime()).start()
    try {
      // batch 1: three docs from A (one over cap), one from B
      input.addData(Seq(
        SourcedDoc(t(1), 1L, "A"), SourcedDoc(t(2), 2L, "A"),
        SourcedDoc(t(3), 3L, "A"), SourcedDoc(t(1), 4L, "B")))
      q.processAllAvailable()
      // batch 2: A is full (state carries over); B admits one more
      input.addData(Seq(
        SourcedDoc(t(10), 5L, "A"), SourcedDoc(t(10), 6L, "B"),
        SourcedDoc(t(11), 7L, "B")))
      q.processAllAvailable()
      val got = spark.table(q.name).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(got == Seq(1L, 2L, 4L, 6L), s"got $got")
    } finally q.stop()
    // one definition, two modes: the same builder over a batch frame
    // admits the (ts, doc_id)-first two per source
    val batch = StreamingOps.perDomainAdmitCap(
      Seq(SourcedDoc(t(3), 3L, "A"), SourcedDoc(t(1), 1L, "A"),
        SourcedDoc(t(2), 2L, "A")).toDS(), k = 2)
      .collect().map(_.doc_id).sorted.toSeq
    assert(batch == Seq(1L, 2L))
    // a null ts must not NPE, and sorts LAST — an undated doc never
    // displaces a dated one inside the quota (ADVICE r8)
    val withNull = StreamingOps.perDomainAdmitCap(
      Seq(SourcedDoc(null, 9L, "A"), SourcedDoc(t(5), 8L, "A"),
        SourcedDoc(t(4), 7L, "A")).toDS(), k = 2)
      .collect().map(_.doc_id).sorted.toSeq
    assert(withNull == Seq(7L, 8L), s"got $withNull")
    // and when the quota has room, the undated doc still admits
    val nullAdmits = StreamingOps.perDomainAdmitCap(
      Seq(SourcedDoc(null, 9L, "A"), SourcedDoc(t(4), 7L, "A")).toDS(),
      k = 2).collect().map(_.doc_id).sorted.toSeq
    assert(nullAdmits == Seq(7L, 9L), s"got $nullAdmits")
  }

  test("left-outer interval join streamed equals the batch join on the events table") {
    import spark.implicits._
    import graft.streaming.UserEvent
    import graft.operators.Q
    implicit val sqlCtx = spark.sqlContext
    val ev = Q.table(spark, sfDir, "events")
      .select("ts", "user_id", "event_type", "value").as[UserEvent]
    val clickRows = ev.filter(_.event_type == "click").collect().toSeq
    val purchaseRows = ev.filter(_.event_type == "purchase").collect().toSeq
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        if (r.isNullAt(2)) Long.MinValue else r.getTimestamp(2).getTime,
        r.getDouble(3)))
      .sorted.toSeq
    val want = norm(StreamingOps
      .clickPurchaseJoinOuter(clickRows.toDF(), purchaseRows.toDF())
      .collect())
    val clicks = MemoryStream[UserEvent]
    val purchases = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").outputMode(OutputMode.Append())
      .queryName("ssoutereq_" + System.nanoTime()).start()
    try {
      clicks.addData(clickRows)
      purchases.addData(purchaseRows)
      q.processAllAvailable()
      // far-future sentinels on BOTH streams push the combined watermark
      // past every real purchase so the null-matched rows finalize; the
      // sentinel pair matches itself and is filtered back out by user_id
      val maxTs = (clickRows ++ purchaseRows).map(_.ts.getTime).max
      val sentinel = new Timestamp(maxTs + 100L * 60 * 60 * 1000)
      clicks.addData(UserEvent(sentinel, -1L, "click", 0.0))
      purchases.addData(UserEvent(sentinel, -1L, "purchase", 0.0))
      q.processAllAvailable()
      val got = norm(spark.table(q.name).collect().filter(_.getLong(0) != -1L))
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("the same builders run in batch mode (one definition, two modes)") {
    import spark.implicits._
    val batch = Seq(Ev(t(5), "click", 1.0), Ev(t(20), "click", 2.0)).toDF()
    val out = StreamingOps.tumbling(batch).collect()
    assert(out.map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((t(0), 2L, 3.0)))
  }

  test("streaming near-dup probe of the persisted band index: novel docs pass, the index grows") {
    // the full nightly-ingest loop (VERDICT r8 #7): a persisted band
    // index is the ONLY state — the stream itself keeps none — and
    // growIndex=true folds each batch's novel docs in, so a batch-2
    // near-dup of a batch-1 admission is suppressed without the base
    // ever being re-shingled.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamidx")
    // 20 tokens ⇒ 18 shingles; a one-token tail edit gives j = 17/19 ≈
    // 0.89 ≥ the 0.8 threshold, and the 32×4 banding recalls it with
    // p ≈ 1 − (1 − 0.89⁴)³² ≈ 1
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha")), (2L, words("beta")))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(base, "stream_bandidx", s"$tmp")
    val input = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.neardupProbeIndexStream(
      input.toDF().toDF("doc_id", "text"), "stream_bandidx",
      growIndex = true,
      (novel, _) => admitted.synchronized {
        admitted ++= novel.select("doc_id").collect().map(_.getLong(0))
      })
    try {
      // batch 1: a near-dup of base doc 0 (tail token edited) + a novel doc
      input.addData(
        (10L, words("alpha").replace("alpha20", "alphaX")),
        (11L, words("gamma")))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(11L),
        s"batch 1 admitted $admitted (want only the novel 11)")
      // batch 2: a near-dup of the JUST-ADMITTED 11 — only suppressed
      // if the index actually grew — plus one genuinely novel doc
      admitted.clear()
      input.addData(
        (20L, words("gamma").replace("gamma20", "gammaX")),
        (21L, words("delta")))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(21L),
        s"batch 2 admitted $admitted (want only the novel 21)")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_bandidx_bands")
      spark.sql("DROP TABLE IF EXISTS stream_bandidx_shingles")
    }
  }

  test("streaming gram-novelty gate over the persisted gram index: redundant docs drop, the index grows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamgram")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha")), (2L, words("beta")))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeGramIndex(base, "stream_gramidx", s"$tmp")
    val input = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.gramNoveltyIngestStream(
      input.toDF().toDF("doc_id", "text"), "stream_gramidx",
      minNovelShare = 0.5, growIndex = true,
      (novel, _) => admitted.synchronized {
        admitted ++= novel.select("doc_id").collect().map(_.getLong(0))
      })
    try {
      // batch 1: an exact re-crawl of base doc 0 (zero novel grams) +
      // a genuinely new doc — only the new one may pass
      input.addData((10L, words("alpha")), (11L, words("gamma")))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(11L),
        s"batch 1 admitted $admitted (want only the novel 11)")
      // batch 2: a doc that is mostly batch-1's admitted content with a
      // short new tail (novel share ~2/19 << 0.5) — suppressed only if
      // the index actually grew — plus one genuinely novel doc
      admitted.clear()
      input.addData(
        (20L, words("gamma").replace("gamma20", "tail1 tail2 tail3")),
        (21L, words("delta")))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(21L),
        s"batch 2 admitted $admitted (want only the novel 21)")
      // a doc too short to shingle carries no novelty evidence → drops
      admitted.clear()
      input.addData((30L, "just two"))
      q.processAllAvailable()
      assert(admitted.isEmpty, s"short doc admitted: $admitted")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_gramidx_grams")
    }
  }

  test("streaming ANN ingest over the persisted PQ index: near-dups drop, the index grows") {
    // the embedding mirror of the band-index loop: the persisted IVF-PQ
    // index is the only state; a batch vector whose nearest indexed
    // neighbor scores >= simFloor is a near-duplicate and drops; novel
    // vectors are admitted and (growIndex=true) appended under the
    // frozen quantizer, so a batch-2 duplicate of a batch-1 admission
    // is suppressed without the corpus ever being re-encoded.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-streampq")
    val base = graft.operators.Q.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 40)
    graft.operators.Ann.writePqIndex(base, "stream_pqidx", s"$tmp")
    val vec0 = base
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .head.getSeq[Float](1).toArray
    // a deterministic vector far from the near-uniform corpus (max
    // corpus cosine ~0.5 << the 0.95 floor): alternating +/-1 pattern
    val novelA = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val novelB = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -0.5f)
    val input = MemoryStream[(Long, Array[Float])]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.annIngestStream(
      input.toDF().toDF("vec_id", "embedding"), "stream_pqidx",
      simFloor = 0.95, growIndex = true,
      (novel, _) => admitted.synchronized {
        admitted ++= novel.select("vec_id").collect().map(_.getLong(0))
      })
    try {
      // batch 1: an exact duplicate of indexed vec 0 + a novel vector
      input.addData((100L, vec0), (101L, novelA))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(101L),
        s"batch 1 admitted $admitted (want only the novel 101)")
      // batch 2: a duplicate of the JUST-ADMITTED 101 — suppressed only
      // if the append actually landed — plus one genuinely novel vector
      admitted.clear()
      input.addData((102L, novelA), (103L, novelB))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(103L),
        s"batch 2 admitted $admitted (want only the novel 103)")
    } finally {
      q.stop()
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS stream_pqidx_$t"))
    }
  }

  test("streaming span gate over the persisted span index: verbatim re-use drops, fresh docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamspan")
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    import org.apache.spark.sql.functions.col
    val base = Seq((0L, words("alpha", 30)), (2L, words("beta", 30)))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
    graft.operators.Dedup.writeSpanIndex(base, "stream_spanidx", s"$tmp")
    val input = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingOps.spanDupIngestStream(
      input.toDF().toDF("doc_id", "text"), "stream_spanidx",
      maxSpanTokens = 10,
      (a, _) => admitted.synchronized {
        admitted ++= a.select("doc_id").collect().map(_.getLong(0))
      })
    try {
      // doc 10 embeds a 12-token verbatim slice of indexed doc 0 (>=
      // the 10-token gate) inside fresh text; doc 11 shares nothing
      val quote = words("alpha", 30).split(" ").slice(5, 17).mkString(" ")
      input.addData(
        (10L, s"fresh1 fresh2 fresh3 $quote tail1 tail2"),
        (11L, words("gamma", 25)))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(11L),
        s"batch admitted $admitted (want only the fresh 11)")
      // a 6-token quote sits under the 10-token gate -> admitted
      admitted.clear()
      val shortQuote = words("beta", 30).split(" ").slice(0, 6).mkString(" ")
      input.addData((20L, s"new1 new2 $shortQuote new3 new4 new5"))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(20L),
        s"short quote wrongly dropped: $admitted")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_spanidx_pgrams")
    }
  }

  test("corpusIngestStream chains all gates; batch ≡ stream; mid-chain replay duplicates nothing") {
    // VERDICT r12 ask #2: the composed nightly ingest loop — PII scrub
    // → line scrub → span gate → band near-dup → gram novelty — as ONE
    // micro-batch stream with ONE ledger commit per batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpusingest")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha")), (1L, words("beta")))
      .toDF("doc_id", "text")
    def buildIndexes(pfx: String): StreamingOps.CorpusIngestConfig = {
      graft.operators.Dedup.writeBandIndex(base, s"${pfx}_band", s"$tmp/$pfx-b")
      graft.operators.Dedup.writeGramIndex(base, s"${pfx}_gram", s"$tmp/$pfx-g")
      graft.operators.Dedup.writeSpanIndex(
        base.select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("toks")),
        s"${pfx}_span", s"$tmp/$pfx-s")
      StreamingOps.CorpusIngestConfig(
        bandIndex = s"${pfx}_band", gramIndex = s"${pfx}_gram",
        spanIndex = s"${pfx}_span",
        boilerLines = Seq("SUBSCRIBE NOW"),
        maxSpanTokens = 12, minNovelShare = 0.5)
    }
    // batch 1: 10 = fresh but needs both scrubs (admit), 11 = 14-token
    // verbatim quote of indexed alpha (span drop), 12 = junction of
    // alpha+beta halves — no single near-dup, but grams are stale
    // (gram drop), 13 = fresh and clean (admit)
    val quote = words("alpha").split(" ").slice(3, 17).mkString(" ")
    val b1 = Seq(
      10L -> ("SUBSCRIBE NOW\n" + words("gamma") +
        "\ncontact bob@example.com today"),
      11L -> s"fresh1 fresh2 fresh3 $quote tailA tailB",
      12L -> (words("alpha").split(" ").take(10) ++
        words("beta").split(" ").take(10)).mkString(" "),
      13L -> words("epsilon"))
    // batch 2: 20 = tail-edit near-dup of the JUST-ADMITTED 13 (band
    // drop — only if the band index actually grew; the span index is
    // write-once so it cannot catch this), 21 = fresh (admit)
    val b2 = Seq(
      20L -> words("epsilon").replace("epsilon20", "epsilonX"),
      21L -> words("delta"))
    def cleanup(pfx: String): Unit = Seq(
      s"${pfx}_band_bands", s"${pfx}_band_shingles",
      s"${pfx}_gram_grams", s"${pfx}_span_pgrams")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      // ---- stream mode ----
      val cfg = buildIndexes("ci_s")
      val admittedBy = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      val admittedRows =
        scala.collection.mutable.Map.empty[Long, Seq[(Long, String, Long, Long, Long)]]
      def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
        val rows = df.select("doc_id", "text", "pii_hits", "pii_clean",
          "lines_removed").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
        admittedBy(id) = rows.map(_._1)
        admittedRows(id) = rows
      }
      val input = MemoryStream[(Long, String)]
      val q = StreamingOps.corpusIngestStream(
        input.toDF().toDF("doc_id", "text"), cfg, cb)
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()
      assert(admittedBy(0L) == Seq(10L, 13L), s"batch 1: $admittedBy")
      assert(admittedBy(1L) == Seq(21L), s"batch 2: $admittedBy")
      // the scrubs actually ran on the admitted frame
      val d10 = admittedRows(0L).find(_._1 == 10L).get
      assert(!d10._2.contains("bob@example.com"), "PII survived the scrub")
      assert(!d10._2.contains("SUBSCRIBE"), "boilerplate line survived")
      assert(d10._3 >= 1L && d10._4 == 1L && d10._5 == 1L,
        s"scrub audit columns wrong: $d10")

      // ---- batch mode over fresh identical indexes (one definition,
      // two modes) ----
      val cfgB = buildIndexes("ci_b")
      val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cbB(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        got(id) = df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      StreamingOps.corpusIngestBatch(b1.toDF("doc_id", "text"), 0L, cfgB, cbB)
      StreamingOps.corpusIngestBatch(b2.toDF("doc_id", "text"), 1L, cfgB, cbB)
      assert(got(0L) == admittedBy(0L) && got(1L) == admittedBy(1L),
        s"batch mode diverged from stream: $got vs $admittedBy")

      // ---- mid-chain replay under the original batch id ----
      StreamingOps.corpusIngestBatch(b2.toDF("doc_id", "text"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(21L), "replay changed the admitted set")
      // worst-case retry: appends landed but the done marker was lost
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, s"${cfg.bandIndex}_shingles", 1L, tag = "corpus_pipeline")
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.corpusIngestBatch(b2.toDF("doc_id", "text"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(21L), "replay after lost done-marker")
      // no duplicate rows across ALL grown indexes
      for (t <- Seq(s"${cfg.bandIndex}_bands", s"${cfg.bandIndex}_shingles",
          s"${cfg.gramIndex}_grams")) {
        val df = spark.table(t)
        val dups = if (df.columns.contains("doc_id"))
          df.groupBy("doc_id").count()
            .filter(col("count") > 1).collect().mkString(",")
        else ""
        assert(df.count() == df.distinct().count(),
          s"$t holds duplicate rows after replay: $dups")
      }
    } finally { cleanup("ci_s"); cleanup("ci_b") }
  }

  test("corpusIngestStream with probe gate + coreset stages: batch ≡ stream, one ledger, zero duplicate centers") {
    // VERDICT r13 ask #7: the q183 probe gate and the coreset
    // admission as optional stages 6-7 of the composed chain, sharing
    // the SINGLE ledger commit (center picks ride a marker column)
    // instead of running as a separate loop with its own ledger.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpuscore")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha"))).toDF("doc_id", "text")
    def build(pfx: String): StreamingOps.CorpusIngestConfig = {
      graft.operators.Dedup.writeBandIndex(base, s"${pfx}_band", s"$tmp/$pfx-b")
      graft.operators.Dedup.writeGramIndex(base, s"${pfx}_gram", s"$tmp/$pfx-g")
      graft.operators.Dedup.writeSpanIndex(
        base.select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("toks")),
        s"${pfx}_span", s"$tmp/$pfx-s")
      graft.operators.Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
        s"${pfx}_core", s"$tmp/$pfx-c")
      StreamingOps.CorpusIngestConfig(
        bandIndex = s"${pfx}_band", gramIndex = s"${pfx}_gram",
        spanIndex = s"${pfx}_span", boilerLines = Seq("SUBSCRIBE NOW"),
        maxSpanTokens = 12, minNovelShare = 0.5,
        // keep iff 2*e0 - 2*e1 - 0.25 >= 0 (probeGateStream's fixture)
        probeWeights = Some((Array(2.0, -2.0, 0.0), -0.25)),
        coresetIndex = Some(s"${pfx}_core"), coresetR2 = 1.0)
    }
    // 10: clean text, probe-keep, far embedding  -> admit + center
    // 13: clean text, probe-DROP (e1 dominates)  -> not admitted at all
    val b1 = Seq(
      (10L, words("gamma"), Array(3.0f, 0.0f, 0.0f)),
      (13L, words("epsilon"), Array(0.0f, 3.0f, 0.0f)))
    // 21: keep, but within r of center 10        -> admit, NO center
    // 22: keep, far from everything              -> admit + center
    val b2 = Seq(
      (21L, words("delta"), Array(3.1f, 0.0f, 0.5f)),
      (22L, words("zeta"), Array(6.0f, 0.0f, 0.0f)))
    def cleanup(pfx: String): Unit = Seq(
      s"${pfx}_band_bands", s"${pfx}_band_shingles", s"${pfx}_gram_grams",
      s"${pfx}_span_pgrams", s"${pfx}_core_centers")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def centersOf(pfx: String): Seq[Long] =
      spark.table(s"${pfx}_core_centers").select("vec_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    try {
      // ---- stream mode ----
      val cfg = build("cc_s")
      val admittedBy = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        admittedBy(id) = df.select("doc_id").collect()
          .map(_.getLong(0)).sorted.toSeq
      val input = MemoryStream[(Long, String, Array[Float])]
      val q = StreamingOps.corpusIngestStream(
        input.toDF().toDF("doc_id", "text", "embedding"), cfg, cb)
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()
      assert(admittedBy(0L) == Seq(10L), s"probe gate in-chain: $admittedBy")
      assert(admittedBy(1L) == Seq(21L, 22L), s"batch 2: $admittedBy")
      assert(centersOf("cc_s") == Seq(0L, 10L, 22L),
        s"center picks: ${centersOf("cc_s")}")

      // ---- batch mode over fresh identical stores ----
      val cfgB = build("cc_b")
      val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cbB(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        got(id) = df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      StreamingOps.corpusIngestBatch(
        b1.toDF("doc_id", "text", "embedding"), 0L, cfgB, cbB)
      StreamingOps.corpusIngestBatch(
        b2.toDF("doc_id", "text", "embedding"), 1L, cfgB, cbB)
      assert(got(0L) == admittedBy(0L) && got(1L) == admittedBy(1L),
        s"batch mode diverged: $got vs $admittedBy")
      assert(centersOf("cc_b") == centersOf("cc_s"),
        "batch-mode centers diverged from stream")

      // ---- mid-chain replay under the original id; worst case: the
      // appends landed but the done marker was lost ----
      StreamingOps.corpusIngestBatch(
        b2.toDF("doc_id", "text", "embedding"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(21L, 22L), "replay changed admission")
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, s"${cfg.bandIndex}_shingles", 1L, tag = "corpus_pipeline")
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.corpusIngestBatch(
        b2.toDF("doc_id", "text", "embedding"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(21L, 22L), "post-marker-loss replay")
      assert(centersOf("cc_s") == Seq(0L, 10L, 22L),
        s"replay duplicated or changed centers: ${centersOf("cc_s")}")
      val c = spark.table("cc_s_core_centers")
      assert(c.count() == c.select("vec_id").distinct().count(),
        "duplicate center rows after replay")
    } finally { cleanup("cc_s"); cleanup("cc_b") }
  }

  test("scheduled maintenance: an append-heavy run triggers exactly one band rebuild; admission semantics survive the swap") {
    // VERDICT r13 ask #8: q192's signals wired into the ingest loop —
    // every maintainEvery batches the loop reads the staleness report
    // and, when the bit trips, runs the rebuild actuator between
    // micro-batches. Exactly one rebuild must fire here (the fresh
    // build's meta covers the earlier appends; later admissions stay
    // under the 20% threshold), and a near-dup of a PRE-rebuild
    // admission must still drop afterwards.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-maint")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val baseRows = Seq((0L, words("alpha")), (1L, words("beta")))
    val base = baseRows.toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(base, "mt_band", s"$tmp/b")
    graft.operators.Dedup.writeGramIndex(base, "mt_gram", s"$tmp/g")
    graft.operators.Dedup.writeSpanIndex(
      base.select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks")),
      "mt_span", s"$tmp/s")
    val admittedTexts =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val rebuilds =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val admittedBy = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    val cfg = StreamingOps.CorpusIngestConfig(
      bandIndex = "mt_band", gramIndex = "mt_gram", spanIndex = "mt_span",
      boilerLines = Seq("SUBSCRIBE NOW"), maxSpanTokens = 12,
      minNovelShare = 0.5,
      maintainEvery = 2, bandStorePath = Some(s"$tmp/b"),
      rebuildCorpus =
        Some(() => (baseRows ++ admittedTexts).toDF("doc_id", "text")),
      onRebuild = Some((f, id) => rebuilds += ((f, id))))
    def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      admittedBy(id) = rows.map(_._1).toSeq
      admittedTexts ++= rows
    }
    try {
      // batches 0-1: three fresh admissions push the appended fraction
      // to 3/5 = 60% >= 20% -> the id=1 maintenance window rebuilds
      StreamingOps.corpusIngestBatch(
        Seq((10L, words("gamma")), (11L, words("delta")))
          .toDF("doc_id", "text"), 0L, cfg, cb)
      StreamingOps.corpusIngestBatch(
        Seq((12L, words("epsilon"))).toDF("doc_id", "text"), 1L, cfg, cb)
      assert(admittedBy(0L) == Seq(10L, 11L) && admittedBy(1L) == Seq(12L))
      assert(rebuilds.toSeq == Seq(("band", 1L)),
        s"exactly one rebuild must fire at the id=1 window: $rebuilds")
      // the rebuilt store reports clean
      val row = graft.operators.IndexMaintenance.stalenessReport(spark,
        Seq(graft.operators.IndexMaintenance.FamilySpec("band",
          "mt_band_shingles"))).collect().head
      assert(row.getLong(3) == 0L && row.getLong(6) == 0L,
        s"rebuild must clear staleness: $row")
      // REPLAY ACROSS THE SWAP (review r14: the ledger lives inside
      // the store dir, so the rebuild must carry it): retry batch 1
      // under its original id — the rebuilt index CONTAINS batch 1's
      // docs, so without the preserved ledger the non-replay path
      // would score them as dups and silently commit an empty set
      StreamingOps.corpusIngestBatch(
        Seq((12L, words("epsilon"))).toDF("doc_id", "text"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(12L),
        s"post-rebuild replay lost the admitted set: $admittedBy")
      // worst case: the append marker was also lost — the guarded
      // append must find the rows already present and add nothing
      val ld = graft.streaming.IngestLedger.dirFor(
        spark, "mt_band_shingles", 1L, tag = "corpus_pipeline")
      ld.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ld, "_APPEND_DONE"), false)
      val shinglesBefore = spark.table("mt_band_shingles").count()
      StreamingOps.corpusIngestBatch(
        Seq((12L, words("epsilon"))).toDF("doc_id", "text"), 1L, cfg, cb)
      assert(admittedBy(1L) == Seq(12L))
      assert(spark.table("mt_band_shingles").count() == shinglesBefore,
        "post-rebuild lost-marker replay duplicated shingle rows")
      assert(rebuilds.size == 1, s"replay must not re-rebuild: $rebuilds")
      // batch 2: a tail-edit near-dup of PRE-rebuild admission 10 must
      // still drop (the swap preserved admission semantics); no fresh
      // docs, so no appended fraction accrues
      StreamingOps.corpusIngestBatch(
        Seq((20L, words("gamma").replace("gamma20", "gammaX")))
          .toDF("doc_id", "text"), 2L, cfg, cb)
      assert(admittedBy(2L) == Seq(),
        s"near-dup of a pre-rebuild admission must drop: $admittedBy")
      // batch 3: one fresh admission keeps the fraction at 1/6 < 20%,
      // so the id=3 maintenance window must NOT rebuild again
      StreamingOps.corpusIngestBatch(
        Seq((21L, words("zeta"))).toDF("doc_id", "text"), 3L, cfg, cb)
      assert(admittedBy(3L) == Seq(21L))
      assert(rebuilds.size == 1,
        s"quiet store must not rebuild at the id=3 window: $rebuilds")
    } finally Seq("mt_band_bands", "mt_band_shingles", "mt_gram_grams",
      "mt_span_pgrams").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("mediaIngestStream: perceptual dups of the store, earlier admissions AND the same batch drop; batch ≡ stream; replay duplicates nothing") {
    // round 14: the band-index ingest discipline applied to the
    // multimodal column — a re-encoded image of a stored asset and a
    // 1-px shift of a JUST-ADMITTED asset must both drop, across both
    // modes, with the ledger replay contract intact.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{MediaAsset, MultiModal}
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediaidx")
    def asset(aid: Long, imgId: Long, v: Int): MediaAsset =
      MediaAsset(aid, "image", MultiModal.synthImageBytes(imgId, v), "t")
    def buildStore(name: String, path: String): Unit =
      MultiModal.writePhashIndex(
        (0L until 4L).map(i =>
          (i, MultiModal.dHash64(MultiModal.synthImageBytes(i, 0)).get))
          .toDF("asset_id", "hash"),
        name, path)
    // 100 = BMP re-encode of stored image 0 -> drop against the store
    // 101 = fresh image                      -> admit
    // 102 = 1-px shift of 101, SAME batch   -> drop (intra-batch pair;
    //       the lower asset_id 101 wins — ADVICE r14)
    val b1 = Seq(asset(100L, 0L, 1), asset(101L, 50L, 0),
      asset(102L, 50L, 2))
    // 200 = 1-px shift of ADMITTED 101      -> drop (the index grew)
    // 201 = fresh image                      -> admit
    val b2 = Seq(asset(200L, 50L, 2), asset(201L, 60L, 0))
    try {
      // ---- batch mode ----
      val nb = "mediaidx_b_" + System.nanoTime()
      buildStore(nb, s"$tmp/b")
      val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        got(id) = df.select("asset_id").collect().map(_.getLong(0))
          .sorted.toSeq
      StreamingOps.mediaIngestBatch(b1.toDF(), 0L, nb, growIndex = true, cb)
      StreamingOps.mediaIngestBatch(b2.toDF(), 1L, nb, growIndex = true, cb)
      assert(got(0L) == Seq(101L) && got(1L) == Seq(201L),
        s"batch admissions wrong: $got")
      // ---- stream mode over a fresh identical store ----
      val ns = "mediaidx_s_" + System.nanoTime()
      buildStore(ns, s"$tmp/s")
      val gotS = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cbS(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        gotS(id) = df.select("asset_id").collect().map(_.getLong(0))
          .sorted.toSeq
      val input = MemoryStream[MediaAsset]
      val q = StreamingOps.mediaIngestStream(
        input.toDF(), ns, growIndex = true, cbS)
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()
      assert(gotS(0L) == got(0L) && gotS(1L) == got(1L),
        s"stream diverged from batch: $gotS vs $got")
      // ---- replay batch 2 under its original id; then the worst
      // case: appends landed but the done marker was lost ----
      StreamingOps.mediaIngestBatch(b2.toDF(), 1L, nb, growIndex = true, cb)
      assert(got(1L) == Seq(201L), "replay changed the admitted set")
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, s"${nb}_phash", 1L)
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.mediaIngestBatch(b2.toDF(), 1L, nb, growIndex = true, cb)
      assert(got(1L) == Seq(201L), "post-marker-loss replay")
      val t = spark.table(s"${nb}_phash")
      assert(t.count() == t.select("asset_id", "bk").distinct().count(),
        "duplicate banded rows after replay")
      // exactly the store + the two admitted assets, 4 bands each
      assert(t.count() == (4 + 2) * 4,
        s"unexpected phash row count: ${t.count()}")
    } finally Seq("mediaidx_b", "mediaidx_s").foreach { p =>
      // names carry nanoTime suffixes; drop by catalog listing
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith(p))
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS ${tb.name}"))
    }
  }

  test("media scheduled maintenance: an append-heavy run triggers exactly one phash rebuild; admission semantics and ledgers survive the swap") {
    // VERDICT r14 ask #2: the band loop's r13-ask-#8 rebuild window
    // wired into mediaIngestBatch — exactly one rebuild fires on the
    // append-heavy run, a near-dup of a PRE-rebuild admission still
    // drops afterwards, a quiet window does not re-fire, and a replay
    // of a pre-rebuild batch reproduces its admitted set (the ledgers
    // rode rebuildFamily's carry).
    import spark.implicits._
    import graft.operators.{MediaAsset, MultiModal, IndexMaintenance}
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediamaint")
    val name = "mediamaint_" + System.nanoTime()
    def asset(aid: Long, imgId: Long, v: Int): MediaAsset =
      MediaAsset(aid, "image", MultiModal.synthImageBytes(imgId, v), "t")
    def hashOf(imgId: Long): Long =
      MultiModal.dHash64(MultiModal.synthImageBytes(imgId, 0)).get
    // store: base images 0, 1; the asset->image map of everything the
    // loop may admit, for the rebuild corpus
    val baseAssets = Seq((0L, 0L), (1L, 1L))
    val imageOf = Map(10L -> 50L, 11L -> 60L, 12L -> 70L, 21L -> 80L)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rebuilds = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val ids = df.select("asset_id").collect().map(_.getLong(0))
        .sorted.toSeq
      got(id) = ids
      admitted ++= ids
    }
    def run(batch: Seq[MediaAsset], id: Long): Unit =
      StreamingOps.mediaIngestBatch(batch.toDF(), id, name,
        growIndex = true, cb, maintainEvery = 2,
        storePath = Some(s"$tmp/live"),
        rebuildCorpus = Some(() =>
          (baseAssets ++ admitted.map(a => (a, imageOf(a))))
            .map { case (a, img) => (a, hashOf(img)) }
            .toDF("asset_id", "hash")),
        onRebuild = Some((f, id) => rebuilds += ((f, id))))
    try {
      MultiModal.writePhashIndex(
        baseAssets.map { case (a, img) => (a, hashOf(img)) }
          .toDF("asset_id", "hash"), name, s"$tmp/live")
      // batches 0-1: three fresh admissions push the appended fraction
      // to 12/20 = 60% >= 20% -> the id=1 maintenance window rebuilds
      run(Seq(asset(10L, 50L, 0), asset(11L, 60L, 0)), 0L)
      run(Seq(asset(12L, 70L, 0)), 1L)
      assert(got(0L) == Seq(10L, 11L) && got(1L) == Seq(12L),
        s"admissions wrong: $got")
      assert(rebuilds.toSeq == Seq(("phash", 1L)),
        s"exactly one rebuild must fire at the id=1 window: $rebuilds")
      val cleared = IndexMaintenance.stalenessReport(spark, Seq(
        IndexMaintenance.FamilySpec("phash", s"${name}_phash")))
        .collect().head
      assert(cleared.getLong(3) == 0L && cleared.getLong(6) == 0L,
        s"rebuilt store must report clean: $cleared")
      // batch 2: a 1-px shift of PRE-rebuild admission 10 must still
      // drop (the rebuilt store holds it); one fresh admit -> 24 rows
      run(Seq(asset(20L, 50L, 2), asset(21L, 80L, 0)), 2L)
      assert(got(2L) == Seq(21L),
        s"near-dup of a pre-rebuild admission must drop: $got")
      // batch 3: nothing admits; the id=3 window reads 4/24 = 16.7% <
      // 20% -> the quiet store must NOT re-fire
      run(Seq(asset(30L, 0L, 1)), 3L)
      assert(got(3L) == Seq.empty, s"re-encode of stored must drop: $got")
      assert(rebuilds.size == 1,
        s"quiet store must not rebuild at the id=3 window: $rebuilds")
      // replay a PRE-rebuild batch under its original id: the ledger
      // rode the rebuild swap, so the admitted set reproduces and the
      // guarded append duplicates nothing
      val admittedBefore = admitted.toSeq
      run(Seq(asset(12L, 70L, 0)), 1L)
      assert(got(1L) == Seq(12L),
        "pre-rebuild batch replay changed the admitted set")
      admitted.clear(); admitted ++= admittedBefore
      val t = spark.table(s"${name}_phash")
      assert(t.count() == t.select("asset_id", "bk").distinct().count(),
        "duplicate banded rows after post-rebuild replay")
      assert(t.count() == (2 + 4) * 4,
        s"unexpected phash row count: ${t.count()}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_phash")
      graft.operators.Q.releaseManaged()
    }
  }

  test("videoIngestStream: re-encodes and clips of the store drop, intra-batch dup drops, fresh admits; batch ≡ stream; replay duplicates nothing") {
    // round 15: the media ingest discipline at the FRAME grain — a
    // per-frame re-encode of stored footage, a clip of a JUST-admitted
    // video, and a clip arriving in the SAME batch as its source must
    // all drop (containment ≥ ceil(0.5 × frames)), across both modes,
    // with the ledger replay contract intact.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{MediaAsset, MultiModal}
    val tmp = java.nio.file.Files.createTempDirectory("graft-videoing")
    def img(id: Long, f: Long, v: Int = 0): Array[Byte] =
      MultiModal.synthImageBytes(2000L + id * 8 + f, v)
    def video(aid: Long, frames: Seq[Array[Byte]]): MediaAsset =
      MediaAsset(aid, "video", MultiModal.frameStackBytes(frames), "t")
    def buildStore(name: String, path: String): Unit =
      MultiModal.writeVideoIndex(
        MultiModal.videoFrameHashes(
          Seq(0L, 1L).map(id =>
            video(id, (0L to 5L).map(img(id, _)))).toDS()),
        name, path)
    // 100 = per-frame 1-px-shift re-encode of stored 0  -> drop (6/6)
    // 101 = fresh footage (id 10)                        -> admit
    // 102 = clip of 101's OWN batch (frames 1-5)         -> drop intra
    val b1 = Seq(
      video(100L, (0L to 5L).map(img(0L, _, 2))),
      video(101L, (0L to 5L).map(img(10L, _))),
      video(102L, (1L to 5L).map(img(10L, _))))
    // 200 = 3-frame clip of ADMITTED 101                 -> drop (3/3)
    // 201 = fresh footage (id 11)                        -> admit
    // 202 = 3-frame clip of 203's footage, LOWER id      -> admit
    // 203 = long fresh video (8 frames) sharing 202's 3  -> admit:
    //       the drop rule measures containment against the HIGHER
    //       asset's OWN frames (3/8 < 0.5) — a short clip sorting
    //       first must never discard the long video's unique footage
    val b2 = Seq(
      video(200L, (0L to 2L).map(img(10L, _))),
      video(201L, (0L to 5L).map(img(11L, _))),
      video(202L, (0L to 2L).map(img(12L, _))),
      video(203L, (0L to 7L).map(img(12L, _))))
    try {
      // ---- batch mode ----
      val nb = "videoing_b_" + System.nanoTime()
      buildStore(nb, s"$tmp/b")
      val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        got(id) = df.select("asset_id").collect().map(_.getLong(0))
          .sorted.toSeq
      StreamingOps.videoIngestBatch(b1.toDF(), 0L, nb,
        growIndex = true, cb)
      StreamingOps.videoIngestBatch(b2.toDF(), 1L, nb,
        growIndex = true, cb)
      assert(got(0L) == Seq(101L) &&
        got(1L) == Seq(201L, 202L, 203L),
        s"batch admissions wrong: $got")
      // ---- stream mode over a fresh identical store ----
      val ns = "videoing_s_" + System.nanoTime()
      buildStore(ns, s"$tmp/s")
      val gotS = scala.collection.mutable.Map.empty[Long, Seq[Long]]
      def cbS(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        gotS(id) = df.select("asset_id").collect().map(_.getLong(0))
          .sorted.toSeq
      val input = MemoryStream[MediaAsset]
      val q = StreamingOps.videoIngestStream(
        input.toDF(), ns, growIndex = true, cbS)
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()
      assert(gotS(0L) == got(0L) && gotS(1L) == got(1L),
        s"stream diverged from batch: $gotS vs $got")
      // ---- replay batch 1 under its original id; then the worst
      // case: appends landed but the done marker was lost ----
      StreamingOps.videoIngestBatch(b1.toDF(), 0L, nb,
        growIndex = true, cb)
      assert(got(0L) == Seq(101L), "replay changed the admitted set")
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, s"${nb}_phash", 0L, tag = "video_ingest")
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.videoIngestBatch(b1.toDF(), 0L, nb,
        growIndex = true, cb)
      assert(got(0L) == Seq(101L), "post-marker-loss replay")
      val t = spark.table(s"${nb}_phash")
      assert(t.count() == t.select("asset_id", "bk").distinct().count(),
        "duplicate banded rows after replay")
      // store (2 videos x 6) + admitted 101 (6) + 201 (6) + 202 (3) +
      // 203 (8) frames, 4 bands each
      assert(t.count() == (12 + 6 + 6 + 3 + 8) * 4,
        s"unexpected banded row count: ${t.count()}")
    } finally Seq("videoing_b", "videoing_s").foreach { p =>
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith(p))
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS ${tb.name}"))
    }
  }

  test("corpusIngestBatch replay tolerates a pre-coreset ledger (no center column)") {
    // ADVICE r14: a ledger written before the coreset stage was
    // enabled (config upgraded between runs) has no `center` marker —
    // its replay must reproduce the admitted set with ZERO centers,
    // not throw on the missing column.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-precoreset")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha"))).toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(base, "pc_band", s"$tmp/b")
    graft.operators.Dedup.writeGramIndex(base, "pc_gram", s"$tmp/g")
    graft.operators.Dedup.writeSpanIndex(
      base.select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks")),
      "pc_span", s"$tmp/s")
    val cfgNoCore = StreamingOps.CorpusIngestConfig(
      bandIndex = "pc_band", gramIndex = "pc_gram", spanIndex = "pc_span",
      boilerLines = Seq.empty, maxSpanTokens = 12, minNovelShare = 0.5)
    val got = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    def cb(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      got(id) = df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Seq((10L, words("gamma"), Array(3.0f, 0.0f, 0.0f)))
      .toDF("doc_id", "text", "embedding")
    try {
      // original run WITHOUT the coreset stage: marker-less ledger
      StreamingOps.corpusIngestBatch(b, 0L, cfgNoCore, cb)
      assert(got(0L) == Seq(10L))
      // config upgraded between runs; worst-case replay (append marker
      // lost) under the original id must not fail on the missing
      // column and must admit zero centers beyond the store seed
      graft.operators.Learn.writeCoresetStore(
        Seq((0L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
        "pc_core", s"$tmp/c")
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, "pc_band_shingles", 0L, tag = "corpus_pipeline")
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.corpusIngestBatch(b, 0L,
        cfgNoCore.copy(coresetIndex = Some("pc_core"), coresetR2 = 1.0),
        cb)
      assert(got(0L) == Seq(10L),
        "pre-coreset replay changed the admitted set")
      val centers = spark.table("pc_core_centers").select("vec_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(centers == Seq(0L),
        s"marker-less ledger must reproduce ZERO centers: $centers")
    } finally Seq("pc_band_bands", "pc_band_shingles", "pc_gram_grams",
      "pc_span_pgrams", "pc_core_centers").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("replayed gram-novelty micro-batch admits the SAME docs (ledger idempotency)") {
    // foreachBatch retry contract (ADVICE r10): a batch retried AFTER
    // appendToGramIndex wrote its admitted grams must not re-probe the
    // mutated index — without the ledger, the admitted docs score zero
    // novelty on replay and silently vanish. Replaying the extracted
    // batch body under the original batch id IS the retry scenario.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-replgram")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha"))).toDF("doc_id", "text")
    graft.operators.Dedup.writeGramIndex(base, "repl_gramidx", s"$tmp")
    try {
      val batch = Seq((10L, words("gamma")), (11L, words("alpha")))
        .toDF("doc_id", "text")
      def run(): Seq[Long] = {
        val got = scala.collection.mutable.ArrayBuffer.empty[Long]
        StreamingOps.gramNoveltyBatch(batch, 7L, "repl_gramidx",
          minNovelShare = 0.5, growIndex = true,
          (a, _) => got ++= a.select("doc_id").collect().map(_.getLong(0)))
        got.sorted.toSeq
      }
      assert(run() == Seq(10L), "first attempt admits the novel doc")
      // the index now holds doc 10's grams; a ledgerless replay would
      // admit NOTHING. The ledger must reproduce the original set.
      assert(run() == Seq(10L), "replay admits the same set")
      // and the doubly-run append kept the gram table distinct
      val grams = spark.table("repl_gramidx_grams")
      assert(grams.count() == grams.distinct().count(),
        "gram table stays distinct across replays")
    } finally spark.sql("DROP TABLE IF EXISTS repl_gramidx_grams")
  }

  test("replayed band-index micro-batch admits the same docs and never duplicates index rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-replband")
    def words(prefix: String): String =
      (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val base = Seq((0L, words("alpha"))).toDF("doc_id", "text")
    graft.operators.Dedup.writeBandIndex(base, "repl_bandidx", s"$tmp")
    try {
      val batch = Seq(
        (10L, words("gamma")),
        (11L, words("alpha").replace("alpha20", "alphaX")))
        .toDF("doc_id", "text")
      def run(): Seq[Long] = {
        val got = scala.collection.mutable.ArrayBuffer.empty[Long]
        StreamingOps.neardupProbeBatch(batch, 3L, "repl_bandidx",
          growIndex = true,
          (n, _) => got ++= n.select("doc_id").collect().map(_.getLong(0)))
        got.sorted.toSeq
      }
      assert(run() == Seq(10L), "first attempt admits the novel doc")
      assert(run() == Seq(10L), "replay admits the same set")
      // worst-case retry: append fully landed but the done marker was
      // lost — the replay must take the GUARDED append and still not
      // duplicate any band/shingle row
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, "repl_bandidx_shingles", 3L)
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      assert(run() == Seq(10L), "replay after lost done-marker")
      val sh = spark.table("repl_bandidx_shingles")
      assert(sh.count() == sh.distinct().count(),
        "shingle table stays duplicate-free")
      val bands = spark.table("repl_bandidx_bands")
      assert(bands.count() == bands.distinct().count(),
        "band table stays duplicate-free")
    } finally {
      spark.sql("DROP TABLE IF EXISTS repl_bandidx_bands")
      spark.sql("DROP TABLE IF EXISTS repl_bandidx_shingles")
    }
  }

  test("replayed ANN ingest micro-batch admits the same vectors and never duplicates code rows") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-replpq")
    val base = graft.operators.Q.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 40)
    graft.operators.Ann.writePqIndex(base, "repl_pqidx", s"$tmp")
    try {
      val vec0 = base.filter(col("vec_id") === 0).head.getSeq[Float](1)
        .toArray
      val novelA = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
      val batch = Seq((100L, vec0), (101L, novelA))
        .toDF("vec_id", "embedding")
      def run(): Seq[Long] = {
        val got = scala.collection.mutable.ArrayBuffer.empty[Long]
        StreamingOps.annIngestBatch(batch, 5L, "repl_pqidx",
          simFloor = 0.95, growIndex = true,
          (n, _) => got ++= n.select("vec_id").collect().map(_.getLong(0)))
        got.sorted.toSeq
      }
      assert(run() == Seq(101L), "first attempt admits the novel vector")
      // replay: 101 is now indexed; a ledgerless replay would score it
      // as its own duplicate and admit nothing
      assert(run() == Seq(101L), "replay admits the same set")
      // lost done-marker → guarded append path; still one code row
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, "repl_pqidx_codes", 5L)
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      assert(run() == Seq(101L), "replay after lost done-marker")
      val codes = spark.table("repl_pqidx_codes")
        .filter(col("vec_id") === 101L)
      assert(codes.count() == 1L, "exactly one code row for the admitted vector")
      val vecs = spark.table("repl_pqidx_vectors")
        .filter(col("vec_id") === 101L)
      assert(vecs.count() == 1L, "exactly one vector row for the admitted vector")
    } finally
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS repl_pqidx_$t"))
  }

  test("text-index loop: positional appends exactly-once; lexical is rebuild-only and re-cuts on staleness") {
    // VERDICT r15 ask #7 — the deliberate two-family policy: a
    // positional posting is doc-local (append is exact), lexical
    // df/avgdl freeze at build (append would be WRONG, so the loop
    // never appends it and the staleness window re-cuts instead)
    import spark.implicits._
    import graft.operators.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-textidx")
    val suf = System.nanoTime()
    val nl = s"textidx_lex_$suf"
    val np = s"textidx_pos_$suf"
    // 8 base docs x 6 distinct words = 48 lexical postings at build
    val base = (0L until 8L).map(i =>
      (i, "en", s"alpha beta doc$i hash join gamma"))
      .toDF("doc_id", "lang", "text")
    TextAnalysis.writeLexicalIndex(base, nl, s"$tmp/lex")
    TextAnalysis.writePositionalIndex(base, np, s"$tmp/pos")
    // 1 new doc, 4 new postings: 4/52 < 20% append pressure -> frozen
    val b0 = Seq((100L, "en", "hash join extra new0"))
      .toDF("doc_id", "lang", "text")
    // 3 docs x 6 fresh words: (70-48)/70 > 20% -> rebuild fires
    val b1 = (0 until 3).map(i => (200L + i, "en",
      (0 until 6).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    var landed = base
    val rebuilds = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val cfg = StreamingOps.TextIndexIngestConfig(nl, np, s"$tmp/lex",
      maintainEvery = 1, rebuildCorpus = Some(() => landed),
      onRebuild = Some((f, id) => rebuilds += ((f, id))),
      positionalPath = Some(s"$tmp/pos"))
    try {
      landed = base.unionByName(b0)
      StreamingOps.textIndexIngestBatch(b0, 0L, cfg, (_, _) => ())
      // positional grew by doc 100's 4 postings; lexical stayed frozen
      assert(spark.table(s"${np}_postings").count() == 48L + 4L)
      assert(spark.table(s"${nl}_postings").count() == 48L,
        "lexical store must never be appended")
      assert(rebuilds.isEmpty,
        s"sub-threshold append pressure must not rebuild: $rebuilds")
      landed = landed.unionByName(b1)
      StreamingOps.textIndexIngestBatch(b1, 1L, cfg, (_, _) => ())
      assert(rebuilds.toList == List(("lexical", 1L)),
        s"exactly one lexical rebuild expected: $rebuilds")
      // the re-cut lexical store covers the FULL landed corpus
      spark.catalog.refreshTable(s"${nl}_postings")
      assert(spark.table(s"${nl}_postings").count() == 70L,
        "rebuilt lexical store must index the current corpus")
      val posCount = spark.table(s"${np}_postings").count()
      assert(posCount == 48L + 4L + 18L)
      // full replay under the original id: nothing changes
      StreamingOps.textIndexIngestBatch(b1, 1L, cfg, (_, _) => ())
      assert(spark.table(s"${np}_postings").count() == posCount,
        "replay must not duplicate positional postings")
      assert(rebuilds.size == 1,
        "a fresh store must not re-trip the staleness bit on replay")
      // worst case: appends landed but the done marker was lost
      val ledgerDir = graft.streaming.IngestLedger.dirFor(
        spark, s"${np}_postings", 1L, tag = "text_index")
      ledgerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ledgerDir, "_APPEND_DONE"),
          false)
      StreamingOps.textIndexIngestBatch(b1, 1L, cfg, (_, _) => ())
      assert(spark.table(s"${np}_postings").count() == posCount,
        "post-marker-loss replay must go through the doc guard")
      // fresh-session start (ADVICE r16): the positional catalog entry
      // is session state — drop it (files untouched) and drive a new
      // batch; the startup recovery must re-register the store before
      // the append touches it, and the append must land
      spark.sql(s"DROP TABLE IF EXISTS ${np}_postings")
      val b2 = Seq((300L, "en", "hash join late0"))
        .toDF("doc_id", "lang", "text")
      landed = landed.unionByName(b2)
      StreamingOps.textIndexIngestBatch(b2, 2L, cfg, (_, _) => ())
      assert(spark.table(s"${np}_postings").count() == posCount + 3L,
        "positional recovery must re-attach the store and append")
      // destroyed store (crash left neither catalog nor files): the
      // recovery REBUILDS from the landed corpus — which by the loop
      // convention already includes this batch — so the append must
      // go through the doc guard or every batch doc double-indexes
      // (round-17 review finding)
      spark.sql(s"DROP TABLE IF EXISTS ${np}_postings")
      val posDir = new org.apache.hadoop.fs.Path(s"$tmp/pos")
      posDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(posDir, true)
      val b3 = Seq((400L, "en", "hash join late1"))
        .toDF("doc_id", "lang", "text")
      landed = landed.unionByName(b3)
      StreamingOps.textIndexIngestBatch(b3, 3L, cfg, (_, _) => ())
      spark.catalog.refreshTable(s"${np}_postings")
      assert(spark.table(s"${np}_postings").count() == posCount + 6L,
        "rebuild-from-landed + guarded append must index batch docs " +
          "exactly once")
      // the appended positional store still serves the phrase probe —
      // old AND new docs (doc 100 carries the phrase)
      val hits = TextAnalysis.probePhraseIndex(
        spark, np, Seq("hash", "join"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(hits == ((0L until 8L) ++ Seq(100L, 300L, 400L)).sorted,
        s"phrase probe must see base + appended + recovered docs: $hits")
    } finally {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("textidx_"))
        .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS ${tb.name}"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("ccIngestStream: edge batches merge into the star store; census tracks; replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-ccstream")
    val input = MemoryStream[(Long, Long)]
    val censuses =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = StreamingOps.ccIngestStream(
      input.toDF().select(col("_1").as("src"), col("_2").as("dst")),
      "cc_stream_t", s"$tmp",
      (census, id) => censuses +=
        id -> census.collect().head.toSeq.map(_.asInstanceOf[Long]))
    try {
      input.addData((1L, 2L), (2L, 3L))
      q.processAllAvailable()
      // after batch 0: {1,2,3}
      assert(censuses.last._2 === Seq(3L, 1L, 3L, 1L),
        s"batch-0 census: ${censuses.last}")
      input.addData((3L, 4L), (10L, 11L))
      q.processAllAvailable()
      // after batch 1: {1,2,3,4} and {10,11} — the merge EXTENDED the
      // existing component and opened a new one
      assert(censuses.last._2 === Seq(6L, 2L, 4L, 2L),
        s"batch-1 census: ${censuses.last}")
      q.stop()
      // the streamed state equals the one-shot batch contraction
      val store = spark.table("cc_stream_t_stars")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = graft.operators.Graph.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst"))
        .filter(col("node") =!= col("comp"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(store === full, "stream ≡ batch contraction")
      // foreachBatch retry: re-running batch 1's body must leave the
      // store byte-identical — idempotent WITHOUT any ledger
      StreamingOps.ccIngestBatch(
        Seq((3L, 4L), (10L, 11L)).toDF("src", "dst"), 1L,
        "cc_stream_t", s"$tmp", (_, _) => ())
      val store2 = spark.table("cc_stream_t_stars")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(store2 === store, "replayed merge must be a no-op")
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS cc_stream_t_stars")
    }
  }
}
