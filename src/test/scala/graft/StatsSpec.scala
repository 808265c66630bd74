package graft

import org.apache.spark.sql.functions._

/** Algorithmic properties of the Stats/chunking operators that the
  * DuckDB oracle can't express: hash-sampling determinism under
  * arbitrary repartitioning, and the chunk-window coverage/overlap
  * invariants.
  */
class StatsSpec extends SparkSpec {

  test("q64: stratified hash sample is invariant under repartitioning") {
    val base = SparkEntry.queries("q64_stratified_sample")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // same query over a deliberately reshuffled input: hash sampling
    // must not depend on partition layout or row order
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(7, col("source"))
      .sortWithinPartitions(desc("doc_id"))
    val hexDig = conv(
      substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("long")
    val again = docs
      .withColumn("keep_lim",
        when(col("lang") === "en", 8L)
          .when(col("lang") === "de", 4L).otherwise(2L))
      .filter(hexDig < col("keep_lim"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang")
      .collect().map(_.toSeq).toSeq
    assert(again == base)
  }

  test("q107: hash-ordered sample picks the same k docs under any partitioning") {
    val k = 200
    def sampleIds(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .select(col("doc_id"),
        md5(concat(lit("s8:"), col("doc_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(k)
      .collect().map(_.getLong(0)).sorted.toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = sampleIds(docs)
    val b = sampleIds(docs.repartition(7, col("lang"))
      .sortWithinPartitions(desc("doc_id")))
    assert(a.length == math.min(k, docs.count()).toInt)
    assert(a == b, "hash-ordered sample depends on partition layout")
  }

  test("q70: chunks cover every token exactly; full chunks overlap by 10") {
    val w = 50; val st = 40
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") <= 30)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("tl"))
      .withColumn("n", size(col("tl")))
    val chunks = docs
      .withColumn("n_chunks",
        when(col("n") <= w, lit(1L)).otherwise(
          expr(s"1 + ((n - $w) + ${st - 1}) div $st")))
      .select(col("doc_id"), col("n"),
        posexplode(transform(
          sequence(lit(0L), col("n_chunks") - 1),
          i => slice(col("tl"), (i * st + 1).cast("int"), lit(w)))))
      .select(col("doc_id"), col("n"), col("pos"),
        size(col("col")).as("ct"))
    val perDoc = chunks.groupBy("doc_id", "n")
      .agg(count(lit(1)).as("k"), sum(col("ct")).as("tok_sum"),
        max(col("ct")).as("max_ct"), min(col("ct")).as("min_ct"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val n = r.getAs[Int]("n").toLong
      val k = r.getAs[Long]("k")
      val tokSum = r.getAs[Long]("tok_sum")
      // stride coverage: chunk i spans [i*st+1, i*st+w]; the union is
      // [1, (k-1)*st + last_len] = [1, n] ⇒ token sum = n + (k-1)*overlap
      assert(tokSum == n + (k - 1) * (w - st),
        s"doc ${r.get(0)}: chunks don't tile with 10-token overlap")
      assert(r.getAs[Int]("max_ct") <= w)
      // every chunk except possibly the last is full
      if (k > 1) assert(r.getAs[Int]("min_ct") > 0)
    }
  }

  test("cms estimate: never under, exact on collision-free keys, both key types") {
    graft.functions.HashFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100 long keys, key i appears i+1 times — known exact counts
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong)).toDF("k")
    val sk = rows.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val est = rows.distinct()
      .withColumn("est", call_function("graft_cms_estimate", lit(sk), col("k")))
      .as[(Long, Long)].collect().toMap
    (0 until 100).foreach { i =>
      assert(est(i.toLong) >= i + 1, s"CMS underestimated key $i — impossible")
      assert(est(i.toLong) <= i + 1 + 6, s"CMS overshoot on $i: ${est(i.toLong)}")
    }
    // string keys probe the string hash stream, not the long one
    val srows = Seq("a", "a", "b").toDF("s")
    val ssk = srows.agg(expr("count_min_sketch(s, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val sest = srows.distinct()
      .withColumn("est", call_function("graft_cms_estimate", lit(ssk), col("s")))
      .as[(String, Long)].collect().toMap
    assert(sest("a") == 2L && sest("b") == 1L)
  }

  test("q103 heavy-hitter contract bits hold at sf0.001") {
    val out = SparkEntry.queries("q103_cms_heavy_hitters")(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_no_under") == 1L)
      assert(r.getAs[Long]("cms_bound_ok") == 1L)
    }
    // total order: counts non-increasing
    val counts = out.map(_.getAs[Long]("n_events"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q104: mixture weights renormalize to 1 and flatten the share skew") {
    val out = SparkEntry.queries("q104_mixture_weights")(spark, sfDir).collect()
    assert(out.length > 1)
    val shares = out.map(_.getAs[Double]("share"))
    val weights = out.map(_.getAs[Double]("weight"))
    assert(math.abs(shares.sum - 1.0) < 1e-2)
    assert(math.abs(weights.sum - 1.0) < 1e-2)
    // α = 0.5 compresses toward uniform: the weight spread is strictly
    // narrower than the share spread
    assert(weights.max - weights.min < shares.max - shares.min)
  }

  test("q184: temperature smoothing boosts exactly the low-resource langs") {
    val out = SparkEntry.queries("q184_sampling_temperature")(spark, sfDir)
      .collect()
    assert(out.length > 1)
    // both share columns are a partition of the corpus (bp rounding
    // leaves at most langs/2 of drift)
    assert(math.abs(out.map(_.getAs[Long]("nat_bp")).sum - 10000L)
      <= out.length)
    assert(math.abs(out.map(_.getAs[Long]("smooth_bp")).sum - 10000L)
      <= out.length)
    // boost = share^(-1/2) up to normalization: strictly decreasing in
    // token count, > 1 for the smallest lang, < 1 for the largest
    val byTok = out.sortBy(_.getAs[Long]("n_tokens"))
    val boosts = byTok.map(_.getAs[Long]("boost_micro"))
    assert(boosts.zip(boosts.tail).forall { case (a, b) => a > b },
      s"boost not monotone in token count: ${boosts.toSeq}")
    assert(boosts.head > 1000000L && boosts.last < 1000000L)
    // smoothing compresses toward uniform: smoothed spread < natural
    val nat = out.map(_.getAs[Long]("nat_bp"))
    val sm = out.map(_.getAs[Long]("smooth_bp"))
    assert(sm.max - sm.min < nat.max - nat.min)
  }

  test("q186: KN scores are proper probabilities and every backoff branch fires") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q186_kneser_ney")(spark, sfDir).collect()
    assert(out.length > 1)
    out.foreach { r =>
      val mean = r.getAs[Long]("mean_p_micro")
      assert(mean > 0L && mean < 1000000L, s"score out of (0,1): $r")
      // the zq/zr fixture keeps unseen events live in every language
      assert(r.getAs[Long]("unseen_bp") > 0L, s"unseen branch dead: $r")
    }
    // only the odd (held-out) half is scored
    val oddDocs = graft.operators.Q.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 2 === 1).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum <= oddDocs)
    assert(out.map(_.getAs[Long]("n_docs")).sum > oddDocs / 2)
  }

  test("q187: power-of-two buckets bound lengths; bucketing never increases waste") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q187_padding_waste")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(mn >= (1L << b) && mx < (1L << (b + 1)),
        s"lengths escape the bucket: $r")
      assert(mn <= mx)
      val (w, gw) = (r.getAs[Long]("waste_bp"), r.getAs[Long]("global_waste_bp"))
      assert(w >= 0L && w < 10000L)
      assert(w <= gw, s"bucketing increased waste: $r")
    }
    // the top bucket holds the global max: its two wastes coincide
    val top = out.maxBy(_.getLong(0))
    assert(top.getAs[Long]("waste_bp") === top.getAs[Long]("global_waste_bp"))
    // buckets partition the non-empty corpus
    val n = graft.operators.Q.table(spark, sfDir, "documents")
      .filter(size(graft.operators.TextAnalysis.tokens(col("text"))) > 0)
      .count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === n)
  }

  test("q191: the ring moves a fraction of what mod-N moves") {
    val out = SparkEntry.queries("q191_reshard_cost")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val n = graft.operators.Q.table(spark, sfDir, "documents").count()
    assert(out("mod")._1 === n && out("ring")._1 === n)
    // mod-N reshuffles ~(N)/(N+1) of everything: 8/9 = 8889 bp
    assert(out("mod")._3 > 8000L && out("mod")._3 < 9500L,
      s"mod move share off the 8/9 law: ${out("mod")}")
    // the ring moves only the new shard's stolen slice
    assert(out("ring")._3 > 0L && out("ring")._3 < 2000L,
      s"ring move share out of range: ${out("ring")}")
    assert(out("ring")._2 * 4 < out("mod")._2,
      "the ring must move a small fraction of what mod moves")
  }

  test("q106: histogram-threshold selection equals the naive budget window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q106_token_budget_select")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // naive reference: ONE window over (lang ORDER BY badness, doc_id)
    val sig = graft.operators.Q.table(spark, sfDir, "documents")
      .withColumn("toks", graft.operators.TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"),
        t => t.isin("the", "a", "of", "and", "to", "in", "is"))).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("badness",
        expr("(20000*n_stop + n_tokens) div (2*n_tokens)"))
    val w = Window.partitionBy("lang")
      .orderBy(col("badness"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = sig.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= 2000L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"),
        max(col("badness")).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == want, s"decomposition diverged:\n got $got\nwant $want")
  }

  test("q133: surprise scores match a driver-side from-first-principles recompute") {
    // independent implementation: plain Scala collections over the
    // collected corpus — no Spark, no SQL — must agree digit-for-digit
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.split("\\s+").filter(_.nonEmpty).toSeq
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, _, t) =>
      val tl = toks(t)
      tl.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      tl.sliding(2).filter(_.length == 2)
        .foreach(p => { val g = p.mkString(" "); big(g) = big.getOrElse(g, 0L) + 1 })
    }
    val v = uni.size
    val perLang = docs.flatMap { case (id, lang, t) =>
      val gs = toks(t).sliding(2).filter(_.length == 2).map(_.toSeq).toSeq
      if (gs.isEmpty) None else {
        val terms = gs.map { p =>
          val g = p.mkString(" ")
          math.round(1e6 * (uni(p.head) + v).toDouble / (big(g) + 1).toDouble)
        }
        Some(lang -> math.round(terms.sum.toDouble / terms.length))
      }
    }.groupBy(_._1)
    val want = perLang.map { case (lang, xs) =>
      val scores = xs.map(_._2)
      (lang, scores.length.toLong,
        scores.count(_ > 35000000L).toLong,
        BigDecimal(scores.sum.toDouble / scores.length / 1e6)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q133_bigram_surprise")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"surprise diverged:\n got  $got\n want $want")
  }

  test("q134: oov report matches a driver-side recompute; vocab tie-break is total") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val all = docs.flatMap { case (lang, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(lang -> _) }
    val counts = all.groupBy(_._2).map { case (w, xs) => w -> xs.length }
    // rank by (count DESC, word ASC) — the total order the query declares
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(20).map(_._1).toSet
    val want = all.groupBy(_._1).map { case (lang, xs) =>
      val n = xs.length.toLong
      val oov = xs.count { case (_, w) => !vocab(w) }.toLong
      (lang, n, oov, BigDecimal(oov.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q134_oov_rate")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"oov diverged:\n got  $got\n want $want")
  }

  test("q139: shard plan is partitioning-invariant and covers every char once") {
    val out = SparkEntry.queries("q139_shard_plan")(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // driver-side reference: sequential streaming bin-pack
    val target = 65536L
    var cum = 0L
    val want = docs.map { case (id, nc) =>
      val shard = cum / target; cum += nc; (shard, id, nc)
    }.groupBy(_._1).map { case (sh, g) =>
      (sh, g.length.toLong, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, "two-level prefix sum diverged from sequential pack")
    // coverage: shard char totals sum to the corpus, shards contiguous
    assert(got.map(_._3).sum == docs.map(_._2).sum)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 < b._4, "shard doc ranges overlap")
      case _ => ()
    }
  }

  test("q151: shard manifest md5s equal the sequential driver-side pack") {
    val out = SparkEntry.queries("q151_shard_manifest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val target = 65536L
    var cum = 0L
    val want = docs.map { case (id, nc) =>
      val shard = cum / target; cum += nc; (shard, id, nc)
    }.groupBy(_._1).map { case (sh, g) =>
      val manifest = g.map(_._2).sorted.mkString(",")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(manifest.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (sh, g.length.toLong, g.map(_._3).sum, md)
    }.toSeq.sortBy(_._1)
    assert(out == want,
      "distributed manifest md5 diverged from the sequential reference")
  }

  test("q144: per-source Gini equals the mean-absolute-difference form") {
    val out = SparkEntry.queries("q144_length_gini")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    val bySrc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      val xs = rows.map(_._2.toDouble)
      val n = xs.length.toDouble
      // G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) — the definitional form, computed
      // independently of the production sorted-rank identity
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val want = BigDecimal(mad / (2 * n * n * (xs.sum / n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(src) - want) <= 1e-4,
        s"gini($src): got ${out(src)} want $want")
    }
  }

  test("q69: kNN vote matches a per-row recomputation on a small slice") {
    val out = SparkEntry.queries("q69_knn_label")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 11) // vec_id 0..10 inclusive
    // every query id appears exactly once with 1..5 votes
    val ids = out.map(_.getAs[Long]("q_id"))
    assert(ids.distinct.length == ids.length)
    out.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1 && v <= 5)
    }
  }
}
