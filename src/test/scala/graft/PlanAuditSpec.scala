package graft

/** Physical-plan audits: the 100 TB properties the oracle can't see.
  * Each assertion pins a plan shape that would silently regress into a
  * scale problem — scans must prune and push down, dim joins must
  * broadcast, top-k must not globally sort, LSH must never go cartesian,
  * and the hot path must stay inside whole-stage codegen.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: column pruning reaches the parquet scan (3 of 11 columns)") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(p.contains("l_quantity"))
    assert(!p.contains("l_extendedprice"), "unprojected column read from parquet")
  }

  test("q02: all three predicates push down to the scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters"))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*l_discount.*"))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity.*"))
  }

  test("q04/q05: dimension joins broadcast (no shuffle of the fact side)") {
    assert(plan("q04_join_inner").contains("BroadcastHashJoin"))
    val p5 = plan("q05_join_multiway")
    assert(p5.contains("BroadcastHashJoin"))
    assert(!p5.contains("SortMergeJoin"))
  }

  test("q07/q08: semi and anti joins plan as join types, not subquery loops") {
    assert(plan("q07_join_semi").contains("LeftSemi"))
    assert(plan("q08_join_anti").contains("LeftAnti"))
  }

  test("q09: theta join is broadcast nested-loop (the only correct non-equi plan)") {
    val p = plan("q09_join_theta")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q14: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q03: aggregation is partial+final (map-side combine before shuffle)") {
    val p = plan("q03_agg_tpchq1")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), "no partial aggregation before the shuffle")
  }

  test("q25: LSH near-dup join has no cartesian product anywhere") {
    val p = plan("q25_neardup_minhash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q37: the range join plans as an equi-join on buckets, not a nested loop") {
    val p = plan("q37_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "time-bucket banding failed: inequality join fell back to a nested loop")
  }

  test("q23: the query vector broadcasts; the corpus side never shuffles") {
    val p = plan("q23_similarity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q27: the exact pair baseline is a block equi-join — no unbounded broadcast") {
    val p = plan("q27_embedding_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "all-pairs baseline fell back to broadcasting a full table")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q45: cluster formation never goes cartesian (CC over the LSH graph)") {
    val p = plan("q45_dup_clusters")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q98: ANN contract never goes cartesian; candidates come from equi-joins") {
    val p = plan("q98_ann_recall")
    // the ONLY tolerated nested-loop is bruteTopK's deliberate
    // broadcast of the small query side; the LSH/IVF candidate joins
    // must be hash/sort-merge equi-joins on (table, bucket) / cell
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "candidate generation lost its equi-join shape")
  }

  test("q99: sketch Jaccard joins stay equi; sketches aggregate partially") {
    val p = plan("q99_sketch_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // MinHashUnionAgg is a typed Aggregator: partial_ merge before the
    // exchange is the fixed-size-mergeable-state contract at 100 TB
    assert(p.contains("partial_minhashunionagg$") ||
      p.toLowerCase.contains("partial_minhashunionagg"),
      "sketch aggregation lost its map-side partial")
  }

  test("q48: the correlated scalar subquery decorrelates into an aggregate+join") {
    val p = plan("q48_corr_subquery")
    // Catalyst rewrites the per-row MAX subquery into agg + join; a
    // surviving per-row subquery would show as a ScalarSubquery node
    assert(!p.contains("ScalarSubquery"),
      "correlated subquery executed per-row instead of decorrelating")
    assert(p.contains("HashAggregate"))
  }

  test("q53: salted aggregation is two exchanges — (key,salt) then key") {
    val df = SparkEntry.queries("q53_salted_agg")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges >= 2,
      s"expected the two-stage salted shuffle, saw $exchanges exchange(s)")
    assert(p.contains("salt"), "salt column missing from the plan")
  }

  test("q50: the month series comes from a 1-row aggregate, not a per-row join") {
    val p = plan("q50_date_series")
    assert(p.contains("Generate"), "series explode missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("q61/q66: moment sketches aggregate partial+final; stats broadcast back") {
    val p61 = plan("q61_stats_corr")
    assert(p61.contains("partial_"), "q61 moment sums lack map-side partials")
    val p66 = plan("q66_zscore_outliers")
    assert(p66.contains("BroadcastHashJoin"),
      "per-group stats did not broadcast back onto the fact scan")
    assert(!p66.contains("SortMergeJoin"))
  }

  test("q65: PMI joins broadcast the word counts; only the 1-row N is nested-loop") {
    val p = plan("q65_pmi_bigrams")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "unigram-count joins should broadcast, not shuffle the bigram side")
  }

  test("q62/q68: per-group top-k windows push the rank limit (WindowGroupLimit)") {
    assert(plan("q62_mode").contains("WindowGroupLimit"))
    assert(plan("q68_char_ngrams").contains("WindowGroupLimit"))
  }

  test("q69: the query side broadcasts; the corpus never shuffles for the join") {
    val p = plan("q69_knn_label")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q70: chunk explosion is a generator projection with no pre-shuffle") {
    val p = plan("q70_chunk_windows")
    assert(p.contains("Generate"), "chunk explode missing")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q88/q89: salted and full-outer joins stay equi-joins (no nested loop)") {
    val p88 = plan("q88_salted_skew_join")
    assert(!p88.contains("CartesianProduct") &&
      !p88.contains("BroadcastNestedLoopJoin"))
    assert(p88.contains("salt"), "salt key missing from the join plan")
    val p89 = plan("q89_snapshot_diff")
    assert(p89.contains("FullOuter"), "full-outer diff join missing")
    assert(!p89.contains("CartesianProduct"))
  }

  test("q101: the bloom probe side is join-free — membership is a map-only filter") {
    val p = plan("q101_bloom_decontamination")
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain"),
      "bloom probe lost its native BloomFilterMightContain expression")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // exactly ONE gram-keyed join may remain (the exact baseline the
    // contract compares against); the bloom path itself adds none
    val gramJoins = "Join .*\\bg#".r.findAllIn(p).size
    assert(gramJoins <= 1, s"bloom path introduced a gram join: $gramJoins")
  }

  test("q102: gram doc-frequency aggregates partially before the shuffle") {
    val p = plan("q102_repeated_ngrams")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count"),
      "doc-frequency count lost its map-side partial")
  }

  test("q103: heavy-hitter top-k is TakeOrderedAndProject; total is a broadcast scalar") {
    val p = plan("q103_cms_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 regressed to a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q105: quantization QA is map-only until the label agg (one data shuffle)") {
    val p = plan("q105_embedding_quantize")
    // one Exchange for the label agg + one range partitioning for the
    // final orderBy; anything more means the per-vector math shuffled
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"quantization plan grew extra shuffles:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      "label agg lost its map-side partial")
  }

  test("q107: hash sample is TakeOrderedAndProject (no global sort, no count)") {
    val p = plan("q107_hash_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "bounded sample regressed to a global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q108: leakage scan joins on the gram key with partial aggregation") {
    val p = plan("q108_split_leakage")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count"),
      "per-doc hit count lost its map-side partial")
  }

  test("q109: drift histogram is one partial-agg count shuffle") {
    val p = plan("q109_length_drift")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"drift plan grew extra shuffles:\n$p")
    assert(p.contains("partial_sum"), "bin counts lost their map-side partial")
  }

  test("q110: novelty probe is a gram-keyed anti-join, never doc pairs") {
    val p = plan("q110_gram_novelty")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftAnti"), "novelty lost its anti-join shape")
  }

  test("q111: domain cap is one window shuffle on the domain key") {
    val p = plan("q111_domain_cap")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), "cap ranking lost its window")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"domain cap grew extra shuffles:\n$p")
  }

  test("q112: chunk dedup aggregates the md5 key partially, no doc pairs") {
    val p = plan("q112_chunk_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count"),
      "chunk doc-frequency lost its map-side partial")
  }

  test("q113: dual distinct counts expand once, no cartesian") {
    val p = plan("q113_normalized_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Expand"), "multi-distinct lost its expand plan")
  }

  test("q114: confusion matrix broadcasts the lexicon like q30") {
    val p = plan("q114_langid_confusion")
    assert(p.contains("BroadcastHashJoin"), "lexicon join stopped broadcasting")
    assert(!p.contains("CartesianProduct"))
  }

  test("q115: incremental near-dup joins bands, never base-side pairs") {
    val p = plan("q115_incremental_neardup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("relational hot paths stay inside whole-stage codegen") {
    // execute first: AQE only materializes its final plan (with `*(n)`
    // codegen stage markers) after the job runs. (q02 is absent: its
    // filter pushes fully into the columnar scan and the residual plan
    // is scan→sort, with nothing left to codegen.)
    Seq("q01_scan_project", "q03_agg_tpchq1", "q16_strings", "q18_conditional")
      .foreach { q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        df.collect()
        val s = df.queryExecution.executedPlan.toString
        assert("""\*\(\d+\)""".r.findFirstIn(s).nonEmpty,
          s"$q left whole-stage codegen")
      }
  }

  test("q118: prefix-dup is one partial-agg count shuffle + top-k, no sort") {
    val p = plan("q118_prefix_dup")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_"), "no map-side combine on the prefix key")
    assert(!p.contains("CartesianProduct"))
  }

  test("q119: the L-row centroid pair join broadcasts; no cartesian") {
    val p = plan("q119_centroid_similarity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid pair join must broadcast the reduced L-row frame")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"), "component sums lost map-side combine")
  }

  test("q120: the bounded ratio table broadcasts onto the doc scan") {
    val p = plan("q120_importance_weights")
    assert(p.contains("BroadcastHashJoin"),
      "4096-row feature table should broadcast, not shuffle the token stream")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q121: the funnel never goes cartesian and keeps partial aggregation") {
    val p = plan("q121_filter_funnel")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"))
  }

  test("q123: fertility is one partial-agg shuffle on the lang key") {
    val p = plan("q123_token_fertility")
    assert(p.contains("partial_"), "lost map-side combine on lang")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "a single-table agg must not join")
  }

  test("q124: the bench gram side broadcasts; islands never go cartesian") {
    val p = plan("q124_contamination_span")
    assert(p.contains("BroadcastHashJoin"),
      "the fixed benchmark gram set must broadcast onto the corpus stream")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q125: truncation candidates come from the prefix-key equi-join") {
    val p = plan("q125_truncation_dup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "startswith must be a post-join filter on the pk equi-join, not a NLJ")
  }

  test("q133: the vocab-bounded count tables broadcast onto the bigram stream") {
    val p = plan("q133_bigram_surprise")
    assert(p.contains("BroadcastHashJoin"),
      "the unigram/bigram count tables must broadcast — they are vocab-bounded")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join here would shuffle the full bigram stream")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"), "lost map-side combine on the doc key")
  }

  test("q134: the top-K vocab probe broadcasts; the fact scan stays map-only") {
    val p = plan("q134_oov_rate")
    assert(p.contains("BroadcastHashJoin"),
      "the fixed top-K vocab must broadcast onto the token stream")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      "the vocab top-K must be TakeOrdered over the tiny agg, not a full sort")
  }

  test("q135: semdedup rides the q27 block tiling — no cartesian, no NLJ") {
    val p = plan("q135_semdedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q137: the anomaly fits broadcast back onto the bounded series, never the events") {
    val p = plan("q137_daily_volume_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      "median/MAD stats must broadcast onto the daily series")
    assert(!p.contains("SortMergeJoin"),
      "nothing here is big enough to sort-merge — the series is calendar-bounded")
    assert(p.contains("partial_"), "the (type, day) count must combine map-side")
  }

  test("q138: the embedding-store build never goes cartesian end-to-end") {
    val p = plan("q138_embedding_pipeline")
    assert(!p.contains("CartesianProduct"),
      "neither the tiled prune nor the IVF gate may form raw pairs")
  }

  test("q136: digest dedup is one partial-agg key shuffle, no join") {
    val p = plan("q136_media_dedup")
    assert(p.contains("partial_"), "digest groups must collapse map-side")
    assert(!p.contains("Join"), "content-digest dedup needs no join at all")
  }

  test("q150: dim variance is one partial-agg shuffle over dim keys, no join") {
    val p = plan("q150_dim_variance")
    assert(p.contains("partial_"), "per-dim sums must combine map-side")
    assert(!p.contains("Join"), "a per-column scan needs no join")
  }

  test("q151: manifest checksums keep the two-level prefix sum (offset frame broadcasts)") {
    val p = plan("q151_shard_manifest")
    assert(p.contains("BroadcastHashJoin"),
      "the ≤16-row partition-offset frame must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q152: fuzzy decontamination joins bands — no cartesian, no NLJ") {
    val p = plan("q152_fuzzy_decontamination")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "eval×corpus candidates must come from the band equi-join")
  }

  test("q153: the source blocklist broadcasts onto the corpus scan") {
    val p = plan("q153_source_blocklist")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the ≤|sources|-row blocklist must broadcast, never shuffle the corpus")
  }

  test("q154: cadence triage is one user window + TakeOrderedAndProject") {
    val p = plan("q154_bot_cadence")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must not globally sort the per-user frame")
    assert(!p.contains("Join"))
  }

  test("q155: truncation loss is map-only until the bounded (cap, lang) agg") {
    val p = plan("q155_truncation_loss")
    assert(p.contains("partial_"), "the rollup must combine map-side")
    assert(!p.contains("Join"), "a per-doc arithmetic scan needs no join")
  }

  test("q156: BPE pairs explode over the word dictionary, not the corpus") {
    val p = plan("q156_bpe_pairs")
    assert(p.contains("partial_"), "the word count must combine map-side")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 pairs must not globally sort")
    assert(!p.contains("Join"), "dictionary statistics need no join")
  }

  test("q157: semantic leakage rides the pair tiling — no cartesian, no NLJ") {
    val p = plan("q157_semantic_leakage")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q158: the calibration sample is TakeOrdered; pair work is bounded-k only") {
    val p = plan("q158_sim_calibration")
    assert(p.contains("TakeOrderedAndProject"),
      "the hash-ordered k-sample must be TakeOrdered, not a full sort")
  }

  test("q159: survivor selection touches the corpus once; removed list is a key join") {
    val p = plan("q159_quality_survivors")
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastExchange"),
      "only the 1-row requalified scalar may cross-join, and broadcast")
  }

  test("q160: the coverage spine crosses two bounded distinct frames and broadcasts") {
    val p = plan("q160_coverage_matrix")
    assert(p.contains("partial_"), "cell counts must combine map-side")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the dimension-sized spine must broadcast, never shuffle the corpus")
  }

  test("q161: the id ledger is single-pass aggregates, no join, no window") {
    val p = plan("q161_id_ledger")
    assert(!p.contains("Join"), "a per-table audit needs no join")
    assert(!p.contains("Window"), "a per-table audit needs no window")
  }

  test("q162: conflict detection is one partial-agg pass on the norm key") {
    val p = plan("q162_crosslang_dups")
    assert(p.contains("partial_"), "norm-key groups must collapse map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q163: vector dedup is one partial-agg key shuffle, no join") {
    val p = plan("q163_exact_vector_dups")
    assert(p.contains("partial_"), "duplicate vectors must collapse map-side")
    assert(!p.contains("Join"), "content-identity dedup needs no join")
  }

  test("q164: decile assignment has no sort/window; the max scalar broadcasts") {
    val p = plan("q164_quality_drift")
    assert(!p.contains("Window"), "decile must be arithmetic, not ntile")
    assert(p.contains("partial_"), "the decile rollup must combine map-side")
  }

  test("q165: span dedup pairs come from gram equi-joins, never a cartesian") {
    val p = plan("q165_substring_dup")
    assert(!p.contains("CartesianProduct"),
      "the pair stage must ride the repeated-gram equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "no NLJ anywhere in the span scan")
    // the top-20 must not sort the full span frame
    assert(p.contains("TakeOrderedAndProject"),
      "the report cut must be TakeOrderedAndProject")
  }

  test("q166: span-index probe stays equi-join; report cut is TakeOrdered") {
    val p = plan("q166_span_index_probe")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "batch-vs-store span matching must stay an equi-join")
    assert(p.contains("TakeOrderedAndProject"),
      "the report cut must be TakeOrderedAndProject")
  }

  test("q170/q171/q174/q177: quality attribution is map-only — no generate, no join") {
    for (q <- Seq("q170_gopher_rules", "q171_line_filter",
        "q174_script_mix", "q177_intradoc_line_dedup")) {
      val p = plan(q)
      assert(!p.contains("Generate"),
        s"$q: the token/line array must stay in its row (HOFs, no explode)")
      assert(!p.contains("Join"), s"$q: nothing joins in a per-doc scan")
      assert(p.contains("partial_"),
        s"$q: the lang rollup must combine map-side")
    }
  }

  test("q176: unigram table broadcasts; scoring join never sort-merges") {
    val p = plan("q176_perplexity_buckets")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab-bounded unigram count table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the token-stream scoring join must stay map-side")
    assert(p.contains("partial_"),
      "per-doc and per-lang rollups must combine map-side")
  }

  test("q180: PC projection is map-only; components enter as literals") {
    val p = plan("q180_pc_occupancy")
    assert(!p.contains("Join"),
      "the fitted components must be plan literals, never a joined side")
    assert(!p.contains("Generate"),
      "the projection folds in-row (zip_with/aggregate), no explode")
    assert(p.contains("partial_"),
      "the per-label occupancy agg must combine map-side")
  }

  test("q183: the probe gate is map-only; fitted weights enter as literals") {
    val p = plan("q183_probe_gate")
    assert(!p.contains("Join"),
      "the fitted model must be plan literals, never a joined side")
    assert(!p.contains("Generate"),
      "the score folds in-row (zip_with/aggregate), no explode")
    assert(p.contains("partial_"),
      "the per-label gate rollup must combine map-side")
  }

  test("q186: KN count tables broadcast; the scoring pass never sort-merges") {
    val p = plan("q186_kneser_ney")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab-bounded bigram/history/continuation tables must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the held-out scoring join must stay map-side")
    assert(p.contains("partial_"),
      "per-doc and per-lang rollups must combine map-side")
  }

  test("q173: boilerplate join-back broadcasts; no sort-merge on the line key") {
    val p = plan("q173_line_dedup")
    assert(p.contains("BroadcastHashJoin"),
      "the df-bounded boilerplate side must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"),
      "the (line, doc) occurrence agg must combine map-side")
  }

  test("q195: query-term table broadcasts; scoring stays equi with partial aggs") {
    val p = plan("q195_bm25_topk")
    assert(p.contains("BroadcastHashJoin"),
      "the 15-row query-term table must broadcast into the tf stream")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"),
      "tf/df/length stats must combine map-side")
  }

  test("q213: both retrieval legs broadcast their bounded side; fusion never goes cartesian") {
    val p = plan("q213_hybrid_rrf")
    assert(!p.contains("CartesianProduct"),
      s"q213 planned a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the query-term table and the per-lang anchor vectors must " +
        s"broadcast into their candidate streams:\n$p")
    // the dense leg scans candidates once against ONE broadcast anchor
    // per lang — an anchor-side shuffle would mean the corpus moved to
    // meet a |langs|-row frame
    assert(!p.matches("(?s).*SortMergeJoin[^\\n]*a_emb.*"),
      s"q213 shuffled the corpus against the anchor frame:\n$p")
    assert(p.contains("partial_"),
      s"tf/df/length stats must combine map-side:\n$p")
  }

  test("q215: the lexical probe broadcast-joins the store — no corpus scan, no cartesian") {
    val p = plan("q215_lexical_index_probe")
    assert(!p.contains("CartesianProduct"), s"q215 planned a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the query-term set and the stats frame must broadcast:\n$p")
    // the probe's entire input is the persisted store: a documents
    // scan would mean the probe re-tokenized the corpus the index
    // exists to replace
    assert(!p.contains("documents"),
      s"q215 re-scanned the corpus instead of the store:\n$p")
  }

  test("q214: scene runs are windows + bounded-key aggs — no joins on the hash path at all") {
    val p = plan("q214_video_scene_runs")
    assert(!p.contains("CartesianProduct"), s"q214 planned a cartesian:\n$p")
    assert(p.contains("Window"),
      s"q214 lost the per-video lag window:\n$p")
    // the only join is the 32-row expected-vs-found report edge —
    // the frame-hash path itself must never join hashes with hashes
    assert(!p.matches("(?s).*Join[^\\n]*hash[^\\n]*hash.*"),
      s"q214 joined the frame-hash stream against itself:\n$p")
  }

  test("q216: the stage-yield report is a bounded local frame — cascade passes ran eagerly") {
    val p = plan("q216_dedup_stage_yield")
    // the four stage passes (key shuffle + survivor semi-join each)
    // run eagerly inside the build; the compared output assembles from
    // per-stage scalars (q192's report shape), never re-reads the
    // corpus
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      s"q216 report must be a bounded local frame:\n$p")
    assert(!p.contains("FileScan"),
      s"q216 report re-scanned the corpus:\n$p")
  }

  test("q194: truncated-recall rungs are the bounded-broadcast exact-scan shape") {
    val p = plan("q194_matryoshka_recall")
    assert(!p.contains("CartesianProduct"),
      "the pair scans must be the broadcast-query block shape, never cartesian")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "the bounded query batch must broadcast")
  }

  test("q197: systematic sample has no global window collapse") {
    val p = plan("q197_systematic_sample")
    // the corpus-wide running position must be per-range-partition
    // local windows plus a bounded offset frame (q139's discipline):
    // no window may partition the whole corpus into one task
    assert(p.contains("Window"))
    assert(p.contains("pid"),
      "the cumulative position must ride the two-level prefix sum")
  }

  test("q198: apportionment windows only the cell-bounded frame") {
    val p = plan("q198_mixture_apportion")
    assert(p.contains("partial_"),
      "the per-cell mass agg must combine map-side before the shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q192: the staleness report's span-df recompute aggregates partially") {
    val p = plan("q192_index_staleness")
    // the report frame itself is driver-assembled (6 rows); the plan
    // shape that matters is upstream in the signal passes, which run
    // eagerly inside the build. Here we pin the report's output shape:
    // a LocalTableScan of per-family scalars, no corpus reference.
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      "the report must be a bounded local frame of per-family scalars")
  }

  test("q208: the tokenizer report is a bounded local frame — corpus passes ran eagerly on the word dictionary") {
    val p = plan("q208_unigram_tokenizer")
    // corpus scans, the seed top-K (TakeOrdered over the bounded piece
    // frame) and the EM rounds all run EAGERLY inside the build; the
    // compared output must assemble from per-run scalars (q192's
    // report shape), never re-reference the corpus
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      s"q208 report must be a bounded local frame:\n$p")
    assert(!p.contains("FileScan"),
      s"q208 report re-scanned the corpus:\n$p")
  }

  test("q212: the drift report is a bounded local frame — segmentation ran on the distinct-word frame eagerly") {
    val p = plan("q212_vocab_store_drift")
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      s"q212 report must be a bounded local frame:\n$p")
    assert(!p.contains("FileScan"),
      s"q212 report re-scanned the corpus:\n$p")
  }

  test("q201/q202: perceptual pair scans are band equi-joins — no cartesian; candidates hash-join on the band bits") {
    for (q <- Seq("q201_perceptual_dedup", "q202_audio_perceptual_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q planned a cartesian:\n$p")
      // candidates come from the (band, bits) HASH join — an all-pairs
      // nested loop over the hashes is the regression this pins against
      // (the only sort-merge allowed is the 7-row report-edge join).
      // The match is anchored to ONE plan line so the report-edge
      // broadcast join on `kind` can never satisfy it by accident.
      assert(p.matches("(?s).*HashJoin[^\\n]*bits.*"),
        s"$q lost the banded hash candidate join:\n$p")
      assert(!p.matches("(?s).*SortMergeJoin[^\\n]*bits.*"),
        s"$q sort-merged the banded candidate join:\n$p")
      assert(!p.matches("(?s).*BroadcastNestedLoopJoin[^\\n]*(ha|hb).*"),
        s"$q nested-looped the hash frames:\n$p")
    }
  }

  test("q206: the radius sweep runs ONE banded candidate pass — radii are filters over the cached pair set") {
    val p = plan("q206_perceptual_threshold_sweep")
    assert(!p.contains("CartesianProduct"), s"q206 planned a cartesian:\n$p")
    // ONE materialized pair set feeds both per-radius aggs (q142's
    // one-pass sweep discipline): the pair/asset counts must both read
    // the cached frame — a per-radius re-probe would scan fresh hashes
    // instead. The cached build's banded hash join prints once per
    // cache consumer, so its count is bounded by the cache scans.
    val imts = "InMemoryTableScan".r.findAllIn(p).length
    assert(imts >= 2,
      s"both radius aggs must read the ONE cached pair set ($imts):\n$p")
    val candidateJoins = "HashJoin[^\\n]*bits".r.findAllIn(p).length
    assert(candidateJoins <= imts,
      s"a banded candidate join ran OUTSIDE the cached pair build " +
        s"($candidateJoins joins, $imts cache scans):\n$p")
    assert(!p.matches("(?s).*BroadcastNestedLoopJoin[^\\n]*(ha|hb).*"),
      s"q206 nested-looped the hash frames:\n$p")
  }

  test("q207: survivors come from the checkpointed CC label frame; removal is an anti-join, never a cartesian") {
    val p = plan("q207_media_cluster_survivors")
    assert(!p.contains("CartesianProduct"), s"q207 planned a cartesian:\n$p")
    // the banded candidate joins run EAGERLY inside minLabelPropagate
    // (q201/q202 pin that shape); the final plan must consume the
    // bounded checkpointed label frame, not recompute the pair graph
    assert(p.contains("Scan ExistingRDD"),
      s"q207 lost the checkpointed label frame:\n$p")
    assert(p.contains("LeftAnti"),
      s"survivor selection lost the anti-join removal shape:\n$p")
  }

  test("q209: video frame candidates hash-join on the band bits; the containment rollup combines map-side") {
    val p = plan("q209_video_frame_dedup")
    assert(!p.contains("CartesianProduct"), s"q209 planned a cartesian:\n$p")
    assert(p.matches("(?s).*HashJoin[^\\n]*bits.*"),
      s"q209 lost the banded frame candidate join:\n$p")
    assert(!p.matches("(?s).*SortMergeJoin[^\\n]*bits.*"),
      s"q209 sort-merged the banded candidate join:\n$p")
    assert(p.contains("partial_"),
      "the (a, b) containment rollup lost map-side combine")
  }

  test("q210: the video-index probe candidates hash-join on bk; no cartesian") {
    val p = plan("q210_video_index_probe")
    assert(!p.contains("CartesianProduct"), s"q210 planned a cartesian:\n$p")
    // the store side is the bucketed phash-family table keyed on bk —
    // the candidate join must be the single-key hash join, never a
    // nested loop over the hash frames (IndexStoreSpec separately
    // asserts the exchange-free stored side)
    assert(p.matches("(?s).*HashJoin[^\\n]*bk.*"),
      s"q210 lost the bucketed bk candidate join:\n$p")
    assert(!p.matches("(?s).*BroadcastNestedLoopJoin[^\\n]*(ha|hb).*"),
      s"q210 nested-looped the hash frames:\n$p")
    assert(p.contains("partial_"),
      "the containment rollup lost map-side combine")
  }

  test("q211: bag candidates band-join, temporal candidates equi-join on the bigram key — no cartesian") {
    val p = plan("q211_video_temporal_containment")
    assert(!p.contains("CartesianProduct"), s"q211 planned a cartesian:\n$p")
    assert(p.matches("(?s).*HashJoin[^\\n]*bits.*"),
      s"q211 lost the banded bag candidate join:\n$p")
    // the temporal candidate join is keyed on BOTH bigram hashes —
    // a one-sided or nested-loop match would explode at scale
    assert(p.matches("(?s).*Join[^\\n]*h1[^\\n]*h2.*"),
      s"q211 lost the (h1, h2) bigram equi-join:\n$p")
    assert(p.contains("partial_"),
      "the containment rollups lost map-side combine")
  }

  test("q203: content-defined chunking is window-free — chunk assembly never shuffles per doc") {
    val p = plan("q203_cdc_chunk_dedup")
    // the whole cut/assemble stage is in-row HOFs; the first exchange
    // is the (lang, hash) partial agg
    assert(!p.contains("Window"), s"chunking fell back to a window:\n$p")
    assert(p.contains("partial_"), "chunk rollup lost map-side combine")
  }

  test("q204: KS windows run over the bounded value frame after partial aggregation") {
    val p = plan("q204_ks_split_drift")
    // the corpus collapses to (lang, length) rows BEFORE any window:
    // the FIRST Window node must sit above the first partial
    // aggregation in the plan text (plans print top-down, so the
    // deeper partial agg appears AFTER its consumer window) — a
    // window moved back over raw corpus rows flips that order
    assert(p.contains("partial_"),
      "value-frame aggregation lost map-side combine")
    val w = p.indexOf("Window")
    assert(w >= 0, "the ECDF window vanished")
    val agg = p.indexOf("partial_")
    assert(w < agg,
      s"a Window ran below the value-frame aggregation " +
        s"(Window@$w, partial_@$agg):\n$p")
  }

  test("q101: bloom probe compiles codegen'd; subquery bloom operands refuse loudly") {
    // ADVICE r13: BloomFilterMightContain emits uncompilable Java when
    // the bloom operand is a scalar subquery and silently degrades to
    // interpreted eval with only a WARN — on the hottest
    // decontamination scan. Two pins: (1) CODEGEN_ONLY factory mode
    // turns any interpreted fallback into a hard failure, so a green
    // q101 run proves the production literal shape compiles; (2) the
    // registration itself rejects the subquery shape instead of
    // letting it silently lose codegen.
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val rows = SparkEntry.queries("q101_bloom_decontamination")(
        spark, sfDir).collect()
      assert(rows.nonEmpty, "q101 returned no rows under CODEGEN_ONLY")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      graft.operators.Q.releaseManaged()
    }
    graft.functions.HashFunctions.register(spark)
    val e = intercept[Throwable] {
      spark.sql(
        """SELECT graft_bloom_contains(
          |  (SELECT graft_bloom_build(xxhash64(CAST(id AS STRING)), 100L)
          |   FROM range(10)),
          |  xxhash64('x'))""".stripMargin).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(chain.contains("graft_bloom_contains") &&
      chain.contains("literal"),
      s"subquery bloom operand must be refused with the contract " +
        s"message, got: $chain")
  }

  test("q217: skyline is two-phase — bounded threshold frame broadcasts, no pair join") {
    val p = plan("q217_pareto_front")
    assert(!p.contains("CartesianProduct"), s"q217 formed doc pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q217 must join back on n_words equality, not a theta join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the distinct-token-count threshold frame must broadcast:\n$p")
    assert(p.contains("partial_max") || p.contains("partial_"),
      s"the per-token-count max must combine map-side:\n$p")
  }

  test("q218: phrase postings filter to the two terms before the adjacency join") {
    val p = plan("q218_phrase_posting")
    assert(!p.contains("CartesianProduct"), s"q218 planned a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the adjacency match must be an equi-join on (doc_id, pos):\n$p")
    // the isin filter must land between the Generate (posexplode) and
    // the join — the join moves posting lists, never the corpus
    assert(p.contains("Generate"), s"q218 lost the posting explode:\n$p")
    assert(p.matches("(?s).*Filter[^\\n]*(hash|join).*"),
      s"the phrase-term filter must precede the shuffle:\n$p")
  }

  test("q219: quantile map joins a bounded broadcast CDF; the rank window partitions by source") {
    val p = plan("q219_quantile_normalize")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the rank->value lookup must be a broadcast range join " +
        s"against the bounded CDF frame:\n$p")
    assert(p.contains("Window"), s"q219 lost the per-source rank window:\n$p")
    assert(p.contains("partial_"),
      s"the distinct-value CDF agg must combine map-side:\n$p")
  }

  test("q222: arrival-lag shuffles 16-byte fingerprints, never text; no windows") {
    val p = plan("q222_dup_arrival_lag")
    assert(!p.contains("CartesianProduct"), s"q222 formed doc pairs:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"q222 must be groupBy+join only — no window:\n$p")
    // the fp groupBy and the join-back both move md5 keys; the text
    // column must be pruned at the scan (doc_id + text read once,
    // hashed in the projection)
    assert(p.matches("(?s).*ReadSchema[^\\n]*doc_id.*"),
      s"q222 scan must prune to (doc_id, text):\n$p")
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"the first-id agg must combine map-side:\n$p")
  }

  test("q223: sliding distinct is interval algebra — user-partitioned windows + bounded calendar frame") {
    val p = plan("q223_sliding_distinct")
    assert(!p.contains("CartesianProduct"), s"q223 planned a cartesian:\n$p")
    assert(p.matches("(?s).*Window[^\\n]*user_id.*"),
      s"the island window must partition by user_id:\n$p")
    // the only unpartitioned window is the running sum over the
    // calendar frame (bounded by the corpus time span); the per-day
    // distinct-user recount (a 7x scan) must never appear as a
    // day-range join against the activity frame
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q223 fell back to the naive day-range join:\n$p")
  }

  test("q224: k-anonymity audit is two partial aggs on bounded keys") {
    val p = plan("q224_rare_combo_suppress")
    assert(p.contains("partial_"),
      s"the QI-group agg must combine map-side:\n$p")
    assert(!p.contains("Join"), s"q224 must be join-free:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"q224 must be window-free:\n$p")
  }

  test("q227: the phrase probe reads only the positional store — no corpus scan, no cartesian") {
    val p = plan("q227_phrase_index_probe")
    assert(!p.contains("CartesianProduct"), s"q227 planned a cartesian:\n$p")
    // the probe's entire input is the persisted postings table: a
    // documents scan would mean the probe re-tokenized the corpus the
    // index exists to replace
    assert(!p.contains("documents"),
      s"q227 re-scanned the corpus instead of the store:\n$p")
    assert(!p.contains("Generate"),
      s"q227 must read postings, never re-explode tokens:\n$p")
  }

  test("q228: the matrix joins shingle postings, never doc pairs; the grid broadcasts") {
    val p = plan("q228_decontamination_matrix")
    assert(!p.contains("CartesianProduct"), s"q228 planned a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded suite x source grid must broadcast-join:\n$p")
    assert(p.contains("partial_"),
      s"the shared-shingle agg must combine map-side:\n$p")
  }

  test("q229: mixture drift windows only the bounded source frame; removal is an anti-join") {
    val p = plan("q229_dedup_mixture_drift")
    assert(!p.contains("CartesianProduct"), s"q229 planned a cartesian:\n$p")
    assert(p.contains("LeftAnti"),
      s"survivor selection must be the skinny anti-join:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"the token sums must combine map-side:\n$p")
  }

  test("q230: the proximity probe reads only the store; pair match is a doc_id equi-join") {
    val p = plan("q230_proximity_search")
    assert(!p.contains("CartesianProduct"), s"q230 planned a cartesian:\n$p")
    assert(!p.contains("documents"),
      s"q230 re-scanned the corpus instead of the store:\n$p")
    assert(!p.contains("Generate"),
      s"q230 must read postings, never re-explode tokens:\n$p")
  }

  test("q231: the bias profile derives everything from the store; the top-term frame broadcasts") {
    val p = plan("q231_position_bias")
    assert(!p.contains("CartesianProduct"), s"q231 planned a cartesian:\n$p")
    assert(!p.contains("documents"),
      s"q231 re-scanned the corpus instead of the store:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 3-row top-term frame must broadcast:\n$p")
    assert(p.contains("partial_"),
      s"the store aggs must combine map-side:\n$p")
  }

  test("q236: KWIC windows assemble from the store alone; the hit list broadcasts") {
    val p = plan("q236_kwic_snippets")
    assert(!p.contains("CartesianProduct"), s"q236 planned a cartesian:\n$p")
    // the whole point of the query: a TRUE index-only snippet — a
    // documents scan would mean the window terms came from re-reading
    // raw text instead of store positions
    assert(!p.contains("documents"),
      s"q236 re-scanned the corpus instead of the store:\n$p")
    assert(!p.contains("Generate"),
      s"q236 must read postings, never re-explode tokens:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the phrase-selective hit list must broadcast:\n$p")
    assert(p.contains("partial_"),
      s"window assembly must combine map-side:\n$p")
  }

  test("q239: bulk KWIC stays index-only; the multi-phrase hit frame key-joins, never cartesian") {
    val p = plan("q239_bulk_kwic")
    assert(!p.contains("CartesianProduct"), s"q239 planned a cartesian:\n$p")
    assert(!p.contains("documents"),
      s"q239 re-scanned the corpus instead of the store:\n$p")
    assert(!p.contains("Generate"),
      s"q239 must read postings, never re-explode tokens:\n$p")
    assert(p.contains("partial_"),
      s"window assembly must combine map-side:\n$p")
  }

  test("q238: packed-fill rides the two-level prefix sum; bin agg combines map-side") {
    val p = plan("q238_packed_fill")
    assert(!p.contains("CartesianProduct"), s"q238 planned a cartesian:\n$p")
    assert(p.contains("pid"),
      s"q238's offsets must ride the two-level prefix sum:\n$p")
    assert(p.contains("partial_"),
      s"the bin agg must combine map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded offset frame must broadcast:\n$p")
  }

  test("q240/q241: curriculum schedule rides the two-level prefix sum on the skinny score frame") {
    for (q <- Seq("q240_curriculum_phases", "q241_phase_source_mix")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(p.contains("pid"),
        s"$q's offsets must ride the two-level prefix sum:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the bounded offset/phase frames must broadcast:\n$p")
      assert(p.contains("partial_"),
        s"the rollups must combine map-side:\n$p")
    }
  }

  test("q242: triangle census joins hash-exchange only; scalar rollups broadcast") {
    val p = plan("q242_graph_triangles")
    assert(!p.contains("CartesianProduct"), s"q242 planned a cartesian:\n$p")
    // the closing and reciprocity joins are key-equi semi joins —
    // nested loops over the edge set would be the d² explosion the
    // compact-forward orientation exists to avoid (the 1-row scalar
    // crossJoins DO plan as BroadcastNestedLoopJoin; they are bounded
    // by construction, so the census is judged by its semi joins)
    assert(p.contains("LeftSemi"),
      s"q242's closing/reciprocity joins must be semi joins:\n$p")
    assert(p.contains("partial_"),
      s"the census aggregates must combine map-side:\n$p")
  }

  test("q245: HITS iterations are node-keyed joins off localCheckpoints; max rescale broadcasts") {
    val p = plan("q245_hits_scores")
    assert(!p.contains("CartesianProduct"), s"q245 planned a cartesian:\n$p")
    // localCheckpoint each half-step keeps plan depth O(1): the final
    // plan must read checkpointed score RDDs, not an 8-deep join tree
    assert(p.contains("Scan ExistingRDD"),
      s"q245's scores must come from localCheckpoints:\n$p")
    assert(p.contains("partial_"),
      s"the degree rollups must combine map-side:\n$p")
  }

  test("q246: harmonic rollup reads checkpointed BFS state; top-k is TakeOrdered") {
    val p = plan("q246_harmonic_centrality")
    assert(!p.contains("CartesianProduct"), s"q246 planned a cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q246's distances must come from the BFS localCheckpoints:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 must be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("partial_"),
      s"the harmonic rollup must combine map-side:\n$p")
  }

  test("q249: component census reads checkpointed star edges; rollups broadcast") {
    val p = plan("q249_graph_components")
    assert(!p.contains("CartesianProduct"), s"q249 planned a cartesian:\n$p")
    // each star round is localCheckpoint'd — the final census must
    // read checkpointed edge RDDs, not a 16-phase join tree
    assert(p.contains("Scan ExistingRDD"),
      s"q249's star edges must come from localCheckpoints:\n$p")
    assert(p.contains("partial_"),
      s"the census rollups must combine map-side:\n$p")
  }

  test("q251: isolation profile joins labels by key; corpus joined once") {
    val p = plan("q251_link_isolation")
    assert(!p.contains("CartesianProduct"), s"q251 planned a cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q251's labels must come from the component checkpoints:\n$p")
    assert(p.contains("partial_"),
      s"q251's class rollup must combine map-side:\n$p")
  }

  test("q250/q252: shard-diversity and batch-mix ride the prefix sum; no cartesian") {
    for (q <- Seq("q250_shard_source_mix", "q252_batch_source_mix")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(p.contains("pid"),
        s"$q's offsets must ride the two-level prefix sum:\n$p")
      assert(p.contains("partial_"),
        s"$q's rollups must combine map-side:\n$p")
    }
  }

  test("q253: soft sampling is map-only scoring — no join anywhere in the plan") {
    val p = plan("q253_soft_quality_sample")
    assert(!p.contains("Join"), s"q253 must not join:\n$p")
    assert(p.contains("partial_"),
      s"q253's source rollup must combine map-side:\n$p")
  }

  test("q255: k-core census reads checkpointed peel frames; rollups broadcast") {
    val p = plan("q255_kcore_census")
    assert(!p.contains("CartesianProduct"), s"q255 planned a cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q255's cores must come from the peel localCheckpoints:\n$p")
    assert(p.contains("partial_"),
      s"the census rollups must combine map-side:\n$p")
  }

  test("q243/q244: packing-attention and phase-dup ride the shared prefix-sum frames") {
    for (q <- Seq("q243_pack_attention_mix", "q244_phase_dup_rate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(p.contains("pid"),
        s"$q's offsets must ride the two-level prefix sum:\n$p")
      assert(p.contains("partial_"),
        s"$q's rollups must combine map-side:\n$p")
    }
  }

  test("q247/q248: batching audit and seqlen sweep ride the prefix sum; no cartesian") {
    for (q <- Seq("q247_batch_padding", "q248_seqlen_sweep")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(p.contains("pid"),
        s"$q's ranks/offsets must ride the two-level prefix sum:\n$p")
      assert(p.contains("partial_"),
        s"$q's rollups must combine map-side:\n$p")
    }
    // the sweep must read ONE prefix pass shared across candidates —
    // an InMemoryTableScan (the managed persist) feeds both rollups
    assert(plan("q248_seqlen_sweep").contains("InMemoryTableScan") ||
      plan("q248_seqlen_sweep").contains("Scan ExistingRDD"),
      "q248 must share the L-independent prefix frame")
  }

  test("q232/q233: severity rides the posting join; the skew audit is two bounded aggs") {
    val p232 = plan("q232_contamination_severity")
    assert(!p232.contains("CartesianProduct"),
      s"q232 planned a cartesian:\n$p232")
    assert(p232.contains("partial_"),
      s"q232's pair agg must combine map-side:\n$p232")
    val p233 = plan("q233_shard_skew")
    assert(!p233.contains("CartesianProduct"),
      s"q233 planned a cartesian:\n$p233")
    assert(p233.contains("pid"),
      s"q233's assignment must ride the two-level prefix sum:\n$p233")
  }

  test("q225: kappa is one map-only verdict scan into a 4-cell agg — no joins, no windows") {
    val p = plan("q225_filter_agreement")
    assert(!p.contains("Join"), s"q225 must be join-free:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"q225 must be window-free:\n$p")
    assert(p.contains("partial_"),
      s"the contingency agg must combine map-side:\n$p")
  }

  test("q226: coverage windows run over the aggregated vocab frame; the pct grid broadcasts") {
    val p = plan("q226_vocab_coverage")
    assert(!p.contains("CartesianProduct"),
      s"the 3-row pct grid must broadcast, not cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"the token-count agg must combine map-side:\n$p")
    assert(p.contains("Window"), s"q226 lost the rank window:\n$p")
  }

  test("q220/q221: event-sequence windows partition by user; rollups aggregate partially") {
    for (q <- Seq("q220_event_transitions", "q221_scd2_intervals")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(p.contains("Window"), s"$q lost its sequence window:\n$p")
      assert(p.matches("(?s).*Window[^\\n]*user_id.*"),
        s"$q's sequence window must partition by user_id:\n$p")
      assert(p.contains("partial_"),
        s"$q's rollup must combine map-side:\n$p")
    }
  }
}
