package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, Q}

/** Persisted index artifacts — the write-ONCE/probe-many path a real
  * 100 TB deployment runs nightly. Two contracts per index family:
  *
  *  1. result identity: probing the persisted index returns exactly
  *     what the in-plan build returns on the same inputs (the persisted
  *     path must never drift from the oracle-checked one);
  *  2. exchange freedom: the probe join consumes the bucketed layout
  *     directly, so the CORPUS side of the candidate join never
  *     shuffles — only the small batch/query frame does. That is the
  *     entire point of persisting: the accumulated corpus is the 100 TB
  *     side, and re-shuffling (or re-quantizing / re-shingling) it per
  *     batch is what the artifact avoids.
  */
class IndexStoreSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("band index: persisted probe equals the in-plan q115 build") {
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val tmp = Files.createTempDirectory("graft-bandidx")
    try {
      Dedup.writeBandIndex(base, "bandidx_t", s"$tmp")
      val probed = Dedup.probeBandIndex(spark, "bandidx_t", batch)
        .select(col("da"), col("db"), round(col("j"), 4).as("jaccard"))
        .orderBy("da", "db").collect().toSeq
      // the in-plan incremental build (q115's exact builder) on the
      // same even/odd split is the reference answer
      val inPlan = SparkEntry.queries("q115_incremental_neardup")(
        spark, sfDir).collect().toSeq
      assert(probed.nonEmpty, "probe found no near-dup pairs at all")
      assert(probed == inPlan,
        s"persisted probe drifted from the in-plan build:\n" +
          s"probe=${probed.take(5)}\ninplan=${inPlan.take(5)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bandidx_t_bands")
      spark.sql("DROP TABLE IF EXISTS bandidx_t_shingles")
      graft.operators.Q.releaseManaged()
    }
  }

  test("band index probe: corpus-side band join is exchange-free") {
    val docs = Q.table(spark, sfDir, "documents")
    val tmp = Files.createTempDirectory("graft-bandidx2")
    try {
      Dedup.writeBandIndex(docs.filter(col("doc_id") % 2 === 0),
        "bandidx_x", s"$tmp")
      withNoBroadcast {
        val probed = Dedup.probeBandIndex(spark, "bandidx_x",
          docs.filter(col("doc_id") % 2 === 1))
        val plan = finalPlan(probed)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed band table:\n$plan")
        // the band equi-join must exchange ONLY the batch side: one
        // hashpartitioning exchange on the band key, never two (an
        // unbucketed base side would add a full-corpus shuffle)
        val bandExchanges =
          "Exchange hashpartitioning\\(band".r.findAllIn(plan).length
        assert(bandExchanges <= 1,
          s"corpus band scan shuffled ($bandExchanges band exchanges):\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bandidx_x_bands")
      spark.sql("DROP TABLE IF EXISTS bandidx_x_shingles")
      graft.operators.Q.releaseManaged()
    }
  }

  test("gram index: persisted novelty probe equals the in-plan q110 build") {
    val docs = Q.table(spark, sfDir, "documents")
    val tmp = Files.createTempDirectory("graft-gramidx")
    try {
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 2 === 0),
        "gramidx_t", s"$tmp")
      val probed = Dedup.probeGramNovelty(spark, "gramidx_t",
        docs.filter(col("doc_id") % 2 === 1)).collect().toSeq
      val inPlan = SparkEntry.queries("q110_gram_novelty")(spark, sfDir)
        .collect().toSeq
      assert(probed.nonEmpty && probed == inPlan,
        s"persisted gram probe drifted:\nprobe=$probed\ninplan=$inPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gramidx_t_grams")
      graft.operators.Q.releaseManaged()
    }
  }

  test("gram index: append keeps the table distinct; probe after append finds nothing novel") {
    val docs = Q.table(spark, sfDir, "documents")
    val tmp = Files.createTempDirectory("graft-gramidx2")
    try {
      val base = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      Dedup.writeGramIndex(base, "gramidx_a", s"$tmp")
      val before = spark.table("gramidx_a_grams").count()
      // appending the base again must be a no-op (distinct preserved)
      Dedup.appendToGramIndex(base, "gramidx_a")
      assert(spark.table("gramidx_a_grams").count() == before,
        "re-appending existing grams duplicated index rows")
      // fold the batch in; its own novelty must then read zero
      Dedup.appendToGramIndex(batch, "gramidx_a")
      graft.operators.Q.releaseManaged()
      val post = Dedup.probeGramNovelty(spark, "gramidx_a", batch)
        .collect()
      assert(post.forall(_.getLong(2) == 0L),
        s"batch still novel against an index it was appended to: " +
          post.mkString(","))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gramidx_a_grams")
      graft.operators.Q.releaseManaged()
    }
  }

  test("band/gram indexes survive the writing session: drop catalog, re-register, probe") {
    // the artifact's truth is the bucketed parquet on disk; the catalog
    // entry is session state. A new session re-attaches via register*
    // with the same bucket spec — the probe must be result-identical
    // AND still consume the bucketed layout.
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val tmp = Files.createTempDirectory("graft-reattach")
    try {
      Dedup.writeBandIndex(base, "reat_b", s"$tmp/band")
      Dedup.writeGramIndex(base, "reat_g", s"$tmp/gramidx")
      val wantPairs = Dedup.probeBandIndex(spark, "reat_b", batch)
        .orderBy("da", "db").collect().toSeq
      val wantNovel = Dedup.probeGramNovelty(spark, "reat_g", batch)
        .collect().toSeq
      graft.operators.Q.releaseManaged()
      // simulate the next session: the catalog forgets the tables
      spark.sql("DROP TABLE IF EXISTS reat_b_bands")
      spark.sql("DROP TABLE IF EXISTS reat_b_shingles")
      spark.sql("DROP TABLE IF EXISTS reat_g_grams")
      Dedup.registerBandIndex(spark, "reat_b", s"$tmp/band")
      Dedup.registerGramIndex(spark, "reat_g", s"$tmp/gramidx")
      val gotPairs = Dedup.probeBandIndex(spark, "reat_b", batch)
        .orderBy("da", "db").collect().toSeq
      val gotNovel = Dedup.probeGramNovelty(spark, "reat_g", batch)
        .collect().toSeq
      assert(gotPairs.nonEmpty && gotPairs == wantPairs,
        "re-registered band index drifted from the original probe")
      assert(gotNovel == wantNovel,
        "re-registered gram index drifted from the original probe")
      // release the probes' cached fragments first: a matching
      // InMemoryRelation would substitute into the plan below and its
      // nested-tree print truncates the branch the assertion reads
      graft.operators.Q.releaseManaged()
      // the re-attached tables still declare their bucket spec
      withNoBroadcast {
        val novel = Dedup.novelGramsOf(spark, "reat_g",
          Dedup.batchDistinctGrams(spark, batch))
        val plan = finalPlan(novel)
        assert(plan.contains("Bucketed: true"),
          s"re-registered gram table lost its bucketed scan:\n$plan")
      }
    } finally {
      Seq("reat_b_bands", "reat_b_shingles", "reat_g_grams")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("gram index probe: stored-side anti-join is exchange-free") {
    val docs = Q.table(spark, sfDir, "documents")
    val tmp = Files.createTempDirectory("graft-gramidx3")
    try {
      Dedup.writeGramIndex(docs.filter(col("doc_id") % 2 === 0),
        "gramidx_x", s"$tmp")
      withNoBroadcast {
        // assert on the probe CORE (the anti-join frame itself) — the
        // aggregated report nests it under later query stages where the
        // scan node is not printed
        val novel = Dedup.novelGramsOf(spark, "gramidx_x",
          Dedup.batchDistinctGrams(spark,
            docs.filter(col("doc_id") % 2 === 1)))
        val plan = finalPlan(novel)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed gram table:\n$plan")
        // the anti-join must exchange ONLY the batch's distinct grams:
        // one hashpartitioning exchange on g, never a second (an
        // unbucketed stored side would re-shuffle the whole corpus)
        val gramExchanges =
          "Exchange hashpartitioning\\(g".r.findAllIn(plan).length
        assert(gramExchanges <= 1,
          s"stored gram scan shuffled ($gramExchanges g exchanges):\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS gramidx_x_grams")
      graft.operators.Q.releaseManaged()
    }
  }

  test("ivf-sq8 index: persisted probe is bitwise-identical to the in-plan build") {
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-ivfidx")
    try {
      val model = Ann.writeIvfIndex(emb, "ivfidx_t", s"$tmp")
      val queries = emb.filter(col("vec_id") < 8)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("q_id", "rank").collect().toSeq
      val probed = canon(
        Ann.ivfSq8Probe(spark, "ivfidx_t", queries, k = 5, nprobe = 4,
          rerank = 16))
      val inPlan = canon(
        Ann.ivfSq8TopK(emb, queries, k = 5, nprobe = 4, rerank = 16,
          quantizer = Some(model)))
      assert(probed.nonEmpty, "probe returned no neighbors")
      // bitwise: same pairs, same exact-cosine sims, same ranks — the
      // parquet round-trip of (cell, scale, nsq, code, embedding) is
      // exact, so nothing may differ
      assert(probed == inPlan,
        s"persisted probe drifted from in-plan:\n" +
          s"probe=${probed.take(5)}\ninplan=${inPlan.take(5)}")
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ivfidx_t_$t"))
    }
  }

  test("ivf-sq8 compaction: probe bitwise-identical across all three tables") {
    // compactBucketed is family-generic: the same op that serves the
    // band index (q172) must leave the ANN artifact's probe results
    // bitwise unchanged — codes (bucketed cell), vectors (bucketed
    // vec_id), centroids (unbucketed ⇒ rejected loudly, not mangled)
    import graft.operators.IndexMaintenance
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-ivfcomp")
    try {
      Ann.writeIvfIndex(emb, "ivfcomp_t", s"$tmp")
      val queries = emb.filter(col("vec_id") < 8)
      def canon() = Ann.ivfSq8Probe(spark, "ivfcomp_t", queries,
        k = 5, nprobe = 4, rerank = 16).orderBy("q_id", "rank")
        .collect().toSeq
      val before = canon()
      IndexMaintenance.compactBucketed(spark, "ivfcomp_t_codes")
      IndexMaintenance.compactBucketed(spark, "ivfcomp_t_vectors")
      assert(canon() == before,
        "ANN probe drifted across code/vector table compaction")
      // the one-row-per-cell centroid table has no bucket spec — the
      // compactor must refuse it rather than rewrite it wrong
      intercept[IllegalArgumentException] {
        IndexMaintenance.compactBucketed(spark, "ivfcomp_t_centroids")
      }
      assert(canon() == before, "refused compaction must not touch data")
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ivfcomp_t_$t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("ivf-sq8 probe: code-table candidate scan is exchange-free") {
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-ivfidx2")
    try {
      Ann.writeIvfIndex(emb, "ivfidx_x", s"$tmp")
      withNoBroadcast {
        val probed = Ann.ivfSq8Probe(spark, "ivfidx_x",
          emb.filter(col("vec_id") < 4), k = 5, nprobe = 4, rerank = 16)
        val plan = finalPlan(probed)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed code table:\n$plan")
        // the cell equi-join must exchange ONLY the probe frame (a few
        // query rows), never the corpus-wide code table
        val cellExchanges =
          "Exchange hashpartitioning\\(cell".r.findAllIn(plan).length
        assert(cellExchanges <= 1,
          s"code table shuffled on cell ($cellExchanges exchanges):\n$plan")
      }
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ivfidx_x_$t"))
    }
  }

  test("semdedup probe: persisted-store threshold gate equals the exact cross-half rule") {
    val emb = Q.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft-semidx")
    try {
      Ann.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), "semidx_t",
        s"$tmp")
      val tau = 0.40
      val probed = Ann.semDedupProbe(spark, "semidx_t",
          emb.filter(col("vec_id") % 2 === 1), tau)
        .orderBy("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // the exact in-plan rule: every cross-half pair at rounded cosine
      // >= tau, via the same tiled scan q135/q157 declare — the
      // SQ8-bounded pre-filter must be invisible in the result
      val exact = graft.operators.Similarity.tiledPairSims(spark, emb)
        .filter(col("sim") >= tau)
        .filter(col("va") % 2 =!= col("vb") % 2)
        .select(
          when(col("va") % 2 === 1, col("va")).otherwise(col("vb"))
            .as("da"),
          when(col("va") % 2 === 1, col("vb")).otherwise(col("va"))
            .as("db"),
          col("sim"))
        .orderBy("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(probed.nonEmpty, "no cross-half pairs at tau — vacuous fixture")
      assert(probed == exact,
        s"probe drifted from the exact rule (probe=${probed.size}, " +
          s"exact=${exact.size}):\nprobe=${probed.take(5)}\n" +
          s"exact=${exact.take(5)}")
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS semidx_t_$t"))
    }
  }

  test("semdedup probe: survivor float fetch consumes the bucketed vectors table") {
    val emb = Q.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft-semidx2")
    try {
      Ann.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), "semidx_x",
        s"$tmp")
      withNoBroadcast {
        val probed = Ann.semDedupProbe(spark, "semidx_x",
          emb.filter(col("vec_id") % 2 === 1), 0.40)
        val plan = finalPlan(probed)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed vectors table:\n$plan")
        // the exact-verify join must exchange only the thin candidate
        // frame, never the stored float table
        val vecExchanges =
          "Exchange hashpartitioning\\(db".r.findAllIn(plan).length
        assert(vecExchanges <= 1,
          s"stored vectors shuffled ($vecExchanges db exchanges):\n$plan")
      }
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS semidx_x_$t"))
    }
  }

  test("ivf-pq index: persisted probe is bitwise-identical to the in-plan build") {
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-pqidx")
    try {
      val (model, _) = Ann.writePqIndex(emb, "pqidx_t", s"$tmp")
      val queries = emb.filter(col("vec_id") < 8)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("q_id", "rank").collect().toSeq
      val probed = canon(
        Ann.ivfPqProbe(spark, "pqidx_t", queries, k = 5, nprobe = 4,
          rerank = 16))
      val inPlan = canon(
        Ann.ivfPqTopK(emb, queries, k = 5, nprobe = 4, rerank = 16,
          quantizer = Some(model)))
      assert(probed.nonEmpty, "probe returned no neighbors")
      // bitwise: the parquet round-trip of (cell, nsq, code, embedding,
      // codebooks) is exact, so nothing may differ — including the
      // codebooks read back from the one-row _pq table
      assert(probed == inPlan,
        s"persisted pq probe drifted from in-plan:\n" +
          s"probe=${probed.take(5)}\ninplan=${inPlan.take(5)}")
    } finally {
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqidx_t_$t"))
    }
  }

  test("pq index survives the writing session: drop catalog, re-register, probe") {
    // the richest artifact schema (int8 code arrays, nested codebook
    // lists) — the inferred-schema register path must reproduce every
    // probe row bitwise after the catalog forgets the tables
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-pqreat")
    try {
      Ann.writePqIndex(emb, "pqreat_t", s"$tmp")
      val queries = emb.filter(col("vec_id") < 8)
      def canon() = Ann.ivfPqProbe(spark, "pqreat_t", queries,
        k = 5, nprobe = 4, rerank = 16)
        .orderBy("q_id", "rank").collect().toSeq
      val want = canon()
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqreat_t_$t"))
      Ann.registerPqIndex(spark, "pqreat_t", s"$tmp")
      val got = canon()
      assert(got.nonEmpty && got == want,
        "re-registered pq index drifted from the original probe")
    } finally {
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqreat_t_$t"))
    }
  }

  test("ivf-pq append: frozen-quantizer ingest equals an in-plan build over the union") {
    val emb = Q.table(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val tmp = Files.createTempDirectory("graft-pqapp")
    try {
      val (model, pqm) = Ann.writePqIndex(base, "pqapp_t", s"$tmp")
      Ann.appendToPqIndex(batch, "pqapp_t")
      val queries = emb.filter(col("vec_id") < 8)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("q_id", "rank").collect().toSeq
      val probed = canon(
        Ann.ivfPqProbe(spark, "pqapp_t", queries, k = 5, nprobe = 4,
          rerank = 16))
      // the reference answer: an in-plan build over the UNION corpus
      // with the BASE-trained model + codebooks (the frozen-quantizer
      // semantics appendToPqIndex promises)
      val inPlan = canon(
        Ann.ivfPqTopK(emb, queries, k = 5, nprobe = 4, rerank = 16,
          quantizer = Some(model), codebooks = Some(pqm)))
      assert(probed.nonEmpty, "probe returned no neighbors")
      assert(probed == inPlan,
        s"appended index drifted from the union in-plan build:\n" +
          s"probe=${probed.take(5)}\ninplan=${inPlan.take(5)}")
      // appended rows are actually reachable: some odd vec_id must
      // appear among the neighbors (the batch is half the corpus)
      assert(probed.exists(_.getLong(1) % 2 == 1),
        "no appended vector ever surfaced as a neighbor")
    } finally {
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqapp_t_$t"))
    }
  }

  test("ivf-pq append: a ragged embedding drops from the index instead of aliasing into cell 0") {
    import spark.implicits._
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-pqrag")
    try {
      Ann.writePqIndex(emb.filter(col("vec_id") < 20), "pqrag_t", s"$tmp")
      // one good vector, one truncated (wrong-dim) vector
      val good = emb.filter(col("vec_id") === 30)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
      val ragged = Seq((2000L, Array(1.0f, 2.0f, 3.0f)))
        .toDF("vec_id", "embedding")
      Ann.appendToPqIndex(good.union(ragged), "pqrag_t")
      val cells = spark.table("pqrag_t_codes")
        .filter(col("vec_id") >= 1000)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(cells == Set(1030L),
        s"ragged row should drop from the code table, got $cells")
    } finally {
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqrag_t_$t"))
    }
  }

  test("ivf-pq probe: code-table candidate scan is exchange-free") {
    val emb = Q.table(spark, sfDir, "embeddings")
    val tmp = Files.createTempDirectory("graft-pqidx2")
    try {
      Ann.writePqIndex(emb, "pqidx_x", s"$tmp")
      withNoBroadcast {
        val probed = Ann.ivfPqProbe(spark, "pqidx_x",
          emb.filter(col("vec_id") < 4), k = 5, nprobe = 4, rerank = 16)
        val plan = finalPlan(probed)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed code table:\n$plan")
        // the cell equi-join must exchange ONLY the probe frame (a few
        // query rows), never the corpus-wide code table
        val cellExchanges =
          "Exchange hashpartitioning\\(cell".r.findAllIn(plan).length
        assert(cellExchanges <= 1,
          s"code table shuffled on cell ($cellExchanges exchanges):\n$plan")
      }
    } finally {
      Seq("codes", "centroids", "vectors", "pq").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS pqidx_x_$t"))
    }
  }

  test("span index: persisted probe equals the in-plan rule's cross pairs") {
    import graft.operators.TextAnalysis
    val docs = Q.table(spark, sfDir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val base = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val tmp = Files.createTempDirectory("graft-spanidx")
    try {
      Dedup.writeSpanIndex(base, "spanidx_t", s"$tmp")
      val probed = Dedup.probeSpanIndex(spark, "spanidx_t", batch,
          seedLen = 5, minSpan = 5, maxDf = 128)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))) -> r.getLong(2)).toMap
      // in-plan rule over the union; cross (odd, even) pairs are the
      // reference answer for the probe
      val cross = Dedup.substringDupSpans(docs, seedLen = 5,
          minSpan = 5, maxDf = 128)
        .collect()
        .filter(r => (r.getLong(0) % 2) != (r.getLong(1) % 2))
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))) -> r.getLong(2)).toMap
      assert(probed.nonEmpty, "probe found no cross spans at all")
      assert(probed == cross,
        s"persisted span probe drifted from the in-plan cross pairs: " +
          s"probe-only=${(probed.toSet -- cross.toSet).take(5)} " +
          s"inplan-only=${(cross.toSet -- probed.toSet).take(5)}")
      graft.operators.Q.releaseManaged()
    } finally {
      spark.sql("DROP TABLE IF EXISTS spanidx_t_pgrams")
      graft.operators.Q.releaseManaged()
    }
  }

  test("span index probe: stored-side gram join is exchange-free and survives re-registration") {
    import graft.operators.TextAnalysis
    val docs = Q.table(spark, sfDir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val tmp = Files.createTempDirectory("graft-spanidx2")
    try {
      Dedup.writeSpanIndex(docs.filter(col("doc_id") % 2 === 0),
        "spanidx_x", s"$tmp")
      def run() = Dedup.probeSpanIndex(spark, "spanidx_x",
        docs.filter(col("doc_id") % 2 === 1), seedLen = 5,
        minSpan = 5, maxDf = 128)
      val before = run().collect().map(_.toSeq).toSet
      withNoBroadcast {
        val probed = run()
        val plan = finalPlan(probed)
        assert(plan.contains("Bucketed: true"),
          s"probe did not consume the bucketed pgram table:\n$plan")
        // the gk equi-join must exchange ONLY the batch side
        val gkExchanges =
          "Exchange hashpartitioning\\(gk".r.findAllIn(plan).length
        assert(gkExchanges <= 1,
          s"stored pgram scan shuffled ($gkExchanges gk exchanges):\n$plan")
      }
      // catalog death: drop, re-register from the files, same answer
      spark.sql("DROP TABLE spanidx_x_pgrams")
      Dedup.registerSpanIndex(spark, "spanidx_x", s"$tmp")
      assert(run().collect().map(_.toSeq).toSet == before,
        "re-registered span index returned different spans")
      graft.operators.Q.releaseManaged()
    } finally {
      spark.sql("DROP TABLE IF EXISTS spanidx_x_pgrams")
      graft.operators.Q.releaseManaged()
    }
  }

  test("band index compaction: rows preserved, files ≤ buckets, probe identical") {
    import graft.operators.IndexMaintenance
    val docs = Q.table(spark, sfDir, "documents")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val tmp = Files.createTempDirectory("graft-compactidx")
    try {
      // build + two ingest appends = the fragmentation a nightly loop
      // leaves behind (each insertInto lays down files per bucket)
      Dedup.writeBandIndex(docs.filter(col("doc_id") % 6 === 0),
        "compidx_t", s"$tmp")
      Dedup.appendToBandIndex(docs.filter(col("doc_id") % 6 === 2),
        "compidx_t")
      Dedup.appendToBandIndex(docs.filter(col("doc_id") % 6 === 4),
        "compidx_t")
      val rowsBefore = spark.table("compidx_t_bands")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val probeBefore = Dedup.probeBandIndex(spark, "compidx_t", batch)
        .orderBy("da", "db").collect().toSeq

      val stats = IndexMaintenance.compactBucketed(spark, "compidx_t_bands")
      IndexMaintenance.compactBucketed(spark, "compidx_t_shingles")

      assert(stats.filesAfter < stats.filesBefore,
        s"compaction did not reduce files: $stats")
      assert(stats.filesAfter <= 32,
        s"more than one file per bucket after compaction: $stats")
      val rowsAfter = spark.table("compidx_t_bands")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(rowsAfter == rowsBefore,
        "compaction changed the band table's row multiset")
      val probeAfter = Dedup.probeBandIndex(spark, "compidx_t", batch)
        .orderBy("da", "db").collect().toSeq
      assert(probeAfter == probeBefore,
        "probe result drifted across compaction")
      // the compacted table must still serve the exchange-free probe
      withNoBroadcast {
        val plan = finalPlan(
          Dedup.probeBandIndex(spark, "compidx_t", batch))
        assert(plan.contains("Bucketed: true"),
          s"compacted band table lost its bucketed scan:\n$plan")
        val bandExchanges =
          "Exchange hashpartitioning\\(band".r.findAllIn(plan).length
        assert(bandExchanges <= 1,
          s"compacted band scan shuffled:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS compidx_t_bands")
      spark.sql("DROP TABLE IF EXISTS compidx_t_shingles")
      graft.operators.Q.releaseManaged()
    }
  }

  test("dirTag: distinct corpus dirs get distinct tags; spellings of one dir agree") {
    // the artifact tag keys the per-corpus index tables — a collision
    // silently probes the WRONG index (VERDICT r10 #3, which is why the
    // earlier 32-bit dir.hashCode tag had to go)
    import graft.operators.IndexCatalog.dirTag
    val a = java.nio.file.Files.createTempDirectory("graft-tag-a")
    val b = java.nio.file.Files.createTempDirectory("graft-tag-b")
    assert(dirTag(a.toString) != dirTag(b.toString),
      "two different dirs must never share a tag")
    // different spellings of the SAME dir canonicalize to one tag, so
    // a re-attach under a trailing slash or ./ segment reuses the
    // existing artifact instead of rebuilding
    assert(dirTag(a.toString) == dirTag(a.toString + "/"))
    assert(dirTag(a.toString) == dirTag(a.toString + "/./"))
    // tags are stable across calls and fixed-width hex
    assert(dirTag(a.toString).matches("[0-9a-f]{12}"))
  }
  test("PCA store: round-trip fit is bitwise the in-plan fit; re-attach survives a drop") {
    import graft.operators.Similarity
    val name = "pcastore_t_" + System.nanoTime()
    val path = java.nio.file.Files
      .createTempDirectory("graft-pca-store").toString
    try {
      val fit = Similarity.pcaFit(spark, sfDir)
      Similarity.writePcaStore(spark, fit, name, path)
      val back = Similarity.pcaFitFromStore(spark, name)
      assert(back.dim == fit.dim)
      assert(back.trace == fit.trace && back.lam1 == fit.lam1 &&
        back.lam2 == fit.lam2, "eigen scalars must round-trip exactly")
      assert(back.means.sameElements(fit.means) &&
        back.v1.sameElements(fit.v1) && back.v2.sameElements(fit.v2),
        "vectors must round-trip parquet bitwise")
      // the artifact outlives the session that built it: drop the
      // catalog entry, re-attach over the same files, fit again
      spark.sql(s"DROP TABLE ${name}_pca")
      Similarity.registerPcaStore(spark, name, path)
      val re = Similarity.pcaFitFromStore(spark, name)
      assert(re.v1.sameElements(fit.v1) && re.lam1 == fit.lam1,
        "re-attached store must serve the identical fit")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_pca")
      graft.operators.Q.releaseManaged()
    }
  }

  test("staleness report: append-heavy index trips the rebuild bit; fresh rebuild clears it") {
    // VERDICT r12 ask #4: q172's maintenance discipline applied to
    // WHEN, not HOW — the drift report must fire on an append-heavy
    // store, go quiet after a rebuild, and treat unknown provenance
    // (no build meta) as fully stale.
    import graft.operators.IndexMaintenance
    import graft.operators.IndexMaintenance.FamilySpec
    val docs = Q.table(spark, sfDir, "documents")
    val tmp = Files.createTempDirectory("graft-staleband")
    val name = "staleband_" + System.nanoTime()
    try {
      Dedup.writeBandIndex(docs.filter(col("doc_id") % 4 =!= 0), name,
        s"$tmp")
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("band", s"${name}_shingles"))).collect().head
      val fresh = report()
      assert(fresh.getLong(3) == 0L && fresh.getLong(6) == 0L,
        s"fresh index must not be stale: $fresh")
      // ~25% appended tranche trips the declared 20% threshold
      Dedup.appendToBandIndex(docs.filter(col("doc_id") % 4 === 0), name)
      val grown = report()
      assert(grown.getLong(3) >= 200000L && grown.getLong(6) == 1L,
        s"append-heavy index must trip the rebuild bit: $grown")
      // a fresh rebuild (full corpus, meta rewritten) clears it
      Dedup.writeBandIndex(docs, name, s"$tmp")
      val rebuilt = report()
      assert(rebuilt.getLong(3) == 0L && rebuilt.getLong(6) == 0L,
        s"rebuild must clear the bit: $rebuilt")
      // unknown provenance (pre-meta artifact) reads fully stale
      val meta = new org.apache.hadoop.fs.Path(s"$tmp/_BUILD_META")
      meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(meta, false)
      val unknown = report()
      assert(unknown.getLong(1) == -1L &&
        unknown.getLong(3) == 1000000L && unknown.getLong(6) == 1L,
        s"meta-less store must rebuild: $unknown")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
      graft.operators.Q.releaseManaged()
    }
  }

  test("staleness report: measured probe recall feeds the health bit (recall watermark)") {
    // the q117/q126 contracts stay the swept floors; this wires a
    // MEASURED recall into the decision operator's signal_ok so a
    // degraded store rebuilds even when nothing was appended.
    import graft.operators.IndexMaintenance
    import graft.operators.IndexMaintenance.FamilySpec
    val emb = Q.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft-staleivf")
    val name = "staleivf_" + System.nanoTime()
    try {
      Ann.writeIvfIndex(emb, name, s"$tmp")
      def report(ok: Boolean) = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("ivf", s"${name}_codes", signalOk = ok)))
        .collect().head
      val queries = emb.filter(col("vec_id") % 50 === 0)
      def top(df: org.apache.spark.sql.DataFrame) = df
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = top(Ann.bruteTopK(emb, queries, k = 10))
      val probed = top(Ann.ivfSq8Probe(spark, name, queries, k = 10))
      val recall = (probed & brute).size.toDouble / brute.size
      // AnnSpec's 0.2 sanity floor: the watermark is the ALARM line,
      // deliberately below the swept per-config contract floors
      val healthy = report(recall >= 0.2)
      assert(healthy.getLong(5) == 1L && healthy.getLong(6) == 0L,
        s"healthy store must not rebuild (recall=$recall): $healthy")
      // the same store against an impossible watermark must rebuild —
      // the bit is the caller's floor comparison, exercised both ways
      val degraded = report(recall >= 1.01)
      assert(degraded.getLong(5) == 0L && degraded.getLong(6) == 1L,
        s"failed watermark must force rebuild: $degraded")
    } finally {
      Seq("codes", "centroids", "vectors").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("phash index: persisted probe equals the in-plan cross pairs; stored side exchange-free; rebuild supported") {
    // the perceptual family's write-once/probe-many path (round 14):
    // result identity vs the in-plan perceptualPairs, the exchange-free
    // bucketed-bk contract, and membership in the rebuild actuator.
    import spark.implicits._
    import graft.operators.MultiModal
    val tmp = Files.createTempDirectory("graft-phashidx")
    val name = "phashidx_" + System.nanoTime()
    def img(id: Long, v: Int): (Long, Long) =
      (id * 10 + v,
        MultiModal.dHash64(MultiModal.synthImageBytes(id, v)).get)
    // store: base images of ids 0..9; batch: near-dup variants of ids
    // 0..4 plus fresh images 20..24
    val store = (0L until 10L).map(img(_, 0))
    val batch = (0L until 5L).flatMap(id => Seq(img(id, 1), img(id, 3))) ++
      (20L until 25L).map(img(_, 0))
    val storeDf = store.toDF("asset_id", "hash")
    val batchDf = batch.toDF("asset_id", "hash")
    try {
      MultiModal.writePhashIndex(storeDf, name, s"$tmp")
      def probed() = MultiModal.probePhashIndex(spark, name, batchDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // in-plan reference: all-pairs over store ∪ batch, cross only
      val ref = (for {
        (a, ha) <- store; (b, hb) <- batch
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= MultiModal.DHashMaxHamming
      } yield (a, b, d.toLong)).toSet
      assert(probed() == ref && ref.nonEmpty,
        s"persisted probe drifted from in-plan pairs: got=${probed()}, ref=$ref")
      // exchange-free on the stored side: the bk join consumes the
      // bucketed layout; only the batch side may exchange
      withNoBroadcast {
        val p = finalPlan(MultiModal.probePhashIndex(spark, name, batchDf))
        assert(p.contains("Bucketed: true"),
          s"probe did not consume the bucketed phash table:\n$p")
        val bkExchanges =
          "Exchange hashpartitioning\\(bk".r.findAllIn(p).length
        assert(bkExchanges <= 1,
          s"stored phash side shuffled ($bkExchanges bk exchanges):\n$p")
      }
      // staleness + rebuild: append the batch, bit trips, actuator
      // rebuilds from the full hash frame, bit clears, probe of a
      // fresh query is identical to a from-scratch build
      MultiModal.appendToPhashIndex(batchDf, name)
      import graft.operators.IndexMaintenance
      import graft.operators.IndexMaintenance.FamilySpec
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("phash", s"${name}_phash"))).collect().head
      assert(report().getLong(6) == 1L, s"append must trip: ${report()}")
      IndexMaintenance.rebuildFamily(spark, "phash", name, s"$tmp",
        storeDf.unionByName(batchDf))
      assert(report().getLong(3) == 0L && report().getLong(6) == 0L,
        s"rebuild must clear: ${report()}")
      val fresh = s"${name}_f"
      MultiModal.writePhashIndex(storeDf.unionByName(batchDf), fresh,
        s"$tmp/fresh")
      val q = Seq(img(0L, 2), img(30L, 0)).toDF("asset_id", "hash")
      def rows(n: String) = MultiModal.probePhashIndex(spark, n, q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(rows(name) == rows(fresh) && rows(name).nonEmpty,
        "rebuilt phash store must probe identical to a fresh build")
      // THE ORACLE PATH (VERDICT r14 ask #1): the family's staleness
      // row must flow through q192's oracle-compared report, not just
      // the generic FamilySpec call above — run the real QueryDef and
      // pin the phash row to the doc-arithmetic values the DuckDB
      // oracle derives (banded rows = 4 × assets; base = % 4 != 0 of
      // doc_id < 40; 25% append trips the 20% threshold).
      val rep = SparkEntry.queries("q192_index_staleness")(spark, sfDir)
        .filter(col("family") === "phash").collect()
      assert(rep.length == 1, s"q192 must report the phash family: " +
        rep.mkString(","))
      val docs = Q.table(spark, sfDir, "documents")
        .filter(col("doc_id") < 40)
      val nAll = 4L * docs.count()
      val nBase = 4L * docs.filter(col("doc_id") % 4 =!= 0).count()
      val r = rep.head
      assert(r.getLong(1) == nBase && r.getLong(2) == nAll &&
        r.getLong(3) == (nAll - nBase) * 1000000L / nAll &&
        r.getLong(5) == (if (r.getLong(3) >= 200000L) 1L else 0L),
        s"phash staleness row drifted from doc arithmetic: $r " +
          s"(expect build=$nBase now=$nAll)")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_phash")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_f_phash")
      graft.operators.Q.releaseManaged()
    }
  }

  test("video index: persisted probe equals the in-plan batch-side containment; stored side exchange-free; phash-family rebuild applies") {
    // round 15: the frame-grain member of the phash family — packed
    // fids ride the same bucketed layout, so probe/exchange/rebuild
    // contracts are inherited, and the probe must agree with the
    // in-plan videoPairs restricted to cross (store, batch) pairs
    // counted on the batch side.
    import spark.implicits._
    import graft.operators.MultiModal
    val tmp = Files.createTempDirectory("graft-videoidx")
    val name = "videoidx_" + System.nanoTime()
    def fh(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("asset_id", "frame_idx", "hash")
    def flip(h: Long, bits: Int*): Long =
      bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
    val base = 0x0fedcba987654321L
    def frame(a: Long, f: Long): Long =
      flip(base, (a * 7 % 60).toInt, (f * 5 % 60 + 1).toInt,
        ((a + f) * 3 % 60 + 2).toInt, 59, 58, 57, 56)
    // store: assets 1..4, 5 frames each
    val store = for (a <- 1L to 4L; f <- 0L until 5L)
      yield (a, f, frame(a, f))
    // batch: 100 = re-encode of 1 (per-frame ≤ 2-bit flips), 101 =
    // 3-frame clip of 2, 102 = fresh
    val batch =
      (0L until 5L).map(f => (100L, f, flip(frame(1L, f), 0))) ++
        (0L until 3L).map(f => (101L, f, frame(2L, f + 1))) ++
        (0L until 4L).map(f => (102L, f, flip(frame(3L, f), 10, 20, 30, 40, 50)))
    try {
      MultiModal.writeVideoIndex(fh(store), name, s"$tmp")
      def probed() = MultiModal.probeVideoIndex(spark, name, fh(batch))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val ref = (for {
        sa <- store.map(_._1).distinct
        ba <- batch.map(_._1).distinct
      } yield {
        val matched = batch.filter(_._1 == ba).count { b =>
          store.filter(_._1 == sa).exists(s0 =>
            java.lang.Long.bitCount(s0._3 ^ b._3) <=
              MultiModal.DHashMaxHamming)
        }.toLong
        (sa, ba, matched)
      }).filter(_._3 > 0).toSet
      assert(probed() == ref && ref.nonEmpty,
        s"video probe drifted from in-plan containment: " +
          s"got=${probed()}, ref=$ref")
      assert(ref.contains((1L, 100L, 5L)) && ref.contains((2L, 101L, 3L)),
        s"fixture must exercise full and clip containment: $ref")
      withNoBroadcast {
        val p = finalPlan(MultiModal.probeVideoIndex(spark, name,
          fh(batch)))
        assert(p.contains("Bucketed: true"),
          s"probe did not consume the bucketed store:\n$p")
        val bkExchanges =
          "Exchange hashpartitioning\\(bk".r.findAllIn(p).length
        assert(bkExchanges <= 1,
          s"stored video side shuffled ($bkExchanges bk exchanges):\n$p")
      }
      // the family rebuild applies unchanged to the packed layout
      MultiModal.appendToVideoIndex(fh(batch), name)
      import graft.operators.IndexMaintenance
      import graft.operators.IndexMaintenance.FamilySpec
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("phash", s"${name}_phash"))).collect().head
      assert(report().getLong(6) == 1L, s"append must trip: ${report()}")
      IndexMaintenance.rebuildFamily(spark, "phash", name, s"$tmp",
        graft.operators.MultiModal.packFids(fh(store ++ batch)))
      assert(report().getLong(3) == 0L && report().getLong(6) == 0L,
        s"rebuild must clear: ${report()}")
      val q = fh(Seq((200L, 0L, frame(4L, 2L)), (200L, 1L, flip(base, 55))))
      assert(MultiModal.probeVideoIndex(spark, name, q).collect()
        .exists(r => r.getLong(1) == 200L && r.getLong(2) >= 1L),
        "rebuilt store must still answer frame containment probes")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_phash")
      graft.operators.Q.releaseManaged()
    }
  }

  test("positional index: persisted phrase probe equals the inline adjacency plan; probe never re-scans the corpus; write-once rebuild applies") {
    import graft.operators.{IndexMaintenance, TextAnalysis}
    import IndexMaintenance.FamilySpec
    // the q227 contract, frame-to-frame: the persisted-store probe is
    // result-identical to the inline q218 over the same corpus
    val inline = SparkEntry.queries("q218_phrase_posting")(spark, sfDir)
      .collect().toSeq
    val probe = SparkEntry.queries("q227_phrase_index_probe")(
      spark, sfDir)
    assert(probe.collect().toSeq == inline && inline.nonEmpty,
      "persisted phrase probe must match the inline adjacency plan")
    // the probe reads ONLY the store - no tokenize, no documents scan
    val pp = finalPlan(probe)
    assert(!pp.contains("documents"),
      s"the positional probe re-scanned the corpus:\n$pp")
    // write-once lifecycle: base-built store left behind by the corpus
    // trips the rebuild bit; rebuildFamily clears it and the rebuilt
    // store probes identically to a fresh full build
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val tmp = Files.createTempDirectory("graft-poslife")
    val name = "poslife_" + System.nanoTime()
    try {
      TextAnalysis.writePositionalIndex(base, name, s"$tmp/store")
      val posNow = docs
        .agg(sum(size(graft.operators.TextAnalysis.tokens(col("text"))))
          .cast("long")).head().getLong(0)
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("positional", s"${name}_postings",
          rowsNow = Some(posNow)))).collect().head
      assert(report().getLong(6) == 1L,
        s"left-behind corpus must trip the rebuild bit: ${report()}")
      IndexMaintenance.rebuildFamily(spark, "positional", name,
        s"$tmp/store", docs)
      assert(report().getLong(3) == 0L && report().getLong(6) == 0L,
        s"rebuild must clear the staleness: ${report()}")
      val fresh = s"${name}_f"
      TextAnalysis.writePositionalIndex(docs, fresh, s"$tmp/fresh")
      def rows(n: String) = TextAnalysis
        .probePhraseIndex(spark, n, Seq("hash", "join"))
        .collect().map(_.toSeq).toSet
      assert(rows(name) == rows(fresh) && rows(name).nonEmpty,
        "rebuilt positional store must probe identical to a fresh build")
      // re-attach in a fresh catalog state (the registrar contract)
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      TextAnalysis.registerPositionalIndex(spark, name, s"$tmp/store")
      assert(rows(name) == rows(fresh),
        "re-registered positional store must probe identically")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_f_postings")
      graft.operators.Q.releaseManaged()
    }
  }

  test("kwicSnippets: any phrase length and window, clipped at doc edges, index-only") {
    // VERDICT r16 ask #7 — the q236 machinery as an operator: a
    // 3-term phrase and a narrow window, reference computed from the
    // raw token arrays (the store never sees this reference)
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "merge sort is fast and merge sort is stable"),
      (2L, "merge sort"),                   // hit at both doc edges
      (3L, "a merge sort inside some longer text body here"),
      (4L, "no phrase here at all"),
      (5L, "sort merge sort merge sort"))   // overlapping-ish hits
      .toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("graft-kwic")
    val name = "kwicop_" + System.nanoTime()
    try {
      TextAnalysis.writePositionalIndex(docs, name, s"$tmp/store")
      for ((phrase, w) <- Seq(Seq("merge", "sort") -> 2,
          Seq("merge", "sort", "is") -> 1, Seq("sort") -> 3)) {
        val got = TextAnalysis.kwicSnippets(spark, name, phrase, w)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .toSet
        val ref = docs.collect().flatMap { r =>
          val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
          toks.indices
            .filter(i => i + phrase.size <= toks.length &&
              phrase.indices.forall(j => toks(i + j) == phrase(j)))
            .map { i =>
              val lo = math.max(0, i - w)
              val hi = math.min(toks.length, i + phrase.size + w)
              (r.getLong(0), i.toLong, toks.slice(lo, hi).mkString(" "))
            }
        }.toSet
        assert(got == ref && (phrase != Seq("merge", "sort") || got.nonEmpty),
          s"kwic($phrase, $w) drifted:\ngot=$got\nref=$ref")
      }
      // the bulk sweep returns exactly the per-phrase union, tagged
      val phrases = Seq(Seq("merge", "sort"), Seq("sort"))
      val bulk = TextAnalysis.kwicSnippetsBulk(spark, name, phrases, 2)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      val single = phrases.flatMap { ph =>
        TextAnalysis.kwicSnippets(spark, name, ph, 2).collect()
          .map(r => (ph.mkString(" "), r.getLong(0), r.getLong(1),
            r.getString(2)))
      }.toSet
      assert(bulk == single && bulk.nonEmpty,
        s"bulk kwic drifted from the per-phrase path:\n$bulk\nvs\n$single")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      graft.operators.Q.releaseManaged()
    }
  }

  test("lexical index: persisted BM25 probe equals the inline ranking; probe never re-scans the corpus; write-once rebuild applies") {
    import graft.operators.{IndexMaintenance, TextAnalysis}
    import IndexMaintenance.FamilySpec
    // the q215 contract, frame-to-frame: the persisted-store probe's
    // ranking is identical to the inline q195 over the same corpus
    val inline = SparkEntry.queries("q195_bm25_topk")(spark, sfDir)
      .collect().toSeq
    val probe = SparkEntry.queries("q215_lexical_index_probe")(
      spark, sfDir)
    assert(probe.collect().toSeq == inline && inline.nonEmpty,
      "persisted probe must rank identically to the inline BM25")
    // the probe reads ONLY the store — no corpus tokenize, no
    // documents scan anywhere in the final plan
    val pp = finalPlan(probe)
    assert(!pp.contains("documents"),
      s"the lexical probe re-scanned the corpus:\n$pp")
    // write-once lifecycle: base-built store left behind by the
    // corpus trips the rebuild bit; rebuildFamily clears it and the
    // rebuilt store probes identically to a fresh full build
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val tmp = Files.createTempDirectory("graft-lexlife")
    val name = "lexlife_" + System.nanoTime()
    try {
      TextAnalysis.writeLexicalIndex(base, name, s"$tmp/store")
      val lexNow = docs
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("t"))
        .agg(countDistinct(col("doc_id"), col("t"))).head().getLong(0)
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("lexical", s"${name}_postings",
          rowsNow = Some(lexNow)))).collect().head
      assert(report().getLong(6) == 1L,
        s"left-behind corpus must trip the rebuild bit: ${report()}")
      IndexMaintenance.rebuildFamily(spark, "lexical", name,
        s"$tmp/store", docs)
      assert(report().getLong(3) == 0L && report().getLong(6) == 0L,
        s"rebuild must clear the staleness: ${report()}")
      val fresh = s"${name}_f"
      TextAnalysis.writeLexicalIndex(docs, fresh, s"$tmp/fresh")
      def rows(n: String) = TextAnalysis.probeBm25Index(spark, n,
          TextAnalysis.topDfTerms(spark.table(s"${n}_df"), 3), 10)
        .select("lang", "rank", "doc_id", "score_micro", "terms_hit")
        .collect().map(_.toSeq).toSet
      assert(rows(name) == rows(fresh) && rows(name).nonEmpty,
        "rebuilt lexical store must probe identical to a fresh build")
      // re-attach in a fresh catalog state (the registrar contract)
      Seq("postings", "df", "stats").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      TextAnalysis.registerLexicalIndex(spark, name, s"$tmp/store")
      assert(rows(name) == rows(fresh),
        "re-registered lexical store must probe identically")
    } finally {
      Seq("postings", "df", "stats").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t")
        spark.sql(s"DROP TABLE IF EXISTS ${name}_f_$t")
      }
      graft.operators.Q.releaseManaged()
    }
  }

  test("health bits: all nine true on a q192-style store; a corrupted table flips its bit into rebuild") {
    // ADVICE r13 (medium): the measured signal_ok bits are excluded
    // from q192's oracle-compared output because a cross-engine oracle
    // reading only raw parquet cannot reproduce them — so THIS is
    // where they are verified: all eight true on the exact q192 fixture
    // shape, and a store corruption flips its bit through the
    // stalenessReport rebuild decision.
    import graft.operators.IndexMaintenance
    import graft.operators.IndexMaintenance.FamilySpec
    val docs = Q.table(spark, sfDir, "documents")
    val emb = Q.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val baseEmb = emb.filter(col("vec_id") % 4 =!= 0)
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
    val tmp = Files.createTempDirectory("graft-health")
    val name = "health_" + System.nanoTime()
    try {
      Dedup.writeBandIndex(base, s"${name}_band", s"$tmp/band")
      Dedup.writeGramIndex(base, s"${name}_gram", s"$tmp/gram")
      Dedup.writeSpanIndex(toks(base), s"${name}_span", s"$tmp/span")
      Ann.writeIvfIndex(baseEmb, s"${name}_ivf", s"$tmp/ivf")
      Ann.writePqIndex(baseEmb, s"${name}_pq", s"$tmp/pq")
      // seventh family (round 15): banded-row conservation bit
      import spark.implicits._
      graft.operators.MultiModal.writePhashIndex(
        (0L until 8L).map(i => (i, graft.operators.MultiModal
          .dHash64(graft.operators.MultiModal.synthImageBytes(i, 0)).get))
          .toDF("asset_id", "hash"),
        s"${name}_phash", s"$tmp/phash")
      // eighth family (round 15): dictionary-vs-postings conservation
      graft.operators.TextAnalysis.writeLexicalIndex(
        base, s"${name}_lexical", s"$tmp/lexical")
      // ninth family (round 15): position-contiguity conservation
      graft.operators.TextAnalysis.writePositionalIndex(
        base, s"${name}_positional", s"$tmp/positional")
      // tenth family (round 16): seqs-vs-manifest conservation
      graft.operators.Release.writeTokenCorpus(base,
        graft.operators.TextAnalysis.unigramTrain(base.select("text"),
          vocabSize = 48, maxPieceLen = 3, seedSize = 80, emIters = 1),
        s"${name}_tokrel", s"$tmp/tokrel")
      val bits = IndexMaintenance.healthBits(spark, name)
      assert(bits.size == 9 && bits.contains("phash") &&
        bits.contains("lexical") && bits.contains("positional") &&
        bits.contains("tokrel"),
        s"phash + lexical + positional + tokrel stores present: " +
          s"bits must be measured: $bits")
      assert(bits.values.forall(identity),
        s"fresh q192-style store must measure healthy: $bits")
      // corrupt the gram store: a duplicate key breaks the
      // distinctness every anti-join novelty gate relies on
      spark.table(s"${name}_gram_grams").limit(1)
        .write.mode("append").insertInto(s"${name}_gram_grams")
      spark.catalog.refreshTable(s"${name}_gram_grams")
      val corrupt = IndexMaintenance.healthBits(spark, name)
      assert(!corrupt("gram"),
        s"duplicated gram row must flip the gram bit: $corrupt")
      assert(corrupt.filterNot(_._1 == "gram").values.forall(identity),
        s"only the corrupted family's bit may flip: $corrupt")
      // and the flipped bit forces the rebuild decision
      val row = IndexMaintenance.stalenessReport(spark, Seq(
        FamilySpec("gram", s"${name}_gram_grams",
          signalOk = corrupt("gram")))).collect().head
      assert(row.getLong(5) == 0L && row.getLong(6) == 1L,
        s"corrupted store must decide rebuild: $row")
      // corrupt the phash store: one duplicated banded row breaks the
      // 4-rows-per-asset conservation the probe's completeness rests on
      spark.table(s"${name}_phash_phash").limit(1)
        .write.mode("append").insertInto(s"${name}_phash_phash")
      spark.catalog.refreshTable(s"${name}_phash_phash")
      assert(!IndexMaintenance.healthBits(spark, name)("phash"),
        "duplicated banded row must flip the phash bit")
      // corrupt the lexical store: a posting appended WITHOUT a
      // dictionary rebuild violates the family's write-once rule and
      // must break Σ df == postings rows
      spark.table(s"${name}_lexical_postings").limit(1)
        .write.mode("append").insertInto(s"${name}_lexical_postings")
      spark.catalog.refreshTable(s"${name}_lexical_postings")
      assert(!IndexMaintenance.healthBits(spark, name)("lexical"),
        "a postings append without a df rebuild must flip the lexical bit")
      // corrupt the positional store: one duplicated posting breaks
      // the per-doc position contiguity the phrase probe relies on
      spark.table(s"${name}_positional_postings").limit(1)
        .write.mode("append").insertInto(s"${name}_positional_postings")
      spark.catalog.refreshTable(s"${name}_positional_postings")
      assert(!IndexMaintenance.healthBits(spark, name)("positional"),
        "a duplicated posting must flip the positional bit")
      // corrupt the release store: one duplicated sequence breaks the
      // seqs-vs-manifest token/doc conservation a consumer audits
      spark.table(s"${name}_tokrel_seqs").limit(1)
        .write.mode("append").insertInto(s"${name}_tokrel_seqs")
      spark.catalog.refreshTable(s"${name}_tokrel_seqs")
      assert(!IndexMaintenance.healthBits(spark, name)("tokrel"),
        "a duplicated sequence must flip the tokrel bit")
    } finally {
      Seq("band_bands", "band_shingles", "gram_grams", "span_pgrams",
        "ivf_codes", "ivf_centroids", "ivf_vectors", "pq_codes",
        "pq_centroids", "pq_vectors", "pq_pq", "phash_phash",
        "lexical_postings", "lexical_df", "lexical_stats",
        "positional_postings", "tokrel_seqs", "tokrel_manifest").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("rebuildFamily: tripped family rebuilds in place, staleness clears, probes match a fresh build, guarded append survives the swap") {
    // VERDICT r13 ask #2: q192 decides WHEN, this performs the
    // rebuild — side-path build, aside/in swap, _BUILD_META refresh —
    // and the guarded streaming append keeps exact-once semantics
    // across the swap.
    import graft.operators.IndexMaintenance
    import graft.operators.IndexMaintenance.FamilySpec
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val tranche = docs.filter(col("doc_id") % 4 === 0)
    val tmp = Files.createTempDirectory("graft-rebuild")
    val name = "rebuild_" + System.nanoTime()
    val fresh = s"${name}_fresh"
    try {
      Dedup.writeBandIndex(base, name, s"$tmp/live")
      Dedup.appendToBandIndex(tranche, name)
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("band", s"${name}_shingles"))).collect().head
      val grown = report()
      assert(grown.getLong(6) == 1L,
        s"append-heavy store must trip before the rebuild: $grown")
      // the actuator: rebuild from the CURRENT corpus (base + tranche)
      IndexMaintenance.rebuildFamily(spark, "band", name, s"$tmp/live",
        docs)
      val rebuilt = report()
      assert(rebuilt.getLong(3) == 0L && rebuilt.getLong(6) == 0L,
        s"rebuild must clear the staleness bit: $rebuilt")
      // rebuilt store ≡ a fresh build of the same corpus: identical
      // probe rows on the same batch
      Dedup.writeBandIndex(docs, fresh, s"$tmp/fresh")
      val batch = docs.filter(col("doc_id") % 7 === 3)
      def probeRows(n: String) = Dedup.probeBandIndex(spark, n, batch)
        .select(col("da"), col("db"), round(col("j"), 6).as("j"))
        .orderBy("da", "db").collect().toSeq
      val got = probeRows(name)
      assert(got == probeRows(fresh),
        "rebuilt store must probe row-identical to a fresh build")
      assert(got.nonEmpty, "probe must find pairs (vacuous equality)")
      // guarded append across the swap: everything in the tranche is
      // already in the rebuilt store, so the dedup append must be a
      // no-op — the guard reads POST-swap state, not a stale listing
      val before = spark.table(s"${name}_shingles").count()
      Dedup.appendToBandIndexDedup(tranche, name)
      val after = spark.table(s"${name}_shingles").count()
      assert(after == before,
        s"guarded append re-admitted rows across the swap: " +
          s"$before -> $after")
      // single-table family takes the same swap path
      Dedup.writeGramIndex(base, s"${name}_g", s"$tmp/gram")
      IndexMaintenance.rebuildFamily(spark, "gram", s"${name}_g",
        s"$tmp/gram", docs)
      val gReport = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("gram", s"${name}_g_grams"))).collect().head
      assert(gReport.getLong(3) == 0L && gReport.getLong(6) == 0L,
        s"gram rebuild must clear staleness: $gReport")
    } finally {
      Seq(s"${name}_bands", s"${name}_shingles", s"${fresh}_bands",
        s"${fresh}_shingles", s"${name}_g_grams").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("recoverFamily: healthy no-op; dropped catalog repairs; crashed-between-renames completes via tmp promotion; destroyed store rebuilds") {
    // ADVICE r15: the ingest loops call this at batch START — every
    // crash window of a scheduled rebuild must self-heal before the
    // first probe touches the family's tables.
    import graft.operators.IndexMaintenance
    import graft.streaming.IngestLedger
    import org.apache.hadoop.fs.Path
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val tmp = Files.createTempDirectory("graft-recover")
    val name = "recover_" + System.nanoTime()
    val live = new Path(s"$tmp/live")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def drop(): Unit = Seq("bands", "shingles").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    try {
      Dedup.writeBandIndex(base, name, live.toString)
      IngestLedger.write(base.select("doc_id").limit(2),
        IngestLedger.dirFor(spark, s"${name}_shingles", 3L))
      IngestLedger.markAppendDone(spark,
        IngestLedger.dirFor(spark, s"${name}_shingles", 3L))
      // healthy catalog: no action, corpus never evaluated
      assert(!IndexMaintenance.recoverFamily(spark, "band", name,
        live.toString, sys.error("corpus must not be evaluated")),
        "healthy family must be a no-op")
      // catalog window: DROPs landed, re-register did not
      drop()
      assert(IndexMaintenance.recoverFamily(spark, "band", name,
        live.toString, docs), "dropped catalog must repair")
      assert(spark.table(s"${name}_shingles").count() > 0)
      assert(IngestLedger.committed(spark,
        IngestLedger.dirFor(spark, s"${name}_shingles", 3L)),
        "catalog repair must not touch the ledger")
      // crashed between renames: live went aside... and the completed
      // tmp build (META + ledgers inside) never made its final rename.
      // Simulate the exact on-disk state by moving live to the tmp name.
      drop()
      assert(fs.rename(live, new Path(s"$tmp", "live.rebuild.tmp")),
        "test setup rename failed")
      assert(IndexMaintenance.recoverFamily(spark, "band", name,
        live.toString, docs),
        "rename-window crash must complete via promotion + rebuild")
      assert(spark.table(s"${name}_shingles").count() > 0)
      assert(IngestLedger.committed(spark,
        IngestLedger.dirFor(spark, s"${name}_shingles", 3L)) &&
        IngestLedger.appendDone(spark,
          IngestLedger.dirFor(spark, s"${name}_shingles", 3L)),
        "promoted tmp's ledgers must survive into the rebuilt live")
      // store destroyed entirely: fresh rebuild from the corpus
      drop()
      fs.delete(live, true)
      assert(IndexMaintenance.recoverFamily(spark, "band", name,
        live.toString, docs), "destroyed store must rebuild")
      assert(spark.table(s"${name}_shingles").count() > 0)
    } finally {
      Seq("bands", "shingles").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("rebuildFamily crash recovery: stranded aside ledgers salvage into the re-run; a double ledger refuses; missing catalog entries repair") {
    // ADVICE r14 (medium): a rebuild that crashed between its renames
    // and its ledger move leaves the ONLY copy of the _ingest_ledger
    // trees in the .pre-rebuild aside dir — a re-run used to delete it
    // blind, permanently losing the admitted sets. Both crash windows:
    //  (a) between rename(live->aside) and rename(tmp->live): live
    //      missing, aside holds store + ledgers -> salvage into the
    //      fresh tmp build;
    //  (b) after both renames, before the ledger move: live = rebuilt
    //      store without ledgers, aside holds them -> salvage into
    //      live, ride the normal swap.
    // Plus the refuse-loudly path (both sides carry a ledger) and the
    // ADVICE r14 (low) catalog window: DROPs landed, re-register did
    // not -> repairFamilyCatalog re-runs the registrar over the intact
    // files.
    import graft.operators.IndexMaintenance
    import graft.streaming.IngestLedger
    import org.apache.hadoop.fs.Path
    val docs = Q.table(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val tmp = Files.createTempDirectory("graft-salvage")
    val name = "salvage_" + System.nanoTime()
    val live = new Path(s"$tmp/live")
    val aside = new Path(s"$tmp/live.pre-rebuild")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ledgerDir(batch: Long) =
      IngestLedger.dirFor(spark, s"${name}_shingles", batch)
    try {
      Dedup.writeBandIndex(base, name, live.toString)
      // a committed streaming batch: its ledger lives INSIDE the table
      IngestLedger.write(
        base.select("doc_id").limit(3), ledgerDir(7L))
      IngestLedger.markAppendDone(spark, ledgerDir(7L))
      assert(IngestLedger.committed(spark, ledgerDir(7L)))
      // ---- window (a): live -> aside rename landed, tmp -> live did
      // not. Simulate by renaming the whole live dir aside.
      assert(fs.rename(live, aside), "test setup rename failed")
      IndexMaintenance.rebuildFamily(spark, "band", name,
        live.toString, docs)
      assert(IngestLedger.committed(spark, ledgerDir(7L)) &&
        IngestLedger.appendDone(spark, ledgerDir(7L)),
        "window (a): salvaged ledger must survive the re-run")
      assert(!fs.exists(aside), "aside copy must be gone after the run")
      // ---- window (b): both renames landed, ledger move did not.
      // Simulate: strand a second batch's ledger in a reconstructed
      // aside copy while live (the `rebuilt` store) carries none of it.
      val strandedSrc = new Path(new Path(live, "shingles"),
        "_ingest_ledger")
      fs.mkdirs(new Path(aside, "shingles"))
      assert(fs.rename(strandedSrc,
        new Path(new Path(aside, "shingles"), "_ingest_ledger")),
        "test setup strand failed")
      assert(!IngestLedger.committed(spark, ledgerDir(7L)),
        "setup: ledger must be stranded aside")
      IndexMaintenance.rebuildFamily(spark, "band", name,
        live.toString, docs)
      assert(IngestLedger.committed(spark, ledgerDir(7L)) &&
        IngestLedger.appendDone(spark, ledgerDir(7L)),
        "window (b): salvaged ledger must ride the swap back into live")
      // ---- refuse loudly: aside AND live both carry a ledger for the
      // same table — ambiguous admitted sets must not be guessed at
      fs.mkdirs(new Path(new Path(aside, "shingles"),
        "_ingest_ledger/batch=99"))
      val ex = intercept[java.io.IOException] {
        IndexMaintenance.rebuildFamily(spark, "band", name,
          live.toString, docs)
      }
      assert(ex.getMessage.contains("refusing rebuild"),
        s"double ledger must refuse, got: ${ex.getMessage}")
      assert(IngestLedger.committed(spark, ledgerDir(7L)),
        "refusal must leave the live ledger untouched")
      fs.delete(aside, true)
      // ---- catalog window (ADVICE r14 low): DROPs landed, the
      // re-register did not — files intact, tables invisible
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
      assert(IndexMaintenance.repairFamilyCatalog(spark, "band", name,
        live.toString), "missing entries over a live store must repair")
      assert(spark.catalog.tableExists(s"${name}_shingles") &&
        spark.table(s"${name}_shingles").count() > 0,
        "repaired catalog must serve the intact files")
      assert(!IndexMaintenance.repairFamilyCatalog(spark, "band", name,
        live.toString), "a healthy catalog must not re-register")
      assert(!IndexMaintenance.repairFamilyCatalog(spark, "band",
        s"${name}_ghost", s"$tmp/ghost"),
        "a missing live dir is the rebuild path, not a catalog repair")
    } finally {
      Seq(s"${name}_bands", s"${name}_shingles").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("token-corpus release: re-attach serves identical sequences; shard reads stay exchange-free") {
    import graft.operators.{Release, TextAnalysis}
    val docs = Q.table(spark, sfDir, "documents").limit(120)
      .select("doc_id", "text")
    val vocab = TextAnalysis.unigramTrain(docs.select("text"),
      vocabSize = 48, maxPieceLen = 3, seedSize = 80, emIters = 2)
    val tmp = Files.createTempDirectory("graft-tokrel")
    val name = "tokrel_t"
    try {
      Release.writeTokenCorpus(docs, vocab, name, s"$tmp")
      val before = spark.table(s"${name}_seqs")
        .orderBy("shard", "seq").collect().toSeq
      val manBefore = spark.table(s"${name}_manifest")
        .orderBy("shard").collect().toSeq
      assert(before.nonEmpty && manBefore.size == Release.NumShards)
      // the artifact outlives the catalog: drop + re-register
      spark.sql(s"DROP TABLE ${name}_seqs")
      spark.sql(s"DROP TABLE ${name}_manifest")
      Release.registerTokenCorpus(spark, name, s"$tmp")
      val after = spark.table(s"${name}_seqs")
        .orderBy("shard", "seq").collect().toSeq
      val manAfter = spark.table(s"${name}_manifest")
        .orderBy("shard").collect().toSeq
      assert(after == before && manAfter == manBefore,
        "re-attached release artifact drifted from the written one")
      // a per-shard consumer aggregates off the bucketed layout with
      // no exchange on the shard key (the dataloader-read contract)
      val agg = spark.table(s"${name}_seqs")
        .groupBy("shard").agg(sum("n_tokens").as("t"))
      val plan = finalPlan(agg)
      assert(plan.contains("Bucketed: true"),
        s"shard agg did not consume the bucketed layout:\n$plan")
      assert(!"Exchange hashpartitioning\\(shard".r
        .findFirstIn(plan).isDefined,
        s"per-shard aggregate shuffled on the shard key:\n$plan")
      // round-trip decode off the RE-ATTACHED store still exact
      val rec = Release.decodeStore(spark.table(s"${name}_seqs"), vocab)
        .join(docs.select(col("doc_id"),
          array_join(TextAnalysis.tokens(col("text")), " ").as("norm")),
          "doc_id")
      assert(rec.count() == 120L &&
        rec.filter(col("rec") =!= col("norm")).count() == 0L)
    } finally {
      Seq(s"${name}_seqs", s"${name}_manifest").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Q.releaseManaged()
    }
  }

  test("token-corpus release lifecycle: staleness red on corpus drift, atomic re-cut green, re-attach survives") {
    // VERDICT r16 ask #6 — the write-once family's full lifecycle,
    // the way the lexical rebuild-only test covers its own: a release
    // cut on the base tranche goes RED as the corpus grows past it,
    // recutTokenCorpus swaps a complete fresh artifact in atomically
    // (no partial store ever at the canonical path), the staleness row
    // goes green, and the re-cut store round-trips the full corpus
    import graft.operators.{IndexMaintenance, Release, TextAnalysis}
    import IndexMaintenance.FamilySpec
    val docs = Q.table(spark, sfDir, "documents").limit(160)
      .select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val vocab = TextAnalysis.unigramTrain(docs.select("text"),
      vocabSize = 48, maxPieceLen = 3, seedSize = 80, emIters = 2)
    val tmp = Files.createTempDirectory("graft-tokrel-life")
    val name = "tokrellife_" + System.nanoTime()
    val path = s"$tmp/store"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Release.writeTokenCorpus(base, vocab, name, path)
      val nAll = docs.count()
      def report() = IndexMaintenance.stalenessReport(spark,
        Seq(FamilySpec("tokrel", s"${name}_seqs",
          rowsNow = Some(nAll)))).collect().head
      // RED: the q192 tokrel row — base-cut release left behind by
      // the corpus (~25% appended tranche > the 20% threshold)
      assert(report().getLong(6) == 1L,
        s"left-behind corpus must trip the tokrel rebuild bit: ${report()}")
      Release.recutTokenCorpus(spark, docs, vocab, name, path)
      // GREEN: fresh _BUILD_META rode the swap
      assert(report().getLong(3) == 0L && report().getLong(6) == 0L,
        s"re-cut must clear the staleness: ${report()}")
      // the swap left no debris and the canonical store is complete
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.recut.tmp")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(s"$path.pre-recut")),
        "re-cut must clean up its tmp and aside dirs")
      // the re-cut artifact round-trips the FULL corpus…
      def decoded() = Release
        .decodeStore(spark.table(s"${name}_seqs"), vocab)
        .join(docs.select(col("doc_id"),
          array_join(TextAnalysis.tokens(col("text")), " ").as("norm")),
          "doc_id")
      assert(decoded().count() == nAll &&
        decoded().filter(col("rec") =!= col("norm")).count() == 0L,
        "re-cut release must round-trip the full corpus")
      // …and survives a session restart (catalog dropped, files live)
      spark.sql(s"DROP TABLE ${name}_seqs")
      spark.sql(s"DROP TABLE ${name}_manifest")
      Release.registerTokenCorpus(spark, name, path)
      assert(decoded().count() == nAll,
        "re-attached re-cut release must serve decode")
    } finally {
      Seq(s"${name}_seqs", s"${name}_manifest",
        s"${name}__recut_seqs", s"${name}__recut_manifest").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Q.releaseManaged()
    }
  }
}
