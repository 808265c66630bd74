package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search — the 100 TB scale path behind
  * the exact cosine baselines in [[Similarity]].
  *
  * Random-hyperplane LSH (sign-of-projection, the classic SimHash-for-
  * cosine scheme): each vector gets an integer bucket from the signs of
  * `nPlanes` dot products against deterministic hyperplanes
  * (`java.util.Random(seed)` Gaussians). Neighbor candidates come from a
  * **bucket equi-join** — the corpus shuffles once on a scalar
  * (table, bucket) key, queries broadcast or shuffle likewise, and no
  * n² pair set ever materializes. Exact cosine re-ranks candidates
  * inside each bucket.
  *
  * Recall amplification is two-axis, per the standard LSH theory:
  *  - AND within a table: `nPlanes` sign bits sharpen precision
  *    (collision p = (1-θ/π)^nPlanes);
  *  - OR across tables: `tables` independent hyperplane sets union
  *    their candidates (recall = 1-(1-p)^L) — the knob that rescues
  *    recall on low-similarity corpora where a single table is
  *    hopeless (measured sweep committed in ANN_TUNING.md);
  * plus multi-probe (`probes = 1` also visits each Hamming-1 bucket),
  * which buys most of an extra table for no shuffle-width cost.
  *
  * A relative occupancy cap (`maxBucketFraction`) drops degenerate
  * buckets — constant/zero embedding mass that lands in one bucket in
  * every table and would cost f·n work per probing query (the ANN
  * analog of the winnowing df cap; exact-duplicate mass belongs to the
  * exact-dedup pipeline, not the index).
  *
  * Contract (AnnSpec + the q98 recall-floor query): candidates ⊆
  * brute-force pairs, per-pair sims equal the exact ones bitwise, any
  * corpus vector used as a query retrieves itself (identical vector ⇒
  * identical bucket in every table), and measured recall vs the exact
  * top-k stays above the tuned floor.
  */
object Ann {

  /** Deterministic unit-free Gaussian hyperplanes. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def litArray(a: Array[Double]): Column =
    array(a.toIndexedSeq.map(lit): _*)

  /** Sign-bucket of an embedding column against the given planes. A null
    * dot product (ragged/mismatched embedding dim) propagates to a null
    * bucket — the row drops out of the bucket equi-join instead of
    * landing in a plausible-looking bucket 0.
    */
  def signBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = dot(emb, litArray(p))
      when(d >= 0d, lit(1 << i)).when(d < 0d, lit(0))
    }.reduce(_ + _)

  /** Buckets within Hamming distance `probes` of `bucket` (multi-probe
    * expansion; probes=0 ⇒ just the bucket itself).
    */
  def probeBuckets(bucket: Column, nPlanes: Int, probes: Int): Column = {
    require(probes <= 1, "only 0- and 1-probe supported")
    if (probes == 0) array(bucket)
    else array(bucket +: (0 until nPlanes).map(i =>
      bucket.bitwiseXOR(lit(1 << i))): _*)
  }

  /** Empty (q_id, vec_id, sim, rank) frame matching the top-k contract. */
  private def emptyResult(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("q_id", LongType), StructField("vec_id", LongType),
        StructField("sim", DoubleType), StructField("rank", IntegerType))))
  }

  /** ANN top-k: bucket-join candidates, exact cosine re-rank.
    * `corpus`/`queries`: (vec_id, embedding). Output: (q_id, vec_id, sim)
    * with per-query rank ≤ k, self-matches excluded.
    *
    * `tables` independent hyperplane sets (seed + t) OR their candidate
    * sets: the corpus explodes to L (table, bucket) rows per vector —
    * ONE shuffle on the composite key, L× shuffle width, never L
    * separate joins — and `dropDuplicates` unions the per-table hits.
    * A null bucket (ragged embedding) drops out of the equi-join in
    * every table rather than aliasing into bucket 0.
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      seed: Long = 7L,
      probes: Int = 1,
      tables: Int = 16,
      maxBucketFraction: Double = 0.05): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    // hyperplane dimension must match the data (graft_dot nulls out on
    // mismatch rather than truncating) — read it from one corpus row;
    // an empty corpus (or null sampled embedding) yields an empty result
    val sampled = corpus
      .filter(col("embedding").isNotNull)
      .select(size(col("embedding")).as("dim")).head(1)
    if (sampled.isEmpty) return emptyResult(corpus.sparkSession)
    val dim = sampled(0).getInt(0)
    // SKINNY bucket frames: the L×-exploded join and the candidate
    // dedup ship only (id, t, bucket) — the vector payloads join back
    // onto the deduped pair list afterwards, where the optimizer can
    // broadcast either side by stats. Shipping embeddings through the
    // explode would multiply the shuffle by tables × vecBytes (the
    // LSH-side analog of the q27 note, with the inequality reversed:
    // here survivors are FEW, so skinny-join-then-rejoin wins). All L
    // buckets per row come from ONE native [[SignBuckets]] pass — the
    // column-composed form (L × nPlanes literal-array dots) grew the
    // expression tree superlinearly past codegen's comfort.
    // posexplode of the NULL bucket array (ragged/NaN embedding) emits
    // nothing: the row drops out of every table, as before.
    val buckets = graft.functions.VectorFunctions.signBuckets(
      col("embedding"), nPlanes, tables, seed, dim)
    val cAll = corpus.select(col("vec_id"), posexplode(buckets))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("bucket"))
    // degenerate-bucket guard: constant / near-constant embedding mass
    // (zero vectors, boilerplate) lands in ONE bucket in EVERY table
    // (identical vector ⇒ identical sign pattern), and a bucket with
    // f·n corpus rows costs f·n work per probing query — a quadratic
    // reducer bomb at 100 TB, the same failure class the winnowing df
    // cap guards. Buckets holding more than maxBucketFraction of a
    // table's rows (floor 8, so tiny corpora are never capped) drop
    // from the join: exact-duplicate mass is the exact-dedup
    // pipeline's job, not the ANN index's. Two skinny aggregations on
    // the (t, bucket) frame — no driver action, no payload touched.
    val occ = cAll.groupBy("t", "bucket").agg(count(lit(1)).as("occ"))
    val hot = occ
      .join(occ.groupBy("t").agg(sum("occ").as("tot")), "t")
      .filter(col("occ") > greatest(lit(8.0), col("tot") * maxBucketFraction))
      .select("t", "bucket")
    val c = cAll.join(hot, Seq("t", "bucket"), "left_anti")
    // query side: per table the multi-probe bucket neighborhood, tagged
    // with the table id so probes never cross tables
    val q = queries
      .select(col("vec_id").as("q_id"), posexplode(buckets))
      .select(col("q_id"), col("pos").as("t"),
        explode(probeBuckets(col("col"), nPlanes, probes)).as("bucket"))
    val cand = c.join(q, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    cand
      .join(corpus.select(col("vec_id"), col("embedding"),
        normSq(col("embedding")).as("nsq")), "vec_id")
      .join(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        normSq(col("embedding")).as("q_nsq")), "q_id")
      .withColumn("sim", cosineWithNorms(
        dot(col("embedding"), col("q_emb")), col("nsq"), col("q_nsq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "sim", "rank")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer buckets the
    * corpus by nearest centroid (`nlist` cells; the quantizer trains on
    * a bounded deterministic sample — ~256 points per centroid — never
    * the full corpus); each query probes its `nprobe` nearest cells and
    * exact cosine re-ranks the candidates. Same scale shape as the LSH
    * path — one corpus shuffle on the cell id, a tiny broadcast centroid
    * table, never n² pairs — but data-adaptive: cells follow the
    * embedding distribution instead of fixed hyperplanes.
    */
  /** Coarse-quantizer training on a bounded deterministic sample —
    * k-means is ITERATIVE, so fitting the full corpus is a
    * multi-pass scan of 100 TB to learn an nlist-row model. The
    * standard IVF recipe trains on a few hundred points per centroid
    * (the cells only need to follow the coarse density); transform()
    * still assigns EVERY corpus row to its cell. The sample is the
    * `target` rows with the smallest xxhash64(vec_id) — a
    * TakeOrderedAndProject: per-partition top-k then one tiny merge,
    * ONE pass over the corpus with no prior count() (the round-7
    * Bernoulli fraction needed an exact corpus count first — a full
    * extra scan of 100 TB on sources without cheap count stats), and
    * deterministic under ANY partitioning or row order (hash-order
    * selection is layout-independent where seeded Bernoulli was not).
    * The hash is uniform, so the selection is an unbiased uniform
    * sample; a corpus smaller than `target` trains on everything.
    * The sample is persisted before fit: KMeans.fit runs several
    * internal actions (feature-width probe, norms, zip) and each would
    * otherwise re-execute the sample's corpus scan — with the bounded
    * sample cached, the corpus is scanned exactly once (asserted by
    * the accumulator test in AnnSpec); the cache is `target` rows,
    * freed right after fit. Callers running BOTH ivf paths over one
    * corpus (q98) train once here and pass the model to each.
    */
  def coarseQuantizer(
      corpus: DataFrame,
      nlist: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      cheapInit: Boolean = false)
      : org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus
      .withColumn("features", array_to_vector(col("embedding")))
    val target =
      if (trainTarget > 0) trainTarget else math.max(256L * nlist, 8192L)
    val trainSet = featured
      .select(col("features"), xxhash64(col("vec_id")).as("__h"),
        col("vec_id"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(target.min(Int.MaxValue.toLong).toInt)
      .select("features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
    // cheapInit: seeded-random init + bounded Lloyd rounds instead of
    // the k-means|| default. k-means|| costs Θ(rounds · k) candidate
    // passes over the sample — at nlist = Θ(√n) (the cell-local
    // SemDeDup regime) the INIT dominates the whole fit (measured 39 s
    // of a 39 s fit at nlist=512). Coarse cells only need to follow
    // the density — the standard IVF trainer ships exactly this
    // recipe — and the seed keeps it deterministic. The ANN recall
    // contracts (q98/q117/q126) keep the default: their floors were
    // swept against k-means|| centroids.
    if (cheapInit) km.setInitMode("random").setMaxIter(10)
    try km.fit(trainSet)
    finally trainSet.unpersist(blocking = false)
  }

  /** Cell-assignment Column via the two-level (coarse-over-coarse)
    * probe ([[graft.functions.TwoLevelAssign]]) — the LINEAR-in-n
    * assignment path for nlist-grows-with-corpus regimes (cell-local
    * SemDeDup, VERDICT r10 missing #1). `KMeansModel.transform` scores
    * every row against every centroid (n·nlist — n^1.5 at the balanced
    * nlist = Θ(√n)); this groups the model's centroids under
    * ncoarse = ⌈√nlist⌉ centroids-of-centroids and each row scores
    * only the coarse table plus its `wprobe` nearest groups' members:
    * Θ(n·√nlist). The grouping runs DRIVER-side on the nlist-row
    * centroid table (a deterministic fixed-iteration Lloyd seeded by
    * strided picks — centroids are model artifacts, tiny by
    * construction) and rides into the expression as referenced arrays.
    * Assignment is approximate (a row's true nearest centroid can sit
    * in an unprobed group) — callers must tolerate any-partition
    * semantics, which cell-local SemDeDup does by design.
    */
  def twoLevelAssignCol(
      model: org.apache.spark.ml.clustering.KMeansModel,
      emb: org.apache.spark.sql.Column,
      wprobe: Int = 2): org.apache.spark.sql.Column = {
    val cents = model.clusterCenters.map(_.toArray)
    val nlist = cents.length
    val dim = cents.head.length
    val nc = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val coarse = Array.tabulate(nc)(i =>
      cents(((i.toLong * nlist) / nc).toInt).clone())
    val assign = Array.fill(nlist)(-1)
    var it = 0
    var moved = true
    while (it < 10 && moved) {
      moved = false
      var j = 0
      while (j < nlist) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < nc) {
          var d = 0.0; var k = 0
          while (k < dim) {
            val t = cents(j)(k) - coarse(c)(k); d += t * t; k += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        if (assign(j) != best) { assign(j) = best; moved = true }
        j += 1
      }
      val sums = Array.ofDim[Double](nc, dim)
      val cnt = new Array[Int](nc)
      var j2 = 0
      while (j2 < nlist) {
        val c = assign(j2); cnt(c) += 1
        var k = 0
        while (k < dim) { sums(c)(k) += cents(j2)(k); k += 1 }
        j2 += 1
      }
      var c2 = 0
      while (c2 < nc) {
        if (cnt(c2) > 0) {
          var k = 0
          while (k < dim) { coarse(c2)(k) = sums(c2)(k) / cnt(c2); k += 1 }
        }
        c2 += 1
      }
      it += 1
    }
    // group-major reorder of the fine centroids, original ids alongside
    val order = (0 until nlist).sortBy(j => (assign(j), j))
    val offsets = new Array[Int](nc + 1)
    order.foreach(j => offsets(assign(j) + 1) += 1)
    (1 to nc).foreach(c => offsets(c) += offsets(c - 1))
    val fineFlat = new Array[Double](nlist * dim)
    order.zipWithIndex.foreach { case (j, slot) =>
      System.arraycopy(cents(j), 0, fineFlat, slot * dim, dim)
    }
    graft.functions.VectorFunctions.twoLevelAssign(
      emb, coarse.flatten, fineFlat, offsets, order.toArray, dim, wprobe)
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.withColumn("features", array_to_vector(col("embedding")))
    val model = quantizer.getOrElse(
      coarseQuantizer(corpus, nlist, seed, trainTarget))
    val c = model.transform(featured)
      .select(col("vec_id"), col("embedding"),
        normSq(col("embedding")).as("nsq"), col("prediction").as("cell"))
    // tiny centroid table (nlist rows) broadcasts; per-query cell ranking
    // via exact L2: |q-c|² = |q|² - 2·q·c + |c|²
    val centroids = broadcast(spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (v, i) =>
        (i, v.toArray)
      }.toIndexedSeq).toDF("cell", "centroid"))
    val wCell = Window.partitionBy("q_id").orderBy("dist", "cell")
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        normSq(col("embedding")).as("q_nsq"))
      .crossJoin(centroids)
      .withColumn("dist",
        col("q_nsq") - lit(2.0) * dot(col("q_emb"), col("centroid")) +
          dot(col("centroid"), col("centroid")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select("q_id", "q_emb", "q_nsq", "cell")
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    c.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosineWithNorms(
        dot(col("embedding"), col("q_emb")), col("nsq"), col("q_nsq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "sim", "rank")
  }

  /** IVF with int8 scalar-quantized candidate scoring (IVF-SQ8, the
    * lite cousin of FAISS's IVF-SQ index): same coarse k-means cells
    * as [[ivfTopK]], but candidates are scored against the stored
    * INT8 codes (q105's symmetric per-vector scheme: scale = max |x|,
    * code = round(127·x/scale)) — at 100 TB the float32 embedding
    * store is the dominant cost, and the 4×-smaller code table is
    * what the candidate scan actually reads. The approximate score
    * orders a shortlist of `max(rerank, k)` candidates per query (the
    * clamp keeps the rerank stage from silently truncating the top-k
    * contract when a caller passes k > rerank); the final top-k
    * re-ranks THOSE against the exact float vectors, so the returned
    * sims are bitwise the exact cosines (the [[annTopK]] / [[ivfTopK]]
    * output contract) while the full-width candidate read touched only
    * codes. The code table stores each vector's squared norm `nsq`
    * (one more scalar in the same projection as `scale`) so the
    * approximate score that ORDERS the shortlist is a COSINE estimate
    * (approx_dot / √nsq), matching the metric the exact re-rank and
    * the output contract use — ordering by raw dot would let
    * large-norm corpus vectors crowd the rerank-bounded shortlist and
    * silently depress recall on corpora with heterogeneous embedding
    * norms (uniform-norm random gates never see that case). Same
    * bucket-join scale shape as ivfTopK; the only float-vector reads
    * are nlist centroids + the shortlist.
    */
  def ivfSq8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      rerank: Int = 64,
      quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val model = quantizer.getOrElse(
      coarseQuantizer(corpus, nlist, seed, trainTarget))
    ivfSq8Core(sq8Codes(model, corpus), centroidFrame(spark, model),
      corpus, queries, k, nprobe, rerank)
  }

  /** The quantized corpus table (vec_id, cell, scale, nsq, code) —
    * q105's symmetric int8 scheme plus the coarse cell id, one map-only
    * projection. At scale this IS the persisted code table
    * ([[writeIvfIndex]]); nsq rides along so candidate scoring can
    * normalize to a cosine estimate.
    */
  private def sq8Codes(
      model: org.apache.spark.ml.clustering.KMeansModel,
      corpus: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val scale = coalesce(
      array_max(transform(col("embedding"), v => abs(v.cast("double")))),
      lit(0d))
    val code = transform(col("embedding"), v =>
      when(col("scale") > 0d,
        round(v.cast("double") * 127d / col("scale")))
        .otherwise(0d).cast("tinyint"))
    model.transform(corpus
        .withColumn("features", array_to_vector(col("embedding"))))
      .withColumn("scale", scale)
      .select(col("vec_id"), col("prediction").as("cell"),
        col("scale"), normSq(col("embedding")).as("nsq"), code.as("code"))
  }

  /** The nlist-row centroid table of a fitted coarse quantizer. */
  private def centroidFrame(
      spark: org.apache.spark.sql.SparkSession,
      model: org.apache.spark.ml.clustering.KMeansModel): DataFrame =
    spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (v, i) =>
        (i, v.toArray)
      }.toIndexedSeq).toDF("cell", "centroid")

  /** IVF-SQ8 scoring core, shared verbatim by the in-plan build
    * ([[ivfSq8TopK]]) and the persisted-index probe ([[ivfSq8Probe]])
    * so the two paths cannot drift. `codes` is (vec_id, cell, scale,
    * nsq, code), `centroids` (cell, centroid) with nlist rows,
    * `vectors` (vec_id, embedding) — the only float-vector reads are
    * the centroids and the rerank shortlist.
    */
  private def ivfSq8Core(
      codes: DataFrame,
      centroids: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    val cent = broadcast(centroids)
    val wCell = Window.partitionBy("q_id").orderBy("dist", "cell")
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        normSq(col("embedding")).as("q_nsq"))
      .crossJoin(cent)
      .withColumn("dist",
        col("q_nsq") - lit(2.0) * dot(col("q_emb"), col("centroid")) +
          dot(col("centroid"), col("centroid")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select("q_id", "q_emb", "q_nsq", "cell")
    // approximate score from codes only: x'ᵢ = codeᵢ·scale/127, so
    // dot(x', q) = (scale/127)·dot(code, q) — one fused fold per
    // candidate over the int8 code, no float corpus read. Dividing by
    // the stored √nsq turns the dot estimate into a COSINE estimate:
    // the query norm is constant within a q_id partition so it cannot
    // change the ordering, but the corpus norm can — and the exact
    // re-rank ranks by cosine, so the shortlist must too. A zero-norm
    // vector scores 0 (its exact cosine is 0 by the same guard).
    // native graft_dot tight loop, not aggregate∘zip_with — the HOF
    // form is interpreted per element and allocates an intermediate
    // array per candidate; byte→float is exact for −127..127 codes and
    // graft_dot widens to double, so the estimate is bitwise unchanged
    // (the q169 candidate pass measured 10.4 s → 1.2 s on this swap)
    val approxDot =
      dot(col("code").cast("array<float>"), col("q_emb")) *
        col("scale") / 127d
    val approx = when(col("nsq") > 0d, approxDot / sqrt(col("nsq")))
      .otherwise(lit(0d))
    val wShort = Window.partitionBy("q_id")
      .orderBy(desc("approx"), col("vec_id"))
    val shortlist = codes.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx", approx)
      .withColumn("arank", row_number().over(wShort))
      .filter(col("arank") <= math.max(rerank, k))
      .select("q_id", "vec_id")
    // exact re-rank of the shortlist only — the sole float-vector read
    exactRerank(shortlist, vectors, queries, k)
  }

  /** Write-once IVF-SQ8 index artifacts: the build-ONCE/probe-many
    * path a real 100 TB embedding store runs (every nightly batch
    * probing a rebuilt-in-plan index would re-quantize the whole
    * corpus per query). Three tables under `name`:
    *
    *  - `<name>_codes` (vec_id, cell, scale, nsq, code), BUCKETED on
    *    `cell` — the candidate scan's join key, so every probe's
    *    codes-side join consumes the bucketed layout with ZERO
    *    exchange on the corpus side (only the tiny probe frame
    *    shuffles; asserted in IndexStoreSpec);
    *  - `<name>_centroids` (cell, centroid) — nlist rows, broadcast at
    *    probe time;
    *  - `<name>_vectors` (vec_id, embedding), BUCKETED on `vec_id` —
    *    the rerank shortlist join key, so the only float-vector table
    *    also joins exchange-free on its side.
    *
    * Returns the fitted quantizer so a caller can build comparison
    * paths against the exact same model. `path` hosts the external
    * table data; `name` prefixes the catalog table names.
    */
  def writeIvfIndex(
      corpus: DataFrame,
      name: String,
      path: String,
      nlist: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      buckets: Int = 16): org.apache.spark.ml.clustering.KMeansModel = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val model = coarseQuantizer(corpus, nlist, seed, trainTarget)
    sq8Codes(model, corpus).write
      .mode("overwrite")
      .bucketBy(buckets, "cell").sortBy("cell")
      .option("path", s"$path/codes").saveAsTable(s"${name}_codes")
    centroidFrame(spark, model).write
      .mode("overwrite")
      .option("path", s"$path/centroids").saveAsTable(s"${name}_centroids")
    corpus.select("vec_id", "embedding").write
      .mode("overwrite")
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .option("path", s"$path/vectors").saveAsTable(s"${name}_vectors")
    // staleness bookkeeping (q192): code rows (= vectors) at build
    IndexMaintenance.writeBuildMeta(spark, path,
      spark.table(s"${name}_codes").count())
    model
  }

  /** Probe a persisted [[writeIvfIndex]] index: identical semantics
    * (and bitwise-identical output, IndexStoreSpec) to [[ivfSq8TopK]]
    * over the corpus the index was built from — but the corpus-side
    * work reads the bucketed code table with no exchange and never
    * re-quantizes.
    */
  def ivfSq8Probe(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    ivfSq8Core(spark.table(s"${name}_codes"),
      spark.table(s"${name}_centroids"),
      spark.table(s"${name}_vectors"), queries, k, nprobe, rerank)
  }

  /** Semantic near-dup gate of an ingest batch against a persisted
    * [[writeIvfIndex]] store — q135's threshold rule as batch-vs-store,
    * WITHOUT refitting the quantizer, and provably EXACT: every
    * (batch `da`, stored `db`) pair with 4-dp-rounded cosine ≥ `tau`.
    *
    * What makes a THRESHOLD gate exact through a quantized store (a
    * top-k probe can hide quantization error behind an exact re-rank
    * of its shortlist; a threshold gate has no rank to hide behind):
    * the SQ8 code bounds its own error. x'ᵢ = codeᵢ·scale/127 with
    * |xᵢ − x'ᵢ| ≤ scale/254 (nearest-code rounding), so
    * |dot(x,q) − dot(x',q)| ≤ (scale/254)·‖q‖₁, and with BOTH norms
    * stored exactly in the code table,
    * |cos − cos'| ≤ (scale/254)·‖q‖₁ / (√nsq·√qnsq). A pair whose
    * code-estimated cosine plus that bound (plus the 4-dp rounding
    * half-ulp) still misses `tau` cannot pass the exact gate — so the
    * candidate scan reads ONLY the byte-code table, and survivors (a
    * thin, genuinely-near set) fetch float vectors from the bucketed
    * `_vectors` table (exchange-free on the stored side) for the
    * exact verdict. IndexStoreSpec asserts probe ≡ the in-plan exact
    * cross-pair rule. The batch×store scan rides the same B×B block
    * tiling as [[Similarity]]'s exact pair scans (bounded reducers, no
    * unsanctioned cartesian); at a 100 TB store the candidate pass
    * reads 1 byte/dim instead of 8 — the difference between a
    * page-cached scan and an IO-bound one.
    */
  def semDedupProbe(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      batch: DataFrame,
      tau: Double): DataFrame = {
    require(tau > 0d, s"semDedupProbe needs tau > 0 (zero-norm vectors " +
      s"never pair): $tau")
    graft.functions.VectorFunctions.register(spark)
    val codes = spark.table(s"${name}_codes")
      .filter(col("nsq") > 0d)
      .select(col("vec_id").as("db"), col("scale"),
        col("nsq").as("nb"), col("code"))
    val q = batch
      .select(col("vec_id").as("da"), col("embedding").as("ea"),
        normSq(col("embedding")).as("na"),
        aggregate(col("embedding"), lit(0d),
          (acc, v) => acc + abs(v.cast("double"))).as("l1a"))
      .filter(col("na") > 0d)
    // B×B tiling sized like Similarity.tiledPairSims: the per-reducer
    // store block must fit the partition budget, B² must cover the
    // cluster — one skinny count per side stands in for catalog stats
    val (ns, dim) = {
      val r = codes.agg(count(lit(1)), max(size(col("code")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val nbatch = q.count()
    val targetBytes = 64L << 20
    val bS = math.ceil(ns.toDouble * (48L + dim) / targetBytes).toInt
    val bB = math.ceil(
      nbatch.toDouble * (48L + 16L * dim) / targetBytes).toInt
    val bPar = math.ceil(math.sqrt(
      spark.sparkContext.defaultParallelism.toDouble)).toInt
    val B = math.min(256, Seq(1, bS, bB, bPar).max)
    val blocks = array((0 until B).map(lit): _*)
    val aT = q.select(col("da"), col("ea"), col("na"), col("l1a"),
      pmod(col("da"), lit(B)).cast("int").as("ba"),
      explode(blocks).as("bb"))
    val bT = codes.select(col("db"), col("scale"), col("nb"),
      // byte→float is exact for SQ8's −127..127 integers, so the
      // native dot below multiplies the same doubles the HOF fold did
      col("code").cast("array<float>").as("coded"),
      pmod(col("db"), lit(B)).cast("int").as("bb"),
      explode(blocks).as("ba"))
    // code-estimated cosine. This fold runs once per (batch × store)
    // pair — the whole candidate pass — so it uses the native
    // codegen'd graft_dot tight loop, not the aggregate∘zip_with HOF
    // form (interpreted per element + one intermediate array per pair;
    // the swap measured 10.4 s → 1.2 s on the isolated q169 pass).
    // Arithmetic is unchanged bitwise: graft_dot widens each element
    // to double and accumulates in index order, exactly like the HOF.
    val approxDot = dot(col("coded"), col("ea")) * col("scale") / 127d
    val denom = sqrt(col("na")) * sqrt(col("nb"))
    val cand = aT.join(bT, Seq("ba", "bb"))
      .filter((approxDot + col("scale") / 254d * col("l1a")) / denom
        + lit(5.1e-5) >= tau)
      .select("da", "ea", "na", "db")
    val stored = spark.table(s"${name}_vectors")
      .select(col("vec_id").as("db"), col("embedding").as("eb"))
    cand.join(stored, Seq("db"))
      .select(col("da"), col("db"),
        round(cosineWithNorms(dot(col("ea"), col("eb")),
          col("na"), normSq(col("eb"))), 4).as("sim"))
      .filter(col("sim") >= tau)
      .select("da", "db", "sim")
  }

  /** The persisted cell assignment of a [[writeIvfIndex]] artifact: the
    * (vec_id, cell) frame [[Similarity.semDedupPrunedCellLocal]] can
    * take instead of refitting its own quantizer — at a real store the
    * cells were already paid for at index-build time, and ANY partition
    * of the vectors keeps the pruned ⊆ exact guarantee (AnnSpec), so
    * reusing the artifact's partition costs nothing but saves a k-means
    * per run.
    */
  def ivfCellsOf(
      spark: org.apache.spark.sql.SparkSession,
      name: String): DataFrame =
    spark.table(s"${name}_codes").select("vec_id", "cell")

  /** A trained product quantizer: `m` subspaces of `dsub` dims, `ksub`
    * centroids each, flattened (subspace, code, dim)-major — the layout
    * [[graft.functions.PqEncode]]/[[graft.functions.PqLut]] index.
    * `rot`, when present, is a learned ORTHOGONAL rotation (OPQ, Ge et
    * al. 2013 "Optimized Product Quantization"; row-major dim×dim)
    * applied to residuals before the subspace split — codebooks then
    * live in the rotated space, the encode path rotates each residual
    * and the query LUT rotates the query ([[pqCodebooks]] derivation:
    * dot(q, Rᵀĉ) = dot(R·q, ĉ)). Orthogonality preserves distances
    * exactly, so the rerank/contract arithmetic is untouched.
    */
  final case class PqModel(m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Double], rot: Option[Array[Double]] = None)

  /** Train PQ codebooks on a bounded deterministic sample of coarse
    * RESIDUALS (x − centroid[cell]) — the FAISS IVF-PQ recipe: the
    * coarse quantizer removes the between-cell variance, so the small
    * per-subspace codebooks only have to model what's left. Like
    * [[coarseQuantizer]], training never scans more than the hash-order
    * sample (`target` smallest xxhash64(vec_id) rows — ONE
    * TakeOrderedAndProject pass, no prior count, layout-independent);
    * the k-means itself runs driver-side over the collected sample
    * (≤ target × dim doubles — megabytes), with strided deterministic
    * init and argmin ties broken to the lower id, so the fitted
    * codebooks are bit-reproducible under any corpus partitioning.
    * Empty clusters keep their previous centroid.
    */
  def pqCodebooks(
      corpus: DataFrame,
      model: org.apache.spark.ml.clustering.KMeansModel,
      m: Int = 8,
      ksub: Int = 16,
      trainTarget: Long = 0L,
      iters: Int = 15,
      opqIters: Int = 0): PqModel = {
    val centers = model.clusterCenters.map(_.toArray)
    val dim = centers.head.length
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val target =
      (if (trainTarget > 0) trainTarget else math.max(256L * ksub, 4096L))
        .min(Int.MaxValue.toLong).toInt
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    // cell assignment through the SAME cellAssign definition the
    // encode/append paths use — one nearest-cell semantics everywhere
    val sample = corpus
      .filter(col("embedding").isNotNull)
      .select(col("embedding"), xxhash64(col("vec_id")).as("__h"),
        col("vec_id"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(target)
      .select(col("embedding"),
        cellAssign(col("embedding"), centers).as("prediction"))
      .collect()
    // residuals in collection (hash) order — the deterministic training
    // set every re-fit reproduces
    val res: Array[Array[Double]] = sample.map { r =>
      val e = r.getSeq[Float](0)
      val c = centers(r.getInt(1))
      Array.tabulate(dim)(i => e(i).toDouble - c(i))
    }
    if (opqIters <= 0)
      PqModel(m, ksub, dsub, fitFlatCodebooks(res, m, ksub, dsub, iters))
    else {
      // OPQ alternating minimization (Ge et al. 2013, non-parametric
      // solver), entirely driver-side on the bounded sample: rotate →
      // refit codebooks → closed-form orthogonal Procrustes update.
      // R minimizes Σ‖R·xᵢ − ẑᵢ‖² over orthogonal R, where ẑ is the
      // current reconstruction of the rotated point: with
      // A = Σ xᵢ·ẑᵢᵀ = U·S·Vᵀ, the maximizer of tr(R·A) is R = V·Uᵀ.
      // Deterministic: fixed iteration counts, LAPACK SVD over a
      // deterministic sample.
      val n = res.length
      var rot = Array.tabulate(dim * dim)(i =>
        if (i / dim == i % dim) 1.0 else 0.0)
      def rotate(x: Array[Double]): Array[Double] = {
        val y = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var s = 0.0; var k2 = 0
          while (k2 < dim) { s += rot(i * dim + k2) * x(k2); k2 += 1 }
          y(i) = s; i += 1
        }
        y
      }
      var flat = Array.empty[Double]
      var t = 0
      while (t < opqIters) {
        val z = res.map(rotate)
        flat = fitFlatCodebooks(z, m, ksub, dsub, iters)
        if (t < opqIters - 1 && n > 0) {
          // reconstruction of each rotated point from its codes
          val zh = z.map { p =>
            val out = new Array[Double](dim)
            var j = 0
            while (j < m) {
              var best = 0; var bd = Double.MaxValue; var c = 0
              while (c < ksub) {
                val base = (j * ksub + c) * dsub
                var d = 0.0; var i = 0
                while (i < dsub) {
                  val diff = p(j * dsub + i) - flat(base + i)
                  d += diff * diff; i += 1
                }
                if (d < bd) { bd = d; best = c }
                c += 1
              }
              System.arraycopy(flat, (j * ksub + best) * dsub,
                out, j * dsub, dsub)
              j += 1
            }
            out
          }
          val a = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
          var r = 0
          while (r < n) {
            val x = res(r); val y = zh(r)
            var i = 0
            while (i < dim) {
              var k2 = 0
              while (k2 < dim) { a(i, k2) += x(i) * y(k2); k2 += 1 }
              i += 1
            }
            r += 1
          }
          val s = breeze.linalg.svd(a)
          val rNew = (s.Vt.t * s.U.t): breeze.linalg.DenseMatrix[Double]
          var i = 0
          while (i < dim) {
            var k2 = 0
            while (k2 < dim) { rot(i * dim + k2) = rNew(i, k2); k2 += 1 }
            i += 1
          }
        }
        t += 1
      }
      PqModel(m, ksub, dsub, flat, Some(rot))
    }
  }

  /** The per-subspace Lloyd fit shared by plain PQ and every OPQ
    * iteration: strided deterministic init over the (possibly rotated)
    * hash-ordered sample, fixed rounds, empty clusters keep their
    * previous centroid. Returns the (subspace, code, dim)-major flat
    * codebook array.
    */
  private def fitFlatCodebooks(
      res: Array[Array[Double]], m: Int, ksub: Int, dsub: Int,
      iters: Int): Array[Double] = {
    val n = res.length
    val flat = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      // strided init over the hash-ordered sample; a sample smaller than
      // ksub wraps (duplicate centroids collapse to dead clusters, which
      // simply never win argmin — harmless at toy sizes)
      val cb = Array.tabulate(ksub)(c =>
        if (n == 0) new Array[Double](dsub)
        else res((c.toLong * n / ksub).toInt % n)
          .slice(j * dsub, (j + 1) * dsub))
      var it = 0
      while (it < iters && n > 0) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Long](ksub)
        var r = 0
        while (r < n) {
          val p = res(r)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0
            var i = 0
            while (i < dsub) {
              val diff = p(j * dsub + i) - cb(c)(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(j * dsub + i); i += 1 }
          counts(best) += 1
          r += 1
        }
        var c = 0
        while (c < ksub) {
          if (counts(c) > 0) {
            var i = 0
            while (i < dsub) { cb(c)(i) = sums(c)(i) / counts(c); i += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < ksub) {
        System.arraycopy(cb(c), 0, flat, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    flat
  }

  /** Nearest-centroid cell id as ONE map-only column — argmin over the
    * literal centroid set of −2·x·c + |c|² (the |x|² term is constant
    * per row and cannot move the argmin), ties to the LOWER cell id via
    * struct ordering. This is the assignment definition shared by the
    * index BUILD and the index APPEND ([[appendToPqIndex]]): the append
    * path has only the persisted centroid table (no fitted
    * KMeansModel), and two independent implementations of "nearest
    * cell" would eventually disagree on some tie or rounding — so
    * there is exactly one. nlist codegen'd dots per row, no explode,
    * no window.
    */
  def cellAssign(emb: Column, centers: Array[Array[Double]]): Column = {
    val candidates = centers.zipWithIndex.map { case (c, i) =>
      var cNormSq = 0.0
      c.foreach(v => cNormSq += v * v)
      struct(
        (lit(-2.0) * dot(emb, litArray(c)) + lit(cNormSq)).as("d"),
        lit(i).as("c"))
    }
    array_min(array(candidates.toIndexedSeq: _*)).getField("c")
  }

  /** The PQ-coded corpus table (vec_id, cell, nsq, code) — one map-only
    * projection: coarse assignment ([[cellAssign]]), residual against
    * the (broadcast) cell centroid, native
    * [[graft.functions.PqEncode]]. At scale this IS the persisted code
    * table ([[writePqIndex]]): m bytes of code + two scalars per
    * vector, the 32×-smaller store the candidate scan reads instead of
    * the float corpus.
    */
  private def pqCodes(
      centers: Array[Array[Double]],
      pq: PqModel,
      corpus: DataFrame,
      centroids: DataFrame): DataFrame = {
    val rawResidual = zip_with(col("embedding"), col("centroid"),
      (a, b) => a.cast("double") - b)
    // OPQ: codebooks live in the rotated space — rotate the residual
    // before encoding (one codegen'd matvec per row)
    val residual = pq.rot.fold(rawResidual)(r =>
      graft.functions.VectorFunctions.matVec(rawResidual, r,
        pq.m * pq.dsub))
    corpus
      // ragged/null embeddings DROP from the index rather than alias:
      // zip_with pads the shorter side with nulls (PqEncode would read
      // them as 0) and cellAssign's all-null distance struct would sort
      // a wrong-dim row into cell 0 — the "plausible wrong bucket"
      // failure the LSH path's null-bucket contract exists to prevent.
      // One codegen'd size guard keeps the index's integrity instead.
      .filter(size(col("embedding")) === pq.m * pq.dsub)
      .withColumn("cell", cellAssign(col("embedding"), centers))
      .join(broadcast(centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        normSq(col("embedding")).as("nsq"),
        graft.functions.VectorFunctions.pqEncode(
          residual, pq.codebooks, pq.m, pq.ksub, pq.dsub).as("code"))
  }

  /** IVF-PQ ANN: coarse k-means cells as in [[ivfTopK]], but candidates
    * are scored by PRODUCT-QUANTIZED asymmetric distance — each corpus
    * vector stores only an m-byte code (its residual's nearest codebook
    * entry per subspace), and a query scores a candidate as
    * dot(q, centroid[cell]) + Σⱼ LUT[j][codeⱼ], where the per-query LUT
    * holds every subspace-centroid dot ([[graft.functions.PqLut]],
    * computed once on the tiny query frame). Normalizing by the stored
    * exact √nsq makes the shortlist ordering a cosine estimate (the
    * [[ivfSq8TopK]] lesson: rank by the metric the re-rank uses); the
    * final top-k re-ranks the shortlist against exact float vectors, so
    * output sims are bitwise the exact cosines. This is the FAISS-style
    * fourth path in the recall ladder — LSH / IVF-flat / IVF-SQ8 /
    * IVF-PQ — and the one whose candidate scan reads 8 bytes per
    * vector where SQ8 reads dim bytes and IVF-flat 4·dim: at a 100 TB
    * embedding store, PQ is the index that fits the scan in the page
    * cache.
    */
  /** Fit-once memo for the in-plan IVF-PQ anchor (VERDICT r14 ask #7 —
    * the q179 `pcaFit` treatment applied to the PQ/OPQ fit): the
    * coarse quantizer + codebook/rotation training is a deterministic
    * pure function of (table content, params), so q126's recall
    * contract fits ONCE per session and every later invocation —
    * including every timed bench pass after the warmup — probes the
    * memoized artifacts through [[ivfPqTopK]]'s `quantizer`/`codebooks`
    * injection points. The key carries the embeddings table's content
    * fingerprint (a regenerated corpus at the same path re-fits — the
    * ADVICE r12 staleness class) plus every training parameter; the
    * training frame is derived HERE from (s, dir) rather than taken
    * from the caller, so the key can never disagree with what was
    * trained on (a caller-supplied filtered frame would silently
    * poison or serve the shared entry — ADVICE r15). Entries are
    * bounded by distinct (corpus, params) pairs per session. A racing
    * double-compute is harmless (identical result).
    */
  private val pqFitCache = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.ml.clustering.KMeansModel, PqModel)]

  /** Session memo for the bare coarse-quantizer fit — [[pqFitMemo]]'s
    * discipline (frame derived HERE from (s, dir), fingerprint in the
    * key) for the callers that need only the KMeans model (q98's
    * recall gate, q122's cell-balance audit): the fit is a pure
    * function of (corpus, params), and re-training it on every timed
    * pass cost q98 ~30 driver-sequential KMeans jobs per pass (r17
    * profile) for a bitwise-identical model. A racing double-compute
    * is harmless (identical result).
    */
  private val coarseFitCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.ml.clustering.KMeansModel]

  def coarseFitMemo(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      nlist: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L)
      : org.apache.spark.ml.clustering.KMeansModel =
    coarseFitCache.getOrElseUpdate(
      dir + "#" + Q.tableFingerprint(s, dir, "embeddings") +
        s"#$nlist#$seed#$trainTarget",
      coarseQuantizer(
        Q.table(s, dir, "embeddings").select("vec_id", "embedding"),
        nlist, seed, trainTarget))

  def pqFitMemo(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      opqIters: Int = 0)
      : (org.apache.spark.ml.clustering.KMeansModel, PqModel) =
    pqFitCache.getOrElseUpdate(
      dir + "#" + Q.tableFingerprint(s, dir, "embeddings") +
        s"#$nlist#$m#$ksub#$seed#$trainTarget#$opqIters", {
        val corpus = Q.table(s, dir, "embeddings")
          .select("vec_id", "embedding")
        val model = coarseQuantizer(corpus, nlist, seed, trainTarget)
        (model, pqCodebooks(corpus, model, m, ksub, trainTarget,
          opqIters = opqIters))
      })

  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      rerank: Int = 64,
      quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None,
      codebooks: Option[PqModel] = None,
      opqIters: Int = 0)
      : DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val model = quantizer.getOrElse(
      coarseQuantizer(corpus, nlist, seed, trainTarget))
    val pq = codebooks.getOrElse(
      pqCodebooks(corpus, model, m, ksub, trainTarget, opqIters = opqIters))
    val centers = model.clusterCenters.map(_.toArray)
    ivfPqCore(
      pqCodes(centers, pq, corpus, centroidFrame(spark, model)),
      centroidFrame(spark, model), pq, corpus, queries, k, nprobe, rerank)
  }

  /** IVF-PQ scoring core, shared verbatim by the in-plan build
    * ([[ivfPqTopK]]) and the persisted-index probe ([[ivfPqProbe]]).
    * `codes` is (vec_id, cell, nsq, code); the only float-vector reads
    * are the nlist centroids and the rerank shortlist.
    */
  private def ivfPqCore(
      codes: DataFrame,
      centroids: DataFrame,
      pq: PqModel,
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    import graft.functions.VectorFunctions.{pqAdc, pqLut}
    val cent = broadcast(centroids)
    val wCell = Window.partitionBy("q_id").orderBy("dist", "cell")
    // the query-side frame carries the ADC LUT (m·ksub doubles, one
    // PqLut pass over the tiny query frame) and keeps the q·centroid
    // dot the cell ranking already paid — it is the first ADC term
    // OPQ: dot(q, Rᵀ·ĉ) = dot(R·q, ĉ) — the LUT is built from the
    // ROTATED query so ADC sums stay estimates of dot(q, residual)
    val lutInput = pq.rot.fold(col("embedding"))(r =>
      graft.functions.VectorFunctions.matVec(col("embedding"), r,
        pq.m * pq.dsub))
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        normSq(col("embedding")).as("q_nsq"),
        pqLut(lutInput, pq.codebooks, pq.m, pq.ksub, pq.dsub)
          .as("lut"))
      .crossJoin(cent)
      .withColumn("qc", dot(col("q_emb"), col("centroid")))
      .withColumn("dist",
        col("q_nsq") - lit(2.0) * col("qc") +
          dot(col("centroid"), col("centroid")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select("q_id", "lut", "qc", "cell")
    // candidate scan touches the m-byte code only: approximate dot =
    // qc + ADC(code, lut); dividing by the stored √nsq orders the
    // shortlist by a cosine estimate (zero-norm vectors score 0, as
    // their exact cosine does)
    val approx = when(col("nsq") > 0d,
      (col("qc") + pqAdc(col("code"), col("lut"), pq.ksub)) /
        sqrt(col("nsq"))).otherwise(lit(0d))
    val wShort = Window.partitionBy("q_id")
      .orderBy(desc("approx"), col("vec_id"))
    val shortlist = codes.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx", approx)
      .withColumn("arank", row_number().over(wShort))
      .filter(col("arank") <= math.max(rerank, k))
      .select("q_id", "vec_id")
    exactRerank(shortlist, vectors, queries, k)
  }

  /** Exact cosine re-rank of a (q_id, vec_id) shortlist — the shared
    * tail of every quantized path: the sole float-vector read, emitting
    * the common (q_id, vec_id, sim, rank) contract with bitwise-exact
    * sims.
    */
  private def exactRerank(
      shortlist: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    shortlist
      .join(vectors.select(col("vec_id"), col("embedding"),
        normSq(col("embedding")).as("nsq")), "vec_id")
      .join(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        normSq(col("embedding")).as("q_nsq")), "q_id")
      .withColumn("sim", cosineWithNorms(
        dot(col("embedding"), col("q_emb")), col("nsq"), col("q_nsq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "sim", "rank")
  }

  /** Write-once IVF-PQ index artifacts (the [[writeIvfIndex]] pattern):
    * `<name>_codes` (vec_id, cell, nsq, code) BUCKETED on `cell` so
    * probe joins consume the layout exchange-free, `<name>_centroids`
    * (nlist rows), `<name>_vectors` BUCKETED on `vec_id` for the rerank
    * join, and `<name>_pq` — ONE row holding (m, ksub, dsub, flat
    * codebooks), the whole trained quantizer, read back at probe time.
    */
  /** Re-attach a [[writeIvfIndex]] artifact in a NEW SparkSession —
    * same contract as `Dedup.registerBandIndex`: the artifact's truth
    * is the bucketed parquet under `path`, the catalog entry is
    * session state; declaring the same bucket spec the write used
    * keeps every probe exchange-free on the stored side.
    */
  def registerIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      path: String,
      buckets: Int = 16): Unit = {
    IndexCatalog.registerBucketed(spark, s"${name}_codes",
      s"$path/codes", "cell", buckets)
    IndexCatalog.registerPlain(spark, s"${name}_centroids",
      s"$path/centroids")
    IndexCatalog.registerBucketed(spark, s"${name}_vectors",
      s"$path/vectors", "vec_id", buckets)
  }

  /** [[registerIvfIndex]]'s twin for the [[writePqIndex]] artifact
    * (adds the 1-row codebook table).
    */
  def registerPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      path: String,
      buckets: Int = 16): Unit = {
    IndexCatalog.registerBucketed(spark, s"${name}_codes",
      s"$path/codes", "cell", buckets)
    IndexCatalog.registerPlain(spark, s"${name}_centroids",
      s"$path/centroids")
    IndexCatalog.registerBucketed(spark, s"${name}_vectors",
      s"$path/vectors", "vec_id", buckets)
    IndexCatalog.registerPlain(spark, s"${name}_pq", s"$path/pq")
  }

  def writePqIndex(
      corpus: DataFrame,
      name: String,
      path: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 7L,
      trainTarget: Long = 0L,
      buckets: Int = 16,
      opqIters: Int = 0)
      : (org.apache.spark.ml.clustering.KMeansModel, PqModel) = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val model = coarseQuantizer(corpus, nlist, seed, trainTarget)
    val pq = pqCodebooks(corpus, model, m, ksub, trainTarget,
      opqIters = opqIters)
    val centers = model.clusterCenters.map(_.toArray)
    pqCodes(centers, pq, corpus, centroidFrame(spark, model)).write
      .mode("overwrite")
      .bucketBy(buckets, "cell").sortBy("cell")
      .option("path", s"$path/codes").saveAsTable(s"${name}_codes")
    centroidFrame(spark, model).write
      .mode("overwrite")
      .option("path", s"$path/centroids").saveAsTable(s"${name}_centroids")
    corpus.select("vec_id", "embedding").write
      .mode("overwrite")
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .option("path", s"$path/vectors").saveAsTable(s"${name}_vectors")
    // `rot` rides in the one-row model table; None → null (a pre-OPQ
    // artifact reads back rotation-free — forward/backward compatible)
    spark.createDataFrame(Seq(
        (pq.m, pq.ksub, pq.dsub, pq.codebooks.toSeq,
          pq.rot.map(_.toSeq))))
      .toDF("m", "ksub", "dsub", "codebooks", "rot").write
      .mode("overwrite")
      .option("path", s"$path/pq").saveAsTable(s"${name}_pq")
    // staleness bookkeeping (q192): code rows (= vectors) at build
    IndexMaintenance.writeBuildMeta(spark, path,
      spark.table(s"${name}_codes").count())
    (model, pq)
  }

  /** Probe a persisted [[writePqIndex]] index — identical semantics
    * (and bitwise-identical output) to [[ivfPqTopK]] over the corpus
    * the index was built from, with the corpus-side work reading the
    * bucketed m-byte code table and never re-encoding.
    */
  def ivfPqProbe(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val pq = readPqModel(spark, name)
    ivfPqCore(spark.table(s"${name}_codes"),
      spark.table(s"${name}_centroids"),
      pq, spark.table(s"${name}_vectors"), queries, k, nprobe, rerank)
  }

  private def readPqModel(
      spark: org.apache.spark.sql.SparkSession, name: String): PqModel = {
    val t = spark.table(s"${name}_pq")
    val row = t.head()
    // pre-OPQ artifacts have no `rot` column; null rot = no rotation
    val rot =
      if (!t.columns.contains("rot") || row.isNullAt(t.columns.indexOf("rot")))
        None
      else Some(row.getSeq[Double](t.columns.indexOf("rot")).toArray)
    PqModel(row.getInt(0), row.getInt(1), row.getInt(2),
      row.getSeq[Double](3).toArray, rot)
  }

  /** Append a batch of vectors to a persisted [[writePqIndex]] index —
    * the nightly embedding-ingest loop's other half (probe the new
    * batch, then fold it in so later batches search against it). The
    * quantizer stays FROZEN: cells come from the persisted centroid
    * table through the same [[cellAssign]] definition the build used,
    * codes from the persisted codebooks — so appended rows score
    * exactly as if the original build had included them (AnnSpec
    * asserts the probe after append is bitwise-identical to an in-plan
    * build over the union with the base-trained model). Work is one
    * map-only encode of the BATCH (never re-reads the accumulated
    * corpus), and `insertInto` honors the bucket specs, so the
    * exchange-free probe property survives the append. Periodic
    * re-training when drift accumulates is a rebuild
    * ([[writePqIndex]]), not an append — the standard IVF-index
    * operational split.
    */
  def appendToPqIndex(
      batch: DataFrame, name: String): Unit = {
    val spark = batch.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val pq = readPqModel(spark, name)
    val centroids = spark.table(s"${name}_centroids")
    val centers = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    pqCodes(centers, pq, batch, centroids).write
      .mode("append").insertInto(s"${name}_codes")
    // same dim guard as the code table: a row the codes dropped must
    // not linger in the vector table as unreachable dead bytes
    batch.select("vec_id", "embedding")
      .filter(size(col("embedding")) === pq.m * pq.dsub).write
      .mode("append").insertInto(s"${name}_vectors")
  }

  /** [[appendToPqIndex]] guarded against vectors already present — the
    * REPLAY path of the streaming ANN ingest loop ([[graft.streaming
    * .IngestLedger]]): a retried micro-batch whose original attempt
    * died mid-append re-runs this, and each table receives only the
    * vec_ids it does not already hold (a blind re-append would
    * duplicate code rows and corrupt every downstream probe). Costs a
    * vec_id scan of the stored tables — replay-only by design.
    */
  def appendToPqIndexDedup(
      batch: DataFrame, name: String): Unit = {
    val spark = batch.sparkSession
    graft.functions.VectorFunctions.register(spark)
    // the guard must see current table state — a replay usually runs
    // in a different session than the appends it guards against
    // (Dedup.appendToBandIndexDedup's hazard note)
    spark.catalog.refreshTable(s"${name}_codes")
    spark.catalog.refreshTable(s"${name}_vectors")
    val pq = readPqModel(spark, name)
    val centroids = spark.table(s"${name}_centroids")
    val centers = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val inCodes = spark.table(s"${name}_codes").select("vec_id").distinct()
    pqCodes(centers, pq, batch, centroids)
      .join(inCodes, Seq("vec_id"), "left_anti")
      .write.mode("append").insertInto(s"${name}_codes")
    val inVecs = spark.table(s"${name}_vectors").select("vec_id").distinct()
    batch.select("vec_id", "embedding")
      .filter(size(col("embedding")) === pq.m * pq.dsub)
      .join(inVecs, Seq("vec_id"), "left_anti")
      .write.mode("append").insertInto(s"${name}_vectors")
  }

  /** Re-encode `corpus` from a persisted index's FROZEN artifacts
    * (centroids + codebooks read from the catalog tables) and score it
    * in-plan — the reference answer for "is the accumulated code table
    * still what a fresh encode would produce?". [[appendToPqIndex]]
    * promises probe ≡ rebuild over the union; q131 turns that spec
    * identity into a hashed contract bit.
    */
  def ivfPqRebuild(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val pq = readPqModel(spark, name)
    val centroids = spark.table(s"${name}_centroids")
    val centers = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    ivfPqCore(pqCodes(centers, pq, corpus, centroids), centroids, pq,
      corpus, queries, k, nprobe, rerank)
  }

  /** Exact brute-force top-k with the same output contract — the recall
    * baseline (broadcast the query side; map-only over the corpus).
    * The grouped ranking stays a `row_number` window deliberately: a
    * mergeable typed top-k Aggregator (map-side k-buffers, shipping
    * only partitions × queries × k rows through the exchange) was
    * built and MEASURED SLOWER at every anchor query (q117 3.1 → 4.3 s,
    * q126 4.5 → 5.6 s, q138 2.2 → 3.8 s at sf0.1) — the typed
    * groupByKey path pays per-row deserialization + tuple allocation
    * on all 40 M scored rows, which costs more than the window's
    * shuffle-and-sort of the same skinny (q_id, vec_id, sim) frame.
    * The window input is already pruned to those three columns, so the
    * exchange never carries embeddings.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nsq"))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), normSq(col("embedding")).as("q_nsq"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosineWithNorms(
        dot(col("embedding"), col("q_emb")), col("nsq"), col("q_nsq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "sim", "rank")
  }
}
