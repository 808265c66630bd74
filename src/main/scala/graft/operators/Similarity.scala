package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import Q._

/** Similarity search over the `embeddings` table (SURVEY §2B Q23 + the
  * embedding near-dup pair query). Both queries are the *exact* cosine
  * baselines, built from codegen'd higher-order functions
  * ([[graft.functions.VectorFunctions]]) — per-row folds are sequential,
  * so the IEEE doubles match the oracle's in-order sums bitwise.
  *
  * Arithmetic is staged exactly as declared (dot / (√Σa²·√Σb²)) with
  * per-vector norms computed once (never per candidate pair).
  *
  * Scale notes (100 TB): q23 broadcasts the single query vector — the big
  * side streams map-only, no shuffle; that plan is right at any scale.
  * q27's all-pairs join is the exact baseline only — the scale path is
  * the LSH-bucketed ANN in [[graft.operators.Ann]], which shuffles on
  * hyperplane-sign buckets instead of forming n² pairs.
  */
object Similarity {

  /** q135's prune radius: cosine ≥ τ (compared on the 4-dp-rounded sim)
    * marks a semantic duplicate. 0.40 is sized to the synthetic
    * embedding distribution (pairwise max ≈ 0.51), pruning ~10% so the
    * contract exercises both branches; a production corpus tunes τ per
    * embedding model. Declared BEFORE `defs`: the oracle SQL
    * interpolates it at object init, and a forward reference would
    * silently render as 0.0.
    */
  private[graft] val SemDedupTau = 0.40

  /** q179's fixed power-iteration count — declared BEFORE `defs` (the
    * oracle interpolates it at object init; a forward reference would
    * render as 0). Convergence quality at the near-isotropic λ2/λ1 is
    * irrelevant to parity — both engines walk the same trajectory.
    */
  private[graft] val PcaIters = 30

  /** q196's per-rank integer ranking-metric weights, declared BEFORE
    * `defs` (the oracle interpolates them at object init). Standard
    * binary-relevance nDCG@10 with the |rel| = 10 anchor: the ideal
    * DCG is the constant Σ_{i=1..10} 1/log2(i+1), so the whole metric
    * collapses to per-rank LITERAL contributions c(i) =
    * round(10⁶·disc(i)/IDCG) — computed ONCE here in Scala and
    * interpolated into both engines' plans, making the per-query sum
    * pure integer arithmetic (a raw double DCG sum would be
    * partial-agg-order dependent). MRR weights likewise:
    * round(10⁶/i).
    */
  private[graft] val NdcgC: Seq[Long] = {
    val disc = (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcg = disc.sum
    disc.map(d => math.round(d / idcg * 1e6))
  }
  private[graft] val MrrC: Seq[Long] = (1 to 10).map(i => math.round(1e6 / i))

  /** Sign-bit packing of an embedding into two BIGINTs (bits 1–32 and
    * 33–64) — ONE definition for every consumer (q188's Hamming ANN,
    * q196's ranking eval, the Stress hamming_scan probe), so a packing
    * change can never leave a probe measuring a different shape than
    * the query it calibrates. Integer shift-folds, exact by
    * construction.
    */
  private[graft] val PackSignLo: String =
    "aggregate(transform(" +
      "sequence(1, int(least(size(embedding), 32))), " +
      "i -> IF(element_at(embedding, i) > 0.0, " +
      "shiftleft(1L, i - 1), 0L)), 0L, (a, x) -> a + x)"
  private[graft] val PackSignHi: String =
    "IF(size(embedding) > 32, aggregate(transform(" +
      "sequence(33, size(embedding)), " +
      "i -> IF(element_at(embedding, i) > 0.0, " +
      "shiftleft(1L, i - 33), 0L)), 0L, (a, x) -> a + x), 0L)"

  /** One oracle power-iteration step on the in-scope matrix `m.m`:
    * matvec in index order, 2-norm, scale. The matvec appears twice
    * (DuckDB recursive terms can't bind a sub-CTE to the recursion) —
    * identical expression, identical value.
    */
  private def pcaStepSql(v: String): String = {
    val mv = "list_transform(m.m, rw -> list_sum(list_transform(" +
      s"range(1, len(rw) + 1), i -> rw[i] * $v[i])))"
    s"list_transform($mv, x -> x / SQRT(list_sum(list_transform($mv, " +
      "y -> y * y))))"
  }

  /** Rayleigh quotient vᵀ(Mv) for the converged unit iterate — the
    * eigenvalue read-out, in index order like the Scala loop.
    */
  private def pcaRayleighSql(v: String): String =
    s"list_sum(list_transform(range(1, m.d + 1), p -> $v[p] * " +
      "list_transform(m.m, rw -> list_sum(list_transform(" +
      s"range(1, len(rw) + 1), i -> rw[i] * $v[i])))[p]))"

  /** The shared PCA oracle chain (q179 report + q180 projection — one
    * definition so the two cannot drift): fixture → exact moments →
    * covariance → power-iteration recursions → unit components c1/c2
    * with Rayleigh eigenvalues l1/l2. Consumers append their own
    * report CTEs and must open with `WITH RECURSIVE`.
    */
  private def pcaChainSql: String =
    s"""raw AS (SELECT label,
                  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e0
                FROM embeddings),
              f AS (SELECT label, list_transform(e0, (x, i) ->
                  CASE WHEN i = len(e0) THEN 0.7 * e0[1] ELSE x END) AS e
                FROM raw),
              c AS (SELECT CAST(pos + 1 AS BIGINT) AS p, x
                FROM (SELECT UNNEST(e) AS x,
                        UNNEST(range(len(e))) AS pos FROM f) t),
              dims AS (SELECT p, COUNT(*) AS n,
                  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s1
                FROM c GROUP BY 1),
              pp AS (SELECT CAST(s.p AS BIGINT) AS p,
                  CAST(s.q AS BIGINT) AS q, s.xy AS xy
                FROM (SELECT UNNEST(flatten(
                    [[{'p': i, 'q': j, 'xy': e[i] * e[j]}
                      for j in range(i, len(e) + 1)]
                     for i in range(1, len(e) + 1)])) AS s
                  FROM f) t),
              pa AS (SELECT p, q, COUNT(*) AS n,
                  CAST(SUM(CAST(xy AS DECIMAL(18,10))) AS DOUBLE) AS sxy
                FROM pp GROUP BY 1, 2),
              cov AS (SELECT pa.p, pa.q,
                  pa.sxy / pa.n - (di.s1 / di.n) * (dj.s1 / dj.n) AS cv
                FROM pa JOIN dims di ON pa.p = di.p
                JOIN dims dj ON pa.q = dj.p),
              covfull AS (SELECT p, q, cv FROM cov
                UNION ALL SELECT q, p, cv FROM cov WHERE p <> q),
              mat AS MATERIALIZED (SELECT list(rw ORDER BY p) AS m,
                  any_value(d) AS d
                FROM (SELECT p, list(cv ORDER BY q) AS rw, COUNT(*) AS d
                  FROM covfull GROUP BY p)),
              it1(k, v) AS (
                SELECT 0, list_transform(range(1, d + 1),
                    i -> 1.0 / SQRT(d)) FROM mat
                UNION ALL
                SELECT k + 1, ${pcaStepSql("it1.v")}
                FROM it1, mat m WHERE k < $PcaIters),
              c1 AS MATERIALIZED (SELECT v FROM it1 WHERE k = $PcaIters),
              l1 AS MATERIALIZED (SELECT
                  ${pcaRayleighSql("c1.v")} AS lam FROM mat m, c1),
              mat2 AS MATERIALIZED (SELECT
                  list_transform(range(1, m.d + 1), p ->
                    list_transform(range(1, m.d + 1), q ->
                      m.m[p][q] - l1.lam * c1.v[p] * c1.v[q])) AS m,
                  m.d AS d
                FROM mat m, c1, l1),
              it2(k, v) AS (
                SELECT 0, list_transform(range(1, d + 1),
                    i -> 1.0 / SQRT(d)) FROM mat2
                UNION ALL
                SELECT k + 1, ${pcaStepSql("it2.v")}
                FROM it2, mat2 m WHERE k < $PcaIters),
              c2 AS MATERIALIZED (SELECT v FROM it2 WHERE k = $PcaIters),
              l2 AS MATERIALIZED (SELECT
                  ${pcaRayleighSql("c2.v")} AS lam FROM mat2 m, c2)"""

  /** Fitted top-2 PCA of the (fixture-adjusted) embedding table —
    * everything q179's report and q180's projection need, computed
    * once per call: dimension, per-dim means (index order), the two
    * Rayleigh eigenvalues with unit eigenvectors, and the covariance
    * trace.
    */
  private[graft] final case class PcaFit(dim: Int, means: Array[Double],
      lam1: Double, v1: Array[Double], lam2: Double, v2: Array[Double],
      trace: Double)

  /** The Spark half of the shared PCA recipe ([[pcaChainSql]]'s
    * mirror): one distributed exact-moment scan (q175's flat-triangle
    * + post-agg label spine shape, diagonal inclusive), a BOUNDED
    * collect of the ~d²/2 sums (the nlist-centroid discipline), then
    * the driver-side [[powerIteration]] with one deflation step. The
    * assembled covariance uses the oracle's exact scalar formula
    * `sxy/n - (s1p/np)*(s1q/nq)` on identical doubles, so every
    * downstream iterate is bitwise equal between engines.
    */
  /** [[pcaFit]] is a pure function of the table directory (exact
    * moments + deterministic iteration), so the fit is memoized per
    * dir for the life of the session — q179 and q180 share one moment
    * scan instead of paying it per invocation, the same
    * fit-once/probe-many discipline as the persisted ANN indexes. A
    * racing double-compute is harmless (identical result).
    */
  private val pcaFitCache =
    scala.collection.concurrent.TrieMap.empty[String, PcaFit]

  private[graft] def pcaFit(
      s: org.apache.spark.sql.SparkSession, dir: String): PcaFit =
    // key carries a content fingerprint so a regenerated table at the
    // same path re-fits instead of serving the stale memo (ADVICE r12)
    pcaFitCache.getOrElseUpdate(
      dir + "#" + tableFingerprint(s, dir, "embeddings"),
      pcaFitUncached(s, dir))

  private def pcaFitUncached(
      s: org.apache.spark.sql.SparkSession, dir: String): PcaFit = {
    import org.apache.spark.sql.types.DecimalType
    val emb = table(s, dir, "embeddings")
      .withColumn("e", covFixture(col("embedding")))
    val dim = emb.select(size(col("e"))).head().getInt(0)
    // per-dim exact first moments: (p, n, s1)
    val dims = emb
      .select(posexplode(col("e")))
      .select((col("pos") + 1).cast("long").as("p"), col("col").as("x"))
      .groupBy("p")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(18, 6))).cast("double").as("s1"))
      .collect().map(r => (r.getLong(0).toInt, (r.getLong(1), r.getDouble(2))))
      .toMap
    // upper-triangle (diag inclusive) exact product sums
    val spine = broadcast(s.createDataFrame(
      (for { i <- 1 to dim; j <- i to dim } yield (i.toLong, j.toLong))
        .zipWithIndex.map { case ((p, q), pos) => (pos, p, q) })
      .toDF("pos", "p", "q"))
    val d = size(col("e"))
    val prods = emb
      .select(posexplode(flatten(transform(sequence(lit(1), d),
        i => transform(sequence(i, d),
          j => element_at(col("e"), i) * element_at(col("e"), j))))))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("col").cast(DecimalType(18, 10))).cast("double").as("sxy"))
      .join(spine, "pos")
      .select("p", "q", "n", "sxy")
      .collect()
    val cm = Array.ofDim[Double](dim, dim)
    prods.foreach { r =>
      val (p, q) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      val (np, s1p) = dims(p + 1); val (nq, s1q) = dims(q + 1)
      val cv = r.getDouble(3) / r.getLong(2) - (s1p / np) * (s1q / nq)
      cm(p)(q) = cv; cm(q)(p) = cv
    }
    val (lam1, v1) = powerIteration(cm, PcaIters)
    val cm2 = Array.tabulate(dim, dim)((p, q) =>
      cm(p)(q) - lam1 * v1(p) * v1(q))
    val (lam2, v2) = powerIteration(cm2, PcaIters)
    var trace = 0.0
    locally { var p = 0; while (p < dim) { trace += cm(p)(p); p += 1 } }
    val means = Array.tabulate(dim) { p =>
      val (np, s1p) = dims(p + 1); s1p / np
    }
    PcaFit(dim, means, lam1, v1, lam2, v2, trace)
  }

  /** Driver-side power iteration, the bitwise mirror of the oracle's
    * recursive CTE: explicit index-ascending while-loops so every
    * partial sum associates left-to-right exactly as DuckDB's
    * `list_sum` folds its list. Returns (Rayleigh eigenvalue, unit
    * eigenvector after `iters` steps).
    */
  private[graft] def powerIteration(
      cm: Array[Array[Double]], iters: Int): (Double, Array[Double]) = {
    val d = cm.length
    def matvec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](d)
      var p = 0
      while (p < d) {
        var sAcc = 0.0; var q = 0
        while (q < d) { sAcc += cm(p)(q) * v(q); q += 1 }
        w(p) = sAcc; p += 1
      }
      w
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var t = 0
    while (t < iters) {
      val w = matvec(v)
      var ss = 0.0; var p = 0
      while (p < d) { ss += w(p) * w(p); p += 1 }
      val nrm = math.sqrt(ss)
      p = 0
      while (p < d) { w(p) = w(p) / nrm; p += 1 }
      v = w; t += 1
    }
    val w = matvec(v)
    var lam = 0.0; var p = 0
    while (p < d) { lam += v(p) * w(p); p += 1 }
    (lam, v)
  }

  /** Half-away-from-zero micro rounding on the EXACT binary double —
    * `java.math.BigDecimal(double)` keeps the full binary expansion
    * (valueOf/toString would shorten it), and HALF_UP on that equals
    * DuckDB's ROUND ties-away semantics on the identical double.
    */
  private def micro(x: Double): Long =
    new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  val defs: Seq[(String, QueryDef)] = Seq(

    // Q23: exact cosine top-5 neighbors of vec_id=1. Plan: broadcast the
    // 1-row query side; TakeOrderedAndProject for the top-k.
    "q23_similarity" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val emb = table(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 1)
          .select(col("embedding").as("q_emb"))
        emb.filter(col("vec_id") =!= 1)
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
          .orderBy(desc("sim"), col("vec_id"))
          .limit(5)
      },
      Some("""WITH q AS (SELECT embedding AS q_emb FROM embeddings
                         WHERE vec_id = 1),
              c AS (SELECT e.vec_id, e.embedding, q.q_emb
                    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 1),
              s AS (SELECT vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(embedding) AS x,
                                UNNEST(q_emb) AS y) z) AS dotab,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS na,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(q_emb) AS u(x)) AS nb
                FROM c)
              SELECT vec_id, ROUND(dotab / (SQRT(na) * SQRT(nb)), 4) AS sim
              FROM s ORDER BY sim DESC, vec_id LIMIT 5""")),

    // Embedding-cosine near-dup: global top-20 most-similar pairs —
    // the EXACT all-pairs baseline (the approximate scale path is the
    // bucketed ANN in [[Ann]]). Even a baseline must not die at scale,
    // so the n² pair set is tiled into B×B block pairs joined on an
    // EQUI key: side a carries (block(va), every bb), side b carries
    // (every ba, block(vb)), so each unordered pair meets in exactly
    // one of the B² buckets. Shuffle volume is B·n per side (bounded),
    // every reducer holds n/B×n/B pairs (no driver broadcast, no
    // single-task cartesian). The vector payload rides THROUGH the
    // explode deliberately: sims are computed and top-k-reduced inside
    // the join stage, so the n²/2 pair rows never shuffle — a skinny
    // key join with a payload rejoin would push n²/2 rows through two
    // more shuffles, which loses whenever n > 2B (always). That
    // rejoin shape is right for LSH (few survivors), wrong for an
    // exact all-pairs scan. Global top-20 is TakeOrderedAndProject.
    "q27_embedding_pairs" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        tiledPairSims(s, table(s, dir, "embeddings"))
          .orderBy(desc("sim"), col("va"), col("vb"))
          .limit(20)
      },
      Some("""WITH n AS (SELECT vec_id, embedding,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS nsq
                FROM embeddings),
              p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(a.embedding) AS x,
                                UNNEST(b.embedding) AS y) z) AS dotab,
                  a.nsq AS na, b.nsq AS nb
                FROM n a JOIN n b ON a.vec_id < b.vec_id)
              SELECT va, vb, ROUND(dotab / (SQRT(na) * SQRT(nb)), 4) AS sim
              FROM p ORDER BY sim DESC, va, vb LIMIT 20""")),

    // Q188: binary sign-code similarity (Hamming ANN) - the 256x
    // compression end of the quantization ladder (float32 -> int8
    // (q105/SQ8) -> PQ bytes (q126) -> ONE BIT per dimension): pack
    // each embedding's sign bits into two BIGINTs (dims 1-32 / 33-64
    // via integer shift-folds - every op exact), rank candidates per
    // query by Hamming distance (XOR + popcount, pure integer - ties
    // to the lower vec_id, so ranking is engine-exact with NO float in
    // the loop), and flag each retrieved row against the exact cosine
    // top-10 (Ann.bruteTopK, the q98 anchor) - the measured
    // sign-bit recall a deployment reads before buying the 256x.
    // Plan at 100 TB: the code table is 16 bytes/vector (a 100 TB
    // float corpus packs into ~0.4 TB of codes); candidate scoring is
    // two XOR+popcounts inside whole-stage codegen, queries broadcast.
    // Ranking-quality EVAL of a deployed ANN path (nDCG@10 + MRR@10
    // vs the exact-cosine anchor) — recall (q98/q117/q126/q188) says
    // how many true neighbors survive; a ranking metric says WHERE
    // they land, which is what a retrieval consumer actually feels
    // (a hit at rank 1 and a hit at rank 10 are the same recall,
    // 5.9× apart in nDCG weight). Scored here over the binary
    // sign-code Hamming ranking (q188's path — the harshest
    // quantization rung, where rank degradation is most visible).
    // Binary relevance against the exact top-10 makes the ideal DCG a
    // constant, so the metric collapses to the per-rank integer
    // weights in [[NdcgC]]/[[MrrC]] — per-query sums are exact
    // integer arithmetic in both engines. Per query: hits, nDCG
    // micros, first-hit rank, MRR micros. Plan at 100 TB: q188's
    // corpus × bounded-batch code scan plus the exact anchor (the
    // same deliberate contract cost as every recall query); the
    // metric itself is a bounded-key agg over ≤ 10 rows per query.
    "q196_ranking_eval" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val packLo = PackSignLo
        val packHi = PackSignHi
        val emb = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val packed = emb
          .withColumn("lo", expr(packLo)).withColumn("hi", expr(packHi))
          .select("vec_id", "lo", "hi")
          .managedPersist
        val q = packed.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("lo").as("qlo"),
            col("hi").as("qhi"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("ham"), col("vec_id"))
        val ranked = packed.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("ham",
            expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)")
              .cast("long"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
        val exact = Ann.bruteTopK(emb,
            emb.filter(col("vec_id") % 50 === 0), k = 10)
          .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
        ranked.join(exact, Seq("q_id", "vec_id"), "left")
          .withColumn("flag", coalesce(col("hit"), lit(0L)))
          .withColumn("c", element_at(array(NdcgC.map(lit): _*),
            col("rank").cast("int")))
          .withColumn("m", element_at(array(MrrC.map(lit): _*),
            col("rank").cast("int")))
          .groupBy("q_id")
          .agg(sum("flag").as("n_hits"),
            sum(col("flag") * col("c")).as("ndcg_micro"),
            coalesce(min(when(col("flag") === 1, col("rank"))), lit(0L))
              .as("first_hit_rank"),
            coalesce(max(when(col("flag") === 1, col("m"))), lit(0L))
              .as("mrr_micro"))
          .orderBy("q_id")
      },
      Some(s"""WITH pk AS (SELECT vec_id, embedding,
                  CAST(list_sum(list_transform(
                    range(1, LEAST(len(embedding), 32) + 1),
                    i -> CASE WHEN embedding[i] > 0.0
                      THEN 1::BIGINT << (i - 1) ELSE 0 END)) AS BIGINT)
                    AS lo,
                  CASE WHEN len(embedding) > 32
                    THEN CAST(list_sum(list_transform(
                      range(33, len(embedding) + 1),
                      i -> CASE WHEN embedding[i] > 0.0
                        THEN 1::BIGINT << (i - 33) ELSE 0 END)) AS BIGINT)
                    ELSE 0 END AS hi
                FROM embeddings),
              q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                  lo AS qlo, hi AS qhi
                FROM pk WHERE vec_id % 50 = 0),
              h AS (SELECT q.q_id, pk.vec_id,
                  CAST(bit_count(xor(pk.lo, q.qlo)) +
                    bit_count(xor(pk.hi, q.qhi)) AS BIGINT) AS ham
                FROM pk JOIN q ON pk.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY ham, vec_id) AS BIGINT) AS rank
                FROM h
                QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY ham, vec_id) <= 10),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              ex AS (SELECT q_id, vec_id FROM p
                     QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, vec_id) <= 10),
              f AS (SELECT r.q_id, r.rank,
                  CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END AS flag
                FROM r LEFT JOIN ex
                  ON ex.q_id = r.q_id AND ex.vec_id = r.vec_id)
              SELECT q_id,
                CAST(SUM(flag) AS BIGINT) AS n_hits,
                CAST(SUM(flag * ([${NdcgC.mkString(",")}])[rank])
                  AS BIGINT) AS ndcg_micro,
                CAST(COALESCE(MIN(CASE WHEN flag = 1 THEN rank END), 0)
                  AS BIGINT) AS first_hit_rank,
                CAST(COALESCE(MAX(CASE WHEN flag = 1
                    THEN ([${MrrC.mkString(",")}])[rank] END), 0)
                  AS BIGINT) AS mrr_micro
              FROM f GROUP BY q_id ORDER BY q_id""")),

    "q188_hamming_ann" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val packLo = PackSignLo
        val packHi = PackSignHi
        val emb = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val packed = emb
          .withColumn("lo", expr(packLo)).withColumn("hi", expr(packHi))
          .managedPersist
        val q = packed
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("lo").as("qlo"), col("hi").as("qhi"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("ham"), col("vec_id"))
        val top = packed.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("ham",
            expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)")
              .cast("long"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
        val brute = Ann.bruteTopK(emb,
          emb.filter(col("vec_id") % 50 === 0), k = 10)
          .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
        top.join(brute, Seq("q_id", "vec_id"), "left")
          .select(col("q_id"), col("rank"), col("vec_id"), col("ham"),
            coalesce(col("hit"), lit(0L)).as("in_exact"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH pk AS (SELECT vec_id, embedding,
                  CAST(list_sum(list_transform(
                    range(1, LEAST(len(embedding), 32) + 1),
                    i -> CASE WHEN embedding[i] > 0.0
                      THEN 1::BIGINT << (i - 1) ELSE 0 END)) AS BIGINT)
                    AS lo,
                  CASE WHEN len(embedding) > 32
                    THEN CAST(list_sum(list_transform(
                      range(33, len(embedding) + 1),
                      i -> CASE WHEN embedding[i] > 0.0
                        THEN 1::BIGINT << (i - 33) ELSE 0 END)) AS BIGINT)
                    ELSE 0 END AS hi
                FROM embeddings),
              q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                  lo AS qlo, hi AS qhi
                FROM pk WHERE vec_id % 50 = 0),
              h AS (SELECT q.q_id, pk.vec_id,
                  CAST(bit_count(xor(pk.lo, q.qlo)) +
                    bit_count(xor(pk.hi, q.qhi)) AS BIGINT) AS ham
                FROM pk, q WHERE pk.vec_id <> q.q_id),
              t AS (SELECT q_id, vec_id, ham,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY ham, vec_id) AS BIGINT) AS rank
                FROM h
                QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY ham, vec_id) <= 10),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id FROM p
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) <= 10)
              SELECT t.q_id, t.rank, t.vec_id, t.ham,
                CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END
                  AS in_exact
              FROM t LEFT JOIN r
                ON r.q_id = t.q_id AND r.vec_id = t.vec_id
              ORDER BY t.q_id, t.rank""")),

    // Elementwise vector aggregation: per-(label, position) count and
    // exact component sum — the centroid numerator (divide by n
    // downstream) behind label prototypes and IVF coarse-quantizer
    // seeding. posexplode is a generator projection (map-only); the one
    // shuffle groups on (label, pos) with partial aggregation, so width
    // × labels bounds the reducer count, not the row count. Decimal
    // sums keep the result independent of partition order.
    "q55_vector_agg" -> QueryDef(
      (s, dir) => table(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("col").cast("double"), 6), 4).cast("double")
            .as("csum"))
        .orderBy("label", "pos"),
      Some("""SELECT label, CAST(pos AS BIGINT) AS pos, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))), 4)
                  AS DOUBLE) AS csum
              FROM (SELECT label, UNNEST(embedding) AS v,
                      UNNEST(range(len(embedding))) AS pos
                    FROM embeddings) t
              GROUP BY 1, 2 ORDER BY label, pos""")),

    // Embedding-norm QA: per-label count and min/max/mean of the
    // squared L2 norm — the vector-quality scan that catches unscaled
    // or degenerate embeddings before they poison similarity search.
    // Per-row norms are sequential folds (identical doubles in both
    // engines, q23's contract); min/max compare those exact doubles
    // and the mean goes through a rounded decimal sum.
    "q95_embedding_norms" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        import graft.functions.VectorFunctions.normSq
        table(s, dir, "embeddings")
          .select(col("label"), round(normSq(col("embedding")), 6).as("nsq"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(min(col("nsq")), 4).as("min_nsq"),
            round(max(col("nsq")), 4).as("max_nsq"),
            round(round(sum(col("nsq").cast(
              org.apache.spark.sql.types.DecimalType(18, 6))), 4)
              .cast("double") / count(lit(1)), 4).as("mean_nsq"))
          .orderBy("label")
      },
      Some("""WITH n AS (SELECT label,
                  ROUND((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)), 6) AS nsq
                FROM embeddings)
              SELECT label, COUNT(*) AS n,
                ROUND(MIN(nsq), 4) AS min_nsq,
                ROUND(MAX(nsq), 4) AS max_nsq,
                ROUND(CAST(ROUND(SUM(CAST(nsq AS DECIMAL(18,6))), 4)
                  AS DOUBLE) / COUNT(*), 4) AS mean_nsq
              FROM n GROUP BY 1 ORDER BY label""")),

    // ANN recall contract (q90's pattern for the similarity sketch):
    // the exact top-10 neighbor pairs of every 10th vector come from
    // the brute-force scan ([[Ann.bruteTopK]] — broadcast query side,
    // map-only corpus, the oracle recomputes it in SQL); all three
    // approximate 100 TB paths are gated — the int8-scored IVF-SQ8
    // ([[Ann.ivfSq8TopK]]) alongside multi-table hyperplane LSH
    // ([[Ann.annTopK]]: 16 OR'd tables × 8 planes, 1-probe, ONE
    // (table, bucket) equi-join shuffle) and k-means IVF
    // ([[Ann.ivfTopK]]: 16 cells, probe 8) — must each recover ≥ 70 %
    // of those pairs. Floors are tuned with measured margin, not
    // guessed: ANN_TUNING.md records recall 0.82–0.89 (LSH; fully
    // deterministic, so the measured value IS the driver's value) and
    // 0.84–0.92 at the pinned seed (0.82–0.93 across k-means seed
    // jitter; IVF) on all three SFs, against
    // a corpus of near-uniform random vectors (top-10 neighbor cosine
    // ≈ 0.30 — the worst case for sublinear search; on a corpus with
    // real near-dup structure both paths only get easier). n_lsh /
    // n_ivf are NOT output columns — only the exact count and the
    // contract bits are hashed, so a recall IMPROVEMENT can't break
    // the compare while a collapse still does. Each path carries TWO
    // bits (the round-7 verdict's visibility ask): the 0.70 hard floor
    // (the operating contract) and a tighter `_hi` watermark floor
    // (LSH 0.75 / IVF 0.78 — under the worst measured recall in
    // ANN_TUNING.md at every SF/seed; minimum measured margin +0.044,
    // the sf0.1 IVF seed=1 row at 0.8240, visible in the table's
    // margin_hi column), so a drift from the measured 0.82+ band down
    // toward the hard floor flips the watermark bit and shows up in
    // CORRECTNESS rounds before the contract itself is in danger.
    // Matryoshka / truncated-dimension retrieval (Kusupati et al.
    // 2022's deployment question, answered on THIS corpus): how much
    // top-10 recall survives when the stored vector is cut to its
    // first d dims? This is the missing rung between the float
    // baseline and the quantization ladder (float32 → SQ8 q105 → PQ
    // q126 → 1-bit q188): dimension TRUNCATION is the cheapest
    // capacity knob a store owner has (d=16 is a 4× byte cut with
    // zero re-encoding — just a shorter scan), and the decision needs
    // the measured recall curve, not the paper's. Per d ∈ {16, 32,
    // 64}: exact cosine top-10 on the d-prefix vs the full-dim top-10
    // anchor; the d=64 row is the self-identity sanity rail (recall
    // = 10000 bp by construction in BOTH engines). Same proven
    // cross-engine arithmetic as q98 (index-order double dot, sqrt
    // product, ties by vec_id). Plan at 100 TB: each rung is the q27
    // block-tiled exact scan over a d-prefix projection — candidate
    // scans SHRINK with d, and the production use is d-truncated
    // first-stage retrieval + full-dim rerank, exactly the shortlist
    // shape the IVF paths already deploy.
    "q194_matryoshka_recall" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") % 100 === 0)
        def truncTo(df: org.apache.spark.sql.DataFrame, d: Int) =
          df.select(col("vec_id"),
            slice(col("embedding"), 1, d).as("embedding"))
        // the anchor is the 64-PREFIX top-10 on BOTH engines (the
        // oracle's t64), not the full-dim top-10 — symmetric by
        // construction, so a fixture with d ≠ 64 embeddings keeps the
        // two engines agreeing (and the d=64 self-identity rail holds
        // everywhere) instead of silently diverging (ADVICE r13). On
        // the 64-d corpus the two anchors are the same frame.
        val exact = Ann.bruteTopK(truncTo(emb, 64), truncTo(queries, 64), 10)
          .select("q_id", "vec_id").managedPersist
        val rows = Seq(16, 32, 64).map { d =>
          def trunc(df: org.apache.spark.sql.DataFrame) = truncTo(df, d)
          val topD = Ann.bruteTopK(trunc(emb), trunc(queries), 10)
            .select("q_id", "vec_id")
          val hits = exact.join(topD, Seq("q_id", "vec_id"), "left_semi")
          exact.agg(count(lit(1)).as("n_exact"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
            .crossJoin(queries.agg(count(lit(1)).as("n_queries")))
            .select(lit(d.toLong).as("d"), col("n_queries"),
              col("n_exact"), col("n_hits"),
              expr("(n_hits * 20000 + n_exact) div (2 * n_exact)")
                .as("recall_bp"))
        }
        rows.reduce(_ unionByName _).orderBy("d")
      },
      Some {
        // per-d cosine top-10 over the d-prefix — q98's proven mirror
        // arithmetic with a list_slice; t64 IS the exact anchor
        def pt(d: Int) =
          s"""p$d AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(list_slice(e.embedding, 1, $d)) AS x,
                                UNNEST(list_slice(q.q_emb, 1, $d)) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(list_slice(e.embedding, 1, $d)) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(list_slice(q.q_emb, 1, $d)) AS u(x))))
                    AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              t$d AS (SELECT q_id, vec_id FROM p$d
                      QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY sim DESC, vec_id) <= 10)"""
        def row(d: Int) =
          s"""SELECT CAST($d AS BIGINT) AS d,
                (SELECT c FROM nq) AS n_queries,
                (SELECT c FROM ne) AS n_exact,
                (SELECT c FROM h$d) AS n_hits,
                ((SELECT c FROM h$d) * 20000 + (SELECT c FROM ne)) //
                  (2 * (SELECT c FROM ne)) AS recall_bp"""
        s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                       FROM embeddings WHERE vec_id % 100 = 0),
              ${pt(64)},
              ${pt(16)},
              ${pt(32)},
              h16 AS (SELECT COUNT(*) AS c FROM t64
                      JOIN t16 USING (q_id, vec_id)),
              h32 AS (SELECT COUNT(*) AS c FROM t64
                      JOIN t32 USING (q_id, vec_id)),
              h64 AS (SELECT COUNT(*) AS c FROM t64),
              ne AS (SELECT COUNT(*) AS c FROM t64),
              nq AS (SELECT COUNT(*) AS c FROM q)
              ${row(16)}
              UNION ALL ${row(32)}
              UNION ALL ${row(64)}
              ORDER BY d"""
      }),

    "q98_ann_recall" -> QueryDef(
      (s, dir) => {
        val k = 10
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") % 10 === 0)
        // exact top-k pairs feed both semi-joins and the count — one scan
        val brute = Ann.bruteTopK(emb, queries, k).select("q_id", "vec_id")
          .managedPersist
        val lshHit = brute.join(
          Ann.annTopK(emb, queries, k, nPlanes = 8, probes = 1, tables = 16)
            .select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        // ONE coarse-quantizer fit feeds both IVF paths — they'd train
        // identical models (same corpus/seed/sample) independently;
        // memoized per (dir, fingerprint) so timed passes don't
        // re-train the identical model (r17, pqFitMemo discipline)
        val quant = Some(Ann.coarseFitMemo(s, dir, nlist = 16))
        val ivfHit = brute.join(
          Ann.ivfTopK(emb, queries, k, nlist = 16, nprobe = 8,
            quantizer = quant)
            .select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        // the int8-scored variant is gated at the same floors — its
        // measured recall is IDENTICAL to the float-scored IVF at
        // every SF (ANN_TUNING.md ivf-sq8 rows: the shortlist exact
        // re-rank absorbs the quantization error entirely)
        val sq8Hit = brute.join(
          Ann.ivfSq8TopK(emb, queries, k, nlist = 16, nprobe = 8,
            quantizer = quant)
            .select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        brute.agg(count(lit(1)).as("n_exact"))
          .crossJoin(lshHit.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(ivfHit.agg(count(lit(1)).as("n_ivf")))
          .crossJoin(sq8Hit.agg(count(lit(1)).as("n_sq8")))
          .select(col("n_exact"),
            (col("n_lsh") >= col("n_exact") * lit(0.70))
              .cast("long").as("lsh_recall_ok"),
            (col("n_ivf") >= col("n_exact") * lit(0.70))
              .cast("long").as("ivf_recall_ok"),
            (col("n_lsh") >= col("n_exact") * lit(0.75))
              .cast("long").as("lsh_recall_hi"),
            (col("n_ivf") >= col("n_exact") * lit(0.78))
              .cast("long").as("ivf_recall_hi"),
            (col("n_sq8") >= col("n_exact") * lit(0.70))
              .cast("long").as("sq8_recall_ok"),
            (col("n_sq8") >= col("n_exact") * lit(0.78))
              .cast("long").as("sq8_recall_hi"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                         FROM embeddings WHERE vec_id % 10 = 0),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id FROM p
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) <= 10)
              SELECT (SELECT COUNT(*) FROM r) AS n_exact,
                CAST(1 AS BIGINT) AS lsh_recall_ok,
                CAST(1 AS BIGINT) AS ivf_recall_ok,
                CAST(1 AS BIGINT) AS lsh_recall_hi,
                CAST(1 AS BIGINT) AS ivf_recall_hi,
                CAST(1 AS BIGINT) AS sq8_recall_ok,
                CAST(1 AS BIGINT) AS sq8_recall_hi""")),

    // Symmetric int8 embedding quantization QA — the 4× storage
    // compression every 100 TB embedding store applies before anything
    // else: per vector, scale = max |xᵢ|, qᵢ = round(127·xᵢ/scale),
    // reconstruction x'ᵢ = qᵢ·scale/127. Pure codegen'd higher-order
    // functions (transform / aggregate fold), map-only until the tiny
    // per-label agg — the plan is a single pass at any scale. Contract
    // bits (q98 style — the oracle states them, a quantizer bug fails
    // the hash):
    //   qmax_ok  — every quantized component fits int8 (|q| ≤ 127;
    //     structural: |x| ≤ scale ⇒ |127·x/scale| ≤ 127 and round
    //     can't push past it),
    //   recon_ok — every reconstruction error ≤ scale/254 + ε (the
    //     half-step bound of round; ε covers float evaluation).
    // Zero vectors quantize to all-zeros with zero error by definition
    // (the scale>0 guard keeps 0/0 out of the fold).
    "q105_embedding_quantize" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val x = col("embedding")
        // coalesce: array_max of an EMPTY embedding is null, which would
        // null both contract bits (ADVICE r7); zero scale routes the
        // empty/zero-vector path (all-zero q, zero error) instead
        val scale = coalesce(
          array_max(transform(x, v => abs(v.cast("double")))), lit(0d))
        val q = transform(x, v =>
          when(col("scale") > 0d,
            round(v.cast("double") * 127d / col("scale")))
            .otherwise(0d))
        val maxAbsQ = aggregate(col("q"), lit(0d),
          (acc, v) => greatest(acc, abs(v)))
        val maxErr = aggregate(
          zip_with(x, col("q"), (v, qi) =>
            when(col("scale") > 0d,
              abs(v.cast("double") - qi * col("scale") / 127d))
              .otherwise(0d)),
          lit(0d), (acc, v) => greatest(acc, v))
        e.withColumn("scale", scale)
          .withColumn("q", q)
          .withColumn("max_abs_q", maxAbsQ)
          .withColumn("max_err", maxErr)
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            min((col("max_abs_q") <= 127d).cast("long")).as("qmax_ok"),
            min((col("max_err") <= col("scale") / 254d + 1e-9)
              .cast("long")).as("recon_ok"))
          .orderBy("label")
      },
      Some("""SELECT label, COUNT(*) AS n_vecs,
                CAST(1 AS BIGINT) AS qmax_ok,
                CAST(1 AS BIGINT) AS recon_ok
              FROM embeddings GROUP BY label ORDER BY label""")),

    // Persisted-IVF-index recall contract — q98's gate pointed at the
    // WRITE-ONCE artifact path ([[Ann.writeIvfIndex]] → bucketed code/
    // centroid/vector tables, [[Ann.ivfSq8Probe]] reads them without
    // re-quantizing). Three bits, q98-style (the oracle computes the
    // exact count and states the bits; the Spark side must genuinely
    // measure them): the 0.70 recall floor, the 0.78 watermark, and
    // probe_eq_inplan — the probe's (q_id, vec_id, rank) set equals
    // the in-plan [[Ann.ivfSq8TopK]]'s EXACTLY (both fits are
    // deterministic: the coarse quantizer trains on the hash-ordered
    // bounded sample with a fixed seed, so index build and in-plan
    // build converge to the same model, and IndexStoreSpec asserts
    // the same bitwise identity at the API level). The index write is
    // idempotent per corpus — a bench's timed passes pay the probe,
    // not the build.
    "q117_ivf_index_recall" -> QueryDef(
      (s, dir) => {
        val k = 10
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") % 10 === 0)
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q117_$tag"
        if (!s.catalog.tableExists(s"${name}_codes")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q117-$tag")
          Ann.writeIvfIndex(emb, name, path.toString)
        }
        val brute = Ann.bruteTopK(emb, queries, k)
          .select("q_id", "vec_id").managedPersist
        val probe = Ann.ivfSq8Probe(s, name, queries, k, nprobe = 8)
          .select("q_id", "vec_id", "rank").managedPersist
        // persisted: referenced twice by the symmetric difference below —
        // without it the whole in-plan pipeline (k-means fit + corpus
        // cell assign + SQ8 encode) executes twice per run. The fit
        // comes from the session memo (r17): identical params (full
        // corpus, nlist 16, seed 7) ⇒ bitwise the model the default
        // path would train, minus ~30 sequential KMeans jobs per pass.
        val inPlan = Ann.ivfSq8TopK(emb, queries, k, nprobe = 8,
            quantizer = Some(Ann.coarseFitMemo(s, dir, nlist = 16)))
          .select("q_id", "vec_id", "rank").managedPersist
        val hit = brute.join(probe.select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        // symmetric difference: empty ⇔ identical top-k sets AND ranks
        val diff = probe.exceptAll(inPlan).union(inPlan.exceptAll(probe))
        brute.agg(count(lit(1)).as("n_exact"))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .crossJoin(diff.agg(count(lit(1)).as("n_diff")))
          .select(col("n_exact"),
            (col("n_hit") >= col("n_exact") * lit(0.70))
              .cast("long").as("probe_recall_ok"),
            (col("n_hit") >= col("n_exact") * lit(0.78))
              .cast("long").as("probe_recall_hi"),
            (col("n_diff") === 0).cast("long").as("probe_eq_inplan"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                         FROM embeddings WHERE vec_id % 10 = 0),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id FROM p
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) <= 10)
              SELECT (SELECT COUNT(*) FROM r) AS n_exact,
                CAST(1 AS BIGINT) AS probe_recall_ok,
                CAST(1 AS BIGINT) AS probe_recall_hi,
                CAST(1 AS BIGINT) AS probe_eq_inplan""")),

    // Product-quantization recall contract — the FOURTH path in the ANN
    // ladder (LSH / IVF-flat / IVF-SQ8 / IVF-PQ), gated like q117
    // against the write-once artifact ([[Ann.writePqIndex]] → bucketed
    // m-byte code table + one-row codebook table, [[Ann.ivfPqProbe]]
    // reads them without re-encoding). The index trains WITH the OPQ
    // rotation (opqIters = 8, Ge et al. 2013 — [[Ann.pqCodebooks]]):
    // even on these near-uniform random embeddings (PQ's textbook
    // worst case — isotropic residuals give the per-subspace codebooks
    // almost nothing to model) the learned rotation lifts measured
    // recall at every SF × seed (largest where it matters, sf0.1:
    // 0.648-0.659 → 0.682-0.689), so the floors rose with it:
    // ok 0.60 / hi 0.65, worst measured seed-jitter margin +0.0315
    // over hi (ANN_TUNING.md, 3 seeds × 3 SFs). Still deliberately
    // below the other paths' floors: ADC-ordering recall at fixed
    // rerank shrinks as the candidate pool grows (0.88 at sf0.01 vs
    // 0.68 at sf0.1, rerank=128) — the scale knob is the shortlist
    // FRACTION. What PQ buys for that recall: the candidate scan reads
    // 8 BYTES per corpus vector (vs 64 for SQ8, 256 for float) — at a
    // 100 TB embedding store that is the difference between a
    // page-cached scan and an IO-bound one.
    "q126_pq_index_recall" -> QueryDef(
      (s, dir) => {
        val k = 10
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") % 10 === 0)
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q126_$tag"
        if (!s.catalog.tableExists(s"${name}_codes")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q126-$tag")
          Ann.writePqIndex(emb, name, path.toString, opqIters = 8)
        }
        val brute = Ann.bruteTopK(emb, queries, k)
          .select("q_id", "vec_id").managedPersist
        val probe = Ann.ivfPqProbe(s, name, queries, k, nprobe = 8,
          rerank = 128).select("q_id", "vec_id", "rank").managedPersist
        // persisted: referenced twice by the symmetric difference below.
        // The PQ/OPQ fit comes from the session memo (VERDICT r14 ask
        // #7 — the pcaFit discipline): timed bench passes probe the
        // warmup pass's artifacts instead of re-training per pass,
        // which was the q126 sweep-variance source (the fit is the
        // only nondeterministic-DURATION stage; its RESULT is
        // deterministic either way)
        val (q126Model, q126Pq) = Ann.pqFitMemo(s, dir, opqIters = 8)
        val inPlan = Ann.ivfPqTopK(emb, queries, k, nprobe = 8,
          rerank = 128, quantizer = Some(q126Model),
          codebooks = Some(q126Pq)).select("q_id", "vec_id", "rank")
          .managedPersist
        val hit = brute.join(probe.select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        // symmetric difference: empty ⇔ identical top-k sets AND ranks
        val diff = probe.exceptAll(inPlan).union(inPlan.exceptAll(probe))
        brute.agg(count(lit(1)).as("n_exact"))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .crossJoin(diff.agg(count(lit(1)).as("n_diff")))
          .select(col("n_exact"),
            (col("n_hit") >= col("n_exact") * lit(0.60))
              .cast("long").as("probe_recall_ok"),
            (col("n_hit") >= col("n_exact") * lit(0.65))
              .cast("long").as("probe_recall_hi"),
            (col("n_diff") === 0).cast("long").as("probe_eq_inplan"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                         FROM embeddings WHERE vec_id % 10 = 0),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id FROM p
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) <= 10)
              SELECT (SELECT COUNT(*) FROM r) AS n_exact,
                CAST(1 AS BIGINT) AS probe_recall_ok,
                CAST(1 AS BIGINT) AS probe_recall_hi,
                CAST(1 AS BIGINT) AS probe_eq_inplan""")),

    // Frozen-quantizer APPEND contract — the ingest half of q126's
    // loop under the hashed gate: the index trains on the EVEN half
    // only, the odd half arrives via [[Ann.appendToPqIndex]] (encoded
    // against the persisted centroid/codebook artifacts, insertInto
    // bucket-spec-preserving), and the probe must (a) clear floors a
    // notch under the full-trained path's (ok 0.58 / hi 0.62 vs q126's
    // 0.60/0.65 — a half-stale quantizer costs a little recall:
    // measured 0.6455–0.886 across SFs × seeds with the frozen OPQ
    // rotation, ANN_TUNING.md ivf-pq-app rows) — and (b) be
    // row-identical to re-encoding the
    // whole union from the same frozen artifacts (probe_eq_rebuild:
    // the accumulated code table has not drifted from what a fresh
    // encode would produce). Queries draw from the APPENDED half
    // (vec_id % 10 = 5 is odd), so the gate exercises exactly the
    // vectors the append ingested. At 100 TB this is the nightly
    // loop's audit: append cost tracks the batch (Stress pq_append
    // flat at 10× corpus), and this bit says the cheap path is also
    // the correct one.
    "q131_pq_append_recall" -> QueryDef(
      (s, dir) => {
        val k = 10
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") % 10 === 5)
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q131_$tag"
        if (!s.catalog.tableExists(s"${name}_codes")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q131-$tag")
          // OPQ rotation trains on the even half and FREEZES with the
          // rest of the quantizer — the append encodes through the
          // persisted rotation (half-trained worst seed 0.6455 ≥ the
          // 0.62 hi floor, ANN_TUNING.md)
          Ann.writePqIndex(emb.filter(col("vec_id") % 2 === 0), name,
            path.toString, opqIters = 8)
          Ann.appendToPqIndex(emb.filter(col("vec_id") % 2 === 1), name)
        }
        val brute = Ann.bruteTopK(emb, queries, k)
          .select("q_id", "vec_id").managedPersist
        val probe = Ann.ivfPqProbe(s, name, queries, k, nprobe = 8,
          rerank = 128).select("q_id", "vec_id", "rank").managedPersist
        // persisted: referenced twice by the symmetric difference below
        val rebuilt = Ann.ivfPqRebuild(s, name, emb, queries, k,
          nprobe = 8, rerank = 128).select("q_id", "vec_id", "rank")
          .managedPersist
        val hit = brute.join(probe.select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        val diff = probe.exceptAll(rebuilt).union(rebuilt.exceptAll(probe))
        brute.agg(count(lit(1)).as("n_exact"))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .crossJoin(diff.agg(count(lit(1)).as("n_diff")))
          .select(col("n_exact"),
            (col("n_hit") >= col("n_exact") * lit(0.58))
              .cast("long").as("probe_recall_ok"),
            (col("n_hit") >= col("n_exact") * lit(0.62))
              .cast("long").as("probe_recall_hi"),
            (col("n_diff") === 0).cast("long").as("probe_eq_rebuild"))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                         FROM embeddings WHERE vec_id % 10 = 5),
              p AS (SELECT q.q_id, e.vec_id,
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(e.embedding) AS x,
                                UNNEST(q.q_emb) AS y) z)
                  / (SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(e.embedding) AS u(x))) *
                     SQRT((SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                           FROM UNNEST(q.q_emb) AS u(x)))) AS sim
                FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
              r AS (SELECT q_id, vec_id FROM p
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, vec_id) <= 10)
              SELECT (SELECT COUNT(*) FROM r) AS n_exact,
                CAST(1 AS BIGINT) AS probe_recall_ok,
                CAST(1 AS BIGINT) AS probe_recall_hi,
                CAST(1 AS BIGINT) AS probe_eq_rebuild""")),

    // PQ codebook-usage health report — q122's cell-balance scan at the
    // SUBSPACE level: after a (re)build, each of the m per-subspace
    // codebooks should actually be in use (dead codes = wasted
    // quantization capacity = fatter ADC error for the same bytes) and
    // no single code should swallow a subspace (a collapsed subspace
    // scores every candidate identically — ADC loses a whole term of
    // discrimination). One m-row report off the persisted code table:
    // per subspace, codes_used and the max-code share, as contract
    // bits (usage_ok: every code of the ksub=16 codebook used;
    // balance_ok: max code occupancy ≤ 4× the ksub-mean — measured
    // 1.11–1.66× across the three test SFs, all 16 codes used in
    // every subspace) plus the
    // independent corpus count the oracle recomputes. The scan is ONE
    // posexplode of the m-byte code column + a (subspace, code)
    // partial-agg count — bounded key space m·ksub = 128 at any corpus
    // size.
    "q132_pq_code_balance" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q132_$tag"
        if (!s.catalog.tableExists(s"${name}_codes")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q132-$tag")
          // same OPQ config as the shipping q126 index — the health
          // report must describe the codebooks that actually serve
          Ann.writePqIndex(emb, name, path.toString, opqIters = 8)
        }
        val perCode = s.table(s"${name}_codes")
          .select(posexplode(col("code")))
          .groupBy(col("pos").as("subspace"), col("col").as("c"))
          .agg(count(lit(1)).as("occ"))
        perCode.groupBy("subspace")
          .agg(count(lit(1)).as("codes_used"),
            max(col("occ")).as("max_occ"),
            sum(col("occ")).as("n_vecs"))
          .select(col("subspace").cast("long").as("subspace"),
            col("n_vecs"),
            (col("codes_used") === 16).cast("long").as("usage_ok"),
            (col("max_occ") * 16 <= col("n_vecs") * 4)
              .cast("long").as("balance_ok"))
          .orderBy("subspace")
      },
      Some("""SELECT CAST(r AS BIGINT) AS subspace,
                (SELECT COUNT(*) FROM embeddings) AS n_vecs,
                CAST(1 AS BIGINT) AS usage_ok,
                CAST(1 AS BIGINT) AS balance_ok
              FROM range(8) t(r) ORDER BY subspace""")),

    // Per-label centroid similarity matrix: the corpus-cartography scan
    // that says which semantic clusters are near-duplicates of each
    // other (candidate merge targets before mixture weighting). Each
    // label's centroid is the exact component mean — q55's decimal
    // component sums (partial-agg order can't move them) divided by the
    // label count — and the pairwise cosine runs over the REDUCED
    // |labels|-row frame only, never the corpus: at 100 TB the corpus
    // contributes one (label, pos)-keyed partial aggregation (bounded
    // by labels × dim keys) and the L² pair work is driver-free
    // broadcast-join arithmetic over L rows. Centroid arrays rebuild
    // from the component frame via an order-free sort on pos, so no
    // stage depends on shuffle order.
    "q119_centroid_similarity" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val comp = table(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .groupBy("label", "pos")
          .agg((round(dsum(col("col").cast("double"), 6), 6).cast("double") /
            count(lit(1))).as("m"))
        val cent = comp.groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
            .as("a"))
          .select(col("label"),
            transform(col("a"), x => x.getField("m")).as("c"))
        val right = cent
          .select(col("label").as("lb"), col("c").as("cb"))
        cent.select(col("label").as("la"), col("c").as("ca"))
          .join(broadcast(right), col("la") < col("lb"))
          .select(col("la"), col("lb"),
            round(cosine(col("ca"), col("cb")), 4).as("sim"))
          .orderBy(desc("sim"), col("la"), col("lb"))
          .limit(10)
      },
      Some("""WITH x AS (SELECT label, pos,
                  CAST(ROUND(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18, 6))),
                    6) AS DOUBLE) / COUNT(*) AS m
                FROM (SELECT label, UNNEST(embedding) AS v,
                    UNNEST(range(len(embedding))) AS pos FROM embeddings) t
                GROUP BY 1, 2),
              c AS (SELECT label, list(m ORDER BY pos) AS centroid
                    FROM x GROUP BY 1),
              p AS (SELECT a.label AS la, b.label AS lb,
                  (SELECT SUM(z.x * z.y)
                   FROM (SELECT UNNEST(a.centroid) AS x,
                                UNNEST(b.centroid) AS y) z) AS dotab,
                  (SELECT SUM(u.x * u.x)
                   FROM UNNEST(a.centroid) AS u(x)) AS na,
                  (SELECT SUM(u.x * u.x)
                   FROM UNNEST(b.centroid) AS u(x)) AS nb
                FROM c a JOIN c b ON a.label < b.label)
              SELECT la, lb, ROUND(dotab / (SQRT(na) * SQRT(nb)), 4) AS sim
              FROM p ORDER BY sim DESC, la, lb LIMIT 10""")),

    // IVF index health report — the cell-balance scan an ANN store runs
    // after (re)building its coarse quantizer, because cell occupancy
    // IS the probe cost model: a query probing nprobe cells scans the
    // sum of their occupancies, so one overfull cell quietly turns the
    // "scan nprobe/nlist of the corpus" promise into a full scan. The
    // k-means cell ids themselves are engine-internal (no SQL oracle
    // can reproduce the fit), so — q98's pattern — the output is the
    // independent corpus count plus contract BITS the oracle states:
    //   cells_ok   — 1 ≤ cells used ≤ nlist,
    //   occ_sum_ok — the assignment conserved rows (sum of occupancies
    //     equals the INDEPENDENT corpus count; a transform that
    //     dropped or duplicated vectors flips it),
    //   balance_ok — max occupancy ≤ 4× the mean cell load (max_occ ·
    //     nlist ≤ 4n, integer arithmetic; measured 1.30–2.37× mean
    //     across all SFs/seeds — the AnnTune cell-balance table carries
    //     the margin, same discipline as the recall floors).
    // Plan shape: the fit trains on the bounded hash-order sample
    // (never a corpus count), assignment is a map-only projection
    // against nlist broadcast centroids, and occupancy is ONE
    // partial-agg count on a ≤ nlist-key column — a single corpus pass
    // plus a skinny independent count at any scale.
    "q122_ivf_cell_balance" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.ml.functions.array_to_vector
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val nlist = 16
        // memoized fit (r17) — same model every pass by construction
        val model = Ann.coarseFitMemo(s, dir, nlist = nlist)
        val occ = model.transform(
            emb.withColumn("features", array_to_vector(col("embedding"))))
          .groupBy(col("prediction")).agg(count(lit(1)).as("occ"))
        occ.agg(count(lit(1)).as("n_cells"), sum("occ").as("occ_sum"),
            max("occ").as("max_occ"))
          .crossJoin(emb.agg(count(lit(1)).as("n_vecs")))
          .select(col("n_vecs"),
            (col("n_cells") >= 1 && col("n_cells") <= nlist)
              .cast("long").as("cells_ok"),
            (col("occ_sum") === col("n_vecs")).cast("long").as("occ_sum_ok"),
            (col("max_occ") * nlist <= col("n_vecs") * 4)
              .cast("long").as("balance_ok"))
      },
      Some("""SELECT COUNT(*) AS n_vecs,
                CAST(1 AS BIGINT) AS cells_ok,
                CAST(1 AS BIGINT) AS occ_sum_ok,
                CAST(1 AS BIGINT) AS balance_ok
              FROM embeddings""")),

    // SemDeDup — semantic (embedding-space) deduplication: a vector is
    // PRUNED when any smaller-id vector sits within cosine ≥ τ of it
    // (τ = 0.40 here, sized so the synthetic corpus prunes ~10% and
    // both branches are live); the report is the per-label prune/keep
    // summary a corpus build logs after the pass. Declared semantics
    // are the EXACT global rule — every pair consulted — which is what
    // the oracle checks; the n² pair scan rides the same B×B block
    // tiling as q27 (equi-key join, bounded reducers, sims reduced
    // in-stage — no pair rows survive to shuffle). At 100 TB the
    // approximation that makes SemDeDup linear is cell-locality: prune
    // within IVF cells only ([[semDedupPrunedCellLocal]] — same
    // arithmetic, same τ, candidate scope narrowed exactly like q98's
    // ANN paths narrow q27's exact scan; its pruned set is provably a
    // subset of this query's, asserted in AnnSpec).
    // The threshold compares the ROUNDED sim (4 dp, both engines round
    // the identical IEEE double) so the gate arithmetic is the same
    // one the declared output already commits to elsewhere.
    "q135_semdedup" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val e = table(s, dir, "embeddings")
        val pruned = tiledPairSims(s, e)
          .filter(col("sim") >= SemDedupTau)
          .select(col("vb").as("vec_id")).distinct()
          .withColumn("pruned", lit(1L))
        // no broadcast hint: the pruned set is corpus-proportional
        // (~10% of n), so the flag join must stay a key join at scale
        e.join(pruned, Seq("vec_id"), "left_outer")
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(coalesce(col("pruned"), lit(0L))).as("n_pruned"),
            round((count(lit(1)) - sum(coalesce(col("pruned"), lit(0L))))
              .cast("double") / count(lit(1)), 4).as("keep_rate"))
          .orderBy("label")
      },
      Some(s"""WITH n AS (SELECT vec_id, label, embedding,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS nsq
                FROM embeddings),
              pr AS (SELECT DISTINCT b.vec_id
                FROM n a JOIN n b ON a.vec_id < b.vec_id
                WHERE ROUND(
                    (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                     FROM (SELECT UNNEST(a.embedding) AS x,
                                  UNNEST(b.embedding) AS y) z)
                    / (SQRT(a.nsq) * SQRT(b.nsq)), 4) >= $SemDedupTau)
              SELECT label, COUNT(*) AS n_vecs,
                CAST(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM pr)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
                ROUND(CAST(COUNT(*) - SUM(CASE WHEN vec_id IN
                    (SELECT vec_id FROM pr) THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) AS keep_rate
              FROM n GROUP BY 1 ORDER BY label""")),

    // Distance-to-centroid outlier report — the embedding-QA pass that
    // catches mislabeled or corrupted vectors: per label, the top-3
    // vectors farthest (squared L2) from their label centroid. Both
    // stages use the q55 decimal discipline so the doubles are
    // bit-identical across engines: the centroid is a rounded decimal
    // sum over each dimension divided by the count, and each vector's
    // squared distance accumulates per-dim terms as DECIMAL(18,10)
    // before one rounded conversion — no order-dependent double
    // accumulation anywhere. Plan: one posexplode shuffle for the
    // (label, pos) centroid agg (a labels×dim-bounded frame,
    // broadcast back), one per-vec_id agg for the distances, one
    // per-label window over rows already partitioned by label —
    // map-side partials throughout, no pairwise work.
    "q145_centroid_outliers" -> QueryDef(
      (s, dir) => {
        val terms = table(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")))
          .withColumn("v", col("col").cast("double"))
          .managedPersist
        val cent = terms.groupBy("label", "pos")
          .agg((round(dsum(col("v"), 6), 4).cast("double") /
            count(lit(1))).as("cm"))
        val dist = terms
          .join(broadcast(cent), Seq("label", "pos"))
          .groupBy(col("vec_id"), col("label"))
          .agg(round(dsum((col("v") - col("cm")) * (col("v") - col("cm")),
            10), 6).cast("double").as("dsq"))
        val wLab = org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy(desc("dsq"), col("vec_id"))
        dist
          .withColumn("rn", row_number().over(wLab).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("label"), col("rn"), col("vec_id"),
            round(col("dsq"), 4).as("dist_sq"))
          .orderBy("label", "rn")
      },
      Some("""WITH t AS (SELECT vec_id, label,
                  CAST(UNNEST(embedding) AS DOUBLE) AS v,
                  UNNEST(range(len(embedding))) AS pos
                FROM embeddings),
              c AS (SELECT label, pos,
                  CAST(ROUND(SUM(CAST(v AS DECIMAL(18,6))), 4) AS DOUBLE)
                    / COUNT(*) AS cm
                FROM t GROUP BY 1, 2),
              d AS (SELECT vec_id, t.label,
                  CAST(ROUND(SUM(CAST((v - cm) * (v - cm)
                    AS DECIMAL(18,10))), 6) AS DOUBLE) AS dsq
                FROM t JOIN c ON c.label = t.label AND c.pos = t.pos
                GROUP BY 1, 2),
              r AS (SELECT label, vec_id, dsq,
                  ROW_NUMBER() OVER (PARTITION BY label
                    ORDER BY dsq DESC, vec_id) AS rn
                FROM d)
              SELECT label, CAST(rn AS BIGINT) AS rn, vec_id,
                ROUND(dsq, 4) AS dist_sq
              FROM r WHERE rn <= 3 ORDER BY label, rn""")),

    // Cross-modal label↔language alignment matrix — the consistency
    // check between the embedding store's cluster labels and the text
    // side's language metadata (vec_id ↔ doc_id is the cross-modal
    // key): per (label, lang) document counts plus each cell's share
    // of its label in basis points (integer-exact half-up division) —
    // a label whose mass smears across languages is either a genuinely
    // multilingual cluster or a labeling bug, and this is the scan
    // that says which labels to look at. Plan: ONE equi-join on the id
    // key (both sides shuffle-pruned to two skinny columns; at store
    // scale both sides arrive bucketed on the id and the join is
    // exchange-free) into a bounded-key (labels × langs) aggregation;
    // the per-label totals broadcast back onto the matrix frame.
    "q149_modal_alignment" -> QueryDef(
      (s, dir) => {
        val cells = table(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("label"))
          .join(table(s, dir, "documents").select(col("doc_id"), col("lang")),
            "doc_id")
          .groupBy("label", "lang").agg(count(lit(1)).as("n_docs"))
        val totals = cells.groupBy("label")
          .agg(sum("n_docs").as("n_label"))
        cells.join(broadcast(totals), "label")
          .select(col("label"), col("lang"), col("n_docs"),
            expr("(10000 * n_docs * 2 + n_label) div (2 * n_label)")
              .as("share_bps"))
          .orderBy("label", "lang")
      },
      Some("""WITH m AS (SELECT e.label, d.lang, COUNT(*) AS n_docs
                FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
                GROUP BY 1, 2),
              t AS (SELECT label, CAST(SUM(n_docs) AS BIGINT) AS n_label
                    FROM m GROUP BY 1)
              SELECT m.label, m.lang, m.n_docs,
                (10000 * m.n_docs * 2 + t.n_label) // (2 * t.n_label)
                  AS share_bps
              FROM m JOIN t ON t.label = m.label
              ORDER BY m.label, lang""")),

    // Per-DIMENSION health report over the embedding store: component
    // count, mean, and variance for every position, plus a dead-dim
    // bit (variance below 1e-4 — a dimension the encoder collapsed to
    // a constant, wasted storage and an ANN discrimination term that
    // contributes nothing). q95 is the per-VECTOR norm QA; this is the
    // per-COLUMN scan run after an encoder change or a quantization
    // step. Determinism: Σx and Σx² accumulate as decimals (order-free
    // exact), the mean/variance divisions are single IEEE ops on those
    // exact inputs (identical doubles both engines). Plan: one
    // posexplode into a dim-bounded (≤ 64-key) aggregation with
    // map-side partials — the corpus contributes exactly one shuffle of
    // partial sums, never rows.
    "q150_dim_variance" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        table(s, dir, "embeddings")
          .select(posexplode(col("embedding")))
          .select(col("pos").cast("long").as("pos"),
            col("col").cast("double").as("x"))
          .groupBy("pos")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(DecimalType(18, 6))).cast("double").as("s1"),
            sum((col("x") * col("x")).cast(DecimalType(18, 10)))
              .cast("double").as("s2"))
          .select(col("pos"), col("n"),
            round(col("s1") / col("n"), 4).as("mean_x"),
            round(col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n")), 4)
              .as("var_x"),
            (col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n")) < lit(0.0001))
              .cast("long").as("dead_dim"))
          .orderBy("pos")
      },
      Some("""WITH c AS (SELECT CAST(pos AS BIGINT) AS pos,
                  CAST(v AS DOUBLE) AS x
                FROM (SELECT UNNEST(embedding) AS v,
                        UNNEST(range(len(embedding))) AS pos
                      FROM embeddings) t),
              a AS (SELECT pos, COUNT(*) AS n,
                  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(x*x AS DECIMAL(18,10))) AS DOUBLE) AS s2
                FROM c GROUP BY 1)
              SELECT pos, n, ROUND(s1/n, 4) AS mean_x,
                ROUND(s2/n - (s1/n)*(s1/n), 4) AS var_x,
                CAST(CASE WHEN s2/n - (s1/n)*(s1/n) < 0.0001
                     THEN 1 ELSE 0 END AS BIGINT) AS dead_dim
              FROM a ORDER BY pos""")),

    // Semantic split leakage — q108's embedding twin: test-split
    // vectors (q46's md5 hash split on vec_id) with ANY train-split
    // vector at 4-dp-rounded cosine ≥ τ=0.40 are semantically leaked —
    // an eval example the model effectively saw in training even
    // though no n-gram overlaps (paraphrases, translations, re-worded
    // duplicates that q108's gram scan structurally cannot catch).
    // Per label: test count, leaked count, leak share in integer bps.
    // Plan: the pair scan rides q27/q135's block tiling (equi-key
    // join, bounded reducers, no cartesian); split assignment is a
    // map-only md5 projection; at 100 TB the scale path is the same
    // swap q135 documents — cell-local pairs via the IVF quantizer
    // (semDedupPrunedCellLocal's shape) with train/test as the two
    // probe sides.
    "q157_semantic_leakage" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val hexDig = conv(
          substring(md5(col("vec_id").cast("string")), 1, 1), 16, 10)
          .cast("long")
        val e = table(s, dir, "embeddings")
        val sp = e.select(col("vec_id"), col("label"))
          .withColumn("hd", hexDig)
          .withColumn("split",
            when(col("hd") < 12, "train")
              .when(col("hd") < 14, "val").otherwise("test"))
        val pairs = tiledPairSims(s, e)
          .filter(col("sim") >= SemDedupTau)
        // symmetric edges: the leaked test vec can sit on either side
        // of the (va < vb) pair frame
        val edges = pairs.select(col("va").as("x"), col("vb").as("y"))
          .union(pairs.select(col("vb").as("x"), col("va").as("y")))
        val leaked = edges
          .join(sp.filter(col("split") === "test")
            .select(col("vec_id").as("x")), "x")
          .join(sp.filter(col("split") === "train")
            .select(col("vec_id").as("y")), "y")
          .select(col("x").as("vec_id")).distinct()
        sp.filter(col("split") === "test")
          .join(leaked.withColumn("lk", lit(1L)), Seq("vec_id"), "left")
          .groupBy("label")
          .agg(count(lit(1)).as("n_test"),
            sum(coalesce(col("lk"), lit(0L))).as("n_leaked"))
          .withColumn("leak_bps",
            expr("(10000 * n_leaked * 2 + n_test) div (2 * n_test)"))
          .orderBy("label")
      },
      Some(s"""WITH n AS (SELECT vec_id, label, embedding,
                  strpos('0123456789abcdef',
                    substring(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1
                    AS hd,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS nsq
                FROM embeddings),
              sp AS (SELECT vec_id, label, embedding, nsq,
                  CASE WHEN hd < 12 THEN 'train'
                       WHEN hd < 14 THEN 'val' ELSE 'test' END AS split
                FROM n),
              lk AS (SELECT DISTINCT t.vec_id
                FROM sp t JOIN sp tr
                  ON t.split = 'test' AND tr.split = 'train'
                  AND ROUND(
                    (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                     FROM (SELECT UNNEST(t.embedding) AS x,
                                  UNNEST(tr.embedding) AS y) z)
                    / (SQRT(t.nsq) * SQRT(tr.nsq)), 4) >= $SemDedupTau),
              a AS (SELECT label, COUNT(*) AS n_test,
                  CAST(SUM(CASE WHEN lk.vec_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
                FROM sp LEFT JOIN lk ON sp.vec_id = lk.vec_id
                WHERE sp.split = 'test'
                GROUP BY 1)
              SELECT label, n_test, n_leaked,
                (10000 * n_leaked * 2 + n_test) // (2 * n_test)
                  AS leak_bps
              FROM a ORDER BY label""")),

    // Similarity-threshold calibration — where does τ come from before
    // anyone runs SemDeDup (q135) or sets an ANN sim floor? From this
    // scan: a 10-bin cosine histogram over all pairs of a k=100
    // hash-ordered vector sample (q107's one-pass sampling — no prior
    // count, engine-reproducible). The histogram shows where the
    // pairwise-similarity mass sits, which is the whole input to
    // choosing τ. Plan: the sample is TakeOrderedAndProject (k rows at
    // any corpus size); the pair scan is k²/2 ≈ 5,000 comparisons —
    // a BOUNDED all-pairs block independent of corpus scale (the one
    // place a cartesian is the right plan, because both sides are
    // fixed-k); the zero-filled bin spine is q92's pattern.
    "q158_sim_calibration" -> QueryDef(
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val k = 100
        val sample = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            md5(col("vec_id").cast("string")).as("hk"))
          .orderBy(col("hk"), col("vec_id")).limit(k)
          .select(col("vec_id"), col("embedding"),
            normSq(col("embedding")).as("nsq"))
          .managedPersist
        val a = sample.select(col("vec_id").as("va"),
          col("embedding").as("ea"), col("nsq").as("na"))
        val b = sample.select(col("vec_id").as("vb"),
          col("embedding").as("eb"), col("nsq").as("nb"))
        val binned = a.crossJoin(b).filter(col("va") < col("vb"))
          .select(round(
            expr("graft_dot(ea, eb)") / (sqrt(col("na")) * sqrt(col("nb"))),
            4).as("sim"))
          .select(least(floor((col("sim") + 1.0) * 5), lit(9.0))
            .cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        s.range(0, 10).toDF("bin")
          .join(binned, Seq("bin"), "left")
          .select(col("bin"),
            round(lit(-1.0) + col("bin") * 0.2, 1).as("lo"),
            round(lit(-1.0) + (col("bin") + 1) * 0.2, 1).as("hi"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .orderBy("bin")
      },
      Some("""WITH sm AS (SELECT vec_id, embedding,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS nsq
                FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 100),
              pr AS (SELECT ROUND(
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(a.embedding) AS x,
                                UNNEST(b.embedding) AS y) z)
                  / (SQRT(a.nsq) * SQRT(b.nsq)), 4) AS sim
                FROM sm a JOIN sm b ON a.vec_id < b.vec_id),
              bn AS (SELECT LEAST(CAST(FLOOR((sim + 1.0) * 5) AS BIGINT),
                       9) AS bin, COUNT(*) AS n_pairs
                     FROM pr GROUP BY 1)
              SELECT r.bin, ROUND(-1.0 + r.bin * 0.2, 1) AS lo,
                ROUND(-1.0 + (r.bin + 1) * 0.2, 1) AS hi,
                COALESCE(bn.n_pairs, 0) AS n_pairs
              FROM (SELECT CAST(range AS BIGINT) AS bin FROM range(10)) r
              LEFT JOIN bn ON bn.bin = r.bin
              ORDER BY r.bin""")),

    // Exact vector duplicates — q22's rule on the EMBEDDING store:
    // bitwise-identical vectors stored more than once (a re-encoded
    // batch, a default-vector bug, a retried writer) waste space and
    // bias every ANN/centroid statistic toward the duplicated points.
    // Per label: stored rows, distinct vectors, duplicate rows.
    // Fixture (q136's pattern): every 7th vector re-appears — the
    // retried-writer copy — because the synthetic store has no natural
    // byte-identical vectors. Plan: ONE partial-agg shuffle keyed on
    // (label, embedding); duplicates collapse map-side. At a 100 TB
    // store the group key is the 16-byte content digest (q136's
    // content-addressed rule) instead of the raw vector — identical
    // semantics absent md5 collisions, 16 bytes shuffled per vector.
    "q163_exact_vector_dups" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
          .select("vec_id", "label", "embedding")
        val stored = e.unionByName(e.filter(col("vec_id") % 7 === 0))
        stored.groupBy("label", "embedding")
          .agg(count(lit(1)).as("n"))
          .groupBy("label")
          .agg(sum("n").as("n_vecs"),
            count(lit(1)).as("n_distinct"),
            sum(col("n") - 1).as("n_dup_rows"))
          .orderBy("label")
      },
      Some("""WITH p AS (SELECT label, embedding FROM embeddings
                UNION ALL
                SELECT label, embedding FROM embeddings
                WHERE vec_id % 7 = 0),
              per AS (SELECT label, embedding, COUNT(*) AS n
                      FROM p GROUP BY 1, 2)
              SELECT label, CAST(SUM(n) AS BIGINT) AS n_vecs,
                COUNT(*) AS n_distinct,
                CAST(SUM(n - 1) AS BIGINT) AS n_dup_rows
              FROM per GROUP BY 1 ORDER BY label""")),

    // Incremental SemDeDup — q135's threshold rule as a batch-vs-store
    // probe of the persisted IVF artifact ([[Ann.writeIvfIndex]] on the
    // EVEN half; the ODD half is the ingest batch), the nightly loop's
    // semantic gate: which batch vectors duplicate something already in
    // the store, at 4-dp-rounded cosine ≥ τ — WITHOUT refitting the
    // quantizer. The probe is EXACT, not approximate: the SQ8 code
    // table bounds its own quantization error ([[Ann.semDedupProbe]] —
    // estimate + (scale/254)·‖q‖₁/(√nsq·√qnsq) is a sound upper bound
    // on the true cosine), so the candidate scan reads only byte
    // codes, survivors re-verify against the bucketed float table, and
    // the output hashes against DuckDB's brute-force cross-half pair
    // scan. Like q116/q117, the index build is idempotent per corpus —
    // a bench's timed passes pay the probe, not the build. At 100 TB:
    // the candidate pass streams 1 byte/dim of the store through the
    // bounded-reducer block join (a threshold gate must consult every
    // stored code — the byte table is what makes that scan affordable),
    // float-vector reads are bounded by TRUE near-duplication and ride
    // the bucketed vec_id layout exchange-free.
    "q169_semdedup_probe" -> QueryDef(
      (s, dir) => {
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q169_$tag"
        if (!s.catalog.tableExists(s"${name}_codes")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q169-$tag")
          Ann.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), name,
            path.toString)
        }
        Ann.semDedupProbe(s, name, emb.filter(col("vec_id") % 2 === 1),
          SemDedupTau)
          .orderBy("da", "db")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
                  (SELECT SUM(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE))
                   FROM UNNEST(embedding) AS u(x)) AS nsq
                FROM embeddings)
              SELECT a.vec_id AS da, b.vec_id AS db,
                ROUND(
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(a.embedding) AS x,
                                UNNEST(b.embedding) AS y) z)
                  / (SQRT(a.nsq) * SQRT(b.nsq)), 4) AS sim
              FROM n a JOIN n b
                ON a.vec_id % 2 = 1 AND b.vec_id % 2 = 0
              WHERE ROUND(
                  (SELECT SUM(CAST(z.x AS DOUBLE) * CAST(z.y AS DOUBLE))
                   FROM (SELECT UNNEST(a.embedding) AS x,
                                UNNEST(b.embedding) AS y) z)
                  / (SQRT(a.nsq) * SQRT(b.nsq)), 4) >= $SemDedupTau
              ORDER BY da, db""")),

    // Embedding dimension-COVARIANCE report — q150's per-dim variance
    // answers "is a dimension dead"; this answers "are two dimensions
    // REDUNDANT" (an encoder that learned the same feature twice, a
    // projection bug copying a component): top-20 dimension pairs by
    // |covariance|, with the correlation and a redundant bit at
    // |corr| ≥ 0.5. Accumulation is q150's exactness recipe — products
    // cast to DECIMAL(18,10) before SUM (order-free exact), single
    // IEEE ops on the exact sums after — and the report cut orders by
    // the ROUNDED |cov| with a (p, q) tie-break, so both engines cut
    // the same 20 rows. Declared fixture (the corpus is near-isotropic
    // by construction, q163's discipline): the LAST dimension is
    // rewritten to 0.7 × dim 1, making pair (1, d) exactly correlated
    // — the redundant branch is live and its corr rounds to 1.0. Plan
    // at 100 TB: the d²/2 pair products are an in-row generator
    // (explode of a per-row built array) into a 2016-key hash agg —
    // partial aggregation collapses every partition to ≤ d²/2 rows
    // before the one skinny shuffle; the per-dim moments join in as a
    // 64-row broadcast. No pair of ROWS is ever formed — only pairs of
    // DIMENSIONS.
    "q175_dim_covariance" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        // spread BEFORE the n·d²/2 generator: the embeddings parquet
        // reads as one split (single row group), which serialized the
        // whole pair-product explode + decimal partial agg onto one
        // core (r17; the Q.spread no-op-at-scale contract)
        val emb = spread(table(s, dir, "embeddings"))
          .withColumn("e", covFixture(col("embedding")))
        // the 64-row moment frame feeds BOTH broadcast joins (p side
        // and q side); without the cut the n·d moment scan ran twice
        val dims = emb
          .select(posexplode(col("e")))
          .select((col("pos") + 1).cast("long").as("p"),
            col("col").as("x"))
          .groupBy("p")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(DecimalType(18, 6))).cast("double").as("s1"),
            sum((col("x") * col("x")).cast(DecimalType(18, 10)))
              .cast("double").as("s2"))
          .select(col("p"), col("n"), (col("s1") / col("n")).as("mean"),
            (col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n"))).as("variance"))
          .localCheckpoint(true)
        // the pair labels (p, q) are NOT carried per pair — the flat
        // product array explodes to (pos, xy) alone and the compact
        // triangular position joins its label back AFTER the 2016-key
        // agg via a driver-built spine (d is one bounded head() on the
        // first row). Carrying a 3-field struct per pair instead
        // measured 7.7 s vs 6.3 s on the isolated sf0.1 pass (1.2×);
        // the remaining cost is the declared n·d²/2 generate + the
        // exact-decimal partial agg itself — linear in n, and the agg
        // collapses in-partition so the shuffle stays 2016 keys.
        // d off the checkpointed moment frame (one tiny job) instead of
        // a separate parquet scan + fixture evaluation for one row
        val dim = dims.count().toInt
        val spine = broadcast(s.createDataFrame(
          (for {
            i <- 1 until dim; j <- (i + 1) to dim
          } yield (i.toLong, j.toLong)).zipWithIndex
            .map { case ((p, q), pos) => (pos, p, q) }
        ).toDF("pos", "p", "q"))
        val d = size(col("e"))
        val pairs = emb
          .select(posexplode(flatten(transform(sequence(lit(1), d - 1),
            i => transform(sequence(i + 1, d),
              j => element_at(col("e"), i) * element_at(col("e"), j))))))
          .groupBy("pos")
          .agg(count(lit(1)).as("n"),
            sum(col("col").cast(DecimalType(18, 10))).cast("double")
              .as("sxy"))
          .join(spine, "pos")
        pairs
          .join(broadcast(dims.select(col("p"), col("mean").as("mp"),
            col("variance").as("vp"))), "p")
          .join(broadcast(dims.select(col("p").as("q"),
            col("mean").as("mq"), col("variance").as("vq"))), "q")
          .withColumn("cov", col("sxy") / col("n") - col("mp") * col("mq"))
          .withColumn("corr", col("cov") / sqrt(col("vp") * col("vq")))
          .select(col("p"), col("q"), col("n"),
            round(col("cov"), 4).as("cov"),
            round(col("corr"), 4).as("corr"),
            (abs(col("corr")) >= 0.5).cast("long").as("redundant"))
          .orderBy(round(abs(col("cov")), 4).desc, col("p"), col("q"))
          .limit(20)
      },
      Some("""WITH raw AS (SELECT
                  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e0
                FROM embeddings),
              f AS (SELECT list_transform(e0, (x, i) ->
                  CASE WHEN i = len(e0) THEN 0.7 * e0[1] ELSE x END) AS e
                FROM raw),
              c AS (SELECT CAST(pos + 1 AS BIGINT) AS p, x
                FROM (SELECT UNNEST(e) AS x,
                        UNNEST(range(len(e))) AS pos FROM f) t),
              dims AS (SELECT p, COUNT(*) AS n,
                  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(x*x AS DECIMAL(18,10))) AS DOUBLE) AS s2
                FROM c GROUP BY 1),
              m AS (SELECT p, n, s1/n AS mean,
                  s2/n - (s1/n)*(s1/n) AS variance FROM dims),
              pp AS (SELECT CAST(s.p AS BIGINT) AS p,
                  CAST(s.q AS BIGINT) AS q, s.xy AS xy
                FROM (SELECT UNNEST(flatten(
                    [[{'p': i, 'q': j, 'xy': e[i] * e[j]}
                      for j in range(i + 1, len(e) + 1)]
                     for i in range(1, len(e))])) AS s
                  FROM f) t),
              pa AS (SELECT p, q, COUNT(*) AS n,
                  CAST(SUM(CAST(xy AS DECIMAL(18,10))) AS DOUBLE) AS sxy
                FROM pp GROUP BY 1, 2),
              j AS (SELECT pa.p, pa.q, pa.n,
                  pa.sxy / pa.n - mi.mean * mj.mean AS cov,
                  (pa.sxy / pa.n - mi.mean * mj.mean) /
                    SQRT(mi.variance * mj.variance) AS corr
                FROM pa JOIN m mi ON pa.p = mi.p JOIN m mj ON pa.q = mj.p)
              SELECT p, q, n, ROUND(cov, 4) AS cov, ROUND(corr, 4) AS corr,
                CAST(CASE WHEN ABS(corr) >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
                  AS redundant
              FROM j
              ORDER BY ROUND(ABS(cov), 4) DESC, p, q LIMIT 20""")),

    // PCA of the embedding space via POWER ITERATION on the covariance
    // matrix (top-2 components with deflation) — the dimensionality-
    // reduction / whitening prerequisite q175's covariance report
    // feeds: eigenvalue, explained-variance ratio, and dominant
    // loading per component. Exactness by construction, not by luck:
    // the covariance moments are q175's order-free exact-decimal sums
    // (identical doubles in both engines), and the iteration itself —
    // 30 steps of matvec → 2-norm → scale, then one Rayleigh quotient
    // — is pure sequential IEEE arithmetic run in index order on those
    // identical inputs, so every iterate is BITWISE equal between the
    // Scala driver loop and the oracle's recursive CTE (verified
    // bitwise at prototype time, then hash-gated every round; the
    // near-tie λ2/λ1 ≈ 0.9 convergence rate is irrelevant to parity —
    // both engines walk the same trajectory). Micro-rounding at the
    // report edge only. Plan at 100 TB: the corpus-sized work is the
    // one moment scan (n·d²/2 in-row products into a ~2 k-key partial
    // agg — q175's measured shape); the d×d matrix (d = 64 → 4 k
    // doubles) is a BOUNDED collect like the nlist centroid pulls
    // (`Ann.scala`), and the driver iteration is O(d²·iters) ≈ 250 k
    // flops — independent of corpus size. The oracle mirrors with
    // MATERIALIZED CTEs (without them DuckDB inlines the recursion's
    // upstream and re-runs the corpus scan per reference — measured
    // hang at prototype time; 0.8 s materialized).
    "q179_pca_power" -> QueryDef(
      (s, dir) => {
        val fit = pcaFit(s, dir)
        def row(k: Long, lam: Double, v: Array[Double]) = {
          var td = 0; var p = 1
          while (p < fit.dim) {
            if (math.abs(v(p)) > math.abs(v(td))) td = p; p += 1
          }
          (k, micro(lam), micro(lam / fit.trace), (td + 1).toLong,
            micro(math.abs(v(td))))
        }
        s.createDataFrame(
          Seq(row(1L, fit.lam1, fit.v1), row(2L, fit.lam2, fit.v2)))
          .toDF("component", "eigenvalue_micro", "evr_micro", "top_dim",
            "top_loading_micro")
      },
      Some(s"""WITH RECURSIVE $pcaChainSql,
              tr AS (SELECT list_sum(list_transform(range(1, m.d + 1),
                  p -> m.m[p][p])) AS trace FROM mat m),
              comps AS (SELECT 1 AS component, l1.lam AS lam, c1.v AS v
                  FROM l1, c1
                UNION ALL SELECT 2, l2.lam, c2.v FROM l2, c2),
              canon AS (SELECT component, lam,
                  list_position(list_transform(v, x -> ABS(x)),
                    list_max(list_transform(v, x -> ABS(x)))) AS td, v
                FROM comps)
              SELECT CAST(component AS BIGINT) AS component,
                CAST(ROUND(lam * 1000000) AS BIGINT) AS eigenvalue_micro,
                CAST(ROUND(lam / tr.trace * 1000000) AS BIGINT)
                  AS evr_micro,
                CAST(td AS BIGINT) AS top_dim,
                CAST(ROUND(ABS(v[td]) * 1000000) AS BIGINT)
                  AS top_loading_micro
              FROM canon, tr ORDER BY component""")),

    // Per-label cluster geometry in PC space — q179's components put
    // to work: every embedding is mean-centered and projected onto the
    // top-2 principal axes, and the per-label occupancy (count, summed
    // coordinates, bounding extents in integer micros) reports how the
    // labeled clusters separate in the reduced plane — the 2-D
    // "is the labeling visible to the encoder" diagnostic a corpus
    // curator reads before trusting label-stratified sampling.
    // Determinism: projection = in-order fold dot(e, v) minus the
    // in-order centering constant dot(mean, v) (the LINEAR form is
    // declared — both engines compute dot(e,v) − c, not Σ(e−m)v), on
    // the bitwise-identical components q179 establishes; per-row
    // quantization is FLOOR to micros (floor of identical doubles has
    // no tie semantics at all), and everything after is integer
    // aggregation. Plan at 100 TB: pcaFit's one moment scan, then a
    // map-only project + single partial-agg shuffle on label — the
    // driver contributes two 64-double literals to the plan.
    "q180_pc_occupancy" -> QueryDef(
      (s, dir) => pcOccupancy(s, dir, pcaFit(s, dir)),
      Some(pcOccupancySql)),

    // Q190: the PCA fit as a PERSISTED artifact — the sixth member of
    // the write-once/probe-many store family (bands, grams, IVF, PQ,
    // spans, now PCA): the fitted means/components/eigenvalues write
    // to a 3-row parquet table ([[writePcaStore]]), a probe session
    // re-reads them ([[pcaFitFromStore]] — doubles round-trip parquet
    // exactly) and projects WITHOUT refitting, so the occupancy report
    // is bitwise q180's (the oracle IS q180's SQL — one definition).
    // IndexStoreSpec additionally proves the drop-table/register
    // re-attach path ([[registerPcaStore]]) in the q126 discipline.
    // At 100 TB the fit's one moment scan happens once per corpus
    // release; every downstream projection job reads 3 rows.
    "q190_pc_store_occupancy" -> QueryDef(
      (s, dir) => {
        val tag = s"${IndexCatalog.dirTag(dir)}_" +
          IndexCatalog.fpTag(tableFingerprint(s, dir, "embeddings"))
        val name = s"graft_q190_$tag"
        if (!s.catalog.tableExists(s"${name}_pca")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q190-$tag")
          writePcaStore(s, pcaFit(s, dir), name, path.toString)
        }
        pcOccupancy(s, dir, pcaFitFromStore(s, name))
      },
      Some(pcOccupancySql))
  )

  /** The q180/q190 occupancy report under a given fit: mean-centered
    * projection onto the top-2 components as plan literals (the
    * declared LINEAR form dot(e,v) − dot(mean,v)), FLOOR-micro
    * per-row quantization, integer per-label aggregation.
    */
  private def pcOccupancy(s: org.apache.spark.sql.SparkSession,
      dir: String, fit: PcaFit): org.apache.spark.sql.DataFrame = {
    var cc1 = 0.0; var cc2 = 0.0
    locally {
      var i = 0
      while (i < fit.dim) {
        cc1 += fit.means(i) * fit.v1(i)
        cc2 += fit.means(i) * fit.v2(i)
        i += 1
      }
    }
    def proj(v: Array[Double], cc: Double)
        : org.apache.spark.sql.Column = {
      val vlit = array(v.map(lit): _*)
      floor((aggregate(zip_with(col("e"), vlit, (x, y) => x * y),
        lit(0.0), (acc, z) => acc + z) - cc) * 1e6).cast("long")
    }
    table(s, dir, "embeddings")
      .withColumn("e", covFixture(col("embedding")))
      .select(col("label").cast("long").as("label"),
        proj(fit.v1, cc1).as("p1"), proj(fit.v2, cc2).as("p2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum("p1").as("sum_pc1_micro"),
        min("p1").as("min_pc1_micro"),
        max("p1").as("max_pc1_micro"),
        sum("p2").as("sum_pc2_micro"),
        min("p2").as("min_pc2_micro"),
        max("p2").as("max_pc2_micro"))
      .orderBy("label")
  }

  /** Shared q180/q190 oracle — one definition, so the in-plan fit and
    * the store round-trip are held to the identical hash.
    */
  private def pcOccupancySql: String =
    s"""WITH RECURSIVE $pcaChainSql,
              ml AS MATERIALIZED (SELECT list(s1 / n ORDER BY p) AS mv
                FROM dims),
              cc AS MATERIALIZED (SELECT
                  list_sum(list_transform(range(1, len(c1.v) + 1),
                    i -> ml.mv[i] * c1.v[i])) AS c1c,
                  list_sum(list_transform(range(1, len(c2.v) + 1),
                    i -> ml.mv[i] * c2.v[i])) AS c2c
                FROM ml, c1, c2),
              pcj AS (SELECT CAST(f.label AS BIGINT) AS label,
                  CAST(FLOOR((list_sum(list_transform(
                      range(1, len(f.e) + 1), i -> f.e[i] * c1.v[i]))
                    - cc.c1c) * 1000000) AS BIGINT) AS p1,
                  CAST(FLOOR((list_sum(list_transform(
                      range(1, len(f.e) + 1), i -> f.e[i] * c2.v[i]))
                    - cc.c2c) * 1000000) AS BIGINT) AS p2
                FROM f, c1, c2, cc)
              SELECT label, COUNT(*) AS n,
                CAST(SUM(p1) AS BIGINT) AS sum_pc1_micro,
                MIN(p1) AS min_pc1_micro, MAX(p1) AS max_pc1_micro,
                CAST(SUM(p2) AS BIGINT) AS sum_pc2_micro,
                MIN(p2) AS min_pc2_micro, MAX(p2) AS max_pc2_micro
              FROM pcj GROUP BY label ORDER BY label"""

  /** Persist a fitted PCA as the on-disk artifact: three rows
    * `(part, lam, vec)` — part 0 = per-dim means with the covariance
    * trace in `lam`, parts 1/2 = the unit components with their
    * eigenvalues. Doubles round-trip parquet exactly, so a probe
    * session's projection is bitwise the fitting session's.
    */
  private[graft] def writePcaStore(s: org.apache.spark.sql.SparkSession,
      fit: PcaFit, name: String, path: String): Unit =
    s.createDataFrame(Seq(
      (0L, fit.trace, fit.means.toSeq),
      (1L, fit.lam1, fit.v1.toSeq),
      (2L, fit.lam2, fit.v2.toSeq)))
      .toDF("part", "lam", "vec")
      .write.mode("overwrite")
      .option("path", s"$path/pca").saveAsTable(s"${name}_pca")

  /** Re-attach an existing on-disk PCA store in a NEW session (the
    * registerIvfIndex discipline — the artifact outlives the session
    * that built it).
    */
  private[graft] def registerPcaStore(s: org.apache.spark.sql.SparkSession,
      name: String, path: String): Unit =
    s.sql(s"CREATE TABLE ${name}_pca USING parquet LOCATION '$path/pca'")

  /** Read a [[writePcaStore]] artifact back into a [[PcaFit]]. */
  private[graft] def pcaFitFromStore(s: org.apache.spark.sql.SparkSession,
      name: String): PcaFit = {
    val rows = s.table(s"${name}_pca").collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Double](2).toArray))).toMap
    val (trace, means) = rows(0L)
    val (l1, v1) = rows(1L)
    val (l2, v2) = rows(2L)
    PcaFit(means.length, means, l1, v1, l2, v2, trace)
  }

  /** q175's declared fixture: the synthetic embeddings are
    * near-isotropic (every natural |corr| is small), so the LAST
    * dimension is rewritten to 0.7 × dimension 1 — one exactly
    * correlated pair keeps the redundant branch live and its corr
    * rounds to 1.0 in both engines. Elements cast to double FIRST so
    * Spark and DuckDB multiply identical IEEE doubles.
    */
  private[graft] def covFixture(embedding: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    // ONE transform over the raw column (r17 opt): the previous
    // two-level form re-evaluated `size(transform(...))` and
    // `element_at(transform(...), 1)` inside the outer lambda — O(d)
    // array builds per ROW just to read a length and one element.
    // `size`/`element_at` on the raw column are O(1); the cast of the
    // first element then the multiply produce bit-identical doubles to
    // casting the whole array first (float→double cast is exact).
    transform(embedding, (x, i) =>
      when(i === size(embedding) - 1,
        element_at(embedding, 1).cast("double") * 0.7)
        .otherwise(x.cast("double")))

  /** Cell-local SemDeDup — the linear-time scale path of q135: assign
    * every vector to its IVF cell ([[Ann.coarseQuantizer]], the same
    * bounded-sample deterministic k-means the ANN paths share), form
    * pairs WITHIN cells only, and prune any vector with a smaller-id
    * neighbor at 4-dp-rounded cosine ≥ τ. Within-cell pairs are a
    * subset of all pairs, so the pruned set is a SUBSET of the exact
    * rule's (never prunes anything the exact pass would keep); recall
    * against the exact set is the quality dial nlist controls —
    * candidate work drops from n²/2 to Σ|cell|²/2 ≈ n²/(2·nlist) and
    * each cell's pair scan is an independent partition of work.
    *
    * Sizing nlist: with the DENSE assignment (every vector scores
    * every centroid) the stage costs n·nlist and the balanced choice
    * is nlist = Θ(√n) — assignment and pair volume both n^1.5 (Stress
    * measured exactly that through round 10). The assignment now runs
    * through the two-level coarse-over-coarse probe
    * ([[Ann.twoLevelAssignCol]] — an ANN structure over the centroids
    * themselves, ⌈√nlist⌉ groups, wprobe nearest groups scanned), so
    * the stage costs n·Θ(√nlist) ≈ n^1.25 at the balanced nlist and
    * the Stress wall tracks ~linearly at 10× (VERDICT r10 #3's done
    * bar). Two-level assignment is approximate, which cell-local
    * SemDeDup absorbs by construction: ANY partition of the vectors
    * yields within-cell pairs ⊆ all pairs, so pruned ⊆ exact holds
    * regardless (AnnSpec asserts it, plus a recall floor against the
    * dense assignment). The pair join shuffles on the cell id; the
    * same per-cell block tiling as [[tiledPairSims]] applies inside a
    * cell if single cells outgrow a partition (at nlist sized to
    * corpus/nlist ≈ partition budget, it doesn't).
    */
  def semDedupPrunedCellLocal(
      emb: org.apache.spark.sql.DataFrame,
      tau: Double,
      nlist: Int = 16,
      cellsFrom: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val base = emb.select(col("vec_id"), col("embedding"))
    // cell SOURCE is switchable (VERDICT r11 #6): when a persisted IVF
    // artifact already holds an assignment ([[Ann.ivfCellsOf]],
    // tag-matched via IndexCatalog.dirTag at the call site), reuse it —
    // one fewer k-means fit per run, and pruned ⊆ exact holds under
    // ANY assignment, so the swap costs no correctness (AnnSpec).
    val cells = (cellsFrom match {
      case Some(c) =>
        base.join(c.select(col("vec_id"), col("cell")), Seq("vec_id"))
      case None if nlist <= 1 =>
        // nlist=1 degenerates to the exact global rule — no quantizer
        // to train (KMeans requires k ≥ 2), every vector in cell 0
        base.withColumn("cell", lit(0))
      case None =>
        // cheapInit: at nlist = Θ(√n) the k-means|| init dominates the
        // whole pass; random-init Lloyd is the standard coarse recipe
        val model = Ann.coarseQuantizer(base, nlist, cheapInit = true)
        base.withColumn("cell",
          Ann.twoLevelAssignCol(model, col("embedding")))
    })
      .withColumn("nsq", normSq(col("embedding")))
    val a = cells.select(col("cell"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nsq").as("na"))
    val b = cells.select(col("cell"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nsq").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(round(cosineWithNorms(dot(col("ea"), col("eb")),
        col("na"), col("nb")), 4) >= tau)
      .select(col("vb").as("vec_id")).distinct()
  }

  /** The B×B block-tiled EXACT all-pairs cosine frame shared by q27
    * (global top-k pairs) and q135 (threshold pruning): every unordered
    * pair (va < vb) appears exactly once with its 4-dp-rounded cosine.
    * B comes from measured stats, not a guess: the per-reducer build
    * side (n/B rows of ~rowBytes) must fit the partition budget, and
    * B² partitions must cover the cluster — one map-only (count, dim)
    * scan stands in for catalog stats. The vector payload rides THROUGH
    * the explode deliberately: sims are computed and reduced inside the
    * join stage, so the n²/2 pair rows never shuffle (see q27's scale
    * note — a skinny key join with a payload rejoin loses whenever
    * n > 2B).
    */
  private[graft] def tiledPairSims(
      s: org.apache.spark.sql.SparkSession,
      emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nsq"))
    val (n, dim) = {
      val r = e.agg(count(lit(1)), max(size(col("embedding")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val rowBytes = 32L + 8L * dim
    val targetBytes = 64L << 20
    val bMem = math.ceil(n.toDouble * rowBytes / targetBytes).toInt
    // B² tiles ≥ 4× parallelism so the (ba, bb) hash spreads over all
    // cores without empty partitions (guide §2.5: many more distinct
    // keys than partitions); bMem still governs at scale
    val par = math.max(1, s.sparkContext.defaultParallelism)
    val bPar = math.ceil(math.sqrt(4.0 * par)).toInt
    val B = math.min(256, math.max(1, math.max(bMem, bPar)))
    val blocks = array((0 until B).map(lit): _*)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nsq").as("na"),
      pmod(col("vec_id"), lit(B)).cast("int").as("ba"),
      explode(blocks).as("bb"))
      // EXPLICIT numbered repartition (never AQE-coalesced): the tile
      // shuffle is only ~2nB skinny rows, so AQE sizes the post-join
      // stage by those bytes and coalesces the (n/B)²-per-cell dot
      // work onto a handful of tasks (r17: q27/q135/q185 ran the 2M
      // dots on ~6 of 32 cores). The join's real cost is its OUTPUT,
      // which AQE cannot see.
      .repartition(par, col("ba"), col("bb"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nsq").as("nb"),
      pmod(col("vec_id"), lit(B)).cast("int").as("bb"),
      explode(blocks).as("ba"))
      .repartition(par, col("ba"), col("bb"))
    a.join(b, Seq("ba", "bb"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(cosineWithNorms(dot(col("ea"), col("eb")),
          col("na"), col("nb")), 4).as("sim"))
  }
}
