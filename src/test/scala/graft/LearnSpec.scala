package graft

import org.apache.spark.sql.functions._
import graft.operators.{Learn, Q}

/** Behavior contracts for the model-in-the-loop curation family
  * (q181 probe training, q182 coreset selection, q183 probe gate) on
  * top of the DuckDB oracle hash parity the driver checks: the probe
  * must actually LEARN (accuracy up, error down over training), the
  * farthest-point trajectory must obey its monotone max-min geometry,
  * and the gate must partition the corpus consistently with the score.
  */
class LearnSpec extends SparkSpec {

  test("q181: the probe learns - accuracy up, training error down") {
    val rows = SparkEntry.queries("q181_quality_probe")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val (first, last) = (rows.head, rows.last)
    // iteration 1 scans the zero model: every |err| is exactly 0.5,
    // so the summed error is n/2 in micros
    val n = Q.table(spark, sfDir, "embeddings").count()
    assert(first.getLong(2) === n * 500000L)
    assert(last.getLong(1) > first.getLong(1) + (n / 20).toInt,
      s"no accuracy gain: ${first.getLong(1)} -> ${last.getLong(1)}")
    assert(last.getLong(2) < first.getLong(2),
      "summed training error must shrink over the schedule")
    // the weight norm grows from zero and stabilizes (decay schedule)
    val l2 = rows.map(_.getLong(3))
    assert(l2.head > 0L && l2.forall(_ > 0L))
  }

  test("q182: farthest-point picks obey the max-min geometry") {
    val rows = SparkEntry.queries("q182_coreset_select")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 17) // 16 picks + the covering-radius probe
    assert(rows.head.getLong(1) === 0L && rows.head.getLong(3) === 0L)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length === ids.length, "a point picked twice")
    // the max-min distance is non-increasing as the set grows
    val d = rows.drop(1).map(_.getLong(3))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b },
      s"selection distances not monotone: ${d.toSeq}")
    assert(d.last > 0L, "covering radius must be positive")
    // diversity: greedy k-center on clustered data crosses clusters
    assert(rows.map(_.getLong(2)).distinct.length >= 6,
      "coreset collapsed onto too few cluster labels")
  }

  test("q183: the gate partitions the corpus consistently with the score") {
    val rows = SparkEntry.queries("q183_probe_gate")(spark, sfDir)
      .collect()
    val n = Q.table(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      // mean floor-micro score of a label sits inside the score range
      val mean = r.getLong(3).toDouble / r.getLong(1)
      assert(mean > 0.0 && mean < 1000000.0, s"mean score out of range: $r")
    }
    // both branches of the gate are live at the trained threshold
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0L && kept < n, s"degenerate gate: kept $kept of $n")
  }

  test("q185: hard negatives cross labels at high sim, hard positives the reverse") {
    val rows = SparkEntry.queries("q185_hard_pairs")(spark, sfDir)
      .collect()
    val neg = rows.filter(_.getString(0) == "hard_neg")
    val pos = rows.filter(_.getString(0) == "hard_pos")
    assert(neg.length === 20 && pos.length === 20)
    assert(neg.forall(r => r.getLong(3) != r.getLong(4)),
      "a hard negative must cross labels")
    assert(pos.forall(r => r.getLong(3) == r.getLong(4)),
      "a hard positive must share its label")
    assert(rows.forall(r => r.getLong(1) < r.getLong(2)),
      "pairs must be canonical va < vb")
    // the mined extremes separate: every top cross-label sim exceeds
    // every bottom same-label sim (vacuous only if the corpus were
    // perfectly clustered, which the overlapping synthetic is not)
    val minNeg = neg.map(_.getDouble(5)).min
    val maxPos = pos.map(_.getDouble(5)).max
    assert(minNeg > maxPos,
      s"mined extremes do not separate: minNeg=$minNeg maxPos=$maxPos")
  }

  test("hardPairsCellLocal: cell-local mining is a subset of the exact frame") {
    import graft.operators.Similarity
    val emb = Q.table(spark, sfDir, "embeddings")
    val floor = 0.25
    val local = Learn.hardPairsCellLocal(emb, floor).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    val lab = emb.select(col("vec_id"), col("label").cast("long").as("l"))
    val exact = Similarity.tiledPairSims(spark, emb)
      .join(lab.toDF("va", "la"), "va").join(lab.toDF("vb", "lb"), "vb")
      .filter(col("la") =!= col("lb") && col("sim") >= floor)
      .collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"),
        r.getAs[Double]("sim"))).toSet
    // any cell partition yields a subset with IDENTICAL sims
    assert(local.subsetOf(exact),
      s"cell-local pair outside the exact frame: ${local.diff(exact).take(3)}")
    // the path does real work: high-cosine cross-label pairs are
    // intra-cell by construction, so the local pass finds some
    assert(local.nonEmpty, "cell-local mining found nothing at the floor")
    assert(local.size <= exact.size)
  }

  test("probeScore boundary: zero margin scores exactly 0.5") {
    import spark.implicits._
    val df = Seq((Array(0.125f, 0.0f), 1L)).toDF("embedding", "id")
      .select(Learn.probeScore(col("embedding"),
        Array(2.0, 7.0), -0.25).as("s"))
    assert(df.head().getDouble(0) === 0.5)
  }
}
