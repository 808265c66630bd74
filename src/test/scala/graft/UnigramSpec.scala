package graft

import graft.operators.TextAnalysis

/** Unigram-LM (SentencePiece-style) trainer correctness — the BpeSpec
  * discipline for the EM-pruned family: the distributed loop must
  * produce exactly the vocab a sequential reference produces (same
  * substring seed, same hard-EM rounds through the SHARED
  * [[TextAnalysis.viterbiSegment]], same (weight desc, piece asc)
  * pruning), the hard-EM objective must be non-decreasing in EXACT
  * BigInt rational arithmetic, and encoding must round-trip.
  */
class UnigramSpec extends SparkSpec {

  /** Sequential reference: plain-Scala seed → hard-EM → prune over a
    * word→count map. Shares ONLY [[TextAnalysis.viterbiSegment]] (the
    * bpeMergePair sharing rule); every other step is written
    * independently of the distributed trainer.
    */
  private def referenceTrain(
      words: Map[String, Long], vocabSize: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int,
      onIteration: (Int, Map[String, Long]) => Unit = (_, _) => ())
      : Seq[(String, Long)] = {
    val pieceCounts = scala.collection.mutable.Map.empty[String, Long]
    for {
      (w, c) <- words
      i <- 0 until w.length
      l <- 1 to math.min(maxPieceLen, w.length - i)
    } {
      val p = w.substring(i, i + l)
      pieceCounts(p) = pieceCounts.getOrElse(p, 0L) + c
    }
    val chars = pieceCounts.filter(_._1.length == 1).toMap
    val multi = pieceCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(seedSize)
    var vocab: Map[String, Long] = chars ++ multi
    for (it <- 1 to emIters) {
      val total = vocab.valuesIterator.sum
      val obs = scala.collection.mutable.Map.empty[String, Long]
      for {
        (w, c) <- words
        p <- TextAnalysis.viterbiSegment(w, vocab, total, maxPieceLen)
      } obs(p) = obs.getOrElse(p, 0L) + c
      vocab = vocab.keysIterator.flatMap { p =>
        val o = obs.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(o, 1L))
        else if (o > 0L) Some(p -> o)
        else None
      }.toMap
      onIteration(it, vocab)
    }
    val ch = vocab.filter(_._1.length == 1)
    val mk = vocab.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(0, vocabSize - ch.size))
    (ch.toSeq ++ mk).sortBy { case (p, n) => (-n, p) }
  }

  /** Exact hard-EM objective of a vocab over a word→count map:
    * `J = Π_w (Π_{p∈viterbi(w)} weight(p))^{c_w} / T^(Σ c_w·k_w)`,
    * carried as the (numerator BigInt, T, exponent) triple so two
    * objectives compare by cross-multiplication — zero floats.
    */
  private def objective(
      words: Map[String, Long], vocab: Map[String, Long],
      maxPieceLen: Int): (BigInt, BigInt, Long) = {
    val total = vocab.valuesIterator.sum
    var num = BigInt(1)
    var e = 0L
    for ((w, c) <- words) {
      val ps = TextAnalysis.viterbiSegment(w, vocab, total, maxPieceLen)
      val prod = ps.foldLeft(BigInt(1))((acc, p) => acc * vocab(p))
      num *= prod.pow(c.toInt)
      e += c * ps.length
    }
    (num, BigInt(total), e)
  }

  private def objGeq(
      a: (BigInt, BigInt, Long), b: (BigInt, BigInt, Long)): Boolean =
    a._1 * b._2.pow(b._3.toInt) >= b._1 * a._2.pow(a._3.toInt)

  private val toyTexts = Seq(
    "internationalization internationalization nation nation nation",
    "international station station nation inter inter nationalize")

  private def toyWords: Map[String, Long] =
    toyTexts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }

  test("distributed unigram training equals the sequential reference on a toy corpus") {
    import spark.implicits._
    val docs = toyTexts.toDF("text")
    val want = referenceTrain(toyWords, vocabSize = 32, maxPieceLen = 4,
      seedSize = 40, emIters = 3)
    val got = TextAnalysis.unigramTrain(docs, vocabSize = 32,
      maxPieceLen = 4, seedSize = 40, emIters = 3)
    assert(got == want, s"vocabs diverged:\n got  $got\n want $want")
    assert(got.exists(_._1.length > 1),
      "training must retain at least one multi-char piece")
  }

  test("distributed unigram training equals the reference on real corpus text") {
    val docs = graft.operators.Q.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .select("text")
    val words = docs.collect().map(_.getString(0))
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val want = referenceTrain(words, vocabSize = 64, maxPieceLen = 4,
      seedSize = 200, emIters = 3)
    val got = TextAnalysis.unigramTrain(docs, vocabSize = 64,
      maxPieceLen = 4, seedSize = 200, emIters = 3)
    assert(got == want)
    assert(got.size <= 64 && got.exists(_._1.length > 1))
  }

  test("hard-EM objective is non-decreasing across iterations (exact BigInt comparison)") {
    // the E-step argmax / M-step usage-count alternation must never
    // lose likelihood round over round; the toy fixture keeps the
    // cross-multiplied integers small enough to compare exactly
    val words = toyWords
    val snaps =
      scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    referenceTrain(words, vocabSize = 32, maxPieceLen = 4,
      seedSize = 40, emIters = 4,
      onIteration = (_, v) => snaps += v)
    assert(snaps.size == 4)
    val objs = snaps.map(objective(words, _, 4))
    for (i <- 1 until objs.length)
      assert(objGeq(objs(i), objs(i - 1)),
        s"objective decreased at EM round ${i + 1}")
    // and the distributed trainer observes the SAME snapshots
    import spark.implicits._
    val distSnaps =
      scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    TextAnalysis.unigramTrain(toyTexts.toDF("text"), vocabSize = 32,
      maxPieceLen = 4, seedSize = 40, emIters = 4,
      onIteration = (_, v) => distSnaps += v)
    assert(distSnaps.toSeq == snaps.toSeq,
      "distributed EM rounds diverged from the reference rounds")
  }

  test("unigram encoding round-trips, compresses frequent words, and flags OOV chars") {
    import spark.implicits._
    val docs = toyTexts.toDF("text")
    val vocab = TextAnalysis.unigramTrain(docs, vocabSize = 32,
      maxPieceLen = 4, seedSize = 40, emIters = 3)
    val vset = vocab.map(_._1).toSet
    for (w <- Seq("nation", "internationalization", "station", "inter")) {
      val enc = TextAnalysis.unigramEncode(w, vocab)
      assert(enc.mkString == w, s"round-trip broke for $w: $enc")
      assert(enc.forall(vset.contains), s"$w used a piece outside vocab")
    }
    assert(TextAnalysis.unigramEncode("nation", vocab).length < 6,
      "frequent word must compress below its character count")
    // a character the corpus never saw still segments (the weight-1
    // char floor) but is visibly OUTSIDE the vocab — the OOV signal
    val odd = TextAnalysis.unigramEncode("naXon", vocab)
    assert(odd.mkString == "naXon")
    assert(odd.exists(!vset.contains(_)),
      "unseen char must surface as an out-of-vocab piece")
  }

  test("vocab store round-trips exactly and survives the writing session (drop catalog, re-register, read back)") {
    import spark.implicits._
    val docs = toyTexts.toDF("text")
    val vocab = TextAnalysis.unigramTrain(docs, vocabSize = 32,
      maxPieceLen = 4, seedSize = 40, emIters = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft-vocab")
    val name = "vocabstore_" + System.nanoTime()
    try {
      TextAnalysis.writeVocabStore(spark, vocab, name, s"$tmp")
      assert(TextAnalysis.vocabFromStore(spark, name) == vocab,
        "stored vocab must read back in the exact training order")
      // a NEW session re-attaches by path alone
      spark.sql(s"DROP TABLE IF EXISTS ${name}_vocab")
      TextAnalysis.registerVocabStore(spark, name, s"$tmp")
      assert(TextAnalysis.vocabFromStore(spark, name) == vocab,
        "re-registered store must serve the identical artifact")
      // segmentation under the stored artifact is segmentation under
      // the in-memory one — the property q212's drift scan rests on
      val stored = TextAnalysis.vocabFromStore(spark, name)
      for (w <- Seq("nation", "internationalization", "naXon"))
        assert(TextAnalysis.unigramEncode(w, stored) ==
          TextAnalysis.unigramEncode(w, vocab))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_vocab")
  }

  test("pruning keeps every corpus character and respects the vocab target") {
    import spark.implicits._
    val docs = toyTexts.toDF("text")
    val corpusChars = toyTexts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .flatMap(_.split("")).toSet
    val tight = TextAnalysis.unigramTrain(docs, vocabSize = 12,
      maxPieceLen = 4, seedSize = 40, emIters = 2)
    assert(tight.count(_._1.length == 1) == corpusChars.size &&
      corpusChars.forall(c => tight.exists(_._1 == c)),
      s"chars must survive any prune: $tight")
    assert(tight.size <= math.max(12, corpusChars.size),
      s"vocab target overrun: ${tight.size}")
  }
}
