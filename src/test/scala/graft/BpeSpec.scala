package graft

import graft.operators.TextAnalysis

/** Distributed BPE trainer correctness: the Spark loop must produce
  * exactly the merge sequence a sequential reference implementation
  * produces (same start-from-characters state, same most-frequent-pair
  * rule, same (count desc, pair lex) tie-break), and encoding with the
  * trained merges must round-trip: concatenating the output symbols
  * reproduces the word.
  */
class BpeSpec extends SparkSpec {

  /** Sequential reference: plain-Scala BPE over a word→count map. */
  private def referenceTrain(
      words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var dict: Map[Seq[String], Long] =
      words.groupBy(w => w._1.split("").toSeq)
        .map { case (k, g) => k -> g.values.sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.isEmpty || counts.values.max < 2L) done = true
      else {
        val (pair, _) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        merges += pair
        dict = dict.toSeq.map { case (syms, cnt) =>
          TextAnalysis.bpeMergePair(syms, pair._1, pair._2) -> cnt
        }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      }
    }
    merges.toSeq
  }

  test("distributed BPE merges equal the sequential reference on a toy corpus") {
    import spark.implicits._
    val texts = Seq(
      "low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest new new")
    val docs = texts.toDF("text")
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val want = referenceTrain(words, 8)
    val got = TextAnalysis.bpeTrain(docs, 8)
    assert(got == want,
      s"merge sequences diverged:\n got  $got\n want $want")
    assert(got.nonEmpty)
  }

  test("distributed BPE merges equal the reference on real corpus text") {
    val docs = graft.operators.Q.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .select("text")
    val words = docs.collect().map(_.getString(0))
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val want = referenceTrain(words, 10)
    val got = TextAnalysis.bpeTrain(docs, 10)
    assert(got == want)
    assert(got.length == 10, "corpus is rich enough for all 10 merges")
  }

  test("encoding with trained merges round-trips and compresses") {
    import spark.implicits._
    val docs = Seq("banana banana banana bandana bandana").toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, 6)
    for (w <- Seq("banana", "bandana", "ban")) {
      val enc = TextAnalysis.bpeEncode(w, merges)
      assert(enc.mkString == w, s"round-trip broke for $w: $enc")
    }
    assert(TextAnalysis.bpeEncode("banana", merges).length < 6,
      "frequent word must compress below its character count")
  }
}
