package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Release, TextAnalysis}

/** The tokenized-corpus release artifact (q235): encode/pack/decode
  * identities a SQL oracle cannot express — exact round-trip through
  * the PACKED store, OOV accounting under a planted unknown character,
  * and the packer's coverage/partition invariants.
  */
class ReleaseSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def tinyDocs: DataFrame = {
    import spark.implicits._
    // 20 docs over a small alphabet so the trained vocab is rich
    // enough for multi-char pieces to win segmentations
    (0L until 20L).map(i =>
      (i, s"abba bab${"a" * (i % 3).toInt} cab abba dada${i % 5}"))
      .toDF("doc_id", "text")
  }

  private def train(docs: DataFrame): Seq[(String, Long)] =
    TextAnalysis.unigramTrain(docs.select("text"), vocabSize = 32,
      maxPieceLen = 3, seedSize = 50, emIters = 2)

  test("encode + pack + decode round-trips the normalized text for every doc") {
    val docs = tinyDocs
    val vocab = train(docs)
    val enc = Release.encodeCorpus(spark, docs, vocab)
    val packed = Release.packSequences(enc)
    val rec = Release.decodeStore(packed, vocab)
      .join(docs.select(col("doc_id"),
        array_join(TextAnalysis.tokens(col("text")), " ").as("norm")),
        "doc_id")
    assert(rec.count() == 20L, "decode must cover every document")
    assert(rec.filter(col("rec") =!= col("norm")).count() == 0L,
      "round-trip decode drifted from the normalized text")
    graft.operators.Q.releaseManaged()
  }

  test("a planted unknown character is counted as OOV, never dropped") {
    import spark.implicits._
    val docs = tinyDocs
    val vocab = train(docs)
    // plant U+00A4 (not in the training alphabet) into doc 7
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") === 7, concat(col("text"), lit(" ab¤ba")))
        .otherwise(col("text")).as("text"))
    val enc = Release.encodeCorpus(spark, planted, vocab)
    val oov = enc.filter(col("n_oov") > 0)
      .select("doc_id").as[Long].collect().toSeq
    assert(oov == Seq(7L), s"exactly doc 7 must carry OOV ids, got $oov")
    // the OOV id appears in the id stream (accounted, not dropped):
    // the word ab¤ba contributes 1 BOW + its pieces incl. one OovId
    val row = enc.filter(col("doc_id") === 7).head()
    val ids = row.getSeq[Int](row.fieldIndex("token_ids"))
    assert(ids.contains(Release.OovId))
    // and every non-planted doc still round-trips
    val packed = Release.packSequences(enc)
    val rec = Release.decodeStore(packed, vocab)
      .join(planted.select(col("doc_id"),
        array_join(TextAnalysis.tokens(col("text")), " ").as("norm")),
        "doc_id")
    assert(rec.filter(col("doc_id") =!= 7)
      .filter(col("rec") =!= col("norm")).count() == 0L)
    graft.operators.Q.releaseManaged()
  }

  test("packer partitions docs: every doc in exactly one sequence, totals tie") {
    import spark.implicits._
    val docs = tinyDocs
    val vocab = train(docs)
    val enc = Release.encodeCorpus(spark, docs, vocab).cache()
    val packed = Release.packSequences(enc).cache()
    val packedDocs = packed
      .select(explode(col("doc_ids")).as("doc_id"))
    assert(packedDocs.count() == 20L &&
      packedDocs.distinct().count() == 20L,
      "each doc must land in exactly one packed sequence")
    val tokTotal = enc.agg(sum(size(col("token_ids")))).head().getLong(0)
    val seqTotal = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(tokTotal == seqTotal, "packed token total must tie to encode")
    // per-seq tok_cnts tie to the flat array
    assert(packed.filter(
      expr("aggregate(tok_cnts, 0, (a, x) -> a + x) != size(token_ids)"))
      .count() == 0L)
    enc.unpersist(); packed.unpersist()
    graft.operators.Q.releaseManaged()
  }

  test("packing respects the q71 bin rule within each shard") {
    import spark.implicits._
    val docs = tinyDocs
    val vocab = train(docs)
    val enc = Release.encodeCorpus(spark, docs, vocab).cache()
    val packed = Release.packSequences(enc)
    // reference: per shard, docs in doc_id order, bin = cumBefore/512
    val ref = enc.select(col("doc_id"), size(col("token_ids")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
      .groupBy { case (id, _) => id % Release.NumShards }
      .toSeq
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.toSeq.map { case (id, n) =>
          val bin = cum / Release.SeqLen; cum += n
          ((shard, bin), id)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val got = packed.select(col("shard"), col("seq"), col("doc_ids"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        r.getSeq[Long](2).toSeq)).toMap
    assert(got == ref, s"bin assignment drifted:\ngot=$got\nref=$ref")
    enc.unpersist()
    graft.operators.Q.releaseManaged()
  }
}
