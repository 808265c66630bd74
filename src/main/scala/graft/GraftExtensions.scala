package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{HashFunctions, MinHashSignature, SimHashMd5,
  WinnowFingerprint, WordShingles}
import graft.functions.DotProduct

/** Session-extension entry point: makes every graft SQL function
  * available in any session built with
  *
  * {{{
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), so pure-SQL users get
  * the sketch/vector surface without touching the Scala API. The
  * injected builders are the same ones the programmatic `register`
  * methods install — one definition, two wiring paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        builder))

    inject("graft_dot",
      "graft_dot(a, b) - dot product of two float/double arrays") {
      exprs => DotProduct(exprs(0), exprs(1))
    }
    inject("graft_minhash",
      "graft_minhash(shingles) - 128-slot MinHash signature") {
      exprs => MinHashSignature(exprs.head,
        k = HashFunctions.MinHashK, seed = HashFunctions.Seed)
    }
    inject("graft_simhash_md5",
      "graft_simhash_md5(tokens) - 64-bit md5-derived SimHash") {
      exprs => SimHashMd5(exprs.head)
    }
    // literal args go through intArg/longArg (Number-based): a SQL call
    // like graft_sign_buckets(..., 42, ...) passes an Int literal where
    // the Scala path passed 42L — asInstanceOf would CCE (ADVICE r7)
    inject("graft_shingles",
      "graft_shingles(text, n) - distinct word n-gram shingles") {
      exprs => WordShingles(exprs.head,
        HashFunctions.intArg("graft_shingles", exprs(1)))
    }
    inject("graft_winnow",
      "graft_winnow(text, k, w) - MOSS winnowing fingerprints") {
      exprs => WinnowFingerprint(exprs.head,
        HashFunctions.intArg("graft_winnow", exprs(1)),
        HashFunctions.intArg("graft_winnow", exprs(2)))
    }
    inject("graft_sign_buckets",
      "graft_sign_buckets(emb, nPlanes, tables, seed, dim) - all LSH " +
        "hyperplane sign-buckets of an embedding, one per table") {
      exprs => graft.functions.SignBuckets(exprs.head,
        nPlanes = HashFunctions.intArg("graft_sign_buckets", exprs(1)),
        tables = HashFunctions.intArg("graft_sign_buckets", exprs(2)),
        seed = HashFunctions.longArg("graft_sign_buckets", exprs(3)),
        dim = HashFunctions.intArg("graft_sign_buckets", exprs(4)))
    }
    inject("graft_bloom_build",
      "graft_bloom_build(xxhash64(key), estNumItems) - serialized bloom " +
        "filter aggregate (Spark's runtime-filter sketch)") {
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1))
    }
    inject("graft_bloom_contains",
      "graft_bloom_contains(bloom, xxhash64(key)) - bloom membership " +
        "probe (bloom operand must be a literal - see " +
        "HashFunctions.bloomContainsExpr)") {
      HashFunctions.bloomContainsExpr
    }
    inject("graft_cms_estimate",
      "graft_cms_estimate(sketch, key) - count estimate from a " +
        "count_min_sketch aggregate") {
      exprs => graft.functions.CmsEstimate(exprs.head, exprs(1))
    }
    inject("graft_pq_encode",
      "graft_pq_encode(residual, codebooks, m, ksub, dsub) - product-" +
        "quantization code array (nearest codebook entry per subspace)") {
      exprs => graft.functions.PqEncode(exprs.head,
        codebooks =
          graft.functions.VectorFunctions
            .doubleArrayArg("graft_pq_encode", exprs(1)),
        m = HashFunctions.intArg("graft_pq_encode", exprs(2)),
        ksub = HashFunctions.intArg("graft_pq_encode", exprs(3)),
        dsub = HashFunctions.intArg("graft_pq_encode", exprs(4)))
    }
    inject("graft_pq_lut",
      "graft_pq_lut(q_emb, codebooks, m, ksub, dsub) - per-query ADC " +
        "lookup table (every subspace-centroid dot)") {
      exprs => graft.functions.PqLut(exprs.head,
        codebooks =
          graft.functions.VectorFunctions
            .doubleArrayArg("graft_pq_lut", exprs(1)),
        m = HashFunctions.intArg("graft_pq_lut", exprs(2)),
        ksub = HashFunctions.intArg("graft_pq_lut", exprs(3)),
        dsub = HashFunctions.intArg("graft_pq_lut", exprs(4)))
    }
    inject("graft_pq_adc",
      "graft_pq_adc(code, lut, ksub) - asymmetric-distance approximate " +
        "dot from a code array and a graft_pq_lut array") {
      exprs => graft.functions.PqAdc(exprs(0), exprs(1),
        ksub = HashFunctions.intArg("graft_pq_adc", exprs(2)))
    }
  }
}
