package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions wiring: a session built with
  * GraftExtensions can use every graft function from pure SQL without
  * any programmatic register call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("a session with graft.GraftExtensions resolves every graft function in SQL") {
    spark // force the shared session (and its SparkContext) first
    // getOrCreate returns the existing default session (ignoring new
    // extensions), so clear it, build an extended session over the SAME
    // SparkContext, and restore afterwards
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions is the programmatic form of
    // --conf spark.sql.extensions=graft.GraftExtensions (the conf is a
    // static one, read only at SparkContext-backed first construction —
    // this suite reuses the context, so hand the object over directly)
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT
             graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                       array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
             size(graft_minhash(array('a b c', 'b c d'))) AS mh,
             graft_simhash_md5(array('tok')) IS NOT NULL AS sh,
             graft_shingles('a b c d', 3) AS sg,
             size(graft_winnow('abcdefghij', 5, 4)) > 0 AS wn,
             size(graft_sign_buckets(array(CAST(1.0 AS FLOAT),
               CAST(-1.0 AS FLOAT)), 4, 2, 42L, 2)) AS sb""").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 128)
      assert(r.getBoolean(2))
      assert(r.getSeq[String](3) == Seq("a b c", "b c d"))
      assert(r.getBoolean(4))
      assert(r.getInt(5) == 2) // one bucket per LSH table
      // sketch build + probe round-trips through pure SQL. The bloom
      // probe takes the LITERAL shape (build, then inline the bytes as
      // a hex literal) — the r13-reviewed contract: a scalar-subquery
      // bloom operand is REFUSED loudly because it silently loses
      // whole-stage codegen (PlanAuditSpec pins both halves); cms has
      // no such limitation and keeps the subquery shape
      val bloomBytes = s.sql(
        """SELECT graft_bloom_build(xxhash64(g), 64L)
           FROM (SELECT explode(array('x','y','z')) AS g)""")
        .head().getAs[Array[Byte]](0)
      val hex = bloomBytes.map("%02X".format(_)).mkString
      val sk = s.sql(
        s"""WITH t AS (SELECT explode(array('x','y','z')) AS g)
           SELECT graft_bloom_contains(X'$hex', xxhash64('y')) AS hit,
                  graft_cms_estimate(
                    (SELECT count_min_sketch(g, 0.01d, 0.99d, 7) FROM t),
                    'y') AS est""").head()
      assert(sk.getBoolean(0))
      assert(sk.getLong(1) == 1L)
      // and the refused shape refuses through THIS entry point too
      val err = intercept[Throwable] {
        s.sql("""SELECT graft_bloom_contains(
                   (SELECT graft_bloom_build(xxhash64(g), 64L)
                    FROM (SELECT explode(array('x','y')) AS g)),
                   xxhash64('y'))""").collect()
      }
      val chain = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
      assert(chain.contains("literal"),
        s"subquery bloom operand must refuse via GraftExtensions: $chain")
      // PQ triple through pure SQL: a 1-subspace, 2-code toy codebook
      // ([0,0] and [1,1]); residual [0.9, 1.1] encodes to code 1, the
      // LUT holds dots with both entries, and ADC looks up code 1's dot
      val pq = s.sql(
        """SELECT graft_pq_encode(array(0.9d, 1.1d),
                    array(0d, 0d, 1d, 1d), 1, 2, 2) AS code,
                  graft_pq_adc(
                    graft_pq_encode(array(0.9d, 1.1d),
                      array(0d, 0d, 1d, 1d), 1, 2, 2),
                    graft_pq_lut(array(2d, 3d),
                      array(0d, 0d, 1d, 1d), 1, 2, 2), 2) AS adc""").head()
      assert(pq.getSeq[Int](0) == Seq(1))
      assert(pq.getDouble(1) == 5.0) // dot([2,3],[1,1])
    } finally {
      // shared SparkContext: restore the suite session, don't stop
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
