package graft

import org.apache.spark.sql.functions._

/** Properties of the link-graph analytics (q178) the oracle hash can't
  * express directly: the planted hub dominates the ranking, teleport
  * mass is an exact floor for sink nodes, total rank is invariant
  * under input repartitioning, and the iteration actually moved mass
  * (ranks are not the uniform start vector).
  */
class GraphSpec extends SparkSpec {

  private lazy val top =
    SparkEntry.queries("q178_link_rank")(spark, sfDir).collect()

  test("q178: planted hub doc 7 outranks every other node") {
    assert(top.nonEmpty)
    val head = top.head
    assert(head.getLong(0) === 7L,
      s"expected hub node 7 at rank 1, got ${head.getLong(0)}")
    // strictly above second place — the ~n/17 dedicated in-links are
    // an order of magnitude more mass than any mod-400 target collects
    assert(head.getLong(1) > top(1).getLong(1))
  }

  test("q178: ranks respect the teleport floor and moved off uniform") {
    // every node holds at least the flat teleport term...
    assert(top.forall(_.getLong(1) >= 150000L))
    // ...and the top-20 are all strictly above it (they have in-links),
    // and above the uniform 1e6 start (mass actually concentrated)
    assert(top.forall(r => r.getLong(3) > 0L))
    assert(top.head.getLong(1) > 1000000L)
  }

  test("q178: rank is invariant under input partition layout") {
    import graft.operators.{Graph, Q}
    // rebuild the same recurrence from a deliberately reshuffled scan:
    // integer-micro arithmetic must make partition order irrelevant
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(7, col("lang"))
      .sortWithinPartitions(desc("doc_id"))
      .withColumn("text2", Graph.linkFixture(col("doc_id"), col("text")))
    val edges = docs
      .select(col("doc_id").as("src"),
        explode(expr("regexp_extract_all(text2, 'link->doc([0-9]+)', 1)"))
          .as("d"))
      .select(col("src"), col("d").cast("long").as("dst"))
      .distinct()
    val contrib = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var pr = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to 8) {
      val inc = contrib.join(pr, contrib("src") === pr("node"))
        .select(col("dst").as("node"), expr("r div odeg").as("c"))
        .groupBy("node").agg(sum("c").as("inc"))
      pr = nodes.join(inc, Seq("node"), "left")
        .select(col("node"),
          expr("150000L + (85L * coalesce(inc, 0L)) div 100L").as("r"))
        .localCheckpoint(true)
    }
    val again = pr.orderBy(desc("r"), asc("node")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = top.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again.toSeq === expect)
    Q.releaseManaged()
  }
  test("khopCounts: chain/diamond/cycle BFS — dedup, depth cap, bounded rollup") {
    import spark.implicits._
    import graft.operators.Graph
    // chain 0->1->2->3->4->5, diamond 0->10, 0->11, 10->12, 11->12,
    // cycle 12->0, and an unreachable island 90->91
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 10L), (0L, 11L), (10L, 12L), (11L, 12L), (12L, 0L),
      (90L, 91L)
    ).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.khopCounts(edges, seeds, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // hop 0: {0}; hop 1: {1,10,11}; hop 2: {2,12} (diamond merges,
    // cycle back to 0 deduped); hop 3: {3}; hop 4: {4}
    assert(got == Seq((0L, 1L, 1L), (1L, 3L, 4L), (2L, 2L, 6L),
      (3L, 1L, 7L), (4L, 1L, 8L)), s"BFS drifted: $got")
    // depth cap honored: node 5 (hop 5) is not reached at k=4
    val got5 = Graph.khopCounts(edges, seeds, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got5(5L) == 1L, "k=5 must reach the chain tail")
    // a dead frontier emits no further rows
    val island = Graph.khopCounts(edges, Seq(91L).toDF("node"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(island == Seq((0L, 1L)), s"dead frontier must stop: $island")
    graft.operators.Q.releaseManaged()
  }

  test("triangleStats: motif arithmetic on triangle/square/star/mutual-pair") {
    import spark.implicits._
    import graft.operators.Graph
    // one triangle {1,2,3}; one 4-cycle {4,5,6,7} (wedge-rich,
    // triangle-free); a 5-leaf hub star at 10 (the d² shape the
    // compact-forward orientation must NOT expand at the hub); one
    // mutual pair 20<->21 (reciprocity, collapses to ONE undirected
    // edge); a self-loop 30->30 (dropped by declaration)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L), (10L, 15L),
      (20L, 21L), (21L, 20L),
      (30L, 30L)
    ).toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()
    assert(r.length == 1)
    val row = r.head
    // nodes: 3 + 4 + 6 + 2 (the self-loop-only node 30 contributes no
    // undirected edge, hence no degree row)
    assert(row.getLong(0) === 15L, s"n_nodes: $row")
    assert(row.getLong(1) === 13L, s"n_edges: $row") // 3 + 4 + 5 + 1
    assert(row.getLong(2) === 1L, s"n_recip: $row")
    // wedges: triangle 3·C(2,2)=3, square 4, star C(5,2)=10, pair 0
    assert(row.getLong(3) === 17L, s"n_wedges: $row")
    assert(row.getLong(4) === 1L, s"n_triangles: $row")
    // gcc = 3·1/17 → (60000 + 17) div 34 = 1765 half-up bp
    assert(row.getLong(5) === 1765L, s"gcc_bp: $row")
    // orientation invariance: reversing every edge direction changes
    // NOTHING the census reports (it is an undirected statistic
    // except reciprocity, which is direction-symmetric)
    val rev = Graph.triangleStats(
      edges.select(col("dst").as("src"), col("src").as("dst"))).collect()
    assert(rev.head.toSeq === row.toSeq, s"direction leaked: ${rev.head}")
    graft.operators.Q.releaseManaged()
  }

  test("hitsScores: hub/authority separation on a bipartite fan") {
    import spark.implicits._
    import graft.operators.Graph
    // directories 1,2,3 point at content 10,11,12 with decreasing
    // breadth — a pure bipartite fan, so hubs and authorities are
    // DISJOINT node sets (the separation PageRank cannot express)
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (3L, 10L)
    ).toDF("src", "dst")
    val r = Graph.hitsScores(edges).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // node 10 (most in-links from the best hubs) is the max authority
    // at exactly the 1e6 normalization ceiling; node 1 the max hub
    assert(r(10L)._1 === 1000000L, s"top authority: $r")
    assert(r(1L)._2 === 1000000L, s"top hub: $r")
    // authority strictly falls with fan-in; hub strictly with fan-out
    assert(r(10L)._1 > r(11L)._1 && r(11L)._1 > r(12L)._1, s"$r")
    assert(r(1L)._2 > r(2L)._2 && r(2L)._2 > r(3L)._2, s"$r")
    // pure sources have zero authority; pure sinks zero hub
    assert(Seq(1L, 2L, 3L).forall(r(_)._1 === 0L), s"$r")
    assert(Seq(10L, 11L, 12L).forall(r(_)._2 === 0L), s"$r")
    graft.operators.Q.releaseManaged()
  }

  test("multiSourceDistances: per-seed shortest hops; pair-keyed anti-join") {
    import spark.implicits._
    import graft.operators.Graph
    // chain 0->1->2->3 and a second seed 10->2: node 2 must carry
    // BOTH distances (2 from seed 0, 1 from seed 10) — a global
    // visited set would lose one of them
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 10L).toDF("seed")
    val got = Graph.multiSourceDistances(edges, seeds, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = Map(
      (0L, 0L) -> 0L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (0L, 3L) -> 3L,
      (10L, 10L) -> 0L, (10L, 2L) -> 1L, (10L, 3L) -> 2L)
    assert(got === want, s"distances drifted: $got")
    // the harmonic rollup over these distances (the q246 arithmetic):
    // node 2 = 1e6/2 + 1e6/1; node 3 = 1e6/3 + 1e6/2 (floor division)
    val h = Graph.multiSourceDistances(edges, seeds, 4)
      .filter(col("hop") > 0).groupBy("node")
      .agg(sum(expr("1000000L div hop")).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(2L) === 1500000L && h(3L) === 833333L && h(1L) === 1000000L,
      s"harmonic drifted: $h")
    graft.operators.Q.releaseManaged()
  }

  test("componentCensus: motif graph census — cleaning, sizes, contract bits") {
    import spark.implicits._
    import graft.operators.Graph
    // two triangles and a pair; a duplicate reversed edge and a
    // self-loop exercise the canonicalization
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (5L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)
    ).toDF("src", "dst")
    val row = Graph.componentCensus(edges).collect().head
    // n_nodes, n_edges, n_components, max_csize, n_dust, cover, conv
    assert(row.toSeq === Seq(8L, 7L, 3L, 3L, 3L, 1L, 1L),
      s"census drifted: $row")
    graft.operators.Q.releaseManaged()
  }

  test("connectedComponents: min-id labels, direction invariance") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (20L, 21L)
    ).toDF("src", "dst")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    val got = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, s"labels drifted: $got")
    // reversing every edge is the same undirected graph
    val rev = Graph.connectedComponents(
      edges.select(col("dst").as("src"), col("src").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev === want, "labels must be direction-invariant")
    graft.operators.Q.releaseManaged()
  }

  test("componentCensus: unconverged round budget trips converged_ok") {
    import spark.implicits._
    import graft.operators.Graph
    // a 30-node path needs several star rounds; ONE round cannot have
    // reached the fixpoint, and the contract bit must say so
    val path = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    val one = Graph.componentCensus(path, rounds = 1).collect().head
    assert(one.getLong(6) === 0L, s"1 round must be unconverged: $one")
    // the declared budget converges and finds the single component
    val full = Graph.componentCensus(path).collect().head
    assert(full.toSeq === Seq(30L, 29L, 1L, 30L, 0L, 1L, 1L),
      s"path census drifted: $full")
    graft.operators.Q.releaseManaged()
  }

  test("component store: merge ≡ contract-of-union; replay is a no-op") {
    import spark.implicits._
    import graft.operators.Graph
    val tmp = java.nio.file.Files.createTempDirectory("graft-ccstore")
    val e1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val e2 = Seq((3L, 4L), (11L, 12L), (20L, 21L)).toDF("src", "dst")
    try {
      Graph.writeComponentStore(spark, e1, "cc_store_t", s"$tmp")
      Graph.mergeComponentStore(spark, e2, "cc_store_t", s"$tmp")
      // the merge identity: stars(G₁) ∪ E₂ contracts to stars(G₁∪E₂)
      val store = spark.table("cc_store_t_stars")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Graph.connectedComponents(e1.unionByName(e2))
        .filter(col("node") =!= col("comp"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(store === full, "merged store must equal contract-of-union")
      // census off the store: {1,2,3,4}, {10,11,12}, {20,21}
      val c = Graph.storeCensus(spark, "cc_store_t").collect().head
      assert(c.toSeq === Seq(9L, 3L, 4L, 3L), s"store census: $c")
      // idempotency WITHOUT a ledger: re-merging an absorbed batch
      // rewrites the identical fixpoint
      Graph.mergeComponentStore(spark, e2, "cc_store_t", s"$tmp")
      val store2 = spark.table("cc_store_t_stars")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(store2 === store, "replayed merge must be a no-op")
      // fresh-session re-attach (the IndexCatalog discipline): the
      // catalog entry is session state, the parquet is the truth
      spark.sql("DROP TABLE IF EXISTS cc_store_t_stars")
      Graph.registerComponentStore(spark, "cc_store_t", s"$tmp")
      val c2 = Graph.storeCensus(spark, "cc_store_t").collect().head
      assert(c2.toSeq === c.toSeq,
        "re-attached store must serve the identical census")
      // and a merge driven through the re-attached entry still works
      Graph.mergeComponentStore(spark,
        Seq((21L, 22L)).toDF("src", "dst"), "cc_store_t", s"$tmp")
      val c3 = Graph.storeCensus(spark, "cc_store_t").collect().head
      assert(c3.toSeq === Seq(10L, 3L, 4L, 3L),
        s"post-re-attach merge census: $c3")
    } finally spark.sql("DROP TABLE IF EXISTS cc_store_t_stars")
  }

  test("kcoreCensus: triangle survives the 2-core, tendrils peel, 3-core empty") {
    import spark.implicits._
    import graft.operators.Graph
    // triangle {1,2,3} with a 2-hop tail 3-4-5: the 2-core strips the
    // tail layer by layer, the 3-core strips everything
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val rows = Graph.kcoreCensus(edges).collect()
    assert(rows(0).toSeq === Seq(2L, 3L, 3L, 6000L, 1L),
      s"2-core row: ${rows(0)}")
    assert(rows(1).toSeq === Seq(3L, 0L, 0L, 0L, 1L),
      s"3-core row: ${rows(1)}")
    // an exhausted round budget must trip converged_ok, not lie: one
    // round on a 12-node path leaves an unfinished peel
    val path = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val un = Graph.kcoreCensus(path, ks = Seq(2), rounds = 1)
      .collect().head
    assert(un.getLong(4) === 0L, s"1-round peel must be unconverged: $un")
    graft.operators.Q.releaseManaged()
  }

  test("kcoreCensus/rich-club: interlinked hubs read as a rich club") {
    import spark.implicits._
    import graft.operators.Graph
    // two 5-leaf stars whose hubs share an edge: the only deg>2 nodes
    // are the two hubs, and they are connected — a 2-node rich club
    // at density 10000 bp; no node reaches degree 9
    val edges = ((2L to 6L).map(l => (1L, l)) ++
      (11L to 15L).map(l => (10L, l)) :+ (1L, 10L)).toDF("src", "dst")
    val rows = graft.operators.Graph.kcoreCensus(edges, ks = Seq(2))
      .collect()
    // the 2-core of two bridged stars is empty (leaves peel, then the
    // hubs' remaining degree-1 bridge peels too)
    assert(rows(0).toSeq === Seq(2L, 0L, 0L, 0L, 1L),
      s"bridged-star 2-core: ${rows(0)}")
    val rc = Graph.richClub(edges).collect()
    // deg>2 and deg>4 clubs are exactly the two hubs, and they link:
    // a 2-node club at density 10000; nobody reaches degree 9
    assert(rc(0).toSeq === Seq(2L, 2L, 1L, 10000L), s"k=2: ${rc(0)}")
    assert(rc(1).toSeq === Seq(4L, 2L, 1L, 10000L), s"k=4: ${rc(1)}")
    assert(rc(2).toSeq === Seq(8L, 0L, 0L, 0L), s"k=8: ${rc(2)}")
    graft.operators.Q.releaseManaged()
  }

  test("CC and k-core agree with sequential references on seeded random graphs") {
    import spark.implicits._
    import graft.operators.Graph
    // star contraction vs union-find, distributed peel vs sequential
    // peel — the algorithmic-equivalence check the oracle's fixed
    // fixture can't give (the DedupSpec/AnnSpec discipline); fixed
    // seed keeps the suite deterministic
    val rnd = new scala.util.Random(1234L)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(30)
      val m = n + rnd.nextInt(2 * n)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("src", "dst")
      // union-find ground truth (min-label per component)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        if (a != b) {
          val ra = find(a.toInt); val rb = find(b.toInt)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val present = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1.toInt, e._2.toInt)).toSet
      val want = present.groupBy(find).values.flatMap { g =>
        val root = g.min.toLong; g.map(_.toLong -> root)
      }.toMap
      val got = Graph.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial: CC drifted from union-find")
      // sequential peel ground truth for the 2-core
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      var ref = und; var done = false
      while (!done) {
        val deg = ref.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (v, l) => v -> l.size }
        val keep = deg.filter(_._2 >= 2).keySet
        val ne = ref.filter(p => keep(p._1) && keep(p._2))
        done = ne == ref; ref = ne
      }
      val row = Graph.kcoreCensus(df, ks = Seq(2)).collect().head
      assert(row.getLong(2) === ref.size.toLong,
        s"trial $trial: 2-core edge count drifted")
      assert(row.getLong(1) ===
        ref.flatMap(p => Seq(p._1, p._2)).size.toLong,
        s"trial $trial: 2-core node count drifted")
      assert(row.getLong(4) === 1L, s"trial $trial: peel must converge")
      graft.operators.Q.releaseManaged()
    }
  }

  test("componentCensus: empty and self-loop-only graphs report zeros") {
    import spark.implicits._
    import graft.operators.Graph
    val empty = Graph.componentCensus(
      Seq((5L, 5L)).toDF("src", "dst")).collect().head
    assert(empty.toSeq === Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L),
      s"empty census: $empty")
    graft.operators.Q.releaseManaged()
  }

  test("triangleStats: wedge-free and empty graphs report zero, not null") {
    import spark.implicits._
    import graft.operators.Graph
    // single edge: 2 nodes, 1 edge, 0 wedges — gcc guard must emit 0
    val one = Graph.triangleStats(Seq((1L, 2L)).toDF("src", "dst"))
      .collect().head
    assert(one.toSeq === Seq(2L, 1L, 0L, 0L, 0L, 0L), s"one-edge: $one")
    // self-loops only → empty undirected set; every count is 0
    val empty = Graph.triangleStats(Seq((5L, 5L)).toDF("src", "dst"))
      .collect().head
    assert(empty.toSeq === Seq(0L, 0L, 0L, 0L, 0L, 0L), s"empty: $empty")
    graft.operators.Q.releaseManaged()
  }
}
