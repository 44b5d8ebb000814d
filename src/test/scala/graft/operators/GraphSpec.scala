package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integer-PageRank invariants: determinism, node coverage, mass
  * bounds, and the resident-state discipline the 100 TB path needs. */
class GraphSpec extends SparkSpec {

  test("pagerank: covers every node once, ranks bounded, deterministic") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val pr = Graph.queries("gr_pagerank")(spark, sfDir).cache()
    val nodes = li.select((col("l_partkey") * 2).as("id"))
      .union(li.select((col("l_suppkey") * 2 + 1).as("id")))
      .distinct().count()
    assert(pr.count() === nodes)
    assert(pr.select("entity", "entity_key").distinct().count() === nodes)
    // every rank gets the teleport floor; damped mass never exceeds the
    // uniform-start equilibrium (truncating division only loses mass)
    assert(pr.where(col("rank_micro") < 150000L).count() === 0)
    val total = pr.agg(sum("rank_micro")).head.getLong(0)
    assert(total <= nodes * 1000000L && total > nodes * 150000L, s"mass=$total")
    val again = Graph.queries("gr_pagerank")(spark, sfDir)
    assert(pr.exceptAll(again).count() === 0)
    assert(again.exceptAll(pr).count() === 0)
    pr.unpersist()
  }

  test("pagerank_fix: early-stops on a pre-converged regular graph") {
    import spark.implicits._
    // complete bipartite 2x2: every node has degree 2, so round 1
    // returns 150000 + 85 * (2 * 1000000/2) / 100 = 1000000 = the start
    // — already the fixpoint; the loop must detect it on round 1
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_partkey", "l_suppkey")
    val (pr, rounds) = Graph.pageRankFix(li)
    assert(rounds === 1, s"expected early stop at round 1, ran $rounds")
    assert(pr.where(col("rank_micro") =!= 1000000L).count() === 0)
  }

  test("pagerank_fix: equals the unrolled fixed-round form at the bound on the corpus") {
    // the oracle-equivalence claim, engine-side: the early-stopping loop
    // and a fixed 8-round run must agree whether or not convergence
    // happened inside the bound
    val (fixed, rounds) = Graph.pageRankFix(
      graft.sources.Tables.lineitem(spark, sfDir))
    assert(rounds >= 1 && rounds <= 8)
    val unrolled = Graph.pageRank(
      graft.sources.Tables.lineitem(spark, sfDir), iters = 8)
    assert(fixed.exceptAll(unrolled).count() === 0)
    assert(unrolled.exceptAll(fixed).count() === 0)
  }

  test("kcore_fix: early-stops when nothing peels, and reaches the true core") {
    import spark.implicits._
    // complete graph K5 (as a < b pairs): every degree is 4 = KcoreK,
    // nothing ever peels -> fixpoint detected after one no-op round
    val mut = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b, 2L))
      .toDF("supp_a", "supp_b", "n_shared_parts")
    val (core, rounds) = Graph.kcorePeelFix(mut)
    assert(rounds === 1, s"expected early stop at round 1, ran $rounds")
    assert(core.count() === 5)
    assert(core.where(col("deg") =!= 4).count() === 0)
    // a pendant path peels and the loop reports its real round count:
    // K5 plus 5-6-7 — nodes 6 (deg 2) and 7 (deg 1) are both below
    // k=4 and fall together in round 1; round 2 confirms the fixpoint
    val chain = mut.union(Seq((5L, 6L, 2L), (6L, 7L, 2L))
      .toDF("supp_a", "supp_b", "n_shared_parts"))
    val (core2, rounds2) = Graph.kcorePeelFix(chain)
    assert(rounds2 === 2, s"peel+confirm should take 2 rounds, ran $rounds2")
    assert(core2.select("suppkey").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("labelprop_fix: converges on a symmetric triangle and matches its own fixpoint") {
    import spark.implicits._
    val mut = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
      .toDF("supp_a", "supp_b", "n_shared_parts")
    val (labels, rounds) = Graph.labelPropagateFix(mut)
    assert(rounds < 8, s"triangle LPA should converge before the bound, ran $rounds")
    // fixpoint: everyone ends in one community
    assert(labels.select("community").distinct().count() === 1)
    // and because the converged state is a fixpoint, running the fixed
    // 8-round form lands on the same labels
    val eight = Graph.labelPropagate(mut, iters = 8)
      .withColumnRenamed("community", "c8")
    val joined = labels.join(eight, "suppkey")
    assert(joined.where(col("community") =!= col("c8")).count() === 0)
  }

  test("pagerank: a hub out-ranks a leaf on a planted star graph") {
    import spark.implicits._
    // star: part 1 supplied by suppliers 1..10; part 2 by supplier 1 only
    val li = (1 to 10).map(sk => (1L, sk.toLong)) :+ ((2L, 1L))
    val pr = Graph.pageRank(
      li.toDF("l_partkey", "l_suppkey"), iters = 3).cache()
    def rank(entity: String, key: Long): Long =
      pr.where(col("entity") === entity && col("entity_key") === key)
        .head.getAs[Long]("rank_micro")
    assert(rank("part", 1L) > rank("part", 2L))
    assert(rank("supplier", 1L) > rank("supplier", 2L))
    pr.unpersist()
  }

  test("pagerank: only the final round's checkpoint stays resident") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val pr = Graph.pageRank(graft.sources.Tables.lineitem(spark, sfDir))
    pr.count()
    val added = sc.getPersistentRDDs.keySet.toSet -- before
    // edges checkpoint + final ranks checkpoint only — intermediate
    // rounds must have been dropped (the CC residency discipline)
    assert(added.size <= 2, s"resident checkpoints: ${added.size}")
  }

  test("mutual knn: asymmetric hub edges are pruned; triangles exact on a planted graph") {
    import spark.implicits._
    // hub 100 with 10 neighbors at strictly decreasing affinity
    // (weight 11-i to neighbor i): the hub's top-8 is {1..8}, but every
    // neighbor's top-8 contains the hub — so edges (9,100) and (10,100)
    // are exactly the ones the MUTUAL filter must drop. One extra part
    // shared by {1,2} closes the single triangle {1,2,100}.
    var part = 0L
    val hubEdges = (1 to 10).flatMap { i =>
      (1 to (11 - i)).flatMap { _ =>
        part += 1
        Seq((part, 100L), (part, i.toLong))
      }
    }
    part += 1
    val e = (hubEdges ++ Seq((part, 1L), (part, 2L))).toDF("pk", "sk")
    val mut = Graph.mutualKnnCore(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (1 to 8).map(i => (i.toLong, 100L, (11 - i).toLong)).toSet +
      ((1L, 2L, 1L))
    assert(mut == expected, mut.toString)

    // triangle census through the declared query shape: plant the same
    // graph via a temp view is overkill — drive the core directly
    val m = Graph.mutualKnnCore(e)
      .select(org.apache.spark.sql.functions.col("supp_a").as("a"),
        org.apache.spark.sql.functions.col("supp_b").as("b"))
    val wedges = m.as("x")
      .join(m.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tri = wedges.join(m.as("z"),
      wedges("a") === col("z.a") && wedges("c") === col("z.b"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 100L)), tri.toString)
  }

  test("gr_triangles: census is deterministic and every count is positive") {
    val t1 = Graph.queries("gr_triangles")(spark, sfDir).cache()
    assert(t1.count() > 0)
    assert(t1.where(col("n_triangles") <= 0).count() === 0)
    val t2 = Graph.queries("gr_triangles")(spark, sfDir)
    assert(t1.exceptAll(t2).count() === 0 && t2.exceptAll(t1).count() === 0)
    t1.unpersist()
  }

  test("labelprop: planted cliques resolve to two communities across a weak bridge") {
    import spark.implicits._
    // two weight-5 triangles {1,2,3} and {10,11,12}, bridged by a
    // weight-1 edge (3,10). Hand-traced under the declared rule
    // (argmax neighbor-label weight, tie → min label):
    //   r1: 1→2, 2→1, 3→1, 10→11, 11→10, 12→10
    //   r2: 1→1, 2→1, 3→1, 10→10, 11→10, 12→10
    //   r3: fixed point — the bridge weight never outvotes the clique
    val mut = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (10L, 11L, 5L), (10L, 12L, 5L), (11L, 12L, 5L),
      (3L, 10L, 1L),
    ).toDF("supp_a", "supp_b", "n_shared_parts")
    val got = Graph.labelPropagate(mut).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), got.toString)
  }

  test("gr_labelprop: covers every kNN node once, labels are nodes, deterministic") {
    val c1 = Graph.queries("gr_labelprop")(spark, sfDir).cache()
    val nodes = Graph.queries("gr_knn_graph")(spark, sfDir)
      .selectExpr("supp_a AS s").union(
        Graph.queries("gr_knn_graph")(spark, sfDir).selectExpr("supp_b AS s"))
      .distinct()
    assert(c1.count() === nodes.count())
    // every community label is itself a graph node (labels only ever
    // copy ids, never invent them)
    assert(c1.join(nodes, c1("community") === nodes("s"), "left_anti").count() === 0)
    val c2 = Graph.queries("gr_labelprop")(spark, sfDir)
    assert(c1.exceptAll(c2).count() === 0 && c2.exceptAll(c1).count() === 0)
    c1.unpersist()
  }

  test("kcore: a planted clique survives the peel, its pendant fringe does not") {
    import spark.implicits._
    // K5 clique {1..5} (degree 4 everywhere) + a pendant node 20 on 1 +
    // a 3-path {30,31,32}. With k=4: round 1 drops 20/30/31/32 (deg<4);
    // clique degrees stay 4 (the pendant edge leaves node 1 at 5->4);
    // rounds 2-3 are fixed point. Survivors: the clique at degree 4.
    val cliq = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b, 1L)
    val mut = (cliq ++ Seq((1L, 20L, 1L), (30L, 31L, 1L), (31L, 32L, 1L)))
      .toDF("supp_a", "supp_b", "n_shared_parts")
    val got = Graph.kcorePeel(mut).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === (1L to 5L).map(_ -> 4L).toMap, got.toString)
  }

  test("gr_kcore: survivors are kNN nodes, degrees bounded by the kNN k, deterministic") {
    val c1 = Graph.queries("gr_kcore")(spark, sfDir).cache()
    assert(c1.count() > 0)
    // a peel survivor's remaining degree can never exceed the kNN bound
    assert(c1.where("deg > 8").count() === 0)
    val nodes = Graph.queries("gr_knn_graph")(spark, sfDir)
      .selectExpr("supp_a AS s").union(
        Graph.queries("gr_knn_graph")(spark, sfDir).selectExpr("supp_b AS s"))
      .distinct()
    assert(c1.join(nodes, c1("suppkey") === nodes("s"), "left_anti").count() === 0)
    val c2 = Graph.queries("gr_kcore")(spark, sfDir)
    assert(c1.exceptAll(c2).count() === 0 && c2.exceptAll(c1).count() === 0)
    c1.unpersist()
  }

  test("kcore plan: a peel round is two shuffle-hash SEMI joins, never sort-merge") {
    // the declared query materializes each round eagerly (checkpoint),
    // so its FINAL plan is just the pinned aggregate — assert the
    // round BODY's shape on an identically-constructed frame instead
    import org.apache.spark.sql.functions._
    val e = Graph.queries("gr_knn_graph")(spark, sfDir)
      .selectExpr("supp_a AS src", "supp_b AS dst")
    val und = e.union(e.selectExpr("dst AS src", "src AS dst"))
    val alive = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= 4).select(col("src").as("id"))
    val round = und
      .join(alive.hint("shuffle_hash"), und("src") === alive("id"), "left_semi")
      .join(alive.hint("shuffle_hash"), und("dst") === alive("id"), "left_semi")
    round.collect()
    val p = round.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LeftSemi"), s"no semi join in peel round:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a peel round sort-merged (the hint failed):\n$p")
  }

  test("cosuppliers: a hot part past the cap contributes zero pairs; weights are exact") {
    import spark.implicits._
    // planted bipartite graph:
    //   part 1: 300 suppliers (100..399) — OVER the 256 cap; alone it
    //     would emit 300*299/2 = 44,850 pairs, all meaningless affinity
    //   parts 2,3: both supplied by suppliers {1, 2}  -> (1,2) weight 2
    //   parts 4,5,6: supplied by {3, 4}               -> (3,4) weight 3
    //   part 7: supplied by {1, 3} only               -> weight-1 pair, filtered
    val hot = (100 to 399).map(s => (1L, s.toLong))
    val e = (hot ++ Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
        (4L, 3L), (4L, 4L), (5L, 3L), (5L, 4L), (6L, 3L), (6L, 4L),
        (7L, 1L), (7L, 3L)))
      .toDF("pk", "sk")
    val got = Graph.coSuppliersCore(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (3L, 4L, 3L)), got.toString)
  }

  test("sssp: exact hop levels on a planted path, unreachable stays absent") {
    import spark.implicits._
    // path 10-11-12-13-14 (seed = 10, the only %10==0 node) plus a
    // disconnected pair 21-22: hops = position on the path, the pair
    // is unreachable and must NOT appear
    val mut = Seq((10L, 11L, 1L), (11L, 12L, 1L), (12L, 13L, 1L),
        (13L, 14L, 1L), (21L, 22L, 1L))
      .toDF("supp_a", "supp_b", "n_shared_parts")
    val (dist, rounds) = Graph.ssspCore(mut)
    val got = dist.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(10L -> 0, 11L -> 1, 12L -> 2, 13L -> 3, 14L -> 4))
    // 4 expanding rounds + the exhaustion round that detects the stop
    assert(rounds === 5, s"path eccentricity 4 should take 5 rounds, ran $rounds")
  }

  test("sssp: early-stops immediately when the seeds already cover the graph") {
    import spark.implicits._
    // every node %10==0 -> frontier 0 covers everything; round 1 finds
    // no unseen neighbor and the loop stops
    val mut = Seq((10L, 20L, 1L), (20L, 30L, 1L))
      .toDF("supp_a", "supp_b", "n_shared_parts")
    val (dist, rounds) = Graph.ssspCore(mut)
    assert(rounds === 1, s"pre-covered graph should stop after 1 round, ran $rounds")
    assert(dist.where(col("hops") =!= 0).count() === 0)
    assert(dist.count() === 3)
  }

  test("sssp: hop bound respected and early stop equals the full unroll on the corpus") {
    val mut = Graph.queries("gr_knn_graph")(spark, sfDir)
    val (a, ra) = Graph.ssspCore(mut)
    // a larger bound must change NOTHING once the frontier is exhausted
    val (b, rb) = Graph.ssspCore(mut, maxRounds = 12)
    assert(ra <= 8 && rb <= 12)
    val sa = a.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val sb = b.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(sa == sb)
    assert(sa.nonEmpty)
    assert(sa.forall(_._2 <= 8))
  }
}
