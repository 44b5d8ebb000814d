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
}
