package graft.operators

import graft.SparkSpec
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** One SparkSession, many concurrent queries — the multi-user contract a
  * shared driver actually faces. Pins that the SQL-path queries
  * (UUID-suffixed temp views: q23/q30/q31) and the checkpoint-using
  * two-phase scan don't trample each other's state when raced. */
class ConcurrencySpec extends SparkSpec {

  test("racing SQL-path and checkpoint-path queries returns each query's own answer") {
    val names = Seq("q23_corr_subquery", "q30_exists_semi", "q31_lateral_topn",
      "pl_pack_sequences")
    // sequential ground truth first
    val expected = names.map { n =>
      n -> graft.SparkEntry.queries(n)(spark, sfDir).count()
    }.toMap
    // then 2 racing rounds of all four in parallel
    (1 to 2).foreach { _ =>
      val futs = names.map { n =>
        Future(n -> graft.SparkEntry.queries(n)(spark, sfDir).count())
      }
      Await.result(Future.sequence(futs), 120.seconds).foreach { case (n, c) =>
        assert(c === expected(n), s"$n drifted under concurrency")
      }
    }
  }

  test("racing streaming parity queries keep their answers under the serialized conf override") {
    // the round-11 monitor fix: overlapping streaming starts save/set/
    // restore the shared session's shuffle-partition conf under one
    // lock — raced batch+stream queries must neither deadlock nor
    // drift, and the conf must come back to its original value
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val names = Seq("st_exact_dedup", "st_tumbling", "ev_sessions")
    val expected = names.map { n =>
      n -> graft.SparkEntry.queries(n)(spark, sfDir).count()
    }.toMap
    val futs = names.map { n =>
      Future(n -> graft.SparkEntry.queries(n)(spark, sfDir).count())
    }
    Await.result(Future.sequence(futs), 300.seconds).foreach { case (n, c) =>
      assert(c === expected(n), s"$n drifted under concurrency")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "state-partition override leaked into the shared session")
  }

  test("racing iterative operators never evict each other's checkpoints") {
    // pageRank and connectedComponents both localCheckpoint per round
    // (lineage TRUNCATED — an evicted block is unrecoverable, so a
    // cross-eviction is a query FAILURE, not a slowdown). The round-7
    // handle-based tracking (graft.Checkpoints) drops only the round's
    // own frame; the old registry set-diff raced exactly here.
    val names = Seq("gr_pagerank", "dd_components", "sim_kmeans_sq8")
    val expected = names.map { n =>
      n -> graft.SparkEntry.queries(n)(spark, sfDir).count()
    }.toMap
    (1 to 2).foreach { _ =>
      val futs = names.map { n =>
        Future(n -> graft.SparkEntry.queries(n)(spark, sfDir).count())
      }
      Await.result(Future.sequence(futs), 300.seconds).foreach { case (n, c) =>
        assert(c === expected(n), s"$n failed or drifted under concurrency")
      }
    }
  }
}
