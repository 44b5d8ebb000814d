package graft.operators

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics beyond connected components — PageRank over
  * the part↔supplier bipartite graph implied by `lineitem` (who supplies
  * what; the reference has no graph surface at all, but any 100 TB
  * entity store grows one: link graphs for crawl prioritization,
  * citation/source graphs for corpus weighting).
  *
  * The rank arithmetic is EXACT INTEGER micro-units (damping 0.85 as
  * `(85·x) DIV 100`, per-edge contribution as `rank DIV degree`) — the
  * same cross-engine determinism discipline as `sim_label_centroids` /
  * `ta_tfidf`: truncating integer division is bit-identical in Spark and
  * DuckDB, while float PageRank would drift with summation order. The
  * truncation bleeds ≤1 micro-unit per edge per round — irrelevant to
  * ranking, priceless for the hash gate.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 3

  /** Fixed-iteration integer PageRank.
    *
    * 100 TB shape (same discipline as `Dedup.connectedComponents`):
    * the undirected edge list joins per round on `src`, so it is
    * repartitioned on that key ONCE and eagerly checkpointed — every
    * round's edges⋈ranks join reuses the pinned partitioning and only
    * the (smaller) rank side shuffles. Each round's rank checkpoint
    * truncates lineage; the previous round's blocks are dropped once
    * the new one materializes, keeping resident state O(|nodes|), not
    * O(rounds × |nodes|). Degrees ride along inside the edge
    * checkpoint, so the loop body is exactly one join + one partial
    * agg. */
  private[graft] def pageRank(lineitem: DataFrame, iters: Int = Iters): DataFrame = {
    val e = lineitem
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // static per-round build side: (src, dst, deg-of-src), partitioned on
    // the join key and pinned
    val edges = und.join(deg, "src").repartition(col("src")).checkpointFresh()
    // OPTIMIZATION r16 (guide §1.2 "the distributed algorithm" + §2.4):
    //   (a) rank₀ derives from the EDGES CHECKPOINT (distinct src over
    //       the pinned blocks — the key set of deg by construction)
    //       instead of re-running the whole und→deg corpus pass a
    //       second time just to initialize a constant column;
    //   (b) the FIXED-iteration loop is unrolled LAZILY — no per-round
    //       checkpoint. With a bounded round count the per-round
    //       materialization bought nothing (the convergence-stop
    //       variant below still checkpoints: its per-round isEmpty scan
    //       needs the blocks): the whole 3-round chain now runs as ONE
    //       job — same joins, same aggregates, same integer arithmetic,
    //       minus 3 block-manager materializations + 3 job schedulings.
    //       Plan depth is O(iters) but iters is a small constant; every
    //       round's agg re-partitions ranks on `id`, so each
    //       edges⋈ranks join still reuses the pinned `src` partitioning
    //       with zero extra exchange (verified in plans/r16).
    var ranks = edges.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1000000L))
    (1 to iters).foreach { _ =>
      // SHUFFLE_HASH on the rank side: a sort-merge join would re-SORT
      // the full edge list every round (the pinned partitioning spares
      // the exchange, not the sort); hash-building the |nodes|-sized
      // rank partitions keeps each round sort-free on the big side
      ranks = edges.join(ranks.hint("shuffle_hash"), edges("src") === ranks("id"))
        .select(col("dst"), expr("rank DIV deg").as("contrib"))
        .groupBy(col("dst").as("id"))
        .agg(expr("150000 + (85 * sum(contrib)) DIV 100").as("rank"))
    }
    ranks
      .select(
        when(col("id") % 2 === 0, "part").otherwise("supplier").as("entity"),
        expr("id DIV 2").as("entity_key"),
        col("rank").as("rank_micro"))
  }

  private val pagerankQ: Q = (s, d) => pageRank(Tables.lineitem(s, d))

  /** Max rounds for the `*_fix` convergence-stop variants. The declared
    * semantics are "the fixpoint, or the state after [[FixMaxRounds]]
    * synchronous rounds, whichever comes first" — and that is EXACTLY
    * what an oracle unrolled to [[FixMaxRounds]] computes, converged or
    * not: a converged state L has f(L) = L (the convergence test
    * L_c = L_{c−1} certifies f(L_{c−1}) = L_{c−1}), so every unrolled
    * round past c is an identity and round-maxRounds output equals the
    * early-stopped loop's output. Early stop is therefore purely a
    * COST optimization — at 100× scale the peel/propagation runs the
    * 2–4 rounds the data needs instead of a fixed guess, and the
    * declared answer never depends on how many rounds actually ran. */
  private val FixMaxRounds = 8

  /** [[pageRank]] with convergence-stop: iterate until the integer rank
    * table is EXACTLY unchanged (truncating integer arithmetic
    * quantizes, so exact equality is reachable) or [[FixMaxRounds]].
    * Returns the rounds actually executed for the early-stop spec.
    * Convergence test (r14 verdict item 7 — the old form launched a
    * SECOND |nodes|-join job per round, doubling job count): the
    * previous rank rides INTO the checkpointed next state as one extra
    * int64 column (the p_rank join runs inside the round's
    * materialization, both sides |nodes|-sized and id-partitioned), so
    * detecting the fixpoint is a scan of the blocks the round just
    * cached — no second join, no extra shuffle. The inner join is
    * total: undirected edges give every node an in-edge every round,
    * so next's id set always equals ranks'. */
  private[graft] def pageRankFix(lineitem: DataFrame,
      maxRounds: Int = FixMaxRounds): (DataFrame, Int) = {
    val e = lineitem
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = und.join(deg, "src").repartition(col("src")).checkpointFresh()
    // rank₀ from the edges checkpoint, not a second corpus pass — see
    // the [[pageRank]] optimization note (identical id set: deg's keys
    // are exactly the distinct src values)
    var ranks = edges.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1000000L))
      .checkpointFresh()
    var prevRound = ranks
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val nextCk = edges.join(ranks.hint("shuffle_hash"), edges("src") === ranks("id"))
        .select(col("dst"), expr("rank DIV deg").as("contrib"))
        .groupBy(col("dst").as("id"))
        .agg(expr("150000 + (85 * sum(contrib)) DIV 100").as("rank"))
        .join(ranks.select(col("id"), col("rank").as("p_rank"))
          .hint("shuffle_hash"), "id")
        .checkpointFresh()
      converged = nextCk.where(col("rank") =!= col("p_rank")).isEmpty
      // downstream rounds see only (id, rank); residency tracking stays
      // on the checkpointed frame itself
      ranks = nextCk.select(col("id"), col("rank"))
      graft.Checkpoints.drop(prevRound)
      prevRound = nextCk
      rounds += 1
    }
    (ranks.select(
      when(col("id") % 2 === 0, "part").otherwise("supplier").as("entity"),
      expr("id DIV 2").as("entity_key"),
      col("rank").as("rank_micro")), rounds)
  }

  private val pagerankFixQ: Q = (s, d) => pageRankFix(Tables.lineitem(s, d))._1

  /** Hot-node cap for the bipartite projection: a part supplied by m
    * suppliers contributes m·(m−1)/2 supplier pairs, so one
    * mega-degree node makes the projection quadratic (the same blow-up
    * as a boilerplate fingerprint in `dd_winnow` / a black frame in
    * `mm_frame_dupes`, and the cap carries the same justification: a
    * node connected to everything says nothing about affinity).
    * Mirrored verbatim in the oracle. */
  private val CoPartCap = 256

  /** Bipartite projection: the CO-SUPPLIER graph. Two suppliers are
    * linked when they supply ≥2 common parts; edge weight = the number
    * of shared parts. The projection every entity store eventually
    * needs (authors→co-authorship, docs sharing sources → corpus
    * affinity), and the one that dies quadratically at 100 TB unless
    * fan-out is bounded: pairs are generated PER PART (the self-join
    * keys on `partkey`, so it shuffles/buckets by part and each part
    * contributes deg² pairs locally), and parts hotter than
    * [[CoPartCap]] are excluded BEFORE pairing. TPC-H part-degree ≈ 4,
    * so the cap only arms on pathological data — but it is what keeps
    * the plan alive there. Ordered pairs (supp_a < supp_b), exact
    * shared-part counts, ≥2 threshold — all integer, hash-exact. */
  /** Projection core over an arbitrary (pk, sk) edge list — separated
    * so the cap behavior is testable on planted graphs.
    *
    * Shape: NOT a self-join (that would recompute the edge census for
    * both sides and sort-merge it); instead one groupBy collects each
    * part's supplier list via [[graft.functions.CappedSetAgg]] — a
    * collect_set whose AGGREGATION BUFFER is bounded at cap+1, not
    * just its output (plain collect_set would materialize a
    * mega-degree part's whole set on the reduce side before any size
    * filter could drop it) — then ordered pairs fan out NARROWLY from
    * the sorted list (deg²/2 per part, locally), and one partial-agg'd
    * groupBy counts shared parts per pair. Two shuffles total — the
    * census and the pair rollup — both ∝ their outputs, never
    * quadratic in a hot key, with per-group state ≤ cap+1 everywhere. */
  private val cappedSupplierSet =
    udaf(new graft.functions.CappedSetAgg(CoPartCap),
      org.apache.spark.sql.Encoders.scalaLong)

  /** The pair census all four graph queries share: per part, the capped
    * distinct supplier set; per unordered supplier pair, the shared-part
    * count. The fan-out and the rollup both run on PACKED LONG pair
    * keys ([[graft.functions.OrderedPairsPacked]]): one native pass
    * emits `min << 32 | max` per pair, and the count groupBy hashes a
    * primitive long instead of a two-field struct — measured 2× on the
    * full census vs the declarative struct fan-out it replaced. */
  private[graft] def pairCensus(e: DataFrame): DataFrame =
    e.groupBy("pk").agg(cappedSupplierSet(col("sk")).as("sks"))
      .where(size(col("sks")) <= CoPartCap)
      .select(explode(expr("ordered_pairs(sks)")).as("pp"))
      .groupBy("pp").agg(count(lit(1)).as("n_shared_parts"))
      .select(shiftright(col("pp"), 32).as("supp_a"),
        col("pp").bitwiseAND(lit(0x7FFFFFFFL)).as("supp_b"),
        col("n_shared_parts"))

  private[graft] def coSuppliersCore(e: DataFrame): DataFrame =
    pairCensus(e).where(col("n_shared_parts") >= 2)

  // no pre-distinct: collect_set dedupes (pk, sk) inside the census
  // aggregation itself, map-side partial — one shuffle fewer
  private val coSuppliers: Q = (s, d) =>
    coSuppliersCore(Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")))

  /** Neighbors kept per node in the kNN graph. The raw co-supplier
    * affinity graph is near-COMPLETE on TPC-H-shaped data (every
    * supplier pair shares parts — measured: 4,950 of 4,950 possible
    * edges at sf0.01 even at threshold ≥8), so any absolute-weight
    * threshold either keeps the clique or kills the graph. Top-k is
    * the construction that stays sparse at EVERY scale: |edges| ≤ n·k
    * by definition, and the mutual filter (keep a↔b only when each is
    * in the other's top-k) prunes asymmetric hub attraction — the
    * standard kNN-graph discipline from embedding pipelines, where
    * this graph feeds clustering and near-dup mining. */
  private val KnnK = 8

  /** Mutual top-[[KnnK]] affinity graph over an arbitrary (pk, sk)
    * bipartite edge list: nodes are sk values, affinity = number of
    * shared pk values, and an undirected edge survives only when each
    * endpoint ranks the other in its top-k by (weight DESC, id) — the
    * fully deterministic tie-break that makes the graph hash-exact.
    *
    * 100 TB shape: the pair census reuses [[coSuppliersCore]]'s capped
    * per-pk fan-out (bounded buffer, two output-proportional
    * shuffles); top-k is one row_number window partitioned by the
    * node id (shuffles the EDGE list, never the corpus, and each
    * partition's sort is bounded by the node's degree); mutuality is
    * one more groupBy on the unordered pair key — the pair survives
    * iff both directions kept it. Everything downstream inherits
    * degree ≤ k, which is what keeps wedge enumeration (n·k²) alive
    * where the raw clique would be n³. */
  private[graft] def mutualKnnCore(e: DataFrame): DataFrame = {
    val pairs = pairCensus(e).select(col("supp_a").as("sa"),
      col("supp_b").as("sb"), col("n_shared_parts").as("w"))
    // weights are symmetric: rank both directions from one ordered census
    val und = pairs.union(pairs.select(col("sb"), col("sa"), col("w")))
    val knn = und
      .withColumn("r", row_number().over(
        Window.partitionBy("sa").orderBy(col("w").desc, col("sb"))))
      .where(col("r") <= KnnK)
      .select("sa", "sb", "w")
    // mutuality WITHOUT a self-join: a directed edge appears at most
    // once, so the unordered pair appears exactly twice in knn iff
    // both endpoints kept each other — one partial-agg'd groupBy where
    // the join form would re-execute the whole census+window subtree
    // for the build side (w is symmetric, so max() just picks it up)
    knn.groupBy(least(col("sa"), col("sb")).as("supp_a"),
        greatest(col("sa"), col("sb")).as("supp_b"))
      .agg(count(lit(1)).as("n_dir"), max(col("w")).as("w"))
      .where(col("n_dir") === 2)
      .select(col("supp_a"), col("supp_b"), col("w").as("n_shared_parts"))
  }

  private val knnGraph: Q = (s, d) =>
    mutualKnnCore(Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")))

  /** The corpus-instantiated mutual-kNN graph, MATERIALIZED once per
    * lineitem snapshot through [[graft.ResultCache]] (round 10, the
    * `pl_dedup_signals` parent discipline): SIX declared queries
    * (triangles, labelprop ×2, kcore ×2, sssp) iterate over the same
    * graph, and each was re-running the full pair census + top-k
    * window + mutuality rollup just to get its edge list — the
    * sweep's largest redundant work. Consumers now read the committed
    * parquet (≤ n·k/2 id rows); `gr_knn_graph` itself stays the
    * inline construction, so the census plan remains declared
    * evidence (its plan spec pins the one-window shape), and
    * answer-invariance of cache-or-execute is the oracle-gated
    * `adv_cached_query` contract. */
  private def mutCached(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-result-cache"
    // the governing constants are IN the key (r10 advice): the cache
    // dir outlives the process, and a KnnK/CoPartCap change must
    // invalidate automatically, not wait on a hand-bumped tag
    graft.ResultCache.runCachedKeyed(
      s"mutualKnnGraph/k$KnnK/cap$CoPartCap/v1", Seq(li), dir)(
      mutualKnnCore(li.select(col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"))))._1
  }

  /** Triangle census over the mutual-kNN graph: per-node triangle
    * participation counts — the local-clustering signal that flags
    * tightly-bound communities (in a corpus affinity graph: template
    * families, mirror clusters) before an expensive community pass.
    *
    * Because [[mutualKnnCore]] bounds degree at k, the id-ordered
    * wedge join is all the orientation needed: edges carry a < b, a
    * wedge is (a,b)⋈(b,c) — so a < b < c and every triangle is
    * enumerated exactly once — and the closing (a,c) probe is a
    * semi-join. Work is Σ deg² ≤ n·k² wedges, each a few dozen bytes
    * of ids: linear in nodes at any scale. On the raw affinity clique
    * this query would be n³ — the kNN construction IS the scale plan. */
  private val triangles: Q = (s, d) => {
    // the mutual edge list is referenced three times (both wedge legs +
    // the closing probe); it is ≤ n·k/2 rows of ids, so materialize it
    // ONCE — without this the census + window subtree re-executes per
    // reference (same residency-visible discipline as pageRank's edges)
    val m = mutCached(s, d)
      .select(col("supp_a").as("a"), col("supp_b").as("b"))
      .checkpointFresh()
    val wedges = m.as("x")
      .join(m.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tri = wedges.join(m.as("z"),
      wedges("a") === col("z.a") && wedges("c") === col("z.b"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("suppkey"))
      .groupBy("suppkey")
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val LpaIters = 3

  /** Community detection by fixed-round synchronous label propagation
    * over the mutual-kNN graph — the cheap community pass that follows
    * [[triangles]]' clustering signal: every node starts as its own label
    * and each round adopts the label with the greatest total incident
    * edge weight among its neighbors, tie-broken by MIN label — fully
    * deterministic, so the fixed-point prefix is hash-exact
    * cross-engine (float-free by construction: weights are shared-part
    * counts).
    *
    * Synchronous LPA can oscillate on bipartite-ish structure; a FIXED
    * round count makes the declared semantics "labels after k rounds",
    * which is deterministic whether or not the underlying iteration
    * has converged (the production mitigation — per-round hash-parity
    * update schedules — changes which nodes update, not the per-node
    * rule declared here).
    *
    * 100 TB shape = [[pageRank]]'s loop verbatim: undirected edges
    * repartitioned on the probe key and checkpointed ONCE; each round
    * is one shuffle-hash join (label side builds) + one (dst, lbl)
    * partial agg + one combinable min(struct) argmax — the
    * `pl_skew_census` discipline, never a per-dst window over the edge
    * stream; per-round label checkpoints with previous-round drops
    * keep residency O(|nodes|). Degree ≤ k from the kNN construction
    * bounds every round's fan-in. */
  private[graft] def labelPropagate(mut: DataFrame, iters: Int = LpaIters): DataFrame = {
    val e = mut.select(col("supp_a").as("src"), col("supp_b").as("dst"),
      col("n_shared_parts").as("w"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val edges = und.repartition(col("src")).checkpointFresh()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .checkpointFresh()
    var prevRound = labels
    (1 to iters).foreach { i =>
      var next = edges.join(labels.hint("shuffle_hash"), edges("src") === labels("id"))
        .groupBy(col("dst"), col("lbl"))
        .agg(sum(col("w")).as("ws"))
        // argmax(ws), tie → min(lbl), as ONE combinable aggregate:
        // min over (−ws, lbl) struct ordering
        .groupBy(col("dst").as("id"))
        .agg(min(struct((-col("ws")).as("nw"), col("lbl").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("lbl"))
      // checkpoint every SECOND round, not every round: the checkpoint
      // exists to truncate lineage (it grows by two aggs + a join per
      // round) and bound resident state, and a depth-2 tail is still
      // O(1) — but each eager checkpoint is a full extra
      // materialization job over the label table, so halving the
      // cadence removes ~iters/2 jobs from the loop. The LAST round is
      // never checkpointed: the caller's consumption is the
      // materialization (same answers — cadence is residency policy,
      // not semantics).
      if (i % 2 == 0 && i < iters) {
        next = next.checkpointFresh()
        graft.Checkpoints.drop(prevRound)
        prevRound = next
      }
      labels = next
    }
    labels.select(col("id").as("suppkey"), col("lbl").as("community"))
  }

  private val labelProp: Q = (s, d) => labelPropagate(mutCached(s, d))

  /** [[labelPropagate]] with convergence-stop: iterate until NO label
    * changed (synchronous LPA can oscillate, so the [[FixMaxRounds]]
    * bound is load-bearing, not a formality) — same unrolled-oracle
    * equivalence as [[pageRankFix]], and the same in-round convergence
    * mechanics (r14 verdict item 7): the previous label rides into the
    * checkpointed next state, so the fixpoint test is a scan of the
    * blocks the round just cached instead of a second join job.
    * Checkpoints every round here (unlike the fixed-round variant's
    * depth-2 cadence) because the convergence scan reads each round's
    * materialized table. */
  private[graft] def labelPropagateFix(mut: DataFrame,
      maxRounds: Int = FixMaxRounds): (DataFrame, Int) = {
    val e = mut.select(col("supp_a").as("src"), col("supp_b").as("dst"),
      col("n_shared_parts").as("w"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val edges = und.repartition(col("src")).checkpointFresh()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .checkpointFresh()
    var prevRound = labels
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val nextCk = edges.join(labels.hint("shuffle_hash"), edges("src") === labels("id"))
        .groupBy(col("dst"), col("lbl"))
        .agg(sum(col("w")).as("ws"))
        .groupBy(col("dst").as("id"))
        .agg(min(struct((-col("ws")).as("nw"), col("lbl").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("lbl"))
        .join(labels.select(col("id"), col("lbl").as("p_lbl"))
          .hint("shuffle_hash"), "id")
        .checkpointFresh()
      converged = nextCk.where(col("lbl") =!= col("p_lbl")).isEmpty
      labels = nextCk.select(col("id"), col("lbl"))
      graft.Checkpoints.drop(prevRound)
      prevRound = nextCk
      rounds += 1
    }
    (labels.select(col("id").as("suppkey"), col("lbl").as("community")), rounds)
  }

  private val labelPropFixQ: Q = (s, d) => labelPropagateFix(mutCached(s, d))._1

  private val KcoreK = 4
  private val KcoreRounds = 3

  /** Fixed-round k-core peel over the mutual-kNN graph — the density
    * filter that follows [[triangles]]' clustering signal: each round
    * drops every node whose CURRENT degree is below k (and all its
    * edges), so survivors sit in increasingly dense neighborhoods
    * (cluster cores for community mining; in a corpus affinity graph,
    * the tight template/mirror families worth a closer look).
    *
    * Declared semantics are "the graph after [[KcoreRounds]] synchronous
    * peel rounds", not the fixpoint core — the same fixed-round
    * discipline as [[labelPropagate]]/[[pageRank]]: deterministic
    * whether or not peeling has converged (a fixpoint loop is the same
    * body run until no node drops; round count is the only knob).
    *
    * 100 TB shape = the family's loop verbatim: undirected edges
    * repartitioned on src and checkpointed once; each round is one
    * partial-agg'd degree count (the alive set, checkpointed — it
    * feeds BOTH endpoint filters, and without the pin the degree agg
    * would execute twice per round) + two shuffle-hash SEMI joins
    * (only ids move, never weights); per-round edge checkpoints with
    * previous-round drops keep residency O(|surviving edges|). */
  private[graft] def kcorePeel(mut: DataFrame, k: Int = KcoreK,
      rounds: Int = KcoreRounds): DataFrame = {
    val e = mut.select(col("supp_a").as("src"), col("supp_b").as("dst"))
    var edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).checkpointFresh()
    var prevRound = edges
    (1 to rounds).foreach { _ =>
      val alive = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("id"))
        .checkpointFresh()
      val next = edges
        .join(alive.hint("shuffle_hash"), edges("src") === alive("id"), "left_semi")
        .join(alive.hint("shuffle_hash"), edges("dst") === alive("id"), "left_semi")
        .checkpointFresh()
      graft.Checkpoints.drop(alive)
      graft.Checkpoints.drop(prevRound)
      edges = next
      prevRound = next
    }
    edges.groupBy(col("src").as("suppkey"))
      .agg(count(lit(1)).as("deg"))
  }

  private val kcore: Q = (s, d) => kcorePeel(mutCached(s, d))

  /** [[kcorePeel]] with convergence-stop: peel until NO edge was
    * dropped (peeling is monotone, so an unchanged edge COUNT certifies
    * the fixpoint — the cheapest possible convergence test, one count()
    * on a checkpointed table per round) or [[FixMaxRounds]]. This is
    * the TRUE k-core: at 100× scale 3 fixed rounds can sit far from
    * the core, while the peel typically needs only the few extra
    * rounds the degree distribution demands. Same unrolled-oracle
    * equivalence as [[pageRankFix]]. */
  private[graft] def kcorePeelFix(mut: DataFrame, k: Int = KcoreK,
      maxRounds: Int = FixMaxRounds): (DataFrame, Int) = {
    val e = mut.select(col("supp_a").as("src"), col("supp_b").as("dst"))
    var edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).checkpointFresh()
    var prevRound = edges
    var nEdges = edges.count()
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val alive = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("id"))
        .checkpointFresh()
      val next = edges
        .join(alive.hint("shuffle_hash"), edges("src") === alive("id"), "left_semi")
        .join(alive.hint("shuffle_hash"), edges("dst") === alive("id"), "left_semi")
        .checkpointFresh()
      val n = next.count()
      converged = n == nEdges
      nEdges = n
      graft.Checkpoints.drop(alive)
      graft.Checkpoints.drop(prevRound)
      edges = next
      prevRound = next
      rounds += 1
    }
    (edges.groupBy(col("src").as("suppkey"))
      .agg(count(lit(1)).as("deg")), rounds)
  }

  private val kcoreFixQ: Q = (s, d) => kcorePeelFix(mutCached(s, d))._1

  /** Multi-source BFS hop distance (unit-weight SSSP) over the mutual
    * kNN graph: every node whose id is ≡ 0 (mod 10) is a seed, and the
    * query reports each reachable node's minimum hop count to the seed
    * set — the "distance to a trusted core" signal (seed = curated
    * domains, verified suppliers, …) a pipeline uses to tier its
    * corpus. Frontier BFS with the [[kcorePeelFix]] residency
    * discipline: per-round frontier/settled checkpoints, previous
    * round's blocks dropped, early stop the first round the frontier
    * comes back empty (bounded by [[FixMaxRounds]]). A node found in
    * round k has hop distance exactly k, so no min() re-aggregation is
    * ever needed: the settled set is append-only — the BFS invariant —
    * and each round's work is one frontier-keyed join + one anti join
    * against the settled ids, id-only rows on both sides.
    *
    * Early stop ≡ the oracle's fixed [[FixMaxRounds]]-round unroll for
    * the usual reason: an empty frontier stays empty, so every
    * unrolled round past exhaustion contributes nothing. */
  private[graft] def ssspCore(mut: DataFrame,
      maxRounds: Int = FixMaxRounds): (DataFrame, Int) = {
    val e = mut.select(col("supp_a").as("src"), col("supp_b").as("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).checkpointFresh()
    val seeds = und.select(col("src").as("node")).distinct()
      .where(col("node") % 10 === 0)
      .select(col("node"), lit(0).as("hops"))
      .checkpointFresh()
    var dist = seeds
    var frontier = seeds
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      val next = frontier
        .join(und, frontier("node") === und("src"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
        .distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .checkpointFresh()
      if (next.count() == 0) {
        graft.Checkpoints.drop(next)
        done = true
      } else {
        val nd = dist.union(next).checkpointFresh()
        if (frontier ne dist) graft.Checkpoints.drop(frontier)
        graft.Checkpoints.drop(dist)
        dist = nd
        frontier = next
      }
      rounds += 1
    }
    // kcorePeelFix residency discipline at exit (r10 advice): only the
    // result's direct parent (dist, eagerly materialized by its own
    // localCheckpoint) may stay resident — drop the doubled edge list
    // (the query's largest resident object) and the final frontier.
    graft.Checkpoints.drop(und)
    if (frontier ne dist) graft.Checkpoints.drop(frontier)
    (dist.select(col("node").as("suppkey"), col("hops")), rounds)
  }

  private val ssspQ: Q = (s, d) => ssspCore(mutCached(s, d))._1

  val queries: Map[String, Q] = Map(
    "gr_sssp" -> ssspQ,
    "gr_pagerank" -> pagerankQ,
    "gr_pagerank_fix" -> pagerankFixQ,
    "gr_cosuppliers" -> coSuppliers,
    "gr_knn_graph" -> knnGraph,
    "gr_triangles" -> triangles,
    "gr_labelprop" -> labelProp,
    "gr_labelprop_fix" -> labelPropFixQ,
    "gr_kcore" -> kcore,
    "gr_kcore_fix" -> kcoreFixQ,
  )

  /** DuckDB replay: the three rounds unrolled as plain CTEs (aggregates
    * are not portable inside a recursive term), same integer ops. */
  val oracle: Map[String, String] = Map(
    // BFS unrolled to exactly FixMaxRounds (materialized CTEs — the
    // *_fix discipline): frontier k = unseen neighbors of frontier k−1,
    // found-in-round-k ⇔ hop distance k; rounds past exhaustion add
    // nothing, which is why the engine may early-stop
    "gr_sssp" -> {
      val rounds = (1 to FixMaxRounds).map { k =>
        s"""f$k AS MATERIALIZED (
              SELECT DISTINCT u.sb AS node
              FROM f${k - 1} f JOIN und2 u ON f.node = u.sa
              WHERE u.sb NOT IN (SELECT node FROM s${k - 1})),
            s$k AS MATERIALIZED (
              SELECT node FROM s${k - 1} UNION ALL SELECT node FROM f$k)"""
      }.mkString(",\n")
      s"""$knnOracleCtesMat,
          und2 AS MATERIALIZED (
            SELECT sa, sb FROM mut
            UNION ALL SELECT sb AS sa, sa AS sb FROM mut),
          f0 AS MATERIALIZED (
            SELECT DISTINCT sa AS node FROM und2 WHERE sa % 10 = 0),
          s0 AS MATERIALIZED (SELECT node FROM f0),
          $rounds
          SELECT node AS suppkey, hops FROM (
            SELECT node, 0 AS hops FROM f0
            ${(1 to FixMaxRounds).map(k =>
              s"UNION ALL SELECT node, $k AS hops FROM f$k").mkString(" ")})"""
    },
    "gr_pagerank" -> {
      // sum(BIGINT) widens to HUGEINT in DuckDB (then to float in the
      // driver's dataframe) — cast each round back to BIGINT
      val step = (prev: String, cur: String) =>
        s"""$cur AS (
             SELECT u.dst AS id,
               CAST(150000 + (85 * sum(r.rank // u.deg)) // 100 AS BIGINT) AS rank
             FROM $prev r JOIN und u ON u.src = r.id
             GROUP BY u.dst)"""
      s"""WITH e AS (
            SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM lineitem),
          undirected AS (
            SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
          deg AS (SELECT src, count(*) AS deg FROM undirected GROUP BY src),
          und AS (
            SELECT u.src, u.dst, d.deg FROM undirected u JOIN deg d USING (src)),
          r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS rank FROM deg),
          ${step("r0", "r1")},
          ${step("r1", "r2")},
          ${step("r2", "r3")}
          SELECT CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS entity,
            id // 2 AS entity_key, rank AS rank_micro
          FROM r3"""
    },
    // fixpoint variant: unrolled to EXACTLY FixMaxRounds — equal to the
    // engine's early-stopping loop whether or not it converged within
    // the bound (converged state is a fixpoint, so extra unrolled
    // rounds are identities; see pageRankFix's scaladoc)
    "gr_pagerank_fix" -> {
      val step = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
             SELECT u.dst AS id,
               CAST(150000 + (85 * sum(r.rank // u.deg)) // 100 AS BIGINT) AS rank
             FROM $prev r JOIN und u ON u.src = r.id
             GROUP BY u.dst)"""
      val steps = (1 to FixMaxRounds)
        .map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e AS MATERIALIZED (
            SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM lineitem),
          undirected AS MATERIALIZED (
            SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
          deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM undirected GROUP BY src),
          und AS MATERIALIZED (
            SELECT u.src, u.dst, d.deg FROM undirected u JOIN deg d USING (src)),
          r0 AS MATERIALIZED (SELECT src AS id, CAST(1000000 AS BIGINT) AS rank FROM deg),
          $steps
          SELECT CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS entity,
            id // 2 AS entity_key, rank AS rank_micro
          FROM r$FixMaxRounds"""
    },
    "gr_labelprop_fix" -> {
      val step = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
             SELECT id, lbl FROM (
               SELECT u.dst AS id, l.lbl, sum(u.w) AS ws,
                 row_number() OVER (
                   PARTITION BY u.dst ORDER BY sum(u.w) DESC, l.lbl) AS r
               FROM e2 u JOIN $prev l ON u.src = l.id
               GROUP BY u.dst, l.lbl)
             WHERE r = 1)"""
      val steps = (1 to FixMaxRounds)
        .map(i => step(s"l${i - 1}", s"l$i")).mkString(",\n")
      s"""$knnOracleCtesMat,
          e2 AS MATERIALIZED (
            SELECT sa AS src, sb AS dst, w FROM mut
            UNION ALL SELECT sb AS src, sa AS dst, w FROM mut),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM e2),
          $steps
          SELECT id AS suppkey, lbl AS community FROM l$FixMaxRounds"""
    },
    "gr_kcore_fix" -> {
      val peel = (prev: String, alive: String, next: String) =>
        s"""$alive AS MATERIALIZED (
             SELECT src AS id FROM $prev GROUP BY src
             HAVING count(*) >= $KcoreK),
           $next AS MATERIALIZED (
             SELECT p.src, p.dst FROM $prev p
             JOIN $alive x ON p.src = x.id
             JOIN $alive y ON p.dst = y.id)"""
      val steps = (1 to FixMaxRounds)
        .map(i => peel(s"g${i - 1}", s"a$i", s"g$i")).mkString(",\n")
      s"""$knnOracleCtesMat,
          g0 AS MATERIALIZED (
            SELECT sa AS src, sb AS dst FROM mut
            UNION ALL SELECT sb AS src, sa AS dst FROM mut),
          $steps
          SELECT src AS suppkey, count(*) AS deg FROM g$FixMaxRounds GROUP BY src"""
    },
    "gr_cosuppliers" ->
      s"""WITH e AS (
            SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
          capped AS (
            SELECT pk FROM e GROUP BY pk HAVING count(*) <= $CoPartCap),
          ec AS (SELECT e.pk, e.sk FROM e JOIN capped USING (pk))
          SELECT a.sk AS supp_a, b.sk AS supp_b, count(*) AS n_shared_parts
          FROM ec a JOIN ec b ON a.pk = b.pk AND a.sk < b.sk
          GROUP BY a.sk, b.sk
          HAVING count(*) >= 2""",
    "gr_knn_graph" ->
      s"""$knnOracleCtes
          SELECT sa AS supp_a, sb AS supp_b, w AS n_shared_parts FROM mut""",
    "gr_triangles" ->
      s"""$knnOracleCtes,
          tri AS (
            SELECT x.sa AS a, x.sb AS b, y.sb AS c
            FROM mut x
            JOIN mut y ON y.sa = x.sb
            WHERE EXISTS (
              SELECT 1 FROM mut z WHERE z.sa = x.sa AND z.sb = y.sb)),
          nodes AS (
            SELECT a AS suppkey FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
          SELECT suppkey, count(*) AS n_triangles FROM nodes GROUP BY suppkey""",
    "gr_labelprop" -> {
      // per-round argmax replayed as a post-agg window (row_number over
      // (sum DESC, lbl)) — semantically the min(−ws, lbl) struct pick
      val step = (prev: String, cur: String) =>
        s"""$cur AS (
             SELECT id, lbl FROM (
               SELECT u.dst AS id, l.lbl, sum(u.w) AS ws,
                 row_number() OVER (
                   PARTITION BY u.dst ORDER BY sum(u.w) DESC, l.lbl) AS r
               FROM e2 u JOIN $prev l ON u.src = l.id
               GROUP BY u.dst, l.lbl)
             WHERE r = 1)"""
      s"""$knnOracleCtes,
          e2 AS (
            SELECT sa AS src, sb AS dst, w FROM mut
            UNION ALL SELECT sb AS src, sa AS dst, w FROM mut),
          l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM e2),
          ${step("l0", "l1")},
          ${step("l1", "l2")},
          ${step("l2", "l3")}
          SELECT id AS suppkey, lbl AS community FROM l3"""
    },
    "gr_kcore" -> {
      // inner joins against the distinct alive-id set replay the semi
      // joins exactly
      val peel = (prev: String, alive: String, next: String) =>
        s"""$alive AS (
             SELECT src AS id FROM $prev GROUP BY src
             HAVING count(*) >= $KcoreK),
           $next AS (
             SELECT p.src, p.dst FROM $prev p
             JOIN $alive x ON p.src = x.id
             JOIN $alive y ON p.dst = y.id)"""
      s"""$knnOracleCtes,
          g0 AS (
            SELECT sa AS src, sb AS dst FROM mut
            UNION ALL SELECT sb AS src, sa AS dst FROM mut),
          ${peel("g0", "a1", "g1")},
          ${peel("g1", "a2", "g2")},
          ${peel("g2", "a3", "g3")}
          SELECT src AS suppkey, count(*) AS deg FROM g3 GROUP BY src"""
    },
  )

  /** Shared replay of [[mutualKnnCore]]: capped pair census, symmetric
    * fan-out, per-node top-k by (w DESC, id), mutual filter, a < b. */
  private def knnOracleCtes: String = knnOracleCtesWith("")

  /** As [[knnOracleCtes]] but with every CTE MATERIALIZED — required by
    * the unrolled `*_fix` oracles: DuckDB INLINES plain CTEs, and a
    * peel round that references its predecessor three times (once
    * directly, twice through the alive set) expands 3^8-fold by round
    * 8, re-opening the lineitem scan thousands of times ("Too many
    * open files", observed). Materialization keeps the replay linear
    * in rounds. */
  private def knnOracleCtesMat: String = knnOracleCtesWith("MATERIALIZED ")

  private def knnOracleCtesWith(m: String): String =
    s"""WITH e AS $m(
          SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        capped AS $m(
          SELECT pk FROM e GROUP BY pk HAVING count(*) <= $CoPartCap),
        ec AS $m(SELECT e.pk, e.sk FROM e JOIN capped USING (pk)),
        pairs AS $m(
          SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
          FROM ec a JOIN ec b ON a.pk = b.pk AND a.sk < b.sk
          GROUP BY a.sk, b.sk),
        und AS $m(
          SELECT sa, sb, w FROM pairs
          UNION ALL SELECT sb AS sa, sa AS sb, w FROM pairs),
        rk AS $m(
          SELECT sa, sb, w,
            row_number() OVER (PARTITION BY sa ORDER BY w DESC, sb) AS r
          FROM und),
        knn AS $m(SELECT sa, sb, w FROM rk WHERE r <= $KnnK),
        mut AS $m(
          SELECT least(sa, sb) AS sa, greatest(sa, sb) AS sb, max(w) AS w
          FROM knn GROUP BY 1, 2 HAVING count(*) = 2)"""
}
