package graft.operators

import graft.SparkSpec

/** Dedup suite: planted-duplicate synthetic checks + differential checks
  * between the exact and approximate variants on the driver corpus. */
class DedupSpec extends SparkSpec {

  test("exact dedup groups identical texts under one representative") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"), (4L, "alpha beta gamma"), (5L, "delta epsilon"),
      (6L, "unique text here")).toDF("doc_id", "text")
    val out = df.groupBy(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text").cast("binary")).as("fp"))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("rep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 3L), (3L, 2L), (6L, 1L)))
  }

  test("components: label propagation matches a local union-find") {
    val pairs = Dedup.queries("dd_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // local union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    // min-id canonical form
    val canon = want.groupBy(_._2).flatMap { case (_, m) =>
      val minId = m.keys.min; m.keys.map(_ -> minId)
    }
    val got = Dedup.queries("dd_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == canon)
    // cluster sizes consistent with the label map
    val sizes = Dedup.queries("dd_components")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySize = canon.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    sizes.foreach { case (_, c, n) => assert(bySize(c) == n) }
  }

  test("components: pointer jumping handles an adversarial chain graph") {
    import spark.implicits._
    // a length-120 path is the worst case for plain neighbor-min
    // propagation (120 rounds); pointer jumping must finish inside the
    // 50-round backstop, i.e. in O(log n)
    val chain = (1L until 120L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val residentBefore = spark.sparkContext.getPersistentRDDs.size
    val out = Dedup.connectedComponents(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 120)
    assert(out.forall(_._2 == 1L), "every chain node labels to the min id")
    assert(out.forall(_._3 == 120L))
    // resident state must be O(1) in rounds: a length-120 chain takes
    // multiple pointer-jumping rounds, but only the edges checkpoint and
    // the FINAL round's labels may stay resident — superseded rounds are
    // unpersisted as soon as their successor materializes
    val residentAfter = spark.sparkContext.getPersistentRDDs.size
    assert(residentAfter - residentBefore <= 2,
      s"expected <= 2 resident checkpoints (edges + final labels), " +
        s"got ${residentAfter - residentBefore} extra")
    // two disjoint cliques stay distinct components
    val two = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L)))
      .toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("containment: complete vs local brute force; catches subset-dups jaccard misses") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.split(' ').filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = sets.keys.toSeq.sorted
    // brute-force ground truth: the declared semantics carry NO candidate
    // contract (the asymmetric prefix filter must be complete)
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      (a, b) = (ids(i), ids(j))
      minSz = math.min(sets(a).size, sets(b).size)
      if minSz > 0
      inter = (sets(a) & sets(b)).size
      if inter.toDouble / minSz >= 0.9
    } yield (a, b, inter)).toSet
    val got = Dedup.queries("dd_containment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "corpus plants near-dups; containment must find them")
  }

  test("containment: a short doc quoted inside a long one is caught (jaccard can't)") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"            // 4 shingles
    val long = short + " " + (1 to 60).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-contain")
    Seq((1L, short, "en", "s", short.length.toLong),
        (2L, long, "en", "s", long.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("dd_containment")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), got.mkString(","))
    val jac = Dedup.queries("dd_ngram_jaccard")(spark, dir.toString).count()
    assert(jac === 0, "jaccard at 0.8 must not pair a 6-word doc with a 66-word doc")
  }

  test("minhash LSH pairs equal exact ngram-jaccard pairs on driver corpus") {
    val exact = Dedup.queries("dd_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.queries("dd_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  test("near-dup pairs (jaccard >= 0.9) are close in simhash space") {
    val nearDups = Dedup.queries("dd_ngram_jaccard")(spark, sfDir)
      .where("jaccard >= 0.9")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearDups.nonEmpty)
    val close = Dedup.simhashPairs(spark, sfDir, maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = nearDups.intersect(close)
    // SimHash over unigram token sets is coarser than shingle Jaccard;
    // require it to catch most true near-dups at a generous radius.
    assert(caught.size >= nearDups.size / 2,
      s"simhash caught ${caught.size} of ${nearDups.size} near-dups")
  }

  test("minhash signature similarity estimates jaccard") {
    import org.apache.spark.sql.functions._
    val sig = Dedup.minhashSignatures(spark, sfDir)
    val pairs = Dedup.queries("dd_ngram_jaccard")(spark, sfDir)
      .select("doc_a", "doc_b", "jaccard")
    val est = pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("minhash").as("mh_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("minhash").as("mh_b")), "doc_b")
      .withColumn("est", expr(
        "CAST(size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), b -> b)) AS DOUBLE) / 64"))
      .select("jaccard", "est").collect()
    est.foreach { r =>
      val (jac, e) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(jac - e) < 0.25,
        s"minhash estimate $e too far from true jaccard $jac")
    }
  }

  test("dd_simhash: native expression ≡ the vote-aggregation reference, zero exchanges") {
    import org.apache.spark.sql.functions._
    // the pre-round-8 batch implementation, kept as the differential
    // reference: explode distinct tokens -> md5-60-bit hash -> 60 per-bit
    // vote sums -> bit pack (a genuinely independent rendering of the
    // same declared hash semantics; the DuckDB oracle is a third)
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr("word_shingles(text, 1)")).as("t"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val votes = (0 until 60).map(j =>
      sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), 1).otherwise(-1)).as(s"v$j"))
    val bits = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
    val reference = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = Dedup.queries("dd_simhash")(spark, sfDir)
    val native = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == reference)
    // and the point of the expression: the signature pass is a narrow
    // projection — no exchange, no aggregate, inside the codegen span
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"), p)
    // "*(1)" is the whole-stage-codegen stage marker: the projection
    // runs inside the generated loop, not as an interpreted fallback
    assert(p.contains("*(1) Project"), p)
  }

  test("cross_lsh: decision rows equal the within-corpus pair set restricted to cross pairs") {
    // ground truth from the already-oracle-gated dd_minhash_lsh output:
    // every jac>=0.8 pair with exactly one incoming (doc_id%5==4) side,
    // collapsed to (incoming doc, partner count, best jaccard)
    val pairs = Dedup.queries("dd_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = pairs.flatMap { case (a, b, j) =>
      (a % 5 == 4, b % 5 == 4) match {
        case (true, false) => Some((a, j))
        case (false, true) => Some((b, j))
        case _             => None
      }
    }
    val want = cross.groupBy(_._1).map { case (id, g) =>
      (id, g.length.toLong, g.map(_._2).max)
    }.toSet
    val got = Dedup.queries("dd_cross_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }
}
