package graft.operators

import graft.SparkSpec

/** Text analysis: language-ID discrimination on multilingual synthetic
  * text, winnowing guarantees on planted near-dups. */
class TextAnalysisSpec extends SparkSpec {

  test("language ID discriminates clearly-flagged languages") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat and the dog is of a kind that is in the house"),
      (2L, "el perro y la casa de que en un momento los dias"),
      (3L, "der hund und die katze das ist von ein haus zu haus"),
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("x")
    // reuse the query body by pointing it at a temp documents table
    val tmp = java.nio.file.Files.createTempDirectory("graft-langid")
    df.withColumn("lang", org.apache.spark.sql.functions.lit("?"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.queries("ta_lang_id")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("winnowing: near-dup docs share fingerprints, distinct docs few") {
    import org.apache.spark.sql.functions._
    val nearDups = Dedup.queries("dd_ngram_jaccard")(spark, sfDir)
      .where("jaccard >= 0.9")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val fps = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "winnow_fingerprints(text, 5, 4) AS fps")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    nearDups.foreach { case (a, b) =>
      val overlap = (fps(a) & fps(b)).size.toDouble / math.min(fps(a).size, fps(b).size)
      assert(overlap >= 0.5, s"near-dup pair ($a,$b) fp overlap $overlap")
    }
    // a guaranteed-by-construction property: shared token run >= k+w-1
    // always yields a shared fingerprint
    val self = fps.head._2
    assert(self.nonEmpty)
  }

  test("winnowing density: far fewer fingerprints than k-grams") {
    val stats = TextAnalysis.queries("ta_winnow")(spark, sfDir)
      .selectExpr("avg(n_fp) AS nf").head.getDouble(0)
    val tokens = TextAnalysis.queries("ta_token_stats")(spark, sfDir)
      .selectExpr("avg(n_tokens) AS nt").head.getDouble(0)
    assert(stats < tokens / 2, s"fingerprints $stats vs tokens $tokens")
  }

  test("zipf: dense ranks, monotone frequencies, exact corpus mass in the head") {
    import org.apache.spark.sql.functions._
    val z = TextAnalysis.queries("ta_zipf")(spark, sfDir).cache()
    // 31-term synthetic vocabulary < 50 → the head IS the whole vocabulary
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
      .cache()
    assert(z.count() === math.min(50L, vocab.distinct().count()))
    assert(z.agg(sum("n")).head.getLong(0) === vocab.count())
    val rows = z.orderBy("rank").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("rank") === i + 1)
      assert(r.getAs[Long]("rank_x_freq") === (i + 1) * r.getAs[Long]("n"))
    }
    assert(rows.sliding(2).forall(p =>
      p.head.getAs[Long]("n") >= p.last.getAs[Long]("n")))
    vocab.unpersist(); z.unpersist()
  }

  test("quality gate: flags recompute from parts, every rule splits, keep is the AND") {
    import org.apache.spark.sql.functions._
    val g = TextAnalysis.queries("ta_quality_gate")(spark, sfDir).cache()
    assert(g.count() === graft.sources.Tables.documents(spark, sfDir).count())
    // the in-row top-bigram count must equal ta_repetition's
    // shuffle-computed one on every doc it covers (≥2 tokens)
    val rep = TextAnalysis.queries("ta_repetition")(spark, sfDir)
      .select(col("doc_id"), col("top_bigram_n").as("rep_top"))
    val drift = g.join(rep, "doc_id").where(col("top_bigram_n") =!= col("rep_top"))
    assert(drift.count() === 0, drift.take(3).mkString("\n"))
    // keep is exactly the conjunction
    assert(g.where(col("keep") =!=
      (col("len_ok") && col("word_len_ok") && col("stop_ok") && col("rep_ok")))
      .count() === 0)
    // calibration: the gate neither passes nor drops everything, and
    // each rule individually rejects at least one doc
    val kept = g.where(col("keep")).count()
    assert(kept > 0 && kept < g.count(), s"kept=$kept of ${g.count()}")
    for (rule <- Seq("len_ok", "word_len_ok", "stop_ok", "rep_ok"))
      assert(g.where(!col(rule)).count() > 0, s"$rule never fires")
    g.unpersist()
  }

  test("typicality: df algebra closes — hapax total equals df=1 bigrams") {
    import org.apache.spark.sql.functions._
    val t = TextAnalysis.queries("ta_typicality")(spark, sfDir).cache()
    // every distinct bigram contributes df ≥ 1 → sum_df ≥ n_bigrams,
    // milli-average ≥ 1000; hapax can't exceed the doc's bigram count
    assert(t.where(col("sum_df") < col("n_bigrams") ||
      col("typicality_milli") < 1000 ||
      col("n_hapax") > col("n_bigrams")).count() === 0)
    // cross-doc closure: summed per-doc hapax = number of corpus bigrams
    // with document frequency exactly 1 (each lives in exactly one doc)
    val bg = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr("word_shingles(text, 2)")).as("bg"))
    val df1 = bg.groupBy("bg").agg(count(lit(1)).as("df"))
      .where(col("df") === 1).count()
    assert(t.agg(sum("n_hapax")).head.getLong(0) === df1)
    t.unpersist()
  }

  test("bpe_learn: merge table equals a local replay of the declared semantics") {
    import org.apache.spark.sql.functions._
    // local reimplementation: word census -> 4 rounds of (pair rollup,
    // best pick, one-pass delimited replace). Java String.replace is the
    // same left-to-right non-overlapping scan as SQL replace, so this is
    // a genuine third implementation of the declared contract.
    val census = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("explode(filter(split(text, ' '), t -> t <> '')) AS w")
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var seqs = census.map { case (w, c) =>
      (c, " " + w.map(ch => s"$ch ").mkString) }
    val expected = (1 to 4).map { m =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (wc, seq) =>
        seq.trim.split(' ').sliding(2).foreach {
          case Array(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + wc
          case _ =>
        }
      }
      val ((x, y), n) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      seqs = seqs.map { case (wc, seq) =>
        (wc, seq.replace(s" $x $y ", s" $x$y ")) }
      (m, x, y, n)
    }
    val got = TextAnalysis.queries("ta_bpe_learn")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("bpe_apply: per-doc symbol counts equal a local encode with the learned merges") {
    val merges = TextAnalysis.queries("ta_bpe_learn")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    def encodeLen(w: String): Int = {
      var seq = " " + w.map(ch => s"$ch ").mkString
      merges.foreach { case (x, y) => seq = seq.replace(s" $x $y ", s" $x$y ") }
      seq.trim.split(' ').length
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(' ').filter(_.nonEmpty)).toMap
    val got = TextAnalysis.queries("ta_bpe_apply")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = docs(r.getLong(0))
      assert(r.getInt(1) == toks.length)
      assert(r.getLong(2) == toks.map(encodeLen).map(_.toLong).sum,
        s"doc ${r.getLong(0)} symbol count drift")
    }
    // the learned merges must actually compress: fewer symbols than chars
    val chars = docs.values.map(_.map(_.length.toLong).sum).sum
    val symbols = got.map(_.getLong(2)).sum
    assert(symbols < chars)
  }

  test("bpe_vocab: dictionary-sized, contains the merged symbols, closes the mass loop") {
    val vocab = TextAnalysis.queries("ta_bpe_vocab")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = TextAnalysis.queries("ta_bpe_learn")(spark, sfDir)
      .collect().map(r => r.getString(1) + r.getString(2))
    // every learned merge survives as a vocabulary symbol UNLESS a later
    // merge consumed every occurrence (e.g. 'h e'->'he' then 'he y'->'hey'
    // leaves zero free-standing 'he') — in that case the symbol must be a
    // component of that later merge, not silently gone
    merges.zipWithIndex.foreach { case (m, i) =>
      val consumedLater = merges.drop(i + 1).exists(l => l != m && l.contains(m))
      assert(vocab.contains(m) || consumedLater,
        s"merged symbol $m neither in vocab nor consumed by a later merge")
    }
    // total symbol mass equals the encode pass's total symbol count
    val applyMass = TextAnalysis.queries("ta_bpe_apply")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_symbols")).head.getLong(0)
    assert(vocab.values.sum == applyMass)
    // dictionary-sized: alphabet + merges, nowhere near corpus-sized
    assert(vocab.size < 100, s"vocab unexpectedly large: ${vocab.size}")
  }

  test("bpe: merge symbols containing quotes/backslashes survive SQL rendering") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus engineered so the learned merges CONTAIN ' and \ — the
    // characters that break naive SQL-literal interpolation (apostrophes
    // are common in natural text: the "'s" pair). Expected rounds:
    //   wc: a'b=5, c\d=4, plain=1
    //   r1: (a,')=5 ties (',b)=5 -> lexicographic x: "'" wins -> 'b
    //   r2: (a,'b)=5 -> a'b     r3: (\,d)=4 ties (c,\) -> \d
    //   r4: (c,\d)=4 -> c\d
    val df = Seq(
      (1L, "a'b a'b a'b a'b a'b"),
      (2L, "c\\d c\\d c\\d c\\d"),
      (3L, "plain"),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("?")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe-esc")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val merges = TextAnalysis.queries("ta_bpe_learn")(spark, tmp.toString)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    // the trap must actually arm: quote and backslash symbols were learned
    assert(merges.exists { case (x, y) => (x + y).contains("'") })
    assert(merges.exists { case (x, y) => (x + y).contains("\\") })

    // encode through the learned chain (would throw a parse error or
    // silently mangle the search strings without literal escaping)
    val got = TextAnalysis.queries("ta_bpe_apply")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def encodeLen(w: String): Long = {
      var seq = " " + w.map(ch => s"$ch ").mkString
      merges.foreach { case (x, y) => seq = seq.replace(s" $x $y ", s" $x$y ") }
      seq.trim.split(' ').length.toLong
    }
    val docs = df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty))
    docs.foreach { case (id, toks) =>
      assert(got(id) == toks.map(encodeLen).sum, s"doc $id encode drift")
    }
    // vocab mass still closes over the quoted/backslashed symbols
    val vocab = TextAnalysis.queries("ta_bpe_vocab")(spark, tmp.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.contains("a'b") && vocab.contains("c\\d"), s"vocab $vocab")
    assert(vocab.values.sum == got.values.sum)
    // the scalable (broadcast-table) encode is immune by construction —
    // symbol values never pass through the parser; must agree exactly
    val scaled = TextAnalysis.queries("ta_bpe_apply_scaled")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scaled == got, s"scaled $scaled vs literal $got")
  }

  test("bpe scalable encode ≡ sequential chain at a 64-merge model") {
    import org.apache.spark.sql.functions._
    // learn a PRODUCTION-SHAPED merge budget on the corpus (the 31-word
    // sf0.001 vocabulary supports ~160 merges before pair exhaustion)
    val table = TextAnalysis.bpeLearnN(spark, sfDir, 64)
    val merges = table.collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.length == 64, s"corpus exhausted at ${merges.length} merges")
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("w"))
      .distinct()
    val got = TextAnalysis.encodeCensusScaled(spark, table, words)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // third implementation: the sequential chain replayed in the JVM —
    // Java String.replace is the same one-pass non-overlapping scan as
    // the declared SQL replace semantics
    def encodeLen(w: String): Long = {
      var seq = " " + w.map(ch => s"$ch ").mkString
      merges.foreach { case (x, y) => seq = seq.replace(s" $x $y ", s" $x$y ") }
      seq.trim.split(' ').length.toLong
    }
    val ws = words.collect().map(_.getString(0))
    assert(ws.nonEmpty && got.size == ws.length)
    ws.foreach { w =>
      assert(got(w) == encodeLen(w),
        s"word '$w': scaled ${got(w)} vs sequential ${encodeLen(w)}")
    }
    // the deep model must actually compress further than the 4-merge one
    val n4 = TextAnalysis.queries("ta_bpe_apply")(spark, sfDir)
      .agg(sum("n_symbols")).head.getLong(0)
    val n64 = ws.map(encodeLen).sum
    assert(n64 < n4, s"64-merge encode $n64 not tighter than 4-merge $n4")
  }

  test("bm25: top-3 per doc equals a local replay, scores bit-exact") {
    // replay the declared rational-BM25 with plain Scala doubles in the
    // SAME expression order the query (and its oracle) spell — the
    // engine's codegen'd arithmetic must be bit-identical
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    val totalDl = docs.map(_._2.length.toLong).sum
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, g) => ((id, t), g.length.toLong) }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, g) => (t, g.size.toLong) }
    val want = docs.flatMap { case (id, toks) =>
      val dl = toks.length
      toks.distinct.map { t =>
        val tfv = tf((id, t)).toDouble
        val dfv = df(t)
        val score = ((nDocs.toDouble - dfv + 0.5) / (dfv + 0.5)) *
          ((tfv * 2.2) / (tfv + 1.2 * (0.25 + (0.75 * dl * nDocs) / totalDl)))
        (id, t, score)
      }.sortBy { case (_, t, sc) => (-sc, t) }.take(3)
        .zipWithIndex.map { case ((i, t, sc), k) => (i, t, sc, k + 1) }
    }.toSet
    val got = TextAnalysis.queries("ta_bm25")(spark, sfDir)
      .select("doc_id", "term", "score", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val extra = got -- want
    val missing = want -- got
    assert(extra.isEmpty && missing.isEmpty,
      s"extra=${extra.take(5).mkString(";")} missing=${missing.take(5).mkString(";")}")
    assert(got.nonEmpty)
  }
}
