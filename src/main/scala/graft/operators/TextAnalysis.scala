package graft.operators

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language ID, quality scoring, token
  * counting, fingerprinting). The reference's only text analysis is its
  * two tokenizers (`count_functions.py:2`, `fernan/functions.py:5`);
  * everything here is the declared extension surface.
  *
  * All ops are single-pass, per-row, codegen'd `functions._` expressions:
  * no shuffle at all (narrow transformations), so they scale linearly
  * with input splits at any data size. Ratios are single integer
  * divisions → bit-deterministic against the DuckDB oracle.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens with empties dropped — the reference's
    * `str.split()` semantics. */
  private val tokExpr = "filter(split(text, ' '), t -> t <> '')"

  // Tiny per-language stopword profiles for the n-gram/stopword
  // language-ID heuristic. Fixed lists, shared verbatim with the oracle.
  private val stop = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))
  private val langs = Seq("en", "es", "fr", "de", "zh")

  private def inList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")

  /** Token counting: total, distinct, type-token ratio, mean token
    * length. One narrow pass; at 100 TB this is scan-bound. */
  private val tokenStats: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("tok", expr(tokExpr))
      .selectExpr(
        "doc_id",
        "size(tok) AS n_tokens",
        "size(array_distinct(tok)) AS n_distinct",
        "size(array_distinct(tok)) / size(tok) AS ttr",
        "aggregate(tok, 0L, (acc, t) -> acc + length(t)) / size(tok) AS mean_tok_len")

  /** Quality scoring: length saturation + stopword density — the
    * standard cheap pre-filter for web-scale corpora. */
  private val quality: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("tok", expr(tokExpr))
      .withColumn("n_tokens", expr("size(tok)"))
      .withColumn("stop_ratio",
        expr(s"size(filter(tok, t -> t IN (${inList(stop("en"))}))) / size(tok)"))
      .selectExpr(
        "doc_id", "n_tokens", "stop_ratio",
        // CAST keeps both engines in pure-double arithmetic (bare decimal
        // literals divide as DECIMAL in Spark but DOUBLE in DuckDB)
        "0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) + 0.5 * stop_ratio AS quality")

  /** Language ID: stopword-profile hit counts per language, argmax with
    * fixed precedence (en > es > fr > de > zh on ties). */
  private val langId: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .withColumn("tok", expr(tokExpr))
    val withScores = langs.foldLeft(scored) { (df, l) =>
      df.withColumn(s"s_$l",
        expr(s"size(filter(tok, t -> t IN (${inList(stop(l))})))"))
    }
    val pred = langs.init.foldRight(expr(s"'${langs.last}'")) { (l, rest) =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      when(expr(ge), lit(l)).otherwise(rest)
    }
    withScores.withColumn("pred_lang", pred)
      .select("doc_id", "s_en", "s_es", "s_fr", "s_de", "s_zh", "pred_lang")
  }

  /** Document fingerprinting: md5 over whitespace-normalized text — the
    * exact-dedup key for content-addressed corpora. */
  private val fingerprint: Q = (s, d) =>
    Tables.documents(s, d).selectExpr(
      "doc_id",
      "md5(CAST(trim(regexp_replace(text, '\\\\s+', ' ')) AS BINARY)) AS fp")

  /** Winnowing fingerprints (Schleimer et al. — see
    * [[graft.functions.WinnowFingerprints]]): the robust near-dup
    * fingerprint set (any shared run of ≥ k+w−1 tokens shares a
    * fingerprint). Hash-verified: the k-gram hash is an md5 prefix and
    * window-minima selection is pure SQL, so the DuckDB oracle replays
    * the whole scheme. Output is scalar-only (count + md5 signature of
    * the sorted set) so the harness canonicalizes rows; the raw array
    * set is exercised by [[graft.operators.Dedup]]'s winnow path. */
  private val winnow: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("fps", expr("winnow_fingerprints(text, 5, 4)"))
      .selectExpr(
        "doc_id",
        "size(fps) AS n_fp",
        "md5(array_join(fps, ',')) AS fp_sig")

  /** Corpus-level top-20 bigrams (deterministic tie-break on the bigram
    * itself). explode → partial-agg count → global top-k: the shuffle
    * carries one row per distinct bigram per partition, and
    * TakeOrderedAndProject avoids a full sort. */
  private val bigrams: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(expr("word_shingles(text, 2)")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** TF-IDF term scoring, top-3 terms per doc: per-(doc, term) counts →
    * corpus document frequency → score. Two shuffles (doc-term agg,
    * term df join), both key-partitioned; the df side is a term
    * dictionary (small vs the corpus — broadcastable at any scale after
    * a df floor).
    *
    * Score is tf·N/df via CAST(tf*N AS DOUBLE)/df — a single integer
    * division, bit-deterministic cross-engine, monotone in the usual
    * tf·log(N/df) for fixed tf (log is avoided because Java's and C's
    * libm may differ in the last ulp, which the hash compare would
    * catch). */
  private lazy val tfidf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(expr(tokExpr)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", expr("CAST(tf * n_docs AS DOUBLE) / df"))
      .withColumn("rnk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))))
      .where(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  /** BM25 term ranking (Robertson–Spärck Jones weighting as used by
    * Lucene/Elasticsearch; k1 = 1.2, b = 0.75), top-3 terms per doc —
    * the retrieval-grade upgrade of [[tfidf]]: tf saturates instead of
    * growing linearly, and long documents are normalized by
    * `dl / avgdl`. The idf factor is kept in its RATIONAL form
    * `(N − df + 0.5)/(df + 0.5)` — a strictly monotone transform of
    * the usual `log(…)` for fixed tf, so the top-k per doc is the
    * BM25 top-k, while every arithmetic step stays an IEEE-754
    * add/mul/div over integers and exactly-representable constants:
    * the oracle spells the IDENTICAL expression tree, so both engines
    * produce bit-equal doubles (`ln` differs in the last ulp across
    * libm implementations — the same reason tfidf avoids it).
    *
    * 100 TB shape: same as tfidf — two partial-agg'd groupBys (tf, df),
    * one term-keyed join (df is vocab-sized, usually broadcast-able by
    * AQE; no forced hint since vocab grows with the corpus), a 1-row
    * corpus-stats broadcast, and a per-doc top-3 window whose partition
    * is doc-sized. */
  private lazy val bm25: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE per pass: `tk` is materialized by the projection,
    // so the stats leg and the tf leg each split the text a single
    // time (size+explode over the same expr would re-parse per row —
    // generators don't CSE with project expressions)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), expr(tokExpr).as("tk"))
    val stats = toks.select(size(col("tk")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val tf = toks
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .crossJoin(broadcast(stats))
      // constants carry the D suffix: Spark parses a bare `0.75` as
      // DECIMAL(2,2) and decimal division rounds at scale 6 — the
      // oracle (and IEEE) answer needs every step in DOUBLE
      .withColumn("score", expr(
        "((CAST(n_docs AS DOUBLE) - df + 0.5D) / (df + 0.5D)) * " +
          "((tf * 2.2D) / (tf + 1.2D * (0.25D + (0.75D * dl * n_docs) / total_dl)))"))
      .withColumn("rnk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))))
      .where(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  /** BPE-style pre-tokenization counting — the GPT-2 pre-tokenizer
    * shape (public pattern family: contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs), restricted to
    * constructs Java regex and RE2 interpret identically (no lookahead,
    * ASCII classes). The per-doc token count is what a training
    * pipeline budgets against; tokens-per-whitespace-word measures
    * fragmentation. Narrow one-pass op, scan-bound at any scale. */
  private val bpePattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  private lazy val bpeTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("bpe", expr(s"regexp_extract_all(text, \"$bpePattern\", 0)"))
      .withColumn("ws", expr(tokExpr))
      .selectExpr(
        "doc_id",
        "size(bpe) AS n_bpe_tokens",
        "size(ws) AS n_ws_tokens",
        "size(bpe) / size(ws) AS fragmentation")

  /** Inverted index (posting lists): term → sorted doc ids + df, for
    * terms with df ≥ 5 (the dictionary floor that keeps the index
    * bounded by content-bearing terms). One explode + one groupBy; the
    * posting list ships as a joined string so the oracle canonicalizes
    * it identically. At 100 TB posting lists for stopword-grade terms
    * explode state — the df floor here is where a real pipeline also
    * caps or tiers them. */
  private lazy val invertedIndex: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(s"array_distinct($tokExpr)")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))
      .where(col("df") >= 5)

  /** Bigram-typicality scoring — the language-model-perplexity-style
    * quality filter, kept in exact integer arithmetic: per doc, how
    * common are its word bigrams in the whole corpus? Per doc (over its
    * DISTINCT bigrams — `word_shingles` dedups), reports the summed
    * document frequency (`sum_df`), the count of bigrams occurring in
    * no other doc (`n_hapax` — high = novel or garbled), and a
    * per-bigram average in integer milli-units. A real pipeline maps
    * these through -log downstream; the monotone integer form is
    * declared because cross-engine libm log differs in the last ulp
    * (same reasoning as [[tfidf]]).
    *
    * 100 TB shape: distinct bigrams → df rollup (partial agg) → one
    * bigram-keyed shuffle join back onto the instances → doc-keyed
    * re-agg. The df side is a bounded dictionary after a frequency
    * floor; stopword-grade bigrams are the skew keys and ride the same
    * salting discipline as every hot-key join here. */
  private lazy val typicality: Q = (s, d) => {
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr("word_shingles(text, 2)")).as("bg"))
    val df = bg.groupBy("bg").agg(count(lit(1)).as("df"))
    bg.join(df, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("df")).as("sum_df"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .selectExpr("doc_id", "n_bigrams", "CAST(sum_df AS BIGINT) AS sum_df",
        "CAST(n_hapax AS BIGINT) AS n_hapax",
        "(1000 * sum_df) DIV n_bigrams AS typicality_milli")
  }

  /** Composite quality GATE (the Gopher-rule shape): the per-doc
    * keep/drop decision table a corpus pipeline actually ships, with
    * one boolean per rule so downstream can audit WHY a doc dropped —
    * length bounds, mean-token-length band, minimum stopword evidence,
    * and the within-doc repetition cap. Thresholds are corpus-calibrated
    * (documents: 10–99 tokens, mean length 3.7–5.3 chars, 22% of docs
    * under 2 stopword hits) so every rule genuinely splits.
    *
    * All comparisons are INTEGER cross-multiplications (`1000·chars ≥
    * 3000·n`, `1000·top ≤ 125·bigrams`) — no division, no float, so the
    * booleans are bit-stable cross-engine (the `ev_anomaly` z-test
    * discipline applied to filtering).
    *
    * 100 TB shape: ZERO exchanges — the top-bigram count stays INSIDE
    * the row via array ops (per-doc work bounded by doc length², here
    * ≤10⁴) instead of the explode→groupBy→groupBy shuffle pair
    * `ta_repetition` uses for the corpus-wide report. For a gate that
    * feeds a WHERE clause, per-row compute beats two shuffles at any
    * scale: the filter composes with pushdown and the scan stays the
    * only stage. */
  private lazy val qualityGate: Q = (s, d) =>
    Tables.documents(s, d)
      .selectExpr("doc_id",
        "word_ngrams(text, 1) AS tok", "word_ngrams(text, 2) AS bgs")
      .selectExpr("doc_id",
        "size(tok) AS n_tokens",
        "aggregate(tok, 0L, (a, t) -> a + length(t)) AS n_chars_tok",
        s"size(filter(tok, t -> t IN (${inList(stop("en"))}))) AS n_stop",
        "size(bgs) AS n_bigrams",
        """CASE WHEN size(bgs) = 0 THEN 0L
            ELSE aggregate(array_distinct(bgs), 0L,
                   (m, b) -> greatest(m, CAST(size(filter(bgs, x -> x = b)) AS BIGINT)))
            END AS top_bigram_n""")
      .selectExpr("doc_id", "n_tokens", "n_stop", "n_bigrams", "top_bigram_n",
        "n_tokens BETWEEN 32 AND 100000 AS len_ok",
        """n_tokens > 0 AND 1000 * n_chars_tok >= 3000 * n_tokens
           AND 1000 * n_chars_tok <= 5000 * n_tokens AS word_len_ok""",
        "n_stop >= 2 AS stop_ok",
        "1000 * top_bigram_n <= 125 * n_bigrams AS rep_ok")
      .selectExpr("*",
        "len_ok AND word_len_ok AND stop_ok AND rep_ok AS keep")

  /** Zipf rank-frequency head: the top-50 corpus terms with their rank
    * and the rank·frequency product (near-constant under Zipf's law —
    * the one-glance sanity check that a corpus is natural-ish text and
    * the tokenizer isn't broken). All integers. Same shuffle shape as
    * [[bigrams]]: explode → partial-agg count → global top-k; the
    * window ranks only the 50 surviving rows. */
  private lazy val zipf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(explode(expr(tokExpr)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("term"))))
      .withColumn("rank_x_freq", col("rank") * col("n"))
  }

  val queries: Map[String, Q] = Map(
    "ta_token_stats" -> tokenStats,
    "ta_quality" -> quality,
    "ta_lang_id" -> langId,
    "ta_fingerprint" -> fingerprint,
    "ta_winnow" -> winnow,
    "ta_bigrams" -> bigrams,
    "ta_repetition" -> repetition,
    "ta_char_stats" -> charStats,
    "ta_tfidf" -> tfidf,
    "ta_bm25" -> bm25,
    "ta_inverted_index" -> invertedIndex,
    "ta_bpe_tokens" -> bpeTokens,
    "ta_bpe_learn" -> bpeLearn,
    "ta_bpe_apply" -> bpeApply,
    "ta_bpe_apply_scaled" -> bpeApplyScaled,
    "ta_bpe_vocab" -> bpeVocab,
    "ta_typicality" -> typicality,
    "ta_quality_gate" -> qualityGate,
    "ta_zipf" -> zipf,
  )

  /** Renders a data-derived string as a Spark SQL string LITERAL.
    * Learned merge symbols are arbitrary non-space substrings of corpus
    * text — a winning symbol containing `'` (apostrophes are common:
    * the "'s" pair) or `\` would otherwise break the parse or be
    * silently mangled by escape processing. Spark literals process
    * backslash escapes by default (`escapedStringLiterals=false`), so
    * both characters need escaping. The DuckDB oracle is immune by
    * construction (symbols flow through CTE values, never literals). */
  private def sqlLit(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** The learned merges applied to a word `w` as ONE literal SQL
    * expression: the rank-ordered replace chain over the delimited
    * symbol string. Runs [[bpeLearn]] (bounded 4-row driver
    * materialization) at plan-build time; shared by [[bpeApply]] and
    * [[bpeVocab]] so the declared merge semantics have exactly one
    * Spark-side rendering. */
  private def learnedMergeExpr(s: SparkSession, d: String): String = {
    val merges = bpeLearn(s, d).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    merges.foldLeft("' ' || regexp_replace(w, '(.)', '$1 ')") {
      case (acc, (x, y)) =>
        s"replace($acc, ${sqlLit(s" $x $y ")}, ${sqlLit(s" $x$y ")})"
    }
  }

  /** The learned VOCABULARY — the artifact a tokenizer ships: every
    * symbol surviving the merges with its corpus occurrence count
    * (word-census counts re-weighted through the same literal replace
    * chain as [[bpeApply]]). |symbols| ≈ |alphabet| + |merges| rows, so
    * the output is dictionary-sized at any corpus size; the spec closes
    * the mass loop (Σ n_occurrences = Σ `ta_bpe_apply.n_symbols`). */
  private lazy val bpeVocab: Q = (s, d) => {
    val merged = learnedMergeExpr(s, d)
    Tables.documents(s, d)
      .select(explode(expr(tokExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(explode(expr(s"split(trim($merged), ' ')")).as("symbol"), col("wc"))
      .groupBy("symbol").agg(sum(col("wc")).as("n_occurrences"))
  }

  /** ENCODE with the learned merges — the tokenizer story's second
    * half: [[bpeLearn]]'s 4 merges applied in rank order to every
    * document's words, reporting the per-doc symbol count under the
    * learned vocabulary next to the whitespace token count. A training
    * pipeline budgets sequence lengths against exactly this number.
    *
    * The learned pairs are collected (4 rows — the same bounded model
    * materialization as [[bpeLearn]]) and folded in as the literal
    * [[learnedMergeExpr]] chain, so the whole encode is ONE narrow
    * codegen'd projection over the corpus: no join, no shuffle,
    * scan-bound at any scale. The oracle re-derives the same 4 merges
    * via the learn CTEs and applies them through a CROSS JOIN of the
    * four 1-row tables — learning is deterministic, so literal-vs-CTE
    * is the same model. */
  private lazy val bpeApply: Q = (s, d) => {
    val merged = learnedMergeExpr(s, d)
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        s"size($tokExpr) AS n_ws_tokens",
        s"""aggregate(transform($tokExpr, w -> size(split(trim($merged), ' '))),
            0L, (acc, x) -> acc + CAST(x AS BIGINT)) AS n_symbols""")
  }

  /** Scalable encode against an ARBITRARY-size merge table — the form
    * that survives a production 32k-merge vocabulary, where
    * [[learnedMergeExpr]]'s literal chain would build an
    * O(|merges|)-deep expression tree before the first task runs.
    *
    * Shape: encode the distinct-word CENSUS (|vocab| rows, never the
    * corpus), joining the merge table (BROADCAST — a 32k-row dictionary
    * is KBs) instead of folding it into the plan. Each round, every
    * word finds the LOWEST-rank merge applicable to its current symbol
    * sequence (adjacent-pair explode → broadcast join → min(struct)
    * argmin, the partial-agg discipline) and applies that ONE merge via
    * the same declared one-pass delimited `replace` — with the pattern
    * built from COLUMNS (`' ' || left_sym || ' ' || ...`), so symbol
    * values never pass through the SQL parser at all. Rounds needed =
    * max merges APPLICABLE to any single word ≤ max word length — a
    * 20-char word exhausts in ≤19 rounds no matter whether the table
    * has 4 or 32k rows. Plan depth per round is O(1) (each round
    * re-plans from the previous round's checkpoint; previous blocks
    * dropped by handle).
    *
    * EXACT sequential semantics needs one guard: a per-word RANK CURSOR
    * (`cur`), because each merge in the declared chain is a SINGLE
    * one-pass replace — overlapping occurrences sharing a delimiter
    * space survive it (" x y x y " → " xy x y "), so without the cursor
    * the loop would re-apply rank r to the survivor where the
    * sequential chain has already moved past r. With it, the two forms
    * are provably equal on any VALID learned table (a later merge can
    * only create adjacencies involving its own new symbol, which
    * earlier-rank patterns cannot reference), which the differential
    * spec exercises at 64 learned merges.
    *
    * 100 TB: one corpus scan for the census groupBy (shuffle ∝
    * |vocab|), ≤ max-word-length census-sized rounds with a broadcast
    * join each, then one corpus scan joining tokens against the encoded
    * dictionary. The corpus is never re-shuffled. */
  private[operators] def encodeCensusScaled(
      s: SparkSession, mergeTable: DataFrame, words: DataFrame): DataFrame = {
    val mt = broadcast(mergeTable
      .select(col("merge_rank"), col("left_sym"), col("right_sym")))
    var ckpt = words.select(col("w"))
      .withColumn("seq", expr("' ' || regexp_replace(w, '(.)', '$1 ')"))
      .withColumn("cur", lit(0))
      .checkpointFresh()
    var remaining = 1L
    while (remaining > 0) {
      val lowest = ckpt
        .select(col("w"), col("cur"), expr("split(trim(seq), ' ')").as("a"))
        .where(size(col("a")) >= 2)
        .select(col("w"), col("cur"), explode(expr(
          """transform(sequence(1, size(a) - 1),
             i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y))"""))
          .as("pr"))
        .join(mt, col("pr.x") === col("left_sym") &&
                  col("pr.y") === col("right_sym") &&
                  col("merge_rank") > col("cur"))
        .groupBy("w")
        .agg(min(struct(col("merge_rank"), col("left_sym"),
          col("right_sym"))).as("m"))
      // OPTIMIZATION r16: materialize the (small) argmin table FIRST
      // and stop BEFORE the apply join when it is empty — the old form
      // learned the loop was done only by running one extra full
      // join + census checkpoint whose every row came out unchanged
      // (lowest empty ⇒ every m NULL ⇒ seq/cur identical), i.e. the
      // final round was provably a no-op. Same rounds otherwise: the
      // old `remaining` (words that just applied) equals the new one
      // (words with an applicable merge) — both are |lowest|.
      val lw = lowest.checkpointFresh()
      remaining = lw.count()
      if (remaining == 0L) graft.Checkpoints.drop(lw)
      else {
        val next = ckpt.join(lw, Seq("w"), "left")
          .select(col("w"),
            expr("""CASE WHEN m IS NULL THEN seq ELSE
                      replace(seq, ' ' || m.left_sym || ' ' || m.right_sym || ' ',
                              ' ' || m.left_sym || m.right_sym || ' ') END""").as("seq"),
            expr("CASE WHEN m IS NULL THEN cur ELSE m.merge_rank END").as("cur"))
          .checkpointFresh()
        graft.Checkpoints.drop(ckpt)
        graft.Checkpoints.drop(lw)
        ckpt = next
      }
    }
    ckpt.select(col("w"),
      expr("size(split(trim(seq), ' '))").cast("long").as("n_syms"))
  }

  /** [[bpeApply]]'s declared output computed through the scalable
    * encode: same learned 4-merge model, same per-doc symbol counts,
    * same oracle SQL — but the merge model flows as a broadcast TABLE,
    * not plan literals. The corpus-side finish is ONE scan:
    * `explode_outer` keeps zero-token docs as a null-token row (so
    * they emit the same (0, 0) row as [[bpeApply]] without a second
    * corpus scan + self join on doc_id — the plan audit showed that
    * variant paying two corpus-wide sort-merge joins), tokens
    * left-join the |vocab|-sized encoded dictionary (broadcast-able at
    * realistic vocab sizes; a shuffle join on `w` otherwise), and one
    * partial-agg'd groupBy sums per doc. Grouping carries
    * `n_ws_tokens` alongside `doc_id` — functionally dependent, so it
    * adds no groups, and the one shuffle moves (doc_id, counts) rows. */
  private lazy val bpeApplyScaled: Q = (s, d) => {
    val dict = encodeCensusScaled(s, bpeLearn(s, d),
      Tables.documents(s, d).select(explode(expr(tokExpr)).as("w")).distinct())
    Tables.documents(s, d)
      .select(col("doc_id"), expr(s"size($tokExpr)").as("n_ws_tokens"),
        explode_outer(expr(tokExpr)).as("w"))
      .join(broadcast(dict), Seq("w"), "left")
      .groupBy("doc_id", "n_ws_tokens")
      .agg(sum(coalesce(col("n_syms"), lit(0L))).as("n_symbols"))
      .select("doc_id", "n_ws_tokens", "n_symbols")
  }

  /** Distributed BPE merge LEARNING — [[bpeTokens]] applies a fixed
    * pre-tokenizer; this learns the merge table itself, the iterative
    * shape (per-round rollup → broadcast model update → re-segment)
    * shared with `sim_kmeans_sq8` / `gr_pagerank`. [[BpeMerges]] rounds;
    * each round counts adjacent symbol pairs over the WORD CENSUS
    * (distinct words × corpus frequency — the standard BPE-learning
    * compaction: re-segmenting a word re-segments all its occurrences),
    * picks the most frequent pair (ties: lexicographic on left then
    * right symbol), and merges it into the census's symbol sequences.
    *
    * DECLARED merge semantics (mirrored in the oracle): symbols live in
    * a space-delimited string (" h e y "), and a merge is ONE
    * left-to-right non-overlapping `replace` of " x y " with " xy " —
    * identical scan semantics in Spark and DuckDB, so the learned table
    * is bit-identical cross-engine. This differs from canonical BPE
    * only inside runs of a repeated symbol ("aaaa": the one-pass form
    * merges alternating occurrences; canonical greedy re-scans), a
    * corner that does not affect which pair wins on natural text and is
    * declared away for cross-engine exactness.
    *
    * The per-round driver materialization is exactly ONE row (the
    * winning pair — the broadcast-model-update discipline, like
    * collecting k centroids per Lloyd's round); folding it in as a
    * literal keeps each round's plan one narrow `replace` over the
    * census, not a nested self-referencing subtree.
    *
    * 100 TB shape: the only corpus-sized job is the initial tokenize →
    * word-census groupBy (partial-agg'd, shuffle ∝ |vocab|); every
    * round after that runs on the census (|vocab| rows), and the pair
    * rollup is bounded by |symbols|², not the corpus. */
  private val BpeMerges = 4
  private lazy val bpeLearn: Q = (s, d) => bpeLearnN(s, d, BpeMerges)

  /** The learn loop generalized to an arbitrary merge budget (the
    * declared `ta_bpe_learn` runs it at [[BpeMerges]]; the differential
    * spec for the scalable encode runs it at 64+). Two additions over
    * the fixed-budget form: the loop EARLY-STOPS when no adjacent pair
    * remains anywhere in the census (a small corpus runs out of pairs
    * before a production budget), and the census is RE-checkpointed
    * every [[LearnCheckpointEvery]] rounds — each round stacks one
    * `replace` projection onto the plan, and without periodic lineage
    * cuts the expression tree at round N is N deep, which is exactly
    * the plan-build blowup that motivates the scalable encode. */
  private val LearnCheckpointEvery = 8
  private[operators] def bpeLearnN(
      s: SparkSession, d: String, nMerges: Int): DataFrame = {
    import s.implicits._
    // the census is |vocab|-sized — checkpoint it so the corpus is
    // scanned exactly once and every round's pair rollup (plus a
    // caller's encode pass) replans from the in-memory census, not the
    // corpus; dropped before returning (the output is literal rows)
    var ckpt = Tables.documents(s, d)
      .select(explode(expr(tokExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("seq", expr("' ' || regexp_replace(w, '(.)', '$1 ')"))
      .checkpointFresh()
    var seqs: DataFrame = ckpt
    var sinceCut = 0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var m = 1
    var exhausted = false
    while (m <= nMerges && !exhausted) {
      val best = seqs
        .select(col("wc"), expr("split(trim(seq), ' ')").as("a"))
        .where(size(col("a")) >= 2)
        .select(col("wc"), explode(expr(
          """transform(sequence(1, size(a) - 1),
             i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y))"""))
          .as("pr"))
        .groupBy(col("pr.x").as("x"), col("pr.y").as("y"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (x, y, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((m, x, y, n))
        // symbols are whitespace-token substrings (never contain
        // spaces), so the delimited search string is unambiguous;
        // sqlLit guards symbols containing ' or \ (e.g. an "'s" merge)
        seqs = seqs.withColumn("seq",
          expr(s"replace(seq, ${sqlLit(s" $x $y ")}, ${sqlLit(s" $x$y ")})"))
        sinceCut += 1
        if (sinceCut >= LearnCheckpointEvery && m < nMerges) {
          val next = seqs.checkpointFresh()
          graft.Checkpoints.drop(ckpt)
          ckpt = next; seqs = next; sinceCut = 0
        }
        m += 1
      }
    }
    graft.Checkpoints.drop(ckpt) // learning is done; free the blocks
    merges.result().toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Repetition signal (Gopher-style quality filter): fraction of a
    * doc's bigram occurrences taken by its single most frequent bigram.
    * Positional bigrams (duplicates kept — `word_ngrams`, the
    * non-distinct sibling of `word_shingles`: one native pass instead
    * of the five-HOF transform/sequence chain, which profiles ~50×
    * slower per row) → explode → per-(doc, bigram) count → per-doc
    * max/total. Int ratio → oracle-deterministic. */
  private lazy val repetition: Q = (s, d) =>
    // no explicit <2-token filter: word_ngrams returns [] below n tokens
    // and explode drops empty arrays, so sub-bigram docs vanish exactly
    // as the old size()-guard made them
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("word_ngrams(text, 2)")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).cast("long").as("n_bigrams"))
      .withColumn("repetition_ratio", col("top_bigram_n") / col("n_bigrams"))

  /** Character-class profile: alpha/digit/space fractions (integer
    * counts, single divisions). */
  private lazy val charStats: Q = (s, d) =>
    Tables.documents(s, d).selectExpr(
      "doc_id",
      "length(text) AS n",
      "length(regexp_replace(text, '[^a-z]', '')) AS n_alpha",
      "length(regexp_replace(text, '[^0-9]', '')) AS n_digit",
      "length(regexp_replace(text, '[^ ]', '')) AS n_space",
      "length(regexp_replace(text, '[^a-z]', '')) / length(text) AS alpha_ratio",
      "length(regexp_replace(text, '[^ ]', '')) / length(text) AS space_ratio")

  private def duckTok = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** The BPE learning rounds as CTEs (word census -> s0 -> 4 rounds):
    * each round m exposes `b$m(x$m, y$m, n$m)` (the winning pair) and
    * `s$m` (the re-segmented census). The ONE DuckDB rendering of the
    * declared merge semantics, shared by the ta_bpe_learn / vocab /
    * apply oracles so the contract cannot drift between them. */
  private def duckBpeRounds: String = {
    def round(prev: String, m: Int) =
      s"""p$m AS (
            SELECT pr.x AS x, pr.y AS y, sum(wc) AS n
            FROM (SELECT wc, str_split(trim(seq), ' ') AS a FROM $prev),
                 unnest([{'x': a[i], 'y': a[i+1]}
                         FOR i IN range(1, len(a))]) AS t(pr)
            GROUP BY 1, 2),
          b$m AS (SELECT x AS x$m, y AS y$m, n AS n$m FROM p$m
                  ORDER BY n DESC, x, y LIMIT 1),
          s$m AS (
            SELECT w, wc,
              replace(seq, ' ' || x$m || ' ' || y$m || ' ',
                      ' ' || x$m || y$m || ' ') AS seq
            FROM $prev CROSS JOIN b$m)"""
    s"""words AS (
          SELECT w, count(*) AS wc
          FROM (SELECT unnest($duckTok) AS w FROM documents) GROUP BY w),
        s0 AS (SELECT w, wc,
                 ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq
               FROM words),
        ${round("s0", 1)},
        ${round("s1", 2)},
        ${round("s2", 3)},
        ${round("s3", 4)}"""
  }

  /** The apply-side oracle: re-derive the 4 merges via the learn CTEs
    * and fold them in as a ranked replace chain over each word (the
    * b1..b4 pairs are 1-row tables, so the CROSS JOINs are free). */
  private lazy val duckBpeApplySql: String = {
    val merged = (1 to 4).foldLeft(
      // plain triple-quote: no escape processing, so \1 here is the
      // single-backslash RE2 group reference DuckDB needs
      """' ' || regexp_replace(w, '(.)', '\1 ', 'g')""") { (acc, m) =>
      s"replace($acc, ' ' || x$m || ' ' || y$m || ' ', ' ' || x$m || y$m || ' ')"
    }
    s"""WITH $duckBpeRounds
        SELECT doc_id, len(toks) AS n_ws_tokens,
          CAST(COALESCE(list_sum(list_transform(toks,
            w -> len(str_split(trim($merged), ' ')))), 0) AS BIGINT)
            AS n_symbols
        FROM (SELECT doc_id, $duckTok AS toks FROM documents)
        CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3 CROSS JOIN b4"""
  }

  val oracle: Map[String, String] = Map(
    "ta_token_stats" ->
      s"""SELECT doc_id,
          len(tok) AS n_tokens,
          len(list_distinct(tok)) AS n_distinct,
          len(list_distinct(tok)) / len(tok) AS ttr,
          list_reduce(list_transform(tok, t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b) / len(tok) AS mean_tok_len
          FROM (SELECT doc_id, $duckTok AS tok FROM documents)""",
    "ta_quality" ->
      s"""SELECT doc_id, len(tok) AS n_tokens,
          len(list_filter(tok, t -> t IN (${inList(stop("en"))}))) / len(tok) AS stop_ratio,
          0.5 * least(1.0, CAST(len(tok) AS DOUBLE) / 50.0) +
          0.5 * (len(list_filter(tok, t -> t IN (${inList(stop("en"))}))) / len(tok)) AS quality
          FROM (SELECT doc_id, $duckTok AS tok FROM documents)""",
    "ta_lang_id" -> {
      val scores = langs.map(l =>
        s"len(list_filter(tok, t -> t IN (${inList(stop(l))}))) AS s_$l").mkString(",\n          ")
      val pred = langs.init.foldRight(s"'${langs.last}'") { (l, rest) =>
        val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"CASE WHEN $ge THEN '$l' ELSE $rest END"
      }
      s"""SELECT doc_id, s_en, s_es, s_fr, s_de, s_zh, $pred AS pred_lang FROM (
          SELECT doc_id, $scores
          FROM (SELECT doc_id, $duckTok AS tok FROM documents))"""
    },
    "ta_quality_gate" ->
      s"""WITH t AS (
            SELECT doc_id, $duckTok AS ts FROM documents),
          raw AS (
            SELECT doc_id, len(ts) AS n_tokens,
              CASE WHEN len(ts) = 0 THEN 0 ELSE list_reduce(
                list_transform(ts, x -> CAST(length(x) AS BIGINT)),
                (a, b) -> a + b) END AS n_chars_tok,
              len(list_filter(ts, x -> x IN (${inList(stop("en"))}))) AS n_stop,
              [ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))] AS bgs
            FROM t),
          m AS (
            SELECT doc_id, n_tokens, n_chars_tok, n_stop,
              len(bgs) AS n_bigrams,
              CASE WHEN len(bgs) = 0 THEN 0 ELSE list_aggregate(
                list_transform(list_distinct(bgs),
                  b -> CAST(len(list_filter(bgs, x -> x = b)) AS BIGINT)),
                'max') END AS top_bigram_n
            FROM raw)
          SELECT doc_id, n_tokens, n_stop, n_bigrams, top_bigram_n,
            n_tokens BETWEEN 32 AND 100000 AS len_ok,
            n_tokens > 0 AND 1000 * n_chars_tok >= 3000 * n_tokens
              AND 1000 * n_chars_tok <= 5000 * n_tokens AS word_len_ok,
            n_stop >= 2 AS stop_ok,
            1000 * top_bigram_n <= 125 * n_bigrams AS rep_ok,
            (n_tokens BETWEEN 32 AND 100000)
              AND (n_tokens > 0 AND 1000 * n_chars_tok >= 3000 * n_tokens
                   AND 1000 * n_chars_tok <= 5000 * n_tokens)
              AND n_stop >= 2
              AND 1000 * top_bigram_n <= 125 * n_bigrams AS keep
          FROM m""",
    "ta_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
         FROM documents""",
    // full winnowing replay: positional k-gram md5-60-bit hashes, min of
    // each w-window (frame truncation at the tail covers the
    // n_grams <= w single-window case), distinct, md5 of the sorted set
    "ta_winnow" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
           FROM documents),
         g AS (
           SELECT doc_id, len(ts) - 4 AS n_grams,
             unnest(range(1, len(ts) - 3)) AS pos, ts
           FROM tok WHERE len(ts) >= 5),
         h AS (
           SELECT doc_id, n_grams, pos,
             CAST(concat('0x', substr(md5(
               ts[pos] || ' ' || ts[pos+1] || ' ' || ts[pos+2] || ' ' ||
               ts[pos+3] || ' ' || ts[pos+4]), 1, 15)) AS BIGINT) AS h
           FROM g),
         wm AS (
           SELECT doc_id, n_grams, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
           FROM h),
         fp AS (
           SELECT DISTINCT doc_id, mh FROM wm
           WHERE pos <= GREATEST(n_grams - 3, 1)),
         agg AS (
           SELECT doc_id, count(*) AS n_fp,
             md5(array_to_string(list_sort(array_agg(mh)), ',')) AS fp_sig
           FROM fp GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(a.n_fp, 0) AS n_fp,
           COALESCE(a.fp_sig, md5('')) AS fp_sig
         FROM documents d LEFT JOIN agg a USING (doc_id)""",
    // bigram DOCUMENT frequency (word_shingles dedups within a doc)
    "ta_zipf" ->
      s"""WITH t AS (
            SELECT unnest($duckTok) AS term FROM documents),
          top AS (
            SELECT term, count(*) AS n FROM t GROUP BY term
            ORDER BY n DESC, term LIMIT 50)
          SELECT term, n,
            row_number() OVER (ORDER BY n DESC, term) AS rank,
            row_number() OVER (ORDER BY n DESC, term) * n AS rank_x_freq
          FROM top""",
    "ta_typicality" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') ts
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_distinct([ts[i] || ' ' || ts[i+1]
                                   FOR i IN range(1, len(ts))])) AS bg
           FROM tok),
         df AS (SELECT bg, count(*) AS df FROM bg GROUP BY bg)
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(df) AS BIGINT) AS sum_df,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           (1000 * CAST(sum(df) AS BIGINT)) // count(*) AS typicality_milli
         FROM bg JOIN df USING (bg)
         GROUP BY doc_id""",
    "ta_bigrams" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') ts
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_distinct([ts[i] || ' ' || ts[i+1]
                                   FOR i IN range(1, len(ts))])) AS bigram
           FROM tok)
         SELECT bigram, COUNT(*) AS n FROM bg
         GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "ta_repetition" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') ts
           FROM documents),
         bg AS (
           SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))]) AS bigram
           FROM tok WHERE len(ts) >= 2),
         cnt AS (
           SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
         SELECT doc_id, MAX(c) AS top_bigram_n,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           MAX(c) / CAST(SUM(c) AS BIGINT) AS repetition_ratio
         FROM cnt GROUP BY doc_id""",
    "ta_tfidf" ->
      s"""WITH tf AS (
            SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
              SELECT doc_id, unnest($duckTok) AS w FROM documents)
            GROUP BY doc_id, w),
          df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          n AS (SELECT COUNT(*) AS n_docs FROM documents),
          scored AS (
            SELECT doc_id, tf.term, tf.tf, df.df,
              CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
          SELECT doc_id, term, tf, df, score, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rnk
            FROM scored) WHERE rnk <= 3""",
    "ta_bm25" ->
      s"""WITH base AS (SELECT doc_id, $duckTok AS toks FROM documents),
          tok AS (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base),
          tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok
            GROUP BY doc_id, dl, term),
          df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          stats AS (
            SELECT COUNT(*) AS n_docs, SUM(len(toks)) AS total_dl FROM base),
          scored AS (
            -- tf * 2.2 must multiply DOUBLES: DuckDB would otherwise
            -- compute it exactly in DECIMAL (3 * 2.2 = 6.6) where IEEE
            -- gives 6.6000000000000005 — a 1-ulp hash mismatch. The
            -- other constants (0.75, 0.25, 0.5) are exactly
            -- representable, and 1.2 already multiplies a double.
            SELECT doc_id, tf.term, tf.tf, df.df,
              ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
                ((tf * CAST(2.2 AS DOUBLE)) /
                 (tf + 1.2 * (0.25 + (0.75 * dl * n_docs) / total_dl)))
                AS score
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats)
          SELECT doc_id, term, tf, df, score, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rnk
            FROM scored) WHERE rnk <= 3""",
    "ta_bpe_tokens" -> {
      val p = bpePattern.replace("'", "''") // SQL string-literal escaping
      s"""SELECT doc_id,
            len(regexp_extract_all(text, '$p', 0)) AS n_bpe_tokens,
            len($duckTok) AS n_ws_tokens,
            len(regexp_extract_all(text, '$p', 0)) / len($duckTok)
              AS fragmentation
          FROM documents"""
    },
    // the BpeMerges learning rounds unrolled as CTEs (shared builder
    // duckBpeRounds - ONE oracle rendering of the declared merge
    // semantics for learn/vocab/apply)
    "ta_bpe_learn" ->
      s"""WITH $duckBpeRounds
          SELECT 1 AS merge_rank, x1 AS left_sym, y1 AS right_sym,
            CAST(n1 AS BIGINT) AS pair_count FROM b1
          UNION ALL SELECT 2, x2, y2, CAST(n2 AS BIGINT) FROM b2
          UNION ALL SELECT 3, x3, y3, CAST(n3 AS BIGINT) FROM b3
          UNION ALL SELECT 4, x4, y4, CAST(n4 AS BIGINT) FROM b4""",
    // s4 carries the fully-merged census; the symbol rollup weights by
    // word count
    "ta_bpe_vocab" ->
      s"""WITH $duckBpeRounds
          SELECT symbol, CAST(sum(wc) AS BIGINT) AS n_occurrences
          FROM (SELECT wc, unnest(str_split(trim(seq), ' ')) AS symbol FROM s4)
          GROUP BY symbol""",
    // the b1..b4 pairs re-derive the merges (learning is deterministic,
    // so the Spark side's collected literals are the same model), then
    // one scan applies the ranked replace chain per word
    "ta_bpe_apply" -> duckBpeApplySql,
    // the scalable encode declares the SAME contract (same model, same
    // per-doc counts), so it shares the apply oracle verbatim — at the
    // 4-merge oracle scale, broadcast-table-vs-literal-chain is exactly
    // the equality the 64-merge differential spec pins
    "ta_bpe_apply_scaled" -> duckBpeApplySql,
    "ta_inverted_index" ->
      s"""SELECT w AS term, COUNT(*) AS df,
            array_to_string(list_sort(array_agg(doc_id)), ',') AS postings
          FROM (SELECT doc_id, unnest(list_distinct($duckTok)) AS w
                FROM documents)
          GROUP BY w HAVING COUNT(*) >= 5""",
    "ta_char_stats" ->
      """SELECT doc_id,
           length(text) AS n,
           length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
           length(regexp_replace(text, '[^ ]', '', 'g')) AS n_space,
           length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text) AS alpha_ratio,
           length(regexp_replace(text, '[^ ]', '', 'g')) / length(text) AS space_ratio
         FROM documents""",
  )
}
