package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** One document arriving on a stream: id, ingest time, raw text. */
case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming deduplication for a document-ingest pipeline — the batch
  * dedup family ([[graft.operators.Dedup]]) recast as Structured
  * Streaming operators. The 100 TB streaming constraint is STATE: an
  * unbounded "seen" set OOMs, so both variants bound state with
  * `dropDuplicatesWithinWatermark` — a key's state lives only until the
  * watermark passes it, which is exactly the dedup horizon a crawl
  * pipeline wants ("drop re-crawls within N hours; a months-later
  * re-crawl is a new observation").
  *
  *   - [[exactDedup]]: md5 content fingerprint — byte-identical dups.
  *   - [[nearDedup]]: 60-bit SimHash signature (same md5 token-hash
  *     family as the batch path — [[simhash60]] is spec-pinned equal to
  *     `Dedup.simhashes`) — near-identical dups (token-order or
  *     repetition changes collapse to the same signature).
  */
object DedupStreams {

  /** Exact-content streaming dedup: first arrival within the horizon
    * wins. */
  def exactDedup(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Near-dup streaming dedup on the SimHash signature. Signature
    * equality (not Hamming proximity) keeps the operator a bounded-state
    * key dedup — the banded-bucket pair search stays a batch job over
    * the deduped stream's sink. */
  def nearDedup(docs: Dataset[StreamDoc], lateness: String = "10 minutes"): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .map(d => (d.doc_id, d.ts, simhash60(d.text)))
      .toDF("doc_id", "ts", "simhash")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("simhash")
  }

  /** Stream-static contamination filter: flag incoming docs sharing ≥1
    * word-3-gram shingle with a STATIC benchmark dictionary (the
    * streaming form of `pl_contamination` — decontaminating a live
    * crawl against a fixed eval suite). The exploded stream side
    * semi-joins the static dictionary, which Spark plans broadcast
    * (re-read per micro-batch, never shuffled with the stream); the
    * per-doc collapse is `dropDuplicatesWithinWatermark`, so state is
    * bounded by the horizon, not the corpus. Append-mode, stateless but
    * for the dedup horizon — the 100 TB stream shape.
    *
    * `benchShingles` must carry one `shingle` string column (build it
    * from any corpus with `word_shingles(text, 3)` + explode). */
  def contaminated(docs: DataFrame, benchShingles: DataFrame,
                   lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("sh", expr("word_shingles(text, 3)"))
      .select(col("doc_id"), col("ts"), explode(col("sh")).as("shingle"))
      .join(benchShingles, Seq("shingle"), "left_semi")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("doc_id")

  /** Continuous corpus ingest — the streaming form of `pl_cross_dedup`
    * (decontaminate an incoming crawl against the EXISTING corpus, then
    * self-dedup the stream): the production shape of incremental-batch
    * dedup, where "the batch" never ends.
    *
    *   1. fingerprint each arriving doc (md5 of the content bytes —
    *      the same 128-bit family as the batch path);
    *   2. stream-static ANTI join against the base corpus's
    *      fingerprints. Structured Streaming's support matrix has no
    *      stream-static LEFT ANTI, so it is expressed as the supported
    *      LEFT OUTER against a marker column + IS NULL filter —
    *      identical semantics, and the static side is planned broadcast
    *      per micro-batch exactly like the batch plan under AQE;
    *   3. `dropDuplicatesWithinWatermark` on the fingerprint: the
    *      first arrival within the horizon survives, every re-crawl is
    *      dropped — CHECKPOINTED fingerprint state, so a killed and
    *      restarted query keeps rejecting dups it saw before the kill.
    *
    * State is bounded by the watermark horizon (never the corpus — the
    * corpus side is the static join input); at 100 TB the base-corpus
    * fingerprint table is the only big input and it is read, not
    * shuffled. `corpusFps` must carry one `fp` string column. */
  def crossDedupIngest(docs: DataFrame, corpusFps: DataFrame,
                       lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(corpusFps.select(col("fp"), lit(1).as("in_corpus")),
        Seq("fp"), "left_outer")
      .where(col("in_corpus").isNull).drop("in_corpus")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Per-row 60-bit SimHash over distinct whitespace tokens. Since
    * round 8 this DELEGATES to the shared
    * [[graft.functions.SimHash60]] kernel — the same code the batch
    * `dd_simhash` projection evaluates — so batch and stream cannot
    * drift by construction (the spec still asserts it). */
  private[graft] def simhash60(text: String): Long =
    graft.functions.SimHash60.hashText(text)
}
