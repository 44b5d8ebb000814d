package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative differential test for the scalable BPE encode's rank
  * cursor: on ARBITRARY corpora the iterative lowest-applicable-rank
  * loop must equal the sequential replace chain exactly. The subtle
  * case is overlap survivors — a single one-pass replace of " x y "
  * leaves occurrences that shared a delimiter space (" x y x y " →
  * " xy x y "), and without the per-word cursor the loop would
  * re-apply a rank the chain has already passed. Tiny alphabets with
  * repeated letters ("aaaa", "abab") make those collisions common, so
  * the generator leans into them; merge budgets exceed what some
  * corpora support, exercising the learn loop's pair-exhaustion stop.
  *
  * Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class BpeEncodePropertySpec extends SparkSpec {

  // words over {a,b,c}: heavy repetition → adjacent-pair overlap city
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 25)
    docs <- Gen.listOfN(n, for {
      w <- Gen.chooseNum(1, 8)
      words <- Gen.listOfN(w, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield words.mkString(" "))
  } yield docs

  test("scalable encode ≡ sequential chain on arbitrary corpora (overlap survivors included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    (1 to 6).foreach { i =>
      val texts = corpusGen(Gen.Parameters.default, Seed(31L * i)).get
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-bpe-prop$i")
      texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("lang", lit("?")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      // budget beyond what tiny corpora support → exercises early stop
      val table = TextAnalysis.bpeLearnN(spark, tmp.toString, 12)
      val merges = table.collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2)))
      val words = graft.sources.Tables.documents(spark, tmp.toString)
        .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("w"))
        .distinct()
      val got = TextAnalysis.encodeCensusScaled(spark, table, words)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def seqLen(w: String): Long = {
        var seq = " " + w.map(ch => s"$ch ").mkString
        merges.foreach { case (x, y) => seq = seq.replace(s" $x $y ", s" $x$y ") }
        seq.trim.split(' ').length.toLong
      }
      val ws = texts.flatMap(_.split(' ')).filter(_.nonEmpty).distinct
      assert(got.keySet == ws.toSet, s"sample $i: census drift")
      ws.foreach { w =>
        assert(got(w) == seqLen(w),
          s"sample $i word '$w': scaled ${got(w)} vs sequential ${seqLen(w)} " +
          s"(merges ${merges.mkString(",")})")
      }
    }
  }
}
