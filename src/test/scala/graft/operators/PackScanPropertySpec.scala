package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative differential test for the two-phase packing scan: on
  * ARBITRARY corpora (random sizes, languages, token counts — including
  * empty docs, single-language and empty corpora) the distributed scan
  * must equal the window formulation row-for-row. This is the code path
  * whose correctness depends on a subtle invariant (split-consistent
  * lift accounting under sampled range boundaries), so it gets the
  * adversarial-input treatment, not just the fixture corpus.
  *
  * Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class PackScanPropertySpec extends SparkSpec {

  private val corpusGen: Gen[List[(Long, String, Int)]] = for {
    n <- Gen.chooseNum(0, 120)
    langs <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(n, for {
      lang <- Gen.chooseNum(0, langs - 1).map(i => s"l$i")
      toks <- Gen.frequency((1, Gen.const(0)), (9, Gen.chooseNum(1, 700)))
    } yield (lang, toks))
  } yield rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  test("two-phase scan ≡ window formulation on arbitrary corpora") {
    import spark.implicits._
    (1 to 12).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(7L * i)).get
      val ds = spark.createDataset(corpus).repartition(5)
      val scan = Pipeline.packScanCore(ds)
      val win = Pipeline.packWindowCore(ds.toDF("doc_id", "lang", "n_tokens"))
      assert(scan.exceptAll(win).count() === 0, s"sample $i: scan rows not in window")
      assert(win.exceptAll(scan).count() === 0, s"sample $i: window rows not in scan")
    }
  }
}
