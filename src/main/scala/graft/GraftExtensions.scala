package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineSimilarity, DotProduct, DotProductLong,
  IntersectionSize, LshBuckets, OrderedPairsPacked, RewriteIntersectionSize,
  SimHash60, WinnowFingerprints, WordNgrams, WordShingles}

/** Engine extensions, registered via `SparkSession.builder.withExtensions`
  * (or `spark.sql.extensions=graft.GraftExtensions`): native functions the
  * built-in registry lacks. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        // Accept array<float> (the parquet storage type) by widening —
        // exact, so results match an oracle that casts to double first.
        val widen = (e: Expression) => Cast(e, ArrayType(DoubleType))
        CosineSimilarity(widen(children(0)), widen(children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_prod"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_prod"),
      (children: Seq[Expression]) => {
        val widen = (e: Expression) => Cast(e, ArrayType(DoubleType))
        DotProduct(widen(children(0)), widen(children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => {
        // (tables, bits) must be integer literals — they size the
        // plane matrix at plan time. Validate arity and foldability
        // HERE so a misuse fails as a clean analysis error naming the
        // function, not an opaque eval()/apply() throw from builder
        // internals (advice r15).
        if (children.length != 3)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`lsh_buckets`", "expectedNum" -> "3",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        def intLit(e: Expression, param: String): Int = {
          if (!e.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              "NON_FOLDABLE_ARGUMENT",
              Map("funcName" -> "`lsh_buckets`",
                "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
          e.eval() match {
            case n: Number => n.intValue()
            case _ =>
              throw new org.apache.spark.sql.AnalysisException(
                "NON_FOLDABLE_ARGUMENT",
                Map("funcName" -> "`lsh_buckets`",
                  "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
          }
        }
        LshBuckets(Cast(children(0), ArrayType(DoubleType)),
          intLit(children(1), "tables"), intLit(children(2), "bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_prod_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_prod_long"),
      (children: Seq[Expression]) =>
        DotProductLong(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("ordered_pairs"),
      new ExpressionInfo(classOf[OrderedPairsPacked].getName, "ordered_pairs"),
      (children: Seq[Expression]) => OrderedPairsPacked(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) =>
        WordNgrams(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => SimHash60(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("intersection_size"),
      new ExpressionInfo(classOf[IntersectionSize].getName, "intersection_size"),
      (children: Seq[Expression]) =>
        IntersectionSize(children(0), children(1))))
    // size(array_intersect(a, b)) → intersection_size(a, b): the Jaccard
    // verification kernel, allocation-free.
    ext.injectOptimizerRule(_ => RewriteIntersectionSize)
    // whole-operator extension tier: the native merge AS-OF join
    // (graft.plans.AsOfJoinPlan → AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
