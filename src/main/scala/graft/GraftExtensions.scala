package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomAgg, BpeEncodeExpr, CdcChunks, CosineSimilarity, HyperplaneBuckets, MinHashSignature, MisraGriesAgg, RollingHash, SimHashAgg, SortedIntersectAtLeast, SortedIntersectCount, WinnowFps}

/** SparkSessionExtensions hook registering graft's native expressions
  * as SQL functions, so `spark.sql("SELECT rolling_hash(text) ...")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(graft.plans.TopKPerGroupStrategy(_))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_atleast"),
      new ExpressionInfo(classOf[SortedIntersectAtLeast].getName,
        "sorted_intersect_atleast"),
      (children: Seq[Expression]) => SortedIntersectAtLeast(
        children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => MinHashSignature(
        children(0), children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => WinnowFps(children(0),
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (children: Seq[Expression]) => {
        // SQL callers may omit the tuning args, like the Scala API's
        // defaults (divisor=64, minSize=24, maxSize=256)
        if (children.isEmpty || children.size > 4)
          throw new IllegalArgumentException(
            "cdc_chunks(text[, divisor[, minSize[, maxSize]]]) takes 1 to 4 arguments")
        def arg(i: Int, default: Int): Int =
          if (children.size > i) children(i).eval().asInstanceOf[Int] else default
        CdcChunks(children(0), arg(1, 64), arg(2, 24), arg(3, 256))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (children: Seq[Expression]) =>
        SimHashAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (children: Seq[Expression]) => MisraGriesAgg(children(0),
        children(1).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => BloomAgg(children(0),
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "bpe_encode"),
      // bpe_encode(text, merges): the merge list arrives as a foldable
      // string in BpeEncodeExpr wire format (models are corpus-trained
      // artifacts now, so there is no ambient "the" merge list to
      // default to — callers pass the one they loaded)
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "bpe_encode(text, merges) takes exactly 2 arguments")
        BpeEncodeExpr(children.head, BpeEncodeExpr.parseMerges(
          children(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .toString))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (children: Seq[Expression]) => HyperplaneBuckets(
        children(0),
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int])))
  }
}
