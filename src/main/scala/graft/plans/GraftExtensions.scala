package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomBuildAgg, BpeTokens, CmsBuildAgg, CmsMergeAgg, CosineSimilarity, DotProduct, MinHashSignature, ShingleSet, SimHash64, Sq8Dot, Sq8Encode, TopKRows}

/** SparkSessionExtensions registration for graft's native expressions
  * (SURVEY.md §2 #35). Activate with either:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * after which `graft_cosine(a, b)` is available in SQL and via
  * `call_function("graft_cosine", ...)` in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in optimizer rewrite: window top-k idiom → bounded-heap
    // aggregate (spark.graft.rewrite.topk=true; no-op otherwise)
    ext.injectOptimizerRule(_ => TopKRewrite())
    // opt-in automatic dynamic file pruning over GraftFileIndex scans
    // (spark.graft.rewrite.dfp=true; no-op otherwise)
    ext.injectOptimizerRule(_ => DfpRewrite())
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b) takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_minhash(words, numHashes, shingleSize) takes 3 arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(s"$what must be an int literal")
        }
        MinHashSignature(children.head,
          intLit(children(1), "numHashes"), intLit(children(2), "shingleSize"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash(words) takes exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_bpe(text, merges) takes 2 arguments; merges = array of 'left right' strings")
        val mergesExpr = children(1)
        require(mergesExpr.foldable,
          "graft_bpe merges must be a literal array of 'left right' strings " +
            "(the merge table is query-constant, like minhash's salts)")
        val evaluated = mergesExpr.eval(null)
        require(evaluated != null, "graft_bpe merges must not be NULL")
        val arr =
          evaluated.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val merges = (0 until arr.numElements()).map { i =>
          require(!arr.isNullAt(i),
            s"graft_bpe merges must not contain NULL (element $i)")
          val s = arr.getUTF8String(i).toString
          val sp = s.indexOf(' ')
          require(sp > 0 && sp < s.length - 1,
            s"graft_bpe merge '$s' must be 'left right' (one space)")
          (s.substring(0, sp), s.substring(sp + 1))
        }
        BpeTokens(children.head, merges)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKRows].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_topk(sortStruct, k) takes 2 arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException("k must be an int literal")
        }
        TopKRows(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_build"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_bloom_build(col, expectedItems, fpp) takes 3 arguments")
        val items = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case _ => throw new IllegalArgumentException(
            "expectedItems must be an integral literal")
        }
        val fpp = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(d: org.apache.spark.sql.types.Decimal, _) =>
            d.toDouble
          case _ => throw new IllegalArgumentException("fpp must be a double literal")
        }
        BloomBuildAgg(children.head, items, fpp).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_build"),
      new ExpressionInfo(classOf[CmsBuildAgg].getName, "graft_cms_build"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "graft_cms_build(col, eps, confidence, seed) takes 4 arguments")
        def dbl(e: Expression, what: String): Double = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(d: org.apache.spark.sql.types.Decimal, _) =>
            d.toDouble
          case _ => throw new IllegalArgumentException(s"$what must be a double literal")
        }
        val seed = children(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException("seed must be an int literal")
        }
        CmsBuildAgg(children.head, dbl(children(1), "eps"),
          dbl(children(2), "confidence"), seed).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "graft_cms_merge"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_cms_merge(sketchBytes) takes 1 argument")
        CmsMergeAgg(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles(words, k) takes 2 arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException("k must be an int literal")
        }
        ShingleSet(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sq8_encode"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "graft_sq8_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_sq8_encode(unitVec) takes exactly 1 argument")
        Sq8Encode(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sq8_dot"),
      new ExpressionInfo(classOf[Sq8Dot].getName, "graft_sq8_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_sq8_dot(code, unitVec) takes exactly 2 arguments")
        Sq8Dot(children.head, children(1))
      }))
  }
}
