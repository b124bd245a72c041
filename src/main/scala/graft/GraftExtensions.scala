package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{HilbertKey, LshBuckets, Md5LshBuckets, MinHashSig, Round6Micros, Shingles3, SimHash64, SortedBucket, SortedSetJaccard, VecDot, VecL2Sq}

/** Session extension registering graft's native expressions, so they
  * are callable from SQL and `call_function` in any session configured
  * with `spark.sql.extensions=graft.GraftExtensions` (all graft
  * sessions set this via `Tables.sessionConfs`).
  *
  *   - `vec_dot(a, b)`        codegen dot product (see VecDot)
  *   - `minhash_sig(sh, n)`   one-pass MinHash signature (see MinHashSig)
  *   - `shingles3(text)`      distinct 3-token shingles (see Shingles3)
  *   - `simhash64(tokens)`    64-bit SimHash (see SimHash64)
  *   - `sorted_bucket(v, bs)` binary-search bucket id (see SortedBucket)
  *   - `hilbert_key(x, y, n)` Hilbert-curve index (see HilbertKey)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {

  /** Register the graft functions into an ALREADY-RUNNING session
    * (idempotent). Safety net for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions` — e.g. an external
    * harness constructing its own SparkSession and invoking
    * `SparkEntry.queries` directly. Called from `Tables.load`, so every
    * query path self-installs.
    */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injections.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.PushFilterThroughAsOfJoin
  }

  private lazy val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes 2 arguments")
        VecDot(args.head, args(1))
      }),
    (new FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_l2sq(a, b) takes 2 arguments")
        VecL2Sq(args.head, args(1))
      }),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "minhash_sig(shingles, numPerms) takes 2 arguments")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numPerms must be an integer literal, got $other")
        }
        MinHashSig(args.head, n)
      }),
    (new FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "shingles3(text) takes 1 argument")
        Shingles3(args.head)
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens) takes 1 argument")
        SimHash64(args.head)
      }),
    (new FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "lsh_buckets(vec) takes 1 argument")
        LshBuckets(args.head)
      }),
    (new FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "hilbert_key(x, y, bits) takes 3 arguments")
        val bits = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bits must be an integer literal, got $other")
        }
        HilbertKey(args.head, args(1), bits)
      }),
    (new FunctionIdentifier("round6_micros"),
      new ExpressionInfo(classOf[Round6Micros].getName,
        "round6_micros"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "round6_micros(x) takes 1 argument")
        Round6Micros(args.head)
      }),
    (new FunctionIdentifier("md5_lsh_buckets"),
      new ExpressionInfo(classOf[Md5LshBuckets].getName,
        "md5_lsh_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "md5_lsh_buckets(vec, bits) takes 2 arguments")
        val bits = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bits must be an integer literal, got $other")
        }
        Md5LshBuckets(args.head, bits)
      }),
    (new FunctionIdentifier("sorted_set_jaccard"),
      new ExpressionInfo(classOf[SortedSetJaccard].getName,
        "sorted_set_jaccard"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_set_jaccard(a, b) takes 2 arguments")
        SortedSetJaccard(args.head, args(1))
      }),
    (new FunctionIdentifier("sorted_bucket"),
      new ExpressionInfo(classOf[SortedBucket].getName, "sorted_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_bucket(v, boundaries) takes 2 arguments")
        SortedBucket(args.head, args(1))
      }),
    // Spark's own runtime-filter membership expression, exposed as a
    // callable function so operators can apply an EXPLICIT bloom
    // prefilter (operators/Bloom.scala) with the same codegen path
    // InjectRuntimeFilter uses. args: (serialized filter bytes, long
    // key) — keys must have been put raw (stat.bloomFilter does).
    (new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(filter, key) takes 2 arguments")
        BloomFilterMightContain(args.head, args(1))
      }),
    // ...and its build-side twin, the aggregate runtime filtering
    // uses, exposed so a GROUPED build is one distributed pass —
    // per-bucket bloom sidecars (Layout.writeBloomSidecar) need one
    // filter PER group, which driver-side stat.bloomFilter can't
    // express. args: (raw long key, estimated items, num bits);
    // keys are put raw, matching bloom_might_contain above.
    (new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bloom_agg(key, estimatedItems, numBits) takes 3 arguments")
        BloomFilterAggregate(args.head, args(1), args(2), 0, 0)
      }))
}
