package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitmapAnd, CosineSimilarity, DHash72, DotProductLong,
  Fwht64, JaccardSim, MaxSim8, MinHashSig, NGrams, PolyShingles,
  PolyShinglesSeq, SimHash32, SortedIntersectCount, SquaredDistanceLong,
  UnicodeNormalize, XxNGramHashes}

/** Engine extension wiring (SURVEY.md §4.3).
  *
  * Two registration paths for the custom Catalyst functions:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `.withExtensions(new GraftExtensions)`) at session build — the
  *    production path;
  *  - `GraftExtensions.register(spark)` on a live session — used by the
  *    harness queries so the driver's plain sessions see the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.ngramsDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectDescriptor)
    ext.injectFunction(GraftExtensions.squaredDistanceDescriptor)
    ext.injectFunction(GraftExtensions.dotLongDescriptor)
    ext.injectFunction(GraftExtensions.polyShinglesDescriptor)
    ext.injectFunction(GraftExtensions.polyShinglesSeqDescriptor)
    ext.injectFunction(GraftExtensions.xxNGramDescriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
    ext.injectFunction(GraftExtensions.dhash72Descriptor)
    ext.injectFunction(GraftExtensions.bloomAggDescriptor)
    ext.injectFunction(GraftExtensions.bloomMightContainDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinGuard)
    ext.injectFunction(GraftExtensions.jaccardSimDescriptor)
    ext.injectFunction(GraftExtensions.bitmapAndDescriptor)
    ext.injectFunction(GraftExtensions.unicodeNormalizeDescriptor)
    // inert unless spark.graft.lsh.rewrite.enabled=true (approximation
    // opt-in — see CosineLshRewrite / JaccardLshRewrite)
    ext.injectOptimizerRule(_ => graft.plans.CosineLshRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JaccardLshRewrite)
    // inert unless spark.graft.range.rewrite.enabled=true (EXACT rescue
    // of point-in-interval joins — see RangeBucketRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBucketRewrite)
    // inert unless spark.graft.spatial.rewrite.enabled=true (EXACT
    // rescue of 2-D radius theta joins — see SpatialGridRewrite)
    ext.injectOptimizerRule(_ => graft.plans.SpatialGridRewrite)
    // inert unless spark.graft.mv.rewrite.enabled=true (EXACT rollup
    // rewrite of aggregates onto a registered MV — see MvRollupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MvRollupRewrite)
    // inert unless spark.graft.aggpush.enabled=true (EXACT eager
    // aggregation — partial-aggregate pushdown below inner equi-joins)
    ext.injectOptimizerRule(_ => graft.plans.AggPushdownRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  private val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim expects 2 array<float> args")
      CosineSimilarity(children.head, children(1))
    }
  )

  private val ngramsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngrams"),
    new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "ngrams expects (array<string>, const int)")
      NGrams(children.head, children(1))
    }
  )

  private val simhashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "simhash32 expects 2 array<bigint> args")
      SimHash32(children.head, children(1))
    }
  )

  private val sortedIntersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName,
      "sorted_intersect_count"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "sorted_intersect_count expects 2 array<bigint> args")
      SortedIntersectCount(children.head, children(1))
    }
  )

  private val squaredDistanceDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("squared_distance"),
    new ExpressionInfo(classOf[SquaredDistanceLong].getName,
      "squared_distance"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "squared_distance expects 2 array<bigint> args")
      SquaredDistanceLong(children.head, children(1))
    }
  )

  private val dotLongDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_long"),
    new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_long expects 2 array<bigint> args")
      DotProductLong(children.head, children(1))
    }
  )

  private val polyShinglesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_shingles"),
    new ExpressionInfo(classOf[PolyShingles].getName, "poly_shingles"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "poly_shingles expects array<string>")
      PolyShingles(children.head)
    }
  )

  private val polyShinglesSeqDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_shingles_seq"),
    new ExpressionInfo(classOf[PolyShinglesSeq].getName, "poly_shingles_seq"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "poly_shingles_seq expects array<string>")
      PolyShinglesSeq(children.head)
    }
  )

  private val xxNGramDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("xx_ngram_hashes"),
    new ExpressionInfo(classOf[XxNGramHashes].getName, "xx_ngram_hashes"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "xx_ngram_hashes expects (array<string>, const int)")
      XxNGramHashes(children.head, children(1))
    }
  )

  private val minhashSigDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "minhash_sig expects (array<bigint>, const int)")
      MinHashSig(children.head, children(1))
    }
  )

  private val dhash72Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dhash72"),
    new ExpressionInfo(classOf[DHash72].getName, "dhash72"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "dhash72 expects 1 binary arg")
      DHash72(children.head)
    }
  )

  /** Spark's own bloom-filter sketch aggregate
    * (catalyst BloomFilterAggregate — the engine half of injected
    * runtime filters), surfaced as a named function: the lossy
    * membership fast path for llm_decontaminate_bloom. Args:
    * (bigint column[, estimated_items[, num_bits]]). */
  private val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_agg"),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      children.size match {
        case 1 => new BloomFilterAggregate(children.head)
        case 2 => new BloomFilterAggregate(children.head, children(1))
        case 3 => new BloomFilterAggregate(children.head, children(1), children(2))
        case n => throw new IllegalArgumentException(
          s"bloom_agg expects (bigint[, items[, bits]]), got $n args")
      }
    }
  )

  /** Probe half of the bloom pair (catalyst BloomFilterMightContain):
    * bloom_might_contain(<scalar subquery or constant binary>, bigint).
    * False positives possible, false negatives not. */
  private val bloomMightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "bloom_might_contain expects (binary, bigint)")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1))
    }
  )

  private val unicodeNormalizeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_normalize"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "unicode_normalize expects (string, const form)")
      UnicodeNormalize(children.head, children(1))
    }
  )

  private val bitmapAndDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bitmap_and"),
    new ExpressionInfo(classOf[BitmapAnd].getName, "bitmap_and"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "bitmap_and expects 2 binary args")
      BitmapAnd(children.head, children(1))
    }
  )

  private val jaccardSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaccard_sim"),
    new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "jaccard_sim expects 2 array<bigint> args")
      JaccardSim(children.head, children(1))
    }
  )

  private val fwht64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fwht64"),
    new ExpressionInfo(classOf[Fwht64].getName, "fwht64"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "fwht64 expects 1 array<bigint> arg")
      Fwht64(children.head)
    }
  )

  private val maxsim8Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("maxsim8"),
    new ExpressionInfo(classOf[MaxSim8].getName, "maxsim8"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "maxsim8 expects 2 array<bigint> args")
      MaxSim8(children.head, children(1))
    }
  )

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    Seq(cosineSimDescriptor, ngramsDescriptor, simhashDescriptor,
      sortedIntersectDescriptor, squaredDistanceDescriptor,
      dotLongDescriptor, polyShinglesDescriptor, polyShinglesSeqDescriptor,
      xxNGramDescriptor, jaccardSimDescriptor, bitmapAndDescriptor,
      unicodeNormalizeDescriptor,
      minhashSigDescriptor, dhash72Descriptor, bloomAggDescriptor,
      bloomMightContainDescriptor, fwht64Descriptor,
      maxsim8Descriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Install the custom optimizer rules on a live session (the runtime
    * twin of `injectOptimizerRule`; the rules themselves are idempotent,
    * and so is this — already-installed rules are not re-added). */
  def installOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.LevenshteinGuard, graft.plans.CosineLshRewrite,
      graft.plans.JaccardLshRewrite, graft.plans.RangeBucketRewrite,
      graft.plans.SpatialGridRewrite, graft.plans.MvRollupRewrite,
      graft.plans.JoinEliminationRewrite, graft.plans.AggPushdownRewrite)
    val current = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      current ++ rules.filterNot(current.contains)
  }
}
