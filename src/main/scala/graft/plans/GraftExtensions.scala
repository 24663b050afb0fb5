package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{CharBigrams, CosineSimilarity, DHash56, InterleaveBits, SimHash64, UnicodeFold, WinnowedGramMins, WinnowFingerprints}

/** Session extensions for the graft engine — the standard third-party
  * integration point (`spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  *  - registers the custom codegen'd Catalyst expressions as SQL
  *    functions (`cosine_sim`, `simhash64`, `char_bigrams`,
  *    `winnow_fingerprints`, `dhash56`, `interleave_bits`), so `spark.sql("...")`
  *    users get the fused kernels without touching the Scala column API;
  *  - injects [[BandJoinToBinned]], which turns literal band joins into
  *    binned equi hash joins instead of nested loops.
  *
  * [[GraftExtensions.install]] applies the same surface to an ALREADY
  * RUNNING session (the extensions config is creation-time only) via the
  * supported dynamic hooks: `experimental.extraOptimizations` and the
  * session `FunctionRegistry`. Idempotent — safe to call per query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => BandJoinToBinned)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$what must be an integer literal, got ${other.sql}")
  }

  /** (identifier, info, builder) triples shared by the creation-time
    * and dynamic registration paths.
    */
  private[plans] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(arr, arr) takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text) takes 1 argument")
        SimHash64(args(0))
      }),
    (FunctionIdentifier("char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "char_bigrams"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_bigrams(text) takes 1 argument")
        CharBigrams(args(0))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnow_fingerprints(text, k, w) takes 3 arguments")
        WinnowFingerprints(args(0),
          intLit(args(1), "winnow_fingerprints k"),
          intLit(args(2), "winnow_fingerprints w"))
      }),
    (FunctionIdentifier("winnowed_gram_mins"),
      new ExpressionInfo(classOf[WinnowedGramMins].getName, "winnowed_gram_mins"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnowed_gram_mins(text, k, w) takes 3 arguments")
        WinnowedGramMins(args(0),
          intLit(args(1), "winnowed_gram_mins k"),
          intLit(args(2), "winnowed_gram_mins w"))
      }),
    (FunctionIdentifier("dhash56"),
      new ExpressionInfo(classOf[DHash56].getName, "dhash56"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "dhash56(array<float>) takes 1 argument")
        DHash56(args(0))
      }),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "interleave_bits(x, y) takes 2 arguments")
        InterleaveBits(args(0), args(1))
      }),
    (FunctionIdentifier("accent_fold"),
      new ExpressionInfo(classOf[UnicodeFold].getName, "accent_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "accent_fold(text) takes 1 argument")
        UnicodeFold(args(0), nfkc = false)
      }),
    (FunctionIdentifier("nfkc_fold"),
      new ExpressionInfo(classOf[UnicodeFold].getName, "nfkc_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfkc_fold(text) takes 1 argument")
        UnicodeFold(args(0), nfkc = true)
      }))

  /** Dynamically apply the graft surface to a live session. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(BandJoinToBinned)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinToBinned
    }
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }
}
