package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** The engine's SQL function surface as injectable descriptions, so a
  * session built with [[graft.plans.GraftExtensions]] exposes every
  * graft function from SQL text with no per-session register() calls
  * (the per-object register() helpers remain for sessions built
  * without the extensions).
  *
  * Expression-backed functions build their Catalyst node directly;
  * Column-composition functions (the text battery) lower eagerly
  * through the active session — a lazy ColumnNode wrapper is
  * Unevaluable and would blow up at codegen inside a registry-built
  * tree.
  */
object GraftFunctionRegistry {

  private type Builder = Seq[Expression] => Expression
  type Description = (FunctionIdentifier, ExpressionInfo, Builder)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftFunctionRegistry.type].getName, null,
      name, usage, "", "", "", "", "", "", "scala_udf")

  private def arity(name: String, n: Int)(b: Builder): Builder = es => {
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${es.length}")
    b(es)
  }

  private def fromColumn(name: String, f: Column => Column): Description = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, resolvedExpression}
    (FunctionIdentifier(name), info(name, s"$name(expr)"),
      arity(name, 1)(es =>
        resolvedExpression(SparkSession.active, f(toCol(es.head)))))
  }

  def descriptions: Seq[Description] = Seq(
    // vector kernels
    (FunctionIdentifier("cosine_sim"), info("cosine_sim", "cosine_sim(a, b)"),
      arity("cosine_sim", 2)(es => CosineSimilarity(es.head, es(1)))),
    (FunctionIdentifier("dot_product"), info("dot_product", "dot_product(a, b)"),
      arity("dot_product", 2)(es => DotProduct(es.head, es(1)))),
    (FunctionIdentifier("l2_distance"), info("l2_distance", "l2_distance(a, b)"),
      arity("l2_distance", 2)(es => L2Distance(es.head, es(1)))),
    // sketch kernels
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(shingle_hashes, k)"),
      arity("graft_minhash_sig", 2)(es => es(1) match {
        case IntegerLiteral(k) => MinHashSignature(es.head, k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig k must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(token_hashes)"),
      arity("graft_simhash64", 1)(es => SimHash64(es.head))),
    (FunctionIdentifier("graft_nfc_normalize"),
      info("graft_nfc_normalize", "graft_nfc_normalize(text)"),
      arity("graft_nfc_normalize", 1)(es => NfcNormalize(es.head))),
    // theta distinct-set algebra (lgK is a literal, like minhash's k)
    (FunctionIdentifier("graft_theta_sketch_agg"),
      info("graft_theta_sketch_agg", "graft_theta_sketch_agg(value, lgK)"),
      arity("graft_theta_sketch_agg", 2)(es => es(1) match {
        case IntegerLiteral(lgK) =>
          ThetaSketchAgg(es.head, lgK).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_theta_sketch_agg lgK must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_theta_union_agg"),
      info("graft_theta_union_agg", "graft_theta_union_agg(sketch, lgK)"),
      arity("graft_theta_union_agg", 2)(es => es(1) match {
        case IntegerLiteral(lgK) =>
          ThetaUnionAgg(es.head, lgK).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_theta_union_agg lgK must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_theta_estimate"),
      info("graft_theta_estimate", "graft_theta_estimate(sketch)"),
      arity("graft_theta_estimate", 1)(es => ThetaEstimate(es.head))),
    (FunctionIdentifier("graft_theta_intersect_estimate"),
      info("graft_theta_intersect_estimate",
        "graft_theta_intersect_estimate(a, b)"),
      arity("graft_theta_intersect_estimate", 2)(es =>
        ThetaIntersectEstimate(es.head, es(1)))),
    (FunctionIdentifier("graft_theta_a_not_b_estimate"),
      info("graft_theta_a_not_b_estimate",
        "graft_theta_a_not_b_estimate(a, b)"),
      arity("graft_theta_a_not_b_estimate", 2)(es =>
        ThetaANotBEstimate(es.head, es(1)))),
    // KLL mergeable quantiles (k is a literal, like theta's lgK)
    (FunctionIdentifier("graft_kll_sketch_agg"),
      info("graft_kll_sketch_agg", "graft_kll_sketch_agg(value, k)"),
      arity("graft_kll_sketch_agg", 2)(es => es(1) match {
        case IntegerLiteral(k) =>
          KllSketchAgg(es.head, k).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_kll_sketch_agg k must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_kll_merge_agg"),
      info("graft_kll_merge_agg", "graft_kll_merge_agg(sketch, k)"),
      arity("graft_kll_merge_agg", 2)(es => es(1) match {
        case IntegerLiteral(k) =>
          KllMergeAgg(es.head, k).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_kll_merge_agg k must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_kll_quantile"),
      info("graft_kll_quantile", "graft_kll_quantile(sketch, rank)"),
      arity("graft_kll_quantile", 2)(es => KllQuantile(es.head, es(1)))),
    (FunctionIdentifier("graft_kll_rank"),
      info("graft_kll_rank", "graft_kll_rank(sketch, value)"),
      arity("graft_kll_rank", 2)(es => KllRank(es.head, es(1)))),
    // frequent-items (Misra-Gries) heavy hitters
    (FunctionIdentifier("graft_freq_sketch_agg"),
      info("graft_freq_sketch_agg", "graft_freq_sketch_agg(value, maxMapSize)"),
      arity("graft_freq_sketch_agg", 2)(es => es(1) match {
        case IntegerLiteral(m) =>
          FreqSketchAgg(es.head, m).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_freq_sketch_agg maxMapSize must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_freq_merge_agg"),
      info("graft_freq_merge_agg", "graft_freq_merge_agg(sketch, maxMapSize)"),
      arity("graft_freq_merge_agg", 2)(es => es(1) match {
        case IntegerLiteral(m) =>
          FreqMergeAgg(es.head, m).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_freq_merge_agg maxMapSize must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_freq_estimate"),
      info("graft_freq_estimate", "graft_freq_estimate(sketch, item)"),
      arity("graft_freq_estimate", 2)(es => FreqEstimate(es.head, es(1)))),
    (FunctionIdentifier("graft_freq_lower_bound"),
      info("graft_freq_lower_bound", "graft_freq_lower_bound(sketch, item)"),
      arity("graft_freq_lower_bound", 2)(es => FreqLowerBound(es.head, es(1)))),
    (FunctionIdentifier("graft_freq_upper_bound"),
      info("graft_freq_upper_bound", "graft_freq_upper_bound(sketch, item)"),
      arity("graft_freq_upper_bound", 2)(es => FreqUpperBound(es.head, es(1)))),
    (FunctionIdentifier("graft_freq_max_error"),
      info("graft_freq_max_error", "graft_freq_max_error(sketch)"),
      arity("graft_freq_max_error", 1)(es => FreqMaxError(es.head))),
    // text battery
    fromColumn("graft_lang_id", TextOps.langId),
    fromColumn("graft_token_count", TextOps.tokenCount),
    fromColumn("graft_subword_count", TextOps.subwordCount),
    fromColumn("graft_stopword_ratio", TextOps.stopwordRatio),
    fromColumn("graft_distinct_ratio", TextOps.distinctRatio),
    fromColumn("graft_mean_token_len", TextOps.meanTokenLen),
    fromColumn("graft_quality_score", TextOps.qualityScore),
    fromColumn("graft_repetition_ratio", TextOps.repetitionRatio(_)),
    fromColumn("graft_fingerprint", TextOps.fingerprint),
    fromColumn("graft_redact_pii", TextOps.redactPii))
}
