package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** SQL surface: the engine's expressions as SQL functions, for
  * `spark.sql("SELECT graft_fields(raw, host, source) ...")` users.
  *
  * Two registration paths:
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` (session build)
  *  - `GraftExtensions.register(spark)` (runtime, existing session)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinAsEquiJoin)
  }
}

object GraftExtensions {
  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("tokens_to_text",
      new ExpressionInfo(classOf[TokensToText].getName, "tokens_to_text"),
      (es: Seq[Expression]) => TokensToText(es.head)),
    ("text_to_tokens",
      new ExpressionInfo(classOf[TextToTokens].getName, "text_to_tokens"),
      (es: Seq[Expression]) => TextToTokens(es.head)),
    // rex-style ad-hoc extraction: graft_rex(raw, '<regex>')
    ("graft_rex",
      new ExpressionInfo(classOf[RegexExtractToMap].getName, "graft_rex"),
      (es: Seq[Expression]) => RegexExtractToMap(es.head,
        Literal(null, StringType), Literal(null, StringType),
        Seq(str(es(1), "graft_rex regex")), "", inject = false)),
    // full search-time extraction with host/source injection:
    // graft_fields(raw, host, source, '<extractor>'...)
    ("graft_fields",
      new ExpressionInfo(classOf[RegexExtractToMap].getName, "graft_fields"),
      (es: Seq[Expression]) => RegexExtractToMap(es.head, es(1), es(2),
        es.drop(3).map(str(_, "graft_fields extractor")), "_time", inject = true)),
    // json top-level extraction with Go %f stringification
    ("graft_json_fields",
      new ExpressionInfo(classOf[JsonToFieldsMap].getName, "graft_json_fields"),
      (es: Seq[Expression]) => JsonToFieldsMap(es.head,
        Literal(null, StringType), Literal(null, StringType), "", inject = false)),
    // last-wins map merge
    ("graft_map_union",
      new ExpressionInfo(classOf[MapUnion].getName, "graft_map_union"),
      (es: Seq[Expression]) => MapUnion(es.head, es(1))),
    // cosine similarity of two float arrays (double precision, index order)
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))),
    // dedup signatures over pre-hashed arrays / raw text pieces
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSig(es.head,
        graft.ml.TextDedup.COEF_A, graft.ml.TextDedup.COEF_B, graft.ml.TextDedup.MOD)),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHashSig(es.head, graft.ml.TextDedup.SIMHASH_BITS)),
    ("graft_lsh_sig",
      new ExpressionInfo(classOf[LshSig].getName, "graft_lsh_sig"),
      (es: Seq[Expression]) => LshSig(es.head, 16)),
    ("graft_md5_64",
      new ExpressionInfo(classOf[Md5Hash64].getName, "graft_md5_64"),
      (es: Seq[Expression]) => Md5Hash64(es.head)),
    // the shared text normalization (lower -> strip punct -> collapse ws)
    // every dedup/analysis operator funnels through — one compiled pass
    ("graft_normalize",
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize"),
      // the to-string cast keeps lower()'s coercion contract on the SQL
      // path too (NormalizeText declares no inputTypes; a bare bigint
      // argument would otherwise crash mid-query instead of coercing —
      // redundant casts on string columns are elided by Catalyst)
      (es: Seq[Expression]) => NormalizeText(Cast(es.head, StringType))),
    // distinct k-word shingles of the normalized text:
    // graft_shingles(text[, k]) (k defaults to the engine's SHINGLE_K)
    ("graft_shingles",
      new ExpressionInfo(classOf[ShingleJoin].getName, "graft_shingles"),
      (es: Seq[Expression]) => {
        val k = if (es.size > 1) es(1) match {
          case Literal(i: Int, _) => i
          case other => throw new IllegalArgumentException(
            s"graft_shingles k must be an int literal, got $other")
        } else graft.ml.TextDedup.SHINGLE_K
        ShingleJoin(
          org.apache.spark.sql.catalyst.expressions.StringSplit(
            NormalizeText(Cast(es.head, StringType)),
            Literal(UTF8String.fromString(" "), StringType),
            Literal(-1)), k)
      })
  )

  /** Register into an existing session: the function registry, plus the
    * range-join rewrite via `experimental.extraOptimizations` (the runtime
    * analog of `injectOptimizerRule`; they run as a post-hoc optimizer
    * batch). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RangeJoinAsEquiJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.RangeJoinAsEquiJoin
    }
  }
}
