package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native kernels: every custom Catalyst expression
  * registered as a `graft_*` SQL function, so `spark.sql("...")` users
  * get the same operators as the Column API (SURVEY §2's "user could
  * switch engines and run every query" bar includes the SQL route).
  *
  * Two registration paths:
  *   - new sessions: `.config("spark.sql.extensions",
  *     "graft.functions.GraftSparkExtensions")` — the public extension
  *     point, survives into every derived `newSession()`;
  *   - existing sessions: `GraftFunctions.register(spark)` (temp
  *     functions via the bridge shim).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder, usage) for every graft SQL function. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_simhash64",
      (args: Seq[Expression]) => NativeExpressions.SimHash64(args.head),
      "graft_simhash64(array<bigint>) - 64-bit SimHash from shingle hashes"),
    ("graft_word_shingles",
      (args: Seq[Expression]) => NativeExpressions.WordShingles(
        args.head, intArg(args(1), "n")),
      "graft_word_shingles(text, n) - distinct word n-gram shingles"),
    ("graft_cosine",
      (args: Seq[Expression]) => NativeExpressions.CosineSimFloat(args(0), args(1)),
      "graft_cosine(array<float>, array<float>) - cosine similarity"),
    ("graft_quantized_cosine",
      (args: Seq[Expression]) => NativeExpressions.QuantizedCosine(args(0), args(1)),
      "graft_quantized_cosine(a, b) - engine-reproducible quantized cosine"),
    ("graft_rademacher_sigs",
      (args: Seq[Expression]) => NativeExpressions.RademacherSigs(args.head,
        intArg(args(1), "tables"), intArg(args(2), "planes"), intArg(args(3), "dim")),
      "graft_rademacher_sigs(vec, tables, planes, dim) - engine-reproducible LSH sign signatures"),
    ("graft_minhash_sigs",
      (args: Seq[Expression]) => NativeExpressions.PortableMinHashSigs(
        args.head, intArg(args(1), "k")),
      "graft_minhash_sigs(shingles, k) - portable k-permutation MinHash signature"),
    ("graft_repetition_stats",
      (args: Seq[Expression]) => NativeExpressions.RepetitionStats(args.head),
      "graft_repetition_stats(text) - word/bigram repetition quality signals"),
    ("graft_max_by_ord",
      (args: Seq[Expression]) => NativeExpressions.ArgMaxByOrd(
        args.head, args.tail).toAggregateExpression(),
      "graft_max_by_ord(value, ord, ...) - hash-aggregable argmax (agg)"),
    ("graft_wav_stats",
      (args: Seq[Expression]) => NativeExpressions.WavSampleStats(args.head),
      "graft_wav_stats(binary) - one-pass PCM-16 sample stats (sum_abs, peak_abs)"),
    ("graft_bounded_levenshtein",
      (args: Seq[Expression]) => NativeExpressions.BoundedLevenshtein(
        args(0), args(1), intArg(args(2), "k")),
      "graft_bounded_levenshtein(a, b, k) - min(levenshtein, k+1) via the banded DP"),
    ("graft_normalize",
      (args: Seq[Expression]) => NativeExpressions.NormalizeFold(args.head),
      "graft_normalize(text) - NFC + strip diacritics + casefold (dedup canonical form)"),
    ("graft_winnow",
      (args: Seq[Expression]) => NativeExpressions.WinnowStats(
        args.head, intArg(args(1), "k"), intArg(args(2), "w")),
      "graft_winnow(text, k, w) - winnowing fingerprint stats (MOSS scheme)"),
    ("graft_wav_qc",
      (args: Seq[Expression]) => NativeExpressions.WavQcStats(
        args.head, intArg(args(1), "clipAbs"), intArg(args(2), "silenceAbs")),
      "graft_wav_qc(binary, clipAbs, silenceAbs) - clipping/dead-air/energy QC stats"),
    // the URL-curation kernel (ops/UrlOps): pure Column compositions of
    // codegen'd builtins, bridged to expressions — SQL users get the
    // same canonicalization convention the q157/q159 oracles hash-pin
    ("graft_canonical_url",
      (args: Seq[Expression]) => ColumnBridge.composedExpression(
        graft.ops.UrlOps.canonicalizeUrl(ColumnBridge.column(args.head))),
      "graft_canonical_url(url) - idempotent canonical URL (dedup identity form)"),
    ("graft_registrable_domain",
      (args: Seq[Expression]) => ColumnBridge.composedExpression(
        graft.ops.UrlOps.registrableDomain(graft.ops.UrlOps.urlHost(
          ColumnBridge.column(args.head)))),
      "graft_registrable_domain(url) - registrable domain of a url's host"),
    ("graft_term_counts",
      (args: Seq[Expression]) => NativeExpressions.TermCounts(args.head,
        args.tail.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_term_counts terms must be string literals, got $other")
        }),
      "graft_term_counts(text, term, ...) - one-pass whitespace-token counts per term"))

  /** Register every graft_* function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      ColumnBridge.registerTempFunction(spark, name, builder)
    }
}

/** The `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}
