package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same operators as the Column API:
  *
  * {{{
  * spark = SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")...
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * No custom optimizer rules or planner strategies are injected: the whole
  * operator surface composes from built-ins plus scalar expressions, so
  * Catalyst's existing rules (pushdown, pruning, join selection, AQE)
  * already produce the plans we want (SURVEY.md §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("quantized_dot"),
      info("quantized_dot", "quantized_dot(a, b) - integer dot product of two bigint code arrays"),
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(tokens) - order-sensitive fingerprint"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    ext.injectFunction((FunctionIdentifier("shingle_simhash"),
      info("shingle_simhash", "shingle_simhash(tokens, n) - SimHash over word n-grams"),
      (args: Seq[Expression]) => ShingleSimHash(args.head, foldableInt(args(1)))))
    ext.injectFunction((FunctionIdentifier("shingle_minhash"),
      info("shingle_minhash", "shingle_minhash(tokens, k, n) - MinHash signature over word n-grams"),
      (args: Seq[Expression]) => ShingleMinHash(args.head, foldableInt(args(1)), foldableInt(args(2)))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(tokens, n, w) - winnowing: rightmost-min shingle hash per w-window (MOSS scheme)"),
      (args: Seq[Expression]) => WinnowFingerprints(args.head, foldableInt(args(1)), foldableInt(args(2)))))
    ext.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid",
        "nearest_centroid(emb, cents) - id of the centroid (array<struct<cent_id,centroid>>) with highest cosine to emb"),
      (args: Seq[Expression]) => NearestCentroid(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bits, key, numBits, numHashes) - probe a bloom bitset built by the BloomFilter aggregator"),
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1),
        foldableInt(args(2)), foldableInt(args(3)))))
  }

  private def foldableInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal integer argument, got non-foldable $e")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }
  }
}
