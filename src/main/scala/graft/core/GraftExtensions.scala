package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}

import graft.functions.{CharNgramCodes, MinHashSig, PolyHash, SimHashSig, SortedArrayJaccard, SrpBucket, VecCosine}

/** SQL surface of the engine's custom Catalyst expressions. Install with
  * `spark.sql.extensions=graft.core.GraftExtensions` (cluster-wide) or call
  * [[GraftFunctions.registerAll]] on an existing session. Exposes:
  *
  *  - `poly_hash(str, seed)` — the shared rolling hash
  *  - `minhash_sig(text, k, n)` — k-shingle MinHash signature, n hashes
  *  - `simhash_sig(text, k, bits)` — k-shingle SimHash signature
  *  - `sorted_jaccard(a, b)` — exact Jaccard of sorted distinct arrays
  *  - `char_ngram_codes(text, n)` — sorted distinct base-37 n-gram codes
  *  - `vec_cosine(a, b)` — single-pass cosine of float/double vectors
  *  - `srp_bucket(vec, planes)` — signed-random-projection LSH bucket id
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[PolyHash].getName.stripSuffix("PolyHash") + name,
      null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("poly_hash"),
      info("PolyHash", "poly_hash(str, seed) - seeded polynomial rolling hash mod 1e9+7"),
      // widen integer-literal seeds: SQL `poly_hash(s, 0)` sends an INT
      (exprs: Seq[Expression]) =>
        PolyHash(exprs(0), Cast(exprs(1), org.apache.spark.sql.types.LongType))),
    (FunctionIdentifier("minhash_sig"),
      info("MinHashSig", "minhash_sig(text, k, n) - MinHash signature over k-token shingles"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), intArg(exprs(1), "shingle k"), intArg(exprs(2), "numHashes"))),
    (FunctionIdentifier("simhash_sig"),
      info("SimHashSig", "simhash_sig(text, k, bits) - SimHash signature over k-token shingles"),
      (exprs: Seq[Expression]) =>
        SimHashSig(exprs(0), intArg(exprs(1), "shingle k"), intArg(exprs(2), "bits"))),
    (FunctionIdentifier("sorted_jaccard"),
      info("SortedArrayJaccard", "sorted_jaccard(a, b) - exact Jaccard of sorted distinct arrays"),
      (exprs: Seq[Expression]) => SortedArrayJaccard(exprs(0), exprs(1))),
    (FunctionIdentifier("char_ngram_codes"),
      info("CharNgramCodes", "char_ngram_codes(text, n) - sorted distinct base-37 n-gram codes"),
      (exprs: Seq[Expression]) => CharNgramCodes(exprs(0), intArg(exprs(1), "n-gram length"))),
    (FunctionIdentifier("vec_cosine"),
      info("VecCosine", "vec_cosine(a, b) - single-pass cosine similarity of numeric vectors"),
      (exprs: Seq[Expression]) => VecCosine(exprs(0), exprs(1))),
    (FunctionIdentifier("srp_bucket"),
      info("SrpBucket", "srp_bucket(vec, planes) - signed-random-projection LSH bucket id"),
      (exprs: Seq[Expression]) => SrpBucket(exprs(0), intArg(exprs(1), "planes")))
  )

  /** Register every function on an already-built session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
