package graft

import graft.core.{GraftExtensions, GraftFunctions}
import graft.functions.PolyHash

/** The SQL function surface: every custom expression is callable from
  * spark.sql after registration, and the extensions class installs without
  * error (the cluster-wide `spark.sql.extensions` path).
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes the kernels to SQL with exact semantics") {
    GraftFunctions.registerAll(spark)
    Seq(("the quick brown fox jumps over the lazy dog", 7L))
      .toDF("s", "seed").createOrReplaceTempView("ext_in")

    val r = spark.sql(
      """SELECT poly_hash(s, seed) AS ph,
        |       minhash_sig(s, 3, 8) AS mh,
        |       simhash_sig(s, 3, 30) AS sh,
        |       sorted_jaccard(array('a','b','c'), array('b','c','d')) AS jac
        |FROM ext_in""".stripMargin).collect()(0)

    assert(r.getAs[Long]("ph") ==
      PolyHash.hash("the quick brown fox jumps over the lazy dog", 7L))
    val mh = r.getAs[scala.collection.Seq[Long]]("mh")
    assert(mh.length == 8 && mh.forall(h => h >= 0 && h < PolyHash.Mod))
    val sh = r.getAs[Long]("sh")
    assert(sh >= 0 && sh < (1L << 30))
    assert(r.getAs[Double]("jac") == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("poly_hash accepts SQL integer-literal seeds (widened to bigint)") {
    GraftFunctions.registerAll(spark)
    val got = spark.sql("SELECT poly_hash('abc', 0) AS h").collect()(0).getLong(0)
    assert(got == PolyHash.hash("abc", 0L))
  }

  test("non-literal shingle parameters are rejected with a clear error") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig('x', cast(rand()*3 as int), 8)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("pipeline kernels are SQL-callable with exact semantics") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT char_ngram_codes('ab cd', 2) AS ng,
        |       vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       vec_sqdist(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS sqd,
        |       vec_dot(array(CAST(1.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |               array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dt,
        |       srp_bucket(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 4) AS bkt
        |FROM (SELECT 1)""".stripMargin).collect()(0)
    // "ab cd" → grams {ab, "b ", " c", cd}: 4 distinct codes, sorted
    val ng = r.getAs[scala.collection.Seq[Long]]("ng")
    assert(ng.length == 4 && ng == ng.sorted)
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getAs[Double]("sqd") == 5.0)
    assert(r.getAs[Double]("dt") == 14.0)
    val bkt = r.getAs[Long]("bkt")
    assert(bkt >= 0 && bkt < 16)
    // misuse fails at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_cosine(array(1, 2), array(2, 3))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT srp_bucket('not a vector', 4)").collect()
    }
  }

  test("type misuse of SQL-registered kernels fails at analysis, not execution") {
    GraftFunctions.registerAll(spark)
    // int arrays — would ClassCastException mid-job without checkInputDataTypes
    val jac = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_jaccard(array(1, 2), array(2, 3))").collect()
    }
    assert(jac.getMessage.toLowerCase.contains("sorted_jaccard"))
    // mismatched element types across sides
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_jaccard(array('a'), array(1L))").collect()
    }
    // non-string input to the signature kernels
    val mh = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(array('a'), 3, 8)").collect()
    }
    assert(mh.getMessage.toLowerCase.contains("minhash_sig"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash_sig(42, 3, 30)").collect()
    }
  }

  test("extensions class injects all functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on a malformed injection
  }
}
