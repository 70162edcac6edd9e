package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.functions.PolyHash

/** PolyHash: the codegen'd Catalyst expression, the SQL-registered function,
  * and the JVM twin must agree bit-for-bit on arbitrary ASCII input — the
  * whole oracle strategy for minhash/simhash/fingerprints rests on this.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("expression equals the JVM twin on randomized ASCII strings and seeds") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 300).map { _ =>
      val len = rnd.nextInt(40)
      val s = (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val seed = rnd.nextInt(1 << 20).toLong
      (s, seed)
    } :+ (("", 7L)) :+ (("a", 0L))
    val df = cases.toDF("s", "seed")
    val got = df.select(col("s"), col("seed"), PolyHash(col("s"), col("seed")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (s, seed, h) =>
      assert(h == PolyHash.hash(s, seed), s"mismatch for ('$s', $seed)")
    }
  }

  test("known fold values: acc = (31*acc + byte) mod 1e9+7") {
    assert(PolyHash.hash("", 5L) == 5L)
    assert(PolyHash.hash("a", 0L) == 'a'.toLong)         // 31*0 + 97
    assert(PolyHash.hash("ab", 0L) == 31L * 97 + 98)
    assert(PolyHash.hash("ab", 2L) == ((2L * 31 + 97) * 31 + 98) % PolyHash.Mod)
  }

  test("SQL registration: poly_hash(str, seed) is callable from spark.sql") {
    PolyHash.register(spark)
    Seq(("hello world", 3L)).toDF("s", "seed").createOrReplaceTempView("ph_in")
    val got = spark.sql("SELECT poly_hash(s, seed) AS h FROM ph_in").collect()(0).getLong(0)
    assert(got == PolyHash.hash("hello world", 3L))
  }

  test("null propagation") {
    val got = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(PolyHash(col("s"), lit(1L).cast("long")).as("h")).collect()(0)
    assert(got.isNullAt(0))
  }

  test("result stays in [0, 1e9+7) — exactly 30 usable signature bits") {
    val rnd = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val h = PolyHash.hash(s, rnd.nextInt(1000).toLong)
      assert(h >= 0L && h < PolyHash.Mod)
    }
  }
}
