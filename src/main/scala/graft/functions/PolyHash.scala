package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Seeded polynomial rolling hash over a string's bytes:
  *
  *   acc_0 = seed;  acc_{i+1} = (31 * acc_i + byte_i) mod 1_000_000_007
  *
  * This is the engine's one shared hash primitive for MinHash signatures,
  * SimHash, n-gram fingerprints and document fingerprinting
  * (graft.pipeline). Two deliberate properties:
  *
  *  1. **Exactly reproducible in ANSI-ish SQL** (the correctness oracle):
  *     `list_reduce(list_prepend(seed, list_transform(string_split(s, ''),
  *     c -> ord(c))), (a, c) -> (a * 31 + c) % 1000000007)` — byte == code
  *     point holds because callers feed it ASCII-normalized tokens.
  *  2. **Whole-stage-codegen'd**: `doGenCode` emits a tight byte loop, so
  *     hashing lives inside the scan stage with no UDF/serialization cost —
  *     at 100 TB the hash is applied to every shingle of every document and
  *     must run at memory bandwidth, not at lambda-invocation speed.
  *
  * The modulus 1e9+7 keeps `31*acc + 255` well inside Long, so the same
  * fold is overflow-free in engines with checked 64-bit arithmetic.
  */
case class PolyHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == org.apache.spark.sql.types.StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects (string, bigint), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(str: Any, seed: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    var acc = seed.asInstanceOf[Long]
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % PolyHash.Mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, seed) => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = $seed;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % ${PolyHash.Mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PolyHash {
  val Mod: Long = 1000000007L

  def apply(c: Column, seed: Long): Column =
    GraftBridge.column(
      PolyHash(GraftBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(seed)))

  def apply(c: Column, seed: Column): Column =
    GraftBridge.column(
      PolyHash(GraftBridge.expression(c), GraftBridge.expression(seed)))

  /** JVM-side twin of the expression (for tests / driver-side checks). */
  def hash(s: String, seed: Long): Long = {
    val bytes = s.getBytes("UTF-8")
    var acc = seed
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    acc
  }

  /** Register as SQL function `poly_hash(str, seed)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "poly_hash", exprs => PolyHash(exprs.head,
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.LongType)), "built-in")
}
