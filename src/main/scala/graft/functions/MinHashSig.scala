package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expression: the 8-value MinHash signature of a string
  * array in one pass, one md5 per token.
  *
  * The naive formulation — `array_min(transform(toks, t -> H(t || '#i')))`
  * per i — hashes every token once per signature row (8 md5s/token).
  * Here the base hash H(t) (first 15 hex digits of md5 as a 60-bit int,
  * same definition as everywhere else in this repo) is computed once and
  * the 8 hash functions are derived affinely:
  *
  *   h_i(t) = ((H(t) mod M) * A_i + i) mod M,  M = 2147483647 (prime),
  *   A_i = {3,5,7,11,13,17,19,23}
  *
  * — a formula the DuckDB oracle reproduces verbatim, so LSH candidates
  * (and therefore results) still hash-match.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // Empty (or all-null-element) input yields null — matching what the
  // oracle's list_min gives — so the output is nullable over non-null input.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = MinHashSig.sig(input.asInstanceOf[ArrayData])
    if (s == null) null else new GenericArrayData(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("graftSig")
      s"""
         |long[] $s = graft.functions.MinHashSig$$.MODULE$$.sig($a);
         |if ($s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val M: Long = 2147483647L
  val A: Array[Long] = Array(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** H(t): first 15 hex digits of md5(t) as an unsigned 60-bit long —
    * bit-identical to conv(substr(md5(t),1,15),16,10).
    */
  def h(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    // first 8 bytes big-endian = 16 hex digits; drop the last nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Null (not Long.MaxValue sentinels) when no hashable element exists —
    * the value DuckDB's list_min gives on an empty list. Null elements are
    * skipped, as every list_* aggregate-style reduction skips NULLs.
    */
  def sig(toks: ArrayData): Array[Long] = {
    val out = Array.fill(A.length)(Long.MaxValue)
    val n = toks.numElements()
    var seen = false
    var t = 0
    while (t < n) {
      val u = if (toks.isNullAt(t)) null else toks.getUTF8String(t)
      if (u != null) {
        seen = true
        val base = h(u.getBytes) % M
        var i = 0
        while (i < A.length) {
          val hi = (base * A(i) + i) % M
          if (hi < out(i)) out(i) = hi
          i += 1
        }
      }
      t += 1
    }
    if (seen) out else null
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "scala_udf")
}
