package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The sorted distinct character-trigram set of a string, as packed
  * 63-bit integer codes, in one pass.
  *
  * Equivalent to `array_sort(array_distinct(transform(sequence(1,
  * length(text) - 2), i -> substr(text, i, 3))))` but with zero string
  * allocation: each trigram (three consecutive code points, exactly what
  * `substr(text, i, 3)` slices) is packed as
  *
  *   code = cp0 << 42 | cp1 << 21 | cp2     (code points are <= 0x10FFFF,
  *                                           i.e. 21 bits each)
  *
  * The packing is INJECTIVE, so intersection and union sizes over code
  * sets are identical to those over the trigram-string sets — Jaccard
  * values are bit-for-bit the same as the string formulation the DuckDB
  * oracle runs, with no hash-collision caveat. Sorting by code instead of
  * by string changes only the (irrelevant) merge order inside a pair.
  *
  * At 100 TB this is the difference between shuffling ~1 KB of long[] and
  * ~3 KB of strings per document, and between 8-byte compares and UTF-8
  * byte-wise compares in the O(pairs x |grams|) merge loop.
  */
case class TrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_codes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TrigramCodes.codes(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TrigramCodes$$.MODULE$$.codes($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramCodes {
  def codes(s: UTF8String): Array[Long] = {
    val str = s.toString
    val len = str.length
    // decode UTF-16 to code points once (substr() counts code points)
    var n = 0
    var i = 0
    while (i < len) { i += Character.charCount(str.codePointAt(i)); n += 1 }
    if (n < 3) return Array.emptyLongArray
    val cps = new Array[Int](n)
    i = 0; var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    var j = 0
    while (j < n - 2) {
      out(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) | cps(j + 2).toLong
      j += 1
    }
    java.util.Arrays.sort(out)
    var m = 0; var p = 0
    while (p < out.length) {
      if (m == 0 || out(p) != out(m - 1)) { out(m) = out(p); m += 1 }
      p += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trigram_codes", exprs => TrigramCodes(exprs.head), "scala_udf")
}
