package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-level laws of the Morton encoding, checked through the engine
  * (the expressions are evaluated by Spark, not reimplemented here):
  * the interleave is a bijection on 16-bit pairs, and the inverse
  * (de-interleave of even/odd bits) recovers both coordinates exactly.
  * Quantization maps the domain ends to the first/last bucket and is
  * monotone, which is all the curve needs to cluster ranges.
  */
class ZOrderPropSpec extends AnyFunSuite {
  import TestSpark._

  private def unspread(zCol: org.apache.spark.sql.Column) = {
    // inverse of the magic-number spread: compact the even bits
    val m = (x: org.apache.spark.sql.Column, sh: Int, mask: Long) =>
      x.bitwiseOR(shiftright(x, sh)).bitwiseAND(lit(mask))
    var x = zCol.bitwiseAND(lit(0x55555555L))
    x = m(x, 1, 0x33333333L)
    x = m(x, 2, 0x0F0F0F0FL)
    x = m(x, 4, 0x00FF00FFL)
    x = m(x, 8, 0x0000FFFFL)
    x
  }

  test("zval is injective on 16-bit pairs and de-interleaves back to (a, b)") {
    // seeded Random, not Gen.sample (which may return None and fail the
    // suite for a reason unrelated to the property under test)
    val rnd = new scala.util.Random(0x5eed)
    val pairs = List.fill(500)((rnd.nextLong(65536L), rnd.nextLong(65536L))).distinct
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => org.apache.spark.sql.Row(p._1, p._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
      .withColumn("z", ZOrder.zval(col("a"), col("b")))
      .withColumn("a2", unspread(col("z")))
      .withColumn("b2", unspread(shiftright(col("z"), 1)))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a2") == r.getAs[Long]("a"), r.toString)
      assert(r.getAs[Long]("b2") == r.getAs[Long]("b"), r.toString)
    }
    assert(rows.map(_.getAs[Long]("z")).distinct.length == pairs.length)
  }

  test("quant16 pins domain ends to buckets 0/65535 and is monotone") {
    val df = spark.range(0, 1000)
      .withColumn("x", col("id") * 37 % 100000)
      .withColumn("q", ZOrder.quant16(col("x"), lit(0L), lit(99999L)))
    val rows = df.select("x", "q").collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("q"))).sortBy(_._1)
    rows.foreach { case (_, q) => assert(q >= 0L && q <= 65535L) }
    rows.sliding(2).foreach {
      case Array((x1, q1), (x2, q2)) =>
        assert(q1 <= q2, s"not monotone at $x1->$q1, $x2->$q2")
      case _ =>
    }
    val ends = spark.range(1)
      .select(
        ZOrder.quant16(lit(0L), lit(0L), lit(99999L)).as("lo"),
        ZOrder.quant16(lit(99999L), lit(0L), lit(99999L)).as("hi"))
      .head()
    assert(ends.getAs[Long]("lo") == 0L && ends.getAs[Long]("hi") == 65535L)
  }
}
