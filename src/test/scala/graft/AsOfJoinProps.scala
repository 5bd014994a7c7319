package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** Property harness for the hand-rolled AsOfJoinExec merge: random
  * inputs over a SMALL key space (forcing duplicate times, left-only
  * keys, right-only keys, empty partitions) must match an independent
  * reference implementation (the composed carry-forward window) row for
  * row, across partition counts. Seeded LCG, not rand() — failures
  * reproduce.
  */
class AsOfJoinProps extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deterministic pseudo-random longs from a seed (splitmix-style)
  private def gen(seed: Long, n: Int, keyspace: Int, times: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val k = math.floorMod(z, keyspace).toLong
      val t = math.floorMod(z >>> 17, times).toLong
      (k, t, i.toLong) // id doubles as the right-side tiebreak
    }

  private def reference(l: DataFrame, r: DataFrame): Seq[String] = {
    // composed carry-forward form (independent of the native code path):
    // union both sides, orders-before-events at equal time via kind,
    // last(ignoreNulls) carries the winner
    val lu = l.select(col("k"), col("t"), lit(1).as("kind"), col("lid"),
      lit(null).cast("struct<rid:bigint,rt:bigint>").as("ord"))
    val ru = r.select(col("k"), col("rt").as("t"), lit(0).as("kind"),
      lit(null).cast("bigint").as("lid"),
      struct(col("rid"), col("rt")).as("ord"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("kind"), col("ord.rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ru.unionByName(lu)
      .withColumn("asof", last(col("ord"), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("lid"), col("asof.rid").as("rid"), col("asof.rt").as("rt"))
      .orderBy("lid")
      .collect().map(_.toString).toSeq
  }

  private def native(l: DataFrame, r: DataFrame): Seq[String] =
    AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", rightOrder = Seq("rid"))
      .select(col("lid"), col("rid"), col("rt"))
      .orderBy("lid")
      .collect().map(_.toString).toSeq

  test("native as-of equals the window reference on adversarial random inputs") {
    for (seed <- Seq(1L, 7L, 42L); parts <- Seq(3, 13)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        // tiny key/time spaces maximize collisions: equal times on both
        // sides, several right rows per (key, time), keys missing from
        // either side
        val l = gen(seed, 400, keyspace = 11, times = 17)
          .toDF("k", "t", "lid")
        val r = gen(seed * 31 + 5, 300, keyspace = 13, times = 17)
          .toDF("rk", "rt", "rid").withColumnRenamed("rk", "k")
        val lv = l
        val rv = r.withColumnRenamed("k", "rk")
        val got = native(lv, rv)
        val want = reference(lv.withColumnRenamed("lid", "lid"),
          rv.withColumnRenamed("rk", "k"))
        assert(got == want, s"seed=$seed parts=$parts")
        assert(got.size == 400)
      } finally spark.conf.set("spark.sql.shuffle.partitions", 8)
    }
  }

  test("all-unmatched and empty-side inputs behave") {
    val l = Seq((1L, 5L, 0L), (2L, 5L, 1L)).toDF("k", "t", "lid")
    val rEmpty = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
    val outEmpty = AsOfJoin.asOf(l, rEmpty, "k", "rk", "t", "rt")
      .select("lid", "rid").collect()
    assert(outEmpty.length == 2 && outEmpty.forall(_.isNullAt(1)))
    // right rows strictly AFTER every left time never match (exclusive
    // of the future; inclusive of the present is covered above)
    val rLate = Seq((1L, 6L, 9L)).toDF("rk", "rt", "rid")
    val outLate = AsOfJoin.asOf(l, rLate, "k", "rk", "t", "rt")
      .select("lid", "rid").collect()
    assert(outLate.forall(_.isNullAt(1)))
    // equal time matches (inclusive)
    val rNow = Seq((1L, 5L, 9L)).toDF("rk", "rt", "rid")
    val outNow = AsOfJoin.asOf(l, rNow, "k", "rk", "t", "rt")
      .where(col("lid") === 0L).select("rid").collect()
    assert(outNow.head.getLong(0) == 9L)
  }
}
