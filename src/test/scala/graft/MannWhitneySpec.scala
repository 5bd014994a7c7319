package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_agg_mannwhitney (r19) — the rank-sum test. The oracle pins the
  * cross-engine arithmetic; this spec pins the STATISTICS: the exact
  * integers re-derive scalar-side from raw values (average ranks over
  * ties, carried as twice-rank integers), the rank-sum conservation
  * theorem holds (both sides' twice-rank-sums total n(n+1)), U stays
  * inside its [0, 2·n₁·n₂] range, and the served z replays the one
  * IEEE chain.
  */
class MannWhitneySpec extends AnyFunSuite {
  import TestSpark._

  test("scalar re-derivation: twice-ranks, U, tie correction, z") {
    val rows = SparkEntry.queries("q_agg_mannwhitney")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("purchase", "signup", "view"))

    val ev = Tables(spark, sf0001, "events")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val click = ev.collect { case ("click", v) => v }

    rows.foreach { r =>
      val other = r.getString(0)
      val sample2 = ev.collect { case (`other`, v) => v }
      val (n1, n2) = (click.length.toLong, sample2.length.toLong)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)

      // pooled grid: per distinct value, tie size c and running count f
      val pooled = (click.map((_, true)) ++ sample2.map((_, false)))
        .groupBy(_._1).toSeq.sortBy(_._1)
      var f = 0L; var r1x2 = 0L; var r2x2 = 0L; var tie3 = 0L
      pooled.foreach { case (_, g) =>
        val c = g.length.toLong
        val c1 = g.count(_._2).toLong
        f += c
        val rank2 = 2 * f - c + 1 // twice the average rank of the tie block
        r1x2 += c1 * rank2
        r2x2 += (c - c1) * rank2
        tie3 += c * (c * c - 1)
      }
      val n = n1 + n2
      // conservation: all pooled twice-ranks sum to 2·(1+2+…+n) = n(n+1)
      assert(r1x2 + r2x2 == n * (n + 1), s"$other rank-sum conservation")
      val u1x2 = r1x2 - n1 * (n1 + 1)
      assert(r.getAs[Long]("u1x2") == u1x2, s"$other U")
      assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2, s"$other U out of range")
      assert(r.getAs[Long]("tie3") == tie3, s"$other tie correction")

      // the one IEEE chain, replayed in identical op order
      val z = (u1x2.toDouble - n1.toDouble * n2.toDouble) /
        (2.0 * math.sqrt(n1.toDouble * n2.toDouble / 12.0 *
          ((n + 1).toDouble - tie3.toDouble / (n.toDouble * (n - 1).toDouble))))
      assert(r.getAs[Long]("z_micros") == math.floor(z * 1000000.0).toLong,
        s"$other z chain")
    }
  }
}
