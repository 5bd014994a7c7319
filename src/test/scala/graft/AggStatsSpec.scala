package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side pins for the r19 exact-statistic aggregate widenings.
  * The oracles pin the cross-engine arithmetic; these pin the
  * published-theorem ranges and the scalar re-derivations.
  */
class AggStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_agg_bootstrap: scalar replicate replay + the CI brackets the point mean") {
    val rows = SparkEntry.queries("q_agg_bootstrap")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sf0001, "events")
      .selectExpr("event_type", "event_id",
        "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(id: Long, r: Int): Long = {
      val hex = md.digest(s"$id:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16) % 1000000000L
      if (u < 367879441L) 0 else if (u < 735758882L) 1 else if (u < 919698603L) 2
      else if (u < 981011843L) 3 else if (u < 996340153L) 4 else 5
    }
    rows.foreach { r =>
      val et = r.getString(0)
      val mine = ev.filter(_._1 == et)
      assert(r.getAs[Long]("n") == mine.length.toLong)
      assert(r.getAs[Long]("n_replicates") == 32L)
      // full scalar replay of all 32 replicate means + the rank picks
      val means = (0 until 32).map { rep =>
        var (sv, sw) = (0L, 0L)
        mine.foreach { case (_, id, v) =>
          val w = weight(id, rep); sv += w * v; sw += w }
        // Poisson(1) mass conservation: the replicate resamples ~n rows
        assert(math.abs(sw.toDouble / mine.length - 1.0) < 0.25,
          s"$et rep $rep resampled $sw of ${mine.length}")
        (math.floor(sv.toDouble / sw.toDouble).toLong, rep)
      }.sorted
      val (lo, hi) = (means(1)._1, means(30)._1) // ranks 2 and 31
      assert(r.getAs[Long]("boot_lo_micros") == lo, s"$et lo")
      assert(r.getAs[Long]("boot_hi_micros") == hi, s"$et hi")
      // the band is ordered and brackets the point estimate
      val point = r.getAs[Long]("mean_micros")
      assert(lo <= hi && lo <= point && point <= hi,
        s"$et CI [$lo, $hi] does not bracket $point")
    }
  }

  test("q_agg_hhi: scalar re-derivation + the published HHI range") {
    val rows = SparkEntry.queries("q_agg_hhi")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // scalar re-derivation from the floored per-supplier dollars
    val perSupp = Tables(spark, sf0001, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1.0 - l_discount AS DECIMAL(4,2))")).as("rev"))
      .selectExpr("l_suppkey", "CAST(floor(rev) AS BIGINT) AS dollars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val suppNation = Tables(spark, sf0001, "supplier")
      .join(Tables(spark, sf0001, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byNation = perSupp.toSeq
      .flatMap { case (k, d) => suppNation.get(k).map(_ -> d) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val ds = byNation(r.getString(0))
      val (tot, sq) = (ds.sum, ds.map(d => d * d).sum)
      assert(r.getAs[Long]("n_suppliers") == ds.length.toLong)
      assert(r.getAs[Long]("total_dollars") == tot && r.getAs[Long]("sum_sq") == sq,
        s"${r.getString(0)} exact sums drifted")
      val hhi = math.floor(sq.toDouble / (tot.toDouble * tot.toDouble) * 1e6).toLong
      assert(r.getAs[Long]("hhi_ppm") == hhi, s"${r.getString(0)} hhi chain")
      // the published range: 10⁶/n (perfect competition) ≤ HHI ≤ 10⁶
      // (monopoly) — Cauchy–Schwarz on the shares
      assert(hhi >= 1000000L / ds.length - 1 && hhi <= 1000000L,
        s"${r.getString(0)} HHI $hhi outside [1e6/n, 1e6]")
    }
  }
}
