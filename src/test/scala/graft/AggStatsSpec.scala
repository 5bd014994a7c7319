package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side pins for the r19 exact-statistic aggregate widenings.
  * The oracles pin the cross-engine arithmetic; these pin the
  * published-theorem ranges and the scalar re-derivations.
  */
class AggStatsSpec extends AnyFunSuite {
  import TestSpark._

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
