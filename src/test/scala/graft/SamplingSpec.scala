package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_sample_ppswor (r19) — Efraimidis–Spirakis weighted sampling
  * without replacement. The oracle pins the arithmetic; this spec pins
  * the ALGORITHM: the race keys replay scalar-side (salted md5
  * uniform, fixed-point lns, one IEEE division), the served 100 are
  * exactly the k smallest keys, the sample is nested in k, and the
  * PPS property holds (length-weighted sampling overrepresents long
  * docs vs the uniform reservoir).
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("q_sample_ppswor: scalar race replay, top-k exactness, nesting, PPS property") {
    val rows = SparkEntry.queries("q_sample_ppswor")(spark, sf0001).collect()
    assert(rows.length == 100)

    val md = java.security.MessageDigest.getInstance("MD5")
    val lnC = math.round(math.log(1e9) * 1e6)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map { r =>
        val hex = md.digest((r.getString(2) + "|pps").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val uNum = java.lang.Long.parseLong(hex, 16) % 1000000000L + 1
        val lnu = math.round(math.log(uNum.toDouble) * 1e6)
        val key = (lnC - lnu).toDouble / r.getLong(1).toDouble
        (r.getLong(0), r.getLong(1), uNum, key)
      }
    val ranked = docs.sortBy { case (id, _, _, key) => (key, id) }
    val expect = ranked.take(100).map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet == expect, "served set is not the k smallest keys")
    rows.foreach { r =>
      val mine = docs.find(_._1 == r.getLong(0)).get
      assert(r.getAs[Long]("u_num") == mine._3, s"doc ${r.getLong(0)} uniform")
      assert(r.getAs[Long]("key_micros") == math.floor(mine._4 * 1e6).toLong,
        s"doc ${r.getLong(0)} race key")
    }
    // nested in k: the 50 smallest are a subset of the served 100
    assert(ranked.take(50).map(_._1).forall(expect.contains), "not nested in k")
    // the PPS property: mean sampled length exceeds the corpus mean
    // (weights ARE lengths, so long docs win proportionally more races)
    val meanSample = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / 100
    val meanCorpus = docs.map(_._2).sum.toDouble / docs.length
    assert(meanSample > meanCorpus,
      s"PPS property broken: sample mean $meanSample <= corpus mean $meanCorpus")
  }
}
