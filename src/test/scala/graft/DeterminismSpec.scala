package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2.3: the t2 gate hashes output files, so results must be
  * byte-stable under different physical plans. Re-run the most
  * order/float-sensitive queries with shuffle.partitions 3 vs 13 and
  * assert identical collected output — catches any §7.4 violation
  * (unordered output, raw double aggregation, arbitrary-row pick) cheaply.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  private val risky = Seq(
    "q_agg_hashgroup", "q_agg_stats", "q_agg_percentile", "q_agg_minmaxby",
    "q_agg_collect", "q_win_rank", "q_win_running", "q_sim_topk",
    "q_dedup_near", "q_dedup_minhash", "q_text_tfidf", "q_multimodal_cluster",
    "q_stream_session", "q_udaf_typed", "q_sink_batched")

  private def runWith(parts: Int, name: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", 8)
  }

  risky.foreach { name =>
    test(s"$name is byte-stable across shuffle partition counts") {
      val a = runWith(3, name)
      val b = runWith(13, name)
      assert(a == b, s"$name differs between 3 and 13 shuffle partitions")
    }
  }
}
