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

  // Every declared query — the gate hashes all of them.
  private val risky = SparkEntry.queries.keys.toSeq.sorted

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
