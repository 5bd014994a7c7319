package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM (suites must not stop it). */
object TestSpark {
  lazy val spark: SparkSession = {
    // Same catalog stack as the driver entry points: real Hive metastore
    // (embedded Derby) + scratch warehouse, all under tmpdir (GraftSession).
    val s = GraftSession.builder("8")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
