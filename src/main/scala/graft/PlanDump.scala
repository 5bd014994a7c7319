package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifact the optimization rounds commit under
  * `plans/rNN/<key>_<tag>.txt`. Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <tag> <key>[,<key>...]"
  *
  * Reads the same `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` contract as
  * Bench so the dumped plan is the one the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <keys,csv>")
    val Array(outDir, tag, keysCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(",")}")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${k}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${k}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
