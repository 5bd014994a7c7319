package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_scan_timetravel + q_scan_deletevector — the snapshot/commit half of
  * the lake surface (q_scan_manifest pins the data-skipping half).
  *
  * The oracles certify the VALUES (version membership and survivor sets
  * recomputed from key arithmetic, layout-independent); this spec pins
  * the LAKE SEMANTICS the values ride on: commits are manifest writes
  * over immutable shared files (an append leaves the old files byte-
  * untouched; a delete is metadata-only and old snapshots stay
  * readable), and a positional delete is a KB-scale vector applied as a
  * broadcast anti-join, never a data-file rewrite.
  */
class LakeSpec extends AnyFunSuite {
  import TestSpark._

  private def snapPaths(root: String, v: Int): Set[String] =
    spark.read.parquet(s"$root/snapshots/v=$v")
      .collect().map(_.getString(0)).toSet

  test("time travel: commits share immutable files; a delete is metadata-only") {
    SparkEntry.queries("q_scan_timetravel")(spark, sf0001).collect() // build
    val root = operators.Warehouse.timeTravelRoot(sf0001)
    val (v0, v1, v2) = (snapPaths(root, 0), snapPaths(root, 1), snapPaths(root, 2))
    // the append commit (v1) kept every v0 file; the delete commit (v2)
    // dropped exactly bucket 1 from v1's list
    assert(v0.subsetOf(v1), "append commit rewrote the initial load's files")
    assert(v1.diff(v2) == Set(s"$root/files/b=1"), s"v2 dropped ${v1.diff(v2)}")
    // metadata-only delete: the dropped file's data is still on disk and
    // the OLD snapshot still reads it (time travel after the delete)
    val dropped = spark.read.parquet(s"$root/files/b=1")
    assert(dropped.count() > 0, "deleted bucket's file is gone from disk")
    val v1Scan = spark.read.parquet(v1.toSeq: _*)
    assert(v1Scan.inputFiles.exists(_.contains("b=1")),
      "v1 read no longer covers the bucket v2 deleted")
  }

  test("time travel: the served versions reconcile with the bucket counts") {
    val out = SparkEntry.queries("q_scan_timetravel")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("version") -> r.getAs[Long]("n_orders"))
      .toMap
    val byBucket = Tables(spark, sf0001, "orders")
      .groupBy((col("o_orderkey") % 4).as("b")).count()
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("count")).toMap
    assert(out(0L) == byBucket(0L) + byBucket(1L))
    assert(out(1L) == byBucket.values.sum)
    assert(out(2L) == out(1L) - byBucket(1L))
  }

  test("snapshot diff: the delta read reconciles the versions it bridges") {
    // the CDF contract: v0 + inserts == v1, v1 - deletes == v2, all in
    // row counts served by the two reads themselves
    val tt = SparkEntry.queries("q_scan_timetravel")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("n_orders")).toMap
    val d = SparkEntry.queries("q_scan_snapshotdiff")(spark, sf0001).collect()
      .map(r => r.getAs[String]("change") -> r.getAs[Long]("n_rows")).toMap
    assert(tt(0L) + d("insert") == tt(1L),
      s"v0 ${tt(0L)} + inserts ${d("insert")} != v1 ${tt(1L)}")
    assert(tt(1L) - d("delete") == tt(2L),
      s"v1 ${tt(1L)} - deletes ${d("delete")} != v2 ${tt(2L)}")
  }

  test("delete vector: one file per bucket, O(deleted) state, broadcast anti-join") {
    val df = SparkEntry.queries("q_scan_deletevector")(spark, sf0001)
    df.collect() // build
    val (dataPath, dvPath) = operators.Warehouse.deleteVectorPaths(sf0001)
    // the positional coordinate (bucket, pos) is honest: one data file
    // per bucket, so bucket IS the file id
    val files = spark.read.parquet(dataPath)
      .withColumn("f", input_file_name())
      .groupBy("bucket").agg(countDistinct("f").as("nf"))
      .collect()
    assert(files.length == 8 && files.forall(_.getAs[Long]("nf") == 1L),
      s"expected one file per bucket, got ${files.mkString(",")}")
    // the vector holds exactly the DELETE predicate's rows and is small
    val data = spark.read.parquet(dataPath)
    val dvN = spark.read.parquet(dvPath).count()
    val predN = data
      .where(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0)
      .count()
    assert(dvN == predN && dvN > 0 && dvN < data.count() / 5,
      s"dv rows $dvN vs predicate rows $predN of ${data.count()}")
    // merge-on-read plan: the vector applies as a broadcast anti-join
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
  }

  test("delete vector is positionally sound: survivors == predicate recompute") {
    val served = SparkEntry.queries("q_scan_deletevector")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val direct = Tables(spark, sf0001, "orders")
      .where(!(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey") % 7).cast("bigint").as("sum_key_mod"),
        Dets.dbl(sum(Dets.money(col("o_totalprice")))).as("sum_price"))
      .orderBy("o_orderstatus")
      .collect().map(_.toString).toSeq
    assert(served == direct)
  }
}
