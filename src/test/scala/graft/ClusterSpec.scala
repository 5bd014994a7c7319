package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_cluster's DataFrame min-label propagation cross-checked
  * against GraphX's Pregel connectedComponents on the SAME edge set
  * (the q_dedup_near pair graph) — two independent implementations of
  * "label every doc with the min doc_id reachable from it", one answer.
  * GraphX also labels components by minimum vertex id, so the label
  * sets must match exactly, isolated docs included.
  */
class ClusterSpec extends AnyFunSuite {
  import TestSpark._

  test("q_dedup_cluster components agree with GraphX connectedComponents") {
    val near = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
    val edges = spark.sparkContext.parallelize(
      near.map(r => Edge(r.getLong(0), r.getLong(1), ())).toSeq)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val vertices = spark.sparkContext.parallelize(docs.toSeq.map(id => (id, ())))
    val cc = Graph(vertices, edges).connectedComponents()
      .vertices.collect().toMap
    val ours = SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
      .select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ours.keySet == cc.keySet)
    val diffs = ours.collect { case (id, comp) if cc(id) != comp =>
      s"doc $id: graphx=${cc(id)} ours=$comp" }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
  }

  test("reliable-checkpoint path yields identical components") {
    // the scale path: spark.graft.cluster.reliableCheckpoint=true swaps
    // executor-memory localCheckpoint for a reliable checkpoint() per
    // pass, so an executor loss mid-loop is survivable at 100 TB. Same
    // answer, different durability.
    val default = SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
      .select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.cluster.reliableCheckpoint", "true")
    try {
      val reliable = SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
        .select("doc_id", "component").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == default)
    } finally spark.conf.unset("spark.graft.cluster.reliableCheckpoint")
  }
}
