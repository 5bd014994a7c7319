package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_incremental is the nightly-ingest shape: dedup a new id-suffix
  * batch against the already-deduped corpus without re-pairing the corpus
  * with itself. Properties that keep it honest:
  *  - SAME ANSWER: the incremental pair set must equal the full
  *    q_dedup_near recompute restricted to delta-touching pairs (a miss
  *    or an extra is a wrong answer, not a perf trade);
  *  - EXACTLY ONCE: no (doc_a, doc_b) pair may appear twice (new-new
  *    pairs meet in the join from both sides unless the id order prunes
  *    one copy);
  *  - DELTA-PROPORTIONAL CANDIDATES: the candidate join must emit
  *    exactly the delta-touching subset of the blocked generator's
  *    pairs — the corpus-side self-join volume never comes back.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.Dedup

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  private def meta = docs.selectExpr("doc_id", "lang",
    "n_chars DIV 50 AS bucket", "size(array_distinct(split(text, ' '))) AS sz")

  private lazy val cut =
    docs.selectExpr("(4 * max(doc_id)) DIV 5 AS c").head().getLong(0)

  test("incremental result equals the full recompute restricted to the delta") {
    val full = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .where(col("doc_b") > cut)
    val incr = SparkEntry.queries("q_dedup_incremental")(spark, sf0001)
    assert(incr.count() > 0, "empty delta pair set — fixture split broken")
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental pair set diverges from the filtered full recompute")
  }

  test("every pair is emitted exactly once and touches the delta") {
    val incr = SparkEntry.queries("q_dedup_incremental")(spark, sf0001)
    val dup = incr.groupBy("doc_a", "doc_b").count().where(col("count") > 1)
    assert(dup.isEmpty, s"duplicate pairs: ${dup.take(5).mkString(", ")}")
    assert(incr.where(col("doc_b") <= cut).isEmpty,
      "pair with both sides in the old corpus leaked into the delta set")
  }

  test("ingest fold is batching-invariant: k=1, k=4, k=7 all equal the one-shot answer") {
    // k=1 IS the one-shot batch recompute (one batch = the whole corpus);
    // k=7 deliberately misaligns the cuts with k=4's so equality across
    // all three rules out any cut-boundary luck. The grow-only signature
    // store is what makes this hold: a dropped doc keeps dropping its
    // later near-dups.
    val k1 = Dedup.ingestSurvivors(spark, sf0001, 1)
    val k4 = Dedup.ingestSurvivors(spark, sf0001, 4)
    val k7 = Dedup.ingestSurvivors(spark, sf0001, 7)
    assert(k1.count() > 0, "empty survivor set — fixture broken")
    assert(k1.exceptAll(k4).isEmpty && k4.exceptAll(k1).isEmpty,
      "k=4 fold diverges from the one-shot answer")
    assert(k1.exceptAll(k7).isEmpty && k7.exceptAll(k1).isEmpty,
      "k=7 fold diverges from the one-shot answer")
  }

  test("ingest survivors are exactly the docs no near-dup edge points at") {
    val dropped = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .select(col("doc_b").as("doc_id")).distinct()
    val expected = docs.select("doc_id")
      .join(dropped, Seq("doc_id"), "left_anti")
    val got = SparkEntry.queries("q_dedup_ingest")(spark, sf0001)
    assert(got.count() < docs.count(),
      "nothing dropped — the fixture's near-dup corpus should shed docs")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "ingest survivors diverge from the near-dup edge anti-join")
  }

  test("candidate volume is the delta-touching subset of the blocked join") {
    val m = meta
    val incrCand = Dedup.incrementalCandidates(
      m.where(col("doc_id") > cut), m, 4, 5)
    val blocked = m.as("a").join(m.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * 5 >= col("b.sz") * 4 && col("b.sz") * 5 >= col("a.sz") * 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val blockedDelta = blocked.where(col("doc_b") > cut)
    assert(incrCand.exceptAll(blockedDelta).isEmpty &&
      blockedDelta.exceptAll(incrCand).isEmpty,
      "incremental candidates are not exactly the delta-touching blocked pairs")
    // and the point of the exercise: the full blocked volume never comes back
    val nIncr = incrCand.count()
    val nFull = blocked.count()
    assert(nIncr < nFull,
      s"incremental candidates ($nIncr) not below the full blocked join ($nFull)")
  }
}
