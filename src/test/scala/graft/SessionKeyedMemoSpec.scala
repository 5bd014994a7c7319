package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.sync.ViewQueries

/** The shared-fold memos key on the SparkSession OBJECT, not its
  * identityHashCode — a hash collision between two sessions in one JVM
  * must never hand one session another's folded state (the a93901d
  * rationale, delivered to every memo in r13). This spec certifies the
  * ViewQueries instance of the pattern with two live sessions: each
  * gets its own state root, and both serve the correct (identical)
  * result from their own fold.
  */
class SessionKeyedMemoSpec extends AnyFunSuite {
  import TestSpark._

  test("two sessions fold into two distinct view-state roots, same served rows") {
    val s2 = spark.newSession()
    val q = SparkEntry.queries("q_view_incremental")
    val r1 = q(spark, sf0001).collect().map(_.toString).toSeq
    val r2 = q(s2, sf0001).collect().map(_.toString).toSeq
    assert(r1 == r2, "the two sessions' served states disagree")
    val roots = ViewQueries.sharedStates.snapshot.collect {
      case ((s, dir, keys), root)
          if dir == sf0001 && keys == "status,priority" &&
            ((s eq spark) || (s eq s2)) => (s, root)
    }.toMap
    assert(roots.size == 2, s"expected a memo entry per session, got $roots")
    assert(roots(spark) != roots(s2), "sessions share a fold root")
  }

  // r13 ADVICE: the memos must not retain state forever. Stopping the
  // shared context in-test would kill every other suite, so the stopped
  // sweep runs against an injected probe; the overflow cap against real
  // newSession() clones (the churn pattern the advice names).
  test("memo evicts stopped sessions and caps live-session churn") {
    val dead = scala.collection.mutable.Set.empty[org.apache.spark.sql.SparkSession]
    val memo = new SessionMemo[(org.apache.spark.sql.SparkSession, Int), String](
      _._1, cap = 100, stopped = dead.contains)
    val s2 = spark.newSession()
    memo.getOrBuild((spark, 1))(_ => "a")
    memo.getOrBuild((s2, 2))(_ => "b")
    assert(memo.liveSize == 2)
    dead += s2 // "s2 stopped"
    assert(memo.liveSize == 1, "stopped session's entry not swept")
    assert(memo.get((spark, 1)).contains("a"), "live session's entry lost")
    assert(memo.get((s2, 2)).isEmpty)

    val capped = new SessionMemo[(org.apache.spark.sql.SparkSession, Int), String](_._1, cap = 3)
    (1 to 10).foreach { i =>
      capped.getOrBuild((spark.newSession(), i))(_ => s"v$i")
    }
    assert(capped.liveSize <= 3,
      s"cap did not bound session churn: ${capped.liveSize} entries live")
    // a capped-out memo still memoizes going forward
    val k = (spark, 99)
    assert(capped.getOrBuild(k)(_ => "fresh") == "fresh")
    assert(capped.get(k).contains("fresh"))
  }

  // r14 verdict #4: the cap bounds SESSIONS, not entries — one session
  // holding more entries than the cap (Warehouse.written: 11 once-tags
  // vs old cap 8) must never thrash. The old `if (size > cap) clear()`
  // wholesale-cleared on every access past the cap and re-ran idempotent
  // layout writes.
  test("one session's full tag set never rebuilds under the cap") {
    var builds = 0
    val memo = new SessionMemo[(org.apache.spark.sql.SparkSession, String), Unit](
      _._1, cap = 2)
    val tags = (1 to 11).map(i => s"tag$i")
    tags.foreach(t => memo.getOrBuild((spark, t))(_ => builds += 1))
    tags.foreach(t => memo.getOrBuild((spark, t))(_ => builds += 1))
    assert(builds == 11, s"expected 11 builds (one per tag), got $builds")
    // churn from clone sessions evicts oldest-touched CLONES, not the
    // session that keeps getting accessed between them
    (1 to 5).foreach { i =>
      memo.getOrBuild((spark.newSession(), s"x$i"))(_ => ())
      memo.getOrBuild((spark, "tag1"))(_ => builds += 1)
    }
    tags.foreach(t => memo.getOrBuild((spark, t))(_ => builds += 1))
    assert(builds == 11, "clone-session churn evicted the active session's tags")
  }

  // The Warehouse end-to-end pin (r14 verdict #4 + the r15 race it
  // exposed): the layout queries run twice on a FRESH session — which
  // under the old (session, dir, tag) keying re-ran every mode=overwrite
  // layout write into the shared scratch path (thrash, plus
  // FAILED_READ_FILE races against parallel readers). Layouts are now
  // once per (dir, tag) per JVM: no tag this run touches may build more
  // than once, from any session.
  test("Warehouse: layout tags build at most once per JVM, any session") {
    val warehouseKeys = Seq(
      "q_hive_table", "q_scan_partitioned", "q_scan_zorder", "q_scan_csv",
      "q_scan_json", "q_scan_binaryfile", "q_sink_compacted", "q_scan_orc",
      "q_scan_evolution", "q_scan_dpp", "q_join_bucketed", "q_scan_manifest",
      "q_scan_timetravel", "q_scan_deletevector")
    // the distinct once-tags the keys above build (dpp shares "parts"
    // with partitioned); parallel suites may build OTHER tags for the
    // same dir in this JVM, so the pin is subset + never-rebuilt, not
    // an exact census
    val expected = Set("hive_orders", "parts", "zorder", "csv", "json",
      "binfiles", "compacted", "orc", "evo", "dppdim", "buckets",
      "manifest", "ttable", "posdel")
    val s = spark.newSession()
    def runAll(sess: org.apache.spark.sql.SparkSession): Unit =
      warehouseKeys.foreach(k => SparkEntry.queries(k)(sess, sf0001).collect())
    runAll(s)
    runAll(spark.newSession()) // a second fresh session must also be all hits
    val counts = graft.operators.Warehouse.layoutBuilds.asScala
      .collect { case ((d, tag), n) if d == sf0001 => tag -> n.longValue }
      .toMap
    assert(expected.subsetOf(counts.keySet),
      s"missing layout tags: ${expected.diff(counts.keySet)}")
    val rebuilt = counts.filter(_._2 > 1L)
    assert(rebuilt.isEmpty, s"layouts rebuilt: $rebuilt — memo thrash or session re-keying")
  }
}
