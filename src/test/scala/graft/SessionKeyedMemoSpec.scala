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
}
