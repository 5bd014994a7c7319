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
    val roots = ViewQueries.sharedStates.asScala.collect {
      case ((s, dir, keys), root)
          if dir == sf0001 && keys == "status,priority" &&
            ((s eq spark) || (s eq s2)) => (s, root)
    }.toMap
    assert(roots.size == 2, s"expected a memo entry per session, got $roots")
    assert(roots(spark) != roots(s2), "sessions share a fold root")
  }
}
