package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Session-keyed memo that cannot outlive its sessions (r13 ADVICE: the
  * per-object-keyed memos held SparkSession references — and, for the
  * DataFrame-valued ones, localCheckpoint blocks — forever).
  *
  * Keys compare the SparkSession component by OBJECT identity (tuples
  * delegate to SparkSession's default reference equals), preserving the
  * r13 collision-safety fix: a hash collision between two sessions must
  * never hand one session state owned by another.
  *
  * Retention is bounded two ways, both applied on every access:
  *   - entries whose session's SparkContext has stopped are dropped (the
  *     promptly-reclaimable case: a stopped context's checkpoint blocks
  *     are dead weight the moment `stop()` returns);
  *   - if more than `cap` entries remain LIVE (a JVM churning through
  *     `newSession()` clones, which share one running context and so
  *     never trip the stopped sweep), the memo resets wholesale. A memo
  *     miss only costs a rebuild, so clearing is always safe — the cap
  *     turns an unbounded leak into a fixed-size cache.
  *
  * Weak references to the session are NOT the answer here even though the
  * advice offers them: the memoized DataFrames strongly reference their
  * session (`df.sparkSession`), so weak keys with strong values would
  * never clear — the classic WeakHashMap value→key cycle.
  *
  * Builds are serialized per key (ConcurrentHashMap.computeIfAbsent), the
  * same single-build guarantee callers relied on before.
  */
final class SessionMemo[K, V](
    owner: K => SparkSession,
    cap: Int = 8,
    // injectable for the spec: a genuinely stopped session can't be made
    // in-test without killing the suite-shared SparkContext
    stopped: SparkSession => Boolean = _.sparkContext.isStopped) {
  private val m = new ConcurrentHashMap[K, V]()

  private def sweep(): Unit = {
    val it = m.keySet().iterator()
    while (it.hasNext) if (stopped(owner(it.next()))) it.remove()
    if (m.size > cap) m.clear()
  }

  /** Memoized build: at most one build per key runs at a time. */
  def getOrBuild(k: K)(build: K => V): V = {
    sweep()
    m.computeIfAbsent(k, kk => build(kk))
  }

  def get(k: K): Option[V] = { sweep(); Option(m.get(k)) }

  def put(k: K, v: V): Unit = { sweep(); m.put(k, v) }

  /** Immutable view — for specs asserting memo contents. */
  private[graft] def snapshot: Map[K, V] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  private[graft] def liveSize: Int = { sweep(); m.size }
}
