package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

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
  *   - the cap bounds distinct live SESSIONS, not entries. A session's
  *     entry count is bounded by the code that uses the memo (finitely
  *     many tags × fixture dirs), but session churn (a JVM looping
  *     `newSession()` clones, which share one running context and so
  *     never trip the stopped sweep) is not. Overflow evicts whole
  *     sessions, longest-untouched first, never the session currently
  *     being accessed. The previous policy — entry cap + clear-all —
  *     was an oscillator: Warehouse.written holds 11 once-tags per
  *     (session, dir) against the old cap of 8, so a session touching
  *     them all wholesale-cleared the memo on every later access and
  *     re-ran idempotent layout writes (r14 verdict).
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
  // FutureTask-style memo cell: computeIfAbsent inserts only the cheap
  // holder (the map's bin lock is held for an allocation, not a Spark
  // job), and the build itself runs under the CELL's lazy-val lock — so
  // two sessions hashing to the same bin no longer serialize each
  // other's builds; only callers of the SAME key wait on its build.
  // A build that throws leaves the lazy val uninitialized (Scala lazy
  // vals re-run a failed initializer), so retry semantics are preserved;
  // the retry re-runs the ORIGINAL thunk, which is the contract here —
  // every caller passes the same builder for a given key.
  private final class Cell(thunk: () => V) { lazy val value: V = thunk() }
  private val m = new ConcurrentHashMap[K, Cell]()
  // last-touch tick per session (ConcurrentHashMap keys on .equals, which
  // SparkSession does not override — identity semantics for free)
  private val touched = new ConcurrentHashMap[SparkSession, java.lang.Long]()
  private val tick = new AtomicLong()

  private def liveSessions(): List[SparkSession] = {
    val seen = new java.util.IdentityHashMap[SparkSession, java.lang.Boolean]()
    val it = m.keySet().iterator()
    while (it.hasNext) seen.put(owner(it.next()), java.lang.Boolean.TRUE)
    import scala.jdk.CollectionConverters._
    seen.keySet().asScala.toList
  }

  private def evictSession(v: SparkSession): Unit = {
    val it = m.keySet().iterator()
    while (it.hasNext) if (owner(it.next()) eq v) it.remove()
    touched.remove(v)
  }

  /** `current` is the session of the key being accessed (null from
    * liveSize): it is touched, and exempt from overflow eviction — the
    * access about to happen must not invalidate its own working set. */
  private def sweep(current: SparkSession): Unit = {
    if (current != null)
      touched.put(current, java.lang.Long.valueOf(tick.incrementAndGet()))
    val it = m.keySet().iterator()
    while (it.hasNext) if (stopped(owner(it.next()))) it.remove()
    var sessions = liveSessions()
    while (sessions.size > cap) {
      val victims = sessions.filter(s => current == null || (s ne current))
      if (victims.isEmpty) return
      evictSession(
        victims.minBy(s => Option(touched.get(s)).fold(0L)(_.longValue)))
      sessions = liveSessions()
    }
    // touch records die with their last entry, or `touched` itself leaks
    val ti = touched.keySet().iterator()
    while (ti.hasNext) {
      val s = ti.next()
      if ((current == null || (s ne current)) && !sessions.exists(_ eq s))
        ti.remove()
    }
  }

  /** Memoized build: at most one build per key runs at a time, and the
    * build runs outside the map's bin lock (see [[Cell]]). */
  def getOrBuild(k: K)(build: K => V): V = {
    sweep(owner(k))
    m.computeIfAbsent(k, kk => new Cell(() => build(kk))).value
  }

  /** May block while the key's build is in flight — the same visibility a
    * caller had when the build ran under the bin lock. */
  def get(k: K): Option[V] = { sweep(owner(k)); Option(m.get(k)).map(_.value) }

  def put(k: K, v: V): Unit = { sweep(owner(k)); m.put(k, new Cell(() => v)) }

  /** Immutable view — for specs asserting memo contents. */
  private[graft] def snapshot: Map[K, V] = {
    import scala.jdk.CollectionConverters._
    m.asScala.map { case (k, c) => (k, c.value) }.toMap
  }

  private[graft] def liveSize: Int = { sweep(null); m.size }
}
