package graft

/** Run independent Spark actions concurrently from the driver.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially. The index/sync maintenance paths issue several
  * SMALL independent jobs per commit (segment postings + docstats,
  * lexicon + globals), each of which leaves most cores idle — submitting
  * them together lets the later job's tasks back-fill the executors the
  * earlier job's tail frees, without changing what either job computes.
  *
  * Threads, not a shared pool: callers are nested (a publish callback
  * runs inside another parallel branch), and a bounded shared pool can
  * deadlock on nested fan-out. Job-count here is 2-3 per call site, so
  * thread spawn cost is noise against the jobs themselves.
  *
  * The FIRST failure is rethrown after all branches settle (never while
  * a sibling still writes into the same staging dir); later failures are
  * attached as suppressed.
  */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        try t()
        catch { case e: Throwable => errs.add(e) }
      }, s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val it = errs.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
