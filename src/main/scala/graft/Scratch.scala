package graft

/** Process- and invocation-unique scratch roots for the side-effectful
  * query families (views, search, DLQ): each invocation builds its state
  * under a root no other invocation — in THIS process or any other — can
  * ever touch.
  *
  * Why not a fixed `tmpdir/graft_<tag>` path wiped on entry (the pre-r12
  * convention): the verify and bench harnesses are separate JVMs the
  * driver may overlap, and bench additionally runs every query several
  * times. Two invocations sharing one root interleave
  * wipe/refresh/publish arbitrarily — the classic symptom is a
  * value-correct query that hash-fails only on the driver's contended
  * box and never reproduces idle (round-11 verdict, q_view_*). Unique
  * roots make the build-then-serve pattern a pure function of its
  * inputs again.
  *
  * Roots live under one per-process temp directory; they are small
  * (state tables are O(key space), fixture indexes a few MB) and the
  * directory dies with the machine's tmp cleanup — deliberately NOT
  * deleted eagerly, since a previously returned DataFrame may still
  * lazily read its root (sbt runs suites concurrently in one JVM).
  */
object Scratch {
  private val base: String =
    java.nio.file.Files.createTempDirectory("graft_roots_").toString
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh, never-before-returned directory path (not yet created —
    * the publish machinery creates it) for one invocation of `tag`. */
  def freshRoot(tag: String): String =
    s"$base/${tag}_${seq.incrementAndGet()}"
}
