package graft

import org.scalatest.funsuite.AnyFunSuite

/** Third-engine check for q_dedup_semantic: a scalar Scala
  * reimplementation of the whole SemDeDup chain — fixed-point k-means
  * (seeds 0..7, two exact iterations), intra-cluster integer-cosine
  * pairs at the 0.4 threshold, keep-farthest-from-centroid suppression —
  * compared row-for-row with the distributed query at sf0.001. The
  * DuckDB oracle already mirrors the SQL arithmetic; this mirror is
  * imperative, so a shared SQL-level misunderstanding can't hide.
  */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("q_dedup_semantic equals the scalar SemDeDup reimplementation") {
    val fxById: Map[Long, Array[Long]] =
      spark.read.parquet(s"$sf0001/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray.map(x =>
            math.floor(x.toDouble * 1000.0 + 0.5).toLong))
        .toMap
    val dims = fxById.head._2.length

    def sqd(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < dims) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // (d, k) lexicographic min — the same tie-break as array_min over
    // struct(d, k) and ORDER BY d, k
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      fxById.map { case (id, fx) =>
        val (d, k) = cents.map { case (k, cv) => (sqd(fx, cv), k) }.min
        id -> ((k, d))
      }
    def centroid(members: Seq[Array[Long]]): Array[Long] =
      Array.tabulate(dims) { i =>
        math.floor(members.map(_(i)).sum.toDouble / members.size + 0.5).toLong
      }

    val seeds = (0L to 7L).map(k => k -> fxById(k))
    val a1 = assign(seeds)
    val c1 = a1.groupBy(_._2._1).toSeq.map { case (k, m) =>
      k -> centroid(m.keys.toSeq.map(fxById))
    }
    val a2 = assign(c1)

    val byK = a2.groupBy(_._2._1)
    val nPairs = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val dropped = collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    for ((k, ms) <- byK) {
      val ids = ms.keys.toSeq.sorted
      for (i <- ids; j <- ids if i < j) {
        val fa = fxById(i); val fb = fxById(j)
        var dot = 0L; var na2 = 0L; var nb2 = 0L; var x = 0
        while (x < dims) {
          dot += fa(x) * fb(x); na2 += fa(x) * fa(x); nb2 += fb(x) * fb(x)
          x += 1
        }
        val cos = dot.toDouble / math.sqrt((na2 * nb2).toDouble)
        if (cos >= 0.4) {
          nPairs(k) += 1
          val da = a2(i)._2; val db = a2(j)._2
          val loser = if (da > db || (da == db && i < j)) j else i
          dropped(k) += loser
        }
      }
    }
    val expected = byK.toSeq.map { case (k, ms) =>
      val nd = dropped(k).size.toLong
      (k, ms.size.toLong, nPairs(k), nd, ms.size - nd,
        if (dropped(k).isEmpty) -1L else dropped(k).min)
    }.sortBy(_._1)

    val got = SparkEntry.queries("q_dedup_semantic")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // the fixture must actually exercise the prune path
    assert(expected.map(_._4).sum > 0, "no semantic duplicates dropped at sf0.001")
  }
}
