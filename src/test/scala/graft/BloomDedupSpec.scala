package graft

import org.scalatest.funsuite.AnyFunSuite

/** Third-engine check for q_dedup_bloom: the filter build, probe, and
  * verify stages reimplemented imperatively (java MD5, longs, a Map for
  * the 63-bit filter words) and compared field-for-field with the
  * distributed query at sf0.001 — plus the two properties that make a
  * Bloom pre-filter usable at all: NO false negative ever (every new doc
  * whose signature is in the reference set must be flagged), and the
  * set-bit count bounded by k * |reference|.
  */
class BloomDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_dedup_bloom equals the scalar reimplementation; no false negatives") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> md5hex(r.getString(1)))
    val positions = (sig: String) => {
      val h1 = java.lang.Long.parseLong(sig.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(sig.substring(8, 16), 16) * 2 + 1
      (0 to 2).map(i => Math.floorMod(h1 + i * h2, 4096L))
    }
    val block = docs.filter(_._1 % 7 == 4)
    val newDocs = docs.filter(_._1 % 7 != 4)
    val words = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, sig) <- block; pos <- positions(sig))
      words(pos / 63) |= (1L << (pos % 63).toInt)
    val flagged = newDocs.filter { case (_, sig) =>
      positions(sig).forall(p => (words(p / 63) & (1L << (p % 63).toInt)) != 0)
    }
    val blockSigs = block.map(_._2).toSet
    val trueDup = flagged.count { case (_, sig) => blockSigs(sig) }

    val row = SparkEntry.queries("q_dedup_bloom")(spark, sf0001).collect().head
    assert(row.getLong(0) == newDocs.length.toLong, "n_new")
    assert(row.getLong(1) == flagged.length.toLong, s"n_flagged ${row.getLong(1)} != ${flagged.length}")
    assert(row.getLong(2) == trueDup.toLong, "n_true_dup")
    assert(row.getLong(3) == (flagged.length - trueDup).toLong, "n_false_pos")
    assert(row.getLong(4) == words.values.map(java.lang.Long.bitCount(_).toLong).sum, "n_set_bits")

    // Bloom guarantee: every true cross-split duplicate is flagged — the
    // scalar filter can have no false negative by construction, so assert
    // it against the QUERY's flag set semantics: n_true_dup must equal
    // the full count of new docs whose sig is in the reference set.
    val allCrossDups = newDocs.count { case (_, sig) => blockSigs(sig) }
    assert(row.getLong(2) == allCrossDups.toLong,
      s"false negative: ${row.getLong(2)} flagged true dups of $allCrossDups")
    // fill bound: k probes per reference doc, minus collisions
    assert(row.getLong(4) <= 3L * block.length && row.getLong(4) <= 4096L)
  }
}
