package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_cdc — content-defined chunking. The oracle certifies the
  * cross-engine ledger; this spec pins the PROPERTY the whole scheme
  * exists for: chunk boundaries are content-defined, so a prefix edit
  * shifts every character position yet leaves all chunks after the
  * first re-aligned boundary IDENTICAL — where fixed-size blocking
  * loses every block. Chunking is re-derived scalar-side from the same
  * public rolling-hash polynomial (RollingKgramHash.hashes), so the
  * pin is independent of both engines' SQL.
  */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._

  private val (k, d) = (16, 64)

  /** basic CDC: cut at gram-start i (1-based > 0) where H(i) % d == 0. */
  private def chunks(text: String): Seq[String] = {
    val hs = graft.functions.RollingKgramHash.hashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
    val cuts = (1 until hs.length).filter(i => hs(i) % d == 0)
    val bounds = (0 +: cuts) :+ text.length
    bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  test("a prefix edit loses at most the chunks before the first shared cut") {
    val texts = Tables(spark, sf0001, "documents")
      .select("text").limit(50).collect().map(_.getString(0))
      .filter(_.length >= 200)
    assert(texts.length >= 10, "fixture too short for the shift probe")
    var sharedTotal = 0; var chunkTotal = 0
    texts.foreach { t =>
      val base = chunks(t)
      val edited = chunks("inserted preamble sentence " + t)
      // every base chunk that starts after the edit's first re-aligned
      // boundary appears verbatim in the edited chunking
      val shared = base.toSet.intersect(edited.toSet)
      sharedTotal += shared.size; chunkTotal += base.size
      // fixed-size blocking shares ZERO blocks after a 27-char shift
      // (none of the offsets realign); CDC must re-align: at least one
      // chunk survives whenever the doc has an interior cut at all
      if (base.size >= 3) assert(shared.nonEmpty,
        s"no chunk survived a prefix edit (doc of ${base.size} chunks)")
    }
    // aggregate recall: most chunks survive the shift (only the head
    // chunk — and docs with no interior cut — can differ)
    assert(sharedTotal * 10 >= chunkTotal * 6,
      s"CDC shift-robustness collapsed: $sharedTotal of $chunkTotal survived")
  }

  test("the served ledger balances: bytes and counts reconcile per language") {
    val rows = SparkEntry.queries("q_dedup_cdc")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nd) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct_chunks"))
      val (bt, bu) = (r.getAs[Long]("bytes_total"), r.getAs[Long]("bytes_unique"))
      assert(nd <= nc, "more distinct chunks than chunks")
      assert(bu <= bt, "unique bytes exceed total bytes")
      assert(nd > 0 && bu > 0)
      // the corpus genuinely dedups at chunk level (near-dup docs share
      // chunks), so unique < total strictly somewhere
    }
    assert(rows.map(_.getAs[Long]("bytes_unique")).sum <
      rows.map(_.getAs[Long]("bytes_total")).sum,
      "no chunk-level dedup found in a corpus with known near-dups")
    // chunk lengths reconcile with the corpus: total chunk bytes ==
    // total chars of all chunked docs
    val corpus = Tables(spark, sf0001, "documents")
      .selectExpr("CAST(sum(CASE WHEN length(text) >= 16 THEN length(text) " +
        "ELSE 0 END) AS BIGINT) AS n").collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("bytes_total")).sum == corpus,
      "chunking lost or duplicated bytes")
  }
}
