package graft

import org.scalatest.funsuite.AnyFunSuite

/** Third-engine check for q_text_bpe_encode: the trainer (4 exact merge
  * rounds) and the encoder (lexicon lookup) reimplemented imperatively
  * over plain Scala collections and compared per-doc with the
  * distributed query at sf0.001. Also pins the invariants any subword
  * tokenization must satisfy: n_words <= n_tokens <= n_chars, and total
  * tokens strictly below total chars once merges landed (the trainer
  * found at least one pair worth merging on this corpus).
  */
class BpeEncodeSpec extends AnyFunSuite {
  import TestSpark._

  test("q_text_bpe_encode equals the scalar BPE reimplementation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq)
    val wc = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, ws) <- docs; w <- ws) wc(w) += 1
    var sym: Map[String, String] =
      wc.keys.map(w => w -> w.map(c => s"<$c>").mkString).toMap
    for (_ <- 1 to 4) {
      // frequency-weighted adjacent-pair counts over the delimited symbols
      val cnt = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, s0) <- sym) {
        val t = s0.substring(1, s0.length - 1).split("><", -1)
        for (i <- 1 until t.length) cnt((t(i - 1), t(i))) += wc(w)
      }
      // (cnt DESC, x ASC, y ASC) argmax — the trainer's total order
      val ((x, y), _) = cnt.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      val (pat, mrg) = (s"<$x><$y>", s"<$x$y>")
      sym = sym.map { case (w, s0) => w -> s0.replace(pat, mrg) }
    }
    val lex = sym.map { case (w, s0) =>
      w -> s0.substring(1, s0.length - 1).split("><", -1).length.toLong
    }
    val expected = docs.map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(_.length.toLong).sum, ws.map(lex).sum)
    }.sortBy(_._1).toSeq

    val got = SparkEntry.queries("q_text_bpe_encode")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"\nfirst diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // subword invariants + the merges actually compressed the corpus
    for ((_, nw, nc, nt) <- got) assert(nw <= nt && nt <= nc)
    assert(got.map(_._4).sum < got.map(_._3).sum,
      "4 merge rounds produced no compression")
  }
}
