package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_text_unigram / q_text_unigram_seg — the unigram-LM tokenizer's one
  * exact EM round. The oracle certifies cross-engine arithmetic; this
  * spec pins the STRUCTURAL theorems: segmentations reconstruct their
  * words exactly, respect the max piece length, price correctly under
  * the seed model, and the M-step's bookkeeping balances.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val segs =
    SparkEntry.queries("q_text_unigram_seg")(spark, sf0001).collect()
  private lazy val vocab =
    SparkEntry.queries("q_text_unigram")(spark, sf0001).collect()

  test("every Viterbi segmentation reconstructs its word, pieces <= 4 chars") {
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getAs[String]("word")
      val parts = r.getAs[String]("seg").split(' ')
      assert(parts.mkString == word, s"'$word' segmented to '${r.getAs[String]("seg")}'")
      assert(parts.forall(p => p.nonEmpty && p.length <= 4), s"bad piece in '$word'")
      assert(r.getAs[Long]("n_pieces") == parts.length)
      // the integer path cost of k pieces of a real model is positive
      assert(r.getAs[Long]("cost") > 0 && r.getAs[Long]("cost") < 1000000000000L,
        s"'$word' priced through the missing-piece sentinel")
    }
  }

  test("Viterbi is optimal: no 2-piece split beats a kept 1-piece segmentation") {
    // re-derive the seed costs exactly as the trainer does, in Scala,
    // then check every single-piece word against all its binary splits —
    // a direct optimality probe independent of both engines' DP code
    val words = segs.map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    val freq = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, cnt) <- words; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      freq(w.substring(i, i + l)) += cnt
    val kept = freq.filter { case (p, f) => p.length == 1 || f >= 2 }
    val tot = kept.values.sum.toDouble
    def cost(p: String): Long = kept.get(p).fold(1000000000000L)(f =>
      math.round(-math.log(f / tot) * 1000000))
    segs.filter(_.getAs[Long]("n_pieces") == 1).foreach { r =>
      val w = r.getAs[String]("word")
      if (w.length >= 2 && w.length <= 4) {
        val c1 = r.getAs[Long]("cost")
        (1 until w.length).foreach { k =>
          assert(c1 <= cost(w.take(k)) + cost(w.drop(k)),
            s"'$w' kept whole at $c1 but splitting at $k is cheaper")
        }
      }
    }
  }

  test("M-step bookkeeping balances: used counts equal the segmentations") {
    val counted = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    segs.foreach { r =>
      r.getAs[String]("seg").split(' ').foreach(p =>
        counted(p) += r.getAs[Long]("cnt"))
    }
    val served = vocab.map(r =>
      r.getAs[String]("piece") -> r.getAs[Long]("used_cnt")).toMap
    counted.foreach { case (p, c) =>
      assert(served.get(p).contains(c), s"piece '$p': used $c vs served ${served.get(p)}")
    }
    // survivors are exactly: used pieces plus ALL single chars (coverage)
    val chars = segs.flatMap(_.getAs[String]("word")).toSet
    chars.foreach(c => assert(served.contains(c.toString), s"char '$c' dropped"))
    served.foreach { case (p, u) =>
      assert(u > 0 || p.length == 1, s"unused multi-char piece '$p' survived")
    }
  }

  test("the trained model compresses: weighted pieces < weighted chars") {
    val pieceCount = segs.map(r => r.getAs[Long]("cnt") * r.getAs[Long]("n_pieces")).sum
    val charCount = segs.map(r => r.getAs[Long]("cnt") * r.getAs[String]("word").length).sum
    assert(pieceCount < charCount,
      s"unigram segmentation did not beat char-level: $pieceCount vs $charCount")
  }

  test("q_text_unigram2: round-2 segmentations use only survivor pieces") {
    val segs2 = SparkEntry.queries("q_text_unigram2")(spark, sf0001).collect()
    val survivors = vocab.map(_.getAs[String]("piece")).toSet
    assert(segs2.length == segs.length, "round 2 dropped words")
    segs2.foreach { r =>
      val word = r.getAs[String]("word")
      val parts = r.getAs[String]("seg").split(' ')
      assert(parts.mkString == word, s"'$word' round-2 seg broken")
      // the round-2 model IS the survivor vocabulary: the DP can only
      // price paths through it (single-char coverage keeps it total)
      parts.foreach(p => assert(survivors.contains(p),
        s"'$word' used non-survivor piece '$p' in round 2"))
      assert(r.getAs[Long]("cost") > 0 && r.getAs[Long]("cost") < 1000000000000L)
    }
  }

  test("q_text_ppl: the LM filter covers every doc and every word (no join loss)") {
    import org.apache.spark.sql.functions._
    val ppl = SparkEntry.queries("q_text_ppl")(spark, sf0001).collect()
    // vocab coverage is a THEOREM (every distinct corpus word of length
    // 1..24 is in the lexicon), so the broadcast join must be lossless:
    // per-doc word counts equal the raw tokenization's
    val raw = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")).between(1, 24))
      .groupBy("doc_id").count()
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(ppl.length == raw.size, s"${ppl.length} docs served vs ${raw.size}")
    ppl.foreach { r =>
      assert(r.getAs[Long]("n_words") == raw(r.getAs[Long]("doc_id"))) // lossless
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("nll") > 0 && r.getAs[Long]("nll") < 1000000000000L,
        "a doc priced through the missing-piece sentinel")
    }
  }

  test("q_text_collocations: the served PMI is the scalar recompute from raw counts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_collocations")(spark, sf0001).collect()
    assert(rows.length == 25)
    // pairs form over the RAW split array, then drop empty-token pairs —
    // the exact adjacency rule both engines implement
    val toks = Tables(spark, sf0001, "documents")
      .select(split(lower(col("text")), " ").as("a")).collect()
      .map(_.getSeq[String](0))
    val uni = toks.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prs = toks.flatMap(a => a.sliding(2).collect {
      case Seq(x, y) if x.nonEmpty && y.nonEmpty => (x, y)
    }).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uni.values.sum; val p = prs.values.sum
    def lnG(c: Long) = math.round(math.log(c.toDouble) * 1e6)
    rows.foreach { r =>
      val (x, y, cxy) = (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[Long]("c_xy"))
      assert(cxy >= 5 && prs((x, y)) == cxy, s"('$x','$y') count $cxy vs ${prs.get((x, y))}")
      // the r19 log-space form: one rounded 6-dp ln per factor, then an
      // exact integer sum — no product chain, no count-magnitude bound
      val pmi = lnG(cxy) + 2 * lnG(t) - lnG(p) - lnG(uni(x)) - lnG(uni(y))
      assert(r.getAs[Long]("pmi") == pmi, s"('$x','$y') pmi")
    }
    // the log-space ranking agrees with the factor-double form it
    // replaced (the r18 verdict's done-condition): same top-25 order
    val factorRanked = prs.collect { case ((x, y), cxy) if cxy >= 5 =>
      val pmiD = math.round(math.log(
        cxy.toDouble * t.toDouble * t.toDouble /
          (p.toDouble * uni(x).toDouble * uni(y).toDouble)) * 1e6)
      (x, y, pmiD)
    }.toSeq.sortBy { case (x, y, pmi) => (-pmi, x, y) }.take(25)
      .map { case (x, y, _) => (x, y) }
    val servedRanked = rows.map(r =>
      (r.getAs[String]("x"), r.getAs[String]("y"))).toSeq
    assert(servedRanked == factorRanked,
      s"log-space ranking diverged from factor-double:\n$servedRanked\n$factorRanked")
  }

  test("q_text_zipf: scalar slope re-derivation through the centered exact chain") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_zipf")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (lang, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty).map(t => (lang, t)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      val ranked = counts.collect { case ((l, t), c) if l == lang => (t, c) }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log((i + 1).toDouble) * 1e6),
          math.round(math.log(c.toDouble) * 1e6)) }
      val n = xy.length.toLong
      assert(r.getAs[Long]("n_vocab") == n, s"$lang vocab")
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      assert(r.getAs[Long]("sx") == sx && r.getAs[Long]("sy") == sy,
        s"$lang uncentered sums")
      // the truncated-mean centering both engines apply (axes >= 0, so
      // / here == Spark DIV == DuckDB //), then the centered exact sums
      val (mx, my) = (sx / n, sy / n)
      var (sxc, syc, sxyC, sxxC) = (0L, 0L, 0L, 0L)
      xy.foreach { case (x, y) =>
        sxc += x - mx; syc += y - my
        sxyC += (x - mx) * (y - my); sxxC += (x - mx) * (x - mx) }
      // the one IEEE boundary, replayed in the identical op order
      val slope = math.floor(
        (n.toDouble * sxyC.toDouble - sxc.toDouble * syc.toDouble) /
          (n.toDouble * sxxC.toDouble - sxc.toDouble * sxc.toDouble) *
          1000000.0).toLong
      assert(r.getAs[Long]("slope_micros") == slope, s"$lang slope")
    }
  }

  test("q_text_burstiness: scalar recompute + positive dispersion off full support") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_burstiness")(spark, sf0001).collect()
    assert(rows.length == 20)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dTot = docs.length.toLong
    val perToken = docs.flatMap { case (id, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, g) => (t, id, g.length.toLong) }
    }.groupBy(_._1).view.mapValues(_.map(x => x._3)).toMap
    rows.foreach { r =>
      val cs = perToken(r.getString(0))
      val (df, sc, sc2) = (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
      assert(r.getAs[Long]("df") == df && r.getAs[Long]("sc") == sc &&
        r.getAs[Long]("sc2") == sc2, s"'${r.getString(0)}' stats")
      val fano = math.floor((dTot.toDouble * sc2.toDouble - sc.toDouble * sc.toDouble) /
        (dTot.toDouble * sc.toDouble) * 1e6).toLong
      assert(r.getAs[Long]("fano_ppm") == fano, s"'${r.getString(0)}' fano chain")
      // dispersion is strictly positive unless the token appears in
      // every doc with identical count — impossible here when df < D
      if (df < dTot) assert(fano > 0, s"'${r.getString(0)}' zero dispersion at df<$dTot")
    }
  }

  test("q_text_jsd: scalar recompute, symmetry, and the ln 2 bound") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_jsd")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("de", "es", "fr", "zh"))
    val uni = Tables(spark, sf0001, "documents")
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("t"))
      .where(length(col("t")) >= 1)
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    def lnG(x: Long) = math.round(math.log(x.toDouble) * 1e6)
    def counts(l: String) = uni.collect { case ((`l`, t), c) => t -> c }.toMap
    val en = counts("en"); val ta = en.values.sum
    rows.foreach { r =>
      val other = counts(r.getString(0)); val tb = other.values.sum
      assert(r.getAs[Long]("ta") == ta && r.getAs[Long]("tb") == tb)
      val vocab = (en.keySet ++ other.keySet).toSeq
      assert(r.getAs[Long]("n_vocab_union") == vocab.length.toLong)
      var (sumA, sumB) = (0L, 0L)
      vocab.foreach { t =>
        val ca = en.getOrElse(t, 0L); val cb = other.getOrElse(t, 0L)
        val mix = ca * tb + cb * ta
        if (ca > 0) sumA += ca * (lnG(2 * ca * tb) - lnG(mix))
        if (cb > 0) sumB += cb * (lnG(2 * cb * ta) - lnG(mix))
      }
      assert(r.getAs[Long]("sum_a") == sumA && r.getAs[Long]("sum_b") == sumB,
        s"${r.getString(0)} integer contribution sums drifted")
      val jsd = math.floor(sumA.toDouble / (2.0 * ta.toDouble) +
        sumB.toDouble / (2.0 * tb.toDouble)).toLong
      assert(r.getAs[Long]("jsd_micros") == jsd, s"${r.getString(0)} jsd chain")
      // bounds: 0 ≤ JSD ≤ ln 2 (±2 micro fixed-point slack), and the
      // formula is en↔other symmetric — swapping the roles swaps
      // (sum_a, ta) with (sum_b, tb) and serves the same number
      assert(jsd >= -2 && jsd <= 693150, s"${r.getString(0)} out of [0, ln2]: $jsd")
      val swapped = math.floor(sumB.toDouble / (2.0 * tb.toDouble) +
        sumA.toDouble / (2.0 * ta.toDouble)).toLong
      assert(swapped == jsd, s"${r.getString(0)} asymmetric")
    }
  }

  test("q_text_kneserney: scalar recompute + the normalization theorem") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_kneserney")(spark, sf0001).collect()
    assert(rows.length == 20)
    val toks = Tables(spark, sf0001, "documents")
      .select(split(lower(col("text")), " ").as("a")).collect()
      .map(_.getSeq[String](0))
    val bigrams = toks.filter(_.length >= 2).flatMap(a => a.sliding(2).collect {
      case Seq(x, y) if x.nonEmpty && y.nonEmpty => (x, y)
    }).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = bigrams.toSeq.groupBy(_._1._1).view.mapValues { g =>
      (g.map(_._2).sum, g.length.toLong) }.toMap // (c1, n_follow)
    val cont = bigrams.toSeq.groupBy(_._1._2).view
      .mapValues(_.length.toLong).toMap // n_prec
    val nb = bigrams.size.toLong
    val D = 0.75
    def pkn(w1: String, w2: String): Double = {
      val (c1, nf) = ctx(w1)
      (bigrams((w1, w2)).toDouble - D) / c1.toDouble +
        D * nf.toDouble / c1.toDouble * cont(w2).toDouble / nb.toDouble
    }
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("cnt2") == bigrams((w1, w2)), s"($w1,$w2) count")
      assert(r.getAs[Long]("c1") == ctx(w1)._1 &&
        r.getAs[Long]("n_follow") == ctx(w1)._2, s"($w1) context stats")
      assert(r.getAs[Long]("n_prec") == cont(w2) &&
        r.getAs[Long]("n_bigram_types") == nb, s"($w2) continuation stats")
      assert(r.getAs[Long]("pkn_micros") ==
        math.floor(pkn(w1, w2) * 1e6).toLong, s"($w1,$w2) pkn chain")
    }
    // THE Kneser–Ney theorem: for any context, the smoothed mass over
    // the full continuation vocabulary sums to exactly 1 — discounted
    // observed mass + λ(w1)·Σ P_cont = (c1 − D·nf)/c1 + D·nf/c1
    rows.map(_.getString(0)).distinct.take(5).foreach { w1 =>
      val (c1, nf) = ctx(w1)
      val observed = bigrams.collect {
        case ((`w1`, w2), c) => (c.toDouble - D) / c1.toDouble }.sum
      val lambda = D * nf.toDouble / c1.toDouble
      val total = observed + lambda * cont.values.map(_.toDouble / nb.toDouble).sum
      assert(math.abs(total - 1.0) < 1e-9, s"'$w1' mass $total != 1")
    }
  }

  test("q_text_heaps: scalar growth-curve re-derivation through the centered chain") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_heaps")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.foreach { r =>
      val lang = r.getString(0)
      val mine = docs.filter(_._1 == lang).sortBy(_._2)
        .map { case (_, id, text) =>
          (id, text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq) }
        .filter(_._2.nonEmpty)
      assert(r.getAs[Long]("n_docs") == mine.length.toLong, s"$lang n_docs")
      // the growth curve: running tokens vs running first-seen vocab
      val seen = collection.mutable.Set[String]()
      var nn = 0L
      val xy = mine.map { case (_, ts) =>
        nn += ts.length
        ts.foreach(seen.add)
        (math.round(math.log(nn.toDouble) * 1e6),
          math.round(math.log(seen.size.toDouble) * 1e6))
      }
      assert(r.getAs[Long]("n_tokens") == nn && r.getAs[Long]("vocab") == seen.size.toLong,
        s"$lang totals")
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val (mx, my) = (sx / n, sy / n)
      var (sxc, syc, sxyC, sxxC) = (0L, 0L, 0L, 0L)
      xy.foreach { case (x, y) =>
        sxc += x - mx; syc += y - my
        sxyC += (x - mx) * (y - my); sxxC += (x - mx) * (x - mx) }
      val beta = math.floor(
        (n.toDouble * sxyC.toDouble - sxc.toDouble * syc.toDouble) /
          (n.toDouble * sxxC.toDouble - sxc.toDouble * sxc.toDouble) *
          1000000.0).toLong
      assert(r.getAs[Long]("beta_micros") == beta, s"$lang beta")
      // Heaps' exponent lives in (0, 1] for any corpus where vocab
      // grows no faster than tokens; β → 1 flags the same degenerate
      // synthetic mix zipf's slope → 0 does
      assert(beta > 0 && beta <= 1000000L, s"$lang beta out of (0, 1]: $beta")
    }
  }

  test("q_text_zipf plan: the per-lang means ride a broadcast centering join") {
    val df = SparkEntry.queries("q_text_zipf")(spark, sf0001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"centering join must broadcast the per-lang means:\n${fin.take(2000)}")
    assert(!fin.contains("CartesianProduct"), fin.take(2000))
  }

  test("q_text_rake: the served phrases are the scalar RAKE recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_text_rake")(spark, sf0001).collect()
    assert(rows.length == 20)
    val docs = Tables(spark, sf0001, "documents")
      .select(split(lower(col("text")), " ").as("a")).collect()
      .map(_.getSeq[String](0).filter(_.nonEmpty))
    val cnt = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val stop = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(10).map(_._1).toSet
    // phrases: maximal non-stopword runs per doc
    val phrases: Seq[Seq[String]] = docs.toIndexedSeq.flatMap { a =>
      val out = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      a.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) { out += cur.toSeq; cur = scala.collection.mutable.Buffer() } }
        else cur += t
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val degree = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    phrases.foreach(p => p.foreach { t => freq(t) += 1; degree(t) += p.length })
    def wscore(t: String): Long = degree(t) * 1000000L / freq(t)
    val byText = phrases.groupBy(_.mkString(" "))
    rows.foreach { r =>
      val ph = r.getAs[String]("phrase")
      val occ = byText.getOrElse(ph, Seq.empty)
      assert(occ.nonEmpty, s"served phrase '$ph' not found in the corpus")
      assert(r.getAs[Long]("n_occ") == occ.size.toLong, s"'$ph' n_occ")
      assert(r.getAs[Long]("n_words") == occ.head.length.toLong, s"'$ph' n_words")
      assert(r.getAs[Long]("score_micros") == occ.head.map(wscore(_)).sum, s"'$ph' score")
    }
    // and the cut is the true top: no unserved phrase outscores the 20th
    val served = rows.map(_.getAs[String]("phrase")).toSet
    val floor = rows.last.getAs[Long]("score_micros")
    val best = byText.collect { case (ph, occ) if !served(ph) =>
      occ.head.map(wscore(_)).sum }.maxOption.getOrElse(0L)
    assert(best <= floor, s"unserved phrase outscores the served floor: $best > $floor")
  }

  test("q_text_unigram_budget: monotone vocab under the budget; rounds reconstruct") {
    val rows = SparkEntry.queries("q_text_unigram_budget")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 4)
    val out = rows.map(_.getAs[Long]("vocab_out"))
    val chars = rows.map(_.getAs[Long]("chars_out"))
    // the budget rule: every round's output holds all single chars plus
    // at most 16 multi-char pieces, and the sequence never grows
    rows.indices.foreach { i =>
      assert(out(i) <= chars(i) + 16, s"round ${i + 1}: ${out(i)} > ${chars(i)} + 16")
      if (i > 0) {
        assert(out(i) <= out(i - 1), s"vocab grew at round ${i + 1}")
        // model-in of round r is model-out of round r-1
        assert(rows(i).getAs[Long]("vocab_in") == out(i - 1))
      }
    }
    // the budget BITES on round 1 (the seed survivors exceed it) and the
    // chain reaches a fixed point (stable vocab fingerprint) by round 4
    assert(rows(0).getAs[Long]("vocab_in") > out(0), "round 1 pruned nothing")
    assert(rows(2).getAs[Long]("sum_cost_out") == rows(3).getAs[Long]("sum_cost_out"),
      "no fixed point by round 4")
    // reconstruction at every round: each round's E-step segmentations
    // concatenate back to their words, under that round's own model
    import org.apache.spark.sql.functions.{col, explode, expr, split}
    operators.TextOps.unigramBudgetChain(spark, sf0001).zipWithIndex
      .foreach { case ((vin, vit, _), i) =>
        val bad = vit.where(expr("replace(seg, ' ', '') != w")).count()
        assert(bad == 0L, s"round ${i + 1}: $bad words fail to reconstruct")
        // and every piece any segmentation uses is priced by the ROUND'S
        // INPUT model (the E-step can only spend pieces the model holds)
        val missing = vit
          .select(explode(split(col("seg"), " ")).as("piece"))
          .join(vin.select("piece"), Seq("piece"), "left_anti").count()
        assert(missing == 0L, s"round ${i + 1}: $missing unpriced pieces used")
      }
  }
}
