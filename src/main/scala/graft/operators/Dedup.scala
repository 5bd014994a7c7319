package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.I (part 1) — deduplication + similarity search for an
  * LLM-training-data pipeline.
  *
  * Cross-engine hash: H(s) = first 15 hex digits of md5(s) parsed as a
  * 60-bit integer — Spark `conv(substr(md5(s),1,15),16,10)`, DuckDB
  * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`. md5 is identical
  * everywhere, so MinHash/SimHash signatures are reproducible in the
  * oracle, unlike engine-native hash().
  *
  * Scale design:
  *  - exact dedup = hash groupBy (shuffle on text hash; at 100 TB group by
  *    md5(text) instead of raw text to keep shuffle rows narrow);
  *  - blocked Jaccard = equi-join on (lang, length-bucket) — never an
  *    unblocked O(n^2) cross join;
  *  - MinHash-LSH = band-signature equi-join producing candidates, exact
  *    verify after; candidate count is controlled by (rows/band, bands);
  *  - SimHash = 16-bit signature; candidates by pigeonhole-LSH on the
  *    signature's 4 nibbles (hamming <= 3 implies at least one of 4
  *    disjoint bands is equal), exact hamming verify after — identical
  *    output to the all-pairs form the oracle runs, bounded pairs;
  *  - verify stages attach per-doc sets to candidate pairs via SHUFFLE
  *    joins on hash-encoded (60-bit) token codes — never a corpus-size
  *    broadcast (the set table is terabytes at 100 TB, and long codes
  *    keep the attach shuffle narrow);
  *  - ANN = brute-force cosine against a broadcast probe set, and an
  *    IVF-style variant that prunes candidates to the probe's coarse
  *    cluster (label) — the partition-pruning shape a real IVF index has.
  */
object Dedup extends QueryFamily {

  /** Spark-side H(expr) as a SQL fragment. */
  private def hs(e: String) =
    s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"
  /** DuckDB-side H(expr). */
  private def hd(e: String) =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Distinct token set of `text`, hash-encoded to sorted 60-bit codes.
    * H is injective on any real vocabulary with overwhelming probability
    * (~1e-9 collision odds at a 10^5 vocab; the hash gate would catch
    * one), so set intersections — and therefore Jaccard — are identical
    * to the string formulation the oracle runs, while the verify-stage
    * shuffle moves arrays of longs instead of strings.
    */
  private def tokenCodes(s: SparkSession, dir: String) =
    Tables(s, dir, "documents").selectExpr("doc_id",
      s"array_sort(transform(array_distinct(split(text, ' ')), t -> ${hs("t")})) AS codes")

  /** Fixed Rademacher hyperplanes for sign-LSH: sign(b, j) for hyperplane
    * b in [0,4), dimension j in [0,64), derived from md5 so there is no
    * accidental structure. Computed once in Scala and inlined as +-
    * literals into BOTH the Spark expression and the DuckDB oracle SQL —
    * the engines then evaluate the identical left-assoc float chain, so
    * bucket assignment is bit-identical with no runtime hashing.
    */
  private lazy val lshSigns: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 4).map { b =>
      (0 until 64).map { j =>
        val h = md.digest(s"lsh:$b:$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  /** 4-bit sign-LSH bucket expression over a DOUBLE vector; `elem(j)`
    * renders the engine's 1-based element access.
    */
  private def lshBucketExpr(elem: Int => String): String = {
    val bits = lshSigns.zipWithIndex.map { case (signs, b) =>
      val proj = signs.zipWithIndex.map { case (sg, j) =>
        (if (sg > 0) " + " else " - ") + elem(j + 1)
      }.mkString
      s"(CASE WHEN (CAST(0.0 AS DOUBLE)$proj) > 0 THEN ${1 << b} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** Verify stage shared by the Jaccard dedup paths: attach each side's
    * sorted code set via a SHUFFLE join on the id-only candidate pairs —
    * never a corpus-size broadcast (the per-doc set table is terabytes at
    * 100 TB; the hint pins the plan AQE picks at scale, where fixture-size
    * tables would otherwise auto-broadcast). The threshold-fused Jaccard
    * runs ONCE per pair: explode(array(j)) + IS NOT NULL above the
    * Generate — a bare filter on a projected column gets re-inlined by
    * CollapseProject/PushDownPredicate and evaluates the merge twice.
    */
  private def jaccardVerify(pairs: DataFrame, enc: DataFrame, thresh: Double): DataFrame = {
    val ca = enc.select(col("doc_id").as("doc_a"), col("codes").as("ca"))
    val cb = enc.select(col("doc_id").as("doc_b"), col("codes").as("cb"))
    pairs.join(ca.hint("shuffle_hash"), "doc_a")
      .join(cb.hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        explode(array(expr(s"sorted_jaccard_ge(ca, cb, ${thresh}D)"))).as("jacc"))
      .where(col("jacc").isNotNull)
      .orderBy("doc_a", "doc_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: canonical doc per distinct text. groupBy+min, not
    // dropDuplicates (which keeps an arbitrary row).
    "q_dedup_exact" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select(col("canonical_id"), md5(col("text")).as("fp"), col("n_copies"))
        .orderBy("canonical_id")),

    // Near-dup pairs: token-set Jaccard >= 0.8 inside (lang, n_chars/50)
    // blocks. Id-only pairs through the skewed block join, then the shared
    // shuffle-attach verify (one linear merge per pair over long codes).
    "q_dedup_near" -> ((s, dir) => {
      graft.functions.SortedJaccardGe.register(s)
      val ids = Tables(s, dir, "documents")
        .selectExpr("doc_id", "lang", "n_chars DIV 50 AS bucket")
      val pairs = ids.as("a").join(ids.as("b"),
          col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      jaccardVerify(pairs, tokenCodes(s, dir), 0.8)
    }),

    // MinHash(8) + LSH (2 bands x 4 rows) candidates, then exact-Jaccard
    // verification at 0.8. Approximate by design: a >=0.8 pair missed by
    // both bands is absent — the oracle runs the identical two-stage
    // pipeline, so outputs still hash-match.
    "q_dedup_minhash" -> ((s, dir) => {
      graft.functions.SortedJaccardGe.register(s)
      graft.functions.MinHashSig.register(s)
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("lang"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      // one md5 per token for the whole 8-hash signature (custom expr)
      val sig = d.withColumn("mh", expr("minhash_sig(toks)"))
      val b0 = concat_ws(":", col("lang"), element_at(col("mh"), 1),
        element_at(col("mh"), 2), element_at(col("mh"), 3), element_at(col("mh"), 4))
      val b1 = concat_ws(":", col("lang"), element_at(col("mh"), 5),
        element_at(col("mh"), 6), element_at(col("mh"), 7), element_at(col("mh"), 8))
      // each row carries its band key AND the other band's key, so a pair
      // agreeing on both bands is emitted ONLY from band 0 (the band-1
      // copy is dropped by x.other != y.other) — exactly-once by
      // construction, no distinct() shuffle over the candidate pairs
      val bands = sig.select(col("doc_id"), explode(array(
          struct(lit(0).as("b"), b0.as("k"), b1.as("other")),
          struct(lit(1).as("b"), b1.as("k"), b0.as("other")))).as("e"))
        .select(col("doc_id"), col("e.b").as("b"), col("e.k").as("k"),
          col("e.other").as("other"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.doc_id") < col("y.doc_id") &&
          (col("x.b") === 0 || col("x.other") =!= col("y.other")))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      jaccardVerify(cand, tokenCodes(s, dir), 0.8)
    }),

    // SimHash: 16-bit signature from per-bit token majority votes; pairs
    // with hamming distance <= 3 inside the same language. Candidates by
    // pigeonhole-LSH: 3 differing bits touch at most 3 of the 4 disjoint
    // nibbles, so every qualifying pair shares at least one (band, nibble)
    // — an equi-join on (lang, band, nib), never a lang-only self-join
    // (quadratic within each language). Exact recall: output is identical
    // to the all-pairs form, which is what the oracle runs.
    "q_dedup_simhash" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks"))
        // hash each token once, then derive all 16 bits from the long —
        // not one md5 per (token, bit)
        .withColumn("th", expr(s"transform(toks, t -> ${hs("concat(t, '#s')")})"))
      val bits = (0 until 16).map(b =>
        s"(CASE WHEN 2 * size(filter(th, h -> (shiftright(h, $b) & 1) = 1)) > size(th) THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      val sig = d.selectExpr("doc_id", "lang", s"CAST($bits AS BIGINT) AS simhash")
      val bands = sig.select(col("doc_id"), col("lang"), col("simhash"),
          explode(array((0 until 4).map(lit): _*)).as("band"))
        .withColumn("nib", expr("shiftright(simhash, band * 4) & 15"))
      bands.as("x").join(bands.as("y"),
          col("x.lang") === col("y.lang") && col("x.band") === col("y.band") &&
          col("x.nib") === col("y.nib") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"),
          col("x.band").as("band"))
        .withColumn("hamming", expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
        // a qualifying pair meets in every agreeing band (<= 4 copies);
        // keep only the FIRST agreeing band's copy — exactly-once by
        // construction, so no distinct() shuffle over the (dense) matches
        .where(col("hamming") <= 3 && col("band") === expr(
          """CASE WHEN ((sim_a ^ sim_b) & 15) = 0 THEN 0
            |     WHEN ((sim_a ^ sim_b) & 240) = 0 THEN 1
            |     WHEN ((sim_a ^ sim_b) & 3840) = 0 THEN 2
            |     ELSE 3 END""".stripMargin))
        .select(col("doc_a"), col("doc_b"), col("sim_a"), col("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // Character 3-gram Jaccard >= 0.6 inside (lang, n_chars/100) blocks.
    // Shape matters here: the blocked self-join emits id-only pairs (no
    // arrays through the skewed block-key shuffle), the trigram sets —
    // packed 63-bit code points from TrigramCodes (one pass, zero string
    // allocation; injective packing keeps Jaccard bit-identical to the
    // string formulation the oracle runs) — are shuffle-attached, and the
    // O(pairs * |grams|) primitive-long merge runs once per pair.
    "q_dedup_ngram" -> ((s, dir) => {
      graft.functions.SortedJaccardGe.register(s)
      graft.functions.TrigramCodes.register(s)
      val grams = Tables(s, dir, "documents")
        .selectExpr("doc_id", "trigram_codes(text) AS codes")
      // Pair generation stays id-only: putting a gram-count prefilter in
      // this join re-inlines the whole gram computation into the join
      // condition (CollapseProject) and evaluates it per candidate pair.
      val ids = Tables(s, dir, "documents")
        .selectExpr("doc_id", "lang", "n_chars DIV 100 AS bucket")
      val pairs = ids.as("a").join(ids.as("b"),
          col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      jaccardVerify(pairs, grams, 0.6)
    }),

    // Embedding near-dup: cosine >= 0.3 inside the same coarse cluster
    // (label).
    "q_dedup_cosine" -> ((s, dir) => {
      graft.functions.VecDot.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
      val dot = "vec_dot(a.v, b.v)"
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", expr(dot) / (col("a.norm") * col("b.norm")))
        .where(col("cos") >= 0.3)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(col("cos"), 4).as("cos_sim"))
        .orderBy("vec_a", "vec_b")
    }),

    // Similarity search: brute-force cosine top-5 for 10 probe vectors
    // against all the rest; probe side broadcasts.
    "q_sim_topk" -> ((s, dir) => {
      graft.functions.VecDot.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("norm").as("pnorm"))
      val cands = e.where(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("norm").as("cnorm"))
      val dot = "vec_dot(pv, cv)"
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("neighbor_id"))
      cands.crossJoin(broadcast(probes))
        .withColumn("score", round(expr(dot) / (col("pnorm") * col("cnorm")), 4))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("probe_id"), big(col("rank")).as("rank"), col("neighbor_id"), col("score"))
        .orderBy("probe_id", "rank")
    }),

    // Dedup clustering: connected components over the near-dup pair graph
    // (the same blocked Jaccard >= 0.8 edges as q_dedup_near), labeling
    // every document with the min doc_id reachable from it — the "keep one
    // canonical doc per duplicate cluster" step of a training-data
    // pipeline. Iterative min-label propagation with pointer jumping: each
    // pass is one shuffle join over (tiny) id/label rows, pointer jumping
    // composes labels so convergence is O(log diameter) passes — the
    // two-phase star-contraction shape that scales to 100 TB graphs. The
    // loop runs ONLY over nodes that have at least one edge — isolated
    // docs (the overwhelming majority of a deduped corpus) keep
    // lbl = doc_id and rejoin at the end, so the per-pass shuffles move
    // the duplicate subgraph, not the corpus. The driver loop reads one
    // convergence bit per pass, computed from the SAME checkpointed pass
    // result (a cached-block scan, not an extra join job);
    // localCheckpoint pins each pass so plans stay constant-size instead
    // of growing exponentially with iterations.
    "q_dedup_cluster" -> ((s, dir) => {
      graft.functions.SortedJaccardGe.register(s)
      val ids = Tables(s, dir, "documents")
        .selectExpr("doc_id", "lang", "n_chars DIV 50 AS bucket")
      val pairs = ids.as("a").join(ids.as("b"),
          col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val enc = tokenCodes(s, dir)
      val ca = enc.select(col("doc_id").as("doc_a"), col("codes").as("ca"))
      val cb = enc.select(col("doc_id").as("doc_b"), col("codes").as("cb"))
      // the fused Jaccard runs once per pair here: it sits alone in a
      // filter (its value is discarded), so there is no projection for
      // CollapseProject to re-inline it into
      val dup = pairs.join(ca.hint("shuffle_hash"), "doc_a")
        .join(cb.hint("shuffle_hash"), "doc_b")
        .where(expr("sorted_jaccard_ge(ca, cb, 0.8D)").isNotNull)
        .select(col("doc_a"), col("doc_b"))
      val edges = dup.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(dup.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .localCheckpoint()
      // Pass 0, fused: with identity labels, "min label over neighbors"
      // IS "min neighbor id", so the first propagation is one groupBy
      // (both edge directions are present, so src alone covers every edge
      // node) — no join against an identity label table, no separate
      // init checkpoint. The pointer jump then composes two hops.
      val nbr0 = edges.groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("lbl"))
        .select(col("src").as("doc_id"), col("lbl"))
      val ptr0 = nbr0.select(col("doc_id").as("p"), col("lbl").as("plbl"))
      var lbl = nbr0.join(ptr0, nbr0("lbl") === ptr0("p"))
        .select(nbr0("doc_id").as("doc_id"), col("plbl").as("lbl"))
        .localCheckpoint()
      // pass 0 always changes labels (any node with a smaller neighbor
      // moves), so the convergence check starts at pass 1
      var done = false
      var iter = 1
      while (!done && iter < 12) {
        val nbrMin = edges
          .join(lbl.select(col("doc_id").as("dst_id"), col("lbl").as("dlbl")),
            col("dst") === col("dst_id"))
          .groupBy("src").agg(min("dlbl").as("nlbl"))
        val stepped = lbl.join(nbrMin, lbl("doc_id") === nbrMin("src"), "left")
          .select(lbl("doc_id").as("doc_id"), lbl("lbl").as("prev"),
            least(lbl("lbl"), coalesce(col("nlbl"), lbl("lbl"))).as("lbl"))
        // pointer jump: labels are doc_ids of edge nodes (a min over
        // same-component neighbors), so following the label one hop stays
        // inside `stepped` — the inner join is total
        val ptr = stepped.select(col("doc_id").as("p"), col("lbl").as("plbl"))
        val next = stepped.join(ptr, stepped("lbl") === ptr("p"))
          .select(stepped("doc_id").as("doc_id"), col("plbl").as("lbl"),
            (col("plbl") =!= col("prev")).as("changed"))
          .localCheckpoint()
        done = next.where(col("changed")).isEmpty
        lbl = next.select("doc_id", "lbl")
        iter += 1
      }
      // an unconverged exit must fail loudly — partially-propagated
      // labels are indistinguishable from a correct answer downstream
      if (!done) throw new IllegalStateException(
        s"q_dedup_cluster: label propagation unconverged after $iter passes")
      Tables(s, dir, "documents").select(col("doc_id"))
        .join(lbl, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("component"))
        .withColumn("is_canonical", col("doc_id") === col("component"))
        .orderBy("doc_id")
    }),

    // Sign-LSH ANN: bucket every vector by the sign pattern of 4 fixed
    // Rademacher (+-1) hyperplane projections, then search only the
    // probe's bucket — the third ANN modality next to brute-force
    // (q_sim_topk) and IVF (q_sim_ivf). Approximate by design: a neighbor
    // in a different bucket is absent; the oracle runs the identical
    // bucketed pipeline, so outputs hash-match. The +-1 projections are
    // plain left-assoc add/subtract chains — bit-identical in both
    // engines and fully codegen'd (no interpreted lambda per row).
    "q_sim_lsh" -> ((s, dir) => {
      graft.functions.VecDot.register(s)
      val bucket = lshBucketExpr(j => s"element_at(v, $j)")
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
        .withColumn("bucket", expr(bucket))
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("bucket").as("pbucket"),
          col("v").as("pv"), col("norm").as("pnorm"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))
      e.where(col("vec_id") >= 10)
        .join(broadcast(probes), col("bucket") === col("pbucket"))
        .withColumn("score", round(expr("vec_dot(pv, v)") / (col("pnorm") * col("norm")), 4))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("probe_id"), big(col("rank")).as("rank"),
          col("vec_id").as("neighbor_id"), col("score"))
        .orderBy("probe_id", "rank")
    }),

    // Int8-quantized similarity: per-vector symmetric scalar quantization
    // (scale = max |x| / 127), top-3 neighbors per probe by DEQUANTIZED
    // dot product — the memory-bound ANN path: 4x smaller vectors, exact
    // integer dot (values fit a double exactly), one multiply to
    // dequantize. floor(x/s*127 + 0.5) is bit-identical across engines,
    // unlike round() on arbitrary doubles.
    "q_sim_quantized" -> ((s, dir) => {
      graft.functions.VecDot.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("sc", greatest(expr("array_max(transform(v, x -> abs(x)))"), lit(1e-9)))
        .withColumn("q", expr("transform(v, x -> CAST(floor(x / sc * 127.0D + 0.5D) AS DOUBLE))"))
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("sc").as("psc"), col("q").as("pq"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))
      e.where(col("vec_id") >= 10)
        .crossJoin(broadcast(probes))
        .withColumn("score",
          round(expr("vec_dot(pq, q)") * col("psc") / 127.0 * col("sc") / 127.0, 4))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("probe_id"), big(col("rank")).as("rank"),
          col("vec_id").as("neighbor_id"), col("score"))
        .orderBy("probe_id", "rank")
    }),

    // IVF-style ANN: search only the probe's coarse cluster (label) — the
    // partition-pruned scale path; top-3 per probe.
    "q_sim_ivf" -> ((s, dir) => {
      graft.functions.VecDot.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
          col("v").as("pv"), col("norm").as("pnorm"))
      val dot = "vec_dot(pv, v)"
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))
      e.join(broadcast(probes),
          col("label") === col("plabel") && col("vec_id") =!= col("probe_id"))
        .withColumn("score", round(expr(dot) / (col("pnorm") * col("norm")), 4))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("probe_id"), big(col("rank")).as("rank"),
          col("vec_id").as("neighbor_id"), col("score"))
        .orderBy("probe_id", "rank")
    }),
  )

  private val jaccDuck = "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
    "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))"

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" -> ("SELECT min(doc_id) AS canonical_id, md5(text) AS fp, " +
      "count(*) AS n_copies FROM documents GROUP BY text ORDER BY canonical_id"),

    "q_dedup_near" -> ("WITH d AS (SELECT doc_id, lang, n_chars // 50 AS bucket, " +
      "list_distinct(string_split(text, ' ')) AS toks FROM documents) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      s"$jaccDuck AS jacc " +
      "FROM d a JOIN d b ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id " +
      s"WHERE $jaccDuck >= 0.8 ORDER BY doc_a, doc_b"),

    "q_dedup_minhash" -> {
      val as = Seq(3, 5, 7, 11, 13, 17, 19, 23)
      val mh = as.zipWithIndex.map { case (a, i) =>
        s"list_min(list_transform(toks, t -> ((${hd("t")} % 2147483647) * $a + $i) % 2147483647)) AS mh$i"
      }.mkString(", ")
      val j = "CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) / " +
        "(len(da.toks) + len(db.toks) - len(list_intersect(da.toks, db.toks)))"
      "WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents), " +
      s"s AS (SELECT doc_id, lang, toks, $mh FROM d), " +
      "b AS (SELECT doc_id, unnest([concat_ws(':', lang, 0, mh0, mh1, mh2, mh3), " +
      "concat_ws(':', lang, 1, mh4, mh5, mh6, mh7)]) AS band_key FROM s), " +
      "c AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b FROM b x JOIN b y " +
      "ON x.band_key = y.band_key AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
      s"SELECT doc_a, doc_b, $j AS jacc FROM c " +
      "JOIN d da ON da.doc_id = c.doc_a JOIN d db ON db.doc_id = c.doc_b " +
      s"WHERE $j >= 0.8 ORDER BY doc_a, doc_b"
    },

    "q_dedup_simhash" -> {
      val bits = (0 until 16).map(b =>
        s"(CASE WHEN 2 * len(list_filter(toks, t -> ((${hd("t || '#s'")} >> $b) & 1) = 1)) > len(toks) THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      "WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents), " +
      s"s AS (SELECT doc_id, lang, CAST($bits AS BIGINT) AS simhash FROM d) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sim_a, " +
      "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming " +
      "FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY doc_a, doc_b"
    },

    "q_dedup_ngram" -> ("WITH d AS (SELECT doc_id, lang, n_chars // 100 AS bucket, " +
      "list_distinct([substr(text, i, 3) for i in generate_series(1, CAST(length(text) AS INT) - 2)]) AS toks " +
      "FROM documents) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      s"$jaccDuck AS jacc " +
      "FROM d a JOIN d b ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id " +
      s"WHERE $jaccDuck >= 0.6 ORDER BY doc_a, doc_b"),

    "q_dedup_cosine" -> ("SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
      "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim " +
      "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3 " +
      "ORDER BY vec_a, vec_b"),

    "q_sim_topk" -> ("SELECT probe_id, rank, neighbor_id, score FROM " +
      "(SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, " +
      "round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS score, " +
      "CAST(row_number() OVER (PARTITION BY p.vec_id ORDER BY " +
      "round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) DESC, c.vec_id) AS BIGINT) AS rank " +
      "FROM embeddings p, embeddings c WHERE p.vec_id < 10 AND c.vec_id >= 10) " +
      "WHERE rank <= 5 ORDER BY probe_id, rank"),

    "q_dedup_cluster" -> ("WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars // 50 AS bucket, " +
      "list_distinct(string_split(text, ' ')) AS toks FROM documents), " +
      "e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM d a JOIN d b " +
      "ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id <> b.doc_id " +
      s"WHERE $jaccDuck >= 0.8), " +
      "r(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT e.src, r.lbl FROM r JOIN e ON e.dst = r.id) " +
      "SELECT id AS doc_id, min(lbl) AS component, (id = min(lbl)) AS is_canonical " +
      "FROM r GROUP BY id ORDER BY doc_id"),

    "q_sim_lsh" -> {
      val bucket = lshBucketExpr(j => s"v[$j]")
      "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"s AS (SELECT vec_id, v, $bucket AS bucket FROM b) " +
      "SELECT probe_id, rank, neighbor_id, score FROM " +
      "(SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, " +
      "round(list_cosine_similarity(p.v, c.v), 4) AS score, " +
      "CAST(row_number() OVER (PARTITION BY p.vec_id ORDER BY " +
      "round(list_cosine_similarity(p.v, c.v), 4) DESC, c.vec_id) AS BIGINT) AS rank " +
      "FROM s p JOIN s c ON p.bucket = c.bucket AND p.vec_id < 10 AND c.vec_id >= 10) " +
      "WHERE rank <= 3 ORDER BY probe_id, rank"
    },

    "q_sim_quantized" -> ("WITH e AS (SELECT vec_id, " +
      "[CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings), " +
      "s1 AS (SELECT vec_id, v, " +
      "greatest(list_max([abs(x) for x in v]), 1e-9) AS sc FROM e), " +
      "qt AS (SELECT vec_id, sc, " +
      "[CAST(floor(x / sc * 127.0 + 0.5) AS DOUBLE) for x in v] AS q FROM s1), " +
      "scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, " +
      "round(list_dot_product(p.q, c.q) * p.sc / 127.0 * c.sc / 127.0, 4) AS score " +
      "FROM qt p JOIN qt c ON p.vec_id < 10 AND c.vec_id >= 10) " +
      "SELECT probe_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, score FROM " +
      "(SELECT probe_id, neighbor_id, score, row_number() OVER " +
      "(PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rnk FROM scored) " +
      "WHERE rnk <= 3 ORDER BY probe_id, rank"),

    "q_sim_ivf" -> ("SELECT probe_id, rank, neighbor_id, score FROM " +
      "(SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, " +
      "round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS score, " +
      "CAST(row_number() OVER (PARTITION BY p.vec_id ORDER BY " +
      "round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) DESC, c.vec_id) AS BIGINT) AS rank " +
      "FROM embeddings p JOIN embeddings c ON p.label = c.label AND c.vec_id != p.vec_id " +
      "WHERE p.vec_id < 10) " +
      "WHERE rank <= 3 ORDER BY probe_id, rank"),
  )
}
