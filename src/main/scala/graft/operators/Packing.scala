package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** Training-batch construction — the operators that turn a cleaned corpus
  * into model-ready sequences: concatenate-and-chunk sequence packing,
  * vocabulary construction with coverage accounting, and cross-document
  * n-gram novelty (how much of each document is repetition of earlier
  * corpus content).
  *
  * All three are deterministic (content/key ordered, no rand()) and keep
  * the global-ordering work out of single-partition windows: packing uses
  * the same bucket-offset decomposition as q_sink_batched, vocab ranks
  * only the already-aggregated (small) frequency table, novelty is two
  * key-partitioned aggregations.
  */
object Packing extends QueryFamily {

  /** Word 4-grams of the pre-split token array `t` (guarded size >= 4:
    * Spark's sequence(1, 0) DESCENDS where DuckDB's generate_series is
    * empty, so callers must filter short docs first). */
  private val gram4 = "transform(sequence(1, size(t) - 3), i -> " +
    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), " +
    "element_at(t, i + 2), element_at(t, i + 3)))"

  private val gram4Duck = "[t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] " +
    "for i in generate_series(1, len(t) - 3)]"

  /** (doc_id, n_tok, before): each document's token count and the number
    * of corpus tokens strictly before it in doc_id order. The global
    * running count is NOT a single-partition window: doc_id ranges form
    * buckets, per-bucket token totals (a tiny table) are prefix-summed
    * and broadcast back, and each bucket computes only its LOCAL prefix
    * sums — the q_sink_batched decomposition, which scales to any corpus
    * because the only global state is one row per bucket. Both packing
    * queries read their running-token-count definition from this one
    * frame, so they cannot diverge on it.
    */
  private def tokensBefore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), big(size(split(col("text"), " "))).as("n_tok"),
        expr("doc_id DIV 64 AS bkt"))
    val offs = d.groupBy("bkt").agg(sum("n_tok").as("toks"))
      .withColumn("off", coalesce(sum("toks").over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bkt", "off")
    d.join(broadcast(offs), "bkt")
      .withColumn("before", col("off") +
        coalesce(sum("n_tok").over(
          Window.partitionBy("bkt").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "n_tok", "before")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sequence packing, concatenate-then-chunk: documents in doc_id order
    // are laid head-to-tail and cut every 2048 tokens; a document belongs
    // to the chunk its first token lands in ([[tokensBefore]] supplies
    // the scale-safe running count).
    "q_pack_sequences" -> ((s, dir) => {
      tokensBefore(s, dir)
        .withColumn("seq_id", expr("before DIV 2048"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("seq_id")
    }),

    // Token-budget shard assignment: split the corpus (doc_id order) into
    // 16 output shards of ≈equal TOKEN volume — the "write balanced
    // training shards" op (a doc belongs wholly to one shard; shard =
    // tokens-before × K ÷ total, the proportional partitioner). Running
    // count from [[tokensBefore]]; the single-row corpus total rides a
    // broadcast cross join; integer arithmetic throughout.
    "q_pack_shards" -> ((s, dir) => {
      val tot = Tables(s, dir, "documents")
        .agg(big(sum(size(split(col("text"), " ")))).as("total"))
      tokensBefore(s, dir)
        .crossJoin(broadcast(tot))
        .withColumn("shard", expr("before * 16 DIV total"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard")
    }),

    // Vocabulary construction: top-100 tokens by corpus frequency with a
    // deterministic tie-break (count desc, token asc) and the cumulative
    // token-coverage count — the "how big must the vocab be" table. The
    // distributed work is the groupBy; the candidate cut is a distributed
    // top-k (TakeOrderedAndProject), so the only windowed data is the 100
    // surviving rows.
    "q_text_vocab" -> ((s, dir) => {
      val freq = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val top = freq.orderBy(col("cnt").desc, col("tok")).limit(100)
      val wRank = Window.orderBy(col("cnt").desc, col("tok"))
      top
        .withColumn("rk", row_number().over(wRank))
        .withColumn("cum_cnt",
          sum("cnt").over(wRank.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("rk"), col("tok"), col("cnt"), col("cum_cnt"))
        .orderBy("rk")
    }),

    // Deterministic epoch ordering: each epoch e permutes the corpus by
    // a SALTED content hash (md5(text || '|epoch e')) — a different,
    // fully reproducible global order per epoch, the property a resumed
    // training run needs (rand() would reshuffle on every retry). Docs
    // hash-route to 16 shards; the within-shard position comes from the
    // bucket-offset decomposition (per-(epoch, shard, bucket) counts,
    // prefix-summed and broadcast, local ranks only) — NO corpus-scale
    // window. The served row is per (epoch, shard): doc/token counts
    // plus an ORDER-SENSITIVE checksum sum(position × doc_id); the
    // oracle recomputes positions with a plain row_number, so the hash
    // gate certifies the decomposed ranks equal the windowed ranks —
    // the q_sync_full discipline applied to training order.
    "q_pack_epoch" -> ((s, dir) => {
      val perEpoch = Seq(1, 2).map { e =>
        Tables(s, dir, "documents").select(
          lit(e).as("epoch"),
          col("doc_id"),
          big(size(split(col("text"), " "))).as("n_tok"),
          expr("CAST(conv(substr(md5(concat(text, '|epoch" + e +
            "')), 1, 15), 16, 10) AS BIGINT)").as("h"))
      }.reduce(_ unionByName _)
        .withColumn("shard", pmod(col("h"), lit(16L)))
        .withColumn("bkt", expr("h DIV 281474976710656")) // 2^48: <=4096 buckets
      val offs = perEpoch.groupBy("epoch", "shard", "bkt")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.partitionBy("epoch", "shard").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("epoch", "shard", "bkt", "off")
      perEpoch.join(broadcast(offs), Seq("epoch", "shard", "bkt"))
        .withColumn("pos", col("off") + row_number().over(
          Window.partitionBy("epoch", "shard", "bkt").orderBy("h", "doc_id")) - 1)
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          big(sum(col("pos") * col("doc_id"))).as("ord_sum"))
        .orderBy("epoch", "shard")
    }),

    // Cross-document n-gram novelty: for each document, how many of its
    // distinct word-4-grams first appeared in an EARLIER document (gram's
    // min doc_id precedes this one) — the repetition-lineage signal dedup
    // thresholds are tuned against. array_distinct dedups per doc BEFORE
    // the explode (map-side, no shuffle); first-appearance is a
    // partial-aggregating groupBy on the gram, joined back — the
    // window-free form, because count(*) OVER (PARTITION BY gram) does no
    // map-side combine and a hot gram would pile into one task (the
    // q_text_tfidf lesson).
    "q_text_novelty" -> ((s, dir) => {
      val g = Tables(s, dir, "documents")
        .withColumn("t", split(col("text"), " "))
        .where(size(col("t")) >= 4)
        .select(col("doc_id"), explode(array_distinct(expr(gram4))).as("g"))
      val first = g.groupBy("g").agg(min("doc_id").as("first_doc"))
      g.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          big(sum(when(col("first_doc") < col("doc_id"), 1).otherwise(0)))
            .as("n_repeated"))
        .orderBy("doc_id")
    }),

    // Cross-document boilerplate detection (CCNet-style paragraph dedup,
    // restated over this fixture's unpunctuated token streams): a doc's
    // aligned non-overlapping 8-token passages are boilerplate iff the
    // same passage occurs in >= 2 distinct documents; emit per-doc
    // passage/boilerplate/kept-token counts (integers only). The shuffle
    // key is the 60-bit md5 prefix of the passage — constant-width, so a
    // 100 TB corpus shuffles fixed-size keys instead of 8-word strings
    // (a 2^-60 collision merges two passages' doc-frequencies: harmless
    // for a >= 2 threshold, and both engines compute the same key so the
    // oracle agrees regardless). Doc-frequency is the (pk, doc_id)-deduped
    // two-phase groupBy joined back — the q_text_novelty window-free form,
    // so a passage shared by millions of docs still combines map-side.
    "q_text_boilerplate" -> ((s, dir) => {
      // split("", " ") = [""], so size(t) >= 1 always and the sequence
      // bound (size(t)+7) DIV 8 >= 1 — the sequence(0, -1) descent trap
      // (SURVEY §7.5) can't fire.
      val p = Tables(s, dir, "documents")
        .withColumn("t", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, (size(t)+7) DIV 8 - 1), " +
            "i -> slice(t, i*8+1, 8))")).as("pt"))
        .select(col("doc_id"),
          expr("CAST(conv(substr(md5(concat_ws(' ', pt)), 1, 15), 16, 10) AS BIGINT)")
            .as("pk"),
          big(size(col("pt"))).as("n_tok"))
      val freq = p.groupBy("pk", "doc_id").agg(count(lit(1)).as("dup"))
        .groupBy("pk").agg(count(lit(1)).as("nd"))
      p.join(freq, "pk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_passages"),
          big(sum(when(col("nd") >= 2, 1).otherwise(0))).as("n_boiler"),
          big(sum(when(col("nd") >= 2, 0L).otherwise(col("n_tok")))).as("n_kept_tok"))
        .orderBy("doc_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_pack_sequences" -> ("WITH d AS (SELECT doc_id, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
      "c AS (SELECT doc_id, n_tok, " +
      "CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING " +
      "AND CURRENT ROW) AS BIGINT) - n_tok AS before FROM d) " +
      "SELECT before // 2048 AS seq_id, count(*) AS n_docs, " +
      "CAST(SUM(n_tok) AS BIGINT) AS n_tokens, " +
      "min(doc_id) AS first_doc, max(doc_id) AS last_doc " +
      "FROM c GROUP BY seq_id ORDER BY seq_id"),

    "q_pack_shards" -> ("WITH d AS (SELECT doc_id, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
      "c AS (SELECT doc_id, n_tok, " +
      "CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING " +
      "AND CURRENT ROW) AS BIGINT) - n_tok AS before FROM d), " +
      "t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM d) " +
      "SELECT CAST(before * 16 // total AS BIGINT) AS shard, " +
      "count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens, " +
      "min(doc_id) AS first_doc, max(doc_id) AS last_doc " +
      "FROM c, t GROUP BY 1 ORDER BY shard"),

    "q_pack_epoch" -> ("WITH d AS (SELECT doc_id, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, text FROM documents), " +
      "e AS (SELECT 1 AS epoch UNION ALL SELECT 2), " +
      "h AS (SELECT epoch, doc_id, n_tok, " +
      "CAST(concat('0x', substr(md5(text || '|epoch' || epoch), 1, 15)) AS BIGINT) AS h " +
      "FROM d, e), " +
      "r AS (SELECT epoch, doc_id, n_tok, h % 16 AS shard, " +
      "row_number() OVER (PARTITION BY epoch, h % 16 ORDER BY h, doc_id) - 1 AS pos " +
      "FROM h) " +
      "SELECT epoch, CAST(shard AS BIGINT) AS shard, count(*) AS n_docs, " +
      "CAST(sum(n_tok) AS BIGINT) AS n_tokens, " +
      "CAST(sum(pos * doc_id) AS BIGINT) AS ord_sum " +
      "FROM r GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_text_vocab" -> ("WITH freq AS (SELECT tok, count(*) AS cnt FROM " +
      "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
      "GROUP BY tok), " +
      "top AS (SELECT tok, cnt FROM freq ORDER BY cnt DESC, tok LIMIT 100) " +
      "SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS rk, " +
      "tok, cnt, " +
      "CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt " +
      "FROM top ORDER BY rk"),

    "q_text_novelty" -> ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS t " +
      "FROM documents WHERE len(string_split(text, ' ')) >= 4), " +
      s"gr AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest($gram4Duck) AS g FROM d)), " +
      "f AS (SELECT g, min(doc_id) AS first_doc FROM gr GROUP BY g) " +
      "SELECT gr.doc_id, count(*) AS n_grams, " +
      "CAST(SUM(CASE WHEN f.first_doc < gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_repeated FROM gr JOIN f USING (g) " +
      "GROUP BY gr.doc_id ORDER BY gr.doc_id"),

    "q_text_boilerplate" -> ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS t " +
      "FROM documents), " +
      "p AS (SELECT doc_id, CAST(concat('0x', substr(md5(" +
      "array_to_string(t[(i*8+1):(i*8+8)], ' ')), 1, 15)) AS BIGINT) AS pk, " +
      "CAST(len(t[(i*8+1):(i*8+8)]) AS BIGINT) AS n_tok " +
      "FROM d, UNNEST(range((len(t)+7) // 8)) AS u(i)), " +
      "f AS (SELECT pk, count(*) AS nd FROM (SELECT DISTINCT doc_id, pk FROM p) " +
      "GROUP BY pk) " +
      "SELECT p.doc_id, count(*) AS n_passages, " +
      "CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler, " +
      "CAST(SUM(CASE WHEN f.nd >= 2 THEN 0 ELSE p.n_tok END) AS BIGINT) AS n_kept_tok " +
      "FROM p JOIN f USING (pk) GROUP BY p.doc_id ORDER BY p.doc_id"),
  )
}
