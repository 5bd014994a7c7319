package graft

import java.nio.file.{Files, Paths}

import graft.search.InvertedIndex
import graft.sinks.AliasedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inverted-index serve path: segment model, incremental lexicon
  * fold, compaction, crash-orphan invisibility, and the plan shape of
  * ranked retrieval. Value-level agreement with first principles is the
  * DuckDB oracle (q_search_*); these specs pin everything the oracle
  * can't see — physical plans, file layout, equivalence across ingest
  * histories.
  */
class SearchSpec extends AnyFunSuite {
  import TestSpark._

  private def freshRoot(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_spec_$tag"
    AliasedIndex.deleteRecursively(Paths.get(root))
    root
  }

  private def docs: DataFrame =
    Tables(spark, sf0001, "documents").select("doc_id", "text")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("segmented build equals one-shot build: bm25, phrase, lexicon") {
    val one = freshRoot("search_oneshot")
    val seg = freshRoot("search_segmented")
    InvertedIndex.build(spark, one, docs)
    InvertedIndex.build(spark, seg, docs.where("doc_id % 3 = 0"))
    InvertedIndex.append(spark, seg, docs.where("doc_id % 3 = 1"))
    InvertedIndex.append(spark, seg, docs.where("doc_id % 3 = 2"))
    val terms = Seq("spark", "merge", "window")
    assert(rows(InvertedIndex.bm25(spark, one, terms, 20)) ==
      rows(InvertedIndex.bm25(spark, seg, terms, 20)))
    assert(rows(InvertedIndex.phrase(spark, one, "merge", "batch")) ==
      rows(InvertedIndex.phrase(spark, seg, "merge", "batch")))
    assert(rows(InvertedIndex.lexicon(spark, one).orderBy("tok")) ==
      rows(InvertedIndex.lexicon(spark, seg).orderBy("tok")))
  }

  test("compaction preserves every answer and collapses the manifest to one segment") {
    val root = freshRoot("search_compact")
    InvertedIndex.build(spark, root, docs.where("doc_id % 2 = 0"))
    InvertedIndex.append(spark, root, docs.where("doc_id % 2 = 1"))
    val terms = Seq("spark", "merge", "window")
    val before = rows(InvertedIndex.bm25(spark, root, terms, 20))
    val beforePh = rows(InvertedIndex.phrase(spark, root, "merge", "batch"))
    InvertedIndex.compact(spark, root)
    assert(rows(InvertedIndex.bm25(spark, root, terms, 20)) == before)
    assert(rows(InvertedIndex.phrase(spark, root, "merge", "batch")) == beforePh)
    // manifest now names exactly one live segment; vacuum reclaims the two
    // compacted-away dirs and the reclaimed names never include the live one
    val metaDir = AliasedIndex.resolve(s"$root/meta").get
    val live = Files.readAllLines(Paths.get(metaDir, "segments"))
    assert(live.size == 1, s"expected one live segment, got $live")
    val reclaimed = InvertedIndex.vacuum(root)
    assert(reclaimed.size == 2 && !reclaimed.contains(live.get(0)), s"$reclaimed")
    assert(rows(InvertedIndex.bm25(spark, root, terms, 20)) == before)
  }

  test("a crash-orphan segment is invisible to readers and reclaimed by vacuum") {
    val root = freshRoot("search_orphan")
    InvertedIndex.build(spark, root, docs)
    val nDocs = InvertedIndex.globals(spark, root)
      .head().getAs[Long]("n_docs")
    val postRows = InvertedIndex.postings(spark, root).count()
    // simulate an append that materialized its segment but died before the
    // meta publish: a visible, unreferenced seg dir with real parquet
    docstatsLikeOrphan(root, "seg-99999")
    assert(InvertedIndex.postings(spark, root).count() == postRows,
      "orphan postings leaked into the committed read path")
    assert(InvertedIndex.globals(spark, root)
      .head().getAs[Long]("n_docs") == nDocs)
    assert(InvertedIndex.vacuum(root) == Seq("seg-99999"))
    assert(InvertedIndex.postings(spark, root).count() == postRows)
  }

  private def docstatsLikeOrphan(root: String, name: String): Unit = {
    val d = docs.limit(7)
    val seg = s"$root/$name"
    d.select(col("doc_id"), lit("zzz").as("tok"), lit(1L).as("tf"),
        array(lit(1)).as("positions"))
      .write.parquet(s"$seg/postings")
    d.select(col("doc_id"), lit(1L).as("dl")).write.parquet(s"$seg/docstats")
  }

  test("bm25 plan: term filter pushes into the postings scan; corpus never read") {
    val root = freshRoot("search_plan")
    InvertedIndex.build(spark, root, docs)
    val p = InvertedIndex.bm25(spark, root, Seq("spark", "merge"), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(tok, [merge,spark])") ||
      p.contains("PushedFilters: [In(tok, [spark,merge])"), p.take(3000))
    assert(!p.contains("documents.parquet"), p.take(3000))
    // ranked cut is a distributed top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // conjunctive shares the pushdown discipline — and stays one scan +
    // one aggregation even after a delete installs the tombstone filter
    InvertedIndex.delete(spark, root, docs.limit(3).select("doc_id"))
    val c = InvertedIndex.conjunctive(spark, root, Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(c.contains("PushedFilters: [In(tok, [merge,spark])") ||
      c.contains("PushedFilters: [In(tok, [spark,merge])"), c.take(3000))
    assert(!c.contains("documents.parquet"), c.take(3000))
    assert(c.contains("BroadcastHashJoin") && c.contains("LeftAnti"),
      s"tombstone filter should be a broadcast anti-join:\n${c.take(3000)}")
  }

  test("wildcard: capped lexicon expansion, postings pushdown, delete-aware") {
    val root = freshRoot("search_wildcard")
    InvertedIndex.build(spark, root, docs)
    // expansion equals a multi-term query over the same expanded set
    val viaWild = rows(InvertedIndex.wildcard(spark, root, "s"))
    val expanded = InvertedIndex.lexicon(spark, root)
      .where(col("tok").startsWith("s")).select("tok")
      .collect().map(_.getString(0)).toSeq
    assert(expanded.nonEmpty && expanded.forall(_.startsWith("s")))
    val viaTerms = rows(InvertedIndex.postings(spark, root)
      .where(col("tok").isin(expanded: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("tf_sum"))
      .orderBy("doc_id"))
    assert(viaWild == viaTerms)
    // the expanded IN pushes into the postings parquet scan
    val p = InvertedIndex.wildcard(spark, root, "s")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(tok,"), p.take(3000))
    assert(!p.contains("documents.parquet"), p.take(3000))
    // the cap fails loudly instead of scanning the vocabulary
    val e = intercept[IllegalArgumentException](
      InvertedIndex.wildcard(spark, root, "s", maxExpansions = 2))
    assert(e.getMessage.contains("maxExpansions"))
    // an unmatched prefix serves an empty, correctly-typed result
    assert(InvertedIndex.wildcard(spark, root, "zzz").count() == 0)
    // tombstones apply: deleting a matching doc removes it from the hits
    val victim = InvertedIndex.wildcard(spark, root, "s")
      .select("doc_id").head().getLong(0)
    InvertedIndex.delete(spark, root,
      docs.where(col("doc_id") === victim).select("doc_id"))
    assert(!InvertedIndex.wildcard(spark, root, "s")
      .select("doc_id").collect().map(_.getLong(0)).contains(victim))
  }

  test("fuzzy: Levenshtein lexicon expansion, pushdown, cap, delete-aware") {
    val root = freshRoot("search_fuzzy")
    InvertedIndex.build(spark, root, docs)
    // the fixture vocabulary puts fast/part/sort/spark within 2 edits of
    // 'part' — the expansion must equal a plain multi-term query over
    // exactly that set
    val expanded = InvertedIndex.lexicon(spark, root)
      .where(levenshtein(col("tok"), lit("part")) <= 2).select("tok")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(expanded == Seq("fast", "part", "sort", "spark"), expanded)
    val viaFuzzy = rows(InvertedIndex.fuzzy(spark, root, "part", maxEdits = 2))
    val viaTerms = rows(InvertedIndex.postings(spark, root)
      .where(col("tok").isin(expanded: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("tf_sum"))
      .orderBy("doc_id"))
    assert(viaFuzzy == viaTerms)
    // maxEdits=0 degenerates to the exact single-term query
    val exact = rows(InvertedIndex.fuzzy(spark, root, "merge", maxEdits = 0))
    val direct = rows(InvertedIndex.postings(spark, root)
      .where(col("tok") === "merge")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("tf_sum"))
      .orderBy("doc_id"))
    assert(exact == direct && exact.nonEmpty)
    // the expanded IN pushes into the postings scan; corpus never read
    val p = InvertedIndex.fuzzy(spark, root, "part", maxEdits = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(tok,"), p.take(3000))
    assert(!p.contains("documents.parquet"), p.take(3000))
    // a hopeless term serves an empty, correctly-typed result
    assert(InvertedIndex.fuzzy(spark, root, "zzzzzzzzz", maxEdits = 1).count() == 0)
    // the cap fails loudly instead of fanning out across the postings
    val e = intercept[IllegalArgumentException](
      InvertedIndex.fuzzy(spark, root, "part", maxEdits = 2, maxExpansions = 2))
    assert(e.getMessage.contains("maxExpansions"))
    // tombstones apply to fuzzy hits too
    val victim = InvertedIndex.fuzzy(spark, root, "part", maxEdits = 2)
      .select("doc_id").head().getLong(0)
    InvertedIndex.delete(spark, root,
      docs.where(col("doc_id") === victim).select("doc_id"))
    assert(!InvertedIndex.fuzzy(spark, root, "part", maxEdits = 2)
      .select("doc_id").collect().map(_.getLong(0)).contains(victim))
  }

  test("phraseN: shift-and-count equals the join-shape phrase; guards hold") {
    val root = freshRoot("search_phrasen")
    InvertedIndex.build(spark, root, docs)
    // the two independent implementations must agree on every 2-term phrase
    val viaJoin = rows(InvertedIndex.phrase(spark, root, "merge", "batch"))
    val viaShift = rows(InvertedIndex.phraseN(spark, root, Seq("merge", "batch")))
    assert(viaShift == viaJoin && viaShift.nonEmpty)
    // a 3-term phrase count can never exceed either of its 2-term prefixes
    // ("big order scan" is the sf0.001 fixture's most frequent trigram)
    val tri = InvertedIndex.phraseN(spark, root, Seq("big", "order", "scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val duo = InvertedIndex.phraseN(spark, root, Seq("big", "order"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri.nonEmpty)
    tri.foreach { case (d, n) => assert(duo.getOrElse(d, 0L) >= n, s"doc $d") }
    // repeated terms refuse loudly rather than miscount
    val e = intercept[IllegalArgumentException](
      InvertedIndex.phraseN(spark, root, Seq("merge", "merge")))
    assert(e.getMessage.contains("distinct"))
  }

  test("phrase agrees with a direct recompute over the raw text") {
    val root = freshRoot("search_phrase_direct")
    InvertedIndex.build(spark, root, docs)
    val direct = docs
      .withColumn("t", split(col("text"), " "))
      .where(size(col("t")) >= 2) // sequence(1, 0) DESCENDS (SURVEY §7.5)
      .select(col("doc_id"), explode(expr(
        "filter(transform(sequence(1, size(t) - 1), " +
          "i -> element_at(t, i) = 'merge' AND element_at(t, i + 1) = 'batch'), " +
          "x -> x)")).as("hit"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy("doc_id")
    assert(rows(InvertedIndex.phrase(spark, root, "merge", "batch")) ==
      rows(direct))
  }

  test("deletion: tombstoned index equals a from-scratch index of the survivors") {
    val root = freshRoot("search_delete")
    val clean = freshRoot("search_delete_clean")
    InvertedIndex.build(spark, root, docs)
    InvertedIndex.delete(spark, root,
      docs.where("doc_id % 5 = 0").select("doc_id"))
    InvertedIndex.build(spark, clean, docs.where("doc_id % 5 <> 0"))
    val terms = Seq("spark", "merge", "window")
    def fingerprint(r: String): Seq[Seq[String]] = Seq(
      rows(InvertedIndex.bm25(spark, r, terms, 20)),
      rows(InvertedIndex.conjunctive(spark, r, terms)),
      rows(InvertedIndex.phrase(spark, r, "merge", "batch")),
      rows(InvertedIndex.lexicon(spark, r).orderBy("tok")),
      rows(InvertedIndex.globals(spark, r)))
    assert(fingerprint(root) == fingerprint(clean),
      "tombstone delete diverges from a clean rebuild of the survivors")

    // replaying the same delete is a no-op (stats cannot decrement twice)
    val before = fingerprint(root)
    InvertedIndex.delete(spark, root,
      docs.where("doc_id % 5 = 0").select("doc_id"))
    assert(fingerprint(root) == before, "delete replay changed the index")

    // an append AFTER a delete must not resurrect the tombstoned docs…
    InvertedIndex.append(spark, root,
      docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    InvertedIndex.append(spark, clean,
      docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    assert(fingerprint(root) == fingerprint(clean),
      "append after delete resurrected tombstoned docs")

    // …and compaction physically purges them, clearing the tombstones
    InvertedIndex.compact(spark, root)
    InvertedIndex.vacuum(root)
    assert(fingerprint(root) == fingerprint(clean),
      "compaction after delete changed an answer")
    assert(InvertedIndex.postings(spark, root)
      .where("doc_id % 5 = 0 and doc_id < 1000000").count() == 0,
      "compaction kept physically-deleted postings")
    assert(!Files.isDirectory(Paths.get(
      AliasedIndex.resolve(s"$root/meta").get, "deletes")),
      "compaction did not clear the tombstone list")
  }

  test("build refuses a root that already has a committed version") {
    val root = freshRoot("search_rebuild")
    InvertedIndex.build(spark, root, docs.limit(10))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.build(spark, root, docs.limit(10))
    }
    assert(e.getMessage.contains("already has a committed version"))
  }

  test("facets: hits ride the postings, metadata never reads the corpus text") {
    val df = SparkEntry.queries("q_search_facets")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    // the match set comes from the index's term-pruned postings scan
    // (the segment path; the term filter pushed into it), not a text
    // scan; the doc-values-analog metadata join projects (doc_id, lang,
    // source) only — the text column never leaves disk
    assert(p.contains("seg-") && p.contains("EqualTo(tok,spark)"), p.take(3000))
    val docScans = p.split('\n').filter(l =>
      l.contains("documents.parquet") && l.contains("ReadSchema"))
    assert(docScans.nonEmpty && docScans.forall(!_.contains("text")),
      docScans.mkString("\n"))
    // and the buckets cover the full match set: totals across each
    // facet equal a direct corpus recompute of the term's doc count
    val hits = Tables(spark, TestSpark.sf0001, "documents")
      .where(org.apache.spark.sql.functions.expr(
        "array_contains(split(text, ' '), 'spark')")).count()
    val byFacet = df.collect()
      .groupBy(_.getAs[String]("facet"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byFacet.values.forall(_ == hits), s"$byFacet vs $hits hits")
  }
}
