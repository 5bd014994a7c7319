package graft

import org.scalatest.funsuite.AnyFunSuite

/** Each custom Catalyst expression must agree exactly with its built-in
  * (slower) formulation on real data — the optimization is only allowed
  * to change the plan, never a bit of the result.
  */
class ExpressionsSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private lazy val toksDf = {
    graft.functions.SortedIntersectSize.register(spark)
    graft.functions.SortedJaccardGe.register(spark)
    graft.functions.MinHashSig.register(spark)
    graft.functions.VecDot.register(spark)
    Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "array_sort(array_distinct(split(text, ' '))) AS toks")
  }

  test("sorted_intersect_size == size(array_intersect) on sorted sets") {
    val pairs = toksDf.limit(40).as("a").crossJoin(toksDf.limit(40).as("b"))
      .selectExpr("sorted_intersect_size(a.toks, b.toks) AS fast",
        "size(array_intersect(a.toks, b.toks)) AS ref")
    assert(pairs.where(col("fast") =!= col("ref")).count() == 0)
  }

  test("sorted_jaccard_ge: NULL below threshold, exact ratio at/above") {
    val pairs = toksDf.limit(60).as("a").crossJoin(toksDf.limit(60).as("b"))
      .selectExpr(
        "sorted_jaccard_ge(a.toks, b.toks, 0.3D) AS fused",
        "CAST(size(array_intersect(a.toks, b.toks)) AS DOUBLE) / " +
          "(size(a.toks) + size(b.toks) - size(array_intersect(a.toks, b.toks))) AS ref")
    assert(pairs.where(col("ref") >= 0.3 && (col("fused").isNull || col("fused") =!= col("ref"))).count() == 0)
    assert(pairs.where(col("ref") < 0.3 && col("fused").isNotNull).count() == 0)
  }

  test("vec_dot == aggregate(zip_with) fold, bit-exact") {
    val e = Tables(spark, sf0001, "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_dot(v, v) AS fast",
        "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, p) -> a + p) AS ref")
    assert(e.where(col("fast") =!= col("ref")).count() == 0)
  }

  test("vec_dot is NULL on length mismatch (zip_with null-pad semantics)") {
    toksDf // force registration
    val df = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D)) AS mismatch,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nullin""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 11.0)
    assert(r.isNullAt(2))
  }

  test("minhash_sig: skips NULL elements, NULL for empty input (list_min semantics)") {
    toksDf // force registration
    val df = spark.sql(
      """SELECT minhash_sig(array('a', CAST(NULL AS STRING), 'b')) AS skipped,
        |       minhash_sig(array('a', 'b')) AS plain,
        |       minhash_sig(CAST(array() AS ARRAY<STRING>)) AS empty,
        |       minhash_sig(array(CAST(NULL AS STRING))) AS allnull""".stripMargin)
    val r = df.collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.isNullAt(2))
    assert(r.isNullAt(3))
  }

  test("weighted-mean cents: HALF_UP away from zero on negative half-cents") {
    import graft.functions.WeightedMean
    assert(WeightedMean.cents(0.125) == 13L)
    assert(WeightedMean.cents(-0.125) == -13L) // math.round would give -12
    assert(WeightedMean.cents(1234.56) == 123456L)
    assert(WeightedMean.cents(-1234.56) == -123456L)
  }

  test("trigram_codes jaccard == string-trigram jaccard, bit-exact") {
    graft.functions.TrigramCodes.register(spark)
    toksDf // force registration of sorted_jaccard_ge
    val d = Tables(spark, sf0001, "documents").selectExpr("doc_id",
      "trigram_codes(text) AS tc",
      "array_sort(array_distinct(transform(sequence(1, length(text) - 2), i -> substr(text, i, 3)))) AS ts")
    val pairs = d.limit(30).as("a").crossJoin(d.limit(30).as("b"))
      .selectExpr("sorted_jaccard_ge(a.tc, b.tc, 0.1D) AS fast",
        "sorted_jaccard_ge(a.ts, b.ts, 0.1D) AS ref")
    assert(pairs.where(!(col("fast") <=> col("ref"))).count() == 0)
  }

  test("trigram_codes handles non-ASCII code points and short strings") {
    graft.functions.TrigramCodes.register(spark)
    val r = spark.sql(
      """SELECT size(trigram_codes('ab')) AS short,
        |       size(trigram_codes('aaaa')) AS dedup,
        |       size(trigram_codes('日本語テスト')) AS cjk""".stripMargin).collect()(0)
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 1) // 'aaa' twice, distinct once
    assert(r.getInt(2) == 4) // 6 code points -> 4 trigrams, all distinct
  }

  test("GraftExtensions installs all five custom functions") {
    // ExpressionInfo validates its arguments eagerly, so applying the
    // extensions exercises the whole injectFunction surface (the builders
    // themselves are covered by the equivalence tests above via register()).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("minhash_sig equals the naive per-hash formulation") {
    val h = "CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)"
    val as = Seq(3, 5, 7, 11, 13, 17, 19, 23)
    val naive = as.zipWithIndex.map { case (a, i) =>
      s"array_min(transform(toks, t -> (($h % 2147483647) * $a + $i) % 2147483647))"
    }.mkString("array(", ", ", ") AS ref")
    val df = toksDf.selectExpr("minhash_sig(toks) AS fast", naive)
    assert(df.where(col("fast") =!= col("ref")).count() == 0)
  }
}
