package graft.operators

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the Deequ-style constraint audit a
  * 100 TB ingest runs before publishing a partition: declared
  * expectations (completeness, uniqueness, referential integrity, value
  * domains, temporal consistency) evaluated into a violations LEDGER,
  * one row per check, not a pass/fail exception. The fixture violates
  * two on purpose-adjacent grounds (negative account balances, lines
  * shipping before their order date), so both branches of the ledger —
  * zero and non-zero — are exercised and oracle-checked.
  *
  * Scale shape (the reason Deequ fuses analyzers): every ROW-LEVEL
  * predicate on a table computes in the table's ONE scan as a
  * conditional sum — 3 scans + 2 keyed joins serve all 8 checks, never
  * a scan per check. The ledger reshape is a map-only explode of the
  * 1-row aggregate cross-joined frames.
  */
object Quality extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_expectations" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      // one scan per table: all its row-level predicates as conditional sums
      val liAgg = li.agg(
        count(lit(1)).as("li_n"),
        sum(when(col("l_quantity").isNull ||
          col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount").isNull ||
          col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("v_disc"))
      val ordAgg = ord.agg(
        count(lit(1)).as("ord_n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
        sum(when(col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("v_status"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_fknull"))
      val custAgg = cust.agg(
        count(lit(1)).as("cust_n"),
        sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("v_bal"))
      // referential integrity: orphans via anti-join (NOT EXISTS
      // semantics — null-safe where NOT IN is not)
      val orphan = li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_orphan"))
      // temporal consistency rides the same keyed join a pipeline
      // already pays for enrichment
      val shipEarly = li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("se_n"),
          sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
            .otherwise(0L)).as("v_ship"))
      liAgg.crossJoin(ordAgg).crossJoin(custAgg)
        .crossJoin(orphan).crossJoin(shipEarly)
        .select(explode(expr {
          // every struct needs identical field names AND nullability for
          // array() to unify them — counts are NOT NULL, sums nullable,
          // so each n_violations is pinned non-null via coalesce
          def row(name: String, n: String, v: String) =
            s"struct('$name' AS check_name, $n AS n_checked, " +
              s"coalesce($v, CAST(0 AS BIGINT)) AS n_violations)"
          "array(" + Seq(
            row("lineitem_qty_range", "li_n", "v_qty"),
            row("lineitem_discount_range", "li_n", "v_disc"),
            row("lineitem_fk_orders", "li_n", "v_orphan"),
            row("lineitem_ship_after_order", "se_n", "v_ship"),
            row("orders_pk_unique", "ord_n", "v_pk"),
            row("orders_status_domain", "ord_n", "v_status"),
            row("orders_custkey_notnull", "ord_n", "v_fknull"),
            row("customer_acctbal_nonneg", "cust_n", "v_bal")).mkString(", ") + ")"
        }).as("c"))
        .select(col("c.check_name"), col("c.n_checked"), col("c.n_violations"),
          (col("c.n_violations") === 0L).as("pass"))
        .orderBy("check_name")
    }),

    // Distribution-drift monitor — the other half of a quality gate: is
    // TODAY's data shaped like the reference window's? Per event type,
    // the total-variation distance between the value distributions of
    // the two halves of the fixture month (split at a declared
    // boundary), over 10 fixed-width buckets. TV = ½ Σ|p_b − q_b| is
    // computed EXACTLY: the numerator Σ_b |c_b·Nr − r_b·Nc| stays in
    // integers (order-independent), and the only floating-point op is
    // ONE final divide by 2·Nc·Nr — bit-identical cross-engine with no
    // rounding boundary, where a PSI/KL ln() would ride libm
    // differences. Scale: one conditional-sum pass builds both halves'
    // histograms in the same (type, bucket) groupBy; the totals join is
    // per-type (tiny); the corpus is scanned once.
    "q_quality_drift" -> ((s, dir) => {
      val split = "TIMESTAMP '2024-01-16 00:00:00'"
      val hist = Tables(s, dir, "events")
        .select(col("event_type"),
          expr(s"(ts < $split)").as("is_ref"),
          least(expr("CAST(floor(value / 50.0D) AS BIGINT)"), lit(9L)).as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("rb"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cb"))
      val totals = hist.groupBy("event_type")
        .agg(sum("rb").as("n_ref"), sum("cb").as("n_cur"))
      hist.join(broadcast(totals), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"),
          sum(abs(col("cb") * col("n_ref") - col("rb") * col("n_cur"))).as("num"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          (expr("CAST(num AS DOUBLE)") /
            (lit(2.0) * expr("CAST(n_cur * n_ref AS DOUBLE)"))).as("tv"),
          (expr("CAST(num AS DOUBLE)") /
            (lit(2.0) * expr("CAST(n_cur * n_ref AS DOUBLE)")) > 0.1).as("drifted"))
        .orderBy("event_type")
    }),

    // The corpus HEALTH REPORT — the one-page summary every dataset
    // card leads with, composed as ONE scan of documents (every metric
    // is a conditional sum or sketchless distinct over the same pass;
    // the token total rides the same scan as a size() — no explode) +
    // a map-only stack into (metric, value) rows. At 100 TB this is
    // the publish-gate report: one corpus read, KB-scale output.
    "q_quality_report" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_docs"),
          big(count_distinct(md5(col("text")))).as("n_distinct_texts"),
          big(count_distinct(col("lang"))).as("n_langs"),
          big(count_distinct(col("source"))).as("n_sources"),
          sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"),
          sum(col("n_chars")).as("total_chars"),
          sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("total_tokens"))
        .selectExpr("stack(7, " +
          "'n_docs', n_docs, " +
          "'n_exact_dup_docs', n_docs - n_distinct_texts, " +
          "'n_langs', n_langs, " +
          "'n_sources', n_sources, " +
          "'n_short_docs', n_short, " +
          "'total_chars', total_chars, " +
          "'total_tokens', total_tokens) AS (metric, value)")
        .orderBy("metric")
    }),
  )

  private def big(c: org.apache.spark.sql.Column) = c.cast("bigint")

  def oracles: Map[String, String] = Map(
    // same one-pass metrics, same stacked shape
    "q_quality_report" -> ("WITH a AS (SELECT " +
      "CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts, " +
      "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
      "CAST(count(DISTINCT source) AS BIGINT) AS n_sources, " +
      "CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short, " +
      "CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
      "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens " +
      "FROM documents) " +
      "SELECT metric, value FROM (" +
      "SELECT 'n_docs' AS metric, n_docs AS value FROM a " +
      "UNION ALL SELECT 'n_exact_dup_docs', n_docs - n_distinct_texts FROM a " +
      "UNION ALL SELECT 'n_langs', n_langs FROM a " +
      "UNION ALL SELECT 'n_sources', n_sources FROM a " +
      "UNION ALL SELECT 'n_short_docs', n_short FROM a " +
      "UNION ALL SELECT 'total_chars', total_chars FROM a " +
      "UNION ALL SELECT 'total_tokens', total_tokens FROM a) " +
      "ORDER BY metric"),
    // identical conditional-sum / anti-join / keyed-join counts; CASTs
    // because DuckDB widens SUM to HUGEINT
    "q_quality_expectations" -> ("WITH li AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty, " +
      "CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc " +
      "FROM lineitem), " +
      "ord AS (SELECT count(*) AS n, count(*) - count(DISTINCT o_orderkey) AS v_pk, " +
      "CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status, " +
      "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_fknull " +
      "FROM orders), " +
      "cust AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_bal FROM customer), " +
      "orph AS (SELECT count(*) AS v FROM lineitem l " +
      "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), " +
      "se AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
      "ledger AS (" +
      "SELECT 'lineitem_qty_range' AS check_name, li.n AS n_checked, li.v_qty AS n_violations FROM li " +
      "UNION ALL SELECT 'lineitem_discount_range', li.n, li.v_disc FROM li " +
      "UNION ALL SELECT 'lineitem_fk_orders', li.n, orph.v FROM li, orph " +
      "UNION ALL SELECT 'lineitem_ship_after_order', se.n, se.v FROM se " +
      "UNION ALL SELECT 'orders_pk_unique', ord.n, ord.v_pk FROM ord " +
      "UNION ALL SELECT 'orders_status_domain', ord.n, ord.v_status FROM ord " +
      "UNION ALL SELECT 'orders_custkey_notnull', ord.n, ord.v_fknull FROM ord " +
      "UNION ALL SELECT 'customer_acctbal_nonneg', cust.n, cust.v_bal FROM cust) " +
      "SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass " +
      "FROM ledger ORDER BY check_name"),

    // identical integer histogram + exact TV numerator; the one divide is
    // the same IEEE op on the same integers
    "q_quality_drift" -> ("WITH h AS (SELECT event_type, " +
      "least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket, " +
      // cb tests ts >= split (not ELSE of ts < split) so a NULL ts lands
      // in NEITHER half on both engines — Spark's when(!is_ref,1)
      // .otherwise(0) yields 0 for NULL, and ELSE-of-< would yield 1 here
      "CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS rb, " +
      "CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS cb " +
      "FROM events GROUP BY 1, 2), " +
      "t AS (SELECT event_type, CAST(sum(rb) AS BIGINT) AS n_ref, " +
      "CAST(sum(cb) AS BIGINT) AS n_cur FROM h GROUP BY event_type), " +
      "d AS (SELECT h.event_type, t.n_ref, t.n_cur, " +
      "CAST(sum(abs(h.cb * t.n_ref - h.rb * t.n_cur)) AS BIGINT) AS num " +
      "FROM h JOIN t ON h.event_type = t.event_type " +
      "GROUP BY h.event_type, t.n_ref, t.n_cur) " +
      "SELECT event_type, n_ref, n_cur, " +
      "CAST(num AS DOUBLE) / (2.0 * CAST(n_cur * n_ref AS DOUBLE)) AS tv, " +
      "CAST(num AS DOUBLE) / (2.0 * CAST(n_cur * n_ref AS DOUBLE)) > 0.1 AS drifted " +
      "FROM d ORDER BY event_type"),
  )
}
