package graft.operators

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery & CTE surface — the reference's jobs are arbitrary HiveQL
  * strings, so correlated subqueries and WITH clauses are part of the
  * capability contract. Catalyst decorrelates these into joins
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery): the
  * correlated count becomes a left outer aggregate join, the IN becomes a
  * left semi join — i.e. they scale exactly like §2.C joins, no
  * per-row re-execution.
  */
object Subqueries extends QueryFamily {

  private def sql(q: String)(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  private val scalarSql =
    "SELECT c_custkey, c_acctbal, " +
      "(SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders, " +
      "(SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders WHERE o_custkey = c_custkey) AS max_order " +
      "FROM customer ORDER BY c_custkey"

  private val inSql =
    "SELECT p_partkey, p_name FROM part WHERE p_partkey IN " +
      "(SELECT l_partkey FROM lineitem WHERE l_quantity > 45) " +
      "ORDER BY p_partkey"

  private val cteSql =
    "WITH rev AS (SELECT o_custkey, " +
      "SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total FROM orders GROUP BY o_custkey), " +
      "ranked AS (SELECT c_custkey, c_name, CAST(rev.total AS DOUBLE) AS total " +
      "FROM customer JOIN rev ON c_custkey = o_custkey) " +
      "SELECT c_custkey, c_name, total FROM ranked " +
      "WHERE total > 1000000 ORDER BY c_custkey"

  /** Composed TPC-H queries through the textual entry point — the
    * reference's jobs are arbitrary HiveQL, so the proof that the
    * relational core COMPOSES (multi-join + filter + agg + having-subquery
    * + ordered top-k in one statement) matters as much as the per-operator
    * rows. Q1 lives as the flagship `q_agg_hashgroup`; Q5's star shape is
    * `q_join_multiway`. Decimal discipline per SURVEY §7.4: money and
    * discount factors cast to exact decimals before multiply/sum, doubles
    * only at the output boundary, and every ORDER BY carries a key
    * tiebreak so the top-k cut is a total order.
    *
    * Scale: Catalyst plans these exactly like the hand-built DataFrame
    * versions — broadcast for nation/customer-sized dims, shuffled hash
    * or sort-merge for lineitem⋈orders, partial aggregation before every
    * shuffle, TakeOrderedAndProject for the LIMIT (never a global sort).
    */
  private val tpch3Sql =
    "SELECT l_orderkey, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
      "o_orderdate " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' " +
      "AND o_orderdate < TIMESTAMP '1998-03-15' " +
      "AND l_shipdate > TIMESTAMP '1998-03-15' " +
      "GROUP BY l_orderkey, o_orderdate " +
      "ORDER BY revenue DESC, l_orderkey LIMIT 10"

  private val tpch5Sql =
    "SELECT n_name, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name"

  private val tpch10Sql =
    "SELECT c_custkey, c_name, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
      "n_name " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= TIMESTAMP '1997-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-04-01' " +
      "AND l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name, n_name " +
      "ORDER BY revenue DESC, c_custkey LIMIT 20"

  private val tpch18Sql =
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, " +
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem " +
      "GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250) " +
      "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice " +
      "ORDER BY total DESC, o_orderkey LIMIT 100"

  /** TPC-H Q17 (small-quantity-order revenue): the CORRELATED AVG
    * scalar subquery — each lineitem row compares against the average
    * quantity OF ITS OWN PART. Catalyst decorrelates
    * (RewriteCorrelatedScalarSubquery) into one per-part aggregate of
    * lineitem joined back on l_partkey — the whole threshold table is
    * computed once and shuffle-joined, never re-aggregated per row
    * (PlanSpec pins the decorrelation). Fixture part has no
    * p_container, so the selective dim filter is p_size; the final
    * output groups by brand rather than Q17's single global row for a
    * stronger hash surface. Threshold determinism: exact decimal sum
    * cast to double (raw units << 2^53), one IEEE divide and multiply —
    * bit-identical in both engines, so the comparison cut is too.
    */
  private val tpch17Sql =
    "SELECT p_brand, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 " +
      "AS avg_yearly, " +
      "count(*) AS n_lines " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_size <= 20 " +
      "AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * " +
      "(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)) " +
      "FROM lineitem l2 WHERE l2.l_partkey = p_partkey) " +
      "GROUP BY p_brand ORDER BY p_brand"

  /** TPC-H Q20 (potential part promotion), adapted to the fixture schema
    * (no partsupp table — lineitem plays the supply-history role): the
    * NESTED-IN + correlated-HAVING shape. The inner query groups supply
    * history by (supplier, part), keeps only parts whose name matches,
    * and its HAVING compares the group's quantity against TWO correlated
    * scalar subqueries over the same correlation key (the part's
    * distinct-supplier count and total quantity) — "suppliers shipping
    * more than twice a matched part's per-supplier average". A relative
    * threshold, so the query stays selective at every SF where Q20's
    * absolute 0.5x cut would go empty as supplier counts grow. All
    * comparisons are exact decimal*integer — no double boundary.
    * Catalyst: the IN becomes a left semi join, the two correlated
    * aggregates decorrelate (and merge) into per-part aggregate joins.
    */
  private val tpch20Sql =
    "SELECT s_suppkey, s_name, n_name " +
      "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE s_suppkey IN (" +
      "SELECT l_suppkey FROM lineitem l2 " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') " +
      "GROUP BY l_suppkey, l_partkey " +
      "HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) * " +
      "(SELECT count(DISTINCT l_suppkey) FROM lineitem l3 " +
      "WHERE l3.l_partkey = l2.l_partkey) " +
      "> 2 * (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l4 " +
      "WHERE l4.l_partkey = l2.l_partkey)) " +
      "ORDER BY s_suppkey"

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    * fixture schema (no l_receiptdate/l_commitdate — "late" becomes
    * l_shipdate > o_orderdate + 60 days, the fixture's median ship lag,
    * correlating the inner existentials on BOTH l1.l_orderkey and the
    * outer order's o_orderdate): the hardest classic decorrelation —
    * chained EXISTS + NOT-EXISTS against the SAME fact table. "The
    * supplier whose line was the ONLY late one on a multi-supplier
    * finished order": EXISTS(another supplier's line on the order) AND
    * NOT EXISTS(another supplier's LATE line). Catalyst plans the pair
    * as one left-semi and one left-anti join of lineitem against itself
    * on l_orderkey — two shuffles of the fact, zero per-outer-row
    * re-execution, no cartesian (PlanSpec pins all three). s_name is
    * unique per supplier so the (numwait DESC, s_name) top-20 cut is a
    * total order.
    */
  private val tpch21Sql =
    "SELECT s_name, count(*) AS numwait " +
      "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' " +
      "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
      "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
      "AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"

  /** TPC-H Q22 (global sales opportunity), adapted (no c_phone — the
    * country code comes from the real nation dim; "no recent orders"
    * replaces "no orders ever", which the fixture's active customers
    * would make empty): an UNCORRELATED scalar subquery (the global
    * positive-balance average — computed once, broadcast as a literal
    * into the filter) plus a NOT-EXISTS anti join against orders.
    * Decimal discipline: the average is an exact decimal sum divided
    * once in double (the Q17 pattern), so the threshold — and with it
    * the selected set — is bit-identical across engines; the output sum
    * aggregates decimals and casts at the boundary.
    */
  private val tpch22Sql =
    "SELECT n_name AS cntry, count(*) AS numcust, " +
      "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) " +
      "AS DOUBLE) / count(*) FROM customer WHERE c_acctbal > 0.0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderdate >= TIMESTAMP '2000-06-01') " +
      "GROUP BY n_name ORDER BY n_name"

  /** TPC-H Q7 (volume shipping): the DISJUNCTIVE join-pair predicate —
    * ((n1=A and n2=B) or (n1=B and n2=A)) — can't be pushed into either
    * single-table scan; Catalyst keeps it as a join residual on the two
    * broadcast nation joins while the lineitem⋈orders⋈customer spine
    * still shuffles only on its equi-keys. Year extraction is cast to
    * BIGINT for cross-engine type parity.
    */
  private val tpch7Sql =
    "SELECT supp_nation, cust_nation, l_year, " +
      "CAST(SUM(volume) AS DOUBLE) AS revenue " +
      "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
      "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
      "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
      "AND l_shipdate >= TIMESTAMP '1995-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01') shipping " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"

  /** TPC-H Q14 (promo effect): conditional aggregation folded into ONE
    * pass over the join — no second scan for the numerator. Both sums are
    * exact decimals; the ratio is a single double division at the output
    * boundary, bit-identical across engines.
    */
  private val tpch14Sql =
    "SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume END) AS DOUBLE) " +
      "/ CAST(SUM(volume) AS DOUBLE) AS promo_revenue, " +
      "count(*) AS n_lines " +
      "FROM (SELECT p_type, CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1997-09-01' " +
      "AND l_shipdate < TIMESTAMP '1997-10-01') promo"

  /** TPC-H Q8 (national market share): the deepest composition in the
    * suite — an 8-way star (part, supplier, lineitem, orders, customer,
    * nation×2, region) where one nation table scopes the CUSTOMER side
    * through region and the other labels the SUPPLIER side for the share
    * numerator. Every dim broadcasts; lineitem⋈orders is the only big
    * shuffle. Share = conditional decimal sum / total decimal sum, one
    * double division per year.
    */
  private val tpch8Sql =
    "SELECT o_year, " +
      "CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE) " +
      "/ CAST(SUM(volume) AS DOUBLE) AS mkt_share, " +
      "count(*) AS n_lines " +
      "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume, " +
      "n2.n_name AS supp_nation " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1998-01-01') all_nations " +
      "GROUP BY o_year ORDER BY o_year"

  /** TPC-H Q4 (order priority checking), fixture-adapted lateness (the
    * Q21 rule: l_shipdate > o_orderdate + 60 days): a correlated EXISTS
    * whose inner predicate references the OUTER's o_orderdate — Catalyst
    * decorrelates to a left semi join of orders against lineitem on
    * l_orderkey with the lateness comparison as a join residual; the
    * date filter pushes into the orders scan.
    */
  private val tpch4Sql =
    "SELECT o_orderpriority, count(*) AS order_count FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1997-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-04-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
      "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** TPC-H Q11 (important stock), adapted (no partsupp — lineitem is the
    * part-supplier value relation; nation scaled to the fixture's
    * supplier spread): a GROUP BY whose HAVING compares against an
    * UNCORRELATED aggregate of the same filtered join — the global total
    * is computed once (single-partition subquery, broadcast as a
    * literal), never per group. The 0.0002 fraction keeps the cut
    * non-empty at every fixture SF (shares shrink as parts multiply —
    * the same reason TPC-H scales Q11's fraction by 1/SF).
    */
  private val tpch11Sql =
    "SELECT l_partkey AS ps_partkey, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE n_name = 'NATION_3' " +
      "GROUP BY l_partkey " +
      "HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))) > " +
      "(SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 0.0002 " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3') " +
      "ORDER BY value DESC, ps_partkey LIMIT 25"

  /** TPC-H Q13 (customer order-count distribution): the LEFT OUTER join
    * with a predicate on the RIGHT side (filtered inside the join, so
    * order-less customers survive with count 0) feeding two stacked
    * aggregations — the distribution-of-a-distribution shape. count
    * (o_orderkey) not count(*): the outer join's null rows must count 0.
    */
  private val tpch13Sql =
    "SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
      "LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
      "AND o_orderpriority <> '1-URGENT' " +
      "GROUP BY c_custkey) c_orders " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"

  /** TPC-H Q15 (top supplier): a CTE aggregated once and consumed TWICE
    * — as the join input and inside the scalar MAX subquery. Catalyst
    * computes the revenue aggregate and reuses it (ReuseExchange/
    * ReuseSubquery) rather than re-scanning lineitem; equality on the
    * exact-decimal-sum-cast-to-double revenue is bit-stable, and ties
    * (all suppliers at the max) surface deterministically via the
    * s_suppkey order.
    */
  private val tpch15Sql =
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_revenue " +
      "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
      "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue) " +
      "ORDER BY s_suppkey"

  /** TPC-H Q16 (parts/supplier relationship), adapted (lineitem as the
    * part-supplier relation; the complaints exclusion becomes a low-
    * balance exclusion so the NOT IN genuinely filters): NOT IN over an
    * uncorrelated subquery (null-safe anti join) + count(DISTINCT) per
    * group — the distinct-agg-after-anti-join shape.
    */
  private val tpch16Sql =
    "SELECT p_brand, p_type, p_size, " +
      "count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#11' " +
      "AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22) " +
      "AND l_suppkey NOT IN " +
      "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500.0) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20"

  /** TPC-H Q19 (discounted revenue): the OR-of-ANDs join predicate over
    * BOTH sides' columns (brand/size from part, quantity from lineitem)
    * — none of the three disjuncts can be pushed alone, but their union
    * bounds CAN: Catalyst pushes the per-side disjunction envelopes
    * (p_brand IN (..), p_size <= 35, l_quantity BETWEEN 1 AND 40) into
    * the scans and keeps the full disjunction as the equi-join's
    * residual — the classic "derive pushable bounds from a disjunction"
    * test.
    */
  private val tpch19Sql =
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
      "count(*) AS n_lines " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity >= 1 AND l_quantity <= 21) " +
      "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 " +
      "AND l_quantity >= 10 AND l_quantity <= 30) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 " +
      "AND l_quantity >= 20 AND l_quantity <= 40)"

  /** TPC-H Q1 (pricing summary report): the canonical full-scan rollup —
    * eight aggregates (four exact-decimal sums including the two-factor
    * charge, three averages, a count) over one pass of lineitem, grouped
    * by the 6-value (returnflag, linestatus) pair. The flagship
    * `q_agg_hashgroup` covers the family; Q1 belongs in the SQL surface
    * verbatim because it is THE reference point every engine quotes.
    * Averages are exact-decimal-sum / count with ONE double divide at the
    * boundary (never avg() over doubles, whose accumulation order is
    * nondeterministic across partitions). Scale: partial aggregation
    * collapses everything to 6 groups map-side — the shuffle carries
    * O(partitions × 6) rows regardless of SF.
    */
  private val tpch1Sql =
    "SELECT l_returnflag, l_linestatus, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2)) * " +
      "CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price, " +
      "CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' " +
      "GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus"

  /** TPC-H Q2 (minimum cost supplier), adapted (no partsupp — the supply
    * relation is derived: per (part, supplier) the MIN exact-decimal
    * l_extendedprice ever shipped plays ps_supplycost): the CORRELATED
    * MIN over a derived relation that is also the outer join input — the
    * CTE is consumed TWICE, once as the join spine and once inside the
    * correlated scalar, and BOTH consumers re-apply the region scoping.
    * Catalyst decorrelates the min into a per-part aggregate of the
    * region-filtered supply join computed ONCE and joined back on
    * p_partkey (no per-row re-execution — PlanSpec pins it), and reuses
    * the CTE aggregate across the two consumers. The (s_acctbal DESC,
    * n_name, s_name, p_partkey) sort is a total order: supply rows are
    * unique per (part, supplier). Scale: the supply aggregation is the
    * only fact-sized shuffle; everything downstream is dim-sized.
    */
  private val tpch2Sql =
    "WITH supply AS (SELECT l_partkey, l_suppkey, " +
      "MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost " +
      "FROM lineitem GROUP BY l_partkey, l_suppkey) " +
      "SELECT s_acctbal, s_name, n_name, p_partkey, p_name, " +
      "CAST(cost AS DOUBLE) AS supplycost " +
      "FROM part JOIN supply ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE p_size >= 10 AND p_size <= 20 AND p_type = 'STANDARD' " +
      "AND r_name = 'EUROPE' " +
      "AND cost = (SELECT MIN(cost) FROM supply s2 " +
      "JOIN supplier s3 ON s2.l_suppkey = s3.s_suppkey " +
      "JOIN nation n2 ON s3.s_nationkey = n2.n_nationkey " +
      "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
      "WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE') " +
      "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"

  /** TPC-H Q6 (forecasting revenue change): the pure scan-filter-sum —
    * no join, no group; the whole query is one map-side partial sum. Its
    * value as a declared key is the PLAN: all three range predicates
    * (date window, discount band, quantity cap) must reach the parquet
    * scan as pushed filters (PlanSpec pins the pushdown), so at 100 TB
    * the row-group statistics prune most of the table before any CPU.
    * The discount band compares the parquet-stored doubles against
    * double literals — bit-identical semantics in both engines.
    */
  private val tpch6Sql =
    "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
      "count(*) AS n_lines " +
      "FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
      "AND l_shipdate < TIMESTAMP '1998-01-01' " +
      "AND l_discount >= 0.05 AND l_discount <= 0.07 " +
      "AND l_quantity < 24.0"

  /** TPC-H Q9 (product type profit), adapted (no partsupp — the supply
    * cost proxy is 60% of the part's list price: profit per line =
    * extendedprice·(1−discount) − 0.6·p_retailprice·quantity, every
    * factor an exact decimal so the amount — which can go NEGATIVE — is
    * exact in both engines; one double cast per group at the boundary):
    * the 5-way star whose defining features are the LIKE '%...%'
    * dim filter (un-pushable as a range, rides the part scan as a
    * residual), arithmetic spanning BOTH fact and dim columns, and the
    * (nation, year) rollup of the whole join. Scale: part/supplier/
    * nation broadcast; lineitem⋈orders is the only big shuffle.
    */
  private val tpch9Sql =
    "SELECT nation, o_year, " +
      "CAST(SUM(amount) AS DOUBLE) AS sum_profit, count(*) AS n_lines " +
      "FROM (SELECT n_name AS nation, " +
      "CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.0 - l_discount AS DECIMAL(4,2)) - " +
      "CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)) * " +
      "CAST(l_quantity AS DECIMAL(12,2)) AS amount " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%blue%') profit " +
      "GROUP BY nation, o_year ORDER BY nation, o_year DESC"

  /** TPC-H Q12 (shipping modes and order priority), adapted (no
    * l_shipmode/l_commitdate — l_returnflag is the 3-value line class
    * and "late" is the fixture's Q21/Q4 lateness rule l_shipdate >
    * o_orderdate + 60 days, which correlates the filter across BOTH join
    * sides so it can only ride the join as a residual): the
    * conditional-count pivot — one pass over the join, two CASE sums
    * splitting urgent/high priority from the rest. Scale: the date
    * window pushes into the lineitem scan; the join shuffles on
    * orderkey only; partial aggregation collapses to 3 groups map-side.
    */
  private val tpch12Sql =
    "SELECT l_returnflag, " +
      "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' " +
      "OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' " +
      "AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY " +
      "AND l_shipdate >= TIMESTAMP '1997-01-01' " +
      "AND l_shipdate < TIMESTAMP '1998-01-01' " +
      "GROUP BY l_returnflag ORDER BY l_returnflag"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sub_scalar" -> (sql(scalarSql) _),
    "q_sub_in" -> (sql(inSql) _),
    "q_sql_cte" -> (sql(cteSql) _),
    "q_sql_tpch3" -> (sql(tpch3Sql) _),
    "q_sql_tpch5" -> (sql(tpch5Sql) _),
    "q_sql_tpch10" -> (sql(tpch10Sql) _),
    "q_sql_tpch18" -> (sql(tpch18Sql) _),
    "q_sql_tpch17" -> (sql(tpch17Sql) _),
    "q_sql_tpch20" -> (sql(tpch20Sql) _),
    "q_sql_tpch7" -> (sql(tpch7Sql) _),
    "q_sql_tpch14" -> (sql(tpch14Sql) _),
    "q_sql_tpch8" -> (sql(tpch8Sql) _),
    "q_sql_tpch21" -> (sql(tpch21Sql) _),
    "q_sql_tpch22" -> (sql(tpch22Sql) _),
    "q_sql_tpch4" -> (sql(tpch4Sql) _),
    "q_sql_tpch11" -> (sql(tpch11Sql) _),
    "q_sql_tpch13" -> (sql(tpch13Sql) _),
    "q_sql_tpch15" -> (sql(tpch15Sql) _),
    "q_sql_tpch16" -> (sql(tpch16Sql) _),
    "q_sql_tpch19" -> (sql(tpch19Sql) _),
    "q_sql_tpch1" -> (sql(tpch1Sql) _),
    "q_sql_tpch2" -> (sql(tpch2Sql) _),
    "q_sql_tpch6" -> (sql(tpch6Sql) _),
    "q_sql_tpch9" -> (sql(tpch9Sql) _),
    "q_sql_tpch12" -> (sql(tpch12Sql) _),
  )

  // Identical ANSI SQL runs in DuckDB.
  def oracles: Map[String, String] = Map(
    "q_sub_scalar" -> scalarSql,
    "q_sub_in" -> inSql,
    "q_sql_cte" -> cteSql,
    "q_sql_tpch3" -> tpch3Sql,
    "q_sql_tpch5" -> tpch5Sql,
    "q_sql_tpch10" -> tpch10Sql,
    "q_sql_tpch18" -> tpch18Sql,
    "q_sql_tpch17" -> tpch17Sql,
    "q_sql_tpch20" -> tpch20Sql,
    "q_sql_tpch7" -> tpch7Sql,
    "q_sql_tpch14" -> tpch14Sql,
    "q_sql_tpch8" -> tpch8Sql,
    "q_sql_tpch21" -> tpch21Sql,
    "q_sql_tpch22" -> tpch22Sql,
    "q_sql_tpch4" -> tpch4Sql,
    "q_sql_tpch11" -> tpch11Sql,
    "q_sql_tpch13" -> tpch13Sql,
    "q_sql_tpch15" -> tpch15Sql,
    "q_sql_tpch16" -> tpch16Sql,
    "q_sql_tpch19" -> tpch19Sql,
    "q_sql_tpch1" -> tpch1Sql,
    "q_sql_tpch2" -> tpch2Sql,
    "q_sql_tpch6" -> tpch6Sql,
    "q_sql_tpch9" -> tpch9Sql,
    "q_sql_tpch12" -> tpch12Sql,
  )
}
