package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ViewRewrite
import graft.sync.IncrementalView
import graft.sync.IncrementalView.ViewDef

/** Transparent aggregate routing: a registered view source's aggregates
  * answer from the state table, unregistered or inexpressible shapes
  * keep scanning the base — and the routed answers are value-identical
  * to the scans they replaced.
  */
class ViewRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = Files.createTempDirectory(s"graft_vrw_$tag").toString
    graft.sinks.AliasedIndex.deleteRecursively(Paths.get(root))
    root
  }

  private def orders: DataFrame =
    spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet").select(
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      Dets.money(col("o_totalprice")).as("total"))

  private def planOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString
  // the optimized plan prints relations schema-only (no paths): the state
  // scan is recognizable by its partial columns, the base by its raw ones
  private def routed(df: DataFrame): Boolean = {
    val p = planOf(df); p.contains("mv_n") && !p.contains("o_orderkey")
  }
  private def scansBase(df: DataFrame): Boolean = {
    val p = planOf(df); p.contains("o_orderkey") && !p.contains("mv_n")
  }

  private def collectSorted(df: DataFrame): Seq[Row] =
    df.orderBy(df.columns.map(col): _*).collect().toSeq
  private type Row = org.apache.spark.sql.Row

  private def withView(tag: String, v: ViewDef)(body: String => Unit): Unit = {
    val root = freshRoot(tag)
    IncrementalView.refresh(spark, root, orders, v)
    ViewRewrite.register(s"vrw_$tag", orders, root, v)
    try body(root) finally ViewRewrite.deregister(s"vrw_$tag")
  }

  test("a matching aggregate routes to the state and matches the scan") {
    withView("route", ViewDef(Seq("status", "priority"), "total")) { root =>
      val q = orders.groupBy("status", "priority").agg(
        count(lit(1)).as("n"), sum("total").as("s"),
        min("total").as("lo"), max("total").as("hi"))
      assert(routed(q), s"aggregate did not route to the view:\n${planOf(q)}")

      spark.conf.set("spark.graft.view.rewrite", "false")
      val direct = try collectSorted(q)
      finally spark.conf.unset("spark.graft.view.rewrite")
      assert(collectSorted(q) == direct, "routed answer diverges from the scan")
      assert(q.schema == {
        spark.conf.set("spark.graft.view.rewrite", "false")
        try q.schema finally spark.conf.unset("spark.graft.view.rewrite")
      }, "rewrite changed the result schema")
    }
  }

  test("a TEXTUAL SQL aggregate routes too: the rule works at analysis level") {
    // the reference's jobs are HiveQL strings — routing must apply to
    // spark.sql() text exactly as to the DataFrame DSL, because the rule
    // matches the resolved logical plan (sameResult), not the API used
    withView("sqltext", ViewDef(Seq("status"), "total")) { _ =>
      orders.createOrReplaceTempView("vrw_orders_text")
      try {
        val q = spark.sql(
          "SELECT status, count(*) AS n, sum(total) AS s " +
            "FROM vrw_orders_text GROUP BY status")
        assert(routed(q), planOf(q))
        val direct = orders.groupBy("status")
          .agg(count(lit(1)).as("n"), sum("total").as("s"))
        assert(collectSorted(q) == collectSorted(direct))
      } finally spark.catalog.dropTempView("vrw_orders_text")
    }
  }

  test("a multi-measure view routes aggregates over every measure; others decline") {
    val root = freshRoot("multi")
    val src = orders.withColumn("other", lit(1).cast("decimal(12,2)"))
    val v = ViewDef(Seq("status"), "total", extraMeasures = Seq("other"))
    IncrementalView.refresh(spark, root, src, v)
    ViewRewrite.register("vrw_multi", src, root, v)
    try {
      val q = src.groupBy("status").agg(
        count(lit(1)).as("n"), sum("total").as("st"), sum("other").as("so"),
        avg("total").as("at"), min("other").as("mo"))
      assert(routed(q), planOf(q))
      val direct = src.groupBy("status").agg(
        count(lit(1)).as("n"), sum("total").as("st"), sum("other").as("so"),
        avg("total").as("at"), min("other").as("mo"))
      ViewRewrite.deregister("vrw_multi")
      assert(collectSorted(q) == collectSorted(direct))
      ViewRewrite.register("vrw_multi", src, root, v)
      // an aggregate over a column that is NOT a registered measure
      // declines the whole query (priority is neither key nor measure)
      val bad = src.groupBy("status").agg(max("priority").as("mp"))
      assert(scansBase(bad), planOf(bad))
    } finally ViewRewrite.deregister("vrw_multi")
  }

  test("a key-subset grouping re-aggregates the partials") {
    withView("subset", ViewDef(Seq("status", "priority"), "total")) { root =>
      val q = orders.groupBy("status")
        .agg(count(lit(1)).as("n"), sum("total").as("s"))
      assert(routed(q))
      val got = collectSorted(q)
      spark.conf.set("spark.graft.view.rewrite", "false")
      try assert(got == collectSorted(q))
      finally spark.conf.unset("spark.graft.view.rewrite")
    }
  }

  test("a global aggregate routes, and count stays 0 on a fully retracted view") {
    withView("global", ViewDef(Seq("status"), "total")) { root =>
      val q = orders.agg(count(lit(1)).as("n"), sum("total").as("s"))
      assert(routed(q))
      assert(q.collect().head.getLong(0) == orders.count())
    }
    // retract everything: the state rows all hit mv_n = 0, read() serves
    // zero rows, and the routed global count must COALESCE to 0 — the
    // same answer a scan of the (conceptually emptied) source would give
    val root = freshRoot("empty")
    val v = ViewDef(Seq("status"), "total", retractable = true)
    IncrementalView.refresh(spark, root, orders, v)
    IncrementalView.refreshSigned(spark, root, orders, v, lit(-1L))
    ViewRewrite.register("vrw_empty", orders, root, v)
    try {
      val q = orders.agg(count(lit(1)).as("n"))
      assert(routed(q))
      assert(q.collect().head.getLong(0) == 0L)
    } finally ViewRewrite.deregister("vrw_empty")
  }

  test("avg routes as merged-sum over non-null count, bit-equal to the scan") {
    withView("avg", ViewDef(Seq("status", "priority"), "total")) { root =>
      // exact-key grouping AND key-subset grouping: both serve avg from
      // (mv_s, mv_nm), and both must equal the native Average bit-for-bit
      // (same Divide operand types — see the splice note in ViewRewrite)
      for (q <- Seq(
          orders.groupBy("status", "priority")
            .agg(avg("total").as("a"), count(lit(1)).as("n")),
          orders.groupBy("status").agg(avg("total").as("a")))) {
        assert(routed(q), s"avg did not route:\n${planOf(q)}")
        spark.conf.set("spark.graft.view.rewrite", "false")
        val direct = try (collectSorted(q), q.schema)
        finally spark.conf.unset("spark.graft.view.rewrite")
        assert((collectSorted(q), q.schema) == direct,
          "routed avg diverges from the native Average")
      }
    }
  }

  test("inexpressible shapes decline: the base scan survives untouched") {
    withView("decline", ViewDef(Seq("status"), "total")) { root =>
      // distinct aggregation cannot come from partials — neither on the
      // measure itself nor on any other column
      assert(scansBase(orders.groupBy("status").agg(countDistinct(col("total")))))
      assert(scansBase(orders.groupBy("status").agg(countDistinct(col("priority")))))
      // grouping on a non-key column
      assert(scansBase(orders.groupBy("priority").agg(sum("total"))))
      // aggregating a non-measure column
      assert(scansBase(orders.groupBy("status").agg(max("priority"))))
      // a different source (projection the view was not registered for)
      val other = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .select(col("o_orderstatus").as("status"),
          Dets.money(col("o_totalprice")).as("total"),
          col("o_orderkey"))
      assert(scansBase(other.groupBy("status").agg(sum("total"))))
    }
  }

  test("a key-only WHERE routes: the state is filtered, answers match the scan") {
    withView("where", ViewDef(Seq("status", "priority"), "total")) { root =>
      val shapes = Seq(
        orders.where("status = 'F'").groupBy("priority")
          .agg(count(lit(1)).as("n"), sum("total").as("s")),
        orders.where("status IN ('F', 'O') AND priority != '1-URGENT'")
          .groupBy("status", "priority").agg(sum("total").as("s")),
        // global aggregate over a key slice
        orders.where("status = 'P'").agg(count(lit(1)).as("n")))
      for (q <- shapes) {
        assert(routed(q), s"key-filtered aggregate did not route:\n${planOf(q)}")
        spark.conf.set("spark.graft.view.rewrite", "false")
        val direct = try (collectSorted(q), q.schema)
        finally spark.conf.unset("spark.graft.view.rewrite")
        assert((collectSorted(q), q.schema) == direct,
          "routed key-filtered answer diverges from the scan")
      }
      // a filter touching the MEASURE (or any non-key) must decline —
      // the state cannot re-see which rows passed
      assert(scansBase(orders.where("total > 1000.0").groupBy("status")
        .agg(sum("total").as("s"))))
      assert(scansBase(orders.where("status = 'F' AND total > 1000.0")
        .groupBy("priority").agg(sum("total").as("s"))))
    }
  }

  test("avg on a non-decimal measure declines (native avg runs a double sum)") {
    val root = freshRoot("avgint")
    val src = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select(col("o_orderstatus").as("status"), col("o_orderkey").as("total"))
    val v = ViewDef(Seq("status"), "total")
    IncrementalView.refresh(spark, root, src, v)
    ViewRewrite.register("vrw_avgint", src, root, v)
    try {
      assert(scansBase(src.groupBy("status").agg(avg("total"))))
      assert(routed(src.groupBy("status").agg(sum("total"))))
    } finally ViewRewrite.deregister("vrw_avgint")
  }

  test("min/max on a retractable view decline (the state carries none)") {
    val root = freshRoot("retractmm")
    val v = ViewDef(Seq("status"), "total", retractable = true)
    IncrementalView.refresh(spark, root, orders, v)
    ViewRewrite.register("vrw_retractmm", orders, root, v)
    try {
      assert(scansBase(orders.groupBy("status").agg(min("total"))))
      // but count/sum still route
      assert(routed(orders.groupBy("status").agg(sum("total"))))
    } finally ViewRewrite.deregister("vrw_retractmm")
  }

  test("a join-source view routes; a structurally different join declines") {
    val root = freshRoot("join")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet").select(
      col("o_custkey"), col("o_orderstatus").as("status"),
      Dets.money(col("o_totalprice")).as("total"))
    val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val joined = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("segment", "status", "total")
    val v = ViewDef(Seq("segment", "status"), "total")
    // maintenance = Δ(F ⋈ D) for two fact deltas against the static dim
    IncrementalView.refresh(spark, root,
      o.where("o_custkey % 2 = 0").join(c,
        col("o_custkey") === col("c_custkey"))
        .select("segment", "status", "total"), v)
    IncrementalView.refresh(spark, root,
      o.where("o_custkey % 2 = 1").join(c,
        col("o_custkey") === col("c_custkey"))
        .select("segment", "status", "total"), v)
    ViewRewrite.register("vrw_join", joined, root, v)
    try {
      val q = joined.groupBy("segment").agg(
        count(lit(1)).as("n"), sum("total").as("s"))
      val p = planOf(q)
      assert(p.contains("mv_n") && !p.contains("o_custkey"),
        s"join aggregate did not route:\n$p")
      spark.conf.set("spark.graft.view.rewrite", "false")
      val direct = try collectSorted(q)
      finally spark.conf.unset("spark.graft.view.rewrite")
      assert(collectSorted(q) == direct,
        "routed join answer diverges from re-running the join")
      // an OUTER join over the same tables is a different plan — decline
      val outer = o.join(c, col("o_custkey") === col("c_custkey"), "left")
        .select("segment", "status", "total")
      val po = planOf(outer.groupBy("segment").agg(sum("total")))
      assert(po.contains("o_custkey") && !po.contains("mv_n"),
        s"outer-join aggregate should NOT route:\n$po")
    } finally ViewRewrite.deregister("vrw_join")
  }

  test("the session conf turns routing off without deregistering") {
    withView("conf", ViewDef(Seq("status"), "total")) { root =>
      spark.conf.set("spark.graft.view.rewrite", "false")
      try assert(scansBase(orders.groupBy("status").agg(sum("total"))))
      finally spark.conf.unset("spark.graft.view.rewrite")
      assert(routed(orders.groupBy("status").agg(sum("total"))))
    }
  }
}
