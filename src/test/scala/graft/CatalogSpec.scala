package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog under every `saveAsTable`/`spark.table` in this repo is a
  * REAL HiveExternalCatalog (embedded Derby metastore), not the
  * in-memory session catalog — the §2.A "real Hive metastore" row.
  */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("session runs against a Hive external catalog") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    assert(spark.sharedState.externalCatalog.unwrapped.getClass.getName
      .contains("HiveExternalCatalog"))
  }

  test("q_hive_table registers a metastore table readable by an independent session") {
    SparkEntry.queries("q_hive_table")(spark, sf0001).collect()
    // table names embed the fixture dir (operators.Warehouse.msName) so
    // two dirs sharing the JVM-wide catalog can't overwrite each other
    val t = s"graft.${operators.Warehouse.msName("orders_ms", sf0001)}"
    assert(spark.catalog.tableExists(t))
    // a sibling session (fresh SessionState, same metastore) sees the
    // table — the catalog is external to the writing session
    val sibling = spark.newSession()
    assert(sibling.table(t).count() ==
      spark.read.parquet(s"$sf0001/orders.parquet").count())
    // metadata round-trips: provider recorded as parquet
    val desc = spark.sql(s"DESCRIBE EXTENDED $t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("Provider").contains("parquet"), desc.toString.take(500))
  }
}
