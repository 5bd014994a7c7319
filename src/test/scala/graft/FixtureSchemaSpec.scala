package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Sentinel for the fixture contract the whole suite assumes. The driver
  * REGENERATED /root/testdata once already (2026-08-13: `events.ts` went
  * TIMESTAMP(NANOS) → timestamp[us], dates ms → µs), which silently broke
  * 21 queries and 68 tests through a then-mandatory read workaround. If
  * this spec fails, the fixtures moved again: check the parquet footers,
  * update `graft.Tables` + FIXTURES.md's history note, and do NOT
  * resurrect old workarounds from round notes (SURVEY §7.4 R6 tombstone).
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import TestSpark._

  private def field(table: String, name: String): DataType =
    Tables(spark, sf0001, table).schema(name).dataType

  test("timestamp columns are microsecond TIMESTAMP_NTZ (plain reads)") {
    for ((t, c) <- Seq("events" -> "ts", "orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate"))
      assert(field(t, c) == TimestampNTZType,
        s"$t.$c read as ${field(t, c)}, expected TIMESTAMP_NTZ — the " +
          "fixtures were regenerated again; see FIXTURES.md history note")
  }

  test("key/id/measure columns keep their contracted types") {
    assert(field("events", "event_id") == LongType)
    assert(field("events", "props") == StringType)   // JSON string
    assert(field("orders", "o_totalprice") == DoubleType)
    assert(field("lineitem", "l_linenumber") == IntegerType)
    assert(field("documents", "doc_id") == LongType)
    assert(field("documents", "text") == StringType)
    assert(field("embeddings", "embedding") == ArrayType(FloatType),
      "embeddings.embedding must be list<float> (64-dim) — cast to " +
        "double before arithmetic, per FIXTURES.md")
  }

  test("every fixture table is present and non-empty at sf0.001") {
    val empty = Tables.names.filter(Tables(spark, sf0001, _).isEmpty)
    assert(empty.isEmpty, s"empty/missing fixture tables: $empty")
  }

  test("(user_id, ts) is unique in events — q_ts_resample's pick totality") {
    // q_ts_resample's open/close are min_by/max_by keyed on ts alone; the
    // pick is total (engine-independent) only while no user has two
    // events at one timestamp. A regeneration that introduces ties would
    // silently make the result engine-divergent — fail here instead.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ev = Tables(spark, s"/root/testdata/$sf", "events")
      val n = ev.count()
      val d = ev.select("user_id", "ts").distinct().count()
      assert(n == d, s"$sf events has $n rows but $d distinct (user_id, ts) " +
        "— ts ties exist; q_ts_resample needs a value tiebreaker now")
    }
  }

  test("all three q_agg_theta event types are present") {
    // q_agg_theta crosses the click/purchase/error sketch rows; a fixture
    // regeneration dropping one type would zero the Spark side while the
    // DuckDB oracle still returns its exact-CTE row — a fixture failure
    // masquerading as an engine bug. Pin the presence assumption here.
    val types = Tables(spark, sf0001, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    val missing = Set("click", "purchase", "error") -- types
    assert(missing.isEmpty, s"event types missing from fixtures: $missing")
  }
}
