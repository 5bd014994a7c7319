package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Observation API — production data-quality monitoring with ZERO
  * extra passes: named aggregates ride the main action's plan and are
  * collected from the driver after it finishes. This is how a 100 TB
  * cleaning job reports rows-seen / rows-dropped / invalid-rate without
  * a second scan (the same execute-once discipline SyncRunner enforces
  * with accumulators, here in the declarative API).
  */
class ObservationSpec extends AnyFunSuite {
  import TestSpark._

  test("quality metrics ride the cleaning pass and match a direct recompute") {
    val obs = Observation("quality")
    val docs = Tables(spark, sf0001, "documents")
    val cleaned = docs
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(length(col("text")) < 40, 1L).otherwise(0L)).as("too_short"),
        sum(when(col("lang").isin("en", "de", "es", "fr", "zh"), 0L)
          .otherwise(1L)).as("bad_lang"))
      .where(length(col("text")) >= 40 &&
        col("lang").isin("en", "de", "es", "fr", "zh"))
    val kept = cleaned.count()

    val m = obs.get
    val expectSeen = docs.count()
    val expectShort = docs.where(length(col("text")) < 40).count()
    assert(m("rows_seen") == expectSeen)
    assert(m("too_short") == expectShort)
    assert(m("bad_lang") == 0L) // fixture langs are all in the allowlist
    // the observed drop accounting explains the kept count exactly
    assert(kept == expectSeen - expectShort)
  }
}
