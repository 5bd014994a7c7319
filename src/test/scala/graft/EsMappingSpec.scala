package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{AliasedIndex, Writers}
import graft.sync._

/** Mapping/settings generation from the sync job's analyzed doc schema
  * (the "templated mapping" upgrade over dynamic inference): the
  * generated JSON must type every doc field, carry the id/routing
  * convention, and ROUND-TRIP the delivered documents — every field a
  * delivered doc carries is in the mapping with a JSON-compatible type,
  * and `dynamic: strict` means nothing else may appear.
  */
class EsMappingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val job = SyncJob("es_map", SyncSource.Table("orders"),
    idCol = "o_orderkey",
    fields = Seq(
      DocField("order_id", "o_orderkey", quoted = false),
      DocField("status", "o_orderstatus", quoted = true),
      DocField("priority_text", "o_orderpriority", quoted = true),
      DocField("total", "CAST(o_totalprice AS DECIMAL(12,2))", quoted = false),
      DocField("price", "o_totalprice", quoted = false),
      DocField("ordered_at", "o_orderdate", quoted = true),
      DocField("is_open", "o_orderstatus = 'O'", quoted = false)),
    shards = 4, batchSize = 100)

  test("the type table maps every doc field from its analyzed Spark type") {
    val m = mapper.readTree(EsMapping.forJob(spark, sf0001, job))
    assert(m.at("/settings/index/number_of_shards").asInt == 4)
    assert(m.at("/mappings/dynamic").asText == "strict")
    assert(m.at("/mappings/_meta/id_column").asText == "o_orderkey")
    assert(m.at("/mappings/_meta/routing").asText.contains("md5"))
    val props = m.at("/mappings/properties")
    def typeOf(f: String) = props.at(s"/$f/type").asText
    assert(typeOf("order_id") == "long")
    assert(typeOf("status") == "keyword")
    // name says prose -> text, aggregatable via the keyword subfield
    assert(typeOf("priority_text") == "text")
    assert(props.at("/priority_text/fields/keyword/type").asText == "keyword")
    assert(typeOf("total") == "double") // decimal: ES has no decimal type
    assert(typeOf("price") == "double")
    assert(typeOf("ordered_at") == "date")
    assert(props.at("/ordered_at/format").asText.contains("yyyy-MM-dd HH:mm:ss"))
    // Spark trims trailing fraction zeros, so sub-second values render
    // with 1-6 digits — every width must match one declared alternative
    // (the fixture's whole-second timestamps would hide a miss)
    val fmts = props.at("/ordered_at/format").asText.split("\\|\\|")
    for (probe <- Seq("2024-01-01 00:00:00.5", "2024-01-01 00:00:00.123",
        "2024-01-01 00:00:00.123456", "2024-01-01 00:00:00")) {
      assert(fmts.exists { f =>
        try { java.time.format.DateTimeFormatter.ofPattern(f).parse(probe); true }
        catch { case scala.util.control.NonFatal(_) => false }
      }, s"no declared date format parses '$probe'")
    }
    assert(typeOf("is_open") == "boolean")
    // exactly the doc fields, nothing extra
    assert(props.fieldNames.asScala.toSet == job.fields.map(_.name).toSet)
  }

  test("an unmappable field type fails loudly with the field's name") {
    val bad = job.copy(fields = job.fields :+
      DocField("nested", "named_struct('a', 1)", quoted = false))
    val e = intercept[IllegalArgumentException](EsMapping.forJob(spark, sf0001, bad))
    assert(e.getMessage.contains("nested"), e.getMessage)
  }

  test("published versions carry a mapping that round-trips the delivered docs") {
    val root = tmp("graft_esmap")
    val version = SyncRunner.fullSync(spark, sf0001, job, root)
    // the mapping is part of the version, resolvable through the alias
    val served = AliasedIndex.resolve(root).get
    val mf = Paths.get(served, "mapping.json")
    assert(Files.exists(mf), "every published version must carry mapping.json")
    val m = mapper.readTree(Files.readString(mf))
    val props = m.at("/mappings/properties")
    val stringTyped = Set("keyword", "text", "date")
    // every delivered doc's fields are exactly the mapped fields, and
    // each value's JSON kind agrees with the mapped type — what `dynamic:
    // strict` plus the type table promise a real index
    val state = Writers.foldState(version)
    assert(state.nonEmpty)
    state.values.foreach { doc =>
      val parsed = mapper.readTree(doc)
      assert(parsed.fieldNames.asScala.toSet ==
        props.fieldNames.asScala.toSet, s"doc/mapping field drift in $doc")
      parsed.fields.asScala.foreach { e =>
        val t = props.at(s"/${e.getKey}/type").asText
        if (stringTyped(t)) assert(e.getValue.isTextual, s"${e.getKey}: $t vs $doc")
        else if (t == "boolean") assert(e.getValue.isBoolean)
        else assert(e.getValue.isNumber, s"${e.getKey}: $t vs $doc")
      }
    }
  }
}
