package graft.sync

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Index mapping + settings generation from a sync job's document
  * schema — the "templated mapping" upgrade over the reference's
  * dynamic-inference default (SURVEY §1.1: "ES mapping is typically left
  * to dynamic inference"). Dynamic inference guesses field types from
  * the first document it sees (a numeric-looking string becomes `long`,
  * the first null poisons the field); generating the mapping from the
  * job's ANALYZED Spark schema pins every field's type before the first
  * doc arrives, and `dynamic: strict` turns schema drift into a loud
  * indexing error instead of silent index pollution.
  *
  * Type table (Spark → ES field type), keyed off the analyzed type of
  * each [[DocField]] expression plus the field's `quoted` flag (which
  * decides how the value is RENDERED into the doc JSON):
  *
  *  - timestamp / timestamp_ntz / date → `date` (with the explicit
  *    render formats — never ES's own guess);
  *  - quoted strings → `keyword`, or `text` + `.keyword` subfield when
  *    the field NAME says prose (text/body/content/comment/desc/title/
  *    summary — the keyword-vs-text call a mapping author makes from
  *    the column's role);
  *  - unquoted integral → long/integer/short/byte, fractional → double/
  *    float, decimal → `double` (ES has no decimal type — documents may
  *    lose precision past 2^53, the connector's standard trade);
  *  - boolean → `boolean`; binary → `binary`;
  *  - arrays map to their ELEMENT type (every ES field is multi-valued);
  *  - an unquoted string renders as raw JSON inside the doc →
  *    `flattened` (arbitrary sub-object, searchable keys);
  *  - anything else (struct/map rendered by an expression the table
  *    can't classify) fails loudly — an unmapped field must be a config
  *    error, not a dynamically-inferred surprise.
  *
  * The `_meta` section records the `_id` column and the routing
  * convention (60-bit md5 prefix mod shards — [[SyncRunner.docs]]), so
  * an operator reading the index knows how to address and re-route it.
  */
object EsMapping {

  private val ProseName =
    java.util.regex.Pattern.compile(".*(text|body|content|comment|desc|title|summary).*",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  /** ES field type for one doc field, from its analyzed Spark type.
    * Returns the type name plus any extra mapping attributes.
    */
  private[sync] def esType(name: String, dt: DataType, quoted: Boolean): (String, Map[String, String]) =
    dt match {
      case _: TimestampType | _: TimestampNTZType =>
        // Spark's cast-to-string TRIMS trailing fraction zeros, so a
        // sub-second value renders with 1-6 digits ("..00:00:00.5") —
        // each 'S' count is an exact width to the date parser, so every
        // width needs its own alternative or sub-second docs are
        // rejected at index time (invisible on whole-second fixtures)
        ("date", Map("format" ->
          ((1 to 6).map(n => s"yyyy-MM-dd HH:mm:ss.${"S" * n}") ++
            Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd")).mkString("||")))
      case _: DateType => ("date", Map("format" -> "yyyy-MM-dd"))
      case ArrayType(e, _) => esType(name, e, quoted)
      case _: StringType if quoted =>
        if (ProseName.matcher(name).matches()) ("text", Map.empty)
        else ("keyword", Map.empty)
      case _: StringType => ("flattened", Map.empty) // raw JSON embed
      case _ if quoted => ("keyword", Map.empty) // value rendered as a JSON string
      case _: LongType => ("long", Map.empty)
      case _: IntegerType => ("integer", Map.empty)
      case _: ShortType => ("short", Map.empty)
      case _: ByteType => ("byte", Map.empty)
      case _: DoubleType => ("double", Map.empty)
      case _: FloatType => ("float", Map.empty)
      case _: DecimalType => ("double", Map.empty)
      case _: BooleanType => ("boolean", Map.empty)
      case _: BinaryType => ("binary", Map.empty)
      case other => throw new IllegalArgumentException(
        s"doc field '$name': no ES mapping for Spark type ${other.simpleString} — " +
          "project it to a scalar (or quote it) in the job config")
    }

  /** The analyzed Spark type of every doc field — one `selectExpr` over
    * the source row shape, ANALYZED only (no execution, no scan).
    */
  private def fieldTypes(src: org.apache.spark.sql.DataFrame,
      job: SyncJob): Seq[(DocField, DataType)] = {
    val schema = src.selectExpr(job.fields.map(f => s"${f.expr} AS `${f.name}`"): _*).schema
    job.fields.zip(schema.fields.map(_.dataType))
  }

  /** [[forJob]] over an explicit source-shaped DataFrame — the entry for
    * streaming jobs, whose source is the micro-batch itself, not a scan.
    */
  def forSource(src: org.apache.spark.sql.DataFrame, job: SyncJob): String =
    render(fieldTypes(src, job), job)

  /** The index-creation JSON (settings + mappings) for `job`, the body a
    * `PUT /index` takes. Jackson renders it (proper escaping), keys in
    * field order.
    */
  def forJob(spark: SparkSession, sfDir: String, job: SyncJob): String =
    render(fieldTypes(SyncRunner.source(spark, sfDir, job), job), job)

  private def render(types: Seq[(DocField, DataType)], job: SyncJob): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.putObject("settings").putObject("index")
      .put("number_of_shards", job.shards)
      .put("number_of_replicas", 1)
    val mappings = root.putObject("mappings")
    val meta = mappings.putObject("_meta")
    meta.put("job", job.name)
    meta.put("id_column", job.idCol)
    meta.put("routing", "shard = (60-bit md5 prefix of _id) mod number_of_shards")
    // strict: a doc field the mapping doesn't know is an ERROR — the
    // whole point of generating the mapping instead of inferring it
    mappings.put("dynamic", "strict")
    val props = mappings.putObject("properties")
    types.foreach { case (f, dt) =>
      val (t, extra) = esType(f.name, dt, f.quoted)
      val p = props.putObject(f.name)
      p.put("type", t)
      extra.foreach { case (k, v) => p.put(k, v) }
      if (t == "text") // prose stays aggregatable/sortable via the subfield
        p.putObject("fields").putObject("keyword")
          .put("type", "keyword").put("ignore_above", 256)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Write the mapping next to a version's delivered batches (the file a
    * real publisher would PUT as the new index's creation body before
    * bulk-loading it). Returns the path.
    */
  def write(dir: String, mappingJson: String): java.nio.file.Path =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "mapping.json"), mappingJson)
}
