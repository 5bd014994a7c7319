package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory for the driver entry points (Verify / Bench).
  *
  * The catalog is a REAL HiveExternalCatalog backed by an embedded Derby
  * metastore in a scratch directory (`spark-hive` + `hive-metastore` +
  * `derby` jars ship with the image) — the same persistent-catalog read
  * path a production Hive-fed pipeline uses (SURVEY.md §2.A,
  * `operators.Warehouse`). Metastore init is lazy: queries that never
  * touch the catalog never pay for it. All scratch state (warehouse,
  * metastore db, derby.log) lands under java.io.tmpdir, never the repo.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder = {
    val scratch = java.nio.file.Files.createTempDirectory("graft_cat")
    // derby.log goes to derby.system.home (defaults to cwd = the repo)
    System.setProperty("derby.system.home", scratch.toString)
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // cluster-wide extension point: custom expressions + the
      // JaccardSizePrefilter optimizer rule, builtin-level
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$scratch/metastore_db;create=true")
  }
}
