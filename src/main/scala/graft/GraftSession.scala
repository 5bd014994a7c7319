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
      // AQE coalescing: MEASURED r20 and left at the Spark defaults
      // (parallelismFirst=true). Size-based coalescing
      // (parallelismFirst=false, 64m advisory) read 44.3s vs 31.1s on a
      // 20-key subset at sf0.1 — this workload's shuffles are CPU-bound
      // per row (pair verification, codegen'd set merges), so collapsing
      // small-byte partitions starves the compute of cores
      // (q_join_interval 3.0s -> 8.0s on 1 task). parallelismFirst=true
      // is also the scale-correct setting: at 100 TB the advisory size
      // governs anyway (partitions are above it), while small
      // intermediate shuffles keep the cluster busy. Override per run
      // with SPARK_GRAFT_AQE_* if a byte-bound deployment measures
      // otherwise.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
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
