package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * wrapping a custom [[LogicalPlan]] (graft.plans.AsOfJoin) back into a
  * user-facing DataFrame. Spark's own connectors do exactly this;
  * everything else in the repo stays on public API. (Spark 4 moved the
  * concrete session/dataset types under `sql.classic`; a local session
  * always is one.)
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
