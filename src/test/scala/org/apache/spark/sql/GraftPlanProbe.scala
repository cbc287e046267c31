package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only shim: lives in org.apache.spark.sql to reach the
  * private[sql] Dataset.ofRows, so BoundedWindowSpec can count the rows
  * feeding an arbitrary plan subtree (a partition-less Window's child)
  * without re-deriving the query by hand. */
object GraftPlanProbe {
  def countRows(spark: SparkSession, plan: LogicalPlan): Long =
    classic.Dataset
      .ofRows(spark.asInstanceOf[classic.SparkSession], plan)
      .count()
}
