package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §2). One parquet file per table under the given sf dir.
  *
  * All queries go through here so that scans stay plain
  * `spark.read.parquet` — Catalyst then gets predicate pushdown, column
  * pruning and partition pruning on every plan for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) in parquet, which Spark cannot read as a
    // timestamp; read it as ns-since-epoch LONG and truncate to µs exactly
    // like DuckDB does (integer division — ns values exceed 2^53 so this
    // must never round-trip through DOUBLE).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (used by tests / SQL entry). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
