package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's QuerySpec; each entry
  * with a `duckSql` is hash-checked against the DuckDB oracle at sf0.01,
  * the rest get rows-only checks.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    relational.RelationalSuite.specs ++ snap.GraphSuite.specs ++
      ext.TextSuite.specs ++ ext.DedupSuite.specs ++
      ext.SimilaritySuite.specs ++ ext.Multimodal.specs ++ ext.ScaleOps.specs ++
      streaming.Streams.specs ++ sources.SourceFormats.specs ++
      graphx.WeightedPaths.specs ++ sources.ZOrderLayout.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.RelationalSuite.byName("q10_agg_battery")
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.duckSql.map(q.name -> _)).toMap

  /** For each oracle-less key in queries, the named ScalaTest gate that
    * adjudicates it (property/recall/parity). Dumped by Verify as
    * gates.json next to oracle_sql.json. */
  def gates: Map[String, String] =
    allSpecs.flatMap(q => q.gate.map(q.name -> _)).toMap
}
