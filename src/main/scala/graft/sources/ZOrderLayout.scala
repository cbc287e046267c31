package graft.sources

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout — the file-skipping lever
  * for 100 TB tables queried on MORE THAN ONE column: interleaving the
  * bits of two sort keys gives every range-partitioned file a bounded
  * rectangle in BOTH dimensions, so min/max zone maps prune on either
  * predicate (a plain sort bounds only its leading column). The
  * interleave is one codegen'd higher-order-function fold — no UDF, no
  * shuffle beyond the final repartitionByRange write.
  *
  * Production note: 16-bit coordinates cover the fixture's key ranges;
  * at real scale the inputs are first rank-bucketed (ntile or
  * approx_percentile cuts) into 2^16 cells each, which also equalizes
  * skewed dimensions before interleaving.
  */
object ZOrderLayout {

  /** Morton-interleave of the low 16 bits of two BIGINT columns: bit i of
    * x lands at z-bit 2i, bit i of y at 2i+1. */
  def zExpr(x: String, y: String): String =
    s"aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      s"shiftleft(shiftright($x, i) & 1, 2*i) + shiftleft(shiftright($y, i) & 1, 2*i+1))"

  def withZ(df: DataFrame, x: String, y: String): DataFrame =
    df.withColumn("z", expr(zExpr(x, y)))

  /** Write `df` z-ordered on (x, y): range-partition + sort by the
    * interleaved key, so each output file owns a contiguous z range — a
    * bounded rectangle in (x, y) space for the reader's zone maps. */
  def writeZOrdered(df: DataFrame, x: String, y: String, files: Int,
      path: String): Unit =
    withZ(df, x, y)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)

  val specs: Seq[QuerySpec] = Seq(
    // The interleave itself, oracled exactly: per z-region (top bits of
    // the Morton code) both engines must agree on row counts and the
    // min/max bounding box of each dimension — integer bit arithmetic,
    // bit-exact by construction. The bounded per-region boxes ARE the
    // zone-map property the layout exists for; ZOrderSpec additionally
    // proves the file-skipping effect on written parquet.
    QuerySpec("q117_zorder",
      (s, d) => withZ(
        Tables(s, d, "lineitem")
          .select((col("l_partkey") % 65536).as("x"),
            (col("l_suppkey") % 65536).as("y")),
        "x", "y")
        .groupBy(expr("z div 65536").as("z_region"))
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("z_region"),
      Some("WITH c AS (SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y " +
        "FROM lineitem), " +
        "zc AS (SELECT x, y, CAST(list_sum(list_transform(generate_series(0, 15), " +
        "i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1)))) AS BIGINT) AS z " +
        "FROM c) " +
        "SELECT z // 65536 AS z_region, count(*) AS n, " +
        "min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y " +
        "FROM zc GROUP BY 1 ORDER BY z_region"))
  )
}
