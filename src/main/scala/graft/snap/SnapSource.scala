package graft.snap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the five SNAP ego-network text formats.
  *
  * Format semantics follow the reference parsers
  * (`/root/reference/src/main.js:143-173,244-247,284-296`): first-space
  * split for `.featnames`/`.feat`, space split for `.edges`/`.egofeat`,
  * tab split for `.circles`, and the trailing-newline guard
  * (`main.js:149,162` — files end with `\n`, the empty tail is skipped).
  *
  * All ten ego networks are read in ONE scan per format (glob + the file
  * path `_metadata` column), so downstream analytics are single jobs over
  * an `ego`-keyed DataFrame instead of a per-network driver loop. Line
  * numbers come from a `wholetext` read + `posexplode`, which is
  * deterministic regardless of partitioning — these files are tiny; the
  * engine's scale surface is parquet, not SNAP text.
  */
object SnapSource {

  /** (ego, line_no, line) for every non-empty line of every `*.ext` file. */
  def lines(spark: SparkSession, dataDir: String, ext: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dataDir/*.$ext")
      .select(
        regexp_extract(col("_metadata.file_path"), s"([0-9]+)\\.$ext$$", 1).as("ego"),
        posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))
      .filter(length(col("line")) > 0)

  /** Raw directed edge lines: (ego, line_no, src, dst). Each undirected
    * friendship appears twice in the file (`main.js:244-247`). */
  def edges(spark: SparkSession, dataDir: String): DataFrame = {
    // split-and-index, exactly the reference's `pair = line.split(' ');
    // pair[0], pair[1]` (main.js:246-247) — a trailing-whitespace or
    // >2-token line must yield the SECOND token, not the last, and a
    // short line must yield NULL like the JS undefined, not an ANSI
    // INVALID_ARRAY_INDEX crash (`get` is 0-based and null-on-OOB).
    val parts = split(col("line"), " ")
    lines(spark, dataDir, "edges")
      .select(col("ego"), col("line_no"),
        get(parts, lit(0)).as("src"),
        get(parts, lit(1)).as("dst"))
  }

  /** (ego, idx, key, value): split at FIRST space; key = full name up to
    * its LAST `;`, value = remainder (`main.js:148-151,190-193`). */
  def featnames(spark: SparkSession, dataDir: String): DataFrame =
    lines(spark, dataDir, "featnames")
      .filter(locate(" ", col("line")) > 0)
      .withColumn("idx", substring_index(col("line"), " ", 1).cast("int"))
      .withColumn("rest", expr("substring(line, locate(' ', line) + 1)"))
      .withColumn("value", substring_index(col("rest"), ";", -1))
      .withColumn("key", expr("substring(rest, 1, length(rest) - length(value) - 1)"))
      .select("ego", "idx", "key", "value")

  /** (ego, node, bits): one row per candidate node; a SUPERSET of the nodes
    * that actually materialize — only `.edges` endpoints become vertices
    * (`main.js:156-166,246-263`). */
  def feat(spark: SparkSession, dataDir: String): DataFrame =
    lines(spark, dataDir, "feat")
      .filter(locate(" ", col("line")) > 0)
      .select(col("ego"),
        substring_index(col("line"), " ", 1).as("node"),
        expr("slice(split(line, ' '), 2, size(split(line, ' ')) - 1)").as("bits"))

  /** (ego, node=ego, bits): single bit row for the ego center itself, no
    * leading id (`main.js:169-173`). */
  def egofeat(spark: SparkSession, dataDir: String): DataFrame =
    lines(spark, dataDir, "egofeat")
      .select(col("ego"), col("ego").as("node"),
        split(col("line"), " ").as("bits"))

  /** (ego, circle, member) from `circleName TAB member...` lines
    * (`main.js:284-296`). Membership filtering against the friend set
    * happens at overlay time, like the JS guard at `main.js:292`. */
  def circles(spark: SparkSession, dataDir: String): DataFrame = {
    val parts = split(col("line"), "\t")
    lines(spark, dataDir, "circles")
      .filter(locate("\t", col("line")) > 0)
      .select(col("ego"),
        element_at(parts, 1).as("circle"),
        explode(slice(parts, lit(2), size(parts) - 1)).as("member"))
      .filter(length(col("member")) > 0)
  }
}
