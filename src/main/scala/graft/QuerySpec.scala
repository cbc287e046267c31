package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query plus (optionally) a DuckDB-dialect oracle equivalent.
  *
  * Contract (driver correctness gate, see SURVEY §2.2 conventions):
  *  - output column NAMES must be identical between `run` and `duckSql`
  *    (the driver sorts columns by name before hashing values);
  *  - every query ends in a total-order ORDER BY;
  *  - double aggregations go through DECIMAL(18,2) casts then a final
  *    DOUBLE cast so both engines do the same exact arithmetic;
  *  - `duckSql == None` → the driver records a weaker rows-only check
  *    (used for ops DuckDB cannot express: LSH, GraphX jobs, …); such
  *    entries MUST name their real correctness gate in `gate` — the
  *    ScalaTest property/recall/parity suite that adjudicates them —
  *    so artifact consumers (Verify dumps `gates.json`, check.py reports
  *    `GATED`) can distinguish "approximate, gated elsewhere, green"
  *    from "broken" (r9 verdict item 5).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    duckSql: Option[String] = None,
    gate: Option[String] = None)
