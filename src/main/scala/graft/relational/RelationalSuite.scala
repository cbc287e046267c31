package graft.relational

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The t2 oracle suite from SURVEY §2.2: one query per mandated relational
  * operator category, each expressed as a declarative DataFrame plan (so
  * Catalyst owns pushdown / pruning / join selection / codegen) plus a
  * DuckDB-dialect oracle SQL with identical output columns and ordering.
  *
  * Scale posture: every aggregation here is partial→final hash agg, every
  * small-dim join is broadcastable (nation/region/one-row probes), the big
  * joins (lineitem⋈orders) shuffle on their equi keys only, and no query
  * collects to the driver.
  */
object RelationalSuite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact money arithmetic both engines agree on: 2-dp decimal in, exact
    * decimal sum, final DOUBLE cast (exact for our magnitudes). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val specs: Seq[QuerySpec] = Seq(

    // ---- projection + filter + agg --------------------------------------
    QuerySpec("q01_filter_agg",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 25)
        .groupBy("l_returnflag").agg(count(lit(1)).as("c"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, count(*) AS c FROM lineitem " +
        "WHERE l_quantity > 25 GROUP BY l_returnflag ORDER BY l_returnflag")),

    QuerySpec("q02_multi_filter",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 1000.0)
        .agg(count(lit(1)).as("c")),
      Some("SELECT count(*) AS c FROM orders " +
        "WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0")),

    // ---- joins ----------------------------------------------------------
    QuerySpec("q03_join_broadcast",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("c"))
        .orderBy("n_name"),
      Some("SELECT n_name, count(*) AS c FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")),

    QuerySpec("q04_join_large",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("c"))
        .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, count(*) AS c FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    QuerySpec("q05_self_join",
      (s, d) => {
        val c = t(s, d, "customer").select("c_nationkey", "c_mktsegment")
        c.as("m").join(c.as("n"), Seq("c_nationkey", "c_mktsegment"))
          .agg(count(lit(1)).as("c"))
      },
      Some("SELECT count(*) AS c FROM customer m JOIN customer n " +
        "ON m.c_nationkey = n.c_nationkey AND m.c_mktsegment = n.c_mktsegment")),

    QuerySpec("q06_left_outer",
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .filter(o("o_orderkey").isNull)
          .agg(count(lit(1)).as("c"))
      },
      Some("SELECT count(*) AS c FROM customer c " +
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey " +
        "WHERE o.o_orderkey IS NULL")),

    QuerySpec("q07_semi_join",
      (s, d) => {
        val p = t(s, d, "part")
        val l = t(s, d, "lineitem").filter(col("l_quantity") >= 49)
        p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
          .agg(count(lit(1)).as("c"))
      },
      Some("SELECT count(*) AS c FROM part WHERE p_partkey IN " +
        "(SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)")),

    QuerySpec("q08_anti_join",
      (s, d) => {
        val sup = t(s, d, "supplier"); val l = t(s, d, "lineitem")
        sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_anti")
          .agg(count(lit(1)).as("c"))
      },
      // NOT EXISTS, not NOT IN: left_anti keeps supplier rows even when the
      // probe side contains NULLs, NOT IN would return zero rows.
      Some("SELECT count(*) AS c FROM supplier s WHERE NOT EXISTS " +
        "(SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey)")),

    QuerySpec("q09_range_join",
      (s, d) => {
        val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey")
            && l("l_shipdate") >= o("o_orderdate")
            && l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .agg(count(lit(1)).as("c"))
      },
      Some("SELECT count(*) AS c FROM lineitem JOIN orders " +
        "ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate " +
        "AND l_shipdate < o_orderdate + INTERVAL 90 DAY")),

    // ---- aggregation battery -------------------------------------------
    QuerySpec("q10_agg_battery",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sq"),
          dsum(col("l_extendedprice")).as("sp"),
          round(dsum(col("l_discount")) / count(lit(1)), 4).as("ad"),
          count(lit(1)).as("c"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp, " +
        "round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS ad, " +
        "count(*) AS c FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus")),

    QuerySpec("q11_count_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("u"))
        .orderBy("o_orderstatus"),
      Some("SELECT o_orderstatus, count(DISTINCT o_custkey) AS u " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    QuerySpec("q12_rollup",
      (s, d) => t(s, d, "nation")
        .rollup("n_regionkey", "n_nationkey")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("n_regionkey").asc_nulls_first,
          col("n_nationkey").asc_nulls_first),
      Some("SELECT n_regionkey, n_nationkey, count(*) AS c FROM nation " +
        "GROUP BY ROLLUP(n_regionkey, n_nationkey) " +
        "ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST")),

    // Arbitrary GROUPING SETS (the explicit form — rollup/cube above are
    // its fixed shapes): one aggregation pass expanded to the listed sets,
    // same executor path as q12/q29.
    QuerySpec("q65_grouping_sets",
      (s, d) => t(s, d, "nation")
        .groupingSets(
          Seq(Seq(col("n_regionkey")), Seq(col("n_nationkey"))),
          col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("c"), sum(col("n_nationkey")).as("ksum"))
        .orderBy(col("n_regionkey").asc_nulls_first,
          col("n_nationkey").asc_nulls_first),
      Some("SELECT n_regionkey, n_nationkey, count(*) AS c, " +
        "CAST(sum(n_nationkey) AS BIGINT) AS ksum FROM nation " +
        "GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey)) " +
        "ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST")),

    QuerySpec("q13_collect_maxby",
      // max_by over a struct key: (c_acctbal, c_custkey) is a total order, so
      // ties on acctbal alone can never make the result nondeterministic.
      // DuckDB 1.0 max_by rejects struct keys, so the oracle uses a
      // row_number() tiebreak with identical semantics.
      (s, d) => t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(
          array_join(array_sort(collect_list(col("c_mktsegment"))), ",").as("segs"),
          max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("richest"))
        .orderBy("c_nationkey"),
      Some("SELECT g.c_nationkey AS c_nationkey, g.segs AS segs, r.c_name AS richest " +
        "FROM (SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs " +
        "FROM customer GROUP BY c_nationkey) g " +
        "JOIN (SELECT c_nationkey, c_name, row_number() OVER (PARTITION BY c_nationkey " +
        "ORDER BY c_acctbal DESC, c_custkey DESC) AS rn FROM customer) r " +
        "ON g.c_nationkey = r.c_nationkey AND r.rn = 1 ORDER BY c_nationkey")),

    // ---- window functions ----------------------------------------------
    QuerySpec("q14_window_rank",
      (s, d) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, d, "part")
          .select(col("p_brand"), col("p_name"), col("p_retailprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("p_brand", "rn")
      },
      Some("SELECT p_brand, p_name, p_retailprice, rn FROM " +
        "(SELECT p_brand, p_name, p_retailprice, row_number() OVER " +
        "(PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn " +
        "FROM part) WHERE rn <= 3 ORDER BY p_brand, rn")),

    QuerySpec("q15_window_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"),
              lag(col("o_orderdate").cast("date"), 1).over(w))
              .cast("bigint").as("gap"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("SELECT o_custkey, o_orderkey, " +
        "date_diff('day', CAST(lag(o_orderdate) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE), " +
        "CAST(o_orderdate AS DATE)) AS gap " +
        "FROM orders ORDER BY o_custkey, o_orderkey")),

    QuerySpec("q16_window_frame",
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (11,785 dup
      // pairs at sf0.01), so a ROWS frame straight over lineitem is
      // nondeterministic. Pre-aggregate to the unique grain first: the frame
      // then has a total order in both engines by construction.
      // One data shuffle, not two (r18, guide §2.1): hash-distributing by
      // l_orderkey ALONE up front satisfies both the groupBy's clustering
      // requirement (a partitioning on a subset of the grouping keys
      // colocates every (l_orderkey, l_linenumber) group) and the window's
      // PARTITION BY l_orderkey — the agg→window re-shuffle EnsureRequirements
      // would otherwise insert disappears (plans/r18: 3 Exchange → 2, and the
      // one data exchange now carries raw 20-byte rows once instead of
      // decimal partial-agg buffers plus the re-shuffle).
      (s, d) => {
        val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
          .rowsBetween(-2, Window.currentRow)
        t(s, d, "lineitem")
          .repartition(col("l_orderkey"))
          .groupBy("l_orderkey", "l_linenumber")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
          .select(col("l_orderkey"), col("l_linenumber"),
            sum(col("q")).over(w).cast("double").as("rsum"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("SELECT l_orderkey, l_linenumber, " +
        "CAST(sum(q) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum " +
        "FROM (SELECT l_orderkey, l_linenumber, " +
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS q FROM lineitem GROUP BY 1, 2) " +
        "ORDER BY l_orderkey, l_linenumber")),

    // ---- sort / limit / set ops ----------------------------------------
    QuerySpec("q17_topk",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")),

    QuerySpec("q18_union",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("k"))
        .union(t(s, d, "orders").select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k").limit(50),
      Some("SELECT k FROM (SELECT c_custkey AS k FROM customer " +
        "UNION SELECT o_custkey FROM orders) ORDER BY k LIMIT 50")),

    QuerySpec("q19_intersect",
      (s, d) => t(s, d, "lineitem").select(col("l_partkey").as("k"))
        .intersect(t(s, d, "part").filter(col("p_size") > 25)
          .select(col("p_partkey").as("k")))
        .agg(count(lit(1)).as("c")),
      Some("SELECT count(*) AS c FROM (SELECT l_partkey FROM lineitem " +
        "INTERSECT SELECT p_partkey FROM part WHERE p_size > 25)")),

    QuerySpec("q20_dedup",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey").dropDuplicates()
        .agg(count(lit(1)).as("c")),
      Some("SELECT count(*) AS c FROM " +
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)")),

    // ---- scalar functions ----------------------------------------------
    QuerySpec("q21_strings",
      (s, d) => t(s, d, "part")
        .filter(col("p_name").like("%ol%"))
        .select(upper(substring(col("p_type"), 1, 5)).as("t5"))
        .groupBy("t5").agg(count(lit(1)).as("c"))
        .orderBy("t5"),
      Some("SELECT upper(substring(p_type, 1, 5)) AS t5, count(*) AS c " +
        "FROM part WHERE p_name LIKE '%ol%' GROUP BY t5 ORDER BY t5")),

    QuerySpec("q22_json_date",
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "click")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("c"),
          sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sk"))
        .orderBy("d"),
      // DuckDB sum(BIGINT) widens to HUGEINT; cast back so the driver's
      // typed value-hash sees BIGINT on both sides.
      Some("SELECT CAST(ts AS DATE) AS d, count(*) AS c, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk " +
        "FROM events WHERE event_type = 'click' GROUP BY d ORDER BY d")),

    QuerySpec("q23_asof_maxby",
      // struct(ts, event_id) makes the as-of pick total even when two events
      // share a µs-truncated timestamp (Spark reads ts at µs, DuckDB at ns —
      // a ns-distinct/µs-equal pair would otherwise tie only on one side).
      (s, d) => t(s, d, "events")
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"))
        .orderBy("user_id"),
      Some("SELECT user_id, event_type AS last_type FROM (" +
        "SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn " +
        "FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00') " +
        "WHERE rn = 1 ORDER BY user_id")),

    // ---- array higher-order functions ----------------------------------
    QuerySpec("q24_array_hof",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"),
          round(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("norm2"))
        .orderBy("vec_id").limit(100),
      Some("SELECT vec_id, round(list_sum(list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2 " +
        "FROM embeddings ORDER BY vec_id LIMIT 100")),

    // ---- batch equivalent of streaming tumbling window (S1 ≡ Q25) ------
    QuerySpec("q25_tumbling_batch",
      (s, d) => t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
        .orderBy("window_start", "event_type"),
      Some("SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS window_start, " +
        "event_type, count(*) AS c FROM events " +
        "GROUP BY window_start, event_type ORDER BY window_start, event_type")),

    // ---- vector similarity: exact top-k dot-product for one probe ------
    QuerySpec("q26_cosine_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("ea"))
        val cand = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding").as("eb"))
        cand.crossJoin(broadcast(probe))
          .select(col("vec_id"),
            round(aggregate(
              zip_with(col("ea"), col("eb"),
                (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x), 6).as("dot"))
          .orderBy(col("dot").desc, col("vec_id")).limit(10)
      },
      // list_zip yields UNNAMED structs in DuckDB 1.0 — index numerically.
      Some("SELECT b.vec_id AS vec_id, round(list_sum(list_transform(" +
        "list_zip(a.embedding, b.embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dot " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0 " +
        "ORDER BY dot DESC, vec_id LIMIT 10")),

    // ---- set ops / grouping sets / windows: remaining categories -------
    QuerySpec("q28_except",
      (s, d) => t(s, d, "lineitem").select(col("l_partkey").as("k"))
        .except(t(s, d, "part").filter(col("p_size") > 25)
          .select(col("p_partkey").as("k")))
        .agg(count(lit(1)).as("c")),
      Some("SELECT count(*) AS c FROM (SELECT l_partkey FROM lineitem " +
        "EXCEPT SELECT p_partkey FROM part WHERE p_size > 25)")),

    QuerySpec("q29_cube",
      (s, d) => t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS c FROM lineitem " +
        "GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    QuerySpec("q30_window_analytic",
      // lead + first_value (default frame) + last_value (explicit full
      // frame — the default frame would just echo the current row).
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lead(col("o_orderkey"), 1).over(w).as("next_o"),
            first(col("o_orderkey")).over(w).as("first_o"),
            last(col("o_orderkey")).over(wf).as("last_o"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("SELECT o_custkey, o_orderkey, " +
        "lead(o_orderkey) OVER w AS next_o, " +
        "first_value(o_orderkey) OVER w AS first_o, " +
        "last_value(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_o " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) ORDER BY o_custkey, o_orderkey")),

    QuerySpec("q31_minmax",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"),
          min(col("l_shipdate").cast("date")).as("dmin"),
          max(col("l_shipdate").cast("date")).as("dmax"),
          min(col("l_linestatus")).as("smin"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, min(l_quantity) AS qmin, max(l_quantity) AS qmax, " +
        "min(CAST(l_shipdate AS DATE)) AS dmin, max(CAST(l_shipdate AS DATE)) AS dmax, " +
        "min(l_linestatus) AS smin FROM lineitem GROUP BY l_returnflag " +
        "ORDER BY l_returnflag")),

    QuerySpec("q32_right_outer",
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "right_outer")
          .agg(count(lit(1)).as("c"), count(c("c_custkey")).as("matched"))
      },
      Some("SELECT count(*) AS c, count(c_custkey) AS matched FROM customer c " +
        "RIGHT JOIN orders o ON c.c_custkey = o.o_custkey")),

    QuerySpec("q33_full_outer",
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .agg(count(lit(1)).as("c"),
            count(c("c_custkey")).as("left_present"),
            count(o("o_orderkey")).as("right_present"))
      },
      Some("SELECT count(*) AS c, count(c_custkey) AS left_present, " +
        "count(o_orderkey) AS right_present FROM customer c " +
        "FULL JOIN orders o ON c.c_custkey = o.o_custkey")),

    // HLL sketch — not hash-matchable against an exact engine by design;
    // rows-only here, error bound asserted in RelationalGapsSpec.
    QuerySpec("q34_approx_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey")).as("apx"))
        .orderBy("o_orderstatus"),
      None,
      gate = Some("property:RelationalGapsSpec/within 5% of exact per group")),

    // Mergeable-sketch distinct counting (Apache DataSketches HLL): build
    // one sketch per event_type in a single pass, then UNION the sketches
    // — the 100 TB pattern where per-partition/per-day sketches are
    // persisted once and merged at query time instead of re-scanning
    // history. DuckDB has no DataSketches surface → rows-only gate;
    // RelationalGapsSpec asserts the union of per-group sketches yields
    // the same estimate as a direct whole-corpus sketch (mergeability)
    // and lands within 5% of exact COUNT(DISTINCT).
    QuerySpec("q89_hll_merge",
      (s, d) => {
        val sk = t(s, d, "events").groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        sk.select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"))
          .unionAll(sk
            .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
            .select(lit("__merged__").as("event_type"), col("est")))
          .orderBy("event_type")
      },
      None,
      gate = Some("property:RelationalGapsSpec/sketch union = whole-corpus, within 5%")),

    QuerySpec("q35_map_scalars",
      // Build a MAP per region (map_from_entries), then take it apart
      // again with map_keys/map_values — order-independent outputs so the
      // map-side nondeterminism of collect_list cannot leak out.
      (s, d) => t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(map_from_entries(collect_list(struct(col("n_name"), col("n_nationkey"))))
          .as("m"))
        .select(col("n_regionkey"),
          size(map_keys(col("m"))).as("nk"),
          array_join(array_sort(map_keys(col("m"))), "|").as("names"),
          aggregate(map_values(col("m")), lit(0), (a, x) => a + x).as("ksum"))
        .orderBy("n_regionkey"),
      Some("SELECT n_regionkey, CAST(count(*) AS INTEGER) AS nk, " +
        "string_agg(n_name, '|' ORDER BY n_name) AS names, " +
        "CAST(sum(n_nationkey) AS INTEGER) AS ksum " +
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")),

    // The scale-safe rewrite of q05's self-join count: |group|² summed per
    // key is ONE linear shuffle; the join form is quadratic per group on a
    // skewed low-cardinality key (the canonical 100 TB scale-killer). Same
    // answer, verified against the same oracle value.
    QuerySpec("q36_self_join_linear",
      (s, d) => t(s, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("c")),
      Some("SELECT CAST(sum(n * n) AS BIGINT) AS c FROM " +
        "(SELECT count(*) AS n FROM customer GROUP BY c_nationkey, c_mktsegment)")),

    // Typed Aggregator UDAF (operator row 41): partial+final sum of
    // squares. l_quantity is integer-valued, so the double accumulation is
    // exact and order-independent -> oracle-safe.
    QuerySpec("q37_udaf_sumsq",
      (s, d) => {
        val sumSq = udaf(graft.functions.SumSquares)
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(sumSq(col("l_quantity")).as("sq"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, sum(l_quantity * l_quantity) AS sq " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Native codegen'd Expression registered via SparkSessionExtensions
    // (fnv1a64) — resolved through plain SQL like a built-in. No DuckDB
    // FNV equivalent -> rows-only; cross-checked in Fnv1a64Spec.
    QuerySpec("q38_fnv_hash",
      // selectExpr still resolves fnv1a64 through the extension-registered
      // FunctionRegistry — no temp-view registration needed (re-registering
      // all ten views per call dominated this query's round-2 bench time).
      (s, d) => Tables(s, d, "documents")
        .selectExpr("doc_id", "fnv1a64(text) AS fnv")
        .orderBy("doc_id").limit(100),
      None,
      gate = Some("property:Fnv1a64Spec/reference-vector + interpreted-codegen parity")),

    QuerySpec("q62_window_distribution",
      // Distribution window functions: ntile / percent_rank / cume_dist
      // (ranking beyond row_number; unique order key keeps them total).
      // Compared in integer MICRO-units (floor(x*1e6)), not round(x,6):
      // both engines compute the identical IEEE ratio, but their round()
      // ALGORITHMS differ — Spark HALF_UPs the double's shortest decimal
      // repr, DuckDB rounds the binary value — so a ratio sitting within
      // an ulp of a decimal .5 boundary rounds differently (first hit at
      // sf10: cume_dist = 0.5076875 exactly, 1 value in ~30 M). floor of
      // the same product double is deterministic on both sides.
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            floor(percent_rank().over(w) * lit(1000000)).as("pr"),
            floor(cume_dist().over(w) * lit(1000000)).as("cd"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("SELECT o_orderpriority, o_orderkey, " +
        "ntile(4) OVER w AS quartile, " +
        "CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr, " +
        "CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_orderpriority, o_orderkey")),

    QuerySpec("q63_asof_union",
      // TRUE as-of join via the union + last(IGNORE NULLS) window trick:
      // for every click, the user's most recent signup at-or-before it.
      // One shuffle on user_id, no range join, no per-row probe — the
      // scale-safe as-of pattern (q23 is the max_by flavour).
      (s, d) => {
        val ev = t(s, d, "events")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("unix_millis(ts)").as("signup_ms"), lit(0).as("is_click"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("bigint").as("signup_ms"), lit(1).as("is_click"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("is_click"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        signups.unionByName(clicks)
          .withColumn("last_signup_ms", last(col("signup_ms"), ignoreNulls = true).over(w))
          .filter(col("is_click") === 1)
          .select(col("user_id"), col("event_id"), col("last_signup_ms"))
          .orderBy("user_id", "event_id")
      },
      Some("WITH u AS (" +
        "SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
        "epoch_ms(CAST(ts AS TIMESTAMP)) AS signup_ms, 0 AS is_click " +
        "FROM events WHERE event_type = 'signup' " +
        "UNION ALL SELECT user_id, CAST(ts AS TIMESTAMP), event_id, NULL, 1 " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT user_id, event_id, last_signup_ms FROM (" +
        "SELECT user_id, event_id, is_click, " +
        "last_value(signup_ms IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY ts, is_click, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ms " +
        "FROM u) WHERE is_click = 1 ORDER BY user_id, event_id")),

    QuerySpec("q64_range_frame",
      // Value-based RANGE frame (vs q16's ROWS frame): all orders within
      // 100.0 of the current price — deterministic even under order-key
      // ties, because the frame is defined by values, not positions.
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"))
          .rangeBetween(-100L, 0L)
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_close"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice " +
        "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_close " +
        "FROM orders ORDER BY o_orderpriority, o_orderkey")),

    QuerySpec("q59_cross_join",
      // Plain cross join of two small dims (5 x 25) — the only safe size
      // for an unfiltered cartesian; everything larger goes through q36's
      // linear rewrite or a bounded candidate set.
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .groupBy("r_name").agg(count(lit(1)).as("c"))
        .orderBy("r_name"),
      Some("SELECT r_name, count(*) AS c FROM region CROSS JOIN nation " +
        "GROUP BY r_name ORDER BY r_name")),

    QuerySpec("q55_percentiles",
      // Exact linear-interpolated quantiles (Spark `percentile` ==
      // DuckDB `quantile_cont` semantics). Both l_quantity quantiles come
      // from ONE percentile(col, array(...)) aggregate (r18, guide §4/§5):
      // `percentile` is a TypedImperativeAggregate whose buffer is a
      // value→count OpenHashMap per group — two scalar calls on the same
      // column built, serialized, shuffled and merged that map TWICE.
      // The array form keeps one map and evaluates both percentages off
      // the same sorted counts (identical interpolation arithmetic, so
      // values are bit-equal — oracle hash unchanged). Spark `[i]` array
      // access is 0-based.
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.5D, 0.95D))").as("pq"),
          expr("round(percentile(l_extendedprice, 0.25), 6)").as("price_p25"))
        .select(col("l_returnflag"),
          expr("round(pq[0], 6)").as("p50"),
          expr("round(pq[1], 6)").as("p95"),
          col("price_p25"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS p50, " +
        "round(quantile_cont(l_quantity, 0.95), 6) AS p95, " +
        "round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // The sketch flavour of q55 — approx_percentile (Greenwald-Khanna
    // summary, mergeable partials) is the quantile path that survives
    // scales where exact per-group sorted materialization won't. No cross-
    // engine oracle (sketch internals differ); the rank-error bound vs the
    // exact percentile is asserted in RelationalGapsSpec, like q34's HLL.
    QuerySpec("q66_approx_percentiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50"),
          expr("approx_percentile(l_quantity, 0.95, 1000)").as("p95"),
          expr("approx_percentile(l_extendedprice, 0.25, 1000)").as("price_p25"))
        .orderBy("l_returnflag"),
      None,
      gate = Some("property:RelationalGapsSpec/rank-error bound vs exact quantile")),

    QuerySpec("q56_reproducible_sample",
      // Deterministic ~10% sample via an md5 hash gate — the reproducible
      // corpus-sampling primitive (same rows on any engine/cluster, no
      // RNG state), unlike TABLESAMPLE which is engine-dependent.
      (s, d) => t(s, d, "orders")
        .filter(conv(expr("substring(md5(CAST(o_orderkey AS STRING)), 1, 4)"), 16, 10)
          .cast("int") % 100 < 10)
        .agg(count(lit(1)).as("c"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sp")),
      Some("SELECT count(*) AS c, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp FROM orders " +
        "WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INT) % 100 < 10")),

    QuerySpec("q57_funnel",
      // Classic event-funnel: users whose first signup precedes their
      // first click precedes their first purchase. One shuffle on user_id.
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .agg(count(lit(1)).as("users"),
          sum(when(col("t_signup") < col("t_click")
            && col("t_click") < col("t_purchase"), 1L).otherwise(0L)).as("converted")),
      Some("SELECT count(*) AS users, CAST(sum(CASE WHEN t_signup < t_click " +
        "AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS converted FROM (" +
        "SELECT user_id, " +
        "min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t_signup, " +
        "min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click, " +
        "min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase " +
        "FROM events GROUP BY user_id)")),

    QuerySpec("q58_pivot",
      // Pivot with an explicit value list (the scale-safe form: implicit
      // pivot first collects distinct values to the driver).
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .select(col("l_returnflag"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_o"), lit(0L)).as("n_o"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f, " +
        "CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // CDC log compaction — the "latest snapshot" materialization: one
    // surviving row per key (most recent event, second-granularity ts
    // with event_id tie-break — µs-vs-ns engine truncation makes raw-ts
    // ordering non-portable). rn = 1 compiles to WindowGroupLimit, so
    // compaction keeps a 1-row heap per key instead of sorting history.
    QuerySpec("q86_latest_snapshot",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(expr("date_trunc('second', ts)").desc, col("event_id").desc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), sum("user_id").as("user_checksum"))
          .orderBy("event_type")
      },
      Some("WITH r AS (SELECT user_id, event_type, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY date_trunc('second', CAST(ts AS TIMESTAMP)) DESC, " +
        "event_id DESC) AS rn FROM events) " +
        "SELECT event_type, count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS user_checksum " +
        "FROM r WHERE rn = 1 GROUP BY event_type ORDER BY event_type")),

    // SCD2 interval build — turn the change log into validity ranges:
    // each state is valid from its event until the key's next event
    // (NULL = still current). One window pass; emitted as corpus totals
    // (interval count, open rows, closed validity seconds).
    QuerySpec("q87_scd2_intervals",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        t(s, d, "events")
          .withColumn("sec", expr("unix_timestamp(date_trunc('second', ts))"))
          .withColumn("next_sec", lead("sec", 1).over(w))
          .agg(count(lit(1)).as("n_intervals"),
            sum(when(col("next_sec").isNull, 1L).otherwise(0L)).as("n_open"),
            sum(col("next_sec") - col("sec")).as("valid_seconds"))
      },
      Some("WITH x AS (SELECT user_id, event_id, " +
        "epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS sec FROM events), " +
        "i AS (SELECT sec, lead(sec) OVER " +
        "(PARTITION BY user_id ORDER BY sec, event_id) AS next_sec FROM x) " +
        "SELECT count(*) AS n_intervals, " +
        "CAST(sum(CASE WHEN next_sec IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open, " +
        "CAST(sum(next_sec - sec) AS BIGINT) AS valid_seconds FROM i")),

    // Binned interval join — the NO-equi-key range join done scalably.
    // A naive `p.dt BETWEEN iv.s AND iv.s+7d` join has no equi condition,
    // so Spark plans a nested-loop/cartesian — O(n·m) and a non-starter
    // at 100 TB. The standard rewrite: quantize time into fixed bins,
    // EXPLODE each interval into the (≤2) bins it overlaps, bin each
    // probe row, equi-join on the bin, then refine with the exact range
    // predicate. Each qualifying pair meets in exactly one bin (the
    // probe's), so no dedup is needed. Probe side is pre-aggregated to
    // per-date counts first — partial aggregation before the join, the
    // same at any scale. PlanSpec pins the no-nested-loop shape.
    QuerySpec("q90_binned_interval_join",
      (s, d) => {
        val binDays = 7L
        val iv = t(s, d, "orders").select(col("o_orderdate")).distinct()
          .withColumn("sday", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
          .withColumn("bin", explode(expr(
            s"sequence(sday div $binDays, (sday + ${binDays - 1}) div $binDays)")))
        val probe = t(s, d, "lineitem").groupBy("l_shipdate")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("pday", datediff(col("l_shipdate"), lit("1970-01-01")).cast("long"))
          .withColumn("bin", expr(s"pday div $binDays"))
        iv.join(probe, iv("bin") === probe("bin")
            && probe("pday") >= iv("sday") && probe("pday") < iv("sday") + binDays)
          .agg(count(lit(1)).as("n_pairs"),
            sum("cnt").as("n_items"),
            sum(col("pday") * col("cnt")).as("checksum"))
      },
      Some("WITH iv AS (SELECT DISTINCT o_orderdate AS s FROM orders), " +
        "p AS (SELECT l_shipdate AS dt, count(*) AS cnt FROM lineitem GROUP BY 1) " +
        "SELECT count(*) AS n_pairs, CAST(sum(cnt) AS BIGINT) AS n_items, " +
        "CAST(sum(datediff('day', DATE '1970-01-01', dt) * cnt) AS BIGINT) AS checksum " +
        "FROM iv JOIN p ON p.dt >= iv.s AND p.dt < iv.s + INTERVAL 7 DAY")),

    // Fuzzy entity resolution — blocked edit-distance matching: pairs are
    // generated ONLY within a cheap blocking key (first name token), so
    // the quadratic levenshtein work is per-block, not corpus-wide — the
    // blocking discipline every 100 TB entity-resolution pass lives by.
    // Per-distance pair counts + id checksums: all-integer, bit-exact.
    // (The fixture even contains exact-duplicate p_names: dist 0.)
    QuerySpec("q93_fuzzy_match",
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_partkey") < 5000)
          .select(col("p_partkey"), col("p_name"),
            substring_index(col("p_name"), " ", 1).as("blk"))
        val a = p.select(col("blk"), col("p_partkey").as("a_id"), col("p_name").as("a_name"))
        val b = p.select(col("blk"), col("p_partkey").as("b_id"), col("p_name").as("b_name"))
        a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
          // (A length-difference prune before levenshtein was measured
          // SLOWER here: blocked pairs already sit at dist <= 6, so the
          // extra filter discards almost nothing while breaking the
          // join's codegen pipeline. At a scale where blocks are looser,
          // re-add `abs(length(a)-length(b)) <= tau` — it lower-bounds
          // the edit distance, so it never changes results.)
          .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
          .filter(col("dist") <= 4)
          .groupBy("dist")
          .agg(count(lit(1)).as("n_pairs"), sum(col("a_id") + col("b_id")).as("checksum"))
          .orderBy("dist")
      },
      Some("WITH p AS (SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk " +
        "FROM part WHERE p_partkey < 5000), " +
        "pr AS (SELECT CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist, " +
        "a.p_partkey + b.p_partkey AS ab FROM p a JOIN p b " +
        "ON a.blk = b.blk AND a.p_partkey < b.p_partkey) " +
        "SELECT dist, count(*) AS n_pairs, CAST(sum(ab) AS BIGINT) AS checksum " +
        "FROM pr WHERE dist <= 4 GROUP BY dist ORDER BY dist")),

    // Time-series gap fill — regularize an irregular event stream onto an
    // hourly grid and carry the last observation forward (the resample +
    // ffill every metrics/feature pipeline runs). The grid is a bounded
    // sequence() explode per key (global hour bounds broadcast from a
    // 1-row aggregate, never a driver-side collect); the fill is one
    // last(IGNORE NULLS) window pass per key. Hourly sums are decimal so
    // the forward-filled checksum is exact on both engines.
    QuerySpec("q94_gap_fill",
      (s, d) => {
        val hours = expr("unix_micros(ts) div 3600000000")
        val ev = t(s, d, "events").filter(col("user_id") < 20)
          .withColumn("h", hours)
        val bounds = t(s, d, "events")
          .agg(min(hours).as("h0"), max(hours).as("h1"))
        val hourly = ev.groupBy("user_id", "h")
          .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).as("v"))
        val grid = ev.select("user_id").distinct()
          .crossJoin(broadcast(bounds))
          .withColumn("h", explode(expr("sequence(h0, h1)")))
          .select("user_id", "h")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("h")
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("n").isNotNull, 1L).otherwise(0L)).as("n_obs"),
            sum(when(col("n").isNull && col("fv").isNotNull, 1L).otherwise(0L))
              .as("n_gap_filled"),
            sum(col("fv")).cast("double").as("fill_checksum"))
          .orderBy("user_id")
      },
      Some("WITH allh AS (SELECT epoch_us(CAST(ts AS TIMESTAMP))//3600000000 AS h FROM events), " +
        "b AS (SELECT min(h) AS h0, max(h) AS h1 FROM allh), " +
        "e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP))//3600000000 AS h, value " +
        "FROM events WHERE user_id < 20), " +
        "hourly AS (SELECT user_id, h, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,6))) AS v FROM e GROUP BY 1, 2), " +
        "u AS (SELECT DISTINCT user_id FROM e), " +
        "grid AS (SELECT u.user_id, g.h FROM u CROSS JOIN " +
        "(SELECT unnest(generate_series(h0, h1)) AS h FROM b) g), " +
        "j AS (SELECT grid.user_id, grid.h, hourly.n, hourly.v FROM grid " +
        "LEFT JOIN hourly USING (user_id, h)), " +
        "f AS (SELECT user_id, h, n, last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv FROM j) " +
        "SELECT user_id, count(*) AS n_hours, " +
        "CAST(sum(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_obs, " +
        "CAST(sum(CASE WHEN n IS NULL AND fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_filled, " +
        "CAST(sum(fv) AS DOUBLE) AS fill_checksum " +
        "FROM f GROUP BY 1 ORDER BY user_id")),

    // UNPIVOT/melt — the inverse of q58's pivot: four metric columns
    // become (metric, value) rows in one narrow pass (no union of four
    // scans). Values are cast to decimal BEFORE the melt so the per-metric
    // sums are exact on both engines.
    QuerySpec("q95_unpivot",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_quantity").cast("decimal(18,6)").as("l_quantity"),
          col("l_extendedprice").cast("decimal(18,6)").as("l_extendedprice"),
          col("l_discount").cast("decimal(18,6)").as("l_discount"),
          col("l_tax").cast("decimal(18,6)").as("l_tax"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
        .orderBy("metric"),
      Some("SELECT metric, count(*) AS n, CAST(sum(value) AS DOUBLE) AS total FROM (" +
        "SELECT CAST(l_quantity AS DECIMAL(18,6)) AS l_quantity, " +
        "CAST(l_extendedprice AS DECIMAL(18,6)) AS l_extendedprice, " +
        "CAST(l_discount AS DECIMAL(18,6)) AS l_discount, " +
        "CAST(l_tax AS DECIMAL(18,6)) AS l_tax FROM lineitem) " +
        "UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax)) " +
        "GROUP BY metric ORDER BY metric")),

    // Ordered string aggregation (LISTAGG) — collect_list is unordered by
    // shuffle arrival, so the deterministic form is sort-then-join; the
    // DuckDB side uses string_agg's ORDER BY clause directly.
    QuerySpec("q96_string_agg",
      (s, d) => t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("names"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey"),
      Some("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names, " +
        "count(*) AS n FROM nation GROUP BY 1 ORDER BY 1")),

    // Recursive CTE (Spark 4's WITH RECURSIVE) — bounded-depth BFS over an
    // edge list derived from orders, entirely in SQL: each iteration is a
    // distributed frontier⋈edges join + DISTINCT, so per-level state is
    // one row per reached node, never per path (the DISTINCT inside the
    // recursive term is what keeps a depth-4 traversal from exploding
    // combinatorially at 100 TB). Final min(dist) group-by collapses
    // re-discoveries to first-visit level. This is the no-GraphX scale
    // path for fixed-depth reachability.
    QuerySpec("q97_recursive_cte",
      (s, d) => {
        // UnionLoop re-executes the whole recursive-term plan every
        // iteration, including any CTE it references — so the edge list
        // (scan + DISTINCT shuffle) would be recomputed per level.
        // Materialize it ONCE with an eager localCheckpoint: iterations
        // then read cached blocks, which is exactly the "stage the edge
        // list to a temp table first" discipline a 100 TB traversal uses.
        s.sql(s"""SELECT DISTINCT o_custkey % 1000 AS src,
            o_orderkey % 1000 AS dst
          FROM parquet.`$d/orders.parquet` WHERE o_totalprice > 150000""")
          .localCheckpoint()
          .createOrReplaceTempView("q97_edges")
        s.sql("""
        WITH RECURSIVE hops(node, dist) AS (
          SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
          UNION ALL
          SELECT DISTINCT e.dst AS node, h.dist + 1 AS dist
          FROM hops h JOIN q97_edges e ON e.src = h.node WHERE h.dist < 4
        )
        SELECT dist, count(*) AS n_nodes, sum(node) AS checksum
        FROM (SELECT node, min(dist) AS dist FROM hops GROUP BY node)
        GROUP BY dist ORDER BY dist""")
      },
      Some("WITH RECURSIVE e AS (SELECT DISTINCT o_custkey % 1000 AS src, " +
        "o_orderkey % 1000 AS dst FROM orders WHERE o_totalprice > 150000), " +
        "hops(node, dist) AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS dist " +
        "UNION ALL SELECT DISTINCT e.dst AS node, h.dist + 1 AS dist " +
        "FROM hops h JOIN e ON e.src = h.node WHERE h.dist < 4) " +
        "SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS checksum " +
        "FROM (SELECT node, min(dist) AS dist FROM hops GROUP BY node) " +
        "GROUP BY dist ORDER BY dist")),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — per-region top-2
    // nations by customer count. Catalyst decorrelates the lateral into a
    // join + per-key window top-k (no per-row re-execution); ties broken
    // by n_name so the top-2 set is total-ordered on both engines.
    QuerySpec("q98_lateral_topk",
      (s, d) => s.sql(s"""
        SELECT r.r_name, t.n_name, t.c
        FROM parquet.`$d/region.parquet` r,
        LATERAL (
          SELECT n.n_name, count(*) AS c
          FROM parquet.`$d/nation.parquet` n
          JOIN parquet.`$d/customer.parquet` cu ON cu.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name ORDER BY c DESC, n.n_name LIMIT 2
        ) t
        ORDER BY r.r_name, t.c DESC, t.n_name"""),
      Some("SELECT r.r_name, t.n_name, t.c FROM region r, " +
        "LATERAL (SELECT n.n_name, count(*) AS c FROM nation n " +
        "JOIN customer cu ON cu.c_nationkey = n.n_nationkey " +
        "WHERE n.n_regionkey = r.r_regionkey " +
        "GROUP BY n.n_name ORDER BY c DESC, n.n_name LIMIT 2) t " +
        "ORDER BY r.r_name, t.c DESC, t.n_name")),

    // Correlated scalar subqueries — orders priced above 1.5x their own
    // customer's average. Catalyst decorrelates both subqueries into one
    // aggregate-then-join (not a per-row loop). The predicate is cleared
    // of division: price > 1.5*sum/cnt  ⇔  2*price*cnt > 3*sum, with
    // decimal cents and bigint counts, so the boundary is exact integer
    // arithmetic on both engines (no double-rounding tie risk).
    QuerySpec("q99_correlated_scalar",
      (s, d) => s.sql(s"""
        SELECT o_orderpriority, count(*) AS c
        FROM parquet.`$d/orders.parquet` o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
              (SELECT count(*) FROM parquet.`$d/orders.parquet` i
               WHERE i.o_custkey = o.o_custkey)
            > 3 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                   FROM parquet.`$d/orders.parquet` i
                   WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      Some("SELECT o_orderpriority, count(*) AS c FROM orders o " +
        "WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 * " +
        "(SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) " +
        "> 3 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i " +
        "WHERE i.o_custkey = o.o_custkey) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys
    // match each other instead of vanishing, the semantics every
    // nullable-dimension join needs. Still hash-partitionable (NULL is
    // one key) AND broadcastable, so it plans exactly like an equi-join.
    // Shape (r13): fact × nullable-DIM — the realistic null-safe join; a
    // fact × fact many-to-many on a fixed 5-value key (the pre-r13 form)
    // is intrinsically quadratic in the copy factor and can never pass a
    // scale gate — at 100 TB one side of a low-cardinality null-safe
    // join must be a broadcastable dim, which is what this declares.
    QuerySpec("q100_null_safe_join",
      (s, d) => {
        val cu = t(s, d, "customer")
          .select(expr("nullif(c_nationkey % 5, 0)").as("k"))
        val dim = t(s, d, "nation")
          .select(expr("nullif(n_nationkey % 5, 0)").as("nk"))
        cu.join(broadcast(dim), col("k") <=> col("nk"))
          .groupBy("k").agg(count(lit(1)).as("n_pairs"))
          .orderBy(asc_nulls_first("k"))
      },
      Some("SELECT a.k, count(*) AS n_pairs FROM " +
        "(SELECT nullif(c_nationkey % 5, 0) AS k FROM customer) a JOIN " +
        "(SELECT nullif(n_nationkey % 5, 0) AS k FROM nation) b " +
        "ON a.k IS NOT DISTINCT FROM b.k " +
        "GROUP BY a.k ORDER BY a.k NULLS FIRST")),

    // VARIANT semi-structured shredding (Spark 4) — JSON parsed once into
    // the binary VARIANT encoding, then typed-path extraction with
    // variant_get: the open-schema ingestion shape (logs/API payloads)
    // where parsing happens at scan and every downstream access is a
    // cheap binary probe, not a re-parse. The JSON is built in-query from
    // integer/string columns so both engines see byte-identical input;
    // the oracle shreds the same paths with DuckDB's JSON extraction.
    QuerySpec("q101_variant_shred",
      (s, d) => t(s, d, "orders")
        .withColumn("js", concat(
          lit("{\"k\":"), col("o_orderkey"),
          lit(",\"s\":\""), col("o_orderstatus"),
          lit("\",\"y\":"), year(col("o_orderdate")),
          lit(",\"tags\":["), col("o_custkey") % 7, lit(","),
          length(col("o_orderpriority")), lit("]}")))
        .withColumn("v", expr("parse_json(js)"))
        .select(
          expr("variant_get(v, '$.y', 'int')").as("y"),
          expr("variant_get(v, '$.s', 'string')").as("st"),
          expr("variant_get(v, '$.tags[0]', 'bigint')").as("t0"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy("y", "st")
        .agg(count(lit(1)).as("n"), sum("t0").as("tag_sum"),
          sum("k").as("key_sum"))
        .orderBy("y", "st"),
      Some("WITH j AS (SELECT '{\"k\":' || CAST(o_orderkey AS VARCHAR) || " +
        "',\"s\":\"' || o_orderstatus || '\",\"y\":' || " +
        "CAST(year(o_orderdate) AS VARCHAR) || ',\"tags\":[' || " +
        "CAST(o_custkey % 7 AS VARCHAR) || ',' || " +
        "CAST(length(o_orderpriority) AS VARCHAR) || ']}' AS js FROM orders) " +
        "SELECT CAST(json_extract(js, '$.y') AS INT) AS y, " +
        "json_extract_string(js, '$.s') AS st, count(*) AS n, " +
        "CAST(sum(CAST(json_extract(js, '$.tags[0]') AS BIGINT)) AS BIGINT) AS tag_sum, " +
        "CAST(sum(CAST(json_extract(js, '$.k') AS BIGINT)) AS BIGINT) AS key_sum " +
        "FROM j GROUP BY 1, 2 ORDER BY 1, 2")),

    // Time-interval RANGE frame — the rolling-window-by-TIME aggregate
    // (q64's RANGE frame ranges over a numeric key): each event sees the
    // count/sum of its user's events in the trailing hour, frame bounds
    // resolved against the timestamp ORDER BY with a calendar interval.
    // Peers (equal ts) share a frame on both engines, so the result is
    // deterministic without a tie-break column. Decimal sums, per-user
    // partitions — no global sort.
    QuerySpec("q108_time_range_frame",
      (s, d) => {
        val over = "OVER (PARTITION BY user_id ORDER BY ts " +
          "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        t(s, d, "events").filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("value").cast("decimal(18,6)").as("v"))
          .select(col("user_id"), col("event_id"),
            expr(s"count(*) $over").as("n_1h"),
            expr(s"CAST(sum(v) $over AS DOUBLE)").as("v_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "CAST(value AS DECIMAL(18,6)) AS v FROM events WHERE user_id < 10) " +
        "SELECT user_id, event_id, count(*) OVER w AS n_1h, " +
        "CAST(sum(v) OVER w AS DOUBLE) AS v_1h FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id")),

    // Cohort retention — the product-analytics staple: users grouped by
    // signup week, activity counted per week offset. Both engines
    // truncate to Monday weeks and compute the offset as day-difference
    // div 7 over the TRUNCATED dates (exact integers — DuckDB's
    // datediff('week') counts boundary crossings, which only agrees
    // because both sides are pre-truncated; day div 7 avoids relying on
    // that). One shuffle on user_id for the cohort join, one for the
    // (cohort, offset) rollup.
    QuerySpec("q109_cohort_retention",
      (s, d) => {
        val ev = t(s, d, "events")
        val cohorts = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(date_trunc("week", min("ts")).as("cohort"))
        ev.join(cohorts, "user_id")
          .select(col("user_id"), col("cohort"),
            expr("CAST(datediff(date_trunc('week', ts), cohort) div 7 AS BIGINT)").as("offs"))
          .filter(col("offs") >= 0).distinct()
          .groupBy(col("cohort").cast("date").as("cohort_week"), col("offs"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_week", "offs")
      },
      Some("WITH s AS (SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        "a AS (SELECT DISTINCT e.user_id, s.cohort, " +
        "datediff('day', s.cohort, date_trunc('week', CAST(e.ts AS TIMESTAMP))) // 7 AS offs " +
        "FROM events e JOIN s ON e.user_id = s.user_id) " +
        "SELECT CAST(cohort AS DATE) AS cohort_week, CAST(offs AS BIGINT) AS offs, " +
        "count(*) AS n_active FROM a WHERE offs >= 0 " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    // Clickstream path mining — top session-opening event paths: batch
    // gaps-and-islands sessionization (the same 10-minute-gap semantics
    // the streaming suite gates), then each session's first 5 events in
    // (ts, event_id) order become a '>'-joined path string. Ordered
    // concat uses the q96 sort-then-join discipline (collect_list order
    // is shuffle-arrival); sorting structs by the unique per-session rn
    // makes the path deterministic on both engines.
    QuerySpec("q110_session_paths",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val sess = t(s, d, "events")
          .withColumn("prev", lag("ts", 1).over(w))
          // µs-exact gap test (casting timestamps to long truncates to
          // seconds and would break sessions the oracle's INTERVAL
          // comparison keeps together).
          .withColumn("brk",
            when(col("prev").isNull ||
              expr("unix_micros(ts) - unix_micros(prev) >= 600000000"), 1L)
              .otherwise(0L))
          .withColumn("sess", sum("brk").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val rn = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "sess").orderBy("ts", "event_id")
        sess.withColumn("rn", row_number().over(rn)).filter(col("rn") <= 5)
          .groupBy("user_id", "sess")
          .agg(concat_ws(">", expr(
            "transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path")).limit(20)
      },
      Some("WITH o AS (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id " +
        "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events), " +
        "m AS (SELECT user_id, event_type, event_id, ts, sum(CASE WHEN prev IS NULL " +
        "OR ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM o), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess " +
        "ORDER BY ts, event_id) AS rn FROM m), " +
        "p AS (SELECT user_id, sess, string_agg(event_type, '>' ORDER BY rn) AS path " +
        "FROM r WHERE rn <= 5 GROUP BY user_id, sess) " +
        "SELECT path, count(*) AS n_sessions FROM p GROUP BY path " +
        "ORDER BY n_sessions DESC, path LIMIT 20")),

    // Markov transition matrix over the event stream — consecutive
    // event-type bigrams per user with exact counts and a rounded
    // row-probability (integer ratio, deterministic): the behavioral
    // model every "what happens after a click" analysis starts from.
    // One window pass + one hash aggregate.
    QuerySpec("q111_markov_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = t(s, d, "events")
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
        pairs.withColumn("p", round(col("n").cast("double") / sum("n").over(tot), 6))
          .orderBy("prev_type", "next_type")
      },
      Some("WITH o AS (SELECT user_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id " +
        "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type FROM events), " +
        "c AS (SELECT prev_type, event_type AS next_type, count(*) AS n FROM o " +
        "WHERE prev_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, next_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6) AS p " +
        "FROM c ORDER BY prev_type, next_type")),

    // Statistical aggregates (corr / covariance / linear regression) with
    // an EXACT oracle: both engines first reduce each group to integer
    // moments — quantity is integral, price is 2-dp, so n, Σx, Σy(cents),
    // Σx², Σxy, Σy² are exact DECIMAL(38,0) sums (BIGINT Σy² would
    // overflow past ~1e5 rows/group under ANSI mode — the q103 lesson) —
    // then apply the IDENTICAL closed-form double expression to the same
    // exact inputs, so corr/slope/intercept are bit-identical without any
    // rounding fudge. One partial→final hash aggregate; the builtin
    // streaming corr/regr_* (different merge order, ~1e-12 drift) are
    // cross-checked against these exact values in RelationalGapsSpec.
    QuerySpec("q112_stats_moments",
      (s, d) => {
        val xi = "CAST(l_quantity AS BIGINT)"
        val yi = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            expr(s"sum($xi)").as("sx"),
            expr(s"sum($yi)").as("sy"),
            expr(s"sum(CAST($xi * $xi AS DECIMAL(38,0)))").as("sxx"),
            expr(s"sum(CAST($xi * $yi AS DECIMAL(38,0)))").as("sxy"),
            expr(s"sum(CAST($yi * $yi AS DECIMAL(38,0)))").as("syy"))
          .select(col("l_returnflag"), col("n"),
            expr("CAST(n AS DOUBLE)").as("nd"),
            expr("CAST(sx AS DOUBLE)").as("sxd"),
            expr("CAST(sy AS DOUBLE)").as("syd"),
            expr("CAST(sxx AS DOUBLE)").as("sxxd"),
            expr("CAST(sxy AS DOUBLE)").as("sxyd"),
            expr("CAST(syy AS DOUBLE)").as("syyd"))
          .select(col("l_returnflag"), col("n"),
            expr("sxd / nd").as("mean_qty"),
            expr("syd / nd").as("mean_price_cents"),
            expr("(nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd))")
              .as("corr_qty_price"),
            expr("(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)")
              .as("slope_cents_per_unit"),
            expr("(syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd")
              .as("intercept_cents"))
          .orderBy("l_returnflag")
      },
      Some("WITH m AS (SELECT l_returnflag, count(*) AS n, " +
        "sum(xi) AS sx, sum(yi) AS sy, " +
        "sum(CAST(xi * xi AS DECIMAL(38,0))) AS sxx, " +
        "sum(CAST(xi * yi AS DECIMAL(38,0))) AS sxy, " +
        "sum(CAST(yi * yi AS DECIMAL(38,0))) AS syy FROM (" +
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xi, " +
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yi " +
        "FROM lineitem) GROUP BY l_returnflag), " +
        "md AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd, " +
        "CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, " +
        "CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, " +
        "CAST(syy AS DOUBLE) AS syyd FROM m) " +
        "SELECT l_returnflag, n, sxd / nd AS mean_qty, " +
        "syd / nd AS mean_price_cents, " +
        "(nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) AS corr_qty_price, " +
        "(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope_cents_per_unit, " +
        "(syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd AS intercept_cents " +
        "FROM md ORDER BY l_returnflag")),

    // BPE merge-step candidate counting — the inner loop of tokenizer
    // training: count every adjacent token pair corpus-wide; the top pair
    // is what byte-pair encoding would merge next. One explode (n-1 pairs
    // per doc) into one hash aggregate — only the pair strings shuffle,
    // and at scale the explode fuses into the scan stage (no intermediate
    // token-array materialization). Docs with <2 tokens are filtered on
    // BOTH engines before the index walk: Spark's sequence(1,0) DESCENDS
    // while DuckDB's generate_series(1,0) is empty (the q107/q73 corner).
    QuerySpec("q113_bpe_pairs",
      (s, d) => t(s, d, "documents")
        .select(expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
        .filter(expr("size(toks) >= 2"))
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(30),
      Some("WITH tk AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks " +
        "FROM documents), " +
        "p AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS pair FROM tk WHERE len(toks) >= 2) " +
        "SELECT pair, count(*) AS c FROM p GROUP BY pair " +
        "ORDER BY c DESC, pair LIMIT 30")),

    // Data-quality profiling (the Deequ-style "profile this table" pass a
    // pipeline runs before training): per-column non-null count, exact
    // distinct count, min/max — ONE scan producing one wide aggregate row,
    // unpivoted to (column, metrics) rows via stack(). The multiple exact
    // COUNT(DISTINCT)s expand the scan 6× before the partial aggregate
    // (Catalyst's Expand); that is the honest cost of exact profiling —
    // the approximate path at 100 TB is q133_profile_approx (same shape,
    // per-column HLL, no expand). Min/max stringify through type-stable
    // casts (decimal for the double, date for the timestamp) so both
    // engines format identically.
    QuerySpec("q115_profile",
      (s, d) => t(s, d, "orders")
        .agg(
          count(col("o_orderkey")).as("nn1"), countDistinct(col("o_orderkey")).as("nd1"),
          min(col("o_orderkey")).cast("string").as("mn1"), max(col("o_orderkey")).cast("string").as("mx1"),
          count(col("o_custkey")).as("nn2"), countDistinct(col("o_custkey")).as("nd2"),
          min(col("o_custkey")).cast("string").as("mn2"), max(col("o_custkey")).cast("string").as("mx2"),
          count(col("o_orderstatus")).as("nn3"), countDistinct(col("o_orderstatus")).as("nd3"),
          min(col("o_orderstatus")).as("mn3"), max(col("o_orderstatus")).as("mx3"),
          count(col("o_totalprice")).as("nn4"), countDistinct(col("o_totalprice")).as("nd4"),
          min(col("o_totalprice")).cast("decimal(18,2)").cast("string").as("mn4"),
          max(col("o_totalprice")).cast("decimal(18,2)").cast("string").as("mx4"),
          count(col("o_orderdate")).as("nn5"), countDistinct(col("o_orderdate")).as("nd5"),
          min(col("o_orderdate")).cast("date").cast("string").as("mn5"),
          max(col("o_orderdate")).cast("date").cast("string").as("mx5"),
          count(col("o_orderpriority")).as("nn6"), countDistinct(col("o_orderpriority")).as("nd6"),
          min(col("o_orderpriority")).as("mn6"), max(col("o_orderpriority")).as("mx6"))
        .select(expr("stack(6, " +
          "'o_orderkey', nn1, nd1, mn1, mx1, " +
          "'o_custkey', nn2, nd2, mn2, mx2, " +
          "'o_orderstatus', nn3, nd3, mn3, mx3, " +
          "'o_totalprice', nn4, nd4, mn4, mx4, " +
          "'o_orderdate', nn5, nd5, mn5, mx5, " +
          "'o_orderpriority', nn6, nd6, mn6, mx6) " +
          "AS (col_name, n_nonnull, n_distinct, min_s, max_s)"))
        .orderBy("col_name"),
      Some("SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS n_nonnull, " +
        "count(DISTINCT o_orderkey) AS n_distinct, CAST(min(o_orderkey) AS VARCHAR) AS min_s, " +
        "CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM orders " +
        "UNION ALL SELECT 'o_custkey', count(o_custkey), count(DISTINCT o_custkey), " +
        "CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', count(o_orderstatus), count(DISTINCT o_orderstatus), " +
        "min(o_orderstatus), max(o_orderstatus) FROM orders " +
        "UNION ALL SELECT 'o_totalprice', count(o_totalprice), count(DISTINCT o_totalprice), " +
        "CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR), " +
        "CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders " +
        "UNION ALL SELECT 'o_orderdate', count(o_orderdate), count(DISTINCT o_orderdate), " +
        "CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR), " +
        "CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) FROM orders " +
        "UNION ALL SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority), " +
        "min(o_orderpriority), max(o_orderpriority) FROM orders " +
        "ORDER BY col_name")),

    // RFM customer segmentation — recency/frequency/monetary quartiles
    // via ntile(4), the classic behavioral-cohort builder. Quartile
    // ORDER BYs carry the customer key as a tie-break (ntile ties are
    // otherwise arrival-order — the q13 lesson), monetary sums are exact
    // decimals, and the per-segment revenue goes through the same
    // decimal→double cast on both engines. Shape: one groupBy(custkey),
    // then three DISTRIBUTED exact ranks over the 1-row-per-customer
    // aggregate (DistributedRank: range-shuffle + per-partition sort +
    // broadcast offset rebase — no single-task global window even when
    // the customer dim is itself huge), ntile(4) recovered from the exact
    // rank by the standard first-(n mod 4)-buckets-take-ceil(n/4)
    // formula, one final hash agg. Bit-identical to the window ntile the
    // oracle runs.
    QuerySpec("q116_rfm",
      (s, d) => {
        val perCust = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(max("o_orderdate").as("r"),
            count(lit(1)).as("f"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("m"))
        val ranked = Seq(
          ("r_rank", Seq(col("r").desc, col("o_custkey").asc)),
          ("f_rank", Seq(col("f").desc, col("o_custkey").asc)),
          ("m_rank", Seq(col("m").desc, col("o_custkey").asc)))
          .foldLeft(perCust) { case (df, (out, srt)) =>
            DistributedRank.withGlobalRank(df, out, srt: _*) }
        // ntile(k) from the exact 1-based rank: the first n%k buckets
        // hold n div k + 1 rows, the rest n div k (Spark and DuckDB both
        // implement this SQL-standard fill). Integer arithmetic only.
        def ntile4(rank: String): Column = expr(
          s"CAST(IF($rank <= (nc % 4) * ((nc div 4) + 1), " +
            s"($rank - 1) div ((nc div 4) + 1) + 1, " +
            s"(nc % 4) + ($rank - (nc % 4) * ((nc div 4) + 1) - 1) div (nc div 4) + 1) AS INT)")
        ranked
          .crossJoin(broadcast(perCust.agg(count(lit(1)).as("nc"))))
          .withColumn("r_q", ntile4("r_rank"))
          .withColumn("f_q", ntile4("f_rank"))
          .withColumn("m_q", ntile4("m_rank"))
          .groupBy(expr("CAST(r_q * 100 + f_q * 10 + m_q AS INT)").as("segment"))
          .agg(count(lit(1)).as("n_customers"),
            sum("m").cast("double").as("revenue"))
          .orderBy("segment")
      },
      Some("WITH pc AS (SELECT o_custkey, max(o_orderdate) AS r, count(*) AS f, " +
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m FROM orders GROUP BY o_custkey), " +
        "q AS (SELECT o_custkey, m, " +
        "ntile(4) OVER (ORDER BY r DESC, o_custkey) AS r_q, " +
        "ntile(4) OVER (ORDER BY f DESC, o_custkey) AS f_q, " +
        "ntile(4) OVER (ORDER BY m DESC, o_custkey) AS m_q FROM pc) " +
        "SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS segment, " +
        "count(*) AS n_customers, CAST(sum(m) AS DOUBLE) AS revenue FROM q " +
        "GROUP BY 1 ORDER BY segment")),

    // TPC-H Q5-shaped star join — the multi-way join-ordering workout:
    // fact⋈fact (lineitem⋈orders⋈customer) shuffles on equi keys, the
    // supplier join carries the extra c_nationkey = s_nationkey locality
    // predicate, and the two dims (nation, region-filtered-to-ASIA)
    // broadcast. Catalyst owns the order; PlanSpec pins ≥2 broadcast
    // joins and no nested-loop/cartesian anywhere. Revenue is exact
    // decimal l_extendedprice*(1-l_discount) on both engines.
    QuerySpec("q118_star_join",
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        t(s, d, "lineitem")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")),

    // Deterministic train/val/test split — the corpus partitioning every
    // training run starts from: an md5 hash gate (q56's engine-agnostic
    // primitive) assigns 96/2/2% buckets, so the SAME document lands in
    // the SAME split on any engine, any cluster size, any day. Verified
    // by per-split counts, exact char sums, and source coverage.
    QuerySpec("q119_train_split",
      (s, d) => t(s, d, "documents")
        .withColumn("split",
          when(conv(expr("substring(md5(CAST(doc_id AS STRING)), 1, 4)"), 16, 10)
            .cast("int") % 100 < 96, "train")
            .when(conv(expr("substring(md5(CAST(doc_id AS STRING)), 1, 4)"), 16, 10)
              .cast("int") % 100 < 98, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          countDistinct("source").as("n_sources"))
        .orderBy("split"),
      Some("WITH b AS (SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bk " +
        "FROM documents) " +
        "SELECT CASE WHEN bk < 96 THEN 'train' WHEN bk < 98 THEN 'val' ELSE 'test' END AS split, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "count(DISTINCT source) AS n_sources FROM b " +
        "GROUP BY 1 ORDER BY split")),

    // Volume-anomaly detection over the event stream — hourly counts
    // z-scored against the corpus mean/std. The moments (n, Σc, Σc²) are
    // exact integers, and mean/std/z are the IDENTICAL double expression
    // on both engines (division and sqrt are IEEE correctly rounded), so
    // even the flag boundary is deterministic — no rounding fudge. Shape:
    // one hash agg to hours, tiny moment aggregate broadcast back, linear
    // scan over the hour table. The monitoring query every ingestion
    // pipeline runs.
    QuerySpec("q121_anomaly_hours",
      (s, d) => {
        val hours = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("c"))
        // Σc² as DECIMAL(38,0): hourly counts at real scale square past
        // BIGINT under ANSI mode (the q103/q112 overflow discipline).
        val m = hours.agg(count(lit(1)).as("n"), sum("c").as("sc"),
          sum(expr("CAST(c * c AS DECIMAL(38,0))")).as("ss"))
        hours.crossJoin(broadcast(m))
          .select(col("hour"), col("c"),
            expr("(CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / " +
              "sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) / " +
              "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))").as("z"))
          .filter(abs(col("z")) > 2.5)
          .orderBy("hour")
      },
      Some("WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, " +
        "count(*) AS c FROM events GROUP BY 1), " +
        "m AS (SELECT count(*) AS n, sum(c) AS sc, sum(CAST(c * c AS DECIMAL(38,0))) AS ss FROM h), " +
        "z AS (SELECT hour, c, " +
        "(CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / " +
        "sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS z " +
        "FROM h CROSS JOIN m) " +
        "SELECT hour, c, z FROM z WHERE abs(z) > 2.5 ORDER BY hour")),

    // Chi-square contingency table (market segment × order priority) —
    // the association test behind every "is this mix shifted" check.
    // Observed counts, marginals and N are exact integers; expected and
    // per-cell contribution are the identical double expression on both
    // engines. Deliberately NO global chi² sum: summing irrational
    // doubles is order-sensitive across partitions, so the per-cell
    // table (which the analyst wants anyway) is the deterministic
    // contract. Shape: one fact join + hash agg, marginals broadcast.
    QuerySpec("q122_chisq_contingency",
      (s, d) => {
        val obs = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "o_orderpriority")
          .agg(count(lit(1)).as("obs"))
        val row = obs.groupBy("c_mktsegment").agg(sum("obs").as("row_n"))
        val colm = obs.groupBy("o_orderpriority").agg(sum("obs").as("col_n"))
        val tot = obs.agg(sum("obs").as("n"))
        obs.join(broadcast(row), "c_mktsegment")
          .join(broadcast(colm), "o_orderpriority")
          .crossJoin(broadcast(tot))
          .select(col("c_mktsegment"), col("o_orderpriority"), col("obs"),
            expr("CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)").as("expected"),
            expr("(CAST(obs AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) * " +
              "(CAST(obs AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) / " +
              "(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))").as("contrib"))
          .orderBy("c_mktsegment", "o_orderpriority")
      },
      Some("WITH obs AS (SELECT c_mktsegment, o_orderpriority, count(*) AS obs " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "r AS (SELECT c_mktsegment, sum(obs) AS row_n FROM obs GROUP BY 1), " +
        "c AS (SELECT o_orderpriority, sum(obs) AS col_n FROM obs GROUP BY 1), " +
        "t AS (SELECT sum(obs) AS n FROM obs) " +
        "SELECT obs.c_mktsegment, obs.o_orderpriority, obs.obs, " +
        "CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE) AS expected, " +
        "(CAST(obs AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(obs AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) / " +
        "(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) AS contrib " +
        "FROM obs JOIN r ON obs.c_mktsegment = r.c_mktsegment " +
        "JOIN c ON obs.o_orderpriority = c.o_orderpriority CROSS JOIN t " +
        "ORDER BY 1, 2")),

    // Robust outlier detection via median absolute deviation — the
    // quality gate that survives heavy-tailed data where q121's z-score
    // doesn't. Median and MAD are exact: quantities are integral so both
    // quantile interpolations land on exact halves (q55 established the
    // percentile == quantile_cont equivalence), deviations are exact
    // binary fractions, and the 3×MAD comparison is exact arithmetic on
    // them. Shape: two grouped quantile passes (group median broadcast
    // back between them) + one conditional aggregation.
    QuerySpec("q124_mad_outliers",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("med"))
        val dev = li.join(broadcast(med), "l_returnflag")
          .withColumn("dev", abs(col("l_quantity") - col("med")))
        val mad = dev.groupBy("l_returnflag")
          .agg(max("med").as("med"), expr("percentile(dev, 0.5)").as("mad"))
        dev.drop("med").join(broadcast(mad), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(max("med").as("med"), max("mad").as("mad"),
            sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("WITH med AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med " +
        "FROM lineitem GROUP BY 1), " +
        "dev AS (SELECT l.l_returnflag, abs(l.l_quantity - m.med) AS dev, m.med " +
        "FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag), " +
        "mad AS (SELECT l_returnflag, max(med) AS med, quantile_cont(dev, 0.5) AS mad " +
        "FROM dev GROUP BY 1) " +
        "SELECT d.l_returnflag, max(m.med) AS med, max(m.mad) AS mad, " +
        "CAST(sum(CASE WHEN d.dev > m.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "count(*) AS n FROM dev d JOIN mad m ON d.l_returnflag = m.l_returnflag " +
        "GROUP BY 1 ORDER BY 1")),

    // ANSI ordered-set aggregates: PERCENTILE_DISC / PERCENTILE_CONT via
    // WITHIN GROUP (ORDER BY ...) plus the median() shorthand — the
    // discrete quantile returns an ACTUAL data value (smallest value at
    // CDF ≥ p, identical ANSI semantics in DuckDB's quantile_disc), so
    // on integral quantities everything here is exact.
    QuerySpec("q125_percentile_disc",
      (s, d) => s.sql(s"""
        SELECT l_returnflag,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_p50_disc,
          percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS qty_p90_disc,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_p50_cont,
          median(l_quantity) AS qty_median
        FROM parquet.`$d/lineitem.parquet`
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("SELECT l_returnflag, " +
        "quantile_disc(l_quantity, 0.5) AS qty_p50_disc, " +
        "quantile_disc(l_quantity, 0.9) AS qty_p90_disc, " +
        "quantile_cont(l_quantity, 0.5) AS qty_p50_cont, " +
        "median(l_quantity) AS qty_median " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr) — the
    // user-extension path that beats even typed Scala UDFs: the body
    // INLINES into the Catalyst plan (full codegen, pushdown through it),
    // there is no serialization boundary at all. The scalar returns
    // DECIMAL so the aggregate stays exact; the oracle re-derives with
    // the inlined expression — which is precisely what Catalyst executes.
    QuerySpec("q126_sql_udf",
      (s, d) => {
        s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE) " +
          "RETURNS DECIMAL(23,4) RETURN CAST(p AS DECIMAL(18,2)) * " +
          "(CAST(1.00 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))")
        s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_is_bulk(q DOUBLE) " +
          "RETURNS BOOLEAN RETURN q >= 30")
        s.sql(s"""
          SELECT l_returnflag,
            count_if(graft_is_bulk(l_quantity)) AS n_bulk,
            CAST(sum(graft_disc_price(l_extendedprice, l_discount)) AS DOUBLE) AS revenue
          FROM parquet.`$d/lineitem.parquet`
          GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("SELECT l_returnflag, CAST(count_if(l_quantity >= 30) AS BIGINT) AS n_bulk, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Running distinct users — the growth-dashboard staple, computed the
    // way it scales: "distinct users up to day d" is NOT a per-day
    // distinct over a growing set (quadratic) but first-touch attribution
    // (one groupBy user) + daily new-user counts + a cumulative window
    // over the tiny day-grain table. Exact integers end to end.
    QuerySpec("q127_running_users",
      (s, d) => {
        val first = t(s, d, "events")
          .groupBy("user_id").agg(date_trunc("day", min("ts")).as("first_day"))
        first.groupBy(col("first_day").cast("date").as("day"))
          .agg(count(lit(1)).as("new_users"))
          .withColumn("cum_users", sum("new_users").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("day")
      },
      Some("WITH f AS (SELECT user_id, CAST(date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS DATE) AS day " +
        "FROM events GROUP BY user_id), " +
        "dly AS (SELECT day, count(*) AS new_users FROM f GROUP BY day) " +
        "SELECT day, new_users, CAST(sum(new_users) OVER " +
        "(ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users " +
        "FROM dly ORDER BY day")),

    // Spark 4 SQL SCRIPTING — a procedural BEGIN…END block with a
    // session variable computed by a subquery, then used as a predicate:
    // the "compute a corpus statistic, then filter by it" pattern (q83's
    // declarative form) written the way a SQL-first user migrating a
    // stored procedure would. The script's last statement is the result.
    // Exact: p90 of integral quantities lands on exact values, so the
    // threshold comparison is exact arithmetic on both engines.
    QuerySpec("q130_sql_script",
      (s, d) => {
        // Scope the scripting switch to this query (the Sessions
        // discipline: no session-wide semantic flags for one query's
        // sake); it is only consulted at parse time, so restoring it
        // after s.sql() leaves the returned lazy DataFrame intact.
        val prev = s.conf.getOption("spark.sql.scripting.enabled")
        s.conf.set("spark.sql.scripting.enabled", "true")
        try {
          s.sql(s"CREATE OR REPLACE TEMP VIEW q130_li AS " +
            s"SELECT * FROM parquet.`$d/lineitem.parquet`")
          s.sql("""
            BEGIN
              DECLARE thr DOUBLE DEFAULT 0;
              SET thr = (SELECT percentile(l_quantity, 0.9) FROM q130_li);
              SELECT l_returnflag, count(*) AS n_above, thr
              FROM q130_li WHERE l_quantity > thr
              GROUP BY l_returnflag, thr ORDER BY l_returnflag;
            END""")
        } finally prev match {
          case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
          case None => s.conf.unset("spark.sql.scripting.enabled")
        }
      },
      Some("WITH t AS (SELECT quantile_cont(l_quantity, 0.9) AS thr FROM lineitem) " +
        "SELECT l_returnflag, count(*) AS n_above, t.thr AS thr " +
        "FROM lineitem, t WHERE l_quantity > t.thr " +
        "GROUP BY l_returnflag, t.thr ORDER BY l_returnflag")),

    // Benford first-digit audit — the classic fabricated-data screen:
    // the leading digit of every order total, observed count vs the
    // Benford share. Digit extraction goes through the exact decimal
    // rendering (never double→string), and the expected share is an
    // exact-integer ratio times a constant table value, so every column
    // is deterministic. One scan, one 9-row aggregate.
    QuerySpec("q131_benford",
      (s, d) => {
        val benford = typedLit(Seq(0.301029995663981, 0.176091259055681,
          0.124938736608300, 0.096910013008056, 0.079181246047625,
          0.066946789630613, 0.057991946977687, 0.051152522447381,
          0.045757490560675))
        t(s, d, "orders")
          .select(substring(col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
            .cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(Window.partitionBy()))
          .select(col("digit"), col("n"),
            expr("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)").as("share"),
            element_at(benford, col("digit")).as("benford_share"))
          .orderBy("digit")
      },
      Some("WITH b AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INT) AS digit " +
        "FROM orders), " +
        "c AS (SELECT digit, count(*) AS n FROM b GROUP BY digit), " +
        "t AS (SELECT sum(n) AS total FROM c) " +
        "SELECT digit, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share, " +
        "CAST(([0.301029995663981, 0.176091259055681, 0.124938736608300, " +
        "0.096910013008056, 0.079181246047625, 0.066946789630613, " +
        "0.057991946977687, 0.051152522447381, 0.045757490560675])[digit] AS DOUBLE) AS benford_share " +
        "FROM c CROSS JOIN t ORDER BY digit")),

    // Deterministic A/B experiment readout — assignment by md5 gate (the
    // q56/q119 engine-agnostic split), conversion = any purchase event
    // after the user's first exposure. Per-variant exposure/conversion
    // counts are exact integers; the rate and relative lift are single
    // correctly-rounded divisions of exact integers. The experimentation
    // loop every data platform ends up running.
    QuerySpec("q132_ab_experiment",
      (s, d) => {
        val ev = t(s, d, "events")
        val exposed = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
          .withColumn("variant",
            when(conv(expr("substring(md5(CAST(user_id AS STRING)), 1, 4)"), 16, 10)
              .cast("int") % 2 === 0, "A").otherwise("B"))
        val converted = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        val conv_users = exposed.join(converted, "user_id")
          .filter(col("p_ts") > col("first_ts"))
          .select("user_id").distinct()
          .withColumn("is_conv", lit(1L))
        exposed.join(conv_users, Seq("user_id"), "left_outer")
          .groupBy("variant")
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("is_conv"), lit(0L))).as("n_conv"))
          .select(col("variant"), col("n_users"), col("n_conv"),
            expr("CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)").as("rate"))
          .orderBy("variant")
      },
      Some("WITH e AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_ts, " +
        "CASE WHEN CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT) % 2 = 0 " +
        "THEN 'A' ELSE 'B' END AS variant FROM events GROUP BY user_id), " +
        "cv AS (SELECT DISTINCT p.user_id FROM events p JOIN e " +
        "ON p.user_id = e.user_id WHERE p.event_type = 'purchase' " +
        "AND CAST(p.ts AS TIMESTAMP) > e.first_ts) " +
        "SELECT e.variant, count(*) AS n_users, " +
        "CAST(count(cv.user_id) AS BIGINT) AS n_conv, " +
        "CAST(count(cv.user_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate " +
        "FROM e LEFT JOIN cv ON e.user_id = cv.user_id " +
        "GROUP BY e.variant ORDER BY e.variant")),

    // ---- text: token counts via explode --------------------------------
    QuerySpec("q27_token_counts",
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(20),
      Some("SELECT tok, count(*) AS c FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE tok <> '' GROUP BY tok ORDER BY c DESC, tok LIMIT 20")),

    // The 100 TB swap-in q115's comment promises, as code: the same
    // profile shape with per-column approx_count_distinct (HLL) instead
    // of six exact COUNT(DISTINCT)s — one scan, one partial-merge sketch
    // per column, no expand. Approximate → rows-only gate;
    // RelationalGapsSpec bounds every column's estimate within 5% of
    // exact and asserts the exact fields (counts, min/max) agree with
    // q115 verbatim.
    QuerySpec("q133_profile_approx",
      (s, d) => profileApprox(t(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")),
      None,
      gate = Some("property:RelationalGapsSpec/exact fields = q115, distincts within 5%"))
  )

  /** Parameterized one-scan approximate profiler: count / HLL distinct /
    * min / max per column, unpivoted to one row per column. The exact
    * variant (q115) pays a 6-fold scan expand for its six exact
    * COUNT(DISTINCT)s; this is the shape you run at 100 TB. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    // Min/max stringify through the SAME type-stable casts q115 uses
    // (decimal for floating point, date for temporal) so the two
    // profilers render identically and RelationalGapsSpec can compare
    // their exact fields verbatim.
    def stableStr(c: Column, dt: DataType): Column = dt match {
      case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
      case TimestampType | TimestampNTZType | DateType => c.cast("date").cast("string")
      case _ => c.cast("string")
    }
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val dt = df.schema(c).dataType
      Seq(count(col(c)).as(s"nn$i"),
        // rsd=0.02: the 5% acceptance bound in RelationalGapsSpec is
        // then 2.5σ — the default 0.05 sketch misses it on o_orderkey.
        approx_count_distinct(col(c), 0.02).as(s"nd$i"),
        stableStr(min(col(c)), dt).as(s"mn$i"),
        stableStr(max(col(c)), dt).as(s"mx$i"))
    }
    val stacked = cols.zipWithIndex
      .map { case (c, i) => s"'$c', nn$i, nd$i, mn$i, mx$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stacked) " +
        "AS (col_name, n_nonnull, n_distinct, min_s, max_s)"))
      .orderBy("col_name")
  }

  def byName(name: String): QuerySpec = specs.find(_.name == name).get
}
