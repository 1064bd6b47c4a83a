package graft.analytics

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.util.Tables._

/** Relational core: scans, filters, projections, joins, aggregations.
  *
  * Fills the analytics surface the reference delegates to Power BI
  * (reference `static/report.html:2`; SURVEY.md §2.5) plus the
  * reference's own filter/enrich semantics transposed onto the star
  * schema (SURVEY.md §7.2 role mapping).
  */
object CoreQueries extends QueryModule {

  /** Flagship (SURVEY §7.2): the reference's "pharmacy EOBs for the demo
    * patient since a date, enriched from a dim" (ref
    * `FetchBulkData/__init__.py:466-528`) transposed: date+quantity filter
    * on the fact, joined to the `part` dim, grouped revenue.
    * No broadcast hint: `part` grows with SF (~20B rows at 100 TB), so a
    * forced broadcast OOMs there — AQE picks broadcast-vs-SMJ from
    * runtime size stats (still BHJ at every local SF).
    */
  val flagship = Q(
    "q_flagship",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1998-01-01") && col("l_quantity") > 5)
      val p = t(s, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("revenue"))
        .orderBy(col("p_brand"))
    },
    Some("""
      SELECT p_brand,
             count(*) AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 5
      GROUP BY p_brand
      ORDER BY p_brand""")
  )

  /** TPC-H Q1-shaped hash aggregate (SURVEY §2.5 "aggregations"):
    * map-side partial + final agg, decimal-exact sums, derived mean. */
  val hashAgg = Q(
    "q_hash_agg",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2001-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  )

  override def all: Seq[Q] = Seq(flagship, hashAgg)
}
