package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.{QueryRecord, Records, Route}

/** §2.1–2.3 of SURVEY.md: routing / record processing / analytic
  * headline queries, each with a DuckDB oracle (SparkEntry wires them to
  * the driver's correctness gate).
  *
  * Oracle-parity conventions (see SURVEY.md §6):
  *  - every aggregate/computed column aliased identically in both;
  *  - double aggregates rounded (sum→2dp, avg→2/4dp) since summation
  *    order differs between engines;
  *  - dates/timestamps compared as formatted strings or epoch millis;
  *  - integer division avoided (explicit `/ x.0` + floor + cast).
  */
object QueriesCore {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-faithful decimal rounding: round(x·10ⁿ)/10ⁿ — DuckDB
    * implements round(x, n) exactly this way on doubles, so matching
    * the operation order makes the rounded values bit-identical in both
    * engines even when x·10ⁿ lands near a .5 boundary (BigDecimal-exact
    * rounding of x, Spark's default, can differ there). */
  def dround(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10, n)
    round(c * p) / p
  }

  // ---------------------------------------------------------------- §2.3
  /** TPC-H Q1 shape: scan-heavy agg. One shuffle (partial aggs map-side);
    * filter + 7-column pruning pushed to parquet. */
  val q1PricingSummary: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum("l_extendedprice"), 2).as("sum_base_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        dround(avg("l_quantity"), 2).as("avg_qty"),
        dround(avg("l_extendedprice"), 2).as("avg_price"),
        dround(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      | round(avg(l_quantity),2) AS avg_qty,
      | round(avg(l_extendedprice),2) AS avg_price,
      | round(avg(l_discount),4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: 2 joins + agg + deterministic top-10. Joins shuffle
    * on orderkey/custkey; AQE handles skew. Revenue ordered on the
    * ROUNDED value with unique tie-break so both engines agree. */
  val q3ShippingPriority: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1996-01-01")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
               col("o_orderpriority"))
      .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND l_shipdate  > TIMESTAMP '1996-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: star join. Dims (region/nation/supplier) broadcast —
    * the fact side never shuffles for them; only orders⋈customer and
    * lineitem⋈orders shuffle. */
  val q5LocalSupplier: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") <  to_timestamp(lit("1998-01-01")))
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
                            c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }
  val q5Sql: String =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem
      | JOIN orders   ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation   ON s_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q7 shape: nation-pair trade volume by year. Both nation
    * lookups broadcast; the fact chain shuffles only on the join keys. */
  val q7VolumeShipping: Q = (s, d) => {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
              col("l_shipdate") <= to_timestamp(lit("1996-12-31")))
    l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }
  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume),2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         l_extendedprice*(1-l_discount) AS volume
      |  FROM lineitem
      |   JOIN orders   ON l_orderkey = o_orderkey
      |   JOIN customer ON o_custkey = c_custkey
      |   JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |   JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q10 shape: top returned-revenue customers (deterministic
    * tie-break on custkey so the LIMIT is stable in both engines). */
  val q10ReturnedItems: Q = (s, d) => {
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                  col("o_orderdate") <  to_timestamp(lit("1996-07-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      // exact integer-cents accumulation: per-customer sums here are
      // large enough that 2dp rounding of a float sum still exposes
      // accumulation-order drift between engines; summing
      // floor(x·100 + 0.5) as longs is order-independent and identical
      // in both (floor avoids HALF_UP-vs-rint divergence)
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
                  .cast("long")) / lit(100.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }
  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |       CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)/100.0 AS revenue
      |FROM customer
      | JOIN orders   ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      | JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q6 shape: the pure scan-agg — every predicate pushes to the
    * parquet scan (PushedFilters shows all five) and the read prunes to
    * the 4 used columns (quantity, extendedprice, discount, shipdate),
    * zero shuffles (partial agg + single global reduce). The canonical
    * "is pushdown working" probe. */
  val q6ForecastRevenue: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1997-01-01")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(dround(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }
  val q6Sql: String =
    """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q14 shape: promo revenue share. The part dim broadcasts (fact
    * side never shuffles); numerator/denominator accumulate as exact
    * integer cents so the ratio is accumulation-order-independent. */
  val q14PromoRevenue: Q = (s, d) => {
    val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5).cast("long")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1996-10-01")))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(dround(lit(100.0) * sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
                   / sum(cents), 4).as("promo_pct"))
  }
  val q14Sql: String =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |          THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) ELSE 0 END)
      |        / sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)), 4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01'""".stripMargin

  /** TPC-H Q18 shape: large-volume customers — an agg-HAVING feeding a
    * join back against the fact chain. The qualifying-orderkey set is
    * tiny after HAVING, so AQE converts the second join to broadcast at
    * runtime; quantity sums are exact (integral doubles ≤ ~500). */
  val q18LargeOrders: Q = (s, d) => {
    val qualifying = Tables.lineitem(s, d)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 180)
      .select(col("l_orderkey").as("qual_orderkey"), col("sum_qty"))
    Tables.orders(s, d)
      .join(qualifying, col("o_orderkey") === col("qual_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
              col("o_totalprice"), col("sum_qty").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }
  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       o_totalprice, sum_qty AS total_qty
      |FROM orders
      | JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |       FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180) q
      |   ON o_orderkey = q.l_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q19 shape: disjunctive multi-attribute predicate. The
    * brand/size/quantity disjunction spans both join sides, so it can't
    * fully push to either scan — the join-key equality plus the common
    * quantity/size bounds do push; part broadcasts. */
  val q19DisjunctiveRevenue: Q = (s, d) => {
    val j = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
    j.filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
         col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
         col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 50) &&
         col("l_quantity") >= 20 && col("l_quantity") <= 40))
      .agg(dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }
  val q19Sql: String =
    """SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 21)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** TPC-H Q8 shape: national market share — the widest join in the
    * catalog (lineitem⋈orders⋈customer⋈part⋈supplier⋈nation×2⋈region).
    * Every dim broadcasts; only lineitem⋈orders and ⋈customer shuffle.
    * The share ratio accumulates exact integer cents (order-free). */
  val q8MarketShare: Q = (s, d) => {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("cust_nk"), col("n_regionkey").as("cust_rk"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5).cast("long")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                  col("o_orderdate") <  to_timestamp(lit("1998-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.part(s, d)).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cust_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("supp_nk"))
      .join(broadcast(r), col("cust_rk") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dround(lit(100.0) * sum(when(col("supp_nation") === "NATION_3", cents).otherwise(0L))
                   / sum(cents), 4).as("mkt_share_pct"))
  }
  val q8Sql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       round(100.0 * sum(CASE WHEN n2.n_name = 'NATION_3'
      |                 THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) ELSE 0 END)
      |               / sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)), 4) AS mkt_share_pct
      |FROM lineitem
      | JOIN orders   ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN part     ON l_partkey = p_partkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation n1 ON c_nationkey = n1.n_nationkey
      | JOIN nation n2 ON s_nationkey = n2.n_nationkey
      | JOIN region   ON n1.n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin

  /** Temp views for the decorrelation shapes (27h–27k): correlated
    * EXISTS / NOT EXISTS / scalar subqueries are SQL-level constructs, so
    * these four go through `spark.sql` and exercise Catalyst's
    * decorrelation rules (RewritePredicateSubquery, scalar-subquery
    * planning) — the plan class a warehouse QueryRecord user hits
    * constantly — instead of hand-pre-joined DataFrames. PlanSpec
    * asserts each decorrelates to a join (semi/anti/outer), never
    * per-row subquery execution. */
  private def tpchViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.region(s, d).createOrReplaceTempView("region")
  }

  /** TPC-H Q4 shape: correlated EXISTS — orders in a window having at
    * least one line shipped after the order date. Decorrelates to ONE
    * left-semi join on (l_orderkey = o_orderkey) with the non-equi
    * shipdate term as join condition; the date filter pushes to the
    * orders scan. (The synthetic tables carry no commit/receipt dates,
    * so `l_shipdate > o_orderdate` stands in for Q4's late-commit
    * predicate — same correlation structure: equi + non-equi terms.) */
  val q4OrderPriority: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""SELECT o_orderpriority, count(*) AS order_count
            |FROM orders
            |WHERE o_orderdate >= TIMESTAMP '1996-05-01'
            |  AND o_orderdate <  TIMESTAMP '1996-08-01'
            |  AND EXISTS (SELECT * FROM lineitem
            |              WHERE l_orderkey = o_orderkey
            |                AND l_shipdate > o_orderdate)
            |GROUP BY o_orderpriority""".stripMargin)
  }
  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-05-01'
      |  AND o_orderdate <  TIMESTAMP '1996-08-01'
      |  AND EXISTS (SELECT * FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution through a LEFT
    * OUTER join with an ON-clause filter (customers with zero qualifying
    * orders must survive with c_count = 0 — an inner join silently drops
    * them, the classic Q13 bug). Two aggregations, two shuffles. */
  val q13CustomerDist: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""SELECT c_count, count(*) AS custdist
            |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            |      FROM customer LEFT OUTER JOIN orders
            |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            |      GROUP BY c_custkey) c_orders
            |GROUP BY c_count""".stripMargin)
  }
  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q15 shape: top supplier by a scalar subquery over a shared
    * view — the subquery (max over the revenue CTE) executes ONCE as its
    * own plan, never per row. Revenue accumulates exact integer cents so
    * the max-equality compare is accumulation-order-independent (a
    * floating sum would make `= (SELECT max(...))` engine-dependent). */
  val q15TopSupplier: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""WITH revenue AS (
            |  SELECT l_suppkey AS supplier_no,
            |         sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS total_cents
            |  FROM lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            |    AND l_shipdate <  TIMESTAMP '1996-04-01'
            |  GROUP BY l_suppkey)
            |SELECT s_suppkey, s_name, round(CAST(total_cents AS DOUBLE) / 100, 2) AS total_revenue
            |FROM supplier JOIN revenue ON s_suppkey = supplier_no
            |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
            |ORDER BY s_suppkey""".stripMargin)
  }
  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(CAST(total_cents AS DOUBLE) / 100, 2) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21 shape: the hardest decorrelation in the suite — one
    * correlated EXISTS and one correlated NOT EXISTS against the SAME
    * fact table, both correlated on the outer lineitem's order key with
    * a non-equi supplier term. Decorrelates to a left-semi plus a
    * left-anti join; no per-row execution. (`l_returnflag = 'R'` stands
    * in for Q21's late-receipt predicate — the synthetic tables carry no
    * receipt dates; correlation structure is identical.) */
  val q21WaitingSupplier: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""SELECT s_name, count(*) AS numwait
            |FROM supplier, lineitem l1, orders, nation
            |WHERE s_suppkey = l1.l_suppkey
            |  AND o_orderkey = l1.l_orderkey
            |  AND o_orderstatus = 'F'
            |  AND l1.l_returnflag = 'R'
            |  AND s_nationkey = n_nationkey
            |  AND n_name IN ('NATION_1', 'NATION_2')
            |  AND EXISTS (SELECT * FROM lineitem l2
            |              WHERE l2.l_orderkey = l1.l_orderkey
            |                AND l2.l_suppkey <> l1.l_suppkey)
            |  AND NOT EXISTS (SELECT * FROM lineitem l3
            |                  WHERE l3.l_orderkey = l1.l_orderkey
            |                    AND l3.l_suppkey <> l1.l_suppkey
            |                    AND l3.l_returnflag = 'R')
            |GROUP BY s_name""".stripMargin)
  }
  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_2')
      |  AND EXISTS (SELECT * FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT * FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name""".stripMargin

  /** TPC-H Q17 shape: correlated scalar subquery PER GROUP — each
    * lineitem compares against 20% of its part's average quantity.
    * Catalyst decorrelates the per-part average into one aggregate
    * joined back on p_partkey (never a per-row execution). Quantities
    * are integral doubles so the per-part avg (exact sum / count) and
    * the 0.2× threshold are bit-identical across engines; revenue
    * accumulates exact integer cents. (p_size stands in for Q17's
    * p_container — not in the synthetic schema; same plan class.) */
  val q17SmallQuantity: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""SELECT round(CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)
            |             / 700.0, 2) AS avg_yearly
            |FROM lineitem JOIN part ON p_partkey = l_partkey
            |WHERE p_brand = 'Brand#23' AND p_size <= 15
            |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
            |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }
  val q17Sql: String =
    """SELECT round(CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)
      |             / 700.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23' AND p_size <= 15
      |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q22 shape: uncorrelated scalar subquery (global
    * above-average balance threshold) + correlated NOT EXISTS
    * (customers with no urgent orders — the synthetic FK draws leave
    * almost no customer with zero orders, so the filtered form keeps
    * the anti-join side non-trivial) + grouped rollup. The threshold avg is
    * computed over exact integer cents (sum exact ⇒ one division ⇒
    * bit-identical across engines — a floating avg would make the
    * boundary compare engine-dependent); NOT EXISTS decorrelates to a
    * left-anti join. (c_mktsegment stands in for Q22's phone country
    * code — not in the synthetic schema; same plan class.) */
  val q22GlobalSales: Q = (s, d) => {
    tpchViews(s, d)
    s.sql("""WITH c AS (
            |  SELECT c_custkey, c_mktsegment,
            |         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_cents
            |  FROM customer
            |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY'))
            |SELECT c_mktsegment, count(*) AS numcust,
            |       round(CAST(sum(bal_cents) AS DOUBLE) / 100, 2) AS totacctbal
            |FROM c
            |WHERE bal_cents > (SELECT avg(bal_cents) FROM c WHERE bal_cents > 0)
            |  AND NOT EXISTS (SELECT * FROM orders
            |                  WHERE o_custkey = c_custkey
            |                    AND o_orderpriority = '1-URGENT')
            |GROUP BY c_mktsegment""".stripMargin)
  }
  val q22Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment,
      |         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_cents
      |  FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY'))
      |SELECT c_mktsegment, count(*) AS numcust,
      |       round(CAST(sum(bal_cents) AS DOUBLE) / 100, 2) AS totacctbal
      |FROM c
      |WHERE bal_cents > (SELECT avg(bal_cents) FROM c WHERE bal_cents > 0)
      |  AND NOT EXISTS (SELECT * FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** TPC-H Q2 shape: minimum-cost supplier — a correlated scalar
    * subquery (per-part regional minimum cost) against a derived
    * supplier-offer relation, five-table snowflake around it. Catalyst
    * decorrelates the min into one aggregate joined back on p_partkey;
    * the region filter applies inside BOTH the outer block and the
    * subquery (the classic Q2 trap: taking the global min instead of
    * the regional min changes results). The synthetic schema has no
    * partsupp, so the offer relation derives from lineitem — per
    * (part, supplier) minimum unit price in exact integer cents
    * (`floor(x*100+0.5)` per row, min over BIGINT ⇒ the `=` compare is
    * engine-independent). Same correlation structure, same plan class.
    * ORDER is total (s_name unique, p_partkey breaks same-supplier
    * ties) so LIMIT selects a deterministic row set. */
  val q2MinCostSupplier: Q = (s, d) => { tpchViews(s, d); s.sql(q2Sql) }
  val q2Sql: String =
    """WITH offer AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS cost_cents
      |  FROM lineitem
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |       round(CAST(cost_cents AS DOUBLE) / 100, 2) AS ps_supplycost
      |FROM part
      | JOIN offer    ON p_partkey = ps_partkey
      | JOIN supplier ON s_suppkey = ps_suppkey
      | JOIN nation   ON s_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND r_name = 'EUROPE'
      |  AND cost_cents = (
      |    SELECT min(o2.cost_cents)
      |    FROM offer o2
      |     JOIN supplier s2 ON s2.s_suppkey = o2.ps_suppkey
      |     JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      |     JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      |    WHERE o2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape: product-line profit by nation and year — the
    * 5-table join with TWO fact-sized inputs (lineitem ⋈ orders) and
    * three broadcastable dims (part filtered by a LIKE that cannot push
    * as a parquet predicate but prunes before the join, supplier,
    * nation). Profit accumulates as exact integer cents (floor-at-cents
    * per row, BIGINT sum) so the grouped sums are
    * accumulation-order-independent; `0.1*p_retailprice*l_quantity`
    * stands in for Q9's ps_supplycost (no partsupp in the synthetic
    * schema) — same join graph, same plan class. */
  val q9ProductProfit: Q = (s, d) => { tpchViews(s, d); s.sql(q9Sql) }
  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       round(CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)
      |                                  - 0.1*p_retailprice*l_quantity)*100 + 0.5) AS BIGINT))
      |                  AS DOUBLE) / 100, 2) AS sum_profit
      |FROM lineitem
      | JOIN supplier ON s_suppkey = l_suppkey
      | JOIN part     ON p_partkey = l_partkey
      | JOIN orders   ON o_orderkey = l_orderkey
      | JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY n_name, year(o_orderdate)""".stripMargin

  /** TPC-H Q11 shape: important-stock screen — grouped value per part
    * for one nation's suppliers, HAVING each group exceed a FRACTION of
    * the total over the same derived relation: an uncorrelated scalar
    * subquery that must plan ONCE (one extra pass over the shared CTE),
    * never per group. Value is exact integer cents; the threshold
    * compare multiplies the BIGINT total by the fraction in DOUBLE —
    * one deterministic multiply, identical in both engines. lineitem
    * revenue stands in for partsupp value (same shape). */
  val q11ImportantStock: Q = (s, d) => { tpchViews(s, d); s.sql(q11Sql) }
  val q11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey AS ps_partkey,
      |         CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem
      |   JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_1')
      |SELECT ps_partkey, round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS part_value
      |FROM v
      |GROUP BY ps_partkey
      |HAVING sum(cents) > (SELECT sum(cents) * 0.002 FROM v)""".stripMargin

  /** TPC-H Q12 shape: fact-fact join (orders ⋈ lineitem, neither side
    * broadcastable at scale — both shuffle on orderkey) feeding
    * conditional aggregates: per-group priority counts via CASE inside
    * count (count of CASE-non-null is BIGINT in both engines; a
    * sum-of-int would widen to HUGEINT in DuckDB and break schema
    * parity). l_linestatus stands in for l_shipmode and the shipdate
    * window for Q12's commit/receipt ordering (absent from the
    * synthetic schema); same join + conditional-agg plan class. */
  val q12ShipPriority: Q = (s, d) => { tpchViews(s, d); s.sql(q12Sql) }
  val q12Sql: String =
    """SELECT l_linestatus AS shipmode,
      |       count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
      |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag = 'R'
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** TPC-H Q16 shape: supplier diversity per part attribute — COUNT
    * DISTINCT over a join, minus suppliers excluded by a NOT IN
    * subquery. s_suppkey is non-nullable, so Catalyst simplifies the
    * null-aware NOT IN to a plain left-anti join (PlanSpec asserts no
    * nested-loop fallback — the null-aware worst case). The part-
    * supplier pairs derive from lineitem (no partsupp); negative
    * account balance stands in for Q16's complaint filter. */
  val q16PartSuppliers: Q = (s, d) => { tpchViews(s, d); s.sql(q16Sql) }
  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_size IN (5, 10, 15, 20, 25)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape: the nested-subquery tower — an IN subquery whose
    * HAVING clause contains a further CORRELATED scalar subquery
    * (supplier's shipped quantity for a part vs a fraction of the
    * part's corpus-wide total). Catalyst must decorrelate both levels:
    * the inner scalar becomes an aggregate joined on partkey, the outer
    * IN a left-semi join — zero per-row execution (PlanSpec asserts).
    * Quantities are integral doubles ⇒ sums exact ⇒ the threshold
    * compare is engine-independent. p_name LIKE stands in for Q20's
    * forest-part filter; shipped-vs-half-the-part's-window-total for
    * availqty-vs-half-shipped (no partsupp). The inner correlation
    * binds to the grouping column p_partkey — correlating on
    * l_partkey would capture l2's own column (a tautology that
    * silently empties the result). */
  val q20PromisingSupplier: Q = (s, d) => { tpchViews(s, d); s.sql(q20Sql) }
  val q20Sql: String =
    """SELECT s_name,
      |       round(CAST(CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS DOUBLE) / 100, 2) AS s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON p_partkey = l_partkey
      |    WHERE p_name LIKE '%bolt%'
      |      AND l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l_shipdate <  TIMESTAMP '1997-01-01'
      |    GROUP BY l_suppkey, p_partkey
      |    HAVING sum(l_quantity) > (SELECT 0.5 * sum(l2.l_quantity)
      |                              FROM lineitem l2
      |                              WHERE l2.l_partkey = p_partkey
      |                                AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
      |                                AND l2.l_shipdate <  TIMESTAMP '1997-01-01'))""".stripMargin

  /** Sessionization: 30-min-gap sessions per user. Two stacked windows on
    * the same (user_id, ts) partitioning — a single shuffle. */
  val qSessionize: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("ms", unix_millis(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("new_sess",
        when(col("ms") - lag("ms", 1).over(w) > lit(1800000L), 1)
          .when(lag("ms", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           ((max("ms") - min("ms")) / lit(1000.0)).as("span_s"),
           dround(sum("value"), 2).as("sess_value"))
  }
  val qSessionizeSql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      | (max(ms) - min(ms)) / 1000.0 AS span_s,
      | round(sum(value),2) AS sess_value
      |FROM (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, value, ms,
      |      CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
      |           THEN 1
      |           WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM (SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- §2.1
  /** RouteOnAttribute: single-pass tagged routing + per-route stats. */
  val qRouteOnAttribute: Q = (s, d) => {
    val routes = Seq(
      "error"        -> (col("event_type") === "error"),
      "purchase_big" -> (col("event_type") === "purchase" && col("value") > 100),
      "clickview"    -> col("event_type").isin("click", "view"))
    Route.tagged(Tables.events(s, d), routes)
      .groupBy("route")
      .agg(count(lit(1)).as("cnt"), dround(sum("value"), 2).as("sum_value"))
  }
  val qRouteOnAttributeSql: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'error'
      |            WHEN event_type = 'purchase' AND value > 100 THEN 'purchase_big'
      |            WHEN event_type IN ('click','view') THEN 'clickview'
      |            ELSE 'unmatched' END AS route,
      |       count(*) AS cnt, round(sum(value),2) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  /** RouteOnContent: regex routing on document text. */
  val qRouteOnContent: Q = (s, d) => {
    Route.taggedOnContent(Tables.documents(s, d), "text",
        Seq("sparky" -> "spark", "relational" -> "join|merge"))
      .groupBy("route")
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("first_doc"))
  }
  val qRouteOnContentSql: String =
    """SELECT CASE WHEN regexp_matches(text, 'spark') THEN 'sparky'
      |            WHEN regexp_matches(text, 'join|merge') THEN 'relational'
      |            ELSE 'unmatched' END AS route,
      |       count(*) AS cnt, min(doc_id) AS first_doc
      |FROM documents GROUP BY 1""".stripMargin

  /** UpdateAttribute/UpdateRecord: derived columns. */
  val qUpdateAttribute: Q = (s, d) => {
    Records.update(Tables.documents(s, d),
        "lang_uc"  -> upper(col("lang")),
        "head10"   -> substring(col("text"), 1, 10),
        "kb"       -> dround(col("n_chars") / lit(1024.0), 4))
      .select("doc_id", "lang_uc", "head10", "kb")
  }
  val qUpdateAttributeSql: String =
    """SELECT doc_id, upper(lang) AS lang_uc, substring(text,1,10) AS head10,
      | round(n_chars/1024.0, 4) AS kb FROM documents""".stripMargin

  /** FilterAttribute (NiFi 2.x): retain attributes/columns by regex —
    * a pure projection the optimizer pushes into the scan (the plan's
    * ReadSchema carries only the kept columns; dropped ones are never
    * deserialized). Regex mode exercises the whole-name-match
    * contract; `doc_id` rides on the protect list. */
  val qFilterAttribute: Q = (s, d) =>
    Records.filterAttributes(Tables.documents(s, d), retain = true,
      regex = Some("lang|n_.*"), protect = Seq("doc_id"))
  val qFilterAttributeSql: String =
    "SELECT doc_id, lang, n_chars FROM documents"

  /** ExtractText: regex capture groups to columns. */
  val qExtractText: Q = (s, d) => {
    Records.extractText(Tables.documents(s, d), "text",
        "^([a-z]+) ([a-z]+)", Seq("w1" -> 1, "w2" -> 2))
      .select("doc_id", "w1", "w2")
  }
  val qExtractTextSql: String =
    """SELECT doc_id, regexp_extract(text, '^([a-z]+) ([a-z]+)', 1) AS w1,
      | regexp_extract(text, '^([a-z]+) ([a-z]+)', 2) AS w2 FROM documents""".stripMargin

  /** ReplaceText: regex rewrite (digest output to keep rows small). */
  val qReplaceText: Q = (s, d) => {
    Records.replaceText(Tables.documents(s, d), "text", "[aeiou]", "_", "redacted")
      .select(col("doc_id"), md5(col("redacted").cast("binary")).as("redacted_md5"))
  }
  val qReplaceTextSql: String =
    """SELECT doc_id, md5(regexp_replace(text, '[aeiou]', '_', 'g')) AS redacted_md5
      |FROM documents""".stripMargin

  /** EvaluateJsonPath: scalar JSON path extraction. */
  val qEvaluateJsonPath: Q = (s, d) => {
    Records.jsonPath(Tables.events(s, d), "props", "k_str" -> "$.k")
      .select(col("event_id"), col("k_str").cast("long").as("k"))
  }
  val qEvaluateJsonPathSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  /** FlattenJson: schema-driven parse + flatten. */
  val qFlattenJson: Q = (s, d) => {
    Records.flattenJson(Tables.events(s, d), "props",
        StructType(Seq(StructField("k", IntegerType))))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"))
  }
  val qFlattenJsonSql: String =
    """SELECT CAST(json_extract_string(props,'$.k') AS INT) % 10 AS k_mod, count(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- §2.2
  /** QueryRecord: ad-hoc SQL over a record stream. */
  val qQueryRecord: Q = (s, d) => {
    QueryRecord(s, Tables.events(s, d),
      """SELECT event_type, count(*) AS cnt, round(avg(value),2) AS avg_value
        |FROM records WHERE value > 50 GROUP BY event_type""".stripMargin)
  }
  val qQueryRecordSql: String =
    """SELECT event_type, count(*) AS cnt, round(avg(value),2) AS avg_value
      |FROM events WHERE value > 50 GROUP BY event_type""".stripMargin

  /** ValidateRecord: rule violations per record. */
  val qValidateRecord: Q = (s, d) => {
    Records.validate(Tables.events(s, d),
        "nonneg_value" -> (col("value") >= 0),
        "known_type"   -> col("event_type").isin("signup", "click", "error", "view", "purchase"),
        "has_k"        -> get_json_object(col("props"), "$.k").isNotNull,
        "valid_user"   -> (col("user_id") >= 0))
      .select(col("event_id"), col("is_valid"),
              size(col("violations")).cast("long").as("n_violations"))
  }
  val qValidateRecordSql: String =
    """SELECT event_id,
      | (CASE WHEN NOT coalesce(value >= 0, FALSE) THEN 1 ELSE 0 END
      |  + CASE WHEN NOT coalesce(event_type IN ('signup','click','error','view','purchase'), FALSE) THEN 1 ELSE 0 END
      |  + CASE WHEN json_extract_string(props,'$.k') IS NULL THEN 1 ELSE 0 END
      |  + CASE WHEN NOT coalesce(user_id >= 0, FALSE) THEN 1 ELSE 0 END) = 0 AS is_valid,
      | CAST(CASE WHEN NOT coalesce(value >= 0, FALSE) THEN 1 ELSE 0 END
      |  + CASE WHEN NOT coalesce(event_type IN ('signup','click','error','view','purchase'), FALSE) THEN 1 ELSE 0 END
      |  + CASE WHEN json_extract_string(props,'$.k') IS NULL THEN 1 ELSE 0 END
      |  + CASE WHEN NOT coalesce(user_id >= 0, FALSE) THEN 1 ELSE 0 END AS BIGINT) AS n_violations
      |FROM events""".stripMargin

  /** PartitionRecord: derive partition key + per-partition stats. */
  val qPartitionRecord: Q = (s, d) => {
    Records.partitionKey(Tables.events(s, d), "event_date",
        date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_date")
      .agg(count(lit(1)).as("cnt"), dround(sum("value"), 2).as("sum_value"))
  }
  val qPartitionRecordSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS cnt,
      | round(sum(value),2) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  /** SplitText: explode words + global term counts. */
  val qSplitText: Q = (s, d) => {
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }
  val qSplitTextSql: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word""".stripMargin

  /** MergeRecord: ordered concat per group (digest to bound row size). */
  val qMergeRecord: Q = (s, d) => {
    Records.merge(Tables.documents(s, d), Seq("source"), "doc_id", "text", "|")
      .select(col("source"), md5(col("merged").cast("binary")).as("merged_md5"))
  }
  val qMergeRecordSql: String =
    """SELECT source, md5(string_agg(text, '|' ORDER BY doc_id)) AS merged_md5
      |FROM documents GROUP BY source""".stripMargin

  /** MergeContent bin-packing: size-capped bins per source. */
  val qMergeBins: Q = (s, d) => {
    Records.binPack(Tables.documents(s, d), Seq("source"), "doc_id", "n_chars", 2000L)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bin_chars"))
  }
  val qMergeBinsSql: String =
    """SELECT source, bin, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bin_chars
      |FROM (SELECT source, n_chars,
      |        CAST(floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |                     ROWS UNBOUNDED PRECEDING) - n_chars) / 2000.0) AS BIGINT) AS bin
      |      FROM documents)
      |GROUP BY source, bin""".stripMargin

  /** LookupRecord: two-level broadcast enrichment (nation, region). */
  val qLookupRecord: Q = (s, d) => {
    val enriched = Records.lookup(
      Records.lookup(Tables.customer(s, d), Tables.nation(s, d),
        Seq("c_nationkey" -> "n_nationkey")),
      Tables.region(s, d), Seq("n_regionkey" -> "r_regionkey"))
    enriched.select("c_custkey", "c_name", "n_name", "r_name")
  }
  val qLookupRecordSql: String =
    """SELECT c_custkey, c_name, n_name, r_name
      |FROM customer
      | LEFT JOIN nation ON c_nationkey = n_nationkey
      | LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin

  /** Fork/JoinEnrichment: aggregate side-channel re-joined. */
  val qForkJoinEnrichment: Q = (s, d) => {
    Records.forkJoinEnrich(Tables.orders(s, d), Seq("o_custkey"),
        df => df.groupBy("o_custkey")
                .agg(dround(sum("o_totalprice"), 2).as("cust_total"),
                     count(lit(1)).as("cust_orders")))
      .select("o_orderkey", "o_custkey", "cust_total", "cust_orders")
  }
  val qForkJoinEnrichmentSql: String =
    """SELECT o_orderkey, orders.o_custkey, cust_total, cust_orders
      |FROM orders LEFT JOIN (
      |  SELECT o_custkey, round(sum(o_totalprice),2) AS cust_total,
      |         count(*) AS cust_orders
      |  FROM orders GROUP BY o_custkey) agg
      |ON orders.o_custkey = agg.o_custkey""".stripMargin

  /** DeduplicateRecord (exact): canonical keeper per content hash. */
  val qDedupeExact: Q = (s, d) => {
    graft.operators.Dedup.exactSummary(Tables.documents(s, d), "text", "doc_id")
  }
  val qDedupeExactSql: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keeper, count(*) AS copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** SampleRecord: deterministic modulus sampling. */
  val qSampleRecord: Q = (s, d) => {
    Records.sampleByMod(Tables.documents(s, d), "doc_id", 7, 3)
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }
  val qSampleRecordSql: String =
    """SELECT count(*) AS cnt, min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents WHERE doc_id % 7 = 3""".stripMargin

  /** EnforceOrder: per-key sequence numbers. */
  val qEnforceOrder: Q = (s, d) => {
    Records.enforceOrder(Tables.events(s, d), Seq("user_id"), Seq("ts", "event_id"))
      .select("event_id", "user_id", "seq")
  }
  val qEnforceOrderSql: String =
    """SELECT event_id, user_id,
      | CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
      |FROM events""".stripMargin

  /** SegmentContent: fixed-size chunks (digested). */
  val qSegmentContent: Q = (s, d) => {
    Records.segment(Tables.documents(s, d), "text", 100)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
              md5(col("chunk").cast("binary")).as("chunk_md5"))
  }
  val qSegmentContentSql: String =
    """SELECT doc_id, chunk_idx,
      | md5(substring(text, CAST(chunk_idx*100+1 AS INT), 100)) AS chunk_md5
      |FROM (SELECT doc_id, text,
      |        unnest(generate_series(0, CAST(ceil(length(text)/100.0) AS BIGINT)-1)) AS chunk_idx
      |      FROM documents)""".stripMargin

  /** MergeContent Defragment mode (r12): segment then reassemble —
    * the oracle hashes the ORIGINAL text, so the match proves the
    * fragment round-trip is byte-exact (order restored by in-group
    * struct sort, one shuffle total past the segmenting explode). */
  val qDefragment: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val segs = Records.segment(docs, "text", 64)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
    Records.defragment(segs, "doc_id", "chunk_idx", "chunk")
      .select(col("doc_id"), md5(col("content").cast("binary")).as("content_md5"))
  }
  val qDefragmentSql: String =
    """SELECT doc_id, md5(coalesce(text, '')) AS content_md5 FROM documents""".stripMargin

  /** HashContent: md5 + sha256 digests. */
  val qHashContent: Q = (s, d) => {
    Records.hashContent(Records.hashContent(
        Tables.documents(s, d), "text", "md5", "text_md5"),
        "text", "sha256", "text_sha256")
      .select("doc_id", "text_md5", "text_sha256")
  }
  val qHashContentSql: String =
    """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
      |FROM documents""".stripMargin

  /** ConvertRecord: type/format conversions. */
  val qConvertRecord: Q = (s, d) => {
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_quantity")).as("qty_floor"),
      date_format(col("l_shipdate"), "yyyy-MM").as("ship_ym"),
      (col("l_returnflag") === "R").as("is_return"))
  }
  val qConvertRecordSql: String =
    """SELECT l_orderkey, l_linenumber, CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      | strftime(l_shipdate, '%Y-%m') AS ship_ym, l_returnflag = 'R' AS is_return
      |FROM lineitem""".stripMargin

  /** ConvertRecord xml mode (r17 — NiFi's XMLReader record reader):
    * one XML element per record synthesized IN-PLAN from events
    * columns, parsed with the builtin from_xml, re-emitted as JSON —
    * so the DuckDB oracle states the exact JSON bytes as a concat of
    * the same source columns. Narrow, rides the scan. */
  val qConvertXml: Q = (s, d) => {
    val xml = concat(lit("<e><u>"), col("user_id"),
      lit("</u><t>"), col("event_type"), lit("</t></e>"))
    Records.convertRecordFormat(
        Tables.events(s, d).withColumn("payload", xml),
        "payload", "xml", "json", "u BIGINT, t STRING")
      .select(col("event_id"), col("converted"))
  }
  val qConvertXmlSql: String =
    """SELECT event_id,
      |  '{"u":' || user_id || ',"t":"' || event_type || '"}' AS converted
      |FROM events""".stripMargin

  /** ValidateCsv, super-csv DSL form (r17; the callback-predicate form is QueriesText.qValidateCsv): CSV lines synthesized in-plan from events with
    * PLANTED violations selected by event_id — an extra cell
    * (m10 = 0), an unparseable number (m10 = 1), a missing Optional
    * cell (m10 = 2, which must stay VALID) — validated against
    * `ParseLong, StrMinMax(5,10), Optional(ParseDouble)`; the oracle
    * restates the routing as the same modulus + length cases. The
    * value cell's string FORM doesn't matter (the processor checks
    * castability), so double formatting never enters the compare. */
  val qValidateCsvDsl: Q = (s, d) => {
    val third = when(col("event_id") % 10 === 1, lit("x9x"))
      .otherwise(coalesce(round(col("value"), 2).cast("string"), lit("0")))
    val line = concat(
      col("user_id").cast("string"), lit(","), col("event_type"),
      when(col("event_id") % 10 === 2, lit(""))
        .otherwise(concat(lit(","), third)),
      when(col("event_id") % 10 === 0, lit(",oops")).otherwise(lit("")))
    Records.validateCsv(
        Tables.events(s, d).withColumn("line", line),
        "line", "ParseLong, StrMinMax(5,10), Optional(ParseDouble)")
      .select(col("event_id"), col("route"))
  }
  val qValidateCsvDslSql: String =
    """SELECT event_id, CASE
      |  WHEN event_id % 10 = 0 THEN 'invalid'
      |  WHEN event_id % 10 = 1 THEN 'invalid'
      |  WHEN length(event_type) BETWEEN 5 AND 10 THEN 'valid'
      |  ELSE 'invalid' END AS route
      |FROM events""".stripMargin

  /** AttributeRollingWindow: trailing 1h per-user sum. */
  val qRollingWindow: Q = (s, d) => {
    Records.rollingWindow(Tables.events(s, d), "user_id", "ts", "value", 3600000L)
      .select(col("event_id"), col("user_id"), dround(col("rolling_sum"), 2).as("rolling_1h"))
  }
  val qRollingWindowSql: String =
    """SELECT event_id, user_id,
      | round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |        RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 2) AS rolling_1h
      |FROM events""".stripMargin

  /** Top-N per key. */
  val qWindowTopN: Q = (s, d) => {
    Records.topNPerKey(Tables.orders(s, d), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rk").cast("long").as("rk"))
  }
  val qWindowTopNSql: String =
    """SELECT o_custkey, o_orderkey, rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 2""".stripMargin

  /** Batch source fidelity (§2.5 #41): parquet → CSV → read-back with
    * explicit schema → aggregate; must equal aggregating the original
    * (doubles round-trip CSV losslessly via shortest-repr printing). */
  val qSourceCsvRoundtrip: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val tmp = s"/tmp/graft_csv_roundtrip_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.sources.Io.writeCsv(c, tmp)
    graft.sources.Io.readCsv(s, tmp, c.schema)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), dround(sum("c_acctbal"), 2).as("sum_bal"))
  }
  val qSourceCsvRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS cnt, round(sum(c_acctbal),2) AS sum_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** Avro roundtrip (ConvertRecord's AvroReader/Writer leg — NiFi's
    * default wire format): orders → avro container files (via the
    * bundled avro-core, one file per partition) → read back → aggregate.
    * Timestamps cross the format as logical timestamp-micros; the hash
    * match against the parquet-side oracle proves lossless transport. */
  val qSourceAvroRoundtrip: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val tmp = s"/tmp/graft_avro_roundtrip_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.sources.AvroIo.writeAvro(o, tmp)
    graft.sources.AvroIo.readAvro(s, tmp, o.schema)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dround(sum("o_totalprice"), 2).as("sum_price"),
        date_format(max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("max_date"))
  }
  val qSourceAvroRoundtripSql: String =
    """SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice),2) AS sum_price,
      |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** ORC roundtrip (ConvertRecord's second columnar leg): lineitem's
    * hot columns → ORC files → read back → aggregate. The oracle runs
    * on the ORIGINAL parquet, so the hash match proves the ORC
    * transport lossless (decimals/dates included); the read-back scan
    * keeps the same pushdown surface as parquet (PushedFilters shows
    * the shipdate bound reaching the ORC reader). */
  val qSourceOrcRoundtrip: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
      .select("l_shipdate", "l_returnflag", "l_quantity", "l_extendedprice")
    val tmp = s"/tmp/graft_orc_roundtrip_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.sources.Io.writeOrc(l, tmp)
    graft.sources.Io.readOrc(s, tmp)
      .filter(col("l_shipdate") >= lit("1995-01-01"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), dround(sum("l_quantity"), 2).as("sum_qty"),
        dround(sum("l_extendedprice"), 2).as("sum_price"))
  }
  val qSourceOrcRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty,
      |  round(sum(l_extendedprice),2) AS sum_price
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** Anti join: rows with no match (NiFi unmatched-enrichment route).
    * Spark plans left_anti — no row widening, null-safe. */
  val qAntiJoin: Q = (s, d) => {
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }
  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Semi join: existence filter without duplication. */
  val qSemiJoin: Q = (s, d) => {
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") > 45),
            col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }
  val qSemiJoinSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey AND l_quantity > 45)""".stripMargin

  /** Pivot: wide per-key counts (QueryRecord CASE-pivot shape). */
  val qPivot: Q = (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      .pivot("event_type", types).agg(count(lit(1)))
      .na.fill(0L, types)
  }
  val qPivotSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
      | count(*) FILTER (event_type = 'click')    AS click,
      | count(*) FILTER (event_type = 'error')    AS error,
      | count(*) FILTER (event_type = 'purchase') AS purchase,
      | count(*) FILTER (event_type = 'signup')   AS signup,
      | count(*) FILTER (event_type = 'view')     AS view
      |FROM events GROUP BY 1""".stripMargin

  /** Rollup: hierarchical subtotals in one pass. */
  val qRollup: Q = (s, d) => {
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dround(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
  }
  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty, count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact interpolated percentiles per group (both engines use the
    * same linear-interpolation definition). */
  val qPercentiles: Q = (s, d) => {
    Tables.events(s, d).groupBy("event_type")
      .agg(dround(expr("percentile(value, 0.5)"), 4).as("p50"),
           dround(expr("percentile(value, 0.9)"), 4).as("p90"))
  }
  val qPercentilesSql: String =
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
      | round(quantile_cont(value, 0.9), 4) AS p90
      |FROM events GROUP BY event_type""".stripMargin

  /** Distinct counting per group (exact; the approx_count_distinct HLL
    * variant is spec-tested against this within 5%). */
  val qDistinctCount: Q = (s, d) => {
    Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
  }
  val qDistinctCountSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** As-of join: each purchase enriched with the user's most recent
    * prior click (union + per-key window — no range cross-join; DuckDB
    * validates via its native ASOF JOIN). Millisecond epoch on both
    * engines; clicks pre-deduped per (user, ms) for determinism. */
  val qAsofJoin: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("ms", unix_millis(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ms")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ms").agg(max("event_id").as("click_id"))
    graft.operators.AsOfJoin.backward(purchases, clicks,
        Seq("user_id"), "ms", "ms", Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("ms"),
              col("asof_click_id").as("click_id"))
  }
  val qAsofJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.ms, c.click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms""".stripMargin

  /** Moving average over a bounded row frame (per-key smoother). */
  val qMovingAvg: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(-3, 0)
    Tables.events(s, d).withColumn("ms", unix_millis(col("ts")))
      .withColumn("mavg", dround(avg("value").over(w), 4))
      .select("event_id", "user_id", "mavg")
  }
  val qMovingAvgSql: String =
    """SELECT event_id, user_id,
      | round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
      |FROM events""".stripMargin

  /** Statistical aggregates (corr / covar / stddev — both engines use
    * the same sample definitions; rounded for summation-order noise). */
  val qStatsAgg: Q = (s, d) => {
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(dround(corr("l_quantity", "l_extendedprice"), 4).as("qty_price_corr"),
           dround(covar_samp("l_quantity", "l_discount"), 4).as("qty_disc_cov"),
           dround(stddev_samp("l_extendedprice"), 2).as("price_sd"))
  }
  val qStatsAggSql: String =
    """SELECT l_returnflag,
      | round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      | round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_cov,
      | round(stddev_samp(l_extendedprice), 2) AS price_sd
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** ScanContent: dictionary-term matching over document text. */
  val qScanContent: Q = (s, d) => {
    Records.scanContent(Tables.documents(s, d), "text",
        Seq("spark", "join", "window", "stream"))
      .select(col("doc_id"), array_join(col("matched_terms"), ",").as("matched"))
  }
  val qScanContentSql: String =
    """SELECT doc_id,
      | coalesce(array_to_string(list_filter(['spark','join','window','stream'],
      |                                      t -> contains(text, t)), ','), '') AS matched
      |FROM documents""".stripMargin

  /** ExecuteScript (§2.5 48m): the per-record JVM escape hatch, here
    * running a deterministic function so DuckDB can oracle it — proves
    * the escape hatch preserves row-level semantics end-to-end. */
  val qExecuteScript: Q = (s, d) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
    Records.executeScript(c, StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("tag", StringType),
      StructField("bal_cents", LongType)))) { r =>
      Row(r.getLong(0),
        r.getString(1).toUpperCase + (if (r.getDouble(2) < 0) ":NEG" else ":POS"),
        math.round(r.getDouble(2) * 100))
    }
  }
  val qExecuteScriptSql: String =
    """SELECT c_custkey,
      |  upper(c_name) || CASE WHEN c_acctbal < 0 THEN ':NEG' ELSE ':POS' END AS tag,
      |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |FROM customer""".stripMargin

  /** Mergeable HLL sketch rollup (§2.6 55): per-(type,status) sketches
    * of user ids over events, unioned up to event_type — the
    * pre-aggregate-once / roll-up-anywhere pattern. NO DuckDB oracle
    * (DataSketches HLL registers differ from DuckDB's HLL); SketchesSpec
    * proves union==direct and ≤2% error vs exact instead. */
  val qHllRollup: Q = (s, d) => {
    val fine = graft.operators.Sketches.hllBySegment(
      Tables.events(s, d).withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "user_id")
    graft.operators.Sketches.hllRollup(fine, Seq("event_type"))
      .select(col("event_type"),
        graft.operators.Sketches.hllEstimate(col("hll")).cast("long").as("approx_users"))
  }

  /** AttributesToJSON: attribute envelope serialization. */
  val qAttrsToJson: Q = (s, d) => {
    Records.attributesToJson(Tables.events(s, d), Seq("event_type", "user_id"))
      .select("event_id", "attrs_json")
  }
  val qAttrsToJsonSql: String =
    """SELECT event_id,
      | to_json(struct_pack(event_type := event_type, user_id := user_id)) AS attrs_json
      |FROM events""".stripMargin

  // -------------------------------------------------------------- export
  val queries: Map[String, Q] = Map(
    "q1_pricing_summary"    -> q1PricingSummary,
    "q3_shipping_priority"  -> q3ShippingPriority,
    "q5_local_supplier"     -> q5LocalSupplier,
    "q7_volume_shipping"    -> q7VolumeShipping,
    "q10_returned_items"    -> q10ReturnedItems,
    "q6_forecast_revenue"   -> q6ForecastRevenue,
    "q14_promo_revenue"     -> q14PromoRevenue,
    "q18_large_orders"      -> q18LargeOrders,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q8_market_share"       -> q8MarketShare,
    "q4_order_priority"     -> q4OrderPriority,
    "q13_customer_dist"     -> q13CustomerDist,
    "q15_top_supplier"      -> q15TopSupplier,
    "q21_waiting_supplier"  -> q21WaitingSupplier,
    "q17_small_quantity"    -> q17SmallQuantity,
    "q22_global_sales"      -> q22GlobalSales,
    "q2_min_cost_supplier"  -> q2MinCostSupplier,
    "q9_product_profit"     -> q9ProductProfit,
    "q11_important_stock"   -> q11ImportantStock,
    "q12_ship_priority"     -> q12ShipPriority,
    "q16_part_suppliers"    -> q16PartSuppliers,
    "q20_promising_supplier" -> q20PromisingSupplier,
    "q_sessionize"          -> qSessionize,
    "q_route_on_attribute"  -> qRouteOnAttribute,
    "q_route_on_content"    -> qRouteOnContent,
    "q_update_attribute"    -> qUpdateAttribute,
    "q_filter_attribute"    -> qFilterAttribute,
    "q_extract_text"        -> qExtractText,
    "q_replace_text"        -> qReplaceText,
    "q_evaluate_jsonpath"   -> qEvaluateJsonPath,
    "q_flatten_json"        -> qFlattenJson,
    "q_query_record"        -> qQueryRecord,
    "q_validate_record"     -> qValidateRecord,
    "q_partition_record"    -> qPartitionRecord,
    "q_split_text"          -> qSplitText,
    "q_merge_record"        -> qMergeRecord,
    "q_merge_bins"          -> qMergeBins,
    "q_lookup_record"       -> qLookupRecord,
    "q_fork_join_enrichment" -> qForkJoinEnrichment,
    "q_dedupe_exact"        -> qDedupeExact,
    "q_sample_record"       -> qSampleRecord,
    "q_enforce_order"       -> qEnforceOrder,
    "q_defragment"          -> qDefragment,
    "q_segment_content"     -> qSegmentContent,
    "q_hash_content"        -> qHashContent,
    "q_convert_record"      -> qConvertRecord,
    "q_convert_xml"         -> qConvertXml,
    "q_validate_csv_dsl"    -> qValidateCsvDsl,
    "q_rolling_window"      -> qRollingWindow,
    "q_window_topn"         -> qWindowTopN,
    "q_source_csv_roundtrip" -> qSourceCsvRoundtrip,
    "q_source_avro_roundtrip" -> qSourceAvroRoundtrip,
    "q_source_orc_roundtrip" -> qSourceOrcRoundtrip,
    "q_anti_join"           -> qAntiJoin,
    "q_semi_join"           -> qSemiJoin,
    "q_pivot"               -> qPivot,
    "q_rollup"              -> qRollup,
    "q_percentiles"         -> qPercentiles,
    "q_distinct_count"      -> qDistinctCount,
    "q_asof_join"           -> qAsofJoin,
    "q_moving_avg"          -> qMovingAvg,
    "q_stats_agg"           -> qStatsAgg,
    "q_scan_content"        -> qScanContent,
    "q_execute_script"      -> qExecuteScript,
    "q_hll_rollup"          -> qHllRollup,
    "q_attrs_to_json"       -> qAttrsToJson)

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary"    -> q1Sql,
    "q3_shipping_priority"  -> q3Sql,
    "q5_local_supplier"     -> q5Sql,
    "q7_volume_shipping"    -> q7Sql,
    "q10_returned_items"    -> q10Sql,
    "q6_forecast_revenue"   -> q6Sql,
    "q14_promo_revenue"     -> q14Sql,
    "q18_large_orders"      -> q18Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "q8_market_share"       -> q8Sql,
    "q4_order_priority"     -> q4Sql,
    "q13_customer_dist"     -> q13Sql,
    "q15_top_supplier"      -> q15Sql,
    "q21_waiting_supplier"  -> q21Sql,
    "q17_small_quantity"    -> q17Sql,
    "q22_global_sales"      -> q22Sql,
    "q2_min_cost_supplier"  -> q2Sql,
    "q9_product_profit"     -> q9Sql,
    "q11_important_stock"   -> q11Sql,
    "q12_ship_priority"     -> q12Sql,
    "q16_part_suppliers"    -> q16Sql,
    "q20_promising_supplier" -> q20Sql,
    "q_sessionize"          -> qSessionizeSql,
    "q_route_on_attribute"  -> qRouteOnAttributeSql,
    "q_route_on_content"    -> qRouteOnContentSql,
    "q_update_attribute"    -> qUpdateAttributeSql,
    "q_filter_attribute"    -> qFilterAttributeSql,
    "q_extract_text"        -> qExtractTextSql,
    "q_replace_text"        -> qReplaceTextSql,
    "q_evaluate_jsonpath"   -> qEvaluateJsonPathSql,
    "q_flatten_json"        -> qFlattenJsonSql,
    "q_query_record"        -> qQueryRecordSql,
    "q_validate_record"     -> qValidateRecordSql,
    "q_partition_record"    -> qPartitionRecordSql,
    "q_split_text"          -> qSplitTextSql,
    "q_merge_record"        -> qMergeRecordSql,
    "q_merge_bins"          -> qMergeBinsSql,
    "q_lookup_record"       -> qLookupRecordSql,
    "q_fork_join_enrichment" -> qForkJoinEnrichmentSql,
    "q_dedupe_exact"        -> qDedupeExactSql,
    "q_sample_record"       -> qSampleRecordSql,
    "q_enforce_order"       -> qEnforceOrderSql,
    "q_defragment"          -> qDefragmentSql,
    "q_segment_content"     -> qSegmentContentSql,
    "q_hash_content"        -> qHashContentSql,
    "q_convert_record"      -> qConvertRecordSql,
    "q_convert_xml"         -> qConvertXmlSql,
    "q_validate_csv_dsl"    -> qValidateCsvDslSql,
    "q_rolling_window"      -> qRollingWindowSql,
    "q_window_topn"         -> qWindowTopNSql,
    "q_source_csv_roundtrip" -> qSourceCsvRoundtripSql,
    "q_source_avro_roundtrip" -> qSourceAvroRoundtripSql,
    "q_source_orc_roundtrip" -> qSourceOrcRoundtripSql,
    "q_anti_join"           -> qAntiJoinSql,
    "q_semi_join"           -> qSemiJoinSql,
    "q_pivot"               -> qPivotSql,
    "q_rollup"              -> qRollupSql,
    "q_percentiles"         -> qPercentilesSql,
    "q_distinct_count"      -> qDistinctCountSql,
    "q_asof_join"           -> qAsofJoinSql,
    "q_moving_avg"          -> qMovingAvgSql,
    "q_stats_agg"           -> qStatsAggSql,
    "q_scan_content"        -> qScanContentSql,
    "q_execute_script"      -> qExecuteScriptSql,
    "q_attrs_to_json"       -> qAttrsToJsonSql)
}
