package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Events.milli

/** General relational analytics over the TPC-H-ish test tables —
  * the "everything else an engine must do" surface: multi-way joins
  * with broadcast dimensions, grouped aggregation, and window ranking.
  *
  * Plans are declared, not scheduled: small dimension tables are
  * explicitly broadcast (no shuffle of the fact side beyond its own
  * aggregation), aggregates partial-combine map-side, and monetary
  * doubles sum as integer millis for order-independent determinism
  * (revenue = round(price*(1-disc)*1000) per row, then an exact
  * integer sum). */
object RelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-filter-aggregate, fully pushed down
    "rel_q1_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(milli(col("l_quantity"))).as("sum_qty_milli"),
          sum(milli(col("l_extendedprice"))).as("sum_base_milli"),
          sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_milli"),
          count(lit(1)).as("count_order"))),
    // TPC-H Q3 shape: selective fact join, broadcast the filtered dim
    "rel_q3_shipping" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      li.join(broadcast(ord.join(broadcast(cust),
          ord("o_custkey") === cust("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"))
        .agg(sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_milli"))
        .orderBy(col("revenue_milli").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    // TPC-H Q5 shape: star join, all dimensions broadcast
    "rel_q5_nation_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
      val cust = t(s, d, "customer")
      val supp = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .filter(cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_milli"), count(lit(1)).as("n_items"))
    }),
    // window ranking: top-3 orders by totalprice per customer
    "rel_top_orders_per_cust" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          milli(col("o_totalprice")).as("totalprice_milli"),
          col("rk").cast("long").as("rk"))
    }),
    // rollup (grouping sets): subtotals per flag, per (flag, status), grand total
    "rel_rollup_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(milli(col("l_quantity"))).as("qty_milli"),
          count(lit(1)).as("n"))),
    // exact distributed correlation: co-moments accumulate as exact
    // integer sums (quantity in millis, price in whole units so the
    // squared sums stay inside int64) and the Pearson formula is
    // evaluated once per group from those exact sums — no float
    // accumulation order-dependence, unlike corr()'s streaming
    // co-moment merge. The doubles below are identical-operand,
    // identical-order IEEE ops on both engines, so corr itself
    // hash-matches bit-for-bit
    "rel_corr_qty_price" -> ((s, d) => {
      val qm = milli(col("l_quantity"))
      val pu = round(col("l_extendedprice")).cast("long")
      def d2(c: Column) = c.cast("double")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(qm).as("sx"), sum(pu).as("sy"),
          sum(qm * qm).as("sxx"), sum(pu * pu).as("syy"),
          sum(qm * pu).as("sxy"))
        .withColumn("corr",
          (d2(col("n")) * d2(col("sxy")) - d2(col("sx")) * d2(col("sy"))) /
            sqrt((d2(col("n")) * d2(col("sxx")) - d2(col("sx")) * d2(col("sx"))) *
              (d2(col("n")) * d2(col("syy")) - d2(col("sy")) * d2(col("sy")))))
    }),
    // cube (full grouping-sets lattice: both rollup axes + cross slices)
    "rel_cube_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(milli(col("l_quantity"))).as("qty_milli"),
          count(lit(1)).as("n"))),
    // grouped distinct + having over a join
    "rel_parts_per_brand" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("p_partkey")).as("n_parts"),
          sum(milli(col("l_quantity"))).as("qty_milli"))),
    // TPC-H Q4 shape: EXISTS semi-join with a non-equi condition (this
    // schema has no commitdate, so "late" = shipped > 60 days after the
    // order date); the semi-join never duplicates or widens order rows
    "rel_q4_late_orders" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
      val li = t(s, d, "lineitem")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),
    // TPC-H Q22 shape: anti-join — above-average-balance customers with
    // no recent order (none since 2000-01-01), per nation. The average
    // threshold is compared in exact integer arithmetic (bal_milli * n >
    // sum_milli avoids a double average whose last ulp could flip a
    // customer across engines); the one-row aggregate broadcasts, and
    // the anti-join's order side is filtered + pruned to its key column
    // at the scan
    "rel_q22_no_orders" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          milli(col("c_acctbal")).as("bal_milli"))
      val pos = cust.filter(col("bal_milli") > 0)
        .agg(sum(col("bal_milli")).as("s_milli"), count(lit(1)).as("n_pos"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(pos))
        .filter(col("bal_milli") * col("n_pos") > col("s_milli"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_milli")).as("bal_milli_sum"))
    }),
    // TPC-H Q14 shape: conditional aggregation — promo revenue share,
    // one reduced row off a broadcast part join
    "rel_q14_promo" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(lit(0L))).as("promo_milli"),
          sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_milli"))
        .select(col("promo_milli"), col("total_milli"),
          (lit(100.0) * col("promo_milli") / col("total_milli")).as("promo_pct"))),
    // pivot: quantity matrix returnflag x linestatus — wide-form output
    // with explicit pivot values (no extra distinct-values job, and a
    // deterministic column set at any scale)
    "rel_pivot_returns" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(milli(col("l_quantity"))))),
    // set ops: part keys with a max-quantity 'R' return vs a
    // max-quantity 'A' return — INTERSECT / EXCEPT distinct semantics
    "rel_parts_intersect" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def side(f: String) = li
        .filter(col("l_returnflag") === f && col("l_quantity") > 49)
        .select(col("l_partkey"))
      side("R").intersect(side("A"))
    }),
    "rel_parts_except" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def side(f: String) = li
        .filter(col("l_returnflag") === f && col("l_quantity") > 49)
        .select(col("l_partkey"))
      side("R").except(side("A"))
    }),
    // TPC-H Q6 shape: pure scan-filter-aggregate — every predicate in
    // PushedFilters, one reduced row, zero joins
    "rel_q6_forecast" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(milli(col("l_extendedprice") * col("l_discount")))
          .as("revenue_milli"), count(lit(1)).as("n_items"))),
    // TPC-H Q10 shape: returned-item reporting — three-way join with
    // broadcast dims, per-customer revenue, top-20
    "rel_q10_returned" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_milli"))
        .join(broadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          milli(col("c_acctbal")).as("acctbal_milli"), col("revenue_milli"))
        .orderBy(col("revenue_milli").desc, col("c_custkey").asc)
        .limit(20)
    }),
    // skew-salted fact-dimension join (operators/Skew.scala): the fact
    // side gets a deterministic value-derived salt, the dimension is
    // replicated saltFactor times, and the result must equal the plain
    // join — which is exactly what the oracle checks
    "rel_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey").as("okey"),
        milli(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev_milli"))
      val ord = t(s, d, "orders").select(col("o_orderkey").as("okey"),
        col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, ord, "okey",
          saltSource = col("rev_milli"), saltFactor = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_milli")).as("rev_milli_sum"))
    }),
    // TPC-H Q18 shape: heavy-hitter orders (grouped HAVING on the fact
    // table) joined back to the order row, top-k. The only fact shuffle
    // is its own per-orderkey aggregation; the survivors (<<1%) then
    // broadcast-join against orders
    "rel_q18_large_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(milli(col("l_quantity"))).as("qty_milli"))
        .filter(col("qty_milli") > 200000L)
      t(s, d, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          milli(col("o_totalprice")).as("totalprice_milli"), col("qty_milli"))
        .orderBy(col("qty_milli").desc, col("o_orderkey").asc)
        .limit(100)
    }),
    // TPC-H Q7 shape: bidirectional nation-pair volume by ship year.
    // The nation filter lands on the DIMENSIONS before any fact join
    // (filtered supplier/customer broadcast), the pair predicate on
    // the joined pair — the fact table shuffles once, on its own keys
    "rel_q7_volume" -> ((s, d) => {
      val nats = Seq("NATION_1", "NATION_2")
      val nat = t(s, d, "nation").filter(col("n_name").isin(nats: _*))
      val supp = t(s, d, "supplier")
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey")).drop("n_nationkey")
      val cust = t(s, d, "customer")
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("n_nationkey")).drop("n_nationkey")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1999-01-01"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_milli"))
    }),
    // TPC-H Q8 shape: a nation's market share inside a region-scoped,
    // type-scoped order volume, per year — numerator and denominator
    // as exact integer milli sums, share as integer permille
    "rel_q8_market_share" -> ((s, d) => {
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val rnat = t(s, d, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t(s, d, "customer")
        .join(broadcast(rnat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val promo = t(s, d, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      t(s, d, "lineitem")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3",
            milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(0L)).as("nation_milli"),
          sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_milli"))
        .withColumn("share_permille", expr("(nation_milli * 1000) div total_milli"))
    }),
    // TPC-H Q13 shape: order-count distribution over ALL customers —
    // left outer join preserving the zero-order population, then a
    // second aggregation of the first's results
    "rel_q13_custdist" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),
    // TPC-H Q19 shape: disjunctive OR-of-ANDs predicate spanning both
    // join sides — the optimizer must push the part-only conjuncts to
    // the dimension scan and evaluate the residual on the joined row
    "rel_q19_disjunctive" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1.0, 20.0)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(11, 30) &&
            col("l_quantity").between(10.0, 30.0)))
        .agg(sum(milli(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_milli"), count(lit(1)).as("n_items"))))

  private def rev = "CAST(round(l_extendedprice * (1.0 - l_discount) * 1000, 0) AS BIGINT)"
  private def m(c: String) = s"CAST(round($c * 1000, 0) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "rel_q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
           CAST(sum(${m("l_quantity")}) AS BIGINT) AS sum_qty_milli,
           CAST(sum(${m("l_extendedprice")}) AS BIGINT) AS sum_base_milli,
           CAST(sum($rev) AS BIGINT) AS sum_disc_milli,
           count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2""",
    "rel_q3_shipping" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           CAST(sum($rev) AS BIGINT) AS revenue_milli
         FROM lineitem, orders, customer
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         GROUP BY 1, 2 ORDER BY revenue_milli DESC, l_orderkey ASC LIMIT 10""",
    "rel_q5_nation_revenue" ->
      s"""SELECT n_name, CAST(sum($rev) AS BIGINT) AS revenue_milli, count(*) AS n_items
         FROM lineitem, orders, customer, supplier, nation
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey
         GROUP BY 1""",
    "rel_top_orders_per_cust" ->
      s"""SELECT o_custkey, o_orderkey, ${m("o_totalprice")} AS totalprice_milli, rk
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders)
         WHERE rk <= 3""",
    "rel_rollup_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
           CAST(sum(${m("l_quantity")}) AS BIGINT) AS qty_milli, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "rel_corr_qty_price" ->
      s"""WITH g AS (
           SELECT l_returnflag, count(*) AS n,
             CAST(sum(${m("l_quantity")}) AS BIGINT) AS sx,
             CAST(sum(CAST(round(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(${m("l_quantity")} * ${m("l_quantity")}) AS BIGINT) AS sxx,
             CAST(sum(CAST(round(l_extendedprice, 0) AS BIGINT) *
                      CAST(round(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS syy,
             CAST(sum(${m("l_quantity")} *
                      CAST(round(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
            CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                 CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
         FROM g""",
    "rel_cube_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
           CAST(sum(${m("l_quantity")}) AS BIGINT) AS qty_milli, count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "rel_parts_per_brand" ->
      s"""SELECT p_brand, count(DISTINCT p_partkey) AS n_parts,
           CAST(sum(${m("l_quantity")}) AS BIGINT) AS qty_milli
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "rel_q4_late_orders" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1""",
    "rel_q22_no_orders" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey, ${m("c_acctbal")} AS bal_milli
           FROM customer),
         pos AS (SELECT CAST(sum(bal_milli) AS BIGINT) AS s_milli,
           count(*) AS n_pos FROM c WHERE bal_milli > 0)
         SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           count(*) AS n_cust, CAST(sum(bal_milli) AS BIGINT) AS bal_milli_sum
         FROM c, pos
         WHERE bal_milli * n_pos > s_milli
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY 1""",
    "rel_q14_promo" ->
      s"""WITH a AS (
           SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS BIGINT)
               AS promo_milli,
             CAST(sum($rev) AS BIGINT) AS total_milli
           FROM lineitem JOIN part ON l_partkey = p_partkey)
         SELECT promo_milli, total_milli,
           100.0 * promo_milli / total_milli AS promo_pct FROM a""",
    "rel_pivot_returns" ->
      s"""SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN ${m("l_quantity")} END) AS BIGINT) AS "F",
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN ${m("l_quantity")} END) AS BIGINT) AS "O"
         FROM lineitem GROUP BY 1""",
    "rel_parts_intersect" ->
      s"""SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 49
         INTERSECT
         SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 49""",
    "rel_parts_except" ->
      s"""SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 49
         EXCEPT
         SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 49""",
    "rel_q6_forecast" ->
      s"""SELECT CAST(sum(${m("l_extendedprice * l_discount")}) AS BIGINT)
           AS revenue_milli, count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "rel_q10_returned" ->
      s"""SELECT c_custkey, c_name, ${m("c_acctbal")} AS acctbal_milli,
           CAST(sum($rev) AS BIGINT) AS revenue_milli
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1, 2, 3
         ORDER BY revenue_milli DESC, c_custkey ASC LIMIT 20""",
    "rel_salted_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
           CAST(sum($rev) AS BIGINT) AS rev_milli_sum
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "rel_q18_large_orders" ->
      s"""WITH big AS (
           SELECT l_orderkey, CAST(sum(${m("l_quantity")}) AS BIGINT) AS qty_milli
           FROM lineitem GROUP BY 1 HAVING qty_milli > 200000)
         SELECT o_orderkey, o_custkey, ${m("o_totalprice")} AS totalprice_milli, qty_milli
         FROM orders JOIN big ON o_orderkey = l_orderkey
         ORDER BY qty_milli DESC, o_orderkey ASC LIMIT 100""",
    "rel_q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum($rev) AS BIGINT) AS revenue_milli
         FROM lineitem, orders, customer, supplier, nation n1, nation n2
         WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND n1.n_name IN ('NATION_1', 'NATION_2')
           AND n2.n_name IN ('NATION_1', 'NATION_2')
           AND n1.n_name != n2.n_name
           AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
         GROUP BY 1, 2, 3""",
    "rel_q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN $rev ELSE 0 END) AS BIGINT)
             AS nation_milli,
           CAST(sum($rev) AS BIGINT) AS total_milli,
           CAST((sum(CASE WHEN sn.n_name = 'NATION_3' THEN $rev ELSE 0 END) * 1000)
             // sum($rev) AS BIGINT) AS share_permille
         FROM lineitem, orders, customer, supplier, part,
           nation cn, nation sn, region
         WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
           AND l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = r_regionkey
           AND r_name = 'ASIA' AND s_nationkey = sn.n_nationkey
           AND p_type = 'PROMO'
         GROUP BY 1""",
    "rel_q13_custdist" ->
      s"""WITH cc AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY 1)
         SELECT c_count, count(*) AS custdist FROM cc GROUP BY 1""",
    "rel_q19_disjunctive" ->
      s"""SELECT CAST(sum($rev) AS BIGINT) AS revenue_milli, count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 30
                AND l_quantity BETWEEN 10 AND 30)""")
}
