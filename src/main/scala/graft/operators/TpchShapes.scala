package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.sql

/** The remaining TPC-H query shapes (Q7, Q8, Q9, Q11, Q12, Q16, Q19, Q20,
  * Q21), adapted to the synthetic star schema — with the earlier q-family in
  * `Relational`, all 22 TPC-H planning patterns now have an oracle-checked
  * representative. The synthetic schema has no `partsupp`,
  * `l_commitdate`/`l_receiptdate`/`l_shipmode`, or `p_container`/`p_mfgr`,
  * so those queries substitute the closest available semantics (each doc
  * states the substitution); what is preserved is the PLANNING pattern each
  * query exists to exercise — nation-pair OR conditions (Q7), conditional
  * market share over a big join tree (Q8), multi-dim profit rollup (Q9),
  * group-vs-global-scalar HAVING (Q11), derived-class conditional counts
  * (Q12), distinct-agg after an anti-join (Q16), disjunctive OR-of-ANDs
  * predicates spanning both join sides (Q19), fraction-of-group semi-join
  * chains (Q20), and unique-extremum self-comparison on one fact table
  * (Q21).
  *
  * Shared precision discipline (QueryDef doc): money sums either exact
  * integer cents or `round(sum(double), 4)`; cut predicates always exact
  * cross-multiplied integers — a HAVING/WHERE on a float boundary is where
  * engines diverge.
  */
object TpchShapes {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
  private val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q7 shape (volume shipping): revenue flowing between two specific
    * nations, in BOTH directions, by ship year — the nation-PAIR OR
    * condition that cannot be pushed to either dimension alone. Scale plan:
    * the two-year shipdate range prunes the lineitem scan; supplier and
    * both nation copies are broadcast (the pair condition rides on
    * broadcast joins, never a fact-fact shuffle); orders→customer is the
    * only shuffled chain, and the pair filter applies before aggregation.
    * One partial-aggregable sum at the end. */
  val q7NationVolume = sql(
    "q7_nation_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2_key"),
      col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(round(sum(rev), 4).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** TPC-H Q8 shape (national market share): one nation's share of PROMO
    * revenue sold into ASIA, by order year — numerator-as-CASE inside the
    * same partial aggregate as the denominator (never two passes over the
    * join tree). Scale plan: customer shuffles once against orders; the
    * region cut rides the broadcast nation→region chain on the CUSTOMER
    * side; part (type-filtered) and supplier+nation are broadcast. The
    * share division happens on two already-4dp-rounded sums, so both
    * engines divide identical doubles. */
  val q8MarketShare = sql(
    "q8_market_share",
    """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
      |       round(round(sum(CASE WHEN n1.n_name = 'NATION_3'
      |                            THEN l.l_extendedprice * (1 - l.l_discount)
      |                            ELSE 0 END), 4)
      |             / round(sum(l.l_extendedprice * (1 - l.l_discount)), 4),
      |             4) AS mkt_share,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN part p     ON l.l_partkey = p.p_partkey
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      |JOIN region r   ON n2.n_regionkey = r.r_regionkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      |WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val custSide = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("n2_key"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custSide), col("c_nationkey") === col("n2_key"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        round(round(sum(when(col("supp_nation") === "NATION_3", rev).otherwise(0)), 4)
          / round(sum(rev), 4), 4).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("order_year")
  }

  /** TPC-H Q9 shape (product-type profit): profit on 'red …' parts by
    * supplier nation × order year. The schema has no `partsupp`, so supply
    * cost substitutes the stated synthetic model 60% of `p_retailprice`
    * (what is being exercised is the 5-table join into a two-dim rollup,
    * not the cost constants). Scale plan: the name filter cuts part to
    * ~1/8 BEFORE its broadcast, which then prunes the lineitem fact at the
    * join; orders arrives by shuffle only for its date column;
    * supplier/nation broadcast. Per-row profit is computed once in the
    * scan projection; one partial aggregate. */
  val q9ProductProfit = sql(
    "q9_product_profit",
    """SELECT n.n_name AS nation,
      |       CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)
      |                 - 0.6 * p.p_retailprice * l.l_quantity), 4) AS profit,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN part p     ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n   ON s.s_nationkey = n.n_nationkey
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |WHERE p.p_name LIKE 'red %'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val profit = rev - lit(0.6) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red %"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(profit), 4).as("profit"), count(lit(1)).as("n_items"))
      .orderBy("nation", "order_year")
  }

  /** TPC-H Q11 shape (important stock): parts whose supply value from one
    * region's suppliers exceeds 1/1000 of that universe's total — the
    * group-vs-GLOBAL-scalar HAVING. `partsupp` is absent; supply value
    * substitutes shipped `l_extendedprice` from EUROPE suppliers. Scale
    * plan: the region cut rides a broadcast supplier semi-join that prunes
    * the fact BEFORE aggregation; the per-part aggregate is
    * partial-aggregable; the global total re-aggregates the per-part
    * frame (not the fact) and broadcasts 1 row; the cut is the exact
    * integer test cents·1000 > total_cents — no float fraction. */
  val q11PartValue = sql(
    "q11_part_value",
    """WITH supply AS (
      |  SELECT l.l_partkey,
      |         CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
      |           AS value_cents
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n   ON s.s_nationkey = n.n_nationkey
      |  JOIN region r   ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'
      |  GROUP BY 1),
      |total AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM supply)
      |SELECT supply.l_partkey AS p_partkey, supply.value_cents
      |FROM supply CROSS JOIN total
      |WHERE supply.value_cents * 1000 > total.total_cents
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val euSupp = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val supply = Tables.lineitem(s, d)
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("value_cents"))
    val total = supply.agg(sum("value_cents").as("total_cents"))
    supply.crossJoin(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select("p_partkey", "value_cents")
      .orderBy("p_partkey")
  }

  /** TPC-H Q12 shape (shipping-mode priority): conditional priority counts
    * per DERIVED shipping class — `l_shipmode` is absent, so the class is
    * late-vs-prompt (shipped more / at most 60 days after the order date),
    * preserving the pattern: a computed row class feeding CASE-counts of a
    * joined attribute. Scale plan: lineitem needs only two columns + key;
    * orders arrives by shuffle; both CASE counts live in one partial
    * aggregate over the two-value class key. */
  val q12ShipPriority = sql(
    "q12_ship_priority",
    """SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |            THEN 'LATE' ELSE 'PROMPT' END AS ship_class,
      |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "LATE").otherwise("PROMPT").as("ship_class"))
      .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
      .orderBy("ship_class")
  }

  /** TPC-H Q16 shape (supplier count by part attrs): distinct-supplier
    * counts per (brand, type, size band) after EXCLUDING one brand, one
    * type, and blacklisted suppliers — COUNT DISTINCT stacked on an
    * anti-join. Scale plan: the brand/type cuts push into the broadcast
    * part side; the supplier blacklist (negative balance, 6 rows) is a
    * broadcast anti-join; count(DISTINCT) over the (attrs, suppkey) pairs
    * is Spark's two-shuffle expand — bounded by the distinct pair count,
    * not the fact. */
  val q16SupplierCnt = sql(
    "q16_supplier_cnt",
    """SELECT p.p_brand, p.p_type, p.p_size // 10 AS size_band,
      |       count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#4' AND p.p_type <> 'PROMO'
      |  AND NOT EXISTS (SELECT 1 FROM supplier s
      |                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val blacklist = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"),
        (col("p_size").cast("long") / 10).cast("long").as("size_band"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy("p_brand", "p_type", "size_band")
  }

  /** TPC-H Q19 shape (disjunctive revenue): an OR of three brand/size/
    * quantity conjuncts, each spanning BOTH join sides — the classic
    * "Catalyst can't decompose this OR" pushdown trap. Scale plan: the
    * disjunction's per-side IMPLIED envelopes are added as redundant
    * conjuncts — `p_brand IN (b1,b2,b3)` prunes part before its broadcast
    * and `l_quantity <= 40` reaches the lineitem parquet scan (PlanSpec
    * pins it in PushedFilters) — so the un-pushable OR evaluates only on
    * pre-pruned rows. The envelopes are implied by the OR, so the oracle
    * (which omits them) states identical semantics. */
  val q19DisjunctiveRevenue = sql(
    "q19_disjunctive_revenue",
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 20)
      |   OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 10 AND 30
      |       AND l.l_quantity BETWEEN 10 AND 30)
      |   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
      |       AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, d) =>
    val disjunction =
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#16" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40) // implied envelope
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#2", "Brand#16", "Brand#19"))),
        col("l_partkey") === col("p_partkey"))
      .filter(disjunction)
      .agg(round(sum(rev), 4).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20 shape (excess stock): suppliers in one region who shipped
    * MORE THAN HALF of some red part's 1997 volume — a fraction-of-group
    * cut feeding a semi-join up the dimension chain. Scale plan: year +
    * name filters prune the fact before its per-(part, supp) aggregate;
    * the per-part total re-aggregates THAT frame (never the fact twice);
    * the half cut is exact integers (quantities are integral doubles,
    * summed as BIGINT, cross-multiplied ×2); qualifying suppkeys semi-join
    * into the 100-row supplier dim. */
  val q20ExcessShippers = sql(
    "q20_excess_shippers",
    """WITH red97 AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_name LIKE 'red %'
      |    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey,
      |               CAST(sum(supp_qty) AS BIGINT) AS part_qty,
      |               count(*) AS n_supp
      |        FROM red97 GROUP BY 1)
      |SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
      |FROM red97 r
      |JOIN tot t ON r.l_partkey = t.l_partkey
      |JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region g ON n.n_regionkey = g.r_regionkey
      |WHERE t.n_supp > 1 AND r.supp_qty * 2 > t.part_qty
      |  AND g.r_name = 'AMERICA'
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val red97 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red %"))
        .select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("supp_qty"))
    val tot = red97.groupBy("l_partkey")
      .agg(sum("supp_qty").as("part_qty"), count(lit(1)).as("n_supp"))
    val amSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
    red97.join(tot.filter(col("n_supp") > 1), "l_partkey")
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .select("l_suppkey").distinct()
      .join(broadcast(amSupp), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): on multi-supplier
    * orders, the supplier who UNIQUELY shipped last — EXISTS(another
    * supplier) ∧ NOT-EXISTS(a later one) ∧ NOT-EXISTS(a tied one). The
    * textbook form scans lineitem three times; this plan derives all three
    * predicates from ONE per-order aggregate of the per-(order, supplier)
    * frame: n_supp > 1, max_ship_s = order max, and unique via "exactly one
    * supplier attains the max" (count of attainers == 1, computed as a
    * conditional count in the same aggregate — no third scan). Scale plan:
    * two stacked partial-aggregable groupBys on the same l_orderkey-
    * prefixed key (the second reuses the first's hash partitioning — AQE
    * coalesces, no second wide shuffle), one equi-join back, TakeOrdered
    * top-20. */
  val q21WaitingSuppliers = sql(
    "q21_waiting_suppliers",
    """WITH per_supp AS (
      |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
      |  FROM lineitem GROUP BY 1, 2),
      |per_order AS (
      |  SELECT l_orderkey, count(*) AS n_supp, max(supp_last) AS order_last
      |  FROM per_supp GROUP BY 1),
      |winners AS (
      |  SELECT ps.l_suppkey
      |  FROM per_supp ps
      |  JOIN per_order po ON ps.l_orderkey = po.l_orderkey
      |  WHERE po.n_supp > 1 AND ps.supp_last = po.order_last
      |    AND 1 = (SELECT count(*) FROM per_supp x
      |             WHERE x.l_orderkey = ps.l_orderkey
      |               AND x.supp_last = po.order_last))
      |SELECT s.s_name, count(*) AS numwait
      |FROM winners w JOIN supplier s ON w.l_suppkey = s.s_suppkey
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
    val perSupp = Tables.lineitem(s, d)
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("l_shipdate").as("supp_last"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), max("supp_last").as("order_last"))
    // attainers of the max per order, from the SAME per-supp frame
    val attainers = perSupp.join(
      perOrder.select("l_orderkey", "order_last", "n_supp"), "l_orderkey")
      .filter(col("supp_last") === col("order_last") && col("n_supp") > 1)
    val uniqueWins = attainers
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_att"), max("l_suppkey").as("l_suppkey"))
      .filter(col("n_att") === 1)
    uniqueWins
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  val defs: Seq[QueryDef] = Seq(
    q7NationVolume, q8MarketShare, q9ProductProfit, q11PartValue,
    q12ShipPriority, q16SupplierCnt, q19DisjunctiveRevenue,
    q20ExcessShippers, q21WaitingSuppliers)
}
