package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.{sql, rowsOnly}

/** Relational operator inventory — the SURVEY.md §2 surface re-expressed as
  * declarative Spark queries over the driver's synthetic tables.
  *
  * Every operator family the reference exercises (projections P1-P12, joins
  * J1-J2 + semi/anti, aggregations A1-A7, top-k/sort T1-T4, sinks' formatting
  * K1-K2, union) appears here as at least one oracle-checked query.
  *
  * Scale notes (100 TB target):
  *  - fact-table scans only touch the columns/rows they need (Catalyst pushes
  *    filters + projections into the parquet scan);
  *  - dimension sides of joins are explicitly `broadcast()` — no shuffle of
  *    the fact table for lookups (reference J1 is the same shape:
  *    dl_k_to_ss.py:370-395 closes a 1,169-row pandas table over executors);
  *  - all aggregations are partial-aggregable built-ins (map-side combine);
  *  - window top-k (T1/T2) shuffles once on the partition key, no global sort.
  */
object Relational {

  // ---------------------------------------------------------------- P-family

  /** P1+P12: value projection + string formatting (ml_k_to_ss.py:64, :51). */
  val p1Project = sql(
    "p1_project",
    """SELECT event_id, printf('%s,%.2f', event_type, value) AS msg
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        format_string("%s,%.2f", col("event_type"), col("value")).as("msg"))
      .orderBy("event_id")
  }

  /** P2+P3+K1: CSV format -> split -> typed re-extraction round trip
    * (ml_k_to_ss.py:65-66, col_mapping :9-14). Ints only in the line so the
    * string rendering is engine-independent. */
  val p2CsvRoundtrip = sql(
    "p2_csv_roundtrip",
    """SELECT CAST(parts[1] AS BIGINT) AS l_orderkey,
      |       CAST(parts[2] AS INT)    AS l_linenumber,
      |       CAST(parts[3] AS INT)    AS qty_int
      |FROM (SELECT string_split(
      |        concat_ws(',', l_orderkey, l_linenumber, CAST(l_quantity AS INT)),
      |        ',') AS parts
      |      FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(concat_ws(",", col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int")).as("line"))
      .select(split(col("line"), ",").as("parts"))
      .select(
        element_at(col("parts"), 1).cast("long").as("l_orderkey"),
        element_at(col("parts"), 2).cast("int").as("l_linenumber"),
        element_at(col("parts"), 3).cast("int").as("qty_int"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P6: probability-of-predicted-class — element_at into an array by a
    * row-dependent index (ml_k_to_ss.py:45-49). */
  val p6ElementAt = sql(
    "p6_element_at",
    """SELECT event_id,
      |       ([value, -value])[CAST(event_id % 2 AS INT) + 1] AS picked
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        element_at(array(col("value"), -col("value")),
          (col("event_id") % 2).cast("int") + 1).as("picked"))
      .orderBy("event_id")
  }

  /** P8: threshold filter pushed to the scan (detect.py:160-168). */
  val p8Filter = sql(
    "p8_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P2 (JSON flavor): parse events.props JSON and type the field. */
  val pJsonParse = sql(
    "p_json_parse",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- J-family

  /** J1: stream-static lookup as a broadcast left-outer equi-join with an
    * explicit miss sentinel (dl_k_to_ss.py:370-395; quirk Q4 fixed — the
    * reference crashes on a miss, we emit 'not found'). The dimension is
    * filtered to force ~10% misses so the sentinel path is exercised. */
  val j1LookupJoin = sql(
    "j1_lookup_join",
    """SELECT o.o_orderkey,
      |       coalesce(c.c_name, 'not found') AS cust_name,
      |       o.o_totalprice
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 10 <> 0) c
      |  ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val dim = Tables.customer(s, d).filter(col("c_custkey") % 10 =!= 0)
    Tables.orders(s, d)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("o_orderkey"),
        coalesce(col("c_name"), lit("not found")).as("cust_name"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** J2: nearest-centroid theta-join (dl_k_to_ss.py:337-344) generalized to
    * k centroids: per-nation supplier acctbal centroids (tiny, broadcast),
    * every customer assigned the centroid minimizing L1 distance.
    * Deterministic tie-break on the centroid key. */
  val j2NearestCentroid = sql(
    "j2_nearest_centroid",
    """WITH cent AS (
      |  SELECT s_nationkey, round(avg(s_acctbal), 4) AS cent
      |  FROM supplier GROUP BY s_nationkey
      |), scored AS (
      |  SELECT c.c_custkey, ct.s_nationkey AS near_nation,
      |         row_number() OVER (PARTITION BY c.c_custkey
      |                            ORDER BY abs(c.c_acctbal - ct.cent), ct.s_nationkey) AS rn
      |  FROM customer c CROSS JOIN cent ct
      |)
      |SELECT c_custkey, near_nation FROM scored WHERE rn = 1
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val cent = Tables.supplier(s, d)
      .groupBy("s_nationkey").agg(round(avg("s_acctbal"), 4).as("cent"))
    val w = Window.partitionBy("c_custkey")
      .orderBy(abs(col("c_acctbal") - col("cent")), col("s_nationkey"))
    Tables.customer(s, d)
      .crossJoin(broadcast(cent))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("s_nationkey").as("near_nation"))
      .orderBy("c_custkey")
  }

  /** Left-semi: orders having any heavy lineitem (EXISTS). */
  val j4Semi = sql(
    "j4_semi_join",
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val heavy = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    Tables.orders(s, d)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti: orders with no heavy lineitem (NOT EXISTS). */
  val j5Anti = sql(
    "j5_anti_join",
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val heavy = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    Tables.orders(s, d)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** J6 (beyond ref): SKEW-SALTED shuffle join — the explicit remedy when a
    * shuffle join key has a few mega-groups and the dimension is too large
    * to broadcast (AQE's skew join SPLITS oversized partitions reactively;
    * salting prevents them by construction — the production belt+braces).
    * The fact side derives `salt = pmod(xxhash64(row keys), 8)`; the dim
    * side replicates each row ×8 with every salt; the join key widens from
    * 5 hot values to 40 evenly-spread composites, and each fact row still
    * matches exactly one dim copy. The shuffle_hash hint pins the shuffled
    * path (at demo scale the 40-row dim would otherwise broadcast and hide
    * the skew story). The ORACLE runs the plain UNSALTED join — proof the
    * rewrite preserves semantics exactly. */
  val j6Salted = sql(
    "j6_salted_join",
    """WITH f AS (SELECT l_orderkey % 5 AS hot, l_quantity FROM lineitem),
      |dim AS (SELECT o_orderkey % 5 AS hot,
      |               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS grp_cents
      |        FROM orders GROUP BY 1)
      |SELECT f.hot, count(*) AS n_li,
      |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |       max(dim.grp_cents) AS grp_cents
      |FROM f JOIN dim ON f.hot = dim.hot
      |GROUP BY f.hot ORDER BY f.hot""".stripMargin) { (s, d) =>
    val Salts = 8L
    val f = Tables.lineitem(s, d).select(
      (col("l_orderkey") % 5).as("hot"), col("l_quantity"),
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts)).as("salt"))
    val dim = Tables.orders(s, d)
      .groupBy((col("o_orderkey") % 5).as("hot"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("grp_cents"))
      .select(col("hot"), col("grp_cents"),
        explode(sequence(lit(0L), lit(Salts - 1))).as("salt"))
    f.join(dim.hint("shuffle_hash"), Seq("hot", "salt"))
      .groupBy("hot")
      .agg(count(lit(1)).as("n_li"),
        sum("l_quantity").cast("long").as("sum_qty"),
        max("grp_cents").as("grp_cents"))
      .orderBy("hot")
  }

  // ---------------------------------------------------------------- A-family

  /** A1: exact group-by median (dl_k_to_ss.py:67-69 — pandas
    * groupby().median(); Spark `median` and DuckDB `median` both interpolate
    * (lo+hi)/2 for even counts, so raw doubles hash-match). */
  val a1Median = sql(
    "a1_median",
    """SELECT c_mktsegment, median(c_acctbal) AS med_bal, count(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(median(col("c_acctbal")).as("med_bal"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** A2: histogram + normalize-to-1 (color/utils.py:6-17). */
  val a2Histogram = sql(
    "a2_histogram",
    """SELECT event_type, count(*) AS cnt,
      |       round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS share
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    // global total via broadcast scalar, not an unpartitioned window (which
    // would single-partition the data at scale)
    val counts = Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") * lit(1.0) / col("total"), 4))
      .drop("total")
      .orderBy("event_type")
  }

  /** A3: arg-max of a grouped aggregate (dl_k_to_ss.py:332-336) — per user,
    * the event_type with the highest total value. Ties broken on type. */
  val a3Argmax = sql(
    "a3_argmax",
    """WITH g AS (
      |  SELECT user_id, event_type, round(sum(value), 4) AS tot
      |  FROM events GROUP BY user_id, event_type
      |), r AS (
      |  SELECT user_id, event_type, tot,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY tot DESC, event_type) AS rn
      |  FROM g
      |)
      |SELECT user_id, event_type AS top_type, tot FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val g = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(round(sum("value"), 4).as("tot"))
    val w = Window.partitionBy("user_id").orderBy(col("tot").desc, col("event_type"))
    g.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("tot"))
      .orderBy("user_id")
  }

  /** A6: global mean (preprocess.py:71-75). Non-terminating decimal → round4
    * on a division of a 2-dp-sum by a count; boundary probability ~0. */
  val a6GlobalMean = sql(
    "a6_global_mean",
    """SELECT round(sum(l_quantity), 2)                AS sum_qty,
      |       count(*)                                 AS n,
      |       round(sum(l_quantity) / count(*), 4)     AS mean_qty
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).agg(
      round(sum("l_quantity"), 2).as("sum_qty"),
      count(lit(1)).as("n"),
      round(sum("l_quantity") / count(lit(1)), 4).as("mean_qty"))
  }

  /** A7: precision/recall/F1-style conditional-count aggregate
    * (evaluate.py:33-61): "detected" = qty>25, "truth" = discount>0.03. */
  val a7Metrics = sql(
    "a7_metrics",
    """SELECT CAST(sum(CASE WHEN l_quantity > 25 AND l_discount > 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)  AS detected,
      |       CAST(sum(CASE WHEN l_discount > 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS truth,
      |       round(sum(CASE WHEN l_quantity > 25 AND l_discount > 0.03 THEN 1 ELSE 0 END) * 1.0
      |             / sum(CASE WHEN l_discount > 0.03 THEN 1 ELSE 0 END), 4) AS recall
      |FROM lineitem""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val tp = sum(when(col("l_quantity") > 25 && col("l_discount") > 0.03, 1).otherwise(0))
    val det = sum(when(col("l_quantity") > 25, 1).otherwise(0))
    val tru = sum(when(col("l_discount") > 0.03, 1).otherwise(0))
    li.agg(tp.as("tp"), det.as("detected"), tru.as("truth"),
      round(tp * lit(1.0) / tru, 4).as("recall"))
  }

  /** Headline pricing summary (TPC-H Q1 shape): full A-family partial-agg
    * pipeline — map-side combine on 4 running sums + counts, one shuffle on
    * the tiny (flag,status) key space. */
  val q1Agg = sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)                               AS sum_qty,
      |       round(sum(l_extendedprice), 2)                          AS sum_base,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4)       AS sum_disc,
      |       round(sum(l_quantity) / count(*), 4)                    AS avg_qty,
      |       count(*)                                                AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc"),
        round(sum("l_quantity") / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Headline join-aggregate (TPC-H Q5 shape): revenue per nation through a
    * customer->orders->lineitem chain with broadcast dimensions. */
  val q3RevenueByNation = sql(
    "q3_revenue_by_nation",
    """SELECT n.n_name,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q6 shape: forecast-revenue-change — a pure scan-side query, no
    * join, no wide agg. Its entire value at 100 TB is PREDICATE PUSHDOWN:
    * all three filters (shipdate year, discount band, quantity cap) must
    * reach the parquet reader so row groups outside the year are never
    * decompressed, and the scan schema carries only the 4 touched columns.
    * PlanSpec pins both properties. */
  val q6ForecastRevenue = sql(
    "q6_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14 shape: promo-revenue share for one shipping month — the
    * conditional-aggregate-over-a-join pattern. Scale plan: the one-month
    * shipdate range is pushed to the lineitem scan BEFORE the join (the
    * filter cuts ~99% of the fact side at TPC-H date spreads), part is the
    * small side and broadcast, and the CASE lives inside one partial
    * aggregate — one pass, no second join for the denominator. */
  val q14PromoShare = sql(
    "q14_promo_share",
    """SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
      |                              THEN l.l_extendedprice * (1 - l.l_discount)
      |                              ELSE 0 END)
      |             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share,
      |       count(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      |  AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'""".stripMargin) { (s, d) =>
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-09-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-10-01 00:00:00")))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0))
          / sum(rev), 4).as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  /** Full TPC-H Q5 shape: region-filtered revenue where the SUPPLIER and the
    * customer share a nation — a six-table join tree. Scale plan: the order
    * date filter prunes the orders scan before its shuffle join with
    * lineitem; customer joins on the shuffled o_custkey; supplier, nation
    * and the pre-filtered region are broadcast (no fact shuffle for any
    * dimension). The c_nationkey = s_nationkey condition rides on the
    * broadcast supplier join rather than forming its own join. */
  val q5RegionRevenue = sql(
    "q5_region_revenue",
    """SELECT n.n_name,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |                AND c.c_nationkey = s.s_nationkey
      |JOIN nation n   ON s.s_nationkey = n.n_nationkey
      |JOIN region r   ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    Tables.lineitem(s, d)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q10 shape: top-20 customers by revenue from RETURNED items —
    * top-k AFTER a join-aggregate, the "worst offenders" report pattern.
    * The returnflag filter is pushed into the lineitem scan (prunes before
    * the first shuffle); the final top-20 is TakeOrderedAndProject over the
    * aggregate (per-partition top-k merge, never a global sort of all
    * customers). Ranked on the 4-dp-rounded revenue with a custkey
    * tie-break so both engines order bit-identical values. */
  val q10ReturnedTopk = sql(
    "q10_returned_topk",
    """SELECT c.c_custkey, c.c_name,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape (large-volume orders): aggregate → HAVING → semi-join
    * back to the facts — the "find the whales, then pull their detail"
    * pattern. The qualifying-order set is a lineitem aggregate filtered to
    * sum(qty) > 350 (66 orders at sf0.1): AQE sees the tiny post-HAVING
    * side and broadcasts it, so neither orders nor lineitem re-shuffles for
    * the semi-join. Quantities are integral by data contract and summed as
    * BIGINT — the HAVING cut is an exact integer comparison, never a float
    * boundary. Final order rides the exact cents total. */
  val q18LargeOrders = sql(
    "q18_large_orders",
    """WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |             FROM lineitem GROUP BY l_orderkey
      |             HAVING sum(CAST(l_quantity AS BIGINT)) > 350)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey,
      |       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS price_cents,
      |       b.total_qty
      |FROM big b
      |JOIN orders o   ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY price_cents DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 350)
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("total_qty"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q4 shape (order-priority checking): EXISTS-correlated semi-join
    * with a condition spanning BOTH sides (line shipped >75 days after the
    * order date). The year filter prunes the orders scan; the EXISTS is a
    * LeftSemi join on the order key — each order contributes once no matter
    * how many late lines it has, so the fact side never fans out. The
    * cross-side predicate rides on the semi-join condition rather than
    * forcing a pre-join materialization. */
  val q4LateOrders = sql(
    "q4_late_orders",
    """SELECT o.o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    * with the filter ON THE JOIN CONDITION (a WHERE would silently turn it
    * inner and drop zero-order customers), then a two-level aggregate.
    * count(o_orderkey) — not count(*) — is what makes an unmatched customer
    * count 0. Both aggregates are partial-aggregable; the second one runs
    * over one row per customer. */
  val q13CustDistribution = sql(
    "q13_cust_distribution",
    """WITH per_cust AS (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      |  FROM customer c LEFT JOIN orders o
      |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |SELECT n_orders, count(*) AS n_custs
      |FROM per_cust GROUP BY n_orders
      |ORDER BY n_custs DESC, n_orders DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey"),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("n_orders").desc)
  }

  /** TPC-H Q15 shape (top supplier): a revenue view consumed TWICE — once
    * for the per-supplier totals, once for the global max — then an
    * equi-filter on the max. Revenue is summed in exact cents so the
    * max-equality cut can never sit on a float boundary. Scale plan: the
    * 3-month shipdate range is pushed to the scan; the two consumers of the
    * view produce IDENTICAL shuffles, which Spark's ReuseExchange
    * deduplicates — lineitem is scanned and aggregated ONCE at runtime
    * (plan-guarded); the 1-row max side is broadcast. */
  val q15TopSupplier = sql(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.rev_cents
      |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    // the explicit isNotNull matches the predicate the supplier join pushes
    // into the totals branch — without it the two rev subtrees canonicalize
    // differently and ReuseExchange cannot dedup them (suppkey is non-null
    // by data contract, so semantics are unchanged)
    def rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")) &&
        col("l_suppkey").isNotNull)
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rev_cents"))
    rev
      .join(broadcast(rev.agg(max("rev_cents").as("mx"))),
        col("rev_cents") === col("mx"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17 shape (small-quantity revenue): join the fact against ITS OWN
    * per-part aggregate — the "compare each row to its group's statistic"
    * pattern. The brand filter is applied (via a broadcast part join) BEFORE
    * the per-part aggregate: partkey determines brand, so the statistic is
    * unchanged but both the aggregate and the self-join run on ~1/25 of the
    * fact. The below-half-average predicate is the cross-multiplied exact
    * integer test 2·qty·n < Σqty (quantities are integral by data contract)
    * — no float average ever exists, so the cut is engine-stable. Revenue is
    * summed in exact cents. */
  val q17SmallQtyRevenue = sql(
    "q17_small_qty_revenue",
    """WITH base AS (
      |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand = 'Brand#4'),
      |pq AS (
      |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |         count(*) AS n_lines
      |  FROM base GROUP BY l_partkey)
      |SELECT CAST(sum(CAST(round(b.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       count(*) AS n_items
      |FROM base b JOIN pq ON b.l_partkey = pq.l_partkey
      |WHERE 2 * CAST(b.l_quantity AS BIGINT) * pq.n_lines < pq.sum_qty""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#4")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val pq = base.groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
    base.join(pq, "l_partkey")
      .filter(lit(2) * col("l_quantity").cast("long") * col("n_lines") < col("sum_qty"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape (idle big-balance customers): an above-average scalar
    * subquery AND a NOT-EXISTS anti-join in one query. "Idle" = no order
    * since 2000-01-01 (every synthetic customer has SOME order, so the
    * literal no-orders-ever cut would be empty). The above-average predicate
    * is the cross-multiplied exact test cents·n > Σcents over half-up cent
    * roundings — no float average. Scale plan: the date filter prunes the
    * orders scan feeding the anti-join; the 1-row stats side and the
    * 25-row nation dimension are broadcast; the anti-join is the only fact
    * shuffle. */
  val q22IdleCustomers = sql(
    "q22_idle_customers",
    """WITH act AS (
      |  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
      |         count(*) AS n
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n.n_name, count(*) AS n_cust,
      |       CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |CROSS JOIN act
      |WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) * act.n > act.sum_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
    val cents = round(col("c_acctbal") * 100).cast("long")
    val act = Tables.customer(s, d).filter(col("c_acctbal") > 0)
      .agg(sum(cents).as("sum_cents"), count(lit(1)).as("n"))
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select("o_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .crossJoin(broadcast(act))
      .filter(cents * col("n") > col("sum_cents"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum(cents).as("total_cents"))
      .orderBy("n_name")
  }

  /** TPC-H Q2 shape (min-cost supplier): for each large part, the supplier
    * with the LOWEST unit price ever charged — the correlated-min pattern.
    * Spark realizes the per-part argmin as `min(struct(price, suppkey))`:
    * partial-aggregable with a deterministic suppkey tie-break, NO window
    * function and no join-back-to-the-min — strictly cheaper at 100 TB than
    * the textbook correlated subquery (the oracle spells the same semantics
    * with a window rank, proving equivalence). The size filter restricts
    * the fact via a broadcast semi-ish join BEFORE any aggregation. Unit
    * price is carried as an EXACT integer — cents × 10⁴ floor-divided by
    * the (integral) quantity — because a 4-dp-rounded double comparison
    * genuinely diverged between engines on a half-way value (27.97725):
    * BigDecimal HALF_UP vs float nearbyint round it differently; integer
    * arithmetic cannot. */
  val q2MinCostSupplier = sql(
    "q2_min_cost_supplier",
    """WITH offer AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |         min(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) * 10000
      |             // CAST(l.l_quantity AS BIGINT)) AS unit_price_e4
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_size >= 40
      |  GROUP BY l.l_partkey, l.l_suppkey),
      |best AS (
      |  SELECT l_partkey, l_suppkey, unit_price_e4,
      |         row_number() OVER (PARTITION BY l_partkey
      |                            ORDER BY unit_price_e4, l_suppkey) AS rn
      |  FROM offer)
      |SELECT b.l_partkey AS p_partkey, p.p_name, s.s_name, b.unit_price_e4
      |FROM best b
      |JOIN part p ON b.l_partkey = p.p_partkey
      |JOIN supplier s ON b.l_suppkey = s.s_suppkey
      |WHERE b.rn = 1
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val bigParts = Tables.part(s, d).filter(col("p_size") >= 40)
      .select("p_partkey", "p_name")
    val unitE4 = expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000" +
      " div CAST(l_quantity AS BIGINT)")
    val offer = Tables.lineitem(s, d)
      .join(broadcast(bigParts.select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(unitE4).as("unit_price_e4"))
    offer
      .groupBy("l_partkey")
      .agg(min(struct(col("unit_price_e4"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"),
        col("m.unit_price_e4").as("unit_price_e4"), col("m.l_suppkey").as("l_suppkey"))
      .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"), col("s_name"),
        col("unit_price_e4"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- T-family

  /** T1/T2-style top-k per group: top 3 customers by acctbal per segment —
    * one shuffle on the group key, rank inside the partition (no global
    * sort; at 100 TB this is the only scalable top-k shape). */
  val t1TopK = sql(
    "t1_topk_per_group",
    """SELECT c_mktsegment, c_custkey, c_acctbal
      |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
      |             row_number() OVER (PARTITION BY c_mktsegment
      |                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      |      FROM customer)
      |WHERE rn <= 3 ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    // top-3 per segment as a bounded-heap CollectTopK aggregate
    // (round 12): a rank window would map-side sort each segment's
    // CORPUS-sized customer list; the heap keeps 3 rows of state per
    // segment and the shuffle carries only those. Key (0.0 − acctbal,
    // custkey) ≡ ORDER BY c_acctbal DESC, c_custkey (the 0.0− form
    // normalizes a negative zero so it cannot order against +0.0
    // differently than the window's sort). NULL-ordering asymmetry
    // (latent, r12 ADVICE): the ascending struct compare ranks a NULL
    // key component FIRST, whereas the window's `c_acctbal DESC` default
    // is NULLS LAST — c_acctbal is non-null on every TPC-H corpus, but a
    // future nullable consumer of this pattern must coalesce the key
    // (NULL → −infinity) or pre-filter nulls to keep window parity.
    val key = struct((lit(0.0) - col("c_acctbal")).as("nb"),
      col("c_custkey").as("c_custkey"), col("c_acctbal").as("c_acctbal"))
    Tables.customer(s, d).groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.GraftSqlBridge
        .collectTopK(key, 3, reverse = true).as("tk"))
      .select(col("c_mktsegment"), explode(col("tk")).as("x"))
      .select(col("c_mktsegment"), col("x.c_custkey").as("c_custkey"),
        col("x.c_acctbal").as("c_acctbal"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** T2/T4: max-by per key with deterministic tie-break (detect.py:114-138 —
    * max-area box selection): per order, the heaviest lineitem.
    *
    * Shape: `max_by` HASH AGGREGATE, not a row_number window. The window
    * form shuffles every lineitem and SORTS each order's rows just to keep
    * one; the aggregate gets map-side partial aggregation (each mapper
    * emits one candidate per order it sees) and no sort — the winning
    * shape when rows-per-key ≫ 1 at 100 TB. Tie-break is encoded in the
    * ordering struct: (quantity, −linenumber) max ⇒ highest quantity,
    * then LOWEST linenumber — same row the rn=1 oracle picks. */
  val t2MaxBy = sql(
    "t2_maxby",
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
      |             row_number() OVER (PARTITION BY l_orderkey
      |                                ORDER BY l_quantity DESC, l_linenumber) AS rn
      |      FROM lineitem)
      |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(max_by(
        struct(col("l_linenumber"), col("l_quantity")),
        struct(col("l_quantity"), (-col("l_linenumber")).as("nl"))).as("m"))
      .select(col("l_orderkey"), col("m.l_linenumber"), col("m.l_quantity"))
      .orderBy("l_orderkey")
  }

  /** Windowed running aggregate (beyond-reference analytics): per-user
    * running total of event values in time order. */
  val w1Running = sql(
    "w1_running_sum",
    """SELECT event_id, user_id,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING), 4) AS running
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 4).as("running"))
      .orderBy("user_id", "event_id")
  }

  // ------------------------------------------------------------ set ops / K

  /** Union of filtered subsets (extractor.py:70-78 concat pattern). */
  val u1Union = sql(
    "u1_union",
    """SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 300000
      |UNION ALL
      |SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 30000
      |ORDER BY o_orderkey, bucket""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), lit("hi").as("bucket"))
      .unionAll(
        o.filter(col("o_totalprice") < 30000)
          .select(col("o_orderkey"), lit("lo").as("bucket")))
      .orderBy("o_orderkey", "bucket")
  }

  /** K2: group-to-array then explode (flatten) round trip
    * (dl_k_to_ss.py:397-415 flattens per-image player lists). */
  val k2Explode = sql(
    "k2_explode",
    """SELECT user_id, unnest(l) AS et
      |FROM (SELECT user_id, list_sort(list(event_type)) AS l
      |      FROM events GROUP BY user_id)
      |ORDER BY user_id, et""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(sort_array(collect_list("event_type")).as("l"))
      .select(col("user_id"), explode(col("l")).as("et"))
      .orderBy("user_id", "et")
  }

  val defs: Seq[QueryDef] = Seq(
    p1Project, p2CsvRoundtrip, p6ElementAt, p8Filter, pJsonParse,
    j1LookupJoin, j2NearestCentroid, j4Semi, j5Anti, j6Salted,
    a1Median, a2Histogram, a3Argmax, a6GlobalMean, a7Metrics,
    q1Agg, q3RevenueByNation, q5RegionRevenue, q6ForecastRevenue,
    q10ReturnedTopk, q14PromoShare, q18LargeOrders,
    q4LateOrders, q13CustDistribution, q15TopSupplier,
    q17SmallQtyRevenue, q22IdleCustomers, q2MinCostSupplier,
    t1TopK, t2MaxBy, w1Running,
    u1Union, k2Explode)
}
