package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Relational analytics over the harness star schema (TESTDATA.md) —
  * aggregation, multi-way joins, ranking windows. These go beyond the
  * reference's operator set (it has no joins/sorts, SURVEY.md §2.6) and
  * exist to prove the engine's relational core at scale.
  *
  * Scale notes baked into every query:
  *  - money arithmetic is done in DECIMAL so results are bit-stable across
  *    partitionings/engines (double sums are order-dependent);
  *  - dimension tables (customer/nation/region/supplier) are broadcast —
  *    no shuffle of the fact table for those joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *    reuse that partitioning for the following aggregation where possible;
  *  - ratios (averages) divide two exact decimals cast to double — IEEE
  *    division is deterministic given identical inputs.
  */
object Relational {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary over lineitem: grouped algebraic
    * aggregates; partial agg before the single exchange; ~O(|groups|) state.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style revenue of top unshipped orders: broadcast the selective
    * customer dim, shuffle-join orders⋈lineitem on orderkey, aggregate, then
    * TakeOrderedAndProject (no global sort materialization) for the top-k.
    * Revenue is exact decimal → deterministic top-k given the id tie-break.
    */
  def topRevenueOrders(spark: SparkSession, dir: String, segment: String = "BUILDING", k: Int = 10): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === segment)
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q5-flavored revenue by nation: the fact table shuffles once
    * (orders⋈lineitem); every dimension hop (customer→nation→region) is a
    * broadcast join, so adding dimensions costs no extra exchange.
    */
  def revenueByNation(spark: SparkSession, dir: String, regionName: String = "ASIA"): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === regionName).select("r_regionkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
    val dims = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    ord.join(broadcast(dims), ord("o_custkey") === dims("c_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Ranking window: top-k orders per market segment via row_number —
    * partition-local sort after one hash exchange on the partition key.
    */
  def topOrdersPerSegment(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(dec("o_totalprice").desc, col("o_orderkey").asc)
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("c_mktsegment"), col("rank"), col("o_orderkey"),
        dec("o_totalprice").cast("double").as("o_totalprice"))
  }

  /** Top-k orders per segment via the bounded-heap TopKAggregator (typed
    * UDAF) instead of a ranking window: algebraic partial aggregation means
    * the shuffle carries ≤k rows per (segment, partition) and no per-group
    * sort runs — same result as `topOrdersPerSegment`, different (scalable)
    * physical shape. See graft.functions.TopKAggregator.
    */
  def topOrdersPerSegmentAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), dec("o_totalprice").cast("double").as("p"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("p"), col("o_orderkey")).as("topk"))
      .select(col("c_mktsegment"), posexplode(col("topk")).as(Seq("i", "t")))
      .select(col("c_mktsegment"), (col("i") + 1).cast("int").as("rank"),
        col("t._2").as("o_orderkey"), col("t._1").as("o_totalprice"))
  }

  /** TPC-H Q7-flavored volume shipping: bilateral trade revenue between two
    * nations by ship year — supplier side resolves through lineitem's
    * suppkey, customer side through orders; BOTH nation hops are broadcast
    * dimension joins, so the only fact exchange is the one orders⋈lineitem
    * shuffle on orderkey (the filter to the two nations is applied inside
    * the broadcast dims, shrinking the fact stream before it).
    */
  def volumeShipping(
      spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      .filter(col("n_name").isin(nationA, nationB))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      // exclude domestic flows: Q7 reports cross-nation trade only
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10-flavored returned-item losses: top-k customers by revenue on
    * R-flagged lineitems in a date window. Customer/nation hops broadcast;
    * the orderkey shuffle is the single fact exchange; the final top-k is
    * TakeOrderedAndProject over exact-decimal revenue (id tie-break).
    */
  def returnedItemLosses(
      spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01", k: Int = 20): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), dec("c_acctbal").cast("double").as("c_acctbal"),
        col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev_dec"), count(lit(1)).as("n_items"))
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"),
        col("rev_dec"), col("n_items"))
      .orderBy(col("rev_dec").desc, col("c_custkey").asc)
      .limit(k)
      .withColumn("revenue", col("rev_dec").cast("double"))
      .drop("rev_dec")
  }

  /** TPC-H Q14-flavored promo revenue share: conditional aggregation over
    * the lineitem⋈part join in one ship-month. Part is a dimension here
    * (broadcast); revenue sums stay DECIMAL to the end and the share
    * divides two exact decimals cast to double — engine-stable.
    */
  def promoRevenueShare(
      spark: SparkSession, dir: String,
      from: String = "1996-03-01", until: String = "1996-04-01"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_partkey"),
        (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("promo_dec"),
        sum(col("rev")).as("total_dec"))
      .select(
        col("promo_dec").cast("double").as("promo_revenue"),
        col("total_dec").cast("double").as("total_revenue"),
        round(lit(100.0) * col("promo_dec").cast("double") / col("total_dec").cast("double"), 6)
          .as("promo_share"))
  }

  /** TPC-H Q19-flavored disjunctive-predicate revenue: OR-of-ANDs over
    * (brand, size, quantity) groups across the lineitem⋈part join. The
    * part side pre-filters to the UNION of the groups' attribute ranges
    * before broadcasting (each group's part constraints are
    * part-side-only, so the fact stream only meets parts that can
    * possibly match); the per-group conjunctions evaluate post-join.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val groups = Seq(
      ("Brand#1", 1, 10, 1.0, 20.0),
      ("Brand#2", 11, 25, 10.0, 30.0),
      ("Brand#3", 26, 50, 20.0, 40.0))
    val partPre = groups.map { case (b, s1, s2, _, _) =>
      col("p_brand") === b && col("p_size").between(s1, s2)
    }.reduce(_ || _)
    val part = Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_size").filter(partPre)
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_quantity"),
      (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
    val full = groups.map { case (b, s1, s2, q1, q2) =>
      col("p_brand") === b && col("p_size").between(s1, s2) &&
        col("l_quantity").between(q1, q2)
    }.reduce(_ || _)
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(full)
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q13-flavored customer order-count distribution: customers
    * LEFT OUTER joined to a filtered orders side (the filter references
    * only the right side, so pre-filtering before the join is ON-clause
    * equivalent and pushes to the orders scan), counted per customer,
    * then a tiny second aggregation over the ≤|distinct counts| rows.
    *
    * Scale: the outer join shuffles both sides on custkey once; the
    * per-customer count REUSES that partitioning (same key → no second
    * exchange); the distribution agg sees one row per customer and
    * collapses to ~dozens of groups. All-integer output — no float
    * crosses the engine boundary.
    */
  def customerDistribution(
      spark: SparkSession, dir: String,
      excludePriority: String = "5-LOW"): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= excludePriority)
      .select("o_orderkey", "o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(cust("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17-flavored small-quantity revenue: lineitems of one brand's
    * parts whose quantity is below 20% of that part's average quantity,
    * summed and annualized. The classic correlated scalar subquery
    * decorrelates into a per-part aggregate joined back on partkey.
    *
    * Determinism: avg_qty = CAST(exact decimal sum AS DOUBLE) / count —
    * the sum is order-independent, so the double division (and the
    * 0.2*avg threshold) is bit-identical across engines/partitionings.
    * Scale: part is broadcast; the per-part agg and the join-back share
    * the l_partkey key, so the fact side shuffles once and the agg
    * output (|parts of brand| rows) rides the same partitioning.
    */
  def smallQuantityRevenue(
      spark: SparkSession, dir: String, brand: String = "Brand#1"): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === brand).select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = li.groupBy(col("l_partkey"))
      .agg((sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    li.join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (sum(dec("l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22-flavored sales opportunity: customers with above-average
    * positive account balance and no urgent orders, grouped by market
    * segment. The scalar-average subquery becomes a one-row broadcast
    * cross join (same labeled pattern as resample_hourly's bounds frame);
    * the NOT EXISTS becomes a left_anti join against the pre-filtered
    * urgent-orders side.
    *
    * Determinism: the average divides an exact decimal sum by a count in
    * double — engine-stable without rounding. Scale: the anti join
    * shuffles customer⋈orders on custkey once; the threshold frame is
    * one row.
    */
  def globalSalesOpportunity(
      spark: SparkSession, dir: String,
      urgentPriority: String = "1-URGENT"): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), dec("c_acctbal").as("bal"))
    val avgBal = cust.filter(col("bal") > 0)
      .agg((sum(col("bal")).cast("double") / count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === urgentPriority)
      .select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter(col("bal").cast("double") > col("avg_bal"))
      .join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("bal")).cast("double").as("total_bal"))
  }

  /** TPC-H Q15-flavored top supplier: revenue per supplier in a quarter,
    * keep the supplier(s) hitting the maximum. The "create view + max
    * subquery" shape decorrelates into one supplier-keyed aggregate, a
    * one-row max aggregate, and an EQUI-join on the exact-decimal revenue
    * (decimal equality is bit-stable — a double revenue here would make
    * the max join engine-dependent).
    */
  def topSupplier(
      spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("total_rev"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    rev.join(broadcast(maxRev), Seq("total_rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  /** TPC-H Q16-flavored supplier-part counts: distinct suppliers per
    * (brand, size) over the observed part-supplier pairs, excluding one
    * brand and suppliers on a deny list (NOT IN → broadcast left_anti —
    * never a shuffled subquery). The distinct pair projection is the one
    * fact shuffle; part is broadcast.
    */
  def supplierPartCounts(
      spark: SparkSession, dir: String,
      excludeBrand: String = "Brand#1"): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val denied = Tables.supplier(spark, dir)
      .filter(dec("s_acctbal") < 0).select("s_suppkey")
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= excludeBrand)
      .select("p_partkey", "p_brand", "p_size")
    ps.join(broadcast(denied), ps("l_suppkey") === denied("s_suppkey"), "left_anti")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q2-flavored min-cost supplier: for each part of one brand, the
    * supplier offering the minimum observed price (offers derived from
    * distinct (part, supplier) lineitem pairs — the partsupp stand-in this
    * schema affords). The correlated min subquery decorrelates into a
    * per-part ranking window over the OFFER table (offers per part are
    * few — the window frame is supplier-count-bounded, never fact-sized);
    * cost stays DECIMAL so the min and its tie-break are bit-stable.
    */
  def minCostSupplier(
      spark: SparkSession, dir: String, brand: String = "Brand#2"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === brand).select("p_partkey", "p_name")
    val offers = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec("l_extendedprice")).as("cost"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("cost").asc, col("l_suppkey").asc)
    offers.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("cost").cast("double").as("min_cost"))
  }

  /** TPC-H Q9 shape: product-type profit by supplier nation and order
    * year. The schema carries no partsupp, so supply cost is the stand-in
    * 60% of `p_retailprice` (the TPC-H generator itself prices
    * ps_supplycost off the part's retail price) — an exact DECIMAL
    * product, so profit stays bit-stable. Part and supplier-nation are
    * broadcast; the one fact-fact shuffle is orders⋈lineitem for the
    * order year.
    */
  def productTypeProfit(
      spark: SparkSession, dir: String, nameLike: String = "widget"): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    // Deliberately TIGHT decimal types: the three-factor product must stay
    // inside both engines' 38-digit decimal ceiling END TO END (DuckDB
    // widens sums to precision 38, Spark adds 10), or one engine silently
    // rounds/overflows where the other doesn't. (12,2)×(3,2)×(6,2) sums
    // at scale 6 well under the ceiling in both.
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains(nameLike))
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(12,2)") *
          lit("0.60").cast("decimal(3,2)")).as("supp_cost"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") -
            col("l_discount").cast("decimal(4,2)"))).as("rev"),
        col("l_quantity").cast("decimal(6,2)").as("qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev") - col("supp_cost") * col("qty")).as("profit_dec"))
      .select(col("n_name").as("nation"), col("o_year"),
        col("profit_dec").cast("double").as("profit"))
  }

  /** TPC-H Q11 shape: parts whose revenue-weighted "stock value" exceeds a
    * fixed fraction of the corpus-wide total — groupBy part, then a HAVING
    * against a broadcast one-row scalar aggregate (never a second scan
    * pass over per-part state). The comparison multiplies the total by an
    * exact DECIMAL fraction so the strict `>` cannot flip between engines.
    */
  def importantStock(
      spark: SparkSession, dir: String,
      fracNumer: Int = 7, fracDenom: Int = 10000): DataFrame = {
    // The HAVING boundary `val > (numer/denom) × total` is evaluated as
    // the cross-multiplied INTEGER form `val × denom > total × numer` on
    // decimals re-tightened to (18,4) after the sum — multiplying a
    // precision-38 sum would overflow DuckDB's decimal ceiling and force
    // a lossy fallback on exactly one engine.
    val value = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
        .cast("decimal(18,4)").as("val_dec"))
    val total = value.agg(sum(col("val_dec")).cast("decimal(18,4)").as("tot_dec"))
    value.join(broadcast(total))
      .filter(col("val_dec") * lit(fracDenom) > col("tot_dec") * lit(fracNumer))
      .select(col("l_partkey"), col("val_dec").cast("double").as("stock_value"))
  }

  /** TPC-H Q12 shape: conditional priority counts among late-shipped
    * lines, grouped by return flag (the schema's categorical stand-in for
    * ship mode): one fact-fact shuffle, then CASE-sum conditional
    * aggregation — the map-side partial agg collapses each partition to
    * |flags| rows before the exchange.
    */
  def priorityLateness(
      spark: SparkSession, dir: String, lateDays: Int = 90): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
  }

  /** TPC-H Q20 shape: suppliers who shipped more than `minQty` units of a
    * name-filtered part family inside one year — the nested semi-join
    * chain (part filter → per-(supplier, part) HAVING → distinct suppliers
    * → LEFT SEMI against supplier). Quantities sum in DECIMAL so the
    * HAVING boundary is exact.
    */
  def promotableSuppliers(
      spark: SparkSession, dir: String, nameLike: String = "widget",
      year: Int = 1996, minQty: Int = 50): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains(nameLike)).select("p_partkey")
    val shippers = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec("l_quantity")).as("qty"))
      .filter(col("qty") > lit(minQty).cast("decimal(18,2)"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    * multi-supplier finalized order. The textbook form is a correlated
    * EXISTS + NOT-EXISTS pair over lineitem; here it is hand-decorrelated
    * into one per-order aggregate — count of distinct suppliers, count of
    * distinct LATE suppliers, and (via max over a CASE) the unique late
    * supplier when exactly one exists — so the fact table is scanned once
    * and shuffled once instead of three self-joins. The DuckDB oracle runs
    * the literal double-EXISTS formulation, cross-proving the
    * decorrelation. `numwait` counts qualifying orders per supplier.
    */
  def waitingSuppliers(
      spark: SparkSession, dir: String, lateDays: Int = 90): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val lx = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("late"))
    lx.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** Grouped order stats per customer with exact-decimal average — the
    * sum/count division happens on exact inputs so it is engine-stable.
    */
  def customerOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).as("total_dec"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    perCust.join(broadcast(cust), perCust("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("total_dec")).cast("double").as("total_price"))
  }
}
