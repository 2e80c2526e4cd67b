package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Qdsl._

/** Registry part 7 — product/growth analytics over the event stream and
  * the order history: rolling active-user counts, referential-integrity
  * audits, audience overlap, ML feature generation, and revenue
  * concentration. Same determinism contract as every other part
  * (exact integer/decimal shuffles, single float op at the end, total
  * ORDER BY on non-null keys). */
private[graft] object QueriesAnalytics {

  /** Rolling distinct active users — DAU and trailing-7-day WAU per
    * day. A windowed COUNT(DISTINCT) cannot be expressed as a window
    * function (distinct isn't decomposable over frames), and the naive
    * self-join `events × dates` re-scans raw events once per report
    * day. The scale shape: collapse raw events to distinct
    * (user, day) FIRST — one shuffle, output bounded by active-pairs,
    * not event volume — then fan each pair out to the ≤7 report dates
    * it supports (`explode(sequence(0,6))`, a bounded ×7 expansion of
    * the SMALL relation), semi-join to observed dates (broadcast — the
    * date domain is tiny by construction), and re-distinct on
    * (date, user) so the final per-date count is a plain count. Every
    * shuffle carries (8-byte user, 4-byte date); raw events are
    * touched exactly once. At 100 TB the same plan holds: the ×7
    * blow-up applies to the deduped pair set, and a 28-day MAU is the
    * same plan with a ×28 constant. */
  private[graft] val rollingActiveUsers = Q("kpi_rolling_active_users",
    (s, dir) => {
      val ud = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val dates = ud.select(col("d").as("date")).distinct()
      val dau = ud.groupBy(col("d").as("date"))
        .agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("d"))
        .select(col("user_id"), date_add(col("d"), col("off")).as("date"))
        .join(broadcast(dates), Seq("date")) // only observed report days
        .distinct() // a user active on several days counts once per window
        .groupBy("date")
        .agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("date")).orderBy("date")
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events),
      days AS (SELECT DISTINCT d AS date FROM ud),
      win AS (SELECT DISTINCT dy.date, u.user_id
        FROM days dy JOIN ud u ON u.d BETWEEN dy.date - 6 AND dy.date),
      dau AS (SELECT d AS date, COUNT(*) AS dau FROM ud GROUP BY 1),
      wau AS (SELECT date, COUNT(*) AS wau FROM win GROUP BY 1)
      SELECT dau.date, dau.dau, wau.wau
      FROM dau JOIN wau USING (date) ORDER BY 1"""))

  /** Referential-integrity audit across the star schema's foreign keys
    * — the DQ check a warehouse runs before trusting a join: for each
    * FK relation, the count of child rows whose key has no parent
    * (orphans). Each relation is a LEFT ANTI join on PROJECTED KEYS
    * ONLY — the child table's payload never enters the shuffle, so the
    * exchange carries one 8-byte key per row regardless of row width;
    * counts partial-aggregate map-side. The five audits are
    * independent one-row aggregates unioned at the end (no barrier —
    * Spark schedules them as parallel subtrees of one job). events →
    * customer is expected to carry orphans in this dataset (user ids
    * outside the customer key range) — the audit REPORTS, the
    * [[quarantineDeadletter]] family enforces. */
  private[graft] val dqReferential = Q("dq_referential",
    (s, dir) => {
      def orphans(child: DataFrame, key: String, parent: DataFrame,
                  pkey: String, rel: String): DataFrame =
        child.select(col(key).as("k"))
          .join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .select(lit(rel).as("relation"), col("orphans"))
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      orphans(li, "l_orderkey", o, "o_orderkey",
          "lineitem.l_orderkey->orders")
        .unionByName(orphans(li, "l_partkey", t(s, dir, "part"),
          "p_partkey", "lineitem.l_partkey->part"))
        .unionByName(orphans(li, "l_suppkey", t(s, dir, "supplier"),
          "s_suppkey", "lineitem.l_suppkey->supplier"))
        .unionByName(orphans(o, "o_custkey", t(s, dir, "customer"),
          "c_custkey", "orders.o_custkey->customer"))
        .unionByName(orphans(events(s, dir), "user_id",
          t(s, dir, "customer"), "c_custkey", "events.user_id->customer"))
        .orderBy("relation")
    },
    Some("""SELECT relation, orphans FROM (
        SELECT 'lineitem.l_orderkey->orders' AS relation, COUNT(*) AS orphans
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'lineitem.l_partkey->part', COUNT(*)
          FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_partkey IS NULL
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', COUNT(*)
          FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE s.s_suppkey IS NULL
        UNION ALL
        SELECT 'orders.o_custkey->customer', COUNT(*)
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT 'events.user_id->customer', COUNT(*)
          FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
          WHERE c.c_custkey IS NULL)
      ORDER BY relation"""))

  /** Pairwise audience overlap between event types: for every type
    * pair, the distinct-user intersection, union, and Jaccard — "how
    * much does the purchase audience overlap the signup audience".
    * Distinct (type, user) first (the one event-volume shuffle), then
    * a self-join KEYED BY USER: per-user fan-out is bounded by
    * C(|type domain|, 2), a constant — never a cross join. The Jaccard
    * is one float division of two exact BIGINTs, deterministic in both
    * engines. At 100 TB: the pair table is |users| × small-constant;
    * intersection counts partial-aggregate; type totals broadcast back
    * onto the ≤C(k,2) result rows. */
  private[graft] val audienceOverlap = Q("audience_overlap",
    (s, dir) => {
      val tu = events(s, dir)
        .select(coalesce(col("event_type"), lit("(none)")).as("et"),
          col("user_id"))
        .distinct()
      val inter = tu.as("a")
        .join(tu.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.et") < col("b.et"))
        .groupBy(col("a.et").as("type_a"), col("b.et").as("type_b"))
        .agg(count(lit(1)).as("inter"))
      val totals = tu.groupBy(col("et")).agg(count(lit(1)).as("n"))
      inter
        .join(broadcast(totals.select(col("et").as("type_a"),
          col("n").as("na"))), Seq("type_a"))
        .join(broadcast(totals.select(col("et").as("type_b"),
          col("n").as("nb"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("uni"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH tu AS (SELECT DISTINCT
          COALESCE(event_type, '(none)') AS et, user_id FROM events),
      tot AS (SELECT et, COUNT(*) AS n FROM tu GROUP BY 1),
      pairs AS (SELECT a.et AS type_a, b.et AS type_b,
          COUNT(*) AS inter
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.et < b.et
        GROUP BY 1, 2)
      SELECT p.type_a, p.type_b, p.inter,
        ta.n + tb.n - p.inter AS uni,
        CAST(p.inter AS DOUBLE) / CAST(ta.n + tb.n - p.inter AS DOUBLE)
          AS jaccard
      FROM pairs p
      JOIN tot ta ON ta.et = p.type_a
      JOIN tot tb ON tb.et = p.type_b
      ORDER BY 1, 2"""))

  /** ML feature generation over the order history: per customer, each
    * order annotated with its previous price, the mean of the prior
    * three, and days since the previous order — the lag-feature shape
    * every churn/LTV training set starts from. All windows PARTITION BY
    * customer (keyed windows scale — state per window is one
    * customer's orders, the shuffle is one pass on the key); prices
    * move as exact cents through the frame sums and become doubles in
    * one final division, so the frame arithmetic is
    * shuffle-order-independent. First-order rows carry SQL-standard
    * nulls (no sentinel defaults — a training pipeline imputes
    * downstream with its own policy). */
  private[graft] val featureLags = Q("feature_lags",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_date"), col("o_orderkey"))
      val prev3 = w.rowsBetween(-3, -1)
      o.select(
          col("o_custkey"), col("o_orderkey"), col("order_date"),
          (col("cents").cast("double") / 100.0).as("price"),
          (lag(col("cents"), 1).over(w).cast("double") / 100.0)
            .as("prev_price"),
          (sum(col("cents")).over(prev3).cast("double") /
            (count(lit(1)).over(prev3).cast("double") * 100.0))
            .as("avg_prev3"),
          datediff(col("order_date"), lag(col("order_date"), 1).over(w))
            .cast("long").as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""WITH o AS (SELECT o_custkey, o_orderkey,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
      SELECT o_custkey, o_orderkey, order_date,
        CAST(cents AS DOUBLE) / 100.0 AS price,
        CAST(LAG(cents, 1) OVER w AS DOUBLE) / 100.0 AS prev_price,
        CAST(SUM(cents) OVER (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
            AS DOUBLE) /
          (CAST(COUNT(*) OVER (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
            AS DOUBLE) * 100.0) AS avg_prev3,
        CAST(date_diff('day', LAG(order_date, 1) OVER w, order_date)
          AS BIGINT) AS days_since_prev
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

}
