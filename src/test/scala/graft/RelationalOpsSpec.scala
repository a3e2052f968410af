package graft

import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {

  private def run(key: String) =
    SparkEntry.queries(key)(spark, sfDir)

  test("join_asof: lag is non-negative and the matched signup precedes the purchase") {
    val out = run("join_asof").cache()
    assert(out.count() > 0)
    assert(out.filter(col("lag_us") < 0).count() == 0)
    // matched ids really are signup events
    val signups = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup").select(col("event_id"))
    assert(out.join(signups, out("signup_id") === signups("event_id"), "left_anti")
      .count() == 0)
  }

  test("pivot_status: pivoted counts sum to the plain groupBy totals") {
    val out = run("pivot_status")
    val totals = out.select(col("o_orderpriority"),
      (col("F") + col("O") + col("P")).as("n"))
    val direct = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(totals.exceptAll(direct).count() == 0)
  }

  test("agg_salted_twophase equals the direct aggregation") {
    val out = run("agg_salted_twophase")
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("user_id"))
    assert(out.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(out).count() == 0)
  }

  test("partitioned sink read prunes partitions instead of scanning them") {
    val out = run("sink_partitioned")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"expected a partition filter in:\n${plan.take(2000)}")
    val expected = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count()
    assert(out.count() == expected)
  }

  test("join_skewed: AQE OptimizeSkewedJoin splits the hot partition (skew=true in plan)") {
    val out = graft.ops.Relational.skewedJoin(spark, sfDir)
    val rows = out.collect() // execute so AQE finalizes the plan
    assert(rows.nonEmpty)
    // hot key dominates: the hub group carries ~90% of the left rows
    val total = rows.map(_.getLong(1)).sum
    val hub = rows.find(_.getString(0) == "hub").map(_.getLong(1)).getOrElse(0L)
    assert(hub >= (total * 8) / 10, s"hub=$hub total=$total")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "OptimizeSkewedJoin did not fire:\n" + plan.take(3000))
  }

  test("q18_large_orders: one fact shuffle, broadcast joins, TakeOrderedAndProject") {
    val df = run("q18_large_orders")
    df.collect() // finalize the adaptive plan
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // exchanges only in the final plan section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // exactly one data shuffle: the lineitem group-key exchange (the
    // rest are broadcast exchanges)
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(shuffles <= 1, s"expected <=1 shuffle exchange, plan:\n${plan.take(2000)}")
  }

  test("q7_volume_shipping: bilateral rows inside the window, nations broadcast") {
    val df = run("q7_volume_shipping")
    val rows = df.collect()
    assert(rows.nonEmpty, "the chosen nation pair must trade at every SF")
    // only the two nations appear, never a same-nation row, years in window
    rows.foreach { r =>
      val (sn, cn, y) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(Set("NATION_18", "NATION_19")(sn) && Set("NATION_18", "NATION_19")(cn))
      assert(sn != cn, s"same-nation row $r")
      assert(y == 1996 || y == 1997, s"year outside window: $r")
    }
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("q10_returned_items: top-20 by revenue as TakeOrderedAndProject") {
    val df = run("q10_returned_items")
    val rows = df.collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue not descending")
    assert(revs.forall(_ > 0))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q6/q14/q19: pushdown, exact shares, branch attribution") {
    // Q6: every predicate reaches the scan, 4 of 11 columns read
    // (default maxMetadataStringLength elides the filter list at 100
    // chars — widen it so the assertion sees the full pushdown)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val q6 = run("q6_forecast_revenue")
    val r6 = q6.collect()(0)
    assert(r6.getLong(0) > 0 && r6.getDouble(1) > 0)
    val scan = q6.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(l_discount,0.02)") &&
      scan.contains("LessThan(l_quantity,24.0)"), "Q6 predicates not pushed")
    // Q14: the promo share is a true fraction of the total
    val r14 = run("q14_promo_effect").collect()(0)
    val (promo, total, frac) = (r14.getLong(0), r14.getLong(1), r14.getLong(2))
    assert(promo > 0 && promo < total)
    assert(frac == 1000000L * promo / total, s"frac $frac")
    // Q19: both disjunct branches produce revenue
    val r19 = run("q19_branded_revenue").collect()
    assert(r19.map(_.getString(0)).toSeq == Seq("b1", "b2"))
    assert(r19.forall(r => r.getLong(1) > 0 && r.getDouble(2) > 0))
  }

  test("funnel_steps: counts shrink monotonically, rates are exact fractions of step 1") {
    val rows = run("funnel_steps").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_._2).toSeq == Seq("signup", "view", "click", "purchase"))
    val ns = rows.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"funnel grew: $ns")
    assert(ns.head > 0 && rows.head._4 == 1000000L)
    val n1 = ns.head
    rows.foreach { case (_, _, n, conv) =>
      assert(conv == 1000000L * n / n1, s"conv not exact: $n $conv")
    }
  }

  test("resample_gapfill: dense hourly grid per user, zero-filled gaps, mass conserved") {
    val out = SparkEntry.queries("resample_gapfill")(spark, sfDir).cache()
    // the grid is DENSE: per user, row count == span hours + 1
    val span = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .withColumn("expect",
        (unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600 + 1)
    assert(span.filter(col("n") =!= col("expect")).count() == 0, "grid has holes")
    // gap rows are exactly the zero rows
    assert(out.filter(col("gap") && (col("n_events") =!= 0 || col("total") =!= 0.0))
      .count() == 0)
    assert(out.filter(!col("gap") && col("n_events") < 1).count() == 0)
    // no events invented or lost
    val total = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val raw = Tables.events(spark, sfDir).filter(col("user_id") < 50).count()
    assert(total == raw, s"gapfill changed event mass: $total != $raw")
  }

  test("sim_ivf: dense ranks and every query answered from its cell") {
    val out = SparkEntry.queries("sim_ivf")(spark, sfDir).cache()
    assert(out.count() > 0)
    val perQ = out.groupBy("q_id").agg(min(col("rnk")).as("mn"), max(col("rnk")).as("mx"),
      count(lit(1)).as("n"))
    assert(perQ.filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("n") > 3).count() == 0)
  }

  test("q4_priority_check: semi-join counts orders once, totals match the distinct set") {
    val rows = run("q4_priority_check").collect()
    assert(rows.nonEmpty)
    val prios = Set("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    assert(rows.forall(r => prios(r.getString(0)) && r.getLong(1) > 0))
    // the semi-join must count each qualifying order exactly once
    val direct = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .select(col("o_orderkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == direct,
      s"semi-join total != distinct qualifying orders ($direct)")
  }

  test("q8_market_share: exact micro share, both years, nation <= total") {
    val rows = run("q8_market_share").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1996L, 1997L))
    rows.foreach { r =>
      val (nat, tot, share) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= tot && tot > 0)
      assert(share == 1000000L * nat / tot, s"share not exact: $r")
    }
  }

  test("q12_ship_priority: priority split partitions the late-line count") {
    val rows = run("q12_ship_priority").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    val lateTotal = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == lateTotal)
  }

  test("q13_customer_distribution: buckets cover every customer and every kept order") {
    val rows = run("q13_customer_distribution").collect()
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nCust, "histogram must cover all customers")
    val keptOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == keptOrders,
      "Σ c_count·custdist must equal the kept-order mass")
    // descending by custdist with c_count as the deterministic tiebreak
    val ord = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ord.zip(ord.tail).forall { case ((d1, c1), (d2, c2)) =>
      d1 > d2 || (d1 == d2 && c1 > c2) }, "order not (custdist DESC, c_count DESC)")
  }

  test("q15_top_supplier: winners carry exactly the max exact-unit revenue") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    val units = graft.ops.Relational.unitsExact
    val best = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey")).agg(sum(units).as("u"))
      .agg(max(col("u"))).collect()(0).getLong(0)
    assert(rows.forall(_.getLong(2) == best), s"non-max winner (max=$best)")
  }

  test("q17_small_quantity: every counted line is below 20% of its part's average") {
    val r = run("q17_small_quantity").collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // recompute with a window instead of the agg+join-back topology
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#2")
        .select(col("p_partkey")), col("p_partkey") === col("l_partkey"))
      .withColumn("sq", sum(col("l_quantity").cast("bigint")).over(w))
      .withColumn("cq", count(lit(1)).over(w))
      .filter(lit(5) * col("l_quantity").cast("bigint") * col("cq") < col("sq"))
      .count()
    assert(r.getLong(0) == direct, s"n_items ${r.getLong(0)} != window recompute $direct")
  }

  test("q21_waiting_supplier: only-late-supplier semantics on multi-supplier F orders") {
    val rows = run("q21_waiting_supplier").collect()
    assert(rows.nonEmpty)
    val ws = rows.map(_.getLong(1))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "numwait not descending")
    // independent recompute of the ONLY-late-supplier rule through a
    // window topology (the key uses agg + join-back): per F order,
    // late flag per supplier, supplier/late-supplier counts as window
    // aggregates, winners = late on an n_supp>1, n_late==1 order
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ok"))
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 120 DAYS"), 1).otherwise(0)).as("late"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .join(Tables.supplier(spark, sfDir), col("s_suppkey") === col("sk"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == expected,
      "agg+join-back result differs from the window recompute")
  }

  test("cohort_retention: offsets non-negative, rates exact fractions of the cohort") {
    val rows = run("cohort_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, act, coh, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(off >= 0, s"negative offset: $r (first-seen is the min over ALL events)")
      assert(act >= 1 && act <= coh, s"active outside [1, cohort]: $r")
      assert(rate == 1000000L * act / coh, s"rate not exact: $r")
    }
    // cohorts partition the user base: the sizes of the cohorts that
    // appear cover at most every user (cohorts with zero purchase
    // activity legitimately emit no rows), and each cohort reports ONE
    // consistent size across its offsets
    val nUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    val perCohort = rows.groupBy(_.getString(0)).map { case (_, rs) =>
      val sizes = rs.map(_.getLong(3)).distinct
      assert(sizes.length == 1, "cohort size varies across offsets")
      sizes.head
    }
    assert(perCohort.sum <= nUsers, "cohort sizes exceed the user base")
  }

  test("q22_global_sales: inactive richer-than-average customers, exact boundary") {
    val rows = run("q22_global_sales").collect()
    assert(rows.nonEmpty)
    val allowed = Set(1L, 3L, 5L, 7L, 9L, 11L, 13L)
    assert(rows.forall(r => allowed(r.getLong(0)) && r.getLong(1) > 0))
    // no counted customer ordered after the cutoff
    val counted = rows.map(_.getLong(1)).sum
    val active = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    val inactive = cust.join(active, col("o_custkey") === col("c_custkey"), "left_anti")
    assert(counted <= inactive.count(), "counted customers exceed the inactive pool")
  }

  test("markov_transitions: each from-row is a proper conditional distribution") {
    val rows = run("markov_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val nFrom = rs.map(_.getLong(3)).distinct
      assert(nFrom.size == 1, s"$from: inconsistent n_from")
      assert(rs.map(_.getLong(2)).sum == nFrom.head,
        s"$from: transition counts don't sum to n_from")
      // floor-divided probabilities: Σp ≤ 1e6, deficit < #successors
      val pSum = rs.map(_.getLong(4)).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length, s"$from: Σp_micro=$pSum")
    }
    // every user stream of length k contributes exactly k−1 transitions
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(rows.map(_.getLong(2)).sum == perUser.map(_ - 1).sum)
  }

  test("anomaly_zscore: flags match an exact integer recompute of the z² frontier") {
    val rows = run("anomaly_zscore").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val xs = rs.map(_.getLong(2))
      val n = BigInt(xs.length)
      val s = xs.map(BigInt(_)).sum
      val ss = xs.map(x => BigInt(x) * x).sum
      rs.foreach { r =>
        val dev = n * r.getLong(2) - s
        val expect = dev * dev > 4 * (n * ss - s * s)
        assert(r.getBoolean(3) == expect,
          s"flag mismatch at ${r.getString(0)} ${r.getString(1)}")
      }
    }
    // the fixture's Poisson-ish rates flag a real but minority tail
    val flags = rows.count(_.getBoolean(3))
    assert(flags > 0 && flags < rows.length / 2, s"$flags of ${rows.length} flagged")
  }

  test("interarrival_stats: per-type stats match a driver recompute of per-user gap streams") {
    val rows = run("interarrival_stats").collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).distinct.length == rows.length)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, tpe), es) =>
      es.sortBy(e => (e._3, e._4)).map(_._3).sliding(2)
        .collect { case Array(a, b) => (tpe, b - a) }
    }
    val byType = gaps.groupBy(_._1)
    rows.foreach { r =>
      val g = byType(r.getString(0)).map(_._2)
      assert(r.getLong(1) == g.length, s"${r.getString(0)}: gap count")
      assert(r.getLong(2) == g.min && r.getLong(3) == g.max, s"${r.getString(0)}: extremes")
      assert(r.getLong(4) == (g.map(BigInt(_)).sum / g.length).toLong,
        s"${r.getString(0)}: floor average")
      assert(g.forall(_ >= 0), "time went backwards inside a stream")
    }
  }

  test("seasonal_profile: shares are per-type distributions over valid hours") {
    val rows = run("seasonal_profile").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 23), "hod out of range")
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sfDir).count(),
      "profile drops or double-counts events")
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val sSum = rs.map(_.getLong(3)).sum
      assert(sSum <= 1000000L && sSum > 1000000L - rs.length, s"$tpe: Σshare=$sSum")
    }
  }

  test("churn_flags: flags and day counts match a frontier recompute") {
    val rows = run("churn_flags").collect()
    val ev = Tables.events(spark, sfDir)
    assert(rows.length == ev.select(col("user_id")).distinct().count())
    val m = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val perUser = ev.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("lastus"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dayUs = 86400000000L
    rows.foreach { r =>
      val (lastus, n) = perUser(r.getLong(0))
      assert(r.getLong(2) == n, s"user ${r.getLong(0)}: event count")
      // session tz is UTC, so calendar-day diff == epoch-day diff
      assert(r.getLong(3) == m / dayUs - lastus / dayUs, s"user ${r.getLong(0)}: days")
      assert(r.getBoolean(4) == (lastus < m - 24L * 3600 * 1000000),
        s"user ${r.getLong(0)}: churn flag")
    }
    val flagged = rows.count(_.getBoolean(4))
    assert(flagged > 0 && flagged * 2 < rows.length, s"$flagged of ${rows.length}")
  }

  test("rfm_segments: segment grid matches a driver recompute of exact terciles") {
    val out = run("rfm_segments").collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
    // analysis-date anchor: latest event over the WHOLE corpus, not
    // just purchases (matches the operator and the oracle)
    val m = Tables.events(spark, sfDir).agg(max(col("ts")))
      .collect()(0).getTimestamp(0)
    val users = ev.groupBy(col("user_id"))
      .agg(datediff(lit(m), max(col("ts"))).cast("long").as("rec"),
        count(lit(1)).as("freq"),
        sum(floor(col("value") * 100 + 0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // min v with cum(v) ≥ k over the histogram IS the k-th order statistic
    def terciles(vs: Seq[Long]): (Long, Long) = {
      val s = vs.sorted; val n = s.length
      (s((n + 2) / 3 - 1), s((2 * n + 2) / 3 - 1))
    }
    val (tr1, tr2) = terciles(users.map(_._1).toSeq)
    val (tf1, tf2) = terciles(users.map(_._2).toSeq)
    val (tm1, tm2) = terciles(users.map(_._3 / 1000).toSeq)
    val seg = users.groupBy { case (r, f, c) =>
      (if (r <= tr1) 3L else if (r <= tr2) 2L else 1L,
        if (f <= tf1) 1L else if (f <= tf2) 2L else 3L,
        if (c / 1000 <= tm1) 1L else if (c / 1000 <= tm2) 2L else 3L)
    }.map { case (k, us) =>
      k -> ((us.length.toLong, (us.map(u => BigInt(u._3)).sum / us.length).toLong))
    }
    assert(out.keySet == seg.keySet, "segment grids differ")
    seg.foreach { case (k, v) => assert(out(k) == v, s"segment $k: $v vs ${out(k)}") }
  }

  /** The derived partsupp bridge the Q2/Q9/Q11/Q16/Q20 shapes run on,
    * recomputed independently of partsuppBridge's aggregate topology.
    */
  private def bridgePairs(): Map[(Long, Long), (Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("l_quantity").cast("bigint").as("qty"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        k -> ((rs.map(_.getLong(2)).min, rs.map(_.getLong(3)).sum))
      }

  test("q2_min_cost_supplier: each winner carries its part's regional minimum cost") {
    val rows = run("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    // winners per part all share ONE cost, and no regional candidate
    // for that part is cheaper: recompute candidates driver-side
    val pairs = bridgePairs()
    val euroSupp = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val okParts = Tables.part(spark, sfDir)
      .filter(col("p_size") <= 15 && col("p_type") === "ECONOMY")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val minByPart = pairs.toSeq
      .filter { case ((pk, sk), _) => okParts(pk) && euroSupp(sk) }
      .groupBy(_._1._1)
      .map { case (pk, ps) => pk -> ps.map(_._2._1).min }
    rows.foreach { r =>
      val (pk, cents) = (r.getLong(3), r.getLong(5))
      assert(okParts(pk), s"part $pk fails the size/type filter")
      assert(minByPart(pk) == cents, s"part $pk: cost $cents != min ${minByPart(pk)}")
    }
    // the sort is total: strictly descending acctbal with the
    // (n_name, s_name, p_partkey) tiebreak, so LIMIT is deterministic
    val keys = rows.map(r => (-r.getDouble(0), r.getString(2), r.getString(1), r.getLong(3)))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      Ordering[(Double, String, String, Long)].lt(a, b) }, "sort not total/ordered")
  }

  test("q9_product_profit: group profits sum to the direct ungrouped computation") {
    val rows = run("q9_product_profit").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 1995 && r.getLong(1) <= 2001))
    val total = rows.map(_.getLong(2)).sum
    val pairs = bridgePairs()
    val bolt = Tables.part(spark, sfDir).filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val direct = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        graft.ops.Relational.unitsExact.as("units"))
      .collect()
      .filter(r => bolt(r.getLong(0)))
      .map(r => r.getLong(2) - pairs((r.getLong(0), r.getLong(1)))._1 * 100)
      .sum
    assert(total == direct, s"Σ profit $total != direct $direct")
  }

  test("q11_important_stock: kept parts are exactly those above twice the mean value") {
    val rows = run("q11_important_stock").collect()
    assert(rows.nonEmpty)
    val pairs = bridgePairs()
    val asia = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val byPart = pairs.toSeq.filter { case ((_, sk), _) => asia(sk) }
      .groupBy(_._1._1)
      .map { case (pk, ps) => pk -> ps.map { case (_, (c, q)) => BigInt(c) * q }.sum }
    val total = byPart.values.sum
    val expected = byPart.filter { case (_, v) =>
      v * byPart.size > total * 2 }.keySet
    assert(rows.map(_.getLong(0)).toSet == expected, "kept part set differs")
    rows.foreach(r => assert(BigInt(r.getLong(1)) == byPart(r.getLong(0)),
      s"value mismatch for part ${r.getLong(0)}"))
  }

  test("q16_supplier_relation: counts match a NOT-IN recompute, excluded never counted") {
    val rows = run("q16_supplier_relation").collect()
    assert(rows.nonEmpty)
    val excluded = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val partMeta = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3), r.getInt(4))))
      .toMap
    val expected = bridgePairs().keySet.toSeq
      .filter { case (pk, sk) => partMeta.contains(pk) && !excluded(sk) }
      .groupBy { case (pk, _) => partMeta(pk) }
      .map { case (g, ps) => g -> ps.map(_._2).distinct.length.toLong }
    val got = rows.map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == expected, "per-(brand,type,size) distinct-supplier counts differ")
  }

  test("q20_excess_availability: every supplier has a 1998-concentrated small-part pair") {
    val rows = run("q20_excess_availability").collect()
    assert(rows.nonEmpty)
    val pairs = bridgePairs()
    val small = Tables.part(spark, sfDir).filter(col("p_name").like("small %"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val q98 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("bigint"))
      .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    val qualifying = q98.keySet
      .filter { case (pk, _) => small(pk) }
      .filter { case k => 2 * q98(k) > pairs(k)._2 }
      .map(_._2)
    val americaSupp = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_name"), col("s_suppkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = americaSupp.filter { case (_, sk) => qualifying(sk) }.keySet
    assert(rows.map(_.getString(0)).toSet == expected, "supplier set differs")
    val names = rows.map(_.getString(0))
    assert(names.sorted.sameElements(names), "not ordered by s_name")
  }
}
