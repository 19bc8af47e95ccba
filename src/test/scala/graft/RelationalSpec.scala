package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("semi + anti partition the customer table") {
    val semi = Relational.joinSemi(spark, sf001).count()
    val anti = Relational.joinAnti(spark, sf001).count()
    val total = Tables.customer(spark, sf001).count()
    assert(semi + anti == total)
  }

  test("union all preserves row counts; union distinct dedups") {
    val c = Tables.customer(spark, sf001).count()
    val s = Tables.supplier(spark, sf001).count()
    assert(Relational.unionAll(spark, sf001).count() == c + s)
    assert(Relational.unionDistinct(spark, sf001).count() <= 25)
  }

  test("intersect and except are disjoint and cover customer nations") {
    val inter = Relational.intersectKeys(spark, sf001).collect().map(_.getInt(0)).toSet
    val exc = Relational.exceptKeys(spark, sf001).collect().map(_.getInt(0)).toSet
    assert(inter.intersect(exc).isEmpty)
    val custNations = Tables.customer(spark, sf001)
      .select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(inter.union(exc) == custNations)
  }

  test("topk is sorted descending and bounded") {
    val rows = Relational.topK(spark, sf001).collect()
    assert(rows.length == 15)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("window rank keeps at most 3 rows per customer") {
    val df = Relational.windowRank(spark, sf001)
    val maxPer = df.groupBy("o_custkey").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPer <= 3)
  }

  test("rollup has grand total equal to order count") {
    val grand = Relational.rollupOp(spark, sf001)
      .filter(col("o_orderstatus").isNull && col("o_orderpriority").isNull)
      .collect()
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n_orders") == Tables.orders(spark, sf001).count())
  }

  test("throttle dedup keeps at most one row per user-minute") {
    val df = Relational.throttleDedup(spark, sf001)
    val dups = df
      .groupBy(col("user_id"), date_trunc("minute", col("ts")))
      .count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("seeded sample is deterministic") {
    val a = Relational.sampleSeeded(spark, sf001).count()
    val b = Relational.sampleSeeded(spark, sf001).count()
    assert(a == b && a > 0)
  }

  test("hash sample keeps ~10% of rows, engine- and partitioning-independent") {
    val total = Tables.lineitem(spark, sf001).count()
    val kept = Relational.sampleHash(spark, sf001).count()
    val frac = kept.toDouble / total
    // expected fraction is exactly 0x1a/0x100 = 10.16%, binomial spread
    assert(frac > 0.07 && frac < 0.14, s"fraction $frac")
    // same row set under a different partitioning
    val repart = Tables.lineitem(spark, sf001).repartition(7)
      .filter(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat_ws("-",
          col("l_orderkey"), col("l_linenumber")).cast("binary")) < "1a").count()
    assert(repart == kept)
  }

  test("approx distinct estimate lands inside its advertised error bound") {
    val rows = Relational.approxDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)))
  }

  test("asof join matches a per-row sequential lookup") {
    val ev = Tables.events(spark, sf001)
      .select("event_type", "event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2), r.getTimestamp(3).getTime, r.getDouble(4)))
    // model: per user, max purchase value per ts, then latest <= click ts
    val purchases = ev.filter(_._1 == "purchase")
      .groupBy(_._3).view.mapValues(_.groupBy(_._4).view.mapValues(_.map(_._5).max).toSeq.sortBy(_._1)).toMap
    val expected = ev.filter(_._1 == "click").map { c =>
      val prior = purchases.getOrElse(c._3, Seq.empty).filter(_._1 <= c._4)
      c._2 -> (if (prior.isEmpty) None else Some(prior.maxBy(_._1)._2))
    }.toMap
    val got = Relational.asofJoin(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) => assert(got(id) == v, s"event $id") }
  }

  test("range join bands cover every order exactly once") {
    val bands = Relational.rangeJoin(spark, sf001).collect()
    assert(bands.map(_.getString(0)).sorted.toSeq == Seq("large", "mid", "small"))
    assert(bands.map(_.getLong(1)).sum == Tables.orders(spark, sf001).count())
  }

  test("salted skew join is semantically invisible vs the plain join") {
    import org.apache.spark.sql.functions._
    val salted = Relational.skewJoinSalted(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val plain = Tables.orders(spark, sf001)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .withColumn("prio_rank",
        substring(col("o_orderpriority"), 1, 1).cast("int"))
      .select(col("o_orderpriority"), col("prio_rank"),
        col("n_orders"), col("total_price"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(salted == plain)
  }

  test("date spine is dense, conserves order counts, and zero-fills") {
    val rows = Relational.dateSpine(spark, sf001).collect()
    val days = rows.map(_.getDate(0).toLocalDate).sorted
    // dense daily calendar: consecutive days, no holes
    days.zip(days.tail).foreach { case (a, b) => assert(b == a.plusDays(1)) }
    val nOrders = Tables.orders(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "spine loses/duplicates orders")
    assert(rows.exists(_.getLong(1) == 0), "expected explicit zero-filled days")
    rows.filter(_.getLong(1) == 0).foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("cohort retention's offset-0 cell equals the cohort size") {
    val cells = Relational.cohortRetention(spark, sf001).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells.keys.forall(_._2 >= 0))
    // offset 0: every cohort member is active in their first month
    val cohortSizes = Tables.orders(spark, sf001)
      .groupBy(col("o_custkey"))
      .agg(date_trunc("month", min(col("o_orderdate"))).as("cohort_month"))
      .groupBy(col("cohort_month")).count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    cohortSizes.foreach { case (m, n) =>
      assert(cells((m, 0)) == n, s"cohort $m offset-0 ${cells((m, 0))} != $n")
    }
  }

  test("merge upsert applies updates, deletes, and inserts exactly once") {
    val base = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Relational.mergeUpsert(spark, sf001).collect()
    // keys unique after merge (checked on rows, BEFORE any map collapse)
    assert(rows.length == rows.map(_.getLong(0)).distinct.length)
    val out = rows
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(3)))).toMap
    val deleted = base.keySet.filter(k => k % 3 == 0 && k % 7 == 0)
    val updated = base.keySet.filter(k => k % 3 == 0 && k % 7 != 0)
    assert(deleted.forall(!out.contains(_)), "deletes survived")
    updated.foreach { k =>
      val want = math.rint((base(k) * 1.1 + 1e-9) * 100) / 100
      assert(out(k)._2 == "updated" && math.abs(out(k)._1 - want) < 1e-9, s"key $k")
    }
    (base.keySet -- deleted -- updated).foreach { k =>
      assert(out(k) == ((base(k), "base")), s"untouched key $k changed")
    }
    val mx = base.keySet.max
    updated.foreach { k =>
      assert(out(mx + k)._2 == "inserted", s"missing insert for $k")
    }
    assert(out.size == base.size - deleted.size + updated.size)
  }

  test("ignore-nulls windows replay a sequential per-customer scan") {
    val got = Relational.windowIgnoreNulls(spark, sf001).collect()
      .map(r => r.getLong(1) -> ((Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // independent model: per customer in (o_orderdate, o_orderkey) order,
    // LOCF / previous / next non-null by sequential scan
    val orders = Tables.orders(spark, sf001)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3)))
    assert(got.size == orders.length)
    orders.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r =>
        (r._3.toInstant(java.time.ZoneOffset.UTC).toEpochMilli, r._2))
        .map(r => r._2 -> (if (r._2 % 5 == 0) None else Some(r._4)))
      val vs = seq.map(_._2)
      seq.zipWithIndex.foreach { case ((key, v), i) =>
        val locf = vs.take(i + 1).reverse.collectFirst { case Some(x) => x }
        val prev = vs.take(i).reverse.collectFirst { case Some(x) => x }
        val next = vs.drop(i + 1).collectFirst { case Some(x) => x }
        assert(got(key) == ((v, locf, prev, next)), s"orderkey $key")
      }
    }
  }

  test("cusum window identity equals the textbook recurrence") {
    // The op computes s via cumsum-above-running-minimum; the reference
    // model runs Page's recurrence s = max(0, s + x - mu - sigma/2)
    // directly. The identity is exact in real arithmetic; float noise
    // stays orders below the half-ulp of the r4 rounding, so we allow
    // one rounding step of slack at the boundary.
    val got = ops.Relational.cusumShift(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ev = Tables.events(spark, sf001)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2),
        r.getDouble(3)))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val xs = ordered.map(_._4)
      val n = xs.length
      val mu = xs.sum / n
      val sigma =
        if (n < 2) 0.0
        else math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      var s = 0.0
      ordered.foreach { case (_, _, eid, x) =>
        s = if (sigma == 0.0) 0.0 else math.max(0.0, s + x - mu - 0.5 * sigma)
        assert(math.abs(got(eid) - s) <= 2e-4,
          s"event $eid: got ${got(eid)}, recurrence $s")
      }
    }
  }

  test("ewma replays the per-user trailing-window sequential model") {
    val got = ops.Relational.ewmaSmooth(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r4(x: Double) = java.math.BigDecimal.valueOf(x + 1e-9)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val model = Tables.events(spark, sf001)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1).flatMap { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3))
        ordered.indices.map { i =>
          val win = ordered.slice(math.max(0, i - 19), i + 1).map(_._4)
          val y = win.tail.foldLeft(win.head)((acc, x) => 0.3 * x + 0.7 * acc)
          ordered(i)._3 -> r4(y)
        }
      }
    assert(got.size == model.size)
    model.foreach { case (eid, want) =>
      assert(got(eid) == want, s"event $eid: got ${got(eid)}, want $want")
    }
  }

  test("gaps-and-islands emits maximal consecutive-month runs per customer") {
    val got = Relational.gapsIslands(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDate(2).toLocalDate, r.getLong(3))).toSet
    // independent model: distinct order months per customer, split at gaps
    val months = Tables.orders(spark, sf001)
      .select("o_custkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1).toLocalDate.withDayOfMonth(1))
      .distinct
    val want = months.groupBy(_._1).flatMap { case (cust, ms) =>
      val sorted = ms.map(_._2).sorted
      sorted.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (run :: rest, m) if run.head.plusMonths(1) == m => (m :: run) :: rest
        case (acc, m) => List(m) :: acc
      }.map(run => (cust, run.last, run.head, run.size.toLong))
    }.toSet
    assert(got == want)
  }

  test("table checksum is layout-invariant and content-sensitive") {
    import org.apache.spark.sql.functions._
    val src = Tables.orders(spark, sf001)
    def ck(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Relational.tableChecksumOf(spark, df).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val base = ck(src)
    // identical content through a shuffled, re-sorted layout
    val reshaped = ck(src.repartition(16).sortWithinPartitions(desc("o_orderkey")))
    assert(reshaped == base, "checksum changed under repartition/re-sort")
    // a single-row mutation must change the fingerprint
    val mutated = ck(src.withColumn("o_custkey",
      when(col("o_orderkey") === 1L, col("o_custkey") + 1).otherwise(col("o_custkey"))))
    assert(mutated._1 == base._1 && mutated._2 != base._2,
      "checksum failed to detect a one-row mutation")
  }

  test("scd2 intervals tile per user with exactly one current version") {
    val rows = Relational.scd2(spark, sf001).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        r.getTimestamp(3).toInstant,
        Option(r.getTimestamp(4)).map(_.toInstant), r.getBoolean(5))
    }
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val hist = vs.sortBy(v => (v._3, v._2))
      // consecutive versions abut exactly: valid_to(i) == valid_from(i+1)
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $uid: version ${a._2} ends at ${a._4}, next starts ${b._3}")
        case _ =>
      }
      // exactly the last version is open-ended and current
      assert(hist.last._4.isEmpty && hist.last._5,
        s"user $uid: last version must be current/open")
      assert(vs.count(_._5) == 1, s"user $uid: expected exactly one current row")
    }
  }

  test("resample lerp fails loudly on a degenerate long-lived key, not on a hot partition") {
    // Grid rows per user = hours of that user's SPAN, independent of
    // reading count: a sensor that reported once in 1990 and once in
    // 2020 would explode into ~263k grid rows on one partition. The
    // density guard must name the key at the per-user aggregate — and
    // leave in-contract inputs bit-identical.
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft_lerpguard").toString
    val base = Tables.events(spark, sf001)
    val w = Window.orderBy(col("event_id")) // 2 rows, test-only
    val degen = base.limit(2)
      .withColumn("k", row_number().over(w))
      .withColumn("user_id", lit(424242L))
      .withColumn("ts", when(col("k") === 1,
        to_timestamp(lit("1990-01-01 00:30:00")))
        .otherwise(to_timestamp(lit("2020-01-01 00:30:00"))))
      .drop("k")
    base.unionByName(degen)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = intercept[Exception] {
      Relational.resampleInterpolate(spark, dir).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("resample grid overflow") &&
      chain.contains("424242"), s"guard message unhelpful: $chain")

    // in-contract inputs (the corpus without the degenerate key) are
    // untouched by the guard: default cap == effectively-unbounded cap
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lerpok").toString
    base.write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val guarded = Relational.resampleInterpolate(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    val unbounded = Relational.resampleInterpolate(spark, dir2,
      maxGridPerUser = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    assert(guarded.nonEmpty && guarded == unbounded)
  }

  test("resample grid survives no-hour-boundary spans and floors pre-1970 epochs") {
    import spark.implicits._
    val h = 3600L * 1000000L
    // user 1: a single reading; user 2: readings inside ONE hour (no
    // boundary in [tmin, tmax]) — both generate an EMPTY grid; an
    // unguarded sequence(g0, tmax) with g0 > tmax THREW and killed the
    // job where the oracle's generate_series returned empty. user 3
    // spans a boundary normally; user 4 is PRE-1970 and hour-ALIGNED —
    // the old truncating-div ceil put its g0 at 0, skipping the span.
    val readings = Seq(
      (1L, 10L * h + 15L * 60000000L, 1.0),
      (2L, 10L * h + 15L * 60000000L, 1.0),
      (2L, 10L * h + 45L * 60000000L, 2.0),
      (3L, 10L * h + 30L * 60000000L, 1.0),
      (3L, 11L * h + 30L * 60000000L, 3.0),
      (4L, -2L * h, 1.0),
      (4L, -1L * h, 5.0)
    ).toDF("user_id", "t", "value")
    val out = Relational.resampleOnMicros(readings, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    val byUser = out.groupBy(_._1)
    assert(!byUser.contains(1L) || byUser(1L).isEmpty,
      "a single-reading user must contribute no grid rows")
    assert(!byUser.contains(2L),
      "a span inside one hour must contribute no grid rows")
    assert(byUser(3L).map(_._2).toSet == Set(11L * h),
      s"user 3 grid wrong: ${byUser.get(3L)}")
    // pre-1970: the grid must cover BOTH aligned points, interpolated
    val u4 = byUser(4L).map(t => (t._2, t._3)).toMap
    assert(u4.keySet == Set(-2L * h, -1L * h), s"user 4 grid: ${u4.keySet}")
    assert(u4(-2L * h) == 1.0 && u4(-1L * h) == 5.0,
      s"user 4 values: $u4")
  }
}
