package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after both orders → latest (order 2)
      (2L, 10L, ts("2024-01-01 05:00:00")), // between → order 1
      (3L, 10L, ts("2024-01-01 00:00:00")), // exactly at order 1 → matches (>=)
      (4L, 10L, ts("2023-12-31 23:59:59")), // before any → dropped (inner)
      (5L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows → dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 101L, 11.0),
      (10L, ts("2024-01-01 06:00:00"), 102L, 22.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val out = AsOf.asOfJoin(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey")).toMap

    assert(out === Map(1L -> 102L, 2L -> 101L, 3L -> 101L))
  }

  test("nearest as-of picks the min-|Δt| side, ties backward, inner drops") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 05:00:00")), // 5h after r1, 1h before r2 → r2
      (2L, 10L, ts("2024-01-01 01:00:00")), // 1h after r1, 5h before r2 → r1
      (3L, 10L, ts("2024-01-01 03:00:00")), // exactly midway → tie → backward r1
      (4L, 10L, ts("2023-12-01 00:00:00")), // far before both → forward r1
      (5L, 10L, ts("2024-02-01 00:00:00")), // far after both → backward r2
      (6L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows → dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 101L, 11.0),
      (10L, ts("2024-01-01 06:00:00"), 102L, 22.0)
    ).toDF("k", "rts", "rid", "rv")
    val out = AsOf.asOfJoinNearest(left, "user_id", "ts", right, "k", "rts",
      Seq("rid", "rv"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("rid")).toMap
    assert(out === Map(1L -> 102L, 2L -> 101L, 3L -> 101L, 4L -> 101L, 5L -> 102L))
  }

  test("nearest as-of matches per-row argmin brute force on real data") {
    import org.apache.spark.sql.functions.col
    val ev = graft.core.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
      .groupBy(_._2)
    val expected = purchases.flatMap { case (eid, uid, t) =>
      clicks.get(uid).map { cs =>
        // min |Δt|; tie → backward (earlier click ts), then min click id
        val best = cs.minBy(c => (math.abs(c._3 - t), c._3, c._1))
        eid -> best._1
      }
    }.toMap
    val got = SparkEntry.queries("asof_join_nearest")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("click_id")).toMap
    assert(got === expected, "nearest match diverges from brute-force argmin")
    // the nearest direction must genuinely matter on this data
    val backwardOnly = expected.keySet.filter { eid =>
      val (_, uid, t) = purchases.find(_._1 == eid).get
      clicks(uid).exists(_._3 > t) && clicks(uid).filter(_._3 <= t).nonEmpty
    }
    assert(backwardOnly.nonEmpty)
  }

  test("nearest as-of evaluates both direction frames in a single window pass") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:01"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("k", "rts", "rid", "rv")
    val p = AsOf.asOfJoinNearest(left, "user_id", "ts", right, "k", "rts",
      Seq("rid", "rv")).queryExecution.executedPlan
    val s = p.toString
    // ONE WindowExec hosts both frames (same partition+order spec) over
    // ONE hash exchange and ONE sort — the design claim of the operator
    assert(s.sliding("Window [".length).count(_ == "Window [") === 1, s)
    assert(s.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") === 1, s)
    assert(s.sliding("Sort [".length).count(_ == "Sort [") === 1, s)
  }

  test("native as-of operator agrees with the compositional one on the same case") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 05:00:00")),
      (3L, 10L, ts("2024-01-01 00:00:00")),
      (4L, 10L, ts("2023-12-31 23:59:59")),
      (5L, 99L, ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 101L, 11.0),
      (10L, ts("2024-01-01 06:00:00"), 102L, 22.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val out = AsOf.asOfJoinNative(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey")).toMap
    assert(out === Map(1L -> 102L, 2L -> 101L, 3L -> 101L))
  }

  test("outer native as-of keeps unmatched and null-key left rows with null carry") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L), Option(ts("2024-01-01 10:00:00"))), // matched
      (4L, Option(10L), Option(ts("2023-12-31 23:59:59"))), // before any right row
      (5L, Option(99L), Option(ts("2024-01-01 12:00:00"))), // key with no right rows
      (6L, None: Option[Long], Option(ts("2024-01-01 12:00:00"))), // null key
      (7L, Option(10L), None: Option[Timestamp]) // null ts
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 101L, 11.0),
      (10L, ts("2024-01-01 06:00:00"), 102L, 22.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val out = AsOf.asOfJoinNative(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), outer = true)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("o_orderkey"))) None
         else Some(r.getAs[Long]("o_orderkey")))).toMap
    // every left row survives; only the true match carries a value
    assert(out === Map(1L -> Some(102L), 4L -> None, 5L -> None, 6L -> None, 7L -> None))
  }

  test("native plan contains AsOfJoinExec with exchanges and sorts, no window") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:01"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val p = AsOf.asOfJoinNative(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey")).queryExecution.executedPlan.toString
    // the physical node prints with the Exec suffix stripped
    assert(p.contains("AsOfJoin"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Sort ["), p)
    assert(!p.contains("Window"), p)
  }

  test("null keys and timestamps never match, in BOTH implementations") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 10:00:00"))), // normal match
      (2L, None, Some(ts("2024-01-01 10:00:00"))),      // null key: dropped
      (3L, Some(10L), None)                             // null ts: dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 00:00:00")), 101L, 1.0),
      (None, Some(ts("2024-01-01 00:00:00")), 102L, 2.0), // null key: never a match
      (Some(10L), None, 103L, 3.0)                        // null ts: never a match
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val impls: Seq[(org.apache.spark.sql.DataFrame, String, String,
        org.apache.spark.sql.DataFrame, String, String, Seq[String]) => org.apache.spark.sql.DataFrame] =
      Seq(AsOf.asOfJoin _,
        (l, lk, lt, r, rk, rt, c) => AsOf.asOfJoinNative(l, lk, lt, r, rk, rt, c))
    for (impl <- impls) {
      val out = impl(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey")).toMap
      assert(out === Map(1L -> 101L))
    }
  }

  test("nearest ≡ per-row argmin on randomized data (ties, dup keys, unmatched)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(8).toLong,
        ts(f"2024-01-01 0${rnd.nextInt(10)}%01d:0${rnd.nextInt(6)}%01d0:00")))
      .toDF("event_id", "user_id", "ts")
    // unique (key, ts) on the right so the match is well-defined;
    // equidistant prev/next pairs arise from the coarse grid (tie → prev)
    val rightRows = rnd.shuffle((0 to 9).flatMap(k => (0 to 5).map(t =>
      (k.toLong, ts(f"2024-01-01 0$t%01d:00:00")))))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, i * 1.5) }
    val right = rightRows.toDF("k", "rts", "rid", "rv").repartition(7)

    val got = AsOf.asOfJoinNearest(left, "user_id", "ts", right, "k", "rts",
      Seq("rid", "rv"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("rid")).toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = left.collect().flatMap { r =>
      val (eid, uid, t) = (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)
      byKey.get(uid).map { cs =>
        // min |Δt|, tie → backward (earlier right ts)
        eid -> cs.minBy(c => (math.abs(c._2.getTime - t), c._2.getTime))._3
      }
    }.toMap
    assert(got.nonEmpty && got === expected)
  }

  test("native ≡ compositional on randomized data (incl. ties and dup keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small ts/key domains force collisions, ties, and unmatched rows;
    // right rows deduped per (key, ts) so the match is well-defined
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(f"2024-01-01 0${rnd.nextInt(10)}%01d:0${rnd.nextInt(6)}%01d0:00")))
      .toDF("event_id", "user_id", "ts")
    val right = rnd.shuffle((0 to 9).flatMap(k => (0 to 5).map(t =>
      (k.toLong, ts(f"2024-01-01 0$t%01d:00:00")))))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, i * 1.5) }
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .repartition(7)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).sortBy(_._1).toSeq

    val a = canon(AsOf.asOfJoin(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice")))
    val b = canon(AsOf.asOfJoinNative(left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice")))
    assert(a.nonEmpty && a === b)
  }
}
