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
}
