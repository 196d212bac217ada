package graft

import org.apache.spark.sql.functions._

import graft.functions.BottomK

class BottomKSpec extends SparkSpec {

  test("BottomK keeps the k smallest distinct values regardless of partitioning") {
    import spark.implicits._
    val agg = udaf(BottomK(3))
    val data = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("a", 1L), ("a", 3L), ("a", 7L),
      ("b", 2L)).toDF("g", "v")
    for (parts <- Seq(1, 4)) {
      val rows = data.repartition(parts).groupBy("g").agg(agg(col("v")).as("bk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(rows("a") === Seq(1L, 3L, 5L))
      assert(rows("b") === Seq(2L))
    }
  }

  test("merge is order-insensitive and dedups") {
    val bk = BottomK(2)
    val m1 = bk.merge(Seq(1L, 3L), Seq(1L, 2L))
    val m2 = bk.merge(Seq(1L, 2L), Seq(1L, 3L))
    assert(m1 === Seq(1L, 2L))
    assert(m1 === m2)
  }
}
