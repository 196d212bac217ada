package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems

class FreqItemsSpec extends SparkSpec {

  test("exact when capacity >= distinct count, across many partitions") {
    import spark.implicits._
    val data = (1 to 1000).map(i => s"w${i % 7}")
    val df = data.toDF("w").repartition(13) // force partial buffers + merge
    val out = df.agg(FreqItems.freqItemsSketch($"w", 16).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.item", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out === expected)
  }

  test("Misra-Gries bound: undercount <= n/(k+1); heavy hitters survive") {
    import spark.implicits._
    // 500 copies of "hot", 200 distinct singletons; k=9 → n=700, bound=70
    val data = Seq.fill(500)("hot") ++ (1 to 200).map(i => s"cold$i")
    val k = 9
    val out = data.toDF("w").repartition(7)
      .agg(FreqItems.freqItemsSketch($"w", k).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.item", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = data.size
    val bound = n / (k + 1)
    assert(out.contains("hot"), "item with freq > n/(k+1) must be present")
    assert(out("hot") <= 500 && out("hot") >= 500 - bound)
    // no counter may overcount
    out.foreach { case (item, cnt) =>
      val truth = data.count(_ == item).toLong
      assert(cnt <= truth, s"$item overcounted: $cnt > $truth")
    }
  }

  test("registered as SQL function via GraftExtensions") {
    import spark.implicits._
    Seq("a", "b", "a", "c", "a").toDF("w").createOrReplaceTempView("fi_words")
    val rows = spark.sql(
      "SELECT inline(freq_items_sketch(w, 8)) FROM fi_words")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("null inputs are skipped; empty input yields empty sketch") {
    import spark.implicits._
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("w")
    val m = withNulls.agg(FreqItems.freqItemsSketch($"w", 4).as("sk"))
      .select(explode($"sk").as("e")).select($"e.item", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("x" -> 2L))

    val empty = spark.emptyDataset[String].toDF("w")
      .agg(FreqItems.freqItemsSketch($"w", 4).as("sk"))
      .select(size($"sk")).collect().head.getInt(0)
    assert(empty === 0)
  }
}
