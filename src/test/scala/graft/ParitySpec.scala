package graft

import org.apache.spark.sql.functions._
import graft.operators.Parity

/** Golden/differential tests of the three parity pipelines against the
  * reference's own CSV fixtures (read-only at /root/reference/app/).
  * Expected values computed independently (FIXTURES.md + python recount).
  */
class ParitySpec extends SparkSpec {

  test("wordcount on wordcount700b.csv: single-space split keeps empty tokens") {
    val lines = spark.read.text("/root/reference/app/wordcount700b.csv")
    val wc = Parity.wordCount(lines).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc.size === 74)
    assert(wc.values.sum === 123L)
    assert(wc("") === 15L) // empty tokens from consecutive spaces ARE words
    assert(wc("~~~") === 16L)
    assert(wc("the") === 4L)
  }

  test("pagerank contribs on pagerank_42k.csv: 1/(n+1) weights, isolated nodes drop") {
    val lines = spark.read.text("/root/reference/app/pagerank_42k.csv")
    val out = Parity.pageRankContribs(Parity.parseAdjacency(lines))
    val rows = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size === 1244)
    assert(math.abs(rows.values.sum - 590.833333) < 1e-3)
    assert(math.abs(rows("10025785") - 1.0 / 6) < 1e-9)
    assert(math.abs(rows("10027417") - 4.0 / 6) < 1e-9)
  }

  test("twitter filter on twitter_1k.csv: zero survivors still yields ('result', 0)") {
    val lines = spark.read.text("/root/reference/app/twitter_1k.csv")
    val out = Parity.filterCount(Parity.parseTwitter(lines), "followers", 50.0).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "result")
    assert(out(0).getLong(1) === 0L)
  }

  test("twitter filter on twitter_1m.csv: strict > 50") {
    val lines = spark.read.text("/root/reference/app/twitter_1m.csv")
    val out = Parity.filterCount(Parity.parseTwitter(lines), "followers", 50.0).collect()
    assert(out(0).getLong(1) === 68947L)
  }

  test("testdata-bound parity queries run and are non-empty") {
    for (name <- Seq("wordcount", "pagerank_contribs", "twitter_filter_count", "q1_pricing_summary")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
