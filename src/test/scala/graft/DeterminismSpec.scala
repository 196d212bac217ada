package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, MapType, StructType}

/** Partition-count invariance audit: at 100 TB the shuffle partition
  * count is retuned constantly (AQE, cluster size, config), so any
  * result that depends on it is a latent correctness bug. Every query
  * whose output schema is free of floating types must be bit-identical
  * when re-planned under a different `spark.sql.shuffle.partitions` —
  * counts, sums of integers/decimals, md5 fingerprints, rankings with
  * deterministic tie-breaks all qualify. (Floating aggregates are
  * excluded on principle: IEEE addition is not associative, so a double
  * sum's last ulp legitimately varies with aggregation tree shape —
  * which is exactly why the money paths aggregate in DECIMAL, see
  * SparkEntry.dsum.)
  */
class DeterminismSpec extends SparkSpec {

  private def hasFloat(t: DataType): Boolean = t match {
    case DoubleType | FloatType => true
    case s: StructType => s.exists(f => hasFloat(f.dataType))
    case a: ArrayType => hasFloat(a.elementType)
    case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
    case _ => false
  }

  test("every integer-exact query is bit-identical across shuffle partition counts") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    var audited = 0
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val floatFree = !df.schema.exists(f => hasFloat(f.dataType))
      if (floatFree) {
        audited += 1
        val base = df.collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val alt =
          try SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).sorted.toSeq
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert(alt === base, s"$name diverges across shuffle partition counts")
      }
    }
    // the audit must keep real coverage as the surface grows
    assert(audited >= 40, s"only $audited float-free queries audited")
  }
}
