package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column algebra over ARRAY<FLOAT> embeddings, built from
  * higher-order functions (zip_with / aggregate) so the math stays inside
  * codegen — no UDF, no driver round-trip. Elements are cast to double
  * before any arithmetic for cross-engine determinism (DuckDB twin:
  * list_sum(list_transform(...))).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-pattern LSH bucket from the first `bits` dimensions: bit j set
    * iff element j+1 > 0. Axis-aligned random-hyperplane LSH — cheap,
    * deterministic, engine-portable; at scale it turns an all-pairs
    * similarity scan into per-bucket work.
    */
  def signBucket(a: Column, bits: Int): Column = signBucketAt(a, 0, bits)

  /** Sign bucket over dimensions [offset+1, offset+bits] — one BAND of a
    * banded LSH scheme: b independent bands of r bits each give recall
    * 1-(1-p^r)^b per pair (p = per-hyperplane agreement probability),
    * the same OR-of-ANDs amplification as MinHash banding. */
  def signBucketAt(a: Column, offset: Int, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(a, offset + j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
