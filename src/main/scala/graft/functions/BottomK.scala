package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the Aggregator arm of the reference's generic bolt
  * surface, SURVEY.md O14): per group, the k smallest values — a
  * bottom-k sketch. Over per-document shingle hashes this is the
  * one-pass KMV (k-minimum-values) signature whose overlap estimates
  * Jaccard similarity, the single-signature alternative to the
  * 16-hash minhash family in graft.operators.Dedup.
  *
  * Buffer is a sorted Seq capped at k, so partial aggregation merges in
  * O(k) and shuffles at most k longs per group — scale-safe.
  */
case class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.length >= k && v >= buf.last) buf
    else if (buf.contains(v)) buf // distinct values: a set sketch
    else ((buf :+ v).sorted).take(k)

  override def finish(reduction: Seq[Long]): Seq[Long] = reduction

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
