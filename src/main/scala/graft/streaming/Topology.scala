package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin fluent facade mirroring the reference's user API (O13:
  * `Topology(name).set_spout(path).set_bolt(bolt)...` — reference
  * `util.py:28-38`): a named linear pipeline of DataFrame transforms over
  * a text source. Purely sugar over the DataFrame API — each "bolt" is a
  * DataFrame => DataFrame stage, so Catalyst still fuses and optimizes
  * the whole chain; the reference's per-bolt process hops have no
  * analogue because stages compile into one plan.
  */
final case class Topology(name: String,
                          spoutPath: Option[String] = None,
                          bolts: Vector[DataFrame => DataFrame] = Vector.empty) {

  def spout(path: String): Topology = copy(spoutPath = Some(path))

  def bolt(stage: DataFrame => DataFrame): Topology = copy(bolts = bolts :+ stage)

  private def wire(source: DataFrame): DataFrame =
    bolts.foldLeft(source)((df, stage) => stage(df))

  /** Batch run: read the spout file and fold the bolt chain. */
  def run(spark: SparkSession): DataFrame =
    wire(spark.read.text(spoutPath.getOrElse(
      throw new IllegalStateException(s"topology $name has no spout"))))

  /** Streaming run over a directory spout (micro-batch, exactly-once with
    * a checkpointed sink downstream). */
  def runStream(spark: SparkSession): DataFrame =
    wire(spark.readStream.text(spoutPath.getOrElse(
      throw new IllegalStateException(s"topology $name has no spout"))))
}
