package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Stream source abstraction (reference: source/KafkaSource.scala — the
  * poll/rebalance/commit loop). In Spark the runtime owns all of that:
  * Structured Streaming tracks per-partition offsets in the checkpoint
  * exactly like the reference tracks StreamPositions in storage. This
  * environment has no Kafka jars, so the concrete source is a file stream
  * (works identically: files play the role of topic partitions); swapping
  * in `format("kafka")` at deployment changes nothing downstream.
  */
object EventSource {

  /** The canonical event schema (events.parquet, ts at microseconds). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  /** Rate-limited streaming read of a directory of event files.
    * `maxFilesPerTrigger` is the poll-size knob (KafkaSource.pollTimeout/
    * max.poll.records analog); `format` accepts parquet | csv | json
    * (the wire-format flexibility of the reference's RecordFormatter). */
  def fileStream(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 1,
      format: String = "parquet"): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format)
      .load(dir)
}
