package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Message-batch event parsing (reference S7/E4: SQS batch events whose
  * `Records[].body` is a stringified id list,
  * src/get_raw_data/get_raw_streams_data.py:32-38 — `ast.literal_eval`
  * per record, extended into one deduplicated set).
  *
  * Relational restatement: explode the record array, `from_json` the
  * body, explode again, distinct. Works identically on a batch frame of
  * event payloads or a streaming micro-batch.
  */
object Events {

  /** Schema of one SQS batch event envelope (the fields the pipeline
    * reads; fixtures: data/sample_data/SQS_batch_event_input).
    */
  val sqsEnvelope: StructType = StructType(Seq(
    StructField("Records", ArrayType(StructType(Seq(
      StructField("messageId", StringType),
      StructField("body", StringType)))))))

  /** Flatten a frame of SQS batch envelopes into the distinct id set
    * they carry (one row per id).
    */
  def parseSqsBatch(envelopes: DataFrame, idColName: String = "category_id"): DataFrame =
    envelopes
      .select(explode(col("Records")).as("r"))
      .select(explode(from_json(col("r.body"), ArrayType(StringType))).as(idColName))
      .distinct()
}
