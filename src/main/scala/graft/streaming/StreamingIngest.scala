package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.etl.{CasEtl, SubmissionParse, Warehouse}

/** Structured Streaming upgrade of the batch incremental sync (SURVEY.md
  * §2.9): the reference's daily checkpoint pull becomes a file stream with
  * Trigger.AvailableNow — same at-least-once source, exactly-once masters.
  *
  * Dedup is layered: the shared earliest-wins in-batch dedup
  * ([[CasEtl.dedupEarliest]]) removes stream-internal repeats, and the
  * foreachBatch anti-join against the target removes cross-run repeats —
  * the streaming J8. Checkpointing makes restarts resume, not re-ingest.
  *
  * Each micro-batch then runs the SAME master-row construction as the
  * batch sync — [[CasEtl.locateFresh]] (J9 seguridad fallback +
  * no-location drop) and [[CasEtl.masterFrom]] (T6 score, J7 period
  * interval join, J6 sucursal lookup) — so a streamed row is
  * column-for-column what `CasEtl.sync` would have loaded, periodo and
  * sucursal resolution included (reference etl_sync.py:228-241).
  * StreamingIngestSpec pins streamed == batch on identical input.
  */
object StreamingIngest {

  private val rawSchema = StructType(Seq(StructField("json", StringType)))

  /** Ingest every text file of JSON submissions under `inputDir` into the
    * warehouse master table, exactly once per zenput_submission_id.
    * Returns the number of micro-batches processed.
    */
  def ingestOnce(spark: SparkSession, inputDir: String, wh: Warehouse,
                 tipo: String, checkpointDir: String): Long = {
    val raw = spark.readStream
      .schema(rawSchema)
      .format("text")
      .option("path", inputDir)
      .load()
      .withColumnRenamed("value", "json")

    var batches = 0L
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        val parsed = CasEtl.dedupEarliest(SubmissionParse.parse(batch))
        val existing = wh.supervisiones(tipo).select(col("zenput_submission_id"))
        val fresh = parsed.join(existing, Seq("zenput_submission_id"), "left_anti")
        // staged for the same reason as the batch path: the anti-join
        // against the target must not observe its own append
        val master = wh.stage(
          CasEtl.masterFrom(wh, CasEtl.locateFresh(wh, fresh, tipo), tipo))
        wh.append(s"supervisiones_$tipo", master)
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
