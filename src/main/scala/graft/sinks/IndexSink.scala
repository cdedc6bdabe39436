package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ingest.Json

/** W9: Elasticsearch document-sink parity. In the reference this sink is
  * DEAD CODE — built (`DataStreamJob.java:172-183`) but its wiring is
  * commented out (`DataStreamJob.java:165-167`) — so it stays optional
  * and un-wired here too: `EcommerceStreamJob.startAll` never attaches
  * it, exactly like the reference's `main`.
  *
  * Emitter contract reproduced: index `transactions`, document id =
  * `transactionId`, `_source` = the whole transaction serialized to JSON
  * (`JsonUtil.convertObjectToJson`, here `Json.toJsonColumn` with the
  * same pinned timestamp format). Doc-id-keyed indexing makes replays
  * idempotent — the same at-least-once story as the JDBC upserts.
  *
  * Scale shape: document building is a codegen'd `to_json` projection;
  * the client is opened per partition (like `JdbcUpsert`), so a
  * 1000-executor cluster fans in one bulk connection per partition, not
  * per row. The HTTP transport itself is pluggable ([[IndexClient]]) —
  * this environment has no ES server or client jar, so the only
  * shipped implementations are test mimics.
  */
object IndexSink {

  /** Reference index name (`DataStreamJob.java:177`). */
  val defaultIndex = "transactions"

  /** Minimal bulk-index client: implementations must treat `docId` as
    * the upsert key (last write wins), mirroring ES index-request
    * semantics. */
  trait IndexClient extends Serializable {
    def bulkIndex(index: String, docs: Iterator[(String, String)]): Unit
  }

  /** (doc_id, doc) pairs per the reference emitter: id = transactionId,
    * doc = full-object JSON. */
  def transactionDocs(tx: DataFrame): DataFrame =
    Json.toJsonColumn(tx)
      .select(col("transactionId").cast("string").as("doc_id"),
        col("json").as("doc"))

  /** `foreachBatch` body for a streaming query (or callable directly on
    * a batch DataFrame): builds documents declaratively, bulk-indexes
    * per partition. */
  def indexEachBatch(client: IndexClient, index: String = defaultIndex)(
      batch: DataFrame, batchId: Long): Unit =
    transactionDocs(batch).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        client.bulkIndex(index, rows.map(r => (r.getString(0), r.getString(1))))
      }
    }
}
