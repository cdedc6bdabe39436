package graft

import scala.collection.concurrent.TrieMap

import graft.ingest.Json
import graft.sinks.IndexSink

/** W9 parity (faithful-to-dead-code): the ES emitter contract —
  * index `transactions`, id = transactionId, `_source` = full-object
  * JSON — against an in-memory index mimic. The sink stays un-wired in
  * `startAll`, as in the reference. */
object IndexSinkSpec {
  // static so executor-side closures (same JVM in local mode) see it
  val captured: TrieMap[(String, String), String] = TrieMap.empty
}

class IndexSinkSpec extends SparkSpec {
  import spark.implicits._

  private val client = new IndexSink.IndexClient {
    def bulkIndex(index: String, docs: Iterator[(String, String)]): Unit =
      docs.foreach { case (id, doc) => IndexSinkSpec.captured.put((index, id), doc) }
  }

  private def tx(id: String, amt: Double): String =
    s"""{"transactionId":"$id","productId":"p1","productName":"laptop",
       |"productCategory":"electronic","productPrice":$amt,
       |"productQuantity":1,"productBrand":"apple","totalAmount":$amt,
       |"currency":"USD","customerId":"c1",
       |"transactionDate":"2024-11-08T10:00:00.000000",
       |"paymentMethod":"credit_card"}""".stripMargin.replaceAll("\n", "")

  test("documents are keyed by transactionId with full-object JSON source") {
    IndexSinkSpec.captured.clear()
    val parsed = Json.validTransactions(Json.parseTransactions(
      Seq(tx("t1", 10.0), tx("t2", 4.0), tx("t1", 10.0)).toDF("value")))

    IndexSink.indexEachBatch(client)(parsed, batchId = 0L)

    // replayed t1 collapses to one doc (id-keyed upsert ⇒ idempotent)
    assert(IndexSinkSpec.captured.keySet.map(_._2) === Set("t1", "t2"))
    assert(IndexSinkSpec.captured.keySet.forall(_._1 == "transactions"))
    val doc = IndexSinkSpec.captured(("transactions", "t2"))
    // source carries the whole object, with the pinned timestamp format
    assert(doc.contains(""""transactionId":"t2""""))
    assert(doc.contains(""""totalAmount":4.0"""))
    assert(doc.contains("2024-11-08T10:00:00.000000"))
    // round-trip: emitted JSON re-parses to the same transaction
    val back = Json.parseTransactions(Seq(doc).toDF("value"))
      .select("transactionId", "totalAmount").collect().head
    assert(back.getString(0) === "t2" && back.getDouble(1) === 4.0)
  }
}
