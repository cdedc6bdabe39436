package graft

import java.nio.file.{Files, Path}

/** Shared deterministic transaction-event fixture for the streaming
  * throughput/durability specs: generator-format JSON
  * (`main.py:24` naive-UTC ISO timestamps), 6 categories / 90 days /
  * 3 months of keys, totalAmount = price × quantity. */
object StreamEventFixture {
  val categories: Vector[String] =
    Vector("electronic", "fashion", "grocery", "home", "beauty", "toy")
  val payments: Vector[String] =
    Vector("credit_card", "debit_card", "online_transfer")

  /** Write `count` events with ids [fromId, fromId+count) across
    * `files` files named `<prefix>NNN.json`. Day i%90 spreads events
    * over 2024-09-01..2024-11-29 → 3 month keys, 90 day keys. */
  def writeEvents(dir: Path, fromId: Int, count: Int, files: Int,
      prefix: String): Unit = {
    val perFile = (count + files - 1) / files
    var id = fromId
    val end = fromId + count
    (0 until files).foreach { f =>
      val w = Files.newBufferedWriter(dir.resolve(prefix + f"$f%03d" + ".json"))
      try {
        val sb = new java.lang.StringBuilder(320)
        var i = 0
        while (i < perFile && id < end) {
          val day = id % 90
          val month = 9 + day / 30
          val dom = day % 30 + 1
          val price = (id % 9900 + 100) / 100.0 // 1.00 .. 99.99
          val qty = id % 10 + 1
          sb.setLength(0)
          sb.append("{\"transactionId\":\"t").append(id)
            .append("\",\"productId\":\"p").append(id % 6)
            .append("\",\"productName\":\"item").append(id % 6)
            .append("\",\"productCategory\":\"").append(categories(id % 6))
            .append("\",\"productPrice\":").append(price)
            .append(",\"productQuantity\":").append(qty)
            .append(",\"productBrand\":\"brand").append(id % 4)
            .append("\",\"totalAmount\":").append(price * qty)
            .append(",\"currency\":\"").append(if (id % 2 == 0) "USD" else "GBP")
            .append("\",\"customerId\":\"c").append(id % 1000)
            .append("\",\"transactionDate\":\"2024-")
            .append(f"$month%02d-$dom%02d")
            .append(f"T${id % 24}%02d:${id % 60}%02d:${(id * 7) % 60}%02d.000000")
            .append("\",\"paymentMethod\":\"").append(payments(id % 3))
            .append("\"}\n")
          w.write(sb.toString)
          id += 1; i += 1
        }
      } finally w.close()
    }
  }

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
