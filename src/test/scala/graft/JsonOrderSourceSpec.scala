package graft

import java.nio.file.Files

import graft.sources.JsonOrderSource

class JsonOrderSourceSpec extends SparkTestBase {

  private val sample = Seq(
    """{"order_sn":"SN1","order_status":"COMPLETED","total_amount":"120.5","cod":"true","create_time":1700000000,"update_time":1700000100,"recipient_address":{"name":"An","city":"HCM","zipcode":"70000"},"item_list":[{"order_item_id":1,"item_id":11,"item_name":"tee","model_quantity_purchased":"2","model_original_price":"60.25","product_location_id":["W1","W2"]},{"order_item_id":2,"item_id":12,"item_name":"cap","model_quantity_purchased":"x","model_original_price":"19.9","product_location_id":[]}],"package_list":[{"package_number":"P1","logistics_status":"SHIPPED","item_list":[{"order_item_id":1,"model_quantity":"2"}]}]}""",
    """{"order_sn":"SN2","order_status":"CANCELLED","total_amount":"0","cod":"no","create_time":0,"update_time":1700000200,"recipient_address":null,"item_list":[],"package_list":[]}"""
  )

  test("nested order JSON normalizes into the reference ERD tables") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "orders.json")
    Files.write(f.toPath, sample.mkString("\n").getBytes("UTF-8"))

    val raw = JsonOrderSource.read(spark, f.getAbsolutePath)
    val tables = JsonOrderSource.normalize(raw)

    val orders = tables("orders").orderBy("order_sn").collect()
    assert(orders.length == 2)
    assert(orders(0).getAs[Double]("total_amount") == 120.5)
    assert(orders(0).getAs[Boolean]("cod"))
    assert(!orders(1).getAs[Boolean]("cod"))
    assert(orders(1).isNullAt(orders(1).fieldIndex("create_time")),
      "create_time 0 must normalize to null")

    assert(tables("recipient_address").count() == 1, "null address row dropped")
    val items = tables("order_items").orderBy("order_item_id").collect()
    assert(items.length == 2)
    assert(items(0).getAs[Long]("model_quantity_purchased") == 2L)
    assert(items(1).isNullAt(items(1).fieldIndex("model_quantity_purchased")),
      "unparseable quantity must be null")
    assert(tables("order_item_locations").count() == 2)
    assert(tables("packages").count() == 1)
    assert(tables("package_items").count() == 1)
  }

  test("backfill windows split a range oldest-first and cover it exactly") {
    import java.time.{Duration, Instant}
    val s = Instant.parse("2024-01-01T00:00:00Z")
    val e = Instant.parse("2024-01-10T12:00:00Z")
    val w = graft.operators.Incremental.backfillWindows(s, e, Duration.ofDays(3))
    assert(w.head._1 == s && w.last._2 == e)
    assert(w.size == 4)
    assert(w.sliding(2).forall(p => p.length < 2 || p(0)._2 == p(1)._1),
      "windows must be contiguous")
  }
}
