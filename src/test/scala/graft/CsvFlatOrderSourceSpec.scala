package graft

import java.nio.file.Files

import graft.sources.CsvFlatOrderSource

class CsvFlatOrderSourceSpec extends SparkTestBase {

  private val csv =
    """id,status,payment[total_amount],lineitem[id],lineitem[product_name],lineitem[sale_price]
      |O1,SHIPPED,100.5,L1,tee,60.5
      |O1,SHIPPED,100.5,L2,cap,40.0
      |O2,CANCELLED,0,L3,sock,0
      |""".stripMargin

  test("bracket-flattened CSV splits back into orders and items") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "orders.csv")
    Files.write(f.toPath, csv.getBytes("UTF-8"))

    val flat = CsvFlatOrderSource.read(spark, f.getAbsolutePath)
    assert(flat.columns.toSeq.contains("payment_total_amount"))
    assert(flat.columns.toSeq.contains("lineitem_product_name"))

    val (orders, items) = CsvFlatOrderSource.split(flat, "id")
    assert(orders.count() == 2, "orders deduped to one row per id")
    assert(orders.columns.forall(!_.startsWith("lineitem_")))
    assert(items.count() == 3)
    assert(items.columns.toSeq == Seq("id", "lineitem_id",
      "lineitem_product_name", "lineitem_sale_price"))
  }
}
