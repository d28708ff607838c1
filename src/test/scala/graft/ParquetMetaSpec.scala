package graft

import org.apache.hadoop.fs.Path

import graft.operators.Stats
import graft.sources.ParquetMeta

/** Footer-metadata row counts: exactness against the scan-based count
  * on every table (single-file and directory layouts), the distributed
  * path forced, and the q01 metadata form vs its scan twin. */
class ParquetMetaSpec extends SparkTestBase {

  test("rowCount equals the scan count for every sf0.001 table") {
    for (t <- Tables.allTables) {
      val meta = ParquetMeta.rowCount(spark, s"$sf0001/$t.parquet")
      val scan = Tables.load(spark, sf0001, t).count()
      assert(meta == scan, s"table $t: footer $meta vs scan $scan")
    }
  }

  test("distributed path (maxDriverFiles=0) agrees with the driver pool") {
    for (t <- Seq("lineitem", "events", "region")) {
      val pool = ParquetMeta.rowCount(spark, s"$sf001/$t.parquet")
      val dist = ParquetMeta.rowCount(spark, s"$sf001/$t.parquet",
        maxDriverFiles = 0)
      assert(pool == dist, s"table $t: pool $pool vs distributed $dist")
    }
  }

  test("listing skips hidden/metadata files and recurses directories") {
    val tmp = java.nio.file.Files.createTempDirectory("pqmeta").toFile
    try {
      val sub = new java.io.File(tmp, "part=a"); sub.mkdirs()
      spark.range(7).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(sub.getPath)
      // droppings a committer might leave behind
      new java.io.File(tmp, "_SUCCESS").createNewFile()
      new java.io.File(sub, ".stale.crc").createNewFile()
      val files = ParquetMeta.listDataFiles(spark, tmp.getPath)
      assert(files.nonEmpty &&
        files.forall(_.getName.endsWith(".parquet")))
      assert(ParquetMeta.rowCount(spark, tmp.getPath) == 7L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("q01 metadata rowCounts ≡ scan-based twin (rows and order)") {
    val meta = Stats.rowCounts(spark, sf0001).collect().toSeq
    val scan = Stats.rowCountsScan(spark, sf0001).collect().toSeq
    assert(meta == scan)
  }

  test("footerRowCount on a single file matches its scan") {
    val conf = spark.sessionState.newHadoopConf()
    val files = ParquetMeta.listDataFiles(spark, s"$sf0001/nation.parquet")
    val total = files.map(f => ParquetMeta.footerRowCount(conf, f)).sum
    assert(total == Tables.load(spark, sf0001, "nation").count())
  }
}
