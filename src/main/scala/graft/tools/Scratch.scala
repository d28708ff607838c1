package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad (dev tool, not library surface):
  * compares a query against a floor twin or a candidate rewrite under
  * min-of-N timing with the noop sink (never count() — the Bench
  * materialization rule). Edit the closures, `sbt "runMain
  * graft.tools.Scratch"`, read the RESULT line. Findings worth keeping
  * move into scaladocs/BASELINE.md (e.g. the r10 q60 floor-twin
  * decomposition, the q45 local-delta rejection, the javax.sound
  * registry-contention measurement). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // current experiment slots — swap in the queries under study
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    def pngRoundtrip(id: Long): Int = {
      val w = (8 + id % 5).toInt; val h = (4 + id % 3).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, (x << 8) | y); x += 1 }; y += 1 }
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios); writer.write(img); ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      val reader = ImageIO.getImageReadersByFormatName("png").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis, true, true)
      val out = reader.read(0)
      reader.dispose(); iis.close()
      out.getWidth
    }
    def bench(par: Boolean): Double = {
      val t0 = System.nanoTime()
      if (par) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
        val futs = (0L until 8000L).map(i =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = pngRoundtrip(i) }))
        futs.foreach(_.get()); pool.shutdown()
      } else (0L until 8000L).foreach(pngRoundtrip)
      (System.nanoTime() - t0) / 1e9
    }
    bench(false); bench(true)
    println(f"RESULT png_seq=${bench(false)}%.3f png_par32=${bench(true)}%.3f")
    spark.stop()
  }
}
