package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad (not part of the library surface).
  * Compares a query against its job-floor twin: same scan + sort +
  * noop sink, minus the operator under test. */
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
    val floor = () => noop(
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("n"))
        .orderBy("doc_id"))
    val q60 = () => noop(graft.queries.LlmQueries.q60PiiRedact(spark, dir))
    val q60b = () => noop {
      val withPii = graft.Tables.load(spark, dir, "documents")
        .withColumn("text2",
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com from host 10.0."),
            (col("doc_id") % 200).cast("string"), lit(".25")))
        .select(col("doc_id"), col("text2"))
        .orderBy("doc_id")
      withPii
        .withColumn("__p", call_function("pii_scan", col("text2")))
        .select(col("doc_id"),
          col("__p.n_emails").as("n_emails"),
          col("__p.n_ips").as("n_ips"),
          col("__p.redacted_md5").as("redacted_md5"))
    }
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val q03 = () => noop(graft.queries.EcommerceQueries.q03NormalizeProps(spark, dir))
    val q03gen = () => noop {
      graft.Tables.loadEvents(spark, dir)
        .select(col("event_id"), col("event_type"),
          explode(array(from_json(col("props"),
            StructType(Seq(StructField("k", LongType)))))).as("parsed"))
        .select(col("event_id"), col("event_type"),
          col("parsed.k").as("prop_k"))
        .where(col("prop_k").isNotNull)
        .orderBy("event_id")
    }
    val q03sorted = () => noop {
      graft.Tables.loadEvents(spark, dir)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy("event_id")
        .select(col("event_id"), col("event_type"),
          explode(array(from_json(col("props"),
            StructType(Seq(StructField("k", LongType)))))).as("parsed"))
        .select(col("event_id"), col("event_type"),
          col("parsed.k").as("prop_k"))
        .where(col("prop_k").isNotNull)
    }
    def q45shape(mk: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Unit = noop {
      val li = graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val delta = li.where(col("l_orderkey") % 13 === 0)
        .withColumn("l_quantity", lit(0.0))
      mk(li, delta)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .orderBy("l_orderkey")
    }
    val keys = Seq("l_orderkey", "l_linenumber")
    val r9shape = () => q45shape { (li, delta) =>
      val deltaKeys = delta.select(keys.map(col): _*)
      li.join(broadcast(deltaKeys), keys, "left_anti")
        .unionByName(delta.select(li.columns.map(col).toSeq: _*))
    }
    val tier1limit = () => q45shape { (li, delta) =>
      graft.operators.BloomPrune.prunedDeleteInsert(li, delta, keys, 100000L, 0.01)
    }
    val tier1collect = () => q45shape { (li, delta) =>
      val proj = delta.select(li.columns.map(col).toSeq: _*)
      val rows = proj.collect()
      val localDelta = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), proj.schema)
      li.join(broadcast(localDelta.select(keys.map(col): _*)), keys, "left_anti")
        .unionByName(localDelta)
    }
    def q65variant(hint: String): Unit = noop {
      val fact = graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .withColumn("pk",
          when(col("l_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("l_partkey").cast("long")))
      val dim = graft.Tables.load(spark, dir, "part")
        .select(col("p_partkey").cast("long").as("pk"), col("p_brand"))
        .hint(hint)
      graft.operators.Skew.partialSaltedJoin(fact, dim, "pk", factor = 8,
          saltSource = Seq("l_orderkey", "l_linenumber"), hot = Seq(1L))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .orderBy("p_brand")
    }
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextDedup
    import graft.functions.TextFunctions
    // q84's crawl input (banner injection at varying alignment)
    def crawl84 = {
      val toks = TextFunctions.tokens(col("text"))
      val banner = split(lit("subscribe to our newsletter for the latest updates " +
        "and exclusive offers today"), " ")
      val k = (col("doc_id") % 4).cast("int")
      val injected = concat_ws(" ", flatten(array(
        slice(toks, lit(1), k), banner,
        slice(toks, k + 1, greatest(size(toks) - k, lit(0))))))
      graft.Tables.load(spark, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 1, injected)
          .otherwise(col("text")).as("text"))
    }
    val current = () => noop(
      TextDedup.substringDedup(crawl84, "doc_id", "text", 10).orderBy("doc_id"))
    val windowed = () => noop {
      val docs = crawl84
      val windows = TextDedup.windowExplode(docs, "doc_id", "text", 10,
        native = true)
      val w = Window.partitionBy("__h")
      val flagged = windows
        .withColumn("__first", min(struct(col("__id"), col("pos"))).over(w))
        .withColumn("__cnt", count(lit(1)).over(w))
      val dupPos = flagged
        .where(col("__cnt") > 1 &&
          struct(col("__id"), col("pos")) =!= col("__first"))
        .groupBy("__id")
        .agg(sort_array(collect_list(col("pos"))).as("__dups"))
      docs.join(dupPos, docs("doc_id") === dupPos("__id"), "left")
        .select(col("doc_id"),
          coalesce(col("__dups"), array().cast("array<int>")).as("__dups"),
          col("text").as("__text"))
        .withColumn("__rb", call_function("drop_token_spans",
          col("__text"), col("__dups"), lit(10)))
        .select(col("doc_id"),
          col("__rb.text").as("text"),
          col("__rb.n_kept").as("n_tokens_kept"),
          col("__rb.n_total").as("n_tokens_total"))
        .orderBy("doc_id")
    }
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wavRoundtrip(id: Long): Long = {
      val pcm = graft.operators.Audio.syntheticPcm(id)
      val bytes = new Array[Byte](pcm.length * 2)
      var k = 0
      while (k < pcm.length) {
        bytes(2 * k) = (pcm(k) & 0xff).toByte
        bytes(2 * k + 1) = ((pcm(k) >> 8) & 0xff).toByte
        k += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, pcm.length),
        AudioFileFormat.Type.WAVE, bos)
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bos.toByteArray))
      ais.readAllBytes().length.toLong
    }
    def bench(par: Boolean): Double = {
      val t0 = System.nanoTime()
      if (par) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
        val futs = (0L until 5000L).map(i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = wavRoundtrip(i) }))
        futs.foreach(_.get()); pool.shutdown()
      } else (0L until 5000L).foreach(wavRoundtrip)
      (System.nanoTime() - t0) / 1e9
    }
    bench(false); bench(true) // warm
    println(f"RESULT wav_seq=${bench(false)}%.3f wav_par32=${bench(true)}%.3f")
    spark.stop()
  }
}
