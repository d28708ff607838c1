package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Incremental}

/** Property-based checks of the load-semantics algebra: invariants that
  * must hold for ANY input, not just the fixtures (scalacheck
  * generators sampled with fixed seeds — deterministic CI). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowsGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0L, 7L)
      seq <- Gen.choose(0L, 100L)
      v <- Gen.alphaStr.map(_.take(5))
    } yield (k, seq, v))

  test("keepLast: one row per key, and it carries the max order value") {
    samples(rowsGen, 8).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "seq", "v")
        val out = Dedup.keepLast(df, Seq("k"), Seq(col("seq"), col("v")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toList
        val keys = out.map(_._1)
        assert(keys.distinct.size == keys.size, "duplicate keys survived")
        assert(keys.toSet == rows.map(_._1).toSet, "keys lost or invented")
        val maxSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        out.foreach { case (k, s) => assert(s == maxSeq(k), s"key $k kept seq $s != max ${maxSeq(k)}") }
      }
    }
  }

  test("upsert is idempotent and key-complete") {
    samples(rowsGen.flatMap(a => rowsGen.map(b => (a, b))), 6).foreach { case (baseRows, updRows) =>
      val base = baseRows.toDF("k", "seq", "v").dropDuplicates("k")
      val upd = updRows.toDF("k", "seq", "v").dropDuplicates("k")
      val once = Incremental.upsert(base, upd, Seq("k"))
      val twice = Incremental.upsert(once, upd, Seq("k"))
      val a = once.orderBy("k", "seq", "v").collect().toSeq
      val b = twice.orderBy("k", "seq", "v").collect().toSeq
      assert(a == b, "upsert must be idempotent")
      val keys = once.select("k").as[Long].collect().toSet
      assert(keys == (baseRows.map(_._1) ++ updRows.map(_._1)).toSet)
    }
  }

  test("deleteInsert preserves non-delta rows exactly") {
    samples(rowsGen.flatMap(a => rowsGen.map(b => (a, b))), 6).foreach { case (baseRows, deltaRows) =>
      val base = baseRows.toDF("k", "seq", "v")
      val delta = deltaRows.toDF("k", "seq", "v")
      val out = Incremental.deleteInsert(base, delta, Seq("k"))
      val deltaKeys = deltaRows.map(_._1).toSet
      val expectKept = baseRows.filterNot(r => deltaKeys(r._1))
      val kept = out.as[(Long, Long, String)].collect()
        .filterNot(r => deltaKeys(r._1)).toList
      assert(kept.sorted == expectKept.sorted)
      assert(out.count() == expectKept.size + deltaRows.size)
    }
  }
}
