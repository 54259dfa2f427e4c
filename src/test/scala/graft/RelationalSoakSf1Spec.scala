package graft

import graft.analytics.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * 10× (sf1-scale) soak of the relational/money side: lineitem and orders
 * sharded 10× with offset order keys (dims symlinked — dimensions don't
 * grow with fact volume). Because every shard is content-identical, the
 * 10× corpus carries an EXACTNESS invariant the decimal-sum machinery
 * must honor at scale: grouped counts and quantity sums are exactly 10×
 * sf0.1's and averages are bit-identical — any partition-order
 * sensitivity in the money path would break this long before a wall-time
 * assertion fires. Wall growth gets the same generous ≲-linear budget as
 * the dedup soak (this host stalls; the recorded ratios are the real
 * artifact).
 */
class RelationalSoakSf1Spec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private val soakDir = "target/soak_rel_sf1"

  private def ensureSf1(): Unit = {
    val marker = new java.io.File(s"$soakDir/lineitem.parquet/_SUCCESS")
    if (marker.exists()) return
    new java.io.File(soakDir).mkdirs()
    // dims (and non-relational tables) don't scale with facts: symlink
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings")) {
      val link = java.nio.file.Paths.get(s"$soakDir/$t.parquet")
      if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$sf01/$t.parquet"))
    }
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf01/orders.parquet")
    val maxKey = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    def shard10(df: org.apache.spark.sql.DataFrame, keyCol: String) =
      (0 until 10).map { k =>
        df.withColumn(keyCol, col(keyCol) + lit(k * maxKey))
      }.reduce(_ unionByName _).repartition(16)
    shard10(li, "l_orderkey").write.mode("overwrite").parquet(s"$soakDir/lineitem.parquet")
    shard10(ord, "o_orderkey").write.mode("overwrite").parquet(s"$soakDir/orders.parquet")
  }

  private def minOf2(f: => Array[org.apache.spark.sql.Row]): (Double, Array[org.apache.spark.sql.Row]) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  test("q01/q05 at 10x: exact 10x sums, identical averages, linear-ish wall") {
    ensureSf1()

    val (t01a, r01) = minOf2(Relational.q01PricingSummary(spark, sf01)
      .orderBy("l_returnflag", "l_linestatus").collect())
    val (t1a, r1) = minOf2(Relational.q01PricingSummary(spark, soakDir)
      .orderBy("l_returnflag", "l_linestatus").collect())
    info(f"q01: sf0.1 $t01a%.1fs -> sf1 $t1a%.1fs, ratio ${t1a / t01a}%.1fx")
    assert(r1.length == r01.length, "10x shards must not add groups")
    r01.zip(r1).foreach { case (a, b) =>
      assert(b.getLong(a.fieldIndex("count_order")) ==
        10 * a.getLong(a.fieldIndex("count_order")), "count not exactly 10x")
      assert(b.getDouble(a.fieldIndex("sum_qty")) ==
        10 * a.getDouble(a.fieldIndex("sum_qty")), "sum_qty not exactly 10x")
      assert(b.getDouble(a.fieldIndex("avg_qty")) ==
        a.getDouble(a.fieldIndex("avg_qty")), "avg_qty changed at 10x")
    }
    assert(t1a <= t01a * 60 + 30, f"q01 super-linear: $t01a%.1fs -> $t1a%.1fs")

    val (t01b, n01) = minOf2(Relational.q05NationRevenue(spark, sf01).collect())
    val (t1b, n1) = minOf2(Relational.q05NationRevenue(spark, soakDir).collect())
    info(f"q05: sf0.1 $t01b%.1fs -> sf1 $t1b%.1fs, ratio ${t1b / t01b}%.1fx")
    assert(n1.length == n01.length, "nation count changed at 10x")
    // (r_name, n_name, revenue, n_lines)
    val rev01 = n01.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    n1.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val expected = 10 * rev01(key)
      assert(math.abs(r.getDouble(2) - expected) <= math.abs(expected) * 1e-9 + 0.1,
        s"$key: revenue ${r.getDouble(2)} !~ 10x ${rev01(key)}")
      assert(r.getLong(3) == 10 * n01.find(a =>
        (a.getString(0), a.getString(1)) == key).get.getLong(3),
        s"$key: n_lines not exactly 10x")
    }
    assert(t1b <= t01b * 60 + 30, f"q05 super-linear: $t01b%.1fs -> $t1b%.1fs")
  }
}
