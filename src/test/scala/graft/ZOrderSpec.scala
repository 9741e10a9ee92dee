package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.ZOrderLayout

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      if (((x >> i) & 1L) == 1L) z |= 1L << (2 * i)
      if (((y >> i) & 1L) == 1L) z |= 1L << (2 * i + 1)
    }
    z
  }

  test("interleave2 matches the bit-by-bit reference, incl. mask edges") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L), (64L, 0L),
      (-1L, -1L), (Long.MaxValue, Long.MinValue)) ++
      Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    for ((x, y) <- cases; bits <- Seq(1, 6, 16, 31)) {
      val mask = (1L << bits) - 1
      assert(ZOrder.interleave2(x, y, bits) ==
        refInterleave(x & mask, y & mask, bits), s"x=$x y=$y bits=$bits")
    }
  }

  test("expression evaluates identically through codegen and interpreter") {
    val df = spark.range(1000).select(
      (col("id") * 2654435761L).as("a"),
      (col("id") * 40503L + 7).as("b"))
    val viaExpr = df.select(col("a"), col("b"),
        ZOrder.zorder(16, col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    viaExpr.foreach { case (a, b, z) =>
      assert(z == refInterleave(a & 0xFFFF, b & 0xFFFF, 16))
    }
    // null propagation
    val n = spark.sql("SELECT CAST(NULL AS BIGINT) AS a, 3L AS b")
      .select(ZOrder.zorder(8, col("a"), col("b"))).head
    assert(n.isNullAt(0))
  }

  test("z-order layout bounds per-file spread on BOTH dimensions") {
    // Two independent uniform dims; single-column sort leaves dim b with
    // full-range spread in every file, the z-layout bounds both.
    val bits = 8
    val df = spark.range(64 * 1024).select(
      pmod(col("id") * 2654435761L, lit(256)).as("a"),
      pmod(col("id") * 40503L + 13, lit(256)).as("b"))
    val files = 16

    def avgSpread(layout: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val spreads = layout
        .withColumn("part", spark_partition_id())
        .groupBy("part").agg((max(dim) - min(dim)).as("spread"))
        .agg(avg("spread")).head.getDouble(0)
      spreads
    }

    val bySingle = df.repartitionByRange(files, col("a"))
      .sortWithinPartitions(col("a"))
    val byZ = ZOrderLayout.cluster2(df, col("a"), col("b"), bits, files)

    val sA = avgSpread(bySingle, "a")
    val sB = avgSpread(bySingle, "b")
    val zA = avgSpread(byZ, "a")
    val zB = avgSpread(byZ, "b")

    // single-column sort: a is tight, b spans ~the full 0..255 range
    assert(sA < 32, s"sorted-by-a spread(a)=$sA")
    assert(sB > 200, s"sorted-by-a spread(b)=$sB")
    // z-layout: 16 files ≈ one 64x64 quadrant of the 256x256 grid each,
    // but sampled range-split points can straddle a quadrant boundary,
    // doubling a file's span in one dim — so the honest bound is "both
    // dims well under the full range", vs b pinned at ~full range above.
    assert(zA <= 140, s"z spread(a)=$zA")
    assert(zB <= 140, s"z spread(b)=$zB")
    assert(zB < sB / 2, s"z spread(b)=$zB not < half of sorted-by-a $sB")
  }
}
