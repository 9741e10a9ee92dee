package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Generative check: the custom operator equals the window formulation on
  * random data (duplicate keys, skewed groups, ties in the order column,
  * random k) — the shapes a fixed fixture misses. */
class TopKPropSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perGroup == window formulation over randomized frames") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      val nGroups = 1 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(7)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(50).toDouble, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      val custom = TopK.perGroup(df, k, Seq("g"), Seq(df("v").desc, df("id").asc))
        .select("g", "v", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val stock = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= k).drop("rn")
      assert(custom.count() == stock.count(), s"trial $trial (k=$k) count")
      assert(custom.exceptAll(stock).isEmpty && stock.exceptAll(custom).isEmpty,
        s"trial $trial (k=$k, groups=$nGroups) rows differ")
      // non-vacuity guard: pruning must actually bite — a fixture with
      // n <= groups×k would make perGroup the identity and the equality
      // above trivially true
      assert(stock.count() < n, s"trial $trial: top-k never pruned ($n rows)")
    }
  }
}
