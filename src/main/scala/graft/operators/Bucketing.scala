package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-layout co-located joins — the storage-side half of shuffle
  * elimination. Writing both fact tables bucketed (and sorted) by their
  * join key means a later join matches bucket-to-bucket with NO exchange
  * on either side: at 100 TB this turns the nightly orders⋈lineitem from
  * a full two-sided shuffle into a local merge per bucket, which is why
  * warehouses bucket their biggest joins. The spec
  * (BucketingSpec) machine-asserts the exchange-free plan; the declared
  * query oracle-matches the join RESULT, proving layout changed nothing
  * semantically.
  *
  * Scale notes: [[NBuckets]] is small here (local fixture); on a cluster
  * you pick buckets ≈ cluster parallelism and the same code holds. The
  * pre-write `repartition(n, key)` routes each bucket to exactly one
  * task so every bucket is one file — that is what lets the bucketed
  * scan skip both the exchange AND the sort (sorted bucket files merge
  * directly).
  */
object Bucketing extends QueryPack {

  val NBuckets = 8

  /** Per-(process, session, dir) scratch tag (ADVICE r5/r6): the bucketed
    * and partitioned copies live under the shared java.io.tmpdir with
    * global catalog names, so parallel test JVMs (pid), concurrent
    * SparkSessions in ONE JVM (session identity — they share a catalog
    * namespace), and dir switches would otherwise clobber each other's
    * layouts (the same trick q_export_manifest plays with dir.hashCode). */
  private def tag(s: SparkSession, dir: String): String =
    java.lang.Long.toHexString(ProcessHandle.current().pid()) + "_" +
      Integer.toHexString(System.identityHashCode(s)) + "_" +
      Integer.toHexString(dir.hashCode & 0x7fffffff)

  /** Catalog names of the bucketed copies (exposed for the plan spec). */
  def ordersTable(s: SparkSession, dir: String): String =
    s"graft_bkt_orders_${tag(s, dir)}"
  def lineitemTable(s: SparkSession, dir: String): String =
    s"graft_bkt_lineitem_${tag(s, dir)}"

  /** Write `df` as a bucketed, per-bucket-sorted parquet table under the
    * session warehouse (a scratch location on this rig; a real lakehouse
    * points spark.sql.warehouse.dir at durable storage). `repartition`
    * by the bucket key first: Spark's shuffle partitioning and its
    * bucket-id function are the same `pmod(murmur3, n)`, so each bucket
    * lands in one task ⇒ one file ⇒ sort-preserving reads. */
  def bucketedCopy(
      s: SparkSession, df: DataFrame, table: String, key: String): Unit = {
    df.repartition(NBuckets, col(key))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(NBuckets, key)
      .sortBy(key)
      .option("path", new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bucketed/$table").getAbsolutePath)
      .saveAsTable(table)
  }

  /** Revenue per order status over the bucketed copies of orders and
    * lineitem: the join runs bucket-to-bucket with no exchange below it
    * (plan-asserted in BucketingSpec); only the final 3-row aggregation
    * shuffles. The oracle computes the identical join over the raw
    * parquet — bucketing must be semantically invisible. */
  val qBucketJoin: Q = Q(
    "q_bucket_join",
    Some(s"""
      SELECT o.o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(CAST(SUM(${decSql("l.l_extendedprice")} *
                      ${decSql("1 - l.l_discount")}) AS VARCHAR(64)) AS DOUBLE) AS revenue
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderstatus
      ORDER BY o.o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    bucketedJoin(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Layout writes already performed, per (session, dir): production
    * writes the bucketed layout once and queries it many times, so
    * repeat invocations (bench runs a query twice) skip the rewrite. */
  private val written =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Boolean]

  /** The exchange-free join itself (shared by the declared query and the
    * plan spec): both sides are bucketed copies of the `dir` tables. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    written.getOrElseUpdate((s, dir), {
      bucketedCopy(s, Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus"), ordersTable(s, dir), "o_orderkey")
      bucketedCopy(s, Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        lineitemTable(s, dir), "l_orderkey")
      // a dir switch within the session must rewrite, not reuse
      written.filterInPlace { case ((sess, d), _) => sess != s || d == dir }
      true
    })
    s.table(ordersTable(s, dir))
      .join(s.table(lineitemTable(s, dir)),
        col("o_orderkey") === col("l_orderkey"))
  }

  /** Hive-style partitioned copy of orders, one directory per order
    * year — written once per (session, dir), like the bucketed copies. */
  def partitionedOrders(s: SparkSession, dir: String): DataFrame = {
    writtenPart.getOrElseUpdate((s, dir), {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft-partitioned-${tag(s, dir)}/orders").getAbsolutePath
      Tables.orders(s, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(path)
      writtenPart.filterInPlace { case ((sess, d), _) => sess != s || d == dir }
      path
    })
    s.read.parquet(writtenPart((s, dir)))
  }
  private val writtenPart =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** Partition pruning — the other storage-side scale lever: the orders
    * table laid out as one directory per order year means a year-scoped
    * query never opens the other years' files (PartitionFilters in the
    * scan, file-count assertion in BucketingSpec). At 100 TB this is the
    * difference between scanning one year and scanning twenty; the
    * oracle computes the same aggregate from the raw table, proving the
    * layout is semantically invisible. */
  val qPartitionPrune: Q = Q(
    "q_partition_prune",
    Some(s"""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ${dsumSql("o_totalprice")} AS total
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
      GROUP BY o_year, o_orderpriority
      ORDER BY o_year, o_orderpriority
      """.stripMargin.trim)
  ) { (s, dir) =>
    partitionedOrders(s, dir)
      .where(col("o_year") === 1995)
      .groupBy("o_year", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(col("o_year").cast("int").as("o_year"), col("o_orderpriority"),
        col("n_orders"), col("total"))
      .orderBy("o_year", "o_orderpriority")
  }

  override def all: Seq[Q] = Seq(qBucketJoin, qPartitionPrune)
}
