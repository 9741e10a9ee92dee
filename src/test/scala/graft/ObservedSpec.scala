package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

import graft.operators.{Observed, TextOps}

/** `observe()` metrics ride the job's own plan — no second pass. These
  * specs pin the observed values against direct aggregations. */
class ObservedSpec extends SparkSpec {
  import spark.implicits._

  test("batch curation metrics equal a direct aggregation of the verdicts") {
    val collected = new ConcurrentHashMap[String, Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => collected.put(k, v) }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val verdicts = TextOps.qDedupVerdict.build(spark, sf)
      Observed.curationMetrics(verdicts).collect()
      eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
        assert(collected.containsKey(Observed.CurationMetrics))
      }
      val m = collected.get(Observed.CurationMetrics)
      val direct = verdicts.groupBy("verdict").count()
        .as[(String, Long)].collect().toMap.withDefaultValue(0L)
      assert(m.getAs[Long]("rows") == direct.values.sum)
      assert(m.getAs[Long]("n_drop_exact") == direct("drop_exact"))
      assert(m.getAs[Long]("n_drop_neardup") == direct("drop_neardup"))
      assert(m.getAs[Long]("n_drop_contam") == direct("drop_contam"))
      assert(m.getAs[Long]("n_keep") == direct("keep"))
      assert(m.getAs[Long]("n_keep") > 0)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming ingest metrics surface per micro-batch in query progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)](spark)
    val q = Observed.ingestMetrics(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("s_observed").outputMode("append").start()
    try {
      in.addData((1L, "hello world"), (2L, ""), (3L, "more text"))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get(Observed.IngestMetrics)
      assert(m != null, "no observed metrics in progress")
      assert(m.getAs[Long]("rows") == 3L)
      assert(m.getAs[Long]("n_empty") == 1L)
      assert(m.getAs[Long]("n_oversize") == 0L)
    } finally q.stop()
  }
}
