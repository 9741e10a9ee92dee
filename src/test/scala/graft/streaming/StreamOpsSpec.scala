package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.MockMaxScaleServer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

case class Ev(event_id: Long, user_id: Long, ts: Timestamp, event_type: String)
case class Cdc(sequence: Long, event_type: String, id: Long, name: String)
case class PackDoc(lang: String, doc_id: Long, n_tok: Long)
case class FuzzyArrival(id: Long, name: String)
case class FunnelEv(user_id: Long, event_type: String, us: Long)
case class VecRow(vec_id: Long, embedding: Seq[Float])
case class DocText(doc_id: Long, text: String)
case class DocQuery(doc_id: Long, text: String, embedding: Seq[Float])

/** MemoryStream-driven specs for the `s_*` streaming ops (SURVEY.md §5
  * item 4) plus the CDC-source → latest-state integration — the full
  * "changelog in, materialized table out" pipeline. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("s_win_tumble: tumbling counts per event_type, late data dropped by watermark") {
    val in = MemoryStream[Ev](spark)
    val q = StreamOps.tumblingCounts(in.toDF(), watermark = "2 minutes")
      .writeStream.format("memory").queryName("s_tumble").outputMode("update").start()
    try {
      in.addData(
        Ev(1, 1, ts(0, 10), "click"), Ev(2, 1, ts(0, 40), "click"),
        Ev(3, 2, ts(1, 5), "view"))
      q.processAllAvailable()
      val t1 = spark.table("s_tumble").as[(Timestamp, String, Long)].collect().toSet
      assert(t1.contains((ts(0), "click", 2L)))
      assert(t1.contains((ts(1), "view", 1L)))

      // advance event time far ahead → watermark passes 10:00 windows
      in.addData(Ev(4, 3, ts(9), "click"))
      q.processAllAvailable()
      // this event is > 2 min behind the watermark (09:09 - 2min > 00:30): dropped
      in.addData(Ev(5, 1, ts(0, 30), "click"))
      q.processAllAvailable()
      val counts = spark.table("s_tumble").as[(Timestamp, String, Long)]
        .collect().groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max)
      assert(counts((ts(0), "click")) == 2L) // still 2 — late row discarded
    } finally q.stop()
  }

  test("s_win_slide: each event lands in length/slide overlapping windows") {
    val in = MemoryStream[Ev](spark)
    val q = StreamOps.slidingCounts(in.toDF(), watermark = "2 minutes")
      .writeStream.format("memory").queryName("s_slide").outputMode("update").start()
    try {
      in.addData(
        Ev(1, 1, ts(1, 10), "click"), Ev(2, 1, ts(1, 40), "click"),
        Ev(3, 2, ts(2, 5), "view"))
      q.processAllAvailable()
      val rows = spark.table("s_slide").as[(Timestamp, String, Long)].collect().toSet
      // 2-min windows sliding by 1 min: the 10:01 clicks belong to windows
      // starting 10:00 AND 10:01; the 10:02 view to 10:01 AND 10:02
      assert(rows.contains((ts(0), "click", 2L)))
      assert(rows.contains((ts(1), "click", 2L)))
      assert(rows.contains((ts(1), "view", 1L)))
      assert(rows.contains((ts(2), "view", 1L)))
      // no window starts after its last possible member
      assert(!rows.exists { case (w, k, _) => k == "click" && w.after(ts(1)) })
    } finally q.stop()
  }

  test("s_session: gap-merged sessions finalize when the watermark passes") {
    val in = MemoryStream[Ev](spark)
    val q = StreamOps.sessionCounts(in.toDF(), keyCol = "user_id",
        gap = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("s_session").outputMode("append").start()
    try {
      // user 1: two events 2min apart (one session); user 2: one event
      in.addData(Ev(1, 1, ts(0), "click"), Ev(2, 1, ts(2), "view"),
        Ev(3, 2, ts(1), "click"))
      q.processAllAvailable()
      // far-future event pushes the watermark past every session above
      in.addData(Ev(4, 3, ts(59), "click"))
      q.processAllAvailable()
      val rows = spark.table("s_session")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(rows.contains((1L, ts(0), ts(7), 2L)))  // end = last event + gap
      assert(rows.contains((2L, ts(1), ts(6), 1L)))
    } finally q.stop()
  }

  test("s_distinct_kmv: streaming sketch state equals the batch sketch over the union") {
    val in = MemoryStream[(String, Double)](spark)
    val q = StreamOps.distinctKmv(in.toDF().toDF("k", "u"), k = 4)
      .writeStream.format("memory").queryName("s_kmv").outputMode("complete").start()
    try {
      // batch 1: 3 distinct hashes (< k ⇒ exact), one duplicate
      in.addData(("a", 0.9), ("a", 0.5), ("a", 0.7), ("a", 0.5))
      q.processAllAvailable()
      assert(spark.table("s_kmv").as[(String, Double)].collect().toMap
        .apply("a") == 3.0)
      // batch 2 pushes "a" past k=4 distinct: estimate = (k-1)/u_(k);
      // after {0.5,0.7,0.9,0.1,0.3} the 4 minima are {0.1,0.3,0.5,0.7}
      in.addData(("a", 0.1), ("a", 0.3), ("b", 0.2))
      q.processAllAvailable()
      val m = spark.table("s_kmv").as[(String, Double)].collect().toMap
      assert(m("b") == 1.0)
      assert(m("a") == 3.0 / 0.7,
        s"streaming merge diverged from the batch sketch: ${m("a")}")
      // the invariant under test: identical to one batch agg over the union
      val batch = Seq(("a", 0.9), ("a", 0.5), ("a", 0.7), ("a", 0.5),
        ("a", 0.1), ("a", 0.3), ("b", 0.2)).toDF("k", "u")
      val expected = StreamOps.distinctKmv(batch, k = 4)
        .as[(String, Double)].collect().toMap
      assert(m == expected)
    } finally q.stop()
  }

  test("s_quantile_hist: streamed histogram state + shared read-out ≡ batch query") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    val in = MemoryStream[(String, Double)](spark)
    val q = StreamOps.histogramSketchStream(in.toDF().toDF("f", "v"))
      .writeStream.format("memory").queryName("s_qhist").outputMode("complete").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      // streamed state ≡ the batch histogram frame, bin for bin
      val got = spark.table("s_qhist")
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
      val expect = graft.Tables.lineitem(spark, sf)
        .select(col("l_returnflag").as("f"),
          floor(col("l_extendedprice") /
            graft.operators.Aggregates.QuantileBinWidth).as("b"))
        .groupBy("f", "b").agg(count(lit(1)).as("c"))
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
      assert(got == expect, "streamed histogram diverged from the batch frame")
      // the SAME read-out over the streamed state ≡ the declared query
      // (materialized to a local relation: MemoryPlan views cannot be
      // self-joined, and the read-out joins the frame with its total)
      val state = spark.table("s_qhist")
        .as[(String, Long, Long)].collect().toSeq.toDF("f", "b", "c")
      val readGot = graft.operators.Aggregates.quantileReadOut(state)
        .orderBy("f").as[(String, Long, Long, Long)].collect().toSeq
      val readExpect = graft.operators.Aggregates.qQuantileHist.build(spark, sf)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(readGot == readExpect)
    } finally q.stop()
  }

  test("s_bloom: streaming bitset state equals the batch sketch over the union") {
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamOps.bloomFilterStream(in.toDF().toDF("k", "h"), mBits = 256, k = 3,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_bloom").outputMode("complete").start()
    try {
      in.addData(("a", 7L), ("a", 13L), ("b", 99L))
      q.processAllAvailable()
      val bits1 = spark.table("s_bloom").as[(String, Array[Long])]
        .collect().toMap.apply("a").toSeq
      // idempotence: re-adding already-seen members must not move a bit
      in.addData(("a", 7L), ("a", 13L))
      q.processAllAvailable()
      val bits2 = spark.table("s_bloom").as[(String, Array[Long])]
        .collect().toMap.apply("a").toSeq
      assert(bits1 == bits2, "re-inserting members changed the bitset")
      in.addData(("a", 42L), ("b", 7L))
      q.processAllAvailable()
      val m = spark.table("s_bloom").as[(String, Array[Long])].collect().toMap
      // the invariant under test: bit-equal to one batch agg over the union
      val batch = Seq(("a", 7L), ("a", 13L), ("a", 7L), ("a", 13L),
        ("a", 42L), ("b", 99L), ("b", 7L)).toDF("k", "h")
      val expected = StreamOps.bloomFilterStream(batch, mBits = 256, k = 3,
        checkpointLocation = StreamOps.EphemeralState)
        .as[(String, Array[Long])].collect().toMap
      assert(m.keySet == expected.keySet)
      m.keys.foreach(k => assert(m(k).toSeq == expected(k).toSeq,
        s"streamed bitset for $k diverged from the batch sketch"))
      // monotonicity: the union bitset contains every bit from batch 1
      assert(bits1.zip(m("a").toSeq).forall { case (o, n) => (o & ~n) == 0L },
        "a set bit was lost as members arrived")
    } finally q.stop()
  }

  test("s_anomaly: running stats equal the batch frame; classification ≡ q_anomaly") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect()
    val in = MemoryStream[(String, Long, Double)](spark)
    val q = StreamOps.anomalyStats(
        in.toDF().toDF("event_type", "event_id", "value"))
      .writeStream.format("memory").queryName("s_anom").outputMode("complete").start()
    try {
      val chunks = evs.grouped((evs.length + 2) / 3).toSeq
      chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("s_anom")
      // running state after all batches == one batch agg over the union,
      // bit-equal because the sums are DECIMAL-carried
      val batchStats = StreamOps.anomalyStats(
        graft.Tables.events(spark, sf)
          .select(col("event_type"), col("event_id"), col("value")))
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.as[(String, Long, Double, Double)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      val s = asMap(streamed)
      val b = asMap(batchStats)
      assert(s == b, "streamed power sums diverged from the batch frame")
      // classify-on-demand with the streamed frame ≡ the batch q_anomaly
      val got = StreamOps.anomalyClassify(
          graft.Tables.events(spark, sf), streamed)
        .select("event_id").as[Long].collect().toSet
      val expect = graft.operators.Events.qAnomaly.build(spark, sf)
        .select("event_id").as[Long].collect().toSet
      assert(got == expect, "streamed-stats classification ≠ batch q_anomaly")
    } finally q.stop()
  }

  test("s_semantic_dedup: in-order arrival verdicts equal the batch q_semantic_dedup") {
    val e = graft.Tables.embeddings(spark, sf)
    // the batch query's centroids: quantized vec_ids 0..3
    val cents = graft.operators.Similarity.quantizedInt8(e)
      .where(col("vec_id") < 4)
      .select(col("vec_id"), col("qv"), col("qn2"))
      .as[(Long, Seq[Long], Long)].collect()
      .map(t => (t._1, t._2, t._3)).toSeq
    val rows = e.select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.semanticDedupStream(in.toDF(), cents,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_semdedup").outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_semdedup")
        .as[(Long, Long, Boolean)].collect().toSet
      val expect = graft.operators.Similarity.semanticDedup(e)
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got == expect,
        s"stream diverged: extra=${got.diff(expect).take(5)} missing=${expect.diff(got).take(5)}")
      assert(got.exists(_._3), "the drop must bite on the fixture")
    } finally q.stop()
  }

  test("s_pq_encode: stateless streaming codes equal the batch pqCodes " +
      "for every vector, across micro-batches") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val cbs = graft.operators.Similarity.pqCodebooks(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.pqEncodeStream(in.toDF(), cbs,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_pq_encode")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_pq_encode")
        .as[(Long, Seq[Long])].collect().toMap
      val expect = graft.operators.Similarity.pqCodes(e)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("s"), col("j")))).as("cs"))
        .select(col("vec_id"), col("cs.j"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got.size == rows.length)
      assert(got == expect,
        s"diverged: ${got.toSeq.diff(expect.toSeq).take(3)} vs " +
          s"${expect.toSeq.diff(got.toSeq).take(3)}")
    } finally q.stop()
  }

  test("s_ivfpq_encode: stateless streaming residual codes equal the " +
      "batch residual index (cell + codes), across micro-batches") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, idx) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.ivfPqEncodeStream(in.toDF(), cells, cbs,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_ivfpq_encode")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_ivfpq_encode")
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val expect = idx
        .groupBy("vec_id", "cell_id")
        .agg(array_sort(collect_list(struct(col("s"), col("j")))).as("cs"))
        .select(col("vec_id"), col("cell_id"), col("cs.j"))
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size == rows.length)
      assert(got == expect,
        s"diverged: ${got.toSeq.diff(expect.toSeq).take(3)} vs " +
          s"${expect.toSeq.diff(got.toSeq).take(3)}")
    } finally q.stop()
  }

  test("s_pq_search: streaming ANN queries served from the static " +
      "compressed index equal the batch q_sim_pq top-k exactly") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val cbs = graft.operators.Similarity.pqCodebooks(e)
    val codes = graft.operators.Similarity.pqCodes(e, cbs)
    // the batch query set (vec_id < 8) arrives as a STREAM, split
    // across micro-batches; the index and codebooks are static
    val rows = e.where(col("vec_id") < 8).as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.pqSearchStream(in.toDF(), codes, cbs, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_pq_search")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      // leaderboard contract: the max-ver set per query is current
      val t = spark.table("s_pq_search")
      val got = t.withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id").cast("long"), col("rank"),
          col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      val expect = graft.operators.Similarity.qSimPq.build(spark, sf)
        .select(col("query_id"), col("rank").cast("int"), col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expect,
        s"diverged: ${got.diff(expect).take(5)} vs ${expect.diff(got).take(5)}")
    } finally q.stop()
  }

  test("s_bm25_search: streaming lexical retrieval from the served index " +
      "equals the batch q_bm25 leaderboard exactly, re-delivery idempotent") {
    val docs = graft.Tables.documents(spark, sf)
    val index = graft.operators.TextOps.bm25ServedIndex(docs)
    val (n, t) = graft.operators.TextOps.bm25Stats(docs)
    // the batch query set (doc_id < 8) arrives as a STREAM across
    // micro-batches; the postings index and (n, t) stats are static
    val rows = docs.where(col("doc_id") < 8)
      .select(col("doc_id"), col("text")).as[DocText].collect().sortBy(_.doc_id)
    val in = MemoryStream[DocText](spark)
    val q = StreamOps.bm25SearchStream(in.toDF(), index, n, t, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_bm25_search")
      .outputMode("append").start()
    def leaderboard(): Set[(Long, Int, Long, Double)] = {
      val tab = spark.table("s_bm25_search")
      tab.withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
        .as[(Long, Int, Long, Double)].collect().toSet
    }
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val expect = graft.operators.TextOps.qBm25.build(spark, sf)
        .select(col("query_id"), col("rank").cast("int"),
          col("neighbor_id"), col("score"))
        .as[(Long, Int, Long, Double)].collect().toSet
      val got = leaderboard()
      assert(got == expect,
        s"diverged: ${got.diff(expect).take(5)} vs ${expect.diff(got).take(5)}")
      // re-deliver a query doc: identical sums REPLACE its neighbors'
      // entries (dedup by id) — leaderboard unchanged, no duplicate slots
      in.addData(rows.head); q.processAllAvailable()
      assert(leaderboard() == expect, "re-delivery changed the leaderboard")
      // WITHIN-batch duplicate (same query twice in ONE micro-batch):
      // the (neighbor, term-hash) dedup keeps the sums single-counted
      in.addData(Seq(rows.head, rows.head)); q.processAllAvailable()
      assert(leaderboard() == expect,
        "within-batch duplicate query doubled the sums")
    } finally q.stop()
  }

  test("s_hybrid_search: streaming hybrid retrieval equals the batch RRF " +
      "fusion of the BM25 and residual-ADC legs exactly") {
    val docs = graft.Tables.documents(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val lexIndex = graft.operators.TextOps.bm25ServedIndex(docs)
    val (n, t) = graft.operators.TextOps.bm25Stats(docs)
    val (cells, cbs, idx) = graft.operators.Similarity.pqResArtifacts(e)
    // query docs carry BOTH representations (shared id space)
    val rows = docs.where(col("doc_id") < 8).select(col("doc_id"), col("text"))
      .join(e.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .as[DocQuery].collect().sortBy(_.doc_id)
    val in = MemoryStream[DocQuery](spark)
    val q = StreamOps.hybridSearchStream(in.toDF(), lexIndex, n, t,
      idx, cells, cbs, k = 5, fuseDepth = 20,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_hybrid_search")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val tab = spark.table("s_hybrid_search")
      val got = tab.withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"),
          col("rrf_fx"), col("rank_lex"), col("rank_vec"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._4,
          if (r._5 == 0L) None else Some(r._5),
          if (r._6 == 0L) None else Some(r._6))).toSet
      // batch reference: the leg-agnostic fusion over the SAME legs —
      // bm25Ranked at fuseDepth and the residual-ADC leg at fuseDepth
      val expect = graft.operators.Retrieval.hybridRrf(
          graft.operators.TextOps.bm25Ranked(docs, 20)
            .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_lex")),
          graft.operators.Similarity.ivfPqResTopK(spark, sf, 20)
            .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_vec")))
        .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
        .map(r => (r._1, r._6, r._2, r._3, r._4, r._5)).toSet
      assert(got == expect,
        s"diverged: ${got.diff(expect).take(5)} vs ${expect.diff(got).take(5)}")
      // re-delivery: complete legs re-derive identically, state replaced
      in.addData(rows.head); q.processAllAvailable()
      val got2 = spark.table("s_hybrid_search").withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"),
          col("rrf_fx"), col("rank_lex"), col("rank_vec"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._4,
          if (r._5 == 0L) None else Some(r._5),
          if (r._6 == 0L) None else Some(r._6))).toSet
      assert(got2 == expect, "re-delivery changed the fused leaderboard")
      // WITHIN-batch duplicate: without per-leg dedup the vector
      // duplicates would occupy fuseDepth slots with corrupted ranks
      // (2,4,6,…) and the lexical sums would double
      in.addData(Seq(rows.head, rows.head)); q.processAllAvailable()
      val got3 = spark.table("s_hybrid_search").withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"),
          col("rrf_fx"), col("rank_lex"), col("rank_vec"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._4,
          if (r._5 == 0L) None else Some(r._5),
          if (r._6 == 0L) None else Some(r._6))).toSet
      assert(got3 == expect,
        "within-batch duplicate query corrupted the fusion")
    } finally q.stop()
  }

  test("s_ivfpq_search: streaming queries served from the residual " +
      "compressed index equal the batch q_sim_ivfpq_res top-k exactly") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, idx) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.where(col("vec_id") < 8).as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.ivfPqSearchStream(in.toDF(), idx, cells, cbs, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_ivfpq_search")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val t = spark.table("s_ivfpq_search")
      val got = t.withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id").cast("long"), col("rank"),
          col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      val expect = graft.operators.Similarity.qSimIvfPqRes.build(spark, sf)
        .select(col("query_id"), col("rank").cast("int"), col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expect,
        s"diverged: ${got.diff(expect).take(5)} vs ${expect.diff(got).take(5)}")
    } finally q.stop()
  }

  test("s_hamming_search: streamed sign-code shortlist equals the batch " +
      "Hamming shortlist, and the shared re-rank reproduces q_sim_hamming") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val codes = graft.operators.Similarity.hammingCodes(e)
    val rows = e.where(col("vec_id") < 8).as[VecRow].collect().sortBy(_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.hammingSearchStream(in.toDF(), codes)
      .writeStream.format("memory").queryName("s_hamming_search")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val t = spark.table("s_hamming_search")
      val streamed = t.withColumn("maxv",
          max("ver").over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id").cast("long"), col("neighbor_id"))
      val got = streamed.as[(Long, Long)].collect().toSet
      val expect = graft.operators.Similarity.hammingShortlist(e)
        .as[(Long, Long)].collect().toSet
      assert(got == expect,
        s"shortlist diverged: ${got.diff(expect).take(5)} vs ${expect.diff(got).take(5)}")
      // streamed shortlist + the batch stage-2 re-rank ≡ the full query
      val reranked = graft.operators.Similarity
        .hammingRerank(e, streamed.toDF("query_id", "neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
      val full = graft.operators.Similarity.qSimHamming.build(spark, sf)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
      assert(reranked == full,
        s"reranked diverged: ${reranked.diff(full).take(5)} vs ${full.diff(reranked).take(5)}")
    } finally q.stop()
  }

  /** Run `body` with the RocksDB state-store provider — the 100 TB path
    * for the corpus-shaped membership states (VERDICT r5 item 5). */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("s_semantic_dedup on transformWithState/RocksDB: verdicts equal the " +
      "batch query, state rows bounded by admissions") {
    val e = graft.Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity.quantizedInt8(e)
      .where(col("vec_id") < 4)
      .select(col("vec_id"), col("qv"), col("qn2"))
      .as[(Long, Seq[Long], Long)].collect()
      .map(t => (t._1, t._2, t._3)).toSeq
    val rows = e.select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().sortBy(_.vec_id)
    withRocksDb {
      val in = MemoryStream[VecRow](spark)
      val q = StreamOps.semanticDedupStream(in.toDF(), cents, tws = true,
        checkpointLocation = StreamOps.EphemeralState)
        .writeStream.format("memory").queryName("s_semdedup_tws")
        .outputMode("append").start()
      try {
        rows.grouped((rows.length + 2) / 3)
          .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val got = spark.table("s_semdedup_tws")
          .as[(Long, Long, Boolean)].collect().toSet
        val expect = graft.operators.Similarity.semanticDedup(e)
          .as[(Long, Long, Boolean)].collect().toSet
        assert(got == expect,
          s"tws diverged: extra=${got.diff(expect).take(5)} missing=${expect.diff(got).take(5)}")
        // state-size contract: the store holds exactly the admitted
        // members (one list element per vector; every vector admitted
        // here since cells are far under maxCell) — NOT the stream
        val st = q.lastProgress.stateOperators
        assert(st.nonEmpty, "no state operator reported progress")
        val stateRows = st.map(_.numRowsTotal).sum
        info(s"state rows: $stateRows for ${rows.length} vectors")
        assert(stateRows <= rows.length,
          s"state ($stateRows rows) exceeds admitted members (${rows.length})")
      } finally q.stop()
    }
  }

  test("s_neardup_stream on transformWithState/RocksDB: saturated bucket " +
      "stops admitting AND the store holds only capped members") {
    withRocksDb {
      val in = MemoryStream[(Long, String)](spark)
      val q = StreamOps.neardupStream(in.toDF().toDF("doc_id", "text"),
        checkpointLocation = StreamOps.EphemeralState,
          maxBucket = 3, tws = true)
        .writeStream.format("memory").queryName("s_neardup_tws")
        .outputMode("append").start()
      try {
        in.addData((1L to 5L).map(i => (i, "alpha beta gamma delta epsilon")))
        q.processAllAvailable()
        val pairs = spark.table("s_neardup_tws")
          .as[(Long, Long)].collect().toSet
        // 5 identical docs, cap 3 ⇒ C(3,2)=3 pairs per the 4 shared bands
        assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
          s"capped pair set wrong: $pairs")
        // the cap is a STATE bound too: ≤ 3 members × 4 buckets
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        info(s"state rows: $stateRows (cap 3 × 4 buckets)")
        assert(stateRows <= 12,
          s"state ($stateRows rows) exceeds the cap bound of 12")
      } finally q.stop()
    }
  }

  test("s_embed_neardup_stream on transformWithState/RocksDB: streamed " +
      "candidates equal the batch LSH gate") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (first, second) = vecs.splitAt(vecs.length / 2)
    withRocksDb {
      val in = MemoryStream[(Long, Array[Float])](spark)
      val q = StreamOps.embedNeardupStream(
          in.toDF().toDF("vec_id", "embedding"), tws = true,
          checkpointLocation = StreamOps.EphemeralState)
        .writeStream.format("memory").queryName("s_embed_neardup_tws")
        .outputMode("append").start()
      try {
        in.addData(first.toSeq); q.processAllAvailable()
        in.addData(second.toSeq); q.processAllAvailable()
        val streamed = spark.table("s_embed_neardup_tws")
          .as[(Long, Long)].collect().toSet
        val batch = graft.operators.Similarity
          .neardupCandidates(graft.Tables.embeddings(spark, sf))
          .as[(Long, Long)].collect().toSet
        assert(streamed == batch,
          s"tws streamed ${streamed.size} candidate pairs, batch ${batch.size}")
      } finally q.stop()
    }
  }

  test("StateGeometryGuard: a restart with altered family parameters fails " +
      "loudly; same-family rebind and an e2e resume stay silent") {
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_family").toString
    try {
      // e2e: the guard is wired through the operator's
      // checkpointLocation parameter — first run freezes the family
      val in = MemoryStream[(Long, Array[Float])](spark)
      val vecs = graft.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
      val delivered = new java.util.concurrent.atomic.AtomicLong
      def start(bits: Int) = StreamOps.embedNeardupStream(
          in.toDF().toDF("vec_id", "embedding"), nBits = bits,
          checkpointLocation = ckpt)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.addAndGet(df.count()); ()
        }
        .outputMode("append").start()
      val q = start(bits = 10)
      try { in.addData(vecs.take(50)); q.processAllAvailable() }
      finally q.stop()
      // same family: resume allowed, state continues
      val q2 = start(bits = 10)
      try { in.addData(vecs.drop(50).take(50)); q2.processAllAvailable() }
      finally q2.stop()
      // altered family: rejected at build time, BEFORE any state damage
      val e = intercept[IllegalStateException] { start(bits = 14) }
      assert(e.getMessage.contains("state-geometry mismatch") &&
        e.getMessage.contains("\"bits\":10") &&
        e.getMessage.contains("\"bits\":14"), e.getMessage)
      // the minhash family guards the doc stream the same way
      StateGeometryGuard.bind(ckpt + "/docs", StateGeometryGuard.minhash(64))
      StateGeometryGuard.bind(ckpt + "/docs", StateGeometryGuard.minhash(64))
      val e2 = intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/docs", StateGeometryGuard.minhash(32))
      }
      assert(e2.getMessage.contains("maxBucket"))
      // bloom bitset geometry and chunk-gram size: same guard class
      StateGeometryGuard.bind(ckpt + "/bloom", StateGeometryGuard.bloom(2048, 3))
      intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/bloom", StateGeometryGuard.bloom(4096, 3))
      }
      StateGeometryGuard.bind(ckpt + "/chunks", StateGeometryGuard.chunks(4))
      intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/chunks", StateGeometryGuard.chunks(8))
      }
      // semantic: the centroid fingerprint is ORDER-insensitive content —
      // a permutation binds clean, a changed centroid or tau rejects
      val cents = Seq((1L, Seq(1L, 2L), 5L), (2L, Seq(3L, 4L), 25L))
      StateGeometryGuard.bind(ckpt + "/sem",
        StateGeometryGuard.semantic(cents, 0.45, 4096))
      StateGeometryGuard.bind(ckpt + "/sem",
        StateGeometryGuard.semantic(cents.reverse, 0.45, 4096))
      intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/sem", StateGeometryGuard.semantic(
          Seq((1L, Seq(1L, 2L), 5L), (2L, Seq(3L, 5L), 34L)), 0.45, 4096))
      }
      intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/sem",
          StateGeometryGuard.semantic(cents, 0.5, 4096))
      }
      // ivf cell statistics: re-seeded centroids reject
      StateGeometryGuard.bind(ckpt + "/ivf", StateGeometryGuard.ivf(cents))
      StateGeometryGuard.bind(ckpt + "/ivf",
        StateGeometryGuard.ivf(cents.reverse))
      intercept[IllegalStateException] {
        StateGeometryGuard.bind(ckpt + "/ivf",
          StateGeometryGuard.ivf(cents.take(1)))
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }

  test("s_semantic_dedup: out-of-order arrival is self-consistent (seen-so-far refs)") {
    val e = graft.Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity.quantizedInt8(e)
      .where(col("vec_id") < 4)
      .select(col("vec_id"), col("qv"), col("qn2"))
      .as[(Long, Seq[Long], Long)].collect()
      .map(t => (t._1, t._2, t._3)).toSeq
    // arrive HIGHEST id first — the opposite of the batch's a<b order
    val rows = e.select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().sortBy(-_.vec_id)
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.semanticDedupStream(in.toDF(), cents,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_semdedup_ooo").outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val out = spark.table("s_semdedup_ooo")
        .as[(Long, Long, Boolean)].collect()
      assert(out.length == rows.length, "one verdict per vector")
      // online semantics: a vector is dropped iff a cell-mate that
      // ARRIVED EARLIER (here: higher id, or same-batch-lower-sort) sits
      // above tau — so the total drop count matches the batch pair graph
      // even though individual keep/drop roles flip with arrival order
      val batchPairs = {
        val asg = graft.operators.Similarity.cellAssign(e, 4)
          .select(col("vec_id"), col("cid"), col("qv"), col("qn2"))
        val a = asg.select(col("cid"), col("vec_id").as("va"),
          col("qv").as("qva"), col("qn2").as("qn2a"))
        val b = asg.select(col("cid"), col("vec_id").as("vb"),
          col("qv").as("qvb"), col("qn2").as("qn2b"))
        a.join(b, Seq("cid")).where(col("va") < col("vb"))
          .where(aggregate(zip_with(col("qva"), col("qvb"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).cast("double") /
            (sqrt(col("qn2a").cast("double")) * sqrt(col("qn2b").cast("double")))
            > graft.operators.Similarity.SemDedupTau)
          .select("va", "vb").as[(Long, Long)].collect()
      }
      val dropped = out.filter(_._3).map(_._1).toSet
      // every dropped vector has SOME above-tau partner in the pair graph
      val inGraph = batchPairs.flatMap(p => Seq(p._1, p._2)).toSet
      assert(dropped.subsetOf(inGraph),
        s"dropped without a partner: ${dropped.diff(inGraph)}")
      // and per connected pair-set, exactly one member survives per
      // arrival chain — at minimum, never ALL members of a pair kept
      batchPairs.foreach { case (a2, b2) =>
        assert(dropped.contains(a2) || dropped.contains(b2),
          s"pair ($a2,$b2) above tau but both kept")
      }
    } finally q.stop()
  }

  test("s_media_decode: streaming decode-with-quarantine equals the batch kernel") {
    import graft.operators.Multimodal
    // real PNGs + one corrupt payload, exactly as a media ingest sees them
    val rows = (0L until 24L).map { id =>
      val png = Multimodal.encodePng(
        Multimodal.pngWidth(id), Multimodal.pngHeight(id), (id % 256).toInt,
        s"doc $id body".getBytes("UTF-8"))
      Multimodal.MediaRow(id, "image/png",
        if (id % 7 == 3) png.take(8) else png) // truncate → quarantine
    }
    val in = MemoryStream[Multimodal.MediaRow](spark)
    val q = Multimodal.decodeMetaSafe(in.toDS()).toDF()
      .writeStream.format("memory").queryName("s_media").outputMode("append").start()
    try {
      rows.grouped(9).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_media")
        .as[(Long, String, Long, Int, Int)].collect().toSet
      val expect = Multimodal.decodeMetaSafe(rows.toDS())
        .as[(Long, String, Long, Int, Int)].collect().toSet
      assert(got == expect, "streamed decode diverged from the batch kernel")
      assert(got.count(_._2 == "quarantined") == rows.count(_.media_id % 7 == 3),
        "quarantine side-output must catch exactly the corrupt payloads")
      assert(got.count(_._2 == "ok") > 0)
    } finally q.stop()
  }

  test("s_chunk_dedup: online gate flags exactly df-1 of each chunk's df occurrences") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.chunkDedupStream(in.toDF().toDF("doc_id", "text"),
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_chunks").outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val out = spark.table("s_chunks").cache()
      // ground truth: the batch df table over the same corpus
      val w = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val ct = graft.operators.Corpus.ChunkTokens
      val df = w.select(explode(transform(
          sequence(lit(1), ceil(size(col("t")) / lit(ct.toDouble)).cast("int")),
          i => xxhash64(array_join(
            slice(col("t"), (i - 1) * ct + 1, lit(ct)), " ")))).as("chunk_hash"))
        .groupBy("chunk_hash").agg(count(lit(1)).as("df"))
      // every occurrence emitted exactly once
      assert(out.count() == df.agg(sum("df")).head.getLong(0))
      // per chunk: flagged = df - 1 (first occurrence survives)
      val flagged = out.groupBy("chunk_hash")
        .agg(sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      val bad = flagged.join(df, "chunk_hash")
        .filter(col("n_flagged") =!= col("df") - 1)
      assert(bad.count() == 0, "online gate must flag all but the first occurrence")
      // the gate really bites on the fixture
      assert(out.filter(col("flagged")).count() > 0)
      out.unpersist()
    } finally q.stop()
  }

  test("s_retention: summed deltas equal the batch matrix, under out-of-order arrival") {
    // real fixture activity, arriving LATEST-FIRST so cohort rebasing
    // (the hard late-data case) happens constantly
    val activity = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .as[(Long, java.sql.Date)].collect()
      .sortBy { case (u, d) => (-d.getTime, u) }
    val in = MemoryStream[(Long, java.sql.Date)](spark)
    val q = StreamOps.retentionDeltas(in.toDF().toDF("user_id", "d"))
      .writeStream.format("memory").queryName("s_ret").outputMode("append").start()
    try {
      activity.grouped((activity.length + 3) / 4)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_ret")
        .groupBy("cohort", "offset_days")
        .agg(sum("delta").as("active_users"))
        .filter(col("active_users") =!= 0)
        .as[(java.sql.Date, Int, Long)].collect()
        .map(t => (t._1.toString, t._2, t._3)).toSet
      val expect = graft.operators.Events.qRetention.build(spark, sf)
        .as[(java.sql.Date, Int, Long)].collect()
        .map(t => (t._1.toString, t._2, t._3)).toSet
      assert(got == expect,
        s"retention diverged: extra=${got.diff(expect)} missing=${expect.diff(got)}")
      // retractions actually happened (latest-first forces rebases)
      val negs = spark.table("s_ret").filter(col("delta") < 0).count()
      assert(negs > 0, "no rebase was exercised — arrival order too kind")
    } finally q.stop()
  }

  test("s_retention: state survives a checkpointed stop/restart (no re-emission)") {
    val activity = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .as[(Long, java.sql.Date)].collect()
      .sortBy { case (u, d) => (d.getTime, u) }
    val (first, second) = activity.splitAt(activity.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft-ret-ckpt").toFile
    try {
      val in = MemoryStream[(Long, java.sql.Date)](spark)
      val deltas = StreamOps.retentionDeltas(in.toDF().toDF("user_id", "d"))
      def start() = deltas.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      val q1 = start()
      in.addData(first.toIndexedSeq)
      q1.processAllAvailable()
      q1.stop()
      val nBefore = spark.read.parquet(s"$base/out").count()
      assert(nBefore > 0)
      // restart from the same checkpoint; only NEW data may emit
      val q2 = start()
      try {
        in.addData(second.toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
      val all = spark.read.parquet(s"$base/out")
      assert(all.count() > nBefore, "phase 2 emitted nothing")
      // date-ascending arrival never rebases, so every delta is +1 …
      assert(all.filter(col("delta") =!= 1L).count() == 0)
      // … and the union across the restart summing EXACTLY to the batch
      // matrix proves exactly-once: any re-emission after recovery (or
      // any loss) would break the sums
      val got = all.groupBy("cohort", "offset_days")
        .agg(sum("delta").as("active_users"))
        .as[(java.sql.Date, Int, Long)].collect()
        .map(t => (t._1.toString, t._2, t._3)).toSet
      val expect = graft.operators.Events.qRetention.build(spark, sf)
        .as[(java.sql.Date, Int, Long)].collect()
        .map(t => (t._1.toString, t._2, t._3)).toSet
      assert(got == expect, "post-restart union diverged from the batch matrix")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("s_contam: stateless ingestion gate equals the batch q_contam_ngram verdicts") {
    val mod = graft.operators.Corpus.ContamBenchMod
    val docs = graft.Tables.documents(spark, sf)
    val benchmark = docs.filter(col("doc_id") % mod === 0)
    val arrivals = docs.filter(col("doc_id") % mod =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.contamGateStream(
        in.toDF().toDF("doc_id", "text"), benchmark)
      .writeStream.format("memory").queryName("s_contam").outputMode("append").start()
    try {
      arrivals.grouped((arrivals.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("s_contam")
        .as[(Long, Long, Long, Double)].collect().toSet
      val expect = graft.operators.Corpus.qContamNgram.build(spark, sf)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == expect,
        s"gate diverged from batch: extra=${got.diff(expect)} missing=${expect.diff(got)}")
      assert(got.nonEmpty, "the gate must flag something on the fixture")
    } finally q.stop()
  }

  test("s_heavy_hitters: streaming CMS state equals the batch sketch over the union") {
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamOps.heavyHittersSketch(in.toDF().toDF("k", "h"), width = 8)
      .writeStream.format("memory").queryName("s_cms").outputMode("complete").start()
    try {
      in.addData(("a", 7L), ("a", 7L), ("a", 13L), ("b", 7L))
      q.processAllAvailable()
      in.addData(("a", 7L), ("a", 99L), ("b", 13L))
      q.processAllAvailable()
      val m = spark.table("s_cms").as[(String, Array[Long])].collect().toMap
      // the invariant under test: identical grids to one batch agg over the union
      val batch = Seq(("a", 7L), ("a", 7L), ("a", 13L), ("b", 7L),
        ("a", 7L), ("a", 99L), ("b", 13L)).toDF("k", "h")
      val expected = StreamOps.heavyHittersSketch(batch, width = 8)
        .as[(String, Array[Long])].collect().toMap
      assert(m.keySet == expected.keySet)
      m.keys.foreach(k => assert(m(k).toSeq == expected(k).toSeq, s"grid for $k"))
      // grid mass per key = number of occurrences x depth rows
      assert(m("a").sum == 5L * 4 && m("b").sum == 2L * 4)
      // point estimate for the heavy item is >= its true count
      val est = (0 until 4).map(i => m("a")(i * 8 +
        (((7L * graft.functions.MinHashSig.A(i) + graft.functions.MinHashSig.B(i)) %
          graft.functions.MinHashSig.P) % 8).toInt)).min
      assert(est >= 3L)
    } finally q.stop()
  }

  test("s_topk_stream: final leaderboard equals the custom batch TopKPerGroup") {
    val data = Seq(
      ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 7.0, 3L), ("b", 1.0, 4L),
      ("a", 8.0, 5L), ("a", 9.0, 6L), ("b", 2.0, 7L), ("b", 3.0, 8L))
    val (b1, b2) = data.splitAt(4)
    val in = MemoryStream[(String, Double, Long)](spark)
    val q = StreamOps.topkStream(in.toDF().toDF("k", "v", "id"), k = 3)
      .writeStream.format("memory").queryName("s_topk")
      .outputMode("append").start()
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val out = spark.table("s_topk").as[(String, Long, Int, Long, Double)]
        .collect()
      val finalBoard = out.toSeq.groupBy(_._1).values.flatMap { rows =>
        val last = rows.map(_._2).max
        rows.filter(_._2 == last)
      }.map(r => (r._1, r._3, r._4, r._5)).toSet
      val batchDf = data.toDF("k", "v", "id")
      val expected = graft.plans.TopK.perGroup(batchDf, 3, Seq("k"),
          Seq(batchDf("v").desc, batchDf("id").asc))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy(col("v").desc, col("id").asc)))
        .as[(String, Double, Long, Int)].collect()
        .map(r => (r._1, r._4, r._3, r._2)).toSet
      assert(finalBoard == expected,
        s"stream $finalBoard\nbatch  $expected")
    } finally q.stop()
  }

  test("s_neardup_stream: incremental candidates equal the batch MinHash pairs") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.neardupStream(in.toDF().toDF("doc_id", "text"),
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_neardup")
      .outputMode("append").start()
    try {
      in.addData(first.toSeq); q.processAllAvailable()
      in.addData(second.toSeq); q.processAllAvailable()
      val streamed = spark.table("s_neardup").as[(Long, Long)].collect().toSet
      val batch = graft.operators.TextOps.minhashPairs(spark, sf)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} pairs, batch ${batch.size}")
      assert(batch.nonEmpty, "fixture has no near-dup pairs — vacuous test")
    } finally q.stop()
  }

  test("s_embed_neardup_stream: streamed vector candidates equal the batch LSH gate") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (first, second) = vecs.splitAt(vecs.length / 2)
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamOps.embedNeardupStream(in.toDF().toDF("vec_id", "embedding"),
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_embed_neardup")
      .outputMode("append").start()
    try {
      in.addData(first.toSeq); q.processAllAvailable()
      in.addData(second.toSeq); q.processAllAvailable()
      val streamed = spark.table("s_embed_neardup").as[(Long, Long)].collect().toSet
      val batch = graft.operators.Similarity
        .neardupCandidates(graft.Tables.embeddings(spark, sf))
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} candidate pairs, batch ${batch.size}")
      assert(batch.nonEmpty, "fixture produced no LSH candidates — vacuous test")
    } finally q.stop()
  }

  test("s_neardup_stream: a saturated bucket stops emitting (hot-bucket guard)") {
    // 5 identical docs all land in the same 4 buckets; cap 3 ⇒ only the
    // first 3 members pair up: C(3,2)=3 pairs, not C(5,2)=10
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.neardupStream(in.toDF().toDF("doc_id", "text"),
        checkpointLocation = StreamOps.EphemeralState, maxBucket = 3)
      .writeStream.format("memory").queryName("s_neardup_cap")
      .outputMode("append").start()
    try {
      in.addData((1L to 5L).map(i => (i, "alpha beta gamma delta epsilon")))
      q.processAllAvailable()
      val pairs = spark.table("s_neardup_cap").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    } finally q.stop()
  }

  test("s_dedup_stream: duplicate event_ids collapse across micro-batches") {
    val in = MemoryStream[Ev](spark)
    val q = StreamOps.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("s_dedup").outputMode("append").start()
    try {
      in.addData(Ev(1, 1, ts(0), "click"), Ev(1, 1, ts(0), "click"), Ev(2, 1, ts(1), "view"))
      q.processAllAvailable()
      in.addData(Ev(1, 1, ts(0, 30), "click"), Ev(3, 2, ts(1, 30), "purchase"))
      q.processAllAvailable()
      val ids = spark.table("s_dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("s_latest_state: running latest row per user (streaming q_cdc_snapshot)") {
    val in = MemoryStream[Ev](spark)
    val latest = StreamOps.latestState[Long, Ev](
      in.toDS(), _.user_id,
      (a, b) => Ordering[(Long, Long)].gt(
        (a.ts.getTime, a.event_id), (b.ts.getTime, b.event_id)))
    val q = latest.writeStream.format("memory")
      .queryName("s_latest").outputMode("update").start()
    try {
      in.addData(Ev(1, 1, ts(0), "signup"), Ev(2, 1, ts(1), "click"), Ev(3, 2, ts(0), "signup"))
      q.processAllAvailable()
      in.addData(Ev(4, 2, ts(2), "purchase"), Ev(5, 1, ts(1, 30), "view"))
      q.processAllAvailable()
      // last update emitted per user must be the true latest
      val byUser = spark.table("s_latest").as[Ev].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(e => (e.ts.getTime, e.event_id))).toMap
      assert(byUser(1L).event_id == 5 && byUser(1L).event_type == "view")
      assert(byUser(2L).event_id == 4 && byUser(2L).event_type == "purchase")
    } finally q.stop()
  }

  test("stream-stream interval join matches key within the time bound") {
    val clicks = MemoryStream[Ev](spark)
    val buys = MemoryStream[Ev](spark)
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id")),
      buys.toDF().select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id")),
      "c_user", "b_user", "c_ts", "b_ts",
      before = "0 minutes", after = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("s_ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, 1, ts(0), "click"), Ev(2, 2, ts(0), "click"))
      buys.addData(
        Ev(10, 1, ts(5), "purchase"),   // within 10 min after user 1's click
        Ev(11, 2, ts(30), "purchase"),  // too late for user 2's click
        Ev(12, 3, ts(5), "purchase"))   // no matching click
      q.processAllAvailable()
      val rows = spark.table("s_ssjoin").select("c_id", "b_id")
        .as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("latestStateTws (transformWithState/RocksDB) matches flatMapGroupsWithState semantics") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev](spark)
    val latest = StreamOps.latestStateTws[Long, Ev](
      in.toDS(), _.user_id,
      (a, b) => Ordering[(Long, Long)].gt(
        (a.ts.getTime, a.event_id), (b.ts.getTime, b.event_id)))
    val q = latest.writeStream.format("memory")
      .queryName("s_tws").outputMode("update").start()
    try {
      in.addData(Ev(1, 1, ts(0), "signup"), Ev(2, 2, ts(0), "signup"))
      q.processAllAvailable()
      in.addData(Ev(3, 1, ts(2), "purchase"), Ev(4, 1, ts(1), "click")) // 4 older than 3
      q.processAllAvailable()
      val byUser = spark.table("s_tws").as[Ev].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(e => (e.ts.getTime, e.event_id))).toMap
      assert(byUser(1L).event_id == 3 && byUser(1L).event_type == "purchase")
      assert(byUser(2L).event_id == 2)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("applyChangelogRows: deletes tombstone, update_before skipped, insert resurrects") {
    val in = MemoryStream[Cdc](spark)
    val q = StreamOps.applyChangelogRows(in.toDF(), keyCol = "id", seqCol = "sequence")
      .writeStream.format("memory").queryName("s_apply").outputMode("update").start()
    try {
      in.addData(
        Cdc(1, "insert", 1, "a1"),
        Cdc(2, "insert", 2, "b1"),
        Cdc(3, "update_before", 1, "a1"), // old image — must not win
        Cdc(4, "update_after", 1, "a2"))
      q.processAllAvailable()
      in.addData(Cdc(5, "delete", 2, "b1"))
      q.processAllAvailable()
      in.addData(Cdc(6, "insert", 2, "b2")) // resurrection after delete
      q.processAllAvailable()

      val out = spark.table("s_apply").as[Cdc].collect()
      val lastById = out.groupBy(_.id).view.mapValues(_.maxBy(_.sequence)).toMap
      assert(lastById(1).event_type == "update_after" && lastById(1).name == "a2")
      assert(lastById(2).event_type == "insert" && lastById(2).name == "b2")
      // the delete tombstone for id=2 was emitted before the resurrection
      assert(out.exists(r => r.id == 2 && r.event_type == "delete"))
      // update_before never emitted as a state image
      assert(!out.exists(_.event_type == "update_before"))
    } finally q.stop()
  }

  test("applyChangelogRowsTws (transformWithState/RocksDB): same tombstone " +
      "semantics as the fmgs twin; deleted keys leave the store") {
    withRocksDb {
      val in = MemoryStream[Cdc](spark)
      val q = StreamOps.applyChangelogRowsTws(
          in.toDF(), keyCol = "id", seqCol = "sequence")
        .writeStream.format("memory").queryName("s_apply_tws")
        .outputMode("update").start()
      try {
        in.addData(
          Cdc(1, "insert", 1, "a1"),
          Cdc(2, "insert", 2, "b1"),
          Cdc(3, "update_before", 1, "a1"), // old image — must not win
          Cdc(4, "update_after", 1, "a2"))
        q.processAllAvailable()
        in.addData(Cdc(5, "delete", 2, "b1"))
        q.processAllAvailable()
        // the delete CLEARED id=2's state row — only id=1 remains at rest
        val afterDelete = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(afterDelete <= 1,
          s"tombstoned key still in the store: $afterDelete rows")
        in.addData(Cdc(6, "insert", 2, "b2")) // resurrection after delete
        q.processAllAvailable()

        val out = spark.table("s_apply_tws").as[Cdc].collect()
        val lastById = out.groupBy(_.id).view.mapValues(_.maxBy(_.sequence)).toMap
        assert(lastById(1).event_type == "update_after" && lastById(1).name == "a2")
        assert(lastById(2).event_type == "insert" && lastById(2).name == "b2")
        assert(out.exists(r => r.id == 2 && r.event_type == "delete"))
        assert(!out.exists(_.event_type == "update_before"))
        // live keys bound the store: ids 1 and 2
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows <= 2, s"state ($stateRows rows) exceeds live keys (2)")
      } finally q.stop()
    }
  }

  test("s_ivf_maintain: running cell stats equal the batch q_kmeans_step") {
    import graft.operators.Similarity
    // centroids = the batch step's: quantized vectors of vec_ids 0..3
    val cents = Similarity.quantizedInt8(graft.Tables.embeddings(spark, sf))
      .where(col("vec_id") < 4)
      .select("vec_id", "qv", "qn2")
      .as[(Long, Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val in = MemoryStream[VecRow](spark)
    val q = StreamOps.ivfMaintain(in.toDF(), cents,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("s_ivf").outputMode("complete").start()
    try {
      vecs.grouped(math.max(1, vecs.length / 3 + 1)).foreach { batch =>
        in.addData(batch.map(v => VecRow(v._1, v._2)).toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("s_ivf")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val want = Similarity.qKmeansStep.build(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty,
        s"streaming cell stats must equal the batch Lloyd step\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("s_funnel: incremental stage transitions equal the batch q_funnel at every cut") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .orderBy("us", "event_type")  // event-time arrival, the CDC order
      .as[(Long, String, Long)].collect()
    val in = MemoryStream[FunnelEv](spark)
    val q = StreamOps.funnelStream(in.toDF())
      .writeStream.format("memory").queryName("s_funnel").outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { batch =>
        in.addData(batch.map(e => FunnelEv(e._1, e._2, e._3)).toIndexedSeq)
        q.processAllAvailable()
      }
      val trans = spark.table("s_funnel").as[(Long, Int, Long)].collect()
      // per-stage user counts equal the batch funnel's
      val gotCounts = trans.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val wantCounts = graft.operators.Events.qFunnel.build(spark, sf)
        .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(gotCounts == wantCounts, s"got=$gotCounts want=$wantCounts")
      // per-user stage timestamps equal the batch min-qualifying times
      val e = graft.Tables.events(spark, sf)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t"))
        .as[(Long, Long)].collect().toMap
      val c = e.filter(col("event_type") === "click")
        .join(e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1")), "user_id")
        .filter(col("us") >= col("t1"))
        .groupBy("user_id").agg(min("us").as("t"))
        .as[(Long, Long)].collect().toMap
      val gotStage1 = trans.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
      val gotStage2 = trans.filter(_._2 == 2).map(t => t._1 -> t._3).toMap
      assert(gotStage1 == v, "stage-1 timestamps must be the min view time")
      assert(gotStage2 == c, "stage-2 timestamps must be the min qualifying click")
      // transitions are append-only: no user emits a stage twice
      assert(trans.groupBy(t => (t._1, t._2)).values.forall(_.length == 1))
    } finally q.stop()
  }

  test("s_fuzzy_join: stream-static matches equal the batch join, stateless across batches") {
    val ref = graft.Tables.part(spark, sf)
      .select(col("p_name").as("ref_name")).distinct().cache()
    val names = graft.Tables.part(spark, sf).select("p_name").distinct()
      .orderBy("p_name").limit(40).as[String].collect()
    // half verbatim (dist-0 hits), half with a 1-char suffix typo (dist-1
    // hits in the same prefix block — entity resolution's actual case)
    val arrivals = names.zipWithIndex.map { case (n, i) =>
      FuzzyArrival(i.toLong, if (i % 2 == 0) n else n + "x")
    }
    val in = MemoryStream[FuzzyArrival](spark)
    val q = StreamOps.fuzzyJoinStream(in.toDF(), ref)
      .writeStream.format("memory").queryName("s_fuzzy").outputMode("append").start()
    try {
      val (a, b) = arrivals.splitAt(20)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("s_fuzzy")
        .select("id", "name", "ref_name", "dist")
        .as[(Long, String, String, Long)].collect().toSet
      // the twin: the identical join expression over the collected arrivals
      val want = StreamOps.fuzzyJoinStream(
          arrivals.toIndexedSeq.toDF("id", "name"), ref)
        .select("id", "name", "ref_name", "dist")
        .as[(Long, String, String, Long)].collect().toSet
      assert(got == want)
      assert(got.exists(_._4 == 0L) && got.exists(_._4 == 1L),
        "fixture should produce both exact and fuzzy matches")
    } finally q.stop()
  }

  test("s_seq_pack: incremental packing equals the batch q_seq_pack aggregate") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .orderBy("doc_id")
      .as[(String, Long, Long)].collect()
    val in = MemoryStream[PackDoc](spark)
    val q = StreamOps.seqPackStream(in.toDF())
      .writeStream.format("memory").queryName("s_seq_pack").outputMode("append").start()
    try {
      // 3 micro-batches in id order per shard — the CDC arrival order;
      // the per-shard offset state must carry across batch boundaries
      docs.grouped(170).foreach { batch =>
        in.addData(batch.map(d => PackDoc(d._1, d._2, d._3)).toIndexedSeq)
        q.processAllAvailable()
      }
      val placements = spark.table("s_seq_pack")
      // per-doc placements aggregate to exactly the batch query's output
      val got = placements.groupBy("lang", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          sum("straddle").as("n_straddle"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val want = graft.operators.TrainPrep.qSeqPack.build(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
      // offsets tile each shard exactly: sorted placements are contiguous
      val perShard = placements.select("lang", "off", "n_tok")
        .as[(String, Long, Long)].collect().groupBy(_._1)
      perShard.values.foreach { rows =>
        val sorted = rows.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, o1, n1), (_, o2, _)) => assert(o1 + n1 == o2)
          case _ => ()
        }
        assert(sorted.head._2 == 0L)
      }
    } finally q.stop()
  }

  test("cdc source -> s_neardup_stream: duplicates detected as the changelog arrives") {
    // Layer A/Layer B composition on the round-4 op: a documents table's
    // changelog streams through the wire protocol into incremental
    // MinHash near-dup detection. Docs 1 and 2 are identical (all four
    // band keys collide); doc 3 shares no shingle with them.
    val docsSchema =
      """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
        |{"name":"domain","type":"int","real_type":"int","length":-1},
        |{"name":"server_id","type":"int","real_type":"int","length":-1},
        |{"name":"sequence","type":"int","real_type":"int","length":-1},
        |{"name":"event_number","type":"int","real_type":"int","length":-1},
        |{"name":"timestamp","type":"int","real_type":"int","length":-1},
        |{"name":"event_type","type":"string","real_type":"varchar","length":32},
        |{"name":"doc_id","type":"int","real_type":"int","length":-1},
        |{"name":"text","type":"string","real_type":"varchar","length":256}
        |]}""".stripMargin.replace("\n", "")
    def doc(seq: Long, id: Int, text: String): String =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${1700000000 + seq},"event_type":"insert","doc_id":$id,""" +
        s""""text":"$text"}"""
    val srv = new MockMaxScaleServer(docsSchema, Seq(
      doc(1, 1, "the quick brown fox jumps over the lazy dog"),
      doc(2, 3, "an entirely different document about spark engines"),
      doc(3, 2, "the quick brown fox jumps over the lazy dog")))
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.docs").option("timeoutSeconds", 1)
        .load()
      val pairs = StreamOps.neardupStream(cdc.select(col("doc_id"), col("text")),
        checkpointLocation = StreamOps.EphemeralState)
      val q = pairs.writeStream.format("memory").queryName("s_cdc_neardup")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          val got = spark.table("s_cdc_neardup").as[(Long, Long)].collect().toSet
          assert(got == Set((1L, 2L)), s"got $got")
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("cdc source -> session windows: watermark-finalized sessions over the changelog") {
    import MockMaxScaleServer.Schema
    // Layer A/Layer B composition on a second stateful op (the first is
    // latestStateRows below): the CDC changelog drives event-time session
    // windows, finalized in Append mode once the watermark passes.
    val t0 = 1700000000L
    def ev(seq: Long, id: Int, tsOff: Long): String =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${t0 + tsOff},"event_type":"insert","id":$id,"name":"n$seq"}"""
    val srv = new MockMaxScaleServer(Schema, Seq(
      ev(1, 1, 0), ev(2, 1, 2), ev(3, 1, 3),   // user 1: one 3-event session
      ev(4, 2, 4),                              // user 2: singleton session
      ev(5, 1, 100),                            // user 1: later second session
      ev(6, 9, 1000)))                          // watermark pusher (stays open)
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .load()
      val sessions = StreamOps.sessionCounts(
        cdc.select(col("id").as("user_id"),
          org.apache.spark.sql.functions.timestamp_seconds(col("timestamp")).as("ts")),
        keyCol = "user_id", gap = "5 seconds", watermark = "10 seconds")
      val q = sessions.writeStream.format("memory").queryName("s_cdc_sessions")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          val rows = spark.table("s_cdc_sessions").collect().map { r =>
            (r.getAs[Int]("user_id"),
              r.getAs[Timestamp]("session_start").getTime / 1000 - t0,
              r.getAs[Timestamp]("session_end").getTime / 1000 - t0,
              r.getAs[Long]("n_events"))
          }.toSet
          // inactivity gap merges 0,2,3 into one session ending at 3+5;
          // the far-future event finalizes everything before its watermark
          assert(rows == Set(
            (1, 0L, 8L, 3L),      // 3 events, gap-merged
            (2, 4L, 9L, 1L),      // singleton
            (1, 100L, 105L, 1L))) // second session for the same key
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("cdc source -> latestStateRows materializes current table state") {
    import MockMaxScaleServer.{Schema, event}
    // changelog: insert id=1, insert id=2, update id=1 — current state has
    // id=1 at name v2
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 1, "v1"),
      event(2, "insert", 2, "w1"),
      event(3, "update_after", 1, "v2")))
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .load()
      val q = StreamOps.latestStateRows(cdc, keyCol = "id", seqCol = "sequence")
        .writeStream.format("memory").queryName("s_cdc_latest")
        .outputMode("update").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          val state = spark.table("s_cdc_latest")
            .collect().groupBy(_.getAs[Int]("id"))
            .view.mapValues(_.maxBy(_.getAs[Int]("sequence"))).toMap
          assert(state.keySet == Set(1, 2))
          assert(state(1).getAs[String]("name") == "v2")
          assert(state(1).getAs[String]("event_type") == "update_after")
          assert(state(2).getAs[String]("name") == "w1")
        }
      } finally q.stop()
    } finally srv.close()
  }
}
