package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming operators (SURVEY.md §2.2 `s_*` rows) — the
  * streaming twins of the batch contract queries, built on watermarks and
  * `flatMapGroupsWithState`. Each transform is sink-agnostic: it maps a
  * streaming DataFrame to a streaming DataFrame, so callers compose with
  * the maxscale-cdc source and any sink.
  *
  * Scale notes: every stateful op below shuffles once on its grouping key
  * and keeps per-key state in the state store — at 1000 executors state is
  * hash-partitioned by key, and the watermark bounds its size for the
  * windowed/dedup ops. `latestState*` keeps exactly one row per key, the
  * same footprint as the batch `q_cdc_snapshot` result it mirrors.
  */
object StreamOps {

  /** Explicit opt-out for the state-geometry restart guard: pass as
    * `checkpointLocation` for a DISPOSABLE stream (memory-sink spec,
    * ad-hoc exploration) whose state will never be resumed. The guarded
    * ops REQUIRE a checkpoint location (ADVICE r9): an omitted guard was
    * a silent failure mode — state geometry froze into the checkpoint
    * with nothing checking the restart — so skipping the guard is now a
    * named, grep-able decision instead of a forgotten default. */
  val EphemeralState: String = "<ephemeral-state>"

  private def bindGeometry(checkpointLocation: String,
      family: => StateGeometryGuard.Family): Unit = {
    require(checkpointLocation != null,
      "checkpointLocation is required on geometry-frozen streaming ops: " +
        "pass the SAME path given to writeStream (the restart guard " +
        "binds there), or StreamOps.EphemeralState for a disposable " +
        "stream that will never be resumed")
    if (checkpointLocation != EphemeralState)
      StateGeometryGuard.bind(checkpointLocation, family)
  }

  /** `s_win_tumble`: per-`event_type` counts in tumbling windows, late data
    * bounded by the watermark. Batch twin: `q_win_tumble_batch` (oracle ✓). */
  def tumblingCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLength: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** `s_win_slide`: per-key counts in SLIDING windows (length > slide ⇒
    * each event lands in length/slide overlapping windows — Spark expands
    * the window list per row before the hash agg, so the shuffle carries
    * (length/slide)× the rows; keep the ratio small at scale). Batch
    * twin: `q_win_slide_batch` (oracle ✓). */
  def slidingCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLength: String = "2 minutes",
      slide: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Streaming session windows: per-key event counts in
    * inactivity-gap sessions (batch twin: `q_session_window`, oracle ✓).
    * Session state merges under the watermark and finalizes (Append mode)
    * once the watermark passes a session's close. */
  def sessionCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "user_id",
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** `s_distinct_kmv`: running approximate distinct-count per group via
    * the mergeable [[graft.functions.KmvSketch]] — the streaming use of
    * the same Aggregator the batch `q_distinct_kmv` oracle-matches.
    * Because the sketch is an associative, commutative monoid, Spark
    * keeps the ≤k-value buffer as streaming aggregation state and merges
    * each micro-batch's partials into it — so the running estimate after
    * N batches is IDENTICAL to the batch sketch over the union of those
    * batches (asserted in StreamOpsSpec), which is exactly the property
    * that lets a 100 TB pipeline maintain distinct counts incrementally
    * instead of re-scanning. Input column `u`: the value's hash mapped
    * uniformly into [0,1) (the h60 convention, same as the batch twin). */
  def distinctKmv(
      rows: DataFrame,
      keyCol: String = "k",
      hashCol: String = "u",
      k: Int = 64): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(k))
    rows.groupBy(col(keyCol))
      .agg(kmv(col(hashCol)).as("approx_distinct"))
  }

  /** `s_topk_stream`: running top-k rows per key — the streaming twin of
    * the custom batch operator `graft.plans.TopKPerGroup`, built on the
    * same lossless merge invariant its spill path uses:
    * topk(topk(A) ∪ B) = topk(A ∪ B). State per key is exactly the k
    * current best (value, id) pairs — bounded by construction, no
    * watermark needed.
    *
    * On every batch that touches a key the op emits that key's FULL
    * current top-k tagged with a monotone per-key `ver`, so a consumer
    * (or the equivalence spec) takes the max-`ver` set per key as the
    * current leaderboard. Ordering: value DESC, id ASC (ties), matching
    * `TopK.perGroup(df, k, Seq(key), Seq(value.desc, id.asc))`. */
  def topkStream(
      rows: DataFrame,
      k: Int,
      keyCol: String = "k",
      valCol: String = "v",
      idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val inEnc: Encoder[(String, Double, Long)] = Encoders.product
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[(Long, Array[(Double, Long)])] = ExpressionEncoder()
    implicit val outEnc: Encoder[(String, Long, Int, Long, Double)] = Encoders.product

    rows.select(col(keyCol).cast("string"), col(valCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[(Double, Long)]),
        (String, Long, Int, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state: GroupState[(Long, Array[(Double, Long)])]) =>
          val (ver, top) = state.getOption.getOrElse((0L, Array.empty[(Double, Long)]))
          val merged = (top ++ batch.map(r => (r._2, r._3)))
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          val nextVer = ver + 1
          state.update((nextVer, merged))
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            (key, nextVer, i + 1, id, v)
          }
      }
      .toDF(keyCol, "ver", "rank", idCol, valCol)
  }

  /** `s_neardup_stream`: INCREMENTAL near-duplicate detection — each
    * arriving document is checked against everything already seen, via
    * the same MinHash/LSH banding as the batch `q_minhash_dedup`
    * (identical codegen'd [[graft.functions.MinHashSig]] signatures, so
    * streamed candidates provably equal the batch pairs — pinned in
    * StreamOpsSpec). The 100 TB shape: state is per (band, key) bucket
    * membership, hash-partitioned across executors; an arriving doc
    * shuffles 4 narrow band rows, never joins the corpus.
    *
    * Emitted pairs `(doc_a < doc_b)` may repeat across bands/batches —
    * downstream either dedups under a watermark or feeds a consumer
    * that tolerates duplicate edges ([[graft.operators.ConnectedComponents]]
    * does, by construction). `maxBucket` caps hot buckets (band
    * collisions on boilerplate text): a full bucket stops admitting
    * members and emitting pairs, the standard spam guard — without it a
    * degenerate bucket emits O(n²) pairs.
    *
    * The band layout is FROZEN into the checkpoint (state keys are a
    * pure function of it) — pass `checkpointLocation` (the same one
    * given to `writeStream`) and [[StateGeometryGuard]] makes any restart
    * with altered parameters fail loudly instead of silently orphaning
    * the pre-restart corpus from dedup. */
  def neardupStream(docs: DataFrame, maxBucket: Int = 64,
      tws: Boolean = false, checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.minhash(maxBucket))
    import graft.functions.MinHashSig.minhashSig
    val sig = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), minhashSig(col("toks")).as("sig"))
    // 4 bands x 4 rows, banded exactly like TextOps.minhashPairs
    val bandStructs = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("key"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"))
    (if (tws) bucketPairsStreamTws(bands, maxBucket)
     else bucketPairsStream(bands, maxBucket)).toDF("doc_a", "doc_b")
  }

  /** `s_embed_neardup_stream`: the embedding-space twin of
    * [[neardupStream]] — arriving vectors bucketed by the same banded
    * hyperplane LSH as the batch gate
    * (`graft.operators.Similarity.neardupCandidates`, identical
    * [[graft.functions.HyperplaneBands]] keys), candidate pairs emitted
    * against bucket members already seen. Downstream exact verify /
    * clustering is shared with the batch path.
    *
    * Unlike the batch gate (which re-keys per run — `Similarity.ndBits`
    * grows bits with the corpus), `nBands`/`nBits` here are FROZEN into
    * the checkpoint's state keys: pass `checkpointLocation` and
    * [[StateGeometryGuard]] rejects a restart that alters them — re-sharding
    * is a new checkpoint plus a backfill, never an in-place edit. */
  def embedNeardupStream(
      vecs: DataFrame,
      nBands: Int = 64, // the frozen start-time family (64 x 10); the
      // batch gate grows via Similarity.ndBands/ndBits — a long-lived
      // stream follows it through LshMigration, never by re-keying
      nBits: Int = 10,
      maxBucket: Int = 64,
      tws: Boolean = false, checkpointLocation: String,
      // geometry-migration seeding ([[LshMigration]]): a BATCH corpus
      // (vec_id, embedding) — the vectors a predecessor stream already
      // processed — installed as the initial bucket state under THIS
      // stream's geometry. Seeds emit no pairs among themselves (the
      // migration's catch-up diff covers those); live arrivals pair
      // against them exactly as against streamed members.
      seed: DataFrame = null): DataFrame = {
    bindGeometry(checkpointLocation,
      StateGeometryGuard.hyperplane(nBands, nBits, maxBucket))
    import graft.functions.HyperplaneBands.bandKeys
    val bands = vecs
      .select(col("vec_id"), posexplode(bandKeys(col("embedding"), nBands, nBits)))
      .toDF("vec_id", "band", "key")
      .select(col("band"), col("key").cast("string").as("key"), col("vec_id"))
    val init = if (seed == null) null else seedBuckets(seed, nBands, nBits, maxBucket)
    (if (tws) bucketPairsStreamTws(bands, maxBucket, init)
     else bucketPairsStream(bands, maxBucket, init)).toDF("vec_a", "vec_b")
  }

  /** Re-keyed bucket membership of a BATCH corpus under a given
    * geometry — the initial state a migrated stream resumes with.
    * Member arrays are sorted and capped at `maxBucket`.
    *
    * CAP SEMANTICS (ADVICE r10): the cap here keeps the `maxBucket`
    * SMALLEST vec_ids of an over-full bucket, while the live stream
    * admits in ARRIVAL order — so with a finite cap a migrated stream's
    * seeded state (hence its future pairs in over-full buckets) is
    * deterministic-but-approximate relative to a stream that actually
    * processed the corpus; exact admission parity holds only when no
    * seeded bucket exceeds the cap (maxBucket = Int.MaxValue, or a
    * corpus whose buckets all fit — the shape LshMigrationSpec pins).
    * A caller that needs exact parity under a finite cap must seed from
    * the predecessor's EXPORTED state (which preserved arrival order),
    * not from the re-keyed corpus. */
  private def seedBuckets(seed: DataFrame, nBands: Int, nBits: Int,
      maxBucket: Int): Dataset[((Int, String), Array[Long])] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val enc: Encoder[((Int, String), Array[Long])] = ExpressionEncoder()
    import graft.functions.HyperplaneBands.bandKeys
    seed
      .select(col("vec_id"), posexplode(bandKeys(col("embedding"), nBands, nBits)))
      .toDF("vec_id", "band", "key")
      .groupBy(col("band").cast("int").as("band"),
        col("key").cast("string").as("key"))
      .agg(slice(sort_array(collect_list(col("vec_id").cast("long"))),
        1, maxBucket).as("members"))
      .select(struct(col("band"), col("key")).as("_1"), col("members").as("_2"))
      .as[((Int, String), Array[Long])]
  }

  /** The shared stateful bucket-membership pair emitter: input
    * `(band, key, id)` rows, state per (band, key) = member ids (capped),
    * output = `(lo, hi)` id pairs of co-bucketed items, each new arrival
    * paired against the members already present. */
  private def bucketPairsStream(
      bands: DataFrame, maxBucket: Int,
      initState: Dataset[((Int, String), Array[Long])] = null)
      : Dataset[(Long, Long)] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val rowEnc: Encoder[(Int, String, Long)] = Encoders.product
    implicit val keyEnc: Encoder[(Int, String)] = Encoders.product
    implicit val stateEnc: Encoder[Array[Long]] = ExpressionEncoder()
    implicit val pairEnc: Encoder[(Long, Long)] = Encoders.product

    val func = (k: (Int, String), rows: Iterator[(Int, String, Long)],
        state: GroupState[Array[Long]]) => {
      var members = state.getOption.getOrElse(Array.empty[Long])
      val arrivals = rows.map(_._3).toArray.distinct.sorted
        .filterNot(members.contains)
      val out = Seq.newBuilder[(Long, Long)]
      arrivals.foreach { id =>
        if (members.length < maxBucket) {
          members.foreach(m => out += (if (m < id) (m, id) else (id, m)))
          members = members :+ id
        }
      }
      state.update(members)
      out.result().iterator
    }
    val grouped = bands.select(col(bands.columns(0)).cast("int"),
        col(bands.columns(1)).cast("string"), col(bands.columns(2)).cast("long"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, key, _) => (band, key) }
    if (initState == null)
      grouped.flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
    else
      // migration seeding: Spark installs the initial bucket membership
      // on the FIRST batch; seeds emit nothing among themselves
      grouped.flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout,
        initState.groupByKey(_._1).mapValues(_._2))(func)
  }

  /** [[bucketPairsStream]] on the Spark 4 `transformWithState` API — the
    * RocksDB-backed forward path for the bucket-membership states
    * (VERDICT r5 item 5). Semantics identical (spec-pinned); the scale
    * win is the state layout: membership is a ListState, so an arrival
    * APPENDS one element (a RocksDB merge) instead of rewriting the
    * whole member array per micro-batch, and the store spills corpus-
    * shaped membership off-heap instead of holding it in executor
    * memory. Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`. */
  private def bucketPairsStreamTws(
      bands: DataFrame, maxBucket: Int,
      initState: Dataset[((Int, String), Array[Long])] = null)
      : Dataset[(Long, Long)] = {
    implicit val rowEnc: Encoder[(Int, String, Long)] = Encoders.product
    implicit val keyEnc: Encoder[(Int, String)] = Encoders.product
    implicit val pairEnc: Encoder[(Long, Long)] = Encoders.product
    implicit val stEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val processor = new org.apache.spark.sql.streaming
        .StatefulProcessorWithInitialState[
          (Int, String), (Int, String, Long), (Long, Long), Array[Long]] {
      @transient private var members: ListState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        members = getHandle.getListState[Long]("members",
          Encoders.scalaLong, TTLConfig.NONE)
      override def handleInitialState(
          k: (Int, String), st: Array[Long], timers: TimerValues): Unit =
        // migration seeding: install the re-keyed corpus membership;
        // no pairs among seeds (the migration catch-up diff owns those)
        if (st.nonEmpty) members.appendList(st)
      override def handleInputRows(
          k: (Int, String), rows: Iterator[(Int, String, Long)],
          timers: TimerValues): Iterator[(Long, Long)] = {
        var cur = members.get().toArray
        val arrivals = rows.map(_._3).toArray.distinct.sorted
          .filterNot(cur.contains)
        val out = Seq.newBuilder[(Long, Long)]
        // one appendList per batch, not one merge operand per arrival —
        // see the semantic handler's note on RocksDB merge-read cost
        val admitted = Seq.newBuilder[Long]
        arrivals.foreach { id =>
          if (cur.length < maxBucket) {
            cur.foreach(m => out += (if (m < id) (m, id) else (id, m)))
            admitted += id
            cur = cur :+ id
          }
        }
        val adds = admitted.result()
        if (adds.nonEmpty) members.appendList(adds.toArray)
        out.result().iterator
      }
    }
    val grouped = bands.select(col(bands.columns(0)).cast("int"),
        col(bands.columns(1)).cast("string"), col(bands.columns(2)).cast("long"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, key, _) => (band, key) }
    if (initState == null)
      grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
    else
      grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append(),
        initState.groupByKey(_._1).mapValues(_._2))
  }

  /** `s_heavy_hitters`: running per-group frequency summary via the
    * mergeable [[graft.functions.CmsSketch]] — the streaming use of the
    * same Aggregator the batch `q_heavy_hitters` oracle-matches. The
    * grid is an elementwise-additive monoid, so Spark keeps the
    * depth×width counter buffer as streaming aggregation state and the
    * running sketch after N micro-batches is IDENTICAL to the batch
    * sketch over their union (asserted in StreamOpsSpec) — point-query
    * it any time with `least(element_at(...))`, no rescan. Input column:
    * the item's h60-mod-P hash, same convention as the batch twin. */
  def heavyHittersSketch(
      rows: DataFrame,
      keyCol: String = "k",
      hashCol: String = "h",
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val cms = udaf(new graft.functions.CmsSketch(depth, width))
    rows.groupBy(col(keyCol))
      .agg(cms(col(hashCol)).as("sk"))
  }

  /** `s_quantile_hist`: running fixed-bin histogram per group — the
    * streaming face of the batch `q_quantile_hist` quantile sketch. The
    * (group, bin) → count frame is an additive monoid, so it IS a
    * streaming aggregation; quantiles are read out any time with the
    * same `Aggregates.quantileReadOut` the batch query uses (stream ≡
    * batch pinned in StreamOpsSpec). State: ≤ bins rows per group,
    * independent of row count — the running percentile monitor a CDC
    * consumer keeps over a value column. */
  def histogramSketchStream(
      rows: DataFrame,
      keyCol: String = "f",
      valCol: String = "v",
      binWidth: Int = graft.operators.Aggregates.QuantileBinWidth): DataFrame =
    rows
      .select(col(keyCol).as("f"),
        floor(col(valCol) / binWidth).as("b"))
      .groupBy("f", "b")
      .agg(count(lit(1)).as("c"))

  /** `s_bloom`: running Bloom-filter membership state per group — the
    * streaming use of the same mergeable [[graft.functions.BloomSketch]]
    * the batch `q_bloom_member` oracle-matches bit-for-bit. The bitset
    * is an OR-monoid (associative, commutative, idempotent), so Spark
    * keeps it as streaming aggregation state and merges micro-batch
    * partials into it; after N batches the bits are IDENTICAL to the
    * batch sketch over the union (pinned in StreamOpsSpec) — the
    * incremental build of the runtime filter a CDC pipeline broadcasts
    * to prune probe-side scans. State per key: m/8 bytes, constant. */
  def bloomFilterStream(
      rows: DataFrame,
      keyCol: String = "k",
      hashCol: String = "h",
      mBits: Int = 2048,
      k: Int = 3, checkpointLocation: String): DataFrame = {
    // the aggregation buffer IS the (mBits, k) geometry — resuming with
    // different values would merge mismatched bitsets silently
    bindGeometry(checkpointLocation, StateGeometryGuard.bloom(mBits, k))
    val bloom = udaf(new graft.functions.BloomSketch(mBits, k))
    rows.groupBy(col(keyCol))
      .agg(bloom(col(hashCol)).as("bits"))
  }

  /** `s_anomaly`: running per-group power sums (n, Σx, Σx²) with the
    * sums carried in DECIMAL — exactly the stats frame the batch
    * `q_anomaly` broadcasts. Decimal addition is associative and
    * commutative, so the streaming state after N batches is bit-equal
    * to the batch aggregation over the union (pinned in StreamOpsSpec);
    * a serving path then classifies any probe set against the running
    * frame via [[anomalyClassify]] — maintain-the-stats, classify-on-
    * demand, no rescan. */
  def anomalyStats(
      events: DataFrame,
      keyCol: String = "event_type",
      valCol: String = "value"): DataFrame = {
    import graft.QHelp.dec
    events
      .select(col(keyCol), dec(col(valCol)).cast("double").as("v"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("v"))).cast("double").as("s1"),
        sum(dec(col("v")) * dec(col("v"))).cast("double").as("s2"))
  }

  /** Classify probe rows against a (possibly streamed) stats frame with
    * the batch `q_anomaly` test — the identical division-free
    * `(x·n − s1)² > 4(n·s2 − s1²)` expression, so streamed stats give
    * the same verdicts as a batch recompute over the same history. */
  def anomalyClassify(
      probes: DataFrame,
      stats: DataFrame,
      keyCol: String = "event_type"): DataFrame = {
    import graft.QHelp.dec
    probes
      .select(col(keyCol), col("event_id"),
        dec(col("value")).cast("double").as("v"))
      .join(broadcast(stats), keyCol)
      .filter((col("v") * col("n") - col("s1")) * (col("v") * col("n") - col("s1"))
        > lit(4) * (col("n") * col("s2") - col("s1") * col("s1")))
      .select(col(keyCol), col("event_id"), round(col("v"), 2).as("value"))
  }

  /** `s_chunk_dedup`: ONLINE boilerplate-chunk gate — the streaming
    * face of the batch `q_chunk_dedup` scrub. State is one long per
    * distinct chunk hash (occurrences seen); every arriving occurrence
    * is emitted with a `flagged` verdict: false for the chunk's first
    * occurrence ever, true from the second on. This is the standard
    * online semantics — the batch pass drops ALL occurrences of a df≥2
    * chunk retroactively, which a stream cannot (the first copy already
    * shipped); the exact relationship (streaming flags df−1 of each
    * chunk's df occurrences) is pinned against the batch df table in
    * StreamOpsSpec. Within a micro-batch, same-chunk arrivals are
    * ordered by (doc_id, ord) so the unflagged survivor is
    * deterministic.
    *
    * Scale: state is 8 bytes per distinct chunk, hash-partitioned by
    * chunk key across executors; each arriving doc shuffles
    * ~tokens/chunkTokens narrow rows. A production deployment ages
    * state with a TTL — boilerplate recurs fast, by definition. */
  def chunkDedupStream(docs: DataFrame, chunkTokens: Int = 4,
      checkpointLocation: String): DataFrame = {
    // state is keyed by chunkTokens-gram hashes: a different chunk size
    // on resume would orphan every previously-seen chunk silently
    bindGeometry(checkpointLocation, StateGeometryGuard.chunks(chunkTokens))
    implicit val inEnc: Encoder[(Long, Long, Int)] = Encoders.product
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(Long, Int, Long, Boolean)] = Encoders.product
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1),
            ceil(size(col("t")) / lit(chunkTokens.toDouble)).cast("int")),
          i => xxhash64(array_join(
            slice(col("t"), (i - 1) * chunkTokens + 1, lit(chunkTokens)), " ")))))
      .select(col("col").as("chunk_hash"), col("doc_id"),
        (col("pos") + 1).cast("int").as("ord"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Int, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (chunkHash, occurrences, state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = occurrences.toSeq.sortBy(o => (o._2, o._3)).map { o =>
            seen += 1
            (o._2, o._3, chunkHash, seen > 1)
          }
          state.update(seen)
          out.iterator
      }
      .toDF("doc_id", "ord", "chunk_hash", "flagged")
  }

  /** `s_retention`: INCREMENTAL cohort-retention maintenance — the
    * streaming twin of the batch `q_retention` matrix. Per-user state is
    * the set of active epoch-days (cohort = its minimum); each batch
    * emits DELTA rows `(cohort_day, offset_days, delta)` for newly
    * touched (cohort, offset) cells, and — the hard case — when a LATE
    * event predates the user's known cohort, retracts every previously
    * emitted cell (delta −1) and re-emits it rebased on the new cohort,
    * so Σ deltas is always exactly the batch matrix over events-so-far
    * (pinned in StreamOpsSpec under out-of-order arrival).
    *
    * Scale: state is per-user and bounded by the user's distinct active
    * days (a horizon cap bounds it further in production); emission is
    * O(new cells) except on a rebase, which is O(that user's history) —
    * rare, and confined to one key. One shuffle on user_id per batch;
    * the matrix itself is a downstream `SUM(delta) GROUP BY cohort,
    * offset` any sink maintains additively. */
  def retentionDeltas(events: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[(Long, Int)] = Encoders.product
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val outEnc: Encoder[(Int, Int, Long)] = Encoders.product
    events
      .select(col("user_id").cast("long"),
        datediff(col("d"), to_date(lit("1970-01-01"))).as("epoch_day"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Int], (Int, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[Array[Int]]) =>
          val seen = state.getOption.getOrElse(Array.empty[Int]).toSet
          val arriving = batch.map(_._2).toSet
          val fresh = arriving.diff(seen)
          if (fresh.isEmpty) Iterator.empty
          else {
            val all = seen ++ fresh
            val newCohort = all.min
            state.update(all.toArray.sorted)
            if (seen.nonEmpty && newCohort < seen.min) {
              val oldCohort = seen.min
              // rebase: retract every cell emitted under the old cohort,
              // re-emit the full history under the new one
              val retract = seen.iterator.map(d => (oldCohort, d - oldCohort, -1L))
              val emit = all.iterator.map(d => (newCohort, d - newCohort, 1L))
              retract ++ emit
            } else {
              fresh.iterator.map(d => (newCohort, d - newCohort, 1L))
            }
          }
      }
      .toDF("cohort_day", "offset_days", "delta")
      .select(
        date_add(to_date(lit("1970-01-01")), col("cohort_day")).as("cohort"),
        col("offset_days"), col("delta"))
  }

  /** `s_contam`: streaming benchmark-decontamination gate — every
    * arriving document is screened against a STATIC benchmark n-gram
    * set at ingestion time, the moment a training pipeline wants the
    * verdict (not after a batch rescan). The gate is STATELESS: the
    * benchmark grams are aggregated once into a single array row and
    * broadcast, and each document's n-grams are built and intersected
    * inside its own row (`transform`/`array_intersect` — no explode, no
    * per-doc aggregation state). Gram identity is `xxhash64(ngram)`,
    * matching the batch `q_contam_ngram`'s shuffle key; equivalence with
    * the batch query's verdicts is pinned in StreamOpsSpec.
    *
    * Scale: cost per arriving doc is O(len·n) hashing plus one sorted
    * intersect against the broadcast array — no state store, no
    * shuffle; 1000 executors gate 1000 partitions independently. */
  def contamGateStream(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 5): DataFrame = {
    val grams: Column => Column = t =>
      array_distinct(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => xxhash64(array_join(slice(t, i, lit(n)), " "))))
    val bench = benchmark
      .select(split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n) // sequence(1, len-n+1) needs len ≥ n
      .select(explode(grams(col("t"))).as("g"))
      .agg(collect_set(col("g")).as("bench_grams"))
    docs
      .withColumn("t", split(col("text"), " "))
      .where(size(col("t")) >= n)
      .crossJoin(broadcast(bench))
      .select(col("doc_id"),
        size(grams(col("t"))).cast("long").as("n_ngrams"),
        size(array_intersect(grams(col("t")), col("bench_grams")))
          .cast("long").as("n_hit"))
      .where(col("n_hit") > 0)
      .select(col("doc_id"), col("n_ngrams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_ngrams").cast("double"))
          .as("contam_rate"))
  }

  /** `s_fuzzy_join`: streaming entity resolution — arriving records are
    * matched against a STATIC reference table by the same declared
    * blocking as the batch `q_fuzzy_join`: `substr(name,1,2)` equality
    * (extracted as the equi-join key, so Levenshtein runs only within
    * blocks, never stream × reference) plus edit distance ≤ `maxDist`.
    * Stream-static joins are stateless — each micro-batch joins the
    * reference fresh, no accumulated state — so cost scales with the
    * reference size (broadcast when small), not the stream's history.
    * Batch twin: the identical join expression over the collected
    * arrivals (equivalence pinned in StreamOpsSpec). */
  def fuzzyJoinStream(
      stream: DataFrame,
      reference: DataFrame,
      streamCol: String = "name",
      refCol: String = "ref_name",
      maxDist: Int = 3): DataFrame =
    stream.join(reference,
        substring(col(streamCol), 1, 2) === substring(col(refCol), 1, 2) &&
          levenshtein(col(streamCol), col(refCol)) <= maxDist)
      .withColumn("dist", levenshtein(col(streamCol), col(refCol)).cast("long"))

  /** `s_seq_pack`: INCREMENTAL sequence packing — the streaming twin of
    * `q_seq_pack`. Docs arrive per shard and are placed at the shard's
    * running token offset; per-shard state is ONE long (the next free
    * offset), so a million-shard corpus carries a million longs of state
    * while emitting placements identical to the batch window's running
    * sum. Within a micro-batch rows are placed in id order (matching the
    * batch `ORDER BY doc_id`); across batches, arrival order is the
    * declared semantics — a CDC-fed shard arrives in GTID order, which
    * for the fixture equals id order (equivalence pinned in
    * StreamOpsSpec). Output: one placement row per doc —
    * `(shard, id, n_tok, off, seq_id, straddle)`. */
  def seqPackStream(
      docs: DataFrame,
      budget: Long = 512,
      shardCol: String = "lang",
      idCol: String = "doc_id",
      tokCol: String = "n_tok"): DataFrame = {
    implicit val inEnc: Encoder[(String, Long, Long)] = Encoders.product
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(String, Long, Long, Long, Long, Long)] =
      Encoders.product
    docs.select(col(shardCol).cast("string"), col(idCol).cast("long"),
        col(tokCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val placed = rows.toSeq.sortBy(_._2).map { case (_, id, n) =>
            val seqId = off / budget
            val straddle = if (n > 0 && (off + n - 1) / budget > seqId) 1L else 0L
            val at = off
            off += n
            (shard, id, n, at, seqId, straddle)
          }
          state.update(off)
          placed.iterator
      }
      .toDF(shardCol, idCol, tokCol, "off", "seq_id", "straddle")
  }

  /** `s_ivf_maintain`: streaming vector-index (IVF) cell maintenance —
    * the streaming twin of `q_kmeans_step`. Arriving vectors are int8-
    * quantized and assigned to their nearest centroid STATELESSLY (the K
    * centroids ride along as a literal array — at scale, the broadcast a
    * k-means|| init produces); the running per-cell statistics (count,
    * inertia, per-coordinate sums — exactly the re-estimation state) are
    * a K-row streaming aggregation. Ties break to the smallest centroid
    * id via lexicographic struct min, matching the batch min-distance
    * pre-pass. State: K rows, independent of stream length.
    * Equivalence with the batch step is pinned in StreamOpsSpec. */
  /** `s_pq_encode`: STATELESS streaming PQ encoder — each arriving
    * vector maps to its [[graft.operators.Similarity.PqSub]] codeword
    * ids under the same TRAINED fixed-point codebooks as the batch
    * `Similarity.pqCodes` (pass `Similarity.pqCodebooks(corpus)` —
    * training happens batch-side; the stream only applies the result,
    * exactly how a production pipeline deploys a quantizer).
    * No state, no shuffle: the codebooks fold into the projection as
    * literals, so this is a pure per-row map — the compress-on-ingest
    * step that lets a 100 TB pipeline sink 4 small codes instead of 64
    * floats per embedding. Assignment arithmetic (integer squared L2
    * over the shared fixed-point encoding, struct-min ties to the
    * smallest codeword id) is integer-identical to the batch path;
    * equivalence is spec-pinned.
    *
    * `checkpointLocation` binds the CODEBOOK fingerprint
    * ([[StateGeometryGuard.pq]]): the encoder holds no state, but its
    * sink accumulates one code space — restarting the same checkpoint
    * with retrained codebooks must fail loudly, not silently mix eras
    * in the index. Upgrades go through [[PqMigration]]. */
  def pqEncodeStream(vecs: DataFrame,
      codebooks: Seq[(Int, Long, Seq[Long])],
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.pq(codebooks))
    val bySub = codebooks.groupBy(_._1)
    val sub = graft.operators.Similarity.PqSub
    val fxScale = graft.operators.Similarity.PqFx
    val dim = 64 / sub
    require((0 until sub).forall(bySub.contains),
      s"codebooks must cover all $sub subspaces, got ${bySub.keys.toSeq.sorted}")
    val codeCols = (0 until sub).map { s0 =>
      val cbArr = array(bySub(s0).sortBy(_._2).map { case (_, j, cv) =>
        struct(lit(j).as("j"), array(cv.map(lit): _*).as("cv"))
      }: _*)
      val subv = transform(slice(col("embedding"), s0 * dim + 1, dim),
        x => round(x.cast("double") * fxScale).cast("long"))
      // array_min over (dist, j) structs: lexicographic = dist ASC then
      // j ASC — the batch pqAssign's exact tie-break, exact integers
      array_min(transform(cbArr, c => struct(
        aggregate(zip_with(subv, c.getField("cv"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, z) => acc + z)
          .as("dist"),
        c.getField("j").as("j")))).getField("j")
    }
    vecs.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  /** `s_pq_search`: streaming ANN query SERVING over the compressed PQ
    * index — the search twin of `s_pq_encode` (which compresses the
    * ingest side). Arriving query vectors are answered from the STATIC
    * compressed index per micro-batch via a stream-static join, exactly
    * the asymmetric-distance serving shape of Jégou et al.:
    *
    *  - the per-query distance TABLE (PqSub × PqK inner products
    *    against the TRAINED codebooks, [[graft.operators.Similarity
    *    .pqCodebooks]]) is computed in the query row's projection —
    *    codebooks fold in as literals, so a query batch carries its
    *    tables with it (the broadcast side at scale);
    *  - the corpus side contributes ONLY codes (PqSub small ints per
    *    vector, no vector data), partition-scanned in place; each
    *    candidate's score is PqSub table LOOKUPS summed in subspace
    *    order — arithmetic-identical to the batch `q_sim_pq` ADC scan;
    *  - ranking runs through [[topkStream]]'s bounded per-query heap
    *    (state = k rows per query, never the scored corpus), the
    *    streaming twin of the batch plan's TopKPerGroupExec.
    *
    * Equivalence with the batch query (same codebooks, same index, same
    * ties) is spec-pinned; consumers read the max-`ver` set per query,
    * [[topkStream]]'s leaderboard contract. `checkpointLocation` binds
    * the codebook fingerprint: the leaderboard state accumulates ADC
    * scores, which are comparable only within one quantizer — a resume
    * under retrained codebooks would merge incomparable score eras. */
  def pqSearchStream(queries: DataFrame,
      codes: DataFrame,
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int = 5,
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.pq(codebooks))
    import graft.operators.VectorOps.dot
    val sub = graft.operators.Similarity.PqSub
    val fx = graft.operators.Similarity.PqFx.toDouble
    val dim = 64 / sub
    val bySub = codebooks.groupBy(_._1)
    require((0 until sub).forall(bySub.contains),
      s"codebooks must cover all $sub subspaces, got ${bySub.keys.toSeq.sorted}")
    // dt[s][j] = <qsub_s, cv_{s,j}> — the ADC distance table, one nested
    // array column per arriving query
    val dtCol = array((0 until sub).map { s0 =>
      val subv = slice(col("embedding"), s0 * dim + 1, dim)
      array(bySub(s0).sortBy(_._2).map { case (_, _, cv) =>
        dot(subv, array(cv.map(c => lit(c.toDouble / fx)): _*))
      }: _*)
    }: _*)
    // the static index: one row per corpus vector, codes in subspace
    // order — PIVOTED ONCE at plan-build time (lazy localCheckpoint):
    // a stream-static join re-executes its static side per micro-batch,
    // so without this every batch re-ran the groupBy/collect_list pivot
    // over the whole index (the r11 soak's lazy-static-side lesson)
    val codesPerVec = codes
      .groupBy(col("vec_id").as("neighbor_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("j")))).as("cs"))
      .select(col("neighbor_id"), col("cs.j").as("cs"))
      .localCheckpoint(eager = false)
    val scored = queries
      .select(col("vec_id").as("query_id"), dtCol.as("dt"))
      // broadcast the per-batch query side: the full-scan ADC is a
      // nested-loop by design, but the LOOP must stream the big static
      // index against a broadcast of the tiny batch, never the reverse
      .hint("broadcast")
      .join(codesPerVec, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (0 until sub).map(s0 =>
          element_at(element_at(col("dt"), s0 + 1),
            (element_at(col("cs"), s0 + 1) + 1).cast("int")))
          .reduce(_ + _).as("score"))
    topkStream(scored, k, keyCol = "query_id", valCol = "score",
      idCol = "neighbor_id")
  }

  /** `s_bm25_search`: streaming LEXICAL retrieval over the static BM25
    * index — the search twin of the batch `q_bm25`, and the lexical
    * counterpart of [[pqSearchStream]] (vector ANN serving). Arriving
    * query docs are answered from the served df-capped postings index
    * ([[graft.operators.TextOps.bm25ServedIndex]]) per micro-batch:
    *
    *  - the query's distinct shingle terms are extracted in the ARRAY
    *    domain (`array_distinct` inside the projection — a stateless
    *    map, never a streaming `dropDuplicates`);
    *  - the stream-static equi-join on the term hash touches only the
    *    capped postings (every key ≤ NgramStopDf rows corpus-wide — the
    *    batch query's provably-skew-free candidate bound);
    *  - per-term contributions use the EXACT batch arithmetic
    *    ([[graft.operators.TextOps.bm25FxCol]], fixed-point floor), so
    *    streamed scores are bit-identical to `q_bm25`'s;
    *  - ranking state is a bounded per-query heap (k rows per query,
    *    like [[topkStream]]) — but with a per-batch PRE-SUM: all of a
    *    query's candidate rows derive from its single arriving row, so
    *    they land in one micro-batch and the per-(query, neighbor) SUM
    *    closes batch-locally before the heap merge. A re-delivered
    *    query recomputes identical sums and REPLACES its neighbors'
    *    entries (dedup by neighbor id) — idempotent, never duplicated
    *    leaderboard slots.
    *
    * `n`/`t` are the indexed corpus's stats ([[graft.operators.TextOps
    * .bm25Stats]]); `checkpointLocation` binds the (n, t, dfCap) index
    * era — BM25 scores are only comparable within one index build, so a
    * resume across a corpus re-index fails loudly (fresh checkpoint +
    * re-serve, the PqMigration discipline). */
  def bm25SearchStream(queries: DataFrame,
      index: DataFrame,
      n: Long,
      t: Long,
      k: Int = 5,
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation,
      StateGeometryGuard.bm25(n, t, graft.operators.TextOps.bm25DfCap(n)))
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val inEnc: Encoder[(Long, Long, Long, Long)] = Encoders.product
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[(Long, Array[(Long, Long)])] = ExpressionEncoder()
    implicit val outEnc: Encoder[(Long, Long, Int, Long, Double)] = Encoders.product

    val fxScale = graft.operators.TextOps.Bm25Fx.toDouble
    bm25ScoredStream(queries, index, n, t).as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[(Long, Long)]),
        (Long, Long, Int, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (qid, batch, state: GroupState[(Long, Array[(Long, Long)])]) =>
          val (ver, top) = state.getOption.getOrElse((0L, Array.empty[(Long, Long)]))
          // batch-local per-neighbor sum (a query's candidates are
          // batch-atomic), then neighbor-dedup merge: new sums replace.
          // (neighbor, term hash) dedup inline: a query row re-delivered
          // WITHIN one micro-batch duplicates every candidate row —
          // summing duplicates would double tf. Single pass over the
          // iterator with a seen-keys set (keys only, never whole rows:
          // per-query candidate volume is bounded by matched postings,
          // not by k, so materializing tuples here is the one unbounded
          // buffer in the stateful operator).
          val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
          val sums = scala.collection.mutable.Map.empty[Long, Long]
          batch.foreach { case (_, nb, h, fx) =>
            if (seen.add((nb, h)))
              sums.update(nb, sums.getOrElse(nb, 0L) + fx)
          }
          // NOTE: .toSeq BEFORE the swap — mapping a Map to (sfx, nb)
          // would re-key by sfx and silently collapse score TIES
          val merged = (top.filterNot { case (_, nb) => sums.contains(nb) }
              ++ sums.toSeq.map { case (nb, sfx) => (sfx, nb) })
            .sortBy { case (sfx, nb) => (-sfx, nb) }
            .take(k)
          val nextVer = ver + 1
          state.update((nextVer, merged))
          merged.iterator.zipWithIndex.map { case ((sfx, nb), i) =>
            (qid, nextVer, i + 1, nb, sfx.toDouble / fxScale)
          }
      }
      .toDF("query_id", "ver", "rank", "neighbor_id", "score")
  }

  /** The lexical leg's per-candidate scored frame `(query_id,
    * neighbor_id, h, fx)` — [[bm25SearchStream]]'s stream-static
    * pipeline up to (not including) the stateful rank, reused by the
    * hybrid fusion stream. The term hash `h` rides along so the
    * stateful consumers can dedupe WITHIN-batch re-deliveries of a
    * query row: (neighbor, h) is unique per query in a clean batch
    * (the query side is term-distinct and the served index holds one
    * posting per (h, neighbor)), so a duplicate (neighbor, h) row can
    * only come from the same query arriving twice in one micro-batch —
    * summing it would double-count tf. */
  def bm25ScoredStream(queries: DataFrame, index: DataFrame,
      n: Long, t: Long): DataFrame = {
    val qh = queries
      .select(col("doc_id").as("query_id"), split(col("text"), " ").as("l"))
      .where(size(col("l")) >= 3)
      .select(col("query_id"), explode(array_distinct(expr(
        """transform(sequence(1, size(l)-2),
           i -> concat_ws(' ', element_at(l,i), element_at(l,i+1), element_at(l,i+2)))""")))
        .as("sh"))
      .select(col("query_id"), graft.operators.TextOps.h60(col("sh")).as("h"))
    // BROADCAST the per-batch query-term side (≤ batch·terms rows):
    // without the hint the planner cannot size the micro-batch relation
    // and may sort/shuffle the whole static postings index EVERY
    // trigger — the serving-rate killer the sf1 soak measured
    qh.hint("broadcast").join(index, "h")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("h"),
        graft.operators.TextOps.bm25FxCol(
          col("tf"), col("dl"), col("df"), n, t).as("fx"))
  }

  /** `s_hybrid_search`: streaming HYBRID retrieval — arriving query
    * docs carrying both representations (`doc_id`, `text`,
    * `embedding`) are answered by BOTH index families per micro-batch
    * and fused with reciprocal-rank fusion, the full online hybrid
    * search service (the streaming twin of the batch `q_hybrid_rrf`,
    * with the production vector leg: the residual compressed index
    * instead of the exact-cosine baseline).
    *
    *  - lexical leg: [[bm25ScoredStream]] against the served df-capped
    *    postings (skew-free stream-static equi-join);
    *  - vector leg: [[ivfPqScoredStream]] against the residual
    *    compressed index (probe NProbe cells, ADC lookups — a query
    *    scans cells, never the corpus);
    *  - fusion: both legs' candidate rows derive from the query's
    *    single arriving row, so they land in ONE micro-batch and the
    *    per-query fmgs sees both COMPLETE candidate sets at once: it
    *    ranks each leg to `fuseDepth` (lexical by exact fixed-point
    *    sum, vector by ADC score — the legs' own tie disciplines),
    *    fuses with exact integer RRF (RrfFx DIV (60+rank)), and keeps
    *    the top `k`. State per query is the fused top-k ONLY; each
    *    firing REPLACES it wholesale (a re-delivered query re-derives
    *    identical complete legs — idempotent; a query doc UPDATE is
    *    last-write-wins, the natural serving semantics).
    *
    * `checkpointLocation` binds BOTH index eras
    * ([[StateGeometryGuard.hybrid]]) — the fused leaderboard depends on
    * the lexical corpus stats AND the cells/codebooks, so a resume
    * across either rebuild fails loudly.
    *
    * Pass MATERIALIZED index frames (the maintained views' parquet
    * reads, a persisted `pqResArtifacts` index, or a localCheckpoint):
    * a stream-static join re-executes its static side every
    * micro-batch, so a lazy build plan here re-runs the whole index
    * construction per batch — the r11 sf1 soak measured that mistake
    * at 40× the served rate. */
  def hybridSearchStream(queries: DataFrame,
      lexIndex: DataFrame,
      n: Long,
      t: Long,
      vecIndex: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int = 5,
      fuseDepth: Int = 20,
      rrfC: Long = 60L,
      rrfFx: Long = 1048576L,
      nProbe: Int = 4,
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.hybrid(
      n, t, graft.operators.TextOps.bm25DfCap(n), cells, codebooks))
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val inEnc: Encoder[(Long, Int, Long, Long, Long, Double)] = Encoders.product
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[(Long, Array[(Long, Long, Long, Long)])] =
      ExpressionEncoder()
    implicit val outEnc: Encoder[(Long, Long, Int, Long, Long, Long, Long)] =
      Encoders.product

    val lex = bm25ScoredStream(
        queries.select(col("doc_id"), col("text")), lexIndex, n, t)
      .select(col("query_id"), lit(0).as("leg"), col("neighbor_id"),
        col("h"), col("fx"), lit(0.0).as("score"))
    val vec = ivfPqScoredStream(
        queries.select(col("doc_id").as("vec_id"), col("embedding")),
        vecIndex, cells, codebooks, nProbe)
      .select(col("query_id"), lit(1).as("leg"), col("neighbor_id"),
        lit(0L).as("h"), lit(0L).as("fx"), col("score"))

    lex.unionByName(vec).as[(Long, Int, Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[(Long, Long, Long, Long)]),
        (Long, Long, Int, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (qid, batch, state: GroupState[(Long, Array[(Long, Long, Long, Long)])]) =>
          // a query row re-delivered WITHIN one micro-batch duplicates
          // every candidate row of both legs: the lexical sums would
          // double and the vector duplicates would occupy fuseDepth
          // slots (and their .toMap overwrite corrupted ranks) — dedupe
          // per leg first: lexical by (neighbor, term hash), vector by
          // neighbor (one ADC row per neighbor in a clean batch).
          val rows = batch.toSeq
          // lexical: sum fx per neighbor, rank by (sfx desc, nb asc)
          val lexRank = rows.filter(_._2 == 0).distinctBy(r => (r._3, r._4))
            .groupBy(_._3).map { case (nb, rs) => (nb, rs.map(_._5).sum) }
            .toSeq.sortBy { case (nb, sfx) => (-sfx, nb) }.take(fuseDepth)
            .zipWithIndex.map { case ((nb, _), i) => nb -> (i + 1L) }.toMap
          // vector: one ADC score per neighbor, rank by (score desc, nb asc)
          val vecRank = rows.filter(_._2 == 1).distinctBy(_._3)
            .map(r => (r._3, r._6))
            .sortBy { case (nb, s) => (-s, nb) }.take(fuseDepth)
            .zipWithIndex.map { case ((nb, _), i) => nb -> (i + 1L) }.toMap
          val fused = (lexRank.keySet ++ vecRank.keySet).toSeq.map { nb =>
            val fx = lexRank.get(nb).map(r => rrfFx / (rrfC + r)).getOrElse(0L) +
              vecRank.get(nb).map(r => rrfFx / (rrfC + r)).getOrElse(0L)
            (fx, nb, lexRank.getOrElse(nb, 0L), vecRank.getOrElse(nb, 0L))
          }.sortBy { case (fx, nb, _, _) => (-fx, nb) }.take(k).toArray
          val ver = state.getOption.map(_._1).getOrElse(0L) + 1
          state.update((ver, fused))
          fused.iterator.zipWithIndex.map { case ((fx, nb, rl, rv), i) =>
            (qid, ver, i + 1, nb, fx, rl, rv)
          }
      }
      .toDF("query_id", "ver", "rank", "neighbor_id", "rrf_fx",
        "rank_lex", "rank_vec")
  }

  /** `s_ivfpq_encode`: STATELESS streaming residual IVF-PQ encoder —
    * the compress-on-ingest twin of the batch `q_sim_ivfpq_res` index
    * build. Each arriving vector (a) routes to its cosine-nearest cell
    * (ties to the smallest cell_id — the batch `ivfCellOf` discipline,
    * computed with the same [[graft.functions.DotProduct]] expression
    * so the IEEE arithmetic is shared), (b) subtracts the cell's MEAN
    * centroid in the fixed-point integer domain (pure `fxe − ctrm`
    * subtraction, bit-identical to the batch residual frame), and
    * (c) maps each residual subvector to its nearest trained codeword
    * (integer squared L2, struct-min ties to the smallest id). Output:
    * `(vec_id, cell_id, codes)` — the row a production pipeline sinks
    * into the compressed index: one small int for the cell plus PqSub
    * codes instead of 64 floats.
    *
    * The cell records ride in as a SINGLE `typedLit` array value — one
    * Catalyst literal node holding the whole artifact, not a
    * thousand-node literal tree (the batch `pqAssign` codegen-limit
    * lesson); cells are a bounded index artifact (√n-flavored count,
    * the same class as codebooks). No state, no shuffle: a pure
    * per-row map, horizontally partition-parallel at any scale.
    * Equivalence with the batch index is spec-pinned.
    *
    * `checkpointLocation` binds the cell + codebook fingerprint
    * ([[StateGeometryGuard.ivfpq]]) — residual codes are meaningful
    * only against the exact (cells, codebooks) pair that produced
    * them; upgrades go through [[PqMigration]]. */
  def ivfPqEncodeStream(vecs: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.ivfpq(cells, codebooks))
    ivfPqEncodeProj(vecs, cells, codebooks).drop("err")
  }

  /** The encoder's pure projection, INCLUDING the per-vector
    * quantization error `err = Σ_s ‖r_s − ĉ_s‖²` (integer fixed-point²
    * — the min-dist the assignment computes anyway, normally dropped).
    * The ingest-side health view aggregates it; the public encoder
    * stays code-only. Works on batch frames too (no geometry binding
    * here — callers bind their own). */
  private[streaming] def ivfPqEncodeProj(vecs: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])]): DataFrame = {
    import graft.operators.VectorOps.{dot => vdot}
    val sub = graft.operators.Similarity.PqSub
    val fxScale = graft.operators.Similarity.PqFx
    val dim = 64 / sub
    val bySub = codebooks.groupBy(_._1)
    require(cells.nonEmpty, "cells must be non-empty")
    require((0 until sub).forall(bySub.contains),
      s"codebooks must cover all $sub subspaces, got ${bySub.keys.toSeq.sorted}")
    // routing: struct-min over (−cosine, cell_id) ≡ the batch window's
    // (sim DESC, cell_id ASC); negation is IEEE-exact, so near-ties
    // resolve identically to ivfCellOf
    val cellArr = typedLit(cells)
    val pick = array_min(transform(cellArr, c => struct(
      (vdot(col("embedding"), c.getField("_2")) /
        (sqrt(vdot(col("embedding"), col("embedding"))) *
          sqrt(vdot(c.getField("_2"), c.getField("_2")))) * lit(-1.0))
        .as("negsim"),
      c.getField("_1").as("cell_id"),
      c.getField("_3").as("ctrm"))))
    // residual in fixed point: round(x·2^20) − ctrm, exact integers
    val routed = vecs
      .withColumn("pick", pick)
      .select(col("vec_id"), col("pick.cell_id").as("cell_id"),
        zip_with(
          transform(col("embedding"),
            x => round(x.cast("double") * fxScale).cast("long")),
          col("pick.ctrm"), (x, c) => x - c).as("rfx"))
    val pickCols = (0 until sub).map { s0 =>
      val cbArr = array(bySub(s0).sortBy(_._2).map { case (_, j, cv) =>
        struct(lit(j).as("j"), array(cv.map(lit): _*).as("cv"))
      }: _*)
      val subv = slice(col("rfx"), s0 * dim + 1, dim)
      array_min(transform(cbArr, c => struct(
        aggregate(zip_with(subv, c.getField("cv"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, z) => acc + z)
          .as("dist"),
        c.getField("j").as("j"))))
    }
    routed.select(col("vec_id"), col("cell_id"),
      array(pickCols.map(_.getField("j")): _*).as("codes"),
      pickCols.map(_.getField("dist")).reduce(_ + _).as("err"))
  }

  /** `s_ivfpq_search`: streaming ANN query serving over the RESIDUAL
    * compressed index — the search twin of [[ivfPqEncodeStream]] and
    * the streaming form of the batch `q_sim_ivfpq_res` (IVFADC serving
    * shape, Jégou et al. §V). Per arriving query, in its own
    * projection (index artifacts ride in as single `typedLit`/literal
    * values, never a row explosion):
    *
    *  - probe selection: the `nProbe` smallest `(−cosine, cell_id)`
    *    structs of the cell array — ≡ the batch probes window's
    *    `sim DESC, cell_id ASC`, same DotProduct arithmetic — each
    *    probe carrying its base term `⟨q, mean_c⟩` of the IVFADC
    *    decomposition;
    *  - the ADC distance table `dt[s][j]` against the residual-trained
    *    codebooks, exactly [[pqSearchStream]]'s shape;
    *  - a stream-static EQUI-join on `cell_id` against the code-only
    *    index (each query scans NProbe cells, not the corpus), score =
    *    `base + Σ_s dt[s][code_s]` summed in subspace order — the
    *    batch query's exact association;
    *  - ranking through [[topkStream]]'s bounded per-query heap
    *    (state = k rows per query).
    *
    * Equivalence with the batch query is spec-pinned; consumers read
    * the max-`ver` set per query ([[topkStream]]'s leaderboard
    * contract). `checkpointLocation` binds the cell + codebook
    * fingerprint, same rationale as [[pqSearchStream]]. */
  def ivfPqSearchStream(queries: DataFrame,
      index: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int = 5,
      nProbe: Int = 4,
      checkpointLocation: String): DataFrame = {
    bindGeometry(checkpointLocation, StateGeometryGuard.ivfpq(cells, codebooks))
    topkStream(ivfPqScoredStream(queries, index, cells, codebooks, nProbe),
      k, keyCol = "query_id", valCol = "score", idCol = "neighbor_id")
  }

  /** The residual-ADC leg's per-candidate scored frame `(query_id,
    * neighbor_id, score)` — [[ivfPqSearchStream]]'s stream-static
    * pipeline up to (not including) the stateful rank, reused by the
    * hybrid fusion stream. */
  def ivfPqScoredStream(queries: DataFrame,
      index: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      nProbe: Int = 4): DataFrame =
    ivfPqScoredFrom(queries, pqCodesPivot(index), cells, codebooks, nProbe)

  /** The residual compressed index pivoted to one code row per vector
    * per cell `(neighbor_id, cell_id, cs)` — the SERVING layout of the
    * static side, pivoted ONCE at plan-build time (lazy
    * localCheckpoint, the r11 soak's lazy-static-side lesson).
    * Factored out so batch-mode consumers ([[RerankMonitorView]]'s
    * foreachBatch) can pivot once per deployment instead of once per
    * micro-batch. */
  def pqCodesPivot(index: DataFrame): DataFrame = index
    .groupBy(col("vec_id").as("neighbor_id"), col("cell_id"))
    .agg(array_sort(collect_list(struct(col("s"), col("j")))).as("cs"))
    .select(col("neighbor_id"), col("cell_id"), col("cs.j").as("cs"))
    .localCheckpoint(eager = false)

  /** [[ivfPqScoredStream]] against an ALREADY-PIVOTED codes frame
    * (see [[pqCodesPivot]]). */
  def ivfPqScoredFrom(queries: DataFrame,
      codesPerVec: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      nProbe: Int = 4): DataFrame = {
    import graft.operators.VectorOps.{dot => vdot}
    val sub = graft.operators.Similarity.PqSub
    val fxScale = graft.operators.Similarity.PqFx
    val dim = 64 / sub
    val bySub = codebooks.groupBy(_._1)
    require(cells.nonEmpty, "cells must be non-empty")
    require((0 until sub).forall(bySub.contains),
      s"codebooks must cover all $sub subspaces, got ${bySub.keys.toSeq.sorted}")
    // float view of each cell mean, precomputed once driver-side with
    // the same long→double→divide ops as the batch cmf projection
    val cellArr = typedLit(cells.map { case (cid, ctr, ctrm) =>
      (cid, ctr, ctrm.map(_.toDouble / fxScale)) })
    val probeArr = slice(array_sort(transform(cellArr, c => struct(
      (vdot(col("embedding"), c.getField("_2")) /
        (sqrt(vdot(col("embedding"), col("embedding"))) *
          sqrt(vdot(c.getField("_2"), c.getField("_2")))) * lit(-1.0))
        .as("negsim"),
      c.getField("_1").as("cell_id"),
      vdot(col("embedding"), c.getField("_3")).as("base")))), 1, nProbe)
    val dtCol = array((0 until sub).map { s0 =>
      val subv = slice(col("embedding"), s0 * dim + 1, dim)
      array(bySub(s0).sortBy(_._2).map { case (_, _, cv) =>
        vdot(subv, array(cv.map(c => lit(c.toDouble / fxScale)): _*))
      }: _*)
    }: _*)
    val probes = queries
      .select(col("vec_id").as("query_id"), dtCol.as("dt"),
        explode(probeArr).as("p"))
      .select(col("query_id"), col("dt"),
        col("p.cell_id").as("cell_id"), col("p.base").as("base"))
    // broadcast the per-batch probe side (batch·nProbe rows) so the
    // code index never shuffles or sorts per trigger — the static side
    // is scanned hash-joined, the serving shape at any index size
    probes.hint("broadcast")
      .join(codesPerVec, Seq("cell_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("base") + (0 until sub).map(s0 =>
          element_at(element_at(col("dt"), s0 + 1),
            (element_at(col("cs"), s0 + 1) + 1).cast("int")))
          .reduce(_ + _)).as("score"))
  }

  /** `s_hamming_search`: streaming ANN serving over the binary
    * SIGN-CODE index — the search twin of the batch `q_sim_hamming`
    * shortlist stage. Arriving query vectors encode to their 64-bit
    * sign code in the projection ([[graft.operators.Similarity
    * .hammingCodes]] — the identical codegen'd bit tree as the batch
    * index build), score the code-only static index via a
    * stream-static join (`bit_count(xor)` — two ALU ops per candidate,
    * the corpus side contributes 8 bytes per vector), and rank through
    * [[topkStream]]'s bounded per-query heap. The leaderboard value is
    * the NEGATED Hamming distance (the heap keeps value-DESC, ties to
    * the smallest neighbor_id — exactly the batch
    * `TopK.perGroup(..., ham.asc, neighbor_id.asc)` order).
    *
    * Consumers re-rank the shortlist by exact cosine downstream
    * (`Similarity.hammingRerank` — a bounded broadcast join fetching
    * only k vectors per query, the batch query's stage 2); the spec
    * pins streamed-shortlist + shared re-rank ≡ `q_sim_hamming`.
    *
    * Unlike the PQ twins there is NO geometry fingerprint to bind:
    * sign codes are CANONICAL (bit d = sign of dimension d — no
    * trained artifact, no quantizer eras), so checkpoints compose
    * freely across restarts and no re-encode migration discipline
    * exists for this index. That version-freeness is binary
    * quantization's operational selling point at 100 TB. */
  def hammingSearchStream(queries: DataFrame, codes: DataFrame,
      k: Int = graft.operators.Similarity.HamShortK): DataFrame = {
    val qc = graft.operators.Similarity.hammingCodes(queries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    // broadcast the per-batch query codes; the 8-byte/vector static
    // index streams against them (same rationale as pqSearchStream)
    val scored = qc.hint("broadcast")
      .join(codes.select(col("vec_id").as("neighbor_id"), col("code")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-bit_count(col("code").bitwiseXOR(col("qcode"))))
          .cast("double").as("negham"))
    topkStream(scored, k, keyCol = "query_id", valCol = "negham",
      idCol = "neighbor_id")
  }

  def ivfMaintain(
      vectors: DataFrame,
      centroids: Seq[(Long, Seq[Long], Long)],
      checkpointLocation: String): DataFrame = {
    // the running per-cell sums are only meaningful against the centroid
    // set they were assigned under — a resume with re-seeded centroids
    // would silently mix statistics across two partitionings
    bindGeometry(checkpointLocation, StateGeometryGuard.ivf(centroids))
    def dotInt(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val cents = array(centroids.map { case (cid, cv, cn2) =>
      struct(lit(cid).as("cid"), lit(cn2).as("cn2"),
        array(cv.map(lit): _*).as("cv"))
    }: _*)
    graft.operators.Similarity.quantizedInt8(vectors)
      .withColumn("pick", array_min(transform(cents, c =>
        struct(
          (col("qn2") + c.getField("cn2")
            - lit(2) * dotInt(col("qv"), c.getField("cv"))).as("dist"),
          c.getField("cid").as("cid")))))
      .groupBy(col("pick.cid").as("cid"))
      .agg(
        count(lit(1)).as("n_assigned"),
        sum(col("pick.dist")).as("inertia"),
        sum(element_at(col("qv"), 1)).as("s1"),
        sum(element_at(col("qv"), 2)).as("s2"),
        sum(element_at(col("qv"), 3)).as("s3"),
        sum(element_at(col("qv"), 4)).as("s4"))
  }

  /** `s_semantic_dedup`: streaming SemDeDup — the arrival-time twin of
    * the batch `q_semantic_dedup`. Each arriving vector is int8-quantized
    * and assigned to its nearest centroid STATELESSLY (literal centroid
    * array, same struct-min tie-break as [[ivfMaintain]]); per-cell state
    * holds the members seen so far (capped), and the arrival's verdict —
    * dropped iff some existing cell-mate sits above `tau` in quantized
    * cosine — is emitted immediately. Under in-id-order arrival the
    * verdicts equal the batch query exactly (pinned in StreamOpsSpec);
    * under arbitrary arrival the reference set is "seen so far", the
    * standard online-dedup semantics (cf. `s_chunk_dedup`).
    *
    * Scale: state per cell = capped member codes (64 longs each),
    * hash-partitioned by cell across executors; an arrival shuffles one
    * narrow row and compares against only its own cell — n²/K total
    * work, the SemDeDup property, incrementally. */
  def semanticDedupStream(
      vecs: DataFrame,
      centroids: Seq[(Long, Seq[Long], Long)],
      tau: Double = graft.operators.Similarity.SemDedupTau,
      maxCell: Int = 4096,
      tws: Boolean = false, checkpointLocation: String): DataFrame = {
    // cells are partitioned by the centroid set and verdicts thresholded
    // at tau — resuming with different centroids re-keys every cell
    bindGeometry(checkpointLocation,
      StateGeometryGuard.semantic(centroids, tau, maxCell))
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def dotIntCol(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val cents = array(centroids.map { case (cid, cv, cn2) =>
      struct(lit(cid).as("cid"), lit(cn2).as("cn2"),
        array(cv.map(lit): _*).as("cv"))
    }: _*)
    implicit val inEnc: Encoder[(Long, Long, Seq[Long], Long)] = Encoders.product
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[Array[(Long, Array[Long], Long)]] =
      ExpressionEncoder()
    implicit val memEnc: Encoder[(Long, Seq[Long], Long)] = Encoders.product
    implicit val outEnc: Encoder[(Long, Long, Boolean)] = Encoders.product
    def qcos(av: Array[Long], an2: Long, bv: Array[Long], bn2: Long): Double = {
      var dot = 0L
      var i = 0
      while (i < av.length) { dot += av(i) * bv(i); i += 1 }
      dot.toDouble / (math.sqrt(an2.toDouble) * math.sqrt(bn2.toDouble))
    }
    val assigned = graft.operators.Similarity.quantizedInt8(vecs)
      .withColumn("pick", array_min(transform(cents, c =>
        struct(
          (col("qn2") + c.getField("cn2")
            - lit(2) * dotIntCol(col("qv"), c.getField("cv"))).as("dist"),
          c.getField("cid").as("cid")))))
      .select(col("pick.cid").as("cid"), col("vec_id"), col("qv"), col("qn2"))
      .as[(Long, Long, Seq[Long], Long)]
      .groupByKey(_._1)
    val verdicts =
      if (!tws)
        assigned.flatMapGroupsWithState[Array[(Long, Array[Long], Long)],
          (Long, Long, Boolean)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          case (cid, rows, state: GroupState[Array[(Long, Array[Long], Long)]]) =>
            var members = state.getOption.getOrElse(
              Array.empty[(Long, Array[Long], Long)])
            val out = rows.toSeq.sortBy(_._2).flatMap {
              case (_, id, qvSeq, qn2) =>
                if (members.exists(_._1 == id)) None
                else {
                  val qv = qvSeq.toArray
                  val dropped = members.exists(m => qcos(m._2, m._3, qv, qn2) > tau)
                  if (members.length < maxCell) members = members :+ ((id, qv, qn2))
                  Some((id, cid, dropped))
                }
            }
            state.update(members)
            out.iterator
        }
      else {
        // transformWithState/RocksDB variant (VERDICT r5 item 5): cell
        // membership is a ListState of (id, codes, norm) — an admitted
        // vector APPENDS one element (RocksDB merge) and the store keeps
        // corpus-shaped cell members off-heap, not on the executor heap.
        val processor = new StatefulProcessor[Long,
          (Long, Long, Seq[Long], Long), (Long, Long, Boolean)] {
          @transient private var members: ListState[(Long, Seq[Long], Long)] = _
          override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
            members = getHandle.getListState[(Long, Seq[Long], Long)](
              "members", memEnc, TTLConfig.NONE)
          override def handleInputRows(cid: Long,
              rows: Iterator[(Long, Long, Seq[Long], Long)],
              timers: TimerValues): Iterator[(Long, Long, Boolean)] = {
            var cur = members.get().toArray
            // admitted members buffer ONE appendList per batch: a
            // per-arrival appendValue leaves one RocksDB merge operand
            // per vector, and the next batch's get() pays an unbounded
            // merge-read whose cost swings with compaction timing (the
            // sf1 soak measured 68s -> 111s -> 7s per-batch jitter)
            val admitted = Seq.newBuilder[(Long, Seq[Long], Long)]
            val out = rows.toSeq.sortBy(_._2).flatMap {
              case (_, id, qvSeq, qn2) =>
                if (cur.exists(_._1 == id)) None
                else {
                  val qv = qvSeq.toArray
                  val dropped =
                    cur.exists(m => qcos(m._2.toArray, m._3, qv, qn2) > tau)
                  if (cur.length < maxCell) {
                    admitted += ((id, qvSeq, qn2))
                    cur = cur :+ ((id, qvSeq, qn2))
                  }
                  Some((id, cid, dropped))
                }
            }
            val adds = admitted.result()
            if (adds.nonEmpty) members.appendList(adds.toArray)
            out.iterator
          }
        }
        assigned.transformWithState(processor, TimeMode.None(), OutputMode.Append())
      }
    verdicts.toDF("vec_id", "cid", "dropped")
  }

  /** `s_funnel`: INCREMENTAL funnel progression — the streaming twin of
    * `q_funnel`. Per-user state is one µs timestamp per stage (first
    * qualifying view / click-after-view / purchase-after-click); a stage
    * transition row `(user_id, stage, us)` is emitted append-only the
    * moment a user first reaches a stage, so the running per-stage counts
    * equal the batch funnel at every point in time.
    *
    * Ordering semantics mirror `seqPackStream`: within a micro-batch rows
    * are processed in `(us, stage-index)` order (a view at the same µs as
    * a click qualifies the click, exactly as the batch `us >= t1` join
    * does); across batches, arrival order is the declared semantics — a
    * CDC-fed stream arrives in GTID order, which is event-time order.
    * State: `stages.size` longs per user — bounded, watermark-free.
    * Equivalence with the batch query is pinned in StreamOpsSpec. */
  def funnelStream(
      events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      userCol: String = "user_id",
      typeCol: String = "event_type",
      usCol: String = "us"): DataFrame = {
    implicit val inEnc: Encoder[(Long, String, Long)] = Encoders.product
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    implicit val outEnc: Encoder[(Long, Int, Long)] = Encoders.product
    val stageIdx = stages.zipWithIndex.toMap
    events
      .select(col(userCol).cast("long"), col(typeCol).cast("string"),
        col(usCol).cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[Array[Long]]) =>
          val st = state.getOption.getOrElse(Array.fill(stages.size)(-1L))
          val out = scala.collection.mutable.Buffer.empty[(Long, Int, Long)]
          rows.toSeq
            .flatMap { case (_, ty, us) => stageIdx.get(ty).map(i => (us, i)) }
            .sorted
            .foreach { case (us, i) =>
              if (st(i) < 0 && (i == 0 || (st(i - 1) >= 0 && us >= st(i - 1)))) {
                st(i) = us
                out += ((user, i + 1, us))
              }
            }
          state.update(st)
          out.iterator
      }
      .toDF(userCol, "stage", usCol)
  }

  /** `s_dedup_stream`: drop duplicate `event_id`s; state expires with the
    * watermark instead of growing forever — the scale-safe variant of
    * plain `dropDuplicates`. */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String = "ts",
      idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** `s_latest_state`, typed form: running latest-event-per-key — the
    * streaming `q_cdc_snapshot`. Emits the new latest row for every key
    * touched in a micro-batch (Update output mode). */
  def latestState[K: Encoder, T](
      ds: Dataset[T],
      key: T => K,
      isNewer: (T, T) => Boolean)(implicit te: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, T](OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          var latest = state.getOption
          var changed = false
          rows.foreach { r =>
            if (latest.forall(isNewer(r, _))) { latest = Some(r); changed = true }
          }
          latest match {
            // emit only on change — a batch of exclusively-older rows must
            // not re-emit the stored value (matches latestStateTws)
            case Some(l) if changed => state.update(l); Iterator.single(l)
            case _                  => Iterator.empty
          }
      }

  /** Stream-stream interval join: rows of `left` matched with `right`
    * rows of the same key whose event time falls in
    * `[leftTs - before, leftTs + after]`. Watermarks on BOTH sides bound
    * the join state (Spark buffers each side only until the other side's
    * watermark passes the interval). Column names must be disjoint. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      before: String = "10 minutes",
      after: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"""$leftKey = $rightKey AND
                 $rightTs >= $leftTs - INTERVAL $before AND
                 $rightTs <= $leftTs + INTERVAL $after"""))

  /** [[latestState]] on the Spark 4 `transformWithState` API (RocksDB
    * state store): same semantics, the forward path for stateful ops.
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`. */
  def latestStateTws[K: Encoder, T](
      ds: Dataset[T],
      key: T => K,
      isNewer: (T, T) => Boolean)(implicit te: Encoder[T]): Dataset[T] = {
    val processor = new StatefulProcessor[K, T, T] {
      @transient private var latest: ValueState[T] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        latest = getHandle.getValueState[T]("latest", te, TTLConfig.NONE)
      override def handleInputRows(k: K, rows: Iterator[T],
          timers: TimerValues): Iterator[T] = {
        var cur = Option(latest.get())
        var changed = false
        rows.foreach { r =>
          if (cur.forall(isNewer(r, _))) { cur = Some(r); changed = true }
        }
        cur match {
          case Some(l) if changed => latest.update(l); Iterator.single(l)
          case _ => Iterator.empty
        }
      }
    }
    ds.groupByKey(key)
      .transformWithState(processor, TimeMode.None(), OutputMode.Update())
  }

  /** [[scd2History]] on the Spark 4 `transformWithState` API (RocksDB
    * state store): identical closed-version semantics — late rows
    * dropped, closed rows append-only — with the open version riding a
    * ValueState, so the store holds exactly one row per key (same
    * footprint as [[latestStateTws]]; spec-pinned ≡ the fmgs twin with
    * a state-rows bound). */
  def scd2HistoryTws[K: Encoder, T](
      ds: Dataset[T],
      key: T => K,
      version: T => Long)(implicit te: Encoder[T]): Dataset[(T, Long)] = {
    implicit val outEnc: Encoder[(T, Long)] =
      Encoders.tuple(te, Encoders.scalaLong)
    val processor = new StatefulProcessor[K, T, (T, Long)] {
      @transient private var open: ValueState[T] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        open = getHandle.getValueState[T]("open", te, TTLConfig.NONE)
      override def handleInputRows(k: K, rows: Iterator[T],
          timers: TimerValues): Iterator[(T, Long)] = {
        val sorted = rows.toSeq.sortBy(version)
        val closed = Seq.newBuilder[(T, Long)]
        var cur = Option(open.get())
        sorted.foreach { r =>
          cur match {
            case Some(o) if version(r) <= version(o) => () // late: drop
            case Some(o) =>
              closed += ((o, version(r)))
              cur = Some(r)
            case None =>
              cur = Some(r)
          }
        }
        cur.foreach(open.update)
        closed.result().iterator
      }
    }
    ds.groupByKey(key)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** Full CDC apply: like [[latestStateRows]] but honoring delete events —
    * a delete clears the key's state and emits the delete row itself as a
    * tombstone (the output is the *changelog of the materialized table*,
    * which is what a retraction-capable sink consumes; a later insert for
    * the same key resurrects it). `update_before` events are skipped: the
    * paired `update_after` carries the new image (MaxScale's event_type
    * vocabulary: insert / update_before / update_after / delete).
    */
  def applyChangelogRows(
      df: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String = "event_type",
      deleteOp: String = "delete",
      skipOps: Set[String] = Set("update_before")): DataFrame = {
    implicit val rowEnc: Encoder[org.apache.spark.sql.Row] = Encoders.row(df.schema)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val keyIdx = df.schema.fieldIndex(keyCol)
    val seqIdx = df.schema.fieldIndex(seqCol)
    val opIdx = df.schema.fieldIndex(opCol)
    // raw-mode CDC streams carry the sequence as a string — same coercion
    // as latestStateRows
    def seqOf(r: org.apache.spark.sql.Row): Long =
      r.get(seqIdx) match {
        case n: Number => n.longValue()
        case s: String => s.toLong
        case other => throw new IllegalArgumentException(
          s"sequence column $seqCol must be numeric, got $other")
      }
    df.groupByKey(r => String.valueOf(r.get(keyIdx)))
      .flatMapGroupsWithState[org.apache.spark.sql.Row, org.apache.spark.sql.Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          // newest event in GTID order decides the key's fate
          var latest = state.getOption
          var changed = false
          rows.foreach { r =>
            val op = String.valueOf(r.get(opIdx))
            if (!skipOps.contains(op) && latest.forall(l => seqOf(r) > seqOf(l))) {
              latest = Some(r); changed = true
            }
          }
          latest match {
            case Some(l) if changed =>
              if (String.valueOf(l.get(opIdx)) == deleteOp) state.remove()
              else state.update(l)
              Iterator.single(l)
            case _ => Iterator.empty
          }
      }
  }

  /** [[applyChangelogRows]] on `transformWithState` (RocksDB state
    * store): same changelog-of-the-materialized-table semantics — a
    * delete CLEARS the key's state row (the store physically drops it,
    * so tombstoned keys cost nothing at rest) and emits the delete
    * event itself; `update_before` skipped; a later insert resurrects.
    * Spec-pinned ≡ the fmgs twin with a live-keys state bound. */
  def applyChangelogRowsTws(
      df: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String = "event_type",
      deleteOp: String = "delete",
      skipOps: Set[String] = Set("update_before")): DataFrame = {
    implicit val rowEnc: Encoder[org.apache.spark.sql.Row] = Encoders.row(df.schema)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val keyIdx = df.schema.fieldIndex(keyCol)
    val seqIdx = df.schema.fieldIndex(seqCol)
    val opIdx = df.schema.fieldIndex(opCol)
    def seqOf(r: org.apache.spark.sql.Row): Long =
      r.get(seqIdx) match {
        case n: Number => n.longValue()
        case s: String => s.toLong
        case other => throw new IllegalArgumentException(
          s"sequence column $seqCol must be numeric, got $other")
      }
    val processor = new StatefulProcessor[
        String, org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
      @transient private var latest: ValueState[org.apache.spark.sql.Row] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        latest = getHandle.getValueState[org.apache.spark.sql.Row](
          "latest", rowEnc, TTLConfig.NONE)
      override def handleInputRows(k: String,
          rows: Iterator[org.apache.spark.sql.Row],
          timers: TimerValues): Iterator[org.apache.spark.sql.Row] = {
        var cur = Option(latest.get())
        var changed = false
        rows.foreach { r =>
          val op = String.valueOf(r.get(opIdx))
          if (!skipOps.contains(op) && cur.forall(l => seqOf(r) > seqOf(l))) {
            cur = Some(r); changed = true
          }
        }
        cur match {
          case Some(l) if changed =>
            if (String.valueOf(l.get(opIdx)) == deleteOp) latest.clear()
            else latest.update(l)
            Iterator.single(l)
          case _ => Iterator.empty
        }
      }
    }
    df.groupByKey(r => String.valueOf(r.get(keyIdx)))
      .transformWithState(processor, TimeMode.None(), OutputMode.Update())
  }

  /** `s_latest_state` over an untyped changelog (e.g. the maxscale-cdc
    * source in raw or typed mode): latest row per `keyCol` ordered by a
    * monotone `seqCol` — for CDC streams that is the GTID `sequence`, so
    * this materializes the table's current state from its change stream.
    */
  def latestStateRows(df: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    implicit val rowEnc: Encoder[org.apache.spark.sql.Row] = Encoders.row(df.schema)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val keyIdx = df.schema.fieldIndex(keyCol)
    val seqIdx = df.schema.fieldIndex(seqCol)
    def seqOf(r: org.apache.spark.sql.Row): Long =
      r.get(seqIdx) match {
        case n: Number => n.longValue()
        case s: String => s.toLong
        case other     => throw new IllegalArgumentException(
          s"sequence column $seqCol must be numeric, got $other")
      }
    latestState[String, org.apache.spark.sql.Row](
      df,
      r => String.valueOf(r.get(keyIdx)),
      (a, b) => seqOf(a) > seqOf(b))
  }

  /** `s_scd2`: streaming SCD Type-2 history — whenever a key's current
    * version is superseded, emit the CLOSED version as
    * `(row, valid_to)` where `valid_to` is the successor's version stamp
    * (the row's own stamp is its valid_from). The open version lives in
    * per-key state (its latest-state view is [[latestState]]); closed
    * rows are append-only, so this composes with any append sink. Batch
    * twin: `q_scd2`'s `is_current = 0` rows (oracle ✓, equivalence
    * spec-pinned).
    *
    * Ordering: CDC streams are per-key ordered by GTID, and within a
    * batch rows are sorted by `version` here; a row at-or-before the
    * stored version stamp is LATE — it is dropped rather than rewriting
    * already-emitted history (retroactive inserts need a batch restate
    * over the log, which q_scd2 is).
    *
    * Scale: one shuffle on the key; state = one open row per key, the
    * same footprint as latest-state. */
  def scd2History[K: Encoder, T](
      ds: Dataset[T],
      key: T => K,
      version: T => Long)(implicit te: Encoder[T]): Dataset[(T, Long)] = {
    implicit val outEnc: Encoder[(T, Long)] =
      Encoders.tuple(te, Encoders.scalaLong)
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, (T, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          val sorted = rows.toSeq.sortBy(version)
          val closed = Seq.newBuilder[(T, Long)]
          var open = state.getOption
          sorted.foreach { r =>
            open match {
              case Some(o) if version(r) <= version(o) => () // late: drop
              case Some(o) =>
                closed += ((o, version(r)))
                open = Some(r)
              case None =>
                open = Some(r)
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
