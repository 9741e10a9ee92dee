package graft

import org.apache.spark.sql.SparkSession

/** Independent plain-Scala reference checks for the sf10 oracle-blind
  * families (VERDICT r13 item 6).
  *
  * The banded-LSH and IVF/PQ DuckDB oracles are intractable at 200k
  * vectors (hours of list arithmetic), so the decade where their
  * scale-aware geometries actually move was verified only by counters.
  * These checks close that gap the way the MMR reference spec does:
  * a from-scratch reimplementation of the SAME algorithm contract —
  * same IEEE arithmetic (left-to-right double accumulation, float
  * elements widened per element, exactly [[graft.functions.DotProduct]]'s
  * documented contract), same tie-breaks, same md5-parity plane family —
  * in plain Scala arrays, no Spark expressions, no shared engine code.
  * Spark is used ONLY to load parquet bytes and to run the query under
  * test; every downstream number is recomputed independently and the
  * outputs compared for EXACT equality.
  *
  * Two checks, one per skipped oracle family:
  *
  *  - `q_embed_neardup_lsh` — the full gate chain from the raw
  *    embeddings: scale-aware geometry (bits/bands from the corpus
  *    count), banded hyperplane keys (salt "hp"), in-bucket candidate
  *    pairs, the 256-bit sketch pre-filter (salt "nds", Hamming ≤ 108),
  *    and the exact-cosine verify at 0.5. Nothing is taken from the
  *    engine — this is the strongest possible form (the whole pipeline
  *    re-derived from first principles).
  *  - `q_sim_ivfpq_res` — the residual-ADC serve over the on-disk
  *    `pqvec` artifact: probe ranking from the seed centroids, the
  *    IVFADC base term ⟨q, mean_c⟩, the per-subspace distance table,
  *    the fixed-order 4-term score sum, and the (score desc, id asc)
  *    top-k. The artifact (codebooks / cells / codes) is read as data —
  *    its training chain is oracle-verified in full at sf1 and
  *    argmin-spec-verified per round; what was sf10-blind is the SERVE
  *    arithmetic over the geometry only sf10 selects (150 cells), and
  *    that is exactly what this recomputes. (The MMR reference takes
  *    its shortlist from the index the same way.)
  *
  * Run via `graft.RefCheck` (env `SPARK_GRAFT_SF_DIR`) — prints one
  * JSON line consumed by tools/sf10_report.py into BENCH_r*_sf10.json;
  * RefCheckSpec pins both checks at the official fixture SFs where the
  * DuckDB oracle independently agrees, so the checker itself is
  * cross-verified before it judges the decade the oracle cannot reach.
  */
object RefCheck {

  // ---- the algorithm constants, restated (deliberately duplicated:
  // ---- they are part of the contract under test, not shared code)
  private[graft] val NQueries = 8
  private val TopK = 5
  private val NProbe = 4
  private val PqSub = 4
  private val PqDim = 16
  private val PqFx = 1048576L
  private val SketchBands = 8
  private val SketchBits = 32
  private val SketchMaxHam = 108
  private val CosThreshold = 0.5

  /** Scale-aware bits per band: `min(28, max(10, L + max(0,(L-9)/3)))`,
    * `L = ⌈log2 n⌉` — the r14 growth law, restated. */
  def refNdBits(n: Long): Int = {
    val l = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.min(28, math.max(10, l + math.max(0, (l - 9) / 3)))
  }

  /** Bands for bits: `64 + 32·(b − 10)`. */
  def refNdBands(bits: Int): Int = 64 + 32 * (bits - 10)

  /** IVF cell count: `max(16, ⌈√n / 3⌉)`. */
  def refIvfCells(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble) / 3.0).toInt)

  /** ±1 sign of plane `j`, dim `i`: parity of the portable 60-bit md5
    * of `"salt:j:i"` — recomputed from MessageDigest, not the engine's
    * cached matrix. */
  private def refPlaneSign(j: Int, i: Int, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$salt:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 1) 1.0 else -1.0
  }

  private def refSigns(planes: Int, dim: Int, salt: String): Array[Double] = {
    val out = new Array[Double](planes * dim)
    var j = 0
    while (j < planes) {
      var i = 0
      while (i < dim) { out(j * dim + i) = refPlaneSign(j, i, salt); i += 1 }
      j += 1
    }
    out
  }

  /** Left-to-right double-accumulated dot over float arrays. */
  private def fdot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Same fold, float × double (the ADC base/table terms). */
  private def fddot(a: Array[Float], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i); i += 1 }
    acc
  }

  private def fcos(a: Array[Float], b: Array[Float]): Double =
    fdot(a, b) / (math.sqrt(fdot(a, a)) * math.sqrt(fdot(b, b)))

  /** Banded sign keys of one vector against a precomputed sign matrix:
    * per plane a left-to-right double dot, bit = (acc > 0), packed
    * MSB-first in plane order. */
  private def refBandKeys(v: Array[Float], signs: Array[Double],
      bands: Int, bits: Int): Array[Long] = {
    val dim = v.length
    val keys = new Array[Long](bands)
    var plane = 0
    var band = 0
    while (band < bands) {
      var key = 0L
      var bit = 0
      while (bit < bits) {
        val base = plane * dim
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += v(i).toDouble * signs(base + i); i += 1 }
        key = (key << 1) | (if (acc > 0) 1L else 0L)
        plane += 1
        bit += 1
      }
      keys(band) = key
      band += 1
    }
    keys
  }

  private def loadEmbeddings(spark: SparkSession,
      dir: String): (Array[Long], Array[Array[Float]]) = {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    val ids = new Array[Long](rows.length)
    val vecs = new Array[Array[Float]](rows.length)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).getLong(0)
      vecs(i) = rows(i).getSeq[Float](1).toArray
      i += 1
    }
    (ids, vecs)
  }

  /** Full-chain LSH near-dup reference: returns (matched, counters). */
  def checkNeardupLsh(spark: SparkSession, dir: String)
      : (Boolean, Map[String, Long]) = {
    // the query under test (also builds nothing on disk — pure compute)
    val got = graft.operators.Similarity.qEmbedNeardupLsh.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val (ids, vecs) = loadEmbeddings(spark, dir)
    val n = ids.length
    val bits = refNdBits(n)
    val bands = refNdBands(bits)
    // dim from the data, NOT hardcoded (ADVICE r14): refBandKeys indexes
    // the sign matrix with v.length, so a non-64-dim fixture would
    // misindex a fixed-64 matrix (a confusing spurious mismatch)
    val dim = vecs(0).length
    require(vecs.forall(_.length == dim), "ragged embedding dims")
    val hpSigns = refSigns(bands * bits, dim, "hp")
    val skSigns = refSigns(SketchBands * SketchBits, dim, "nds")

    // per-vector band keys + sketch keys + norm, computed in parallel
    // (independent per vector; parallelism does not touch arithmetic)
    val keys = new Array[Array[Long]](n)
    val sks = new Array[Array[Long]](n)
    val norms = new Array[Double](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { v =>
      keys(v) = refBandKeys(vecs(v), hpSigns, bands, bits)
      sks(v) = refBandKeys(vecs(v), skSigns, SketchBands, SketchBits)
      norms(v) = math.sqrt(fdot(vecs(v), vecs(v)))
    }

    def sketchHam(a: Array[Long], b: Array[Long]): Int = {
      var h = 0; var k = 0
      while (k < SketchBands) { h += java.lang.Long.bitCount(a(k) ^ b(k)); k += 1 }
      h
    }

    // per band: sort (key, idx) packed longs, scan equal-key runs,
    // sketch-filter in place; distinct via a concurrent pair set
    require(n < (1 << 20),
      s"reference bucket scan packs vector idx in 20 bits; n=$n exceeds it")
    val kept = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val candidates = new java.util.concurrent.atomic.AtomicLong
    java.util.stream.IntStream.range(0, bands).parallel().forEach { band =>
      val packed = new Array[Long](n)
      var v = 0
      while (v < n) { packed(v) = (keys(v)(band) << 20) | v.toLong; v += 1 }
      // idx fits 20 bits only below 1M vectors — the check's declared domain
      java.util.Arrays.sort(packed)
      var lo = 0
      var localCand = 0L
      while (lo < n) {
        var hi = lo + 1
        while (hi < n && (packed(hi) >>> 20) == (packed(lo) >>> 20)) hi += 1
        var x = lo
        while (x < hi) {
          var y = x + 1
          val vx = (packed(x) & 0xFFFFF).toInt
          while (y < hi) {
            val vy = (packed(y) & 0xFFFFF).toInt
            localCand += 1
            if (sketchHam(sks(vx), sks(vy)) <= SketchMaxHam) {
              val (a, b) = if (ids(vx) < ids(vy)) (vx, vy) else (vy, vx)
              kept.add((a.toLong << 32) | b.toLong)
            }
            y += 1
          }
          x += 1
        }
        lo = hi
      }
      candidates.addAndGet(localCand)
    }

    // exact verify over the kept pairs
    val pairs = new java.util.ArrayList[(Long, Long)]()
    kept.forEach { p =>
      val x = (p >>> 32).toInt
      val y = (p & 0xFFFFFFFFL).toInt
      val cos = fdot(vecs(x), vecs(y)) / (norms(x) * norms(y))
      if (cos > CosThreshold) pairs.add((ids(x), ids(y)))
    }
    import scala.jdk.CollectionConverters._
    val want = pairs.asScala.toSeq.sorted
    (got == want, Map(
      "n" -> n.toLong, "bits" -> bits.toLong, "bands" -> bands.toLong,
      "candidates" -> candidates.get, "sketch_kept" -> kept.size.toLong,
      "verified" -> want.size.toLong, "spark_rows" -> got.size.toLong))
  }

  /** Multi-probe LSH ANN reference (VERDICT r14 #6 — the third
    * geometry-moving family): the full q_sim_lsh chain from the raw
    * embeddings — the fixed 4-band × 4-bit salt-"hp" family, corpus
    * band keys, the multi-probe query keys (each band key XOR each
    * 1-bit mask, plus the unflipped key), distinct candidates, the
    * exact-cosine re-rank and the (cos desc, id asc) top-k. Same
    * from-scratch discipline as [[checkNeardupLsh]]: plain arrays,
    * MessageDigest planes, left-to-right double dots. */
  def checkSimLsh(spark: SparkSession, dir: String)
      : (Boolean, Map[String, Long]) = {
    val got = graft.operators.Similarity.qSimLsh.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val (ids, vecs) = loadEmbeddings(spark, dir)
    val n = ids.length
    val bands = 4
    val bits = 4
    val dim = vecs(0).length
    require(vecs.forall(_.length == dim), "ragged embedding dims")
    val signs = refSigns(bands * bits, dim, "hp")
    val keys = new Array[Array[Long]](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { v =>
      keys(v) = refBandKeys(vecs(v), signs, bands, bits)
    }
    // corpus bucket index: (band, key) → member idxs
    val buckets = new java.util.HashMap[Long, java.util.ArrayList[Int]]()
    var v = 0
    while (v < n) {
      var b = 0
      while (b < bands) {
        buckets.computeIfAbsent((b.toLong << 32) | keys(v)(b),
          _ => new java.util.ArrayList[Int]()).add(v)
        b += 1
      }
      v += 1
    }
    import scala.jdk.CollectionConverters._
    val byIdIdx = ids.zipWithIndex.toMap
    var candTotal = 0L
    val want = (0L until NQueries).flatMap { qid =>
      val q = byIdIdx(qid)
      val cand = scala.collection.mutable.Set.empty[Int]
      var b = 0
      while (b < bands) {
        val masks = 0L +: (0 until bits).map(j => 1L << j)
        masks.foreach { m =>
          val bucket = buckets.get((b.toLong << 32) | (keys(q)(b) ^ m))
          if (bucket != null) bucket.asScala.foreach { x =>
            if (ids(x) != qid) cand += x
          }
        }
        b += 1
      }
      candTotal += cand.size
      cand.toSeq
        .map(x => (ids(x), fcos(vecs(q), vecs(x))))
        .sortBy { case (nid, cos) => (-cos, nid) }
        .take(TopK)
        .zipWithIndex.map { case ((nid, _), i) => (qid, nid, (i + 1).toLong) }
    }
    (got == want, Map(
      "n" -> n.toLong, "bands" -> bands.toLong, "bits" -> bits.toLong,
      "candidates" -> candTotal,
      "rows" -> want.size.toLong, "spark_rows" -> got.size.toLong))
  }

  /** Residual-ADC serve reference over the on-disk pqvec artifact. */
  def checkIvfPqRes(spark: SparkSession, dir: String)
      : (Boolean, Map[String, Long]) = {
    // the query under test first — it also guarantees the artifact exists
    val got = graft.operators.Similarity.qSimIvfPqRes.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq

    val art = graft.operators.Similarity.pqArtifactPathFor(spark, dir)
    val (ids, vecs) = loadEmbeddings(spark, dir)
    val byId = ids.zip(vecs).toMap
    val n = ids.length

    // cells: (cell_id, ctrm) + the seed centroid = the corpus vector at
    // vec_id == cell_id (the deterministic-training convention)
    val cells = spark.read.parquet(s"$art/cells").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val ctrmf = cells.map { case (cid, ctrm) =>
      cid -> ctrm.map(_.toDouble / PqFx) }.toMap
    require(cells.length == refIvfCells(n),
      s"cell count ${cells.length} != expected ${refIvfCells(n)}")

    // residual codebooks: (s, j, cv) in vector units
    val cb = spark.read.parquet(s"$art/codebooks_res").collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        r.getSeq[Long](2).toArray.map(_.toDouble / PqFx))).toMap

    // the compressed index: per vector its cell and 4 codes
    val idxRows = spark.read.parquet(s"$art/index_res")
      .selectExpr("vec_id", "s", "j", "CAST(cell_id AS LONG) AS cell_id")
      .collect()
    val codeOf = new java.util.HashMap[Long, Array[Long]]()
    val cellOfV = new java.util.HashMap[Long, Long]()
    idxRows.foreach { r =>
      val vid = r.getLong(0)
      val cs = codeOf.computeIfAbsent(vid, _ => new Array[Long](PqSub))
      cs(r.getInt(1)) = r.getLong(2)
      cellOfV.put(vid, r.getLong(3))
    }

    // members per cell
    val members = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
    cellOfV.forEach { (vid, cid) =>
      members.computeIfAbsent(cid, _ => new java.util.ArrayList[Long]()).add(vid)
    }

    import scala.jdk.CollectionConverters._
    val want = (0L until NQueries).flatMap { q =>
      val qv = byId(q)
      // probe ranking: cosine to the SEED centroid, ties to smaller cell
      val probes = cells.map { case (cid, _) =>
        (cid, fcos(qv, byId(cid))) }
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(NProbe)
      // distance table: term(s, j) = <q_sub_s, cv_{s,j}>
      val qsubs = (0 until PqSub).map(s0 =>
        java.util.Arrays.copyOfRange(qv, s0 * PqDim, (s0 + 1) * PqDim))
      val dt = cb.map { case ((s0, j), cv) => (s0, j) -> fddot(qsubs(s0), cv) }
      val scored = probes.flatMap { case (cid, _) =>
        val base = fddot(qv, ctrmf(cid))
        members.getOrDefault(cid, new java.util.ArrayList[Long]()).asScala
          .filter(_ != q).map { vid =>
            val cs = codeOf.get(vid)
            // fixed-order 4-term sum, then base + (((t0+t1)+t2)+t3)
            val t = ((dt((0, cs(0))) + dt((1, cs(1)))) + dt((2, cs(2)))) +
              dt((3, cs(3)))
            (vid, base + t)
          }
      }
      scored.sortBy { case (vid, sc) => (-sc, vid) }.take(TopK)
        .zipWithIndex.map { case ((vid, _), i) => (q, vid, (i + 1).toLong) }
    }
    (got == want, Map(
      "n" -> n.toLong, "cells" -> cells.length.toLong,
      "rows" -> want.size.toLong, "spark_rows" -> got.size.toLong))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((lshOk, lshStats), lshSec) = timed(checkNeardupLsh(spark, sfDir))
    val ((pqOk, pqStats), pqSec) = timed(checkIvfPqRes(spark, sfDir))
    val ((annOk, annStats), annSec) = timed(checkSimLsh(spark, sfDir))
    def js(ok: Boolean, stats: Map[String, Long], sec: Double): String = {
      val ss = stats.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      // Locale.ROOT: f"$sec%.2f" uses the JVM default locale, and a
      // comma-decimal locale would emit invalid JSON (ADVICE r14)
      val secs = String.format(java.util.Locale.ROOT, "%.2f", sec)
      s"""{"match":$ok,$ss,"sec":$secs}"""
    }
    // one JSON line — the sf10 audit harness (tools/sf10_report.py) folds it in
    println(s"""{"refcheck":{"q_embed_neardup_lsh":${js(lshOk, lshStats, lshSec)},""" +
      s""""q_sim_ivfpq_res":${js(pqOk, pqStats, pqSec)},""" +
      s""""q_sim_lsh":${js(annOk, annStats, annSec)}},"sf_dir":"$sfDir"}""")
    spark.stop()
    if (!(lshOk && pqOk && annOk)) sys.exit(1)
  }
}
