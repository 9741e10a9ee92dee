package graft.sources.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets.UTF_8

/** The source's committed-GTID watermark, persisted under the query
  * checkpoint so a restarted driver resumes the tailer from the last
  * committed batch end — the furthest-back position any re-planned
  * uncommitted batch can need as its start.
  *
  * Written via temp-file + rename (the same atomicity discipline Spark's
  * own HDFSMetadataLog uses); Hadoop FileSystem API so any checkpoint
  * scheme (file://, hdfs://, s3a://) works.
  */
object CommittedGtidFile {
  private def fs(p: Path): FileSystem =
    p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  private def path(checkpoint: String): Path =
    new Path(checkpoint, "graft-cdc-committed-gtid")

  def read(checkpoint: String): Option[Gtid] = {
    val p = path(checkpoint)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        // drain fully — a single read() may return a prefix on some
        // filesystems, and a truncated GTID would silently resume early
        val out = new java.io.ByteArrayOutputStream(64)
        val tmp = new Array[Byte](64)
        var n = in.read(tmp)
        while (n > 0) { out.write(tmp, 0, n); n = in.read(tmp) }
        val s = out.toString(UTF_8).trim
        if (s.isEmpty) None else GtidOffset.fromJson(s).gtid
      } finally in.close()
    }
  }

  /** Monotone write: the watermark only ever advances. A commit of a stale
    * end (re-delivered batch after restart) must not move the file
    * backwards — a regressed watermark makes the next restart re-replay
    * events already committed downstream (duplicate delivery). */
  def advance(checkpoint: String, gtid: Gtid): Unit = {
    if (read(checkpoint).exists(_ >= gtid)) return
    val p = path(checkpoint)
    val f = fs(p)
    val tmp = new Path(checkpoint, s".graft-cdc-committed-gtid.tmp")
    val out = f.create(tmp, true)
    try out.write(gtid.toString.getBytes(UTF_8)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
  }

  // ------------------------------------------------- domainMode=vector

  private def vpath(checkpoint: String): Path =
    new Path(checkpoint, "graft-cdc-committed-vector")

  def readVector(checkpoint: String): DomainVectorOffset = {
    val p = vpath(checkpoint)
    val f = fs(p)
    if (!f.exists(p)) DomainVectorOffset.Start
    else {
      val in = f.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(256)
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { out.write(tmp, 0, n); n = in.read(tmp) }
        val s = out.toString(UTF_8).trim
        if (s.isEmpty) DomainVectorOffset.Start
        else DomainVectorOffset.fromJson(s)
      } finally in.close()
    }
  }

  /** Monotone vector write under the per-domain partial order: no
    * domain's watermark ever regresses. A commit that misses a domain
    * the file already carries (possible only on stale re-delivery after
    * restart) keeps that domain's entry, PREPENDED — its watermark event
    * arrived before anything in the newer vector, so the head/request-
    * point contract of [[DomainVectorOffset]] is preserved. */
  def advanceVector(checkpoint: String, v: DomainVectorOffset): Unit = {
    val cur = readVector(checkpoint)
    if (cur.covers(v)) return
    val carried = cur.entries.filterNot(g => v.of(g.domain).isDefined)
    val merged = DomainVectorOffset(carried ++ v.entries.map { g =>
      cur.of(g.domain).filter(_ > g).getOrElse(g) // never regress a domain
    })
    val p = vpath(checkpoint)
    val f = fs(p)
    val tmp = new Path(checkpoint, s".graft-cdc-committed-vector.tmp")
    val out = f.create(tmp, true)
    try out.write(merged.json().getBytes(UTF_8)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
  }
}
