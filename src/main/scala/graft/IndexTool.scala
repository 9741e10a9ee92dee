package graft

import org.apache.spark.sql.SparkSession

/** Operational CLI over the [[IndexStore]] (VERDICT r16 #6): inventory
  * the artifact store, expire stale trees, wipe kinds for same-path
  * cold-build measurement, and probe a single declared query (paying
  * any cold builds it needs, with per-stage walls printed and
  * journaled).
  *
  * {{{
  *   java -cp ... graft.IndexTool list
  *   java -cp ... graft.IndexTool sweep [--older-than-days N]
  *   java -cp ... graft.IndexTool wipe ndgate- pqvec- bm25
  *   java -cp ... graft.IndexTool probe q_sim_ivfpq_res target/sf10
  * }}}
  */
object IndexTool {

  private def fmtMs(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  def main(args: Array[String]): Unit = args.toList match {
    case "list" :: Nil =>
      val rows = IndexStore.list()
      println(f"${"ARTIFACT"}%-48s ${"MB"}%8s ${"BUILT"}%-24s ${"SERVED"}%-24s STALE CORPUS")
      rows.foreach { a =>
        println(f"${a.name}%-48s ${a.bytes / 1e6}%8.1f ${fmtMs(a.builtAtMs)}%-24s " +
          f"${fmtMs(a.lastServedMs)}%-24s ${a.stale.map(_.toString).getOrElse("?")}%-5s " +
          a.corpusDir.getOrElse("?"))
      }
      println(f"${rows.length} artifacts, ${rows.map(_.bytes).sum / 1e9}%.2f GB")

    case "sweep" :: rest =>
      val older = rest match {
        case "--older-than-days" :: d :: Nil =>
          Some(d.toLong * 24L * 3600 * 1000)
        case Nil => None
        case other => sys.error(s"unknown sweep args: $other")
      }
      val gone = IndexStore.sweep(older)
      gone.foreach(n => println(s"expired $n"))
      println(s"${gone.length} artifacts expired")

    case "wipe" :: prefixes if prefixes.nonEmpty =>
      val gone = IndexStore.wipeKinds(prefixes)
      gone.foreach(n => println(s"wiped $n"))
      println(s"${gone.length} artifacts wiped")

    case "probe" :: q :: dir :: Nil =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q"))
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.stop()
      println(f"[probe] $q first-touch ${secs}%.1f s ($n rows)")

    case other =>
      sys.error(s"usage: list | sweep [--older-than-days N] | " +
        s"wipe <kindPrefix>... | probe <query> <sfDir>; got: $other")
  }
}
