package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Shared file discipline of the maintained-index views
  * ([[Bm25IndexView]], [[VecIndexView]]): per-batch log partitions,
  * the two-rename atomic swap with the `_applied_batch` marker INSIDE
  * the new directory (the CdcAggView discipline), and recursive
  * deletes. */
private[streaming] object IndexFiles {

  def listBatchDirs(logRoot: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(logRoot)) Nil
    else java.nio.file.Files.list(logRoot).iterator().asScala.toSeq
      .filter(p => java.nio.file.Files.isDirectory(p)
        && p.getFileName.toString.startsWith("batch="))
      .sortBy(_.getFileName.toString)
  }

  def lastApplied(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir, "_applied_batch")
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    else -1L
  }

  def swapInWithMarker(df: DataFrame, dir: String, batchId: Long): Unit = {
    val target = java.nio.file.Paths.get(dir)
    val next = java.nio.file.Paths.get(dir + ".next-" + System.nanoTime())
    val old  = java.nio.file.Paths.get(dir + ".old-" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).parquet(next.toString)
    java.nio.file.Files.write(next.resolve("_applied_batch"),
      batchId.toString.getBytes("UTF-8"))
    if (java.nio.file.Files.exists(target))
      java.nio.file.Files.move(target, old)
    java.nio.file.Files.move(next, target)
    if (java.nio.file.Files.exists(old)) deleteTree(old)
  }

  def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
