package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per `sbt test` fork). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Smallest scale factor — specs assert invariants, the DuckDB oracle
    * (driver t2 + tools/check.py) asserts exact values at sf0.01. */
  val sf = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", localDir.getAbsolutePath)
    .getOrCreate()

  /** Dedicated scratch root so specs can assert spills honor
    * `spark.local.dir` (TopKSpec) rather than leaking into java.io.tmpdir. */
  lazy val localDir: java.io.File = {
    val d = new java.io.File("target/spark-local-test")
    d.mkdirs()
    d
  }
}
