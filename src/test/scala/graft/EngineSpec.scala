package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

/** Engine plumbing: SQL registration of native expressions and the salted
  * skew-join equivalence. */
class EngineSpec extends SparkSpec {

  test("graft_dot is usable from SQL after registration") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
    // float arrays too (the embeddings column type)
    val f = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(f == 3.0)
  }

  test("GraftExtensions injects graft_dot into a function registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graft.GraftExtensions().apply(ext)
    // the imperative seam registers the same builder; both paths share it
    val registry = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    GraftFunctions.registerInto(registry)
    Seq("graft_dot", "graft_zorder", "graft_minhash", "graft_simhash",
      "graft_lsh_bands", "graft_double_bits").foreach { fn =>
      assert(registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fn)), fn)
    }
  }

  test("graft_minhash / graft_simhash / graft_lsh_bands usable from SQL, Column-API-equal") {
    GraftFunctions.register(spark)
    val toks = "the quick brown fox jumps over the lazy dog".split(" ")
    val tokSql = toks.map(t => s"'$t'").mkString("array(", ", ", ")")
    val sigSql = spark.sql(s"SELECT graft_minhash($tokSql) AS s")
      .head().getSeq[Long](0)
    val sigCol = spark.range(1)
      .select(graft.functions.MinHashSig.minhashSig(
        typedLit(toks.toSeq)).as("s")).head().getSeq[Long](0)
    assert(sigSql == sigCol)
    val fpSql = spark.sql(s"SELECT graft_simhash($tokSql) AS f").head().getLong(0)
    val fpCol = spark.range(1)
      .select(graft.functions.SimHash60.simhash60(
        typedLit(toks.toSeq)).as("f")).head().getLong(0)
    assert(fpSql == fpCol)
    val vecSql = "array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT), CAST(2.5 AS FLOAT))"
    val bandsSql = spark.sql(s"SELECT graft_lsh_bands($vecSql, 4, 8) AS b")
      .head().getSeq[Long](0)
    assert(bandsSql.length == 4)
    // deterministic: same input, same keys
    val again = spark.sql(s"SELECT graft_lsh_bands($vecSql, 4, 8) AS b")
      .head().getSeq[Long](0)
    assert(bandsSql == again)
  }

  test("graft_double_bits is usable from SQL and orders like Double.compare") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_double_bits(-0.0d) AS a, graft_double_bits(0.0d) AS b, " +
        "graft_double_bits(CAST('NaN' AS DOUBLE)) AS n, " +
        "graft_double_bits(CAST('Infinity' AS DOUBLE)) AS inf").head()
    assert(r.getLong(0) < r.getLong(1), "-0.0 must key below 0.0, distinctly")
    assert(r.getLong(2) > r.getLong(3), "NaN must key above +Infinity")
  }

  test("graft_zorder is usable from SQL; bits must be a literal") {
    GraftFunctions.register(spark)
    // x=0b11 in even lanes, y=0b01 in odd lanes -> 0b0111 = 7
    val z = spark.sql("SELECT graft_zorder(3L, 1L, 8) AS z").head().getLong(0)
    assert(z == 7L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_zorder(3L, 1L, id) FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "o_custkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
