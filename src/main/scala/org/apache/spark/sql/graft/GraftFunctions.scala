package org.apache.spark.sql.graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works alongside the Column API
  * (graft.functions.VectorFunctions).
  *
  * Two entry points, matching Spark's two registration idioms:
  *  - [[GraftFunctions.register]]: imperative, for an existing session
  *  - [[GraftExtensions]]: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at session build time (the library-deployment path on a cluster)
  */
object GraftFunctions {
  private def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  /** `graft_zorder(a, b, bits)` — bits must be a foldable int literal. */
  private def zorderBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_zorder takes 3 arguments (a, b, bits), got ${exprs.length}")
    val bits = exprs(2) match {
      case lit if lit.foldable => lit.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_zorder bits must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "graft_zorder bits must be a literal")
    }
    graft.functions.ZOrderLong(exprs(0), exprs(1), bits)
  }

  /** `graft_minhash(tokens)` — 16-slot MinHash signature of a string array. */
  private def minhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_minhash takes 1 argument, got ${exprs.length}")
    graft.functions.MinHashSig(exprs(0))
  }

  /** `graft_simhash(tokens)` — 60-bit SimHash fingerprint of a string array. */
  private def simhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_simhash takes 1 argument, got ${exprs.length}")
    graft.functions.SimHash60(exprs(0))
  }

  /** `graft_lsh_bands(vec, numBands, bitsPerBand)` — banded hyperplane
    * LSH keys of a float array; band geometry must be int literals. */
  private def lshBandsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_lsh_bands takes 3 arguments (vec, numBands, bitsPerBand), got ${exprs.length}")
    def intLit(e: Expression, name: String): Int = e match {
      case lit if lit.foldable => lit.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_lsh_bands $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"graft_lsh_bands $name must be a literal")
    }
    graft.functions.HyperplaneBands(exprs(0),
      intLit(exprs(1), "numBands"), intLit(exprs(2), "bitsPerBand"))
  }

  /** `graft_double_bits(d)` — total-order-preserving IEEE bit image of a
    * double as a signed long (−0.0 < 0.0 distinct, NaNs collapse above
    * +∞): the sortable key behind the bounded-memory percentile
    * narrowing, exposed for SQL-level range bucketing / ordering of
    * doubles by exact bit pattern. */
  private def doubleBitsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_double_bits takes 1 argument, got ${exprs.length}")
    graft.functions.DoubleOrderedBits(exprs(0))
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      builder)

  val doubleBitsDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_double_bits"),
      new ExpressionInfo(classOf[graft.functions.DoubleOrderedBits].getName,
        "graft_double_bits"),
      doubleBitsBuilder)

  val minhashDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      minhashBuilder)

  val simhashDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHash60].getName, "graft_simhash"),
      simhashBuilder)

  val lshBandsDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[graft.functions.HyperplaneBands].getName, "graft_lsh_bands"),
      lshBandsBuilder)

  val zorderDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.functions.ZOrderLong].getName, "graft_zorder"),
      zorderBuilder)

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registerInto(reg)
  }

  /** Apply registrations to an arbitrary registry (the `private[sql]`
    * registry types are why this lives in the shim package). */
  def registerInto(registry: FunctionRegistry): Unit = {
    registry.createOrReplaceTempFunction("graft_dot", builder, "built-in")
    registry.createOrReplaceTempFunction("graft_zorder", zorderBuilder, "built-in")
    registry.createOrReplaceTempFunction("graft_minhash", minhashBuilder, "built-in")
    registry.createOrReplaceTempFunction("graft_simhash", simhashBuilder, "built-in")
    registry.createOrReplaceTempFunction("graft_lsh_bands", lshBandsBuilder, "built-in")
    registry.createOrReplaceTempFunction("graft_double_bits", doubleBitsBuilder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.description)
    ext.injectFunction(GraftFunctions.zorderDescription)
    ext.injectFunction(GraftFunctions.minhashDescription)
    ext.injectFunction(GraftFunctions.simhashDescription)
    ext.injectFunction(GraftFunctions.lshBandsDescription)
    ext.injectFunction(GraftFunctions.doubleBitsDescription)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // streaming DSv2 pushdown for the maxscale-cdc source (the source
    // also self-registers via extraOptimizations on first use; injecting
    // here covers sessions built with spark.sql.extensions before any
    // source instantiation, e.g. cluster-wide deployment)
    ext.injectOptimizerRule(_ => CdcStreamingPushdown)
  }
}
