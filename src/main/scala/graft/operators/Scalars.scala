package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.2 q_str_funcs, q_date_funcs,
  * q_math_funcs, q_case_expr, q_json_get, q_array_ops).
  *
  * All built-in `org.apache.spark.sql.functions` — codegen'd, no UDFs.
  * Int-returning Spark functions are cast to long to match DuckDB's BIGINT
  * outputs; rounding goes through DECIMAL (both engines round half away
  * from zero there).
  */
object Scalars extends QueryPack {

  val qStrFuncs: Q = Q(
    "q_str_funcs",
    Some("""
      SELECT p_partkey,
             upper(p_name) AS uname,
             lower(p_brand) AS lbrand,
             substring(p_name, 1, 4) AS pfx,
             CAST(length(p_name) AS BIGINT) AS nlen,
             trim(concat('  ', p_name, ' ')) AS trimmed,
             replace(p_name, ' ', '_') AS underscored,
             concat_ws('|', p_brand, p_type) AS brand_type,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size
      FROM part
      ORDER BY p_partkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 4).as("pfx"),
        length(col("p_name")).cast("long").as("nlen"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded_size"))
      .orderBy("p_partkey")
  }

  val qDateFuncs: Q = Q(
    "q_date_funcs",
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT)  AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start
      FROM orders
      ORDER BY o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"))
      .orderBy("o_orderkey")
  }

  val qMathFuncs: Q = Q(
    "q_math_funcs",
    Some("""
      SELECT c_custkey,
             CAST(abs(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS abal,
             CAST(ceil(c_acctbal) AS BIGINT) AS cbal,
             CAST(floor(c_acctbal) AS BIGINT) AS fbal,
             CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS rbal,
             mod(c_custkey, 7) AS m7,
             sqrt(abs(c_acctbal)) AS sbal
      FROM customer
      ORDER BY c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        abs(dec(col("c_acctbal"))).cast("double").as("abal"),
        ceil(col("c_acctbal")).cast("long").as("cbal"),
        floor(col("c_acctbal")).cast("long").as("fbal"),
        round(dec(col("c_acctbal")), 1).cast("double").as("rbal"),
        (col("c_custkey") % 7).as("m7"),
        sqrt(abs(col("c_acctbal"))).as("sbal"))
      .orderBy("c_custkey")
  }

  val qCaseExpr: Q = Q(
    "q_case_expr",
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice < 100000 THEN 'low'
                  WHEN o_totalprice < 300000 THEN 'mid'
                  ELSE 'high' END AS price_band,
             coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending
      FROM orders
      ORDER BY o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("price_band"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
          .as("status_or_pending"))
      .orderBy("o_orderkey")
  }

  /** JSON scalar extraction from events.props ({"k": int}) + aggregate. */
  val qJsonGet: Q = Q(
    "q_json_get",
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY k
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
              col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("k")
  }

  /** Array scalar ops over embeddings (integer outputs only — float
    * element compares are engine-precision traps). */
  val qArrayOps: Q = Q(
    "q_array_ops",
    Some("""
      SELECT label,
             COUNT(*) AS n_vecs,
             CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
             COUNT(*) FILTER (WHERE embedding[1] > 0) AS n_pos_first,
             COUNT(*) FILTER (WHERE len(embedding[1:8]) = 8) AS n_slice8
      FROM embeddings
      GROUP BY label
      ORDER BY label
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(size(col("embedding")).cast("long")).as("total_dims"),
        count(when(element_at(col("embedding"), 1) > 0, 1)).as("n_pos_first"),
        count(when(size(slice(col("embedding"), 1, 8)) === 8, 1)).as("n_slice8"))
      .orderBy("label")
  }

  override def all: Seq[Q] = Seq(
    qStrFuncs, qDateFuncs, qMathFuncs, qCaseExpr, qJsonGet, qArrayOps)
}
