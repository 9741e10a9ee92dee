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
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY k
      """.stripMargin.trim)
  ) { (s, dir) =>
    // ONE from_json pass over props (schema-projected Jackson parse; the
    // parser stops materializing anything but `k`) instead of
    // get_json_object's per-row path evaluation — the sf1 audit measured
    // the latter growing 11.3x for 10x data (VERDICT r9 #6).
    // TIGHTENED CONTRACT (ADVICE r10): from_json(LongType) parses only
    // integer JSON tokens — a string-encoded "5" or a non-integral 5.0
    // that get_json_object+cast would have coerced now reads as NULL
    // (and one malformed sibling key nulls the whole permissive-mode
    // parse). The generator emits `k` strictly as a JSON integer
    // (FIXTURES.md), so this is the honest typed read here; a corpus
    // with mixed-token `k` should read StringType then cast.
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "k", org.apache.spark.sql.types.LongType)))
    Tables.events(s, dir)
      .select(from_json(col("props"), propsSchema).getField("k").as("k"),
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

  /** Generator with outer semantics: explode_outer keeps rows whose array
    * is empty (docs with < 3 tokens produce no 2-shingles) — the
    * LATERAL VIEW OUTER path. */
  val qExplodeOuter: Q = Q(
    "q_explode_outer",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      e AS (
        SELECT doc_id, CASE WHEN len(toks) >= 500 THEN unnest(toks) ELSE NULL END AS tok
        FROM t WHERE len(toks) >= 500
        UNION ALL
        SELECT doc_id, NULL AS tok FROM t WHERE len(toks) < 500)
      SELECT doc_id, COUNT(tok) AS n_toks
      FROM e GROUP BY doc_id
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    // arrays emptied below a length threshold; explode_outer must keep
    // those doc_ids with a NULL element (count(tok) then ignores them)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(size(split(col("text"), " ")) >= 500, split(col("text"), " "))
          .otherwise(array().cast("array<string>")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
      .groupBy("doc_id")
      .agg(count(col("tok")).as("n_toks"))
      .orderBy("doc_id")
  }

  /** Null-safe equality (<=>): join events on a nullable extracted key —
    * NULL <=> NULL matches, unlike plain =. */
  val qNullSafe: Q = Q(
    "q_null_safe",
    Some("""
      WITH e AS (SELECT event_id,
                        CASE WHEN event_type IN ('click','view') THEN event_type END AS k
                 FROM events),
      d AS (SELECT DISTINCT CASE WHEN event_type IN ('click','view') THEN event_type END AS k
            FROM events)
      SELECT d.k, COUNT(*) AS n
      FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k
      GROUP BY d.k
      ORDER BY d.k NULLS FIRST
      """.stripMargin.trim)
  ) { (s, dir) =>
    val e = Tables.events(s, dir).select(col("event_id"),
      when(col("event_type").isin("click", "view"), col("event_type")).as("k"))
    val d = e.select("k").distinct().withColumnRenamed("k", "dk")
    e.join(d, col("k") <=> col("dk"))
      .groupBy(col("dk").as("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** Ordered string aggregation (listagg/string_agg equivalent). */
  val qStringAgg: Q = Q(
    "q_string_agg",
    Some("""
      SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
      FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
      ORDER BY r.r_name
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.region(s, dir).as("r")
      .join(Tables.nation(s, dir).as("n"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")
  }

  /** Regex group extraction over part names. */
  val qRegexExtract: Q = Q(
    "q_regex_extract",
    Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
             CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
      FROM part
      ORDER BY p_partkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).cast("long").as("n_vowels"))
      .orderBy("p_partkey")
  }

  /** Interval arithmetic: add_months / months_between / date offsets. */
  val qDateArith: Q = Q(
    "q_date_arith",
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_date,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS followup,
             CAST(datediff('month', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS months_to_y2k
      FROM orders
      ORDER BY o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    // DuckDB datediff('month') counts month-boundary crossings; Spark's
    // months_between measures fractional elapsed months — floor of the
    // boundary count is reproduced with 12*dy + dm on truncated dates.
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("due_date"),
        date_add(col("o_orderdate").cast("date"), 30).as("followup"),
        ((lit(2000) - year(col("o_orderdate"))) * 12 -
          month(col("o_orderdate")) + 1).cast("long").as("months_to_y2k"))
      .orderBy("o_orderkey")
  }

  /** Array higher-order functions (filter/exists/forall/transform) over
    * the embedding vectors — integer/boolean outputs only (float
    * comparisons of identically-stored values are engine-stable; float
    * arithmetic would not be). */
  val qArrayHof: Q = Q(
    "q_array_hof",
    Some("""
      SELECT vec_id,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
             CAST(len(list_filter(embedding, x -> abs(x) > 0.25)) AS INT) AS n_large,
             len(list_filter(embedding, x -> x > 0.45)) > 0 AS has_extreme,
             CAST(len(list_filter(list_transform(embedding, x -> x * x),
                                  x -> x > 0.04)) AS INT) AS n_sq_large
      FROM embeddings
      ORDER BY vec_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        size(filter(col("embedding"), x => abs(x) > 0.25f)).as("n_large"),
        exists(col("embedding"), x => x > 0.45f).as("has_extreme"),
        size(filter(transform(col("embedding"), x => x * x), x => x > 0.04f))
          .as("n_sq_large"))
      .orderBy("vec_id")
  }

  /** Morton z-values from the native codegen'd [[graft.functions.ZOrderLong]]
    * expression (6 bits per dimension here: p_size in [1,50] and
    * p_partkey mod 64 both fit). The oracle unrolls the identical bit
    * interleave as integer arithmetic, so the custom expression is held
    * to the same byte-exact gate as the built-ins. The write-side use is
    * [[ZOrderLayout]]; ZOrderSpec proves the skipping effect. */
  val qZorder: Q = {
    val terms = (0 until 6).flatMap(i => Seq(
      s"(((p_size >> $i) & 1) << ${2 * i})",
      s"((((p_partkey % 64) >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
    Q(
      "q_zorder",
      Some(s"""
        SELECT p_partkey, CAST($terms AS BIGINT) AS z
        FROM part
        ORDER BY p_partkey
        """.stripMargin.trim)
    ) { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          graft.functions.ZOrder.zorder(6,
            col("p_size"), pmod(col("p_partkey"), lit(64))).as("z"))
        .orderBy("p_partkey")
    }
  }

  override def all: Seq[Q] = Seq(
    qStrFuncs, qDateFuncs, qMathFuncs, qCaseExpr, qJsonGet, qArrayOps,
    qExplodeOuter, qNullSafe, qStringAgg, qRegexExtract, qDateArith, qArrayHof,
    qZorder)
}
