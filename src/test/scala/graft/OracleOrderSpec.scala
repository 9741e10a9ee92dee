package graft

/** CI tripwire for the round-9 sf1 audit's sharpest correctness lesson:
  * an oracle whose final ORDER BY is not a TOTAL order on the emitted
  * rows passes the gate only while both engines happen to break ties the
  * same way — q_scan_project sorted by (l_orderkey, l_linenumber), which
  * is NOT unique in the fixtures, and the official SFs passed on the
  * accident that DuckDB's stable sort and Spark's range-sort agreed;
  * sf1 diverged on 38k rows.
  *
  * For every declared oracle this spec parses the final depth-0 ORDER BY
  * (paren-aware, so window/CTE-internal sorts don't confuse it) and
  * asserts, against the Spark result at sf0.001, that every tie group is
  * full-row identical — identical duplicate rows are order-safe (the
  * except_all/intersect_all shape), rows that differ on an unsorted
  * column are an engine-dependent emission order waiting for a fixture
  * to expose it. Fixture-dependent by nature (a tie must exist at
  * sf0.001 to trip), so the cross-SF audit stays the backstop; this
  * catches the common case the moment a query is declared.
  */
class OracleOrderSpec extends SparkSpec {

  /** Sort keys of the LAST `ORDER BY` at paren depth 0, or None if the
    * statement has no top-level sort. Trailing `LIMIT n` is dropped;
    * each key keeps only its leading token (direction / NULLS words
    * stripped) and any qualifier prefix is removed. */
  private def finalOrderBy(sql: String): Option[Seq[String]] = {
    val upper = sql.toUpperCase
    var depth = 0
    var last = -1
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith("ORDER BY", i)) last = i
      }
      i += 1
    }
    if (last < 0) return None
    var tail = sql.substring(last + "ORDER BY".length)
    tail = tail.replaceAll("(?is)\\bLIMIT\\s+\\d+\\s*$", "")
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0
    tail.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    Some(parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+")(0).stripPrefix("\"").stripSuffix("\""))
      .map(k => k.substring(k.lastIndexOf('.') + 1)))
  }

  test("parser + detector self-check: a non-total sort IS flagged " +
      "(the spec cannot pass vacuously)") {
    // parser: depth-0 only, last occurrence, LIMIT stripped, qualifiers
    // and direction words dropped
    assert(finalOrderBy(
      "SELECT * FROM (SELECT a, row_number() OVER (ORDER BY b) r FROM t) " +
        "ORDER BY a DESC NULLS FIRST, t.b LIMIT 5") == Some(Seq("a", "b")))
    assert(finalOrderBy("SELECT count(*) FROM t") == None)
    // detector: ties on the sorted prefix that differ on an unsorted
    // column must be reported
    import spark.implicits._
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val keyIdx = Seq(df.columns.indexOf("a"))
    val ties = df.collect().groupBy(r => keyIdx.map(r.get))
      .filter { case (_, g) =>
        g.length > 1 && g.map(_.toString).distinct.length > 1 }
    assert(ties.nonEmpty, "detector failed to flag a non-total sort")
  }

  test("every oracle's final ORDER BY is total on the emitted rows " +
      "(ties must be full-row identical) — r9 sf1 audit tripwire") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.toSeq
      finalOrderBy(sql) match {
        case None =>
          if (df.count() > 1)
            bad += s"$name: no top-level ORDER BY but >1 row"
        case Some(keys) =>
          val unresolved = keys.filterNot(cols.contains)
          if (unresolved.nonEmpty)
            bad += s"$name: ORDER BY keys $unresolved are not output " +
              s"columns $cols — totality unverifiable, sort by aliases"
          else if (!cols.forall(keys.contains)) {
            val keyIdx = keys.map(cols.indexOf)
            val rows = df.collect()
            rows.groupBy(r => keyIdx.map(r.get)).foreach { case (k, g) =>
              if (g.length > 1 && g.map(_.toString).distinct.length > 1)
                bad += s"$name: tie at key $k differs on unsorted " +
                  s"columns (${g.length} rows) — engine-dependent order"
            }
          }
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
