package graft

import graft.sql.GraftSql

/** Value goldens straight from the reference's GENERATED function doc
  * (docs/zh/openmldb_sql/udfs_8h.md): every self-contained const
  * example (`SELECT f(args); -- output X`) runs through the SQL
  * front-end and must produce the documented value — semantic drift in
  * any documented scalar now fails a test, not just absence
  * (FunctionSurfaceSpec covers presence). Window examples reference an
  * implicit prose table and are skipped; a floor assertion keeps the
  * net non-vacuous. */
class DocExamplesSpec extends SparkSpec {

  private case class Ex(fn: String, idx: Int, sql: String, expected: String)

  /** fn:idx keys whose example cannot be compared mechanically, with
    * the reason. The function's semantics stay covered elsewhere
    * (corpus / FunctionSurfaceSpec / sibling examples here). */
  private val skip: Map[String, String] = Map(
    "atan:1" -> ("ATAN(0, -0) (the 2-arg atan2 form, now rewritten): " +
      "the doc's π assumes a signed double -0.0 operand; an integer " +
      "literal -0 has no sign bit."),
    "atan2:0" -> ("ATAN2(0, -0): the doc's π assumes a signed double " +
      "-0.0 operand; an integer literal -0 has no sign bit (our -0 is " +
      "int 0 → atan2 = 0). atan2 over double operands is " +
      "corpus/oracle-covered."),
    "dayofyear:3" -> ("date('2020-05-32') is invalid; the doc's legacy " +
      "0 predates null-flag returns (default_udf_library.cc:2376 doc " +
      "block only) — this engine and DuckDB yield NULL."),
    "get_json_object:4" -> ("'{\"foo\": {\"bar\": bz}}' is malformed " +
      "JSON the reference's lenient parser passes through; Spark's " +
      "JSON reader yields NULL on malformed documents."),
    "like_match:0" -> ("doc typo: 'Mi_k' does not glob-match 'Mike' — " +
      "the engine's own vectors use 'Mi_e' " +
      "(codegen/udf_ir_builder_test.cc:1279)."),
    "ilike_match:0" -> "same doc typo ('Mi_k' vs the tests' 'Mi_e')",
    "ilike_match:1" -> "same doc typo ('mi_k' vs the tests' 'Mi_e')",
    "regexp_like:0" -> ("doc typo: 'Mi.k' does not match 'Mike' (the " +
      "pattern's k aligns with e); sibling examples cover the fn."),
    "split_by_key:0" -> ("the reference keeps the space after ',' in " +
      "' k2' (feature_zero_def.cc:244-253 — no trim); the doc output " +
      "collapses the double space. Ours matches the implementation."),
    "unix_timestamp:2" -> ("unix_timestamp('') returns now() in the " +
      "reference — nondeterministic legacy; this engine yields NULL " +
      "(deliberate: reproducible pipelines)."))

  private lazy val examples: Seq[Ex] = {
    val src = scala.io.Source.fromFile(
      "/root/reference/docs/zh/openmldb_sql/udfs_8h.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val sections = text.split("(?m)^### function ").drop(1).toSeq
    sections.flatMap { sec =>
      val name = sec.linesIterator.next().trim
      val blocks = "(?s)```sql\\s*\\n(.*?)```".r
        .findAllMatchIn(sec).map(_.group(1)).toSeq
      var idx = 0
      blocks.flatMap { block =>
        // pair statement text with the `--` comment that follows it
        val out = Seq.newBuilder[Ex]
        val cur = new StringBuilder
        block.linesIterator.foreach { raw =>
          val line = raw.trim
          if (line.nonEmpty) {
            val cut = line.indexOf("--")
            val stmtPart = (if (cut >= 0) line.take(cut) else line).trim
            if (stmtPart.nonEmpty)
              cur.append(if (cur.isEmpty) "" else " ").append(stmtPart)
            if (cut >= 0) {
              val comment = line.drop(cut + 2).trim
              if (cur.nonEmpty && comment.nonEmpty) {
                out += Ex(name, idx, cur.toString.stripSuffix(";"), comment)
                idx += 1
                cur.clear()
              }
            }
          }
        }
        out.result()
      }.filter { ex =>
        val low = (" " + ex.sql.toLowerCase + " ").replaceAll("\\s+", " ")
        low.startsWith(" select") && !low.contains(" from ") &&
          !low.contains(" over ")
      }
    }
  }

  /** "output: X", stripped of quotes and trailing prose. */
  private def cleanExpected(e0: String): String = {
    var e = e0.trim
    e = e.replaceFirst("(?i)^output:?\\s*", "")
    // drop trailing prose: "0.75 (decline from 8 to 2)" / "1 (double type)"
    val paren = e.indexOf(" (")
    if (paren > 0) e = e.take(paren)
    e = e.trim
    if (e.length >= 2 && e.head == '"' && e.last == '"') e = e.tail.init
    e
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case b: Array[Byte] => new String(b, "UTF-8")
    case x => String.valueOf(x)
  }

  /** numeric compare at the precision the doc printed; string equality
    * otherwise. The reference CLI prints TIMESTAMP values as epoch
    * milliseconds — an all-digit expectation against a Timestamp
    * compares on getTime. */
  private def matches(expected: String, got: Any): Boolean = {
    val g = got match {
      case t: java.sql.Timestamp if expected.matches("-?\\d+") =>
        t.getTime.toString
      case other => render(other)
    }
    if (expected == g) return true
    (expected.toDoubleOption, g.toDoubleOption) match {
      case (Some(e), Some(d)) =>
        val dp = expected.reverse.takeWhile(_ != '.').length *
          (if (expected.contains('.')) 1 else 0)
        val tol = 0.5 * math.pow(10, -dp)
        math.abs(e - d) <= tol
      case _ => false
    }
  }

  test("documented const examples compute the documented values") {
    assert(examples.nonEmpty, "no examples parsed from udfs_8h.md")
    val failures = Seq.newBuilder[String]
    var checked = 0
    examples.foreach { ex =>
      val key = s"${ex.fn}:${ex.idx}"
      if (!skip.contains(key)) {
        try {
          val rows = GraftSql.sql(spark, ex.sql, Map.empty).collect()
          val exp0 = cleanExpected(ex.expected)
          // a multi-projection example documents its outputs as a
          // bracketed list: ["hello", "default"]
          val exps: Seq[String] =
            if (exp0.startsWith("[") && exp0.endsWith("]"))
              exp0.tail.init.split(",").toSeq
                .map(e => cleanExpected(e.trim))
            else Seq(exp0)
          if (rows.length != 1) failures += s"$key: ${rows.length} rows"
          else if (exps.length > rows(0).length ||
              !exps.zipWithIndex.forall { case (e, ci) =>
                matches(e, rows(0).get(ci)) })
            failures += s"$key: `${ex.sql}` → " +
              (0 until rows(0).length).map(ci => render(rows(0).get(ci)))
                .mkString(", ") + s", doc says ${ex.expected}"
          else checked += 1
        } catch {
          case e: Throwable =>
            failures += s"$key: `${ex.sql}` threw " +
              e.getMessage.linesIterator.next().take(120)
        }
      }
    }
    val fs = failures.result()
    info(s"value-checked $checked documented examples " +
      s"(${skip.size} curated skips)")
    assert(fs.isEmpty, s"${fs.size} documented examples diverge:\n" +
      fs.mkString("\n"))
    assert(checked >= 60,
      s"only $checked examples value-checked — the golden net went vacuous")
  }

  // -------------------------------------------------------------------
  // Windowed (UDAF) examples: `SELECT fn(args) OVER w; -- output X`
  // preceded by a markdown table of input rows. The full window (last
  // row under UNBOUNDED PRECEDING .. CURRENT ROW, ordered by the
  // table's row order) must produce the documented value.
  // -------------------------------------------------------------------

  private case class WEx(fn: String, idx: Int, call: String,
      expected: String, cols: Seq[String], rows: Seq[Seq[String]])

  private lazy val windowExamples: Seq[WEx] = {
    val src = scala.io.Source.fromFile(
      "/root/reference/docs/zh/openmldb_sql/udfs_8h.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val sections = text.split("(?m)^### function ").drop(1).toSeq
    val callRe =
      "(?is)^\\s*SELECT\\s+([a-z0-9_]+\\s*\\(.*\\))\\s+OVER\\s+w\\s*;?\\s*$".r
    sections.flatMap { sec =>
      val name = sec.linesIterator.next().trim
      val tables = "(?m)((?:^\\|[^\\n]*\\|[ \\t]*$\\n?)+)".r
        .findAllMatchIn(sec).toSeq
      var idx = 0
      "(?s)```sql\\s*\\n(.*?)```".r.findAllMatchIn(sec).toSeq.flatMap { m =>
        val lines = m.group(1).linesIterator.map(_.trim)
          .filter(_.nonEmpty).toSeq
        val stmt = lines.filterNot(_.startsWith("--"))
          .map(_.split("--")(0).trim).mkString(" ")
        val out = lines.find(_.contains("--"))
          .map(_.split("--", 2)(1).trim).filter(_.nonEmpty)
        val parsed = for {
          call <- stmt match {
            case callRe(c) => Some(c)
            case _         => None
          }
          e <- out
          t <- tables.filter(_.start < m.start).lastOption
        } yield {
          val tl = t.group(1).linesIterator.map(_.trim)
            .filter(_.nonEmpty).toSeq
          val cols = tl.head.split("\\|").map(_.trim)
            .filter(_.nonEmpty).toSeq
          val rows = tl.drop(2)
            .map(_.split("\\|").map(_.trim).filter(_.nonEmpty).toSeq)
            .filter(_.length == cols.length)
          val ex = WEx(name, idx, call, e, cols, rows)
          idx += 1
          ex
        }
        parsed.toSeq
      }
    }
  }

  /** Window examples whose documented output contradicts its own input
    * table — arithmetic shows the doc value is impossible; the engine's
    * semantics are pinned by the q_topn_* DuckDB oracle rows and the
    * test_udaf_function corpus instead. */
  private val skipWin: Map[String, String] = Map(
    "top_n_value_avg_cate_where:0" -> ("doc says \"z:5,x:4\" but the " +
      "table's true-condition x rows are {0,4} → avg 2, not 4 (ours: " +
      "z:5,x:2)"),
    "top_n_value_count_cate_where:0" -> ("doc says \"x:3,y:2\" but y " +
      "has ONE true row ({1}) → count 1; z has {5,6} → 2 (ours: " +
      "x:3,z:2)"),
    "top_n_value_min_cate_where:0" -> ("doc says \"z:5,x:2\" but x's " +
      "true rows are {0,2} → min 0, and by-value ranking picks y:1 " +
      "over x:0 is false too — z:5,y:1 (ours) is the correct top-2 " +
      "by aggregated value"))

  /** cate-map compare: "x:2,y:2" vs "x:2.000000,y:2.000000" — keys in
    * order, values numerically at the doc's printed precision. */
  private def cateMatches(exp: String, got: String): Boolean = {
    val pe = exp.split(",", -1)
    val pg = got.split(",", -1)
    pe.length == pg.length && pe.zip(pg).forall { case (a, b) =>
      (a.split(":", 2), b.split(":", 2)) match {
        case (Array(ka, va), Array(kb, vb)) =>
          ka.trim == kb.trim && matches(va.trim, vb.trim)
        case _ => a.trim == b.trim
      }
    }
  }

  test("documented UDAF window examples compute the documented values") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    assert(windowExamples.nonEmpty, "no window examples parsed")
    val failures = Seq.newBuilder[String]
    var checked = 0
    windowExamples.filterNot(ex => skipWin.contains(s"${ex.fn}:${ex.idx}"))
      .foreach { ex =>
      try {
        def typeOf(ci: Int): DataType = {
          val cells = ex.rows.map(_(ci))
          if (cells.forall(_.matches("-?\\d+"))) IntegerType
          else if (cells.forall(c =>
            c.equalsIgnoreCase("true") || c.equalsIgnoreCase("false")))
            BooleanType
          else if (cells.forall(_.matches("-?\\d+(\\.\\d+)?"))) DoubleType
          else StringType
        }
        val types = ex.cols.indices.map(typeOf)
        // the doc tables spell the category column 'catagory' while
        // some *_cate_where calls reference 'category' — provide both
        val fields = ex.cols.zip(types).map { case (c, t) =>
          StructField(c, t)
        } ++ (if (ex.cols.contains("catagory") &&
            ex.call.toLowerCase.contains("category"))
          Seq(StructField("category",
            types(ex.cols.indexOf("catagory"))))
        else Nil) ++
          Seq(StructField("rid", IntegerType), StructField("grp", IntegerType))
        val data = ex.rows.zipWithIndex.map { case (r, i) =>
          val vals = r.zip(types).map {
            case (c, IntegerType) => c.toInt
            case (c, DoubleType)  => c.toDouble
            case (c, BooleanType) => c.toBoolean
            case (c, _)           => c
          }
          val dup = if (fields.exists(_.name == "category"))
            Seq(vals(ex.cols.indexOf("catagory"))) else Nil
          Row.fromSeq(vals ++ dup ++ Seq(i, 1))
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 1), StructType(fields))
        val sql = s"SELECT rid, ${ex.call} OVER w AS r FROM tdoc WINDOW " +
          "w AS (PARTITION BY grp ORDER BY rid ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW)"
        val rows = GraftSql.sql(spark, sql, tables = Map("tdoc" -> df))
          .collect()
        val lastRid = ex.rows.length - 1
        val got = rows.find(_.getInt(0) == lastRid)
          .map(_.get(1)).getOrElse("<no row>")
        val exp = cleanExpected(ex.expected)
        val ok = matches(exp, got) ||
          (exp.contains(":") && cateMatches(exp, render(got)))
        if (!ok)
          failures += s"${ex.fn}:${ex.idx}: `${ex.call}` → " +
            s"${render(got)}, doc says ${ex.expected}"
        else checked += 1
      } catch {
        case e: Throwable =>
          failures += s"${ex.fn}:${ex.idx}: `${ex.call}` threw " +
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(140)
      }
    }
    val fs = failures.result()
    info(s"value-checked $checked documented window examples")
    assert(fs.isEmpty, s"${fs.size} documented window examples diverge:\n" +
      fs.mkString("\n"))
    assert(checked >= 35,
      s"only $checked window examples checked — the net went vacuous")
  }
}
