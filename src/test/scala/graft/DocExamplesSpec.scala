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
}
