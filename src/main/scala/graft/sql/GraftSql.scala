package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.operators.{LastJoin, WindowOps}

/** SQL front-end for the OpenMLDB dialect: standard SELECT plus the
  * three feature-engineering extensions — `LAST JOIN`,
  * `WINDOW ... UNION`, and `ROWS_RANGE` frames with
  * MAXSIZE / EXCLUDE CURRENT_TIME / EXCLUDE CURRENT_ROW /
  * INSTANCE_NOT_IN_WINDOW (docs/en/openmldb_sql/dql/WINDOW_CLAUSE.md,
  * JOIN_CLAUSE.md; grammar surface dql/SELECT_STATEMENT.md:101-111).
  *
  * Architecture (SURVEY §7.1): a hand-rolled recursive-descent parser
  * covers the STRUCTURAL dialect (clauses, joins, window specs); scalar
  * expression text is delegated verbatim to Spark's `expr()` — the
  * overlap in expression syntax is near-total once GraftScalars
  * registers the dialect-specific function names. Planning emits plain
  * DataFrame operators: plain frames → `Window.rowsBetween/rangeBetween`
  * (whole-stage codegen), extended frames → the
  * [[graft.operators.WindowOps.frameArray]] pipeline, LAST JOIN →
  * [[graft.operators.LastJoin]]. No SparkSession fork, no custom
  * parser dependency — ~500 lines replace the reference's
  * zetasql + JNI + LLVM stack for the batch path.
  */
object GraftSql {

  // ------------------------------------------------------------------
  // Tokenizer
  // ------------------------------------------------------------------

  private val twoCharOps = Set("<=", ">=", "<>", "!=", "==", "||", "&&")

  private[sql] def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val q = c; val b = new StringBuilder().append(q); i += 1
        while (i < n && s.charAt(i) != q) { b.append(s.charAt(i)); i += 1 }
        if (i < n) { b.append(q); i += 1 }
        out += b.toString
      } else if (c.isDigit) {
        val b = new StringBuilder
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) {
          b.append(s.charAt(i)); i += 1
        }
        out += b.toString
      } else if (c.isLetter || c == '_' || c == '`') {
        val b = new StringBuilder
        if (c == '`') { // backquoted identifier
          i += 1
          while (i < n && s.charAt(i) != '`') { b.append(s.charAt(i)); i += 1 }
          if (i < n) i += 1
        } else {
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) {
            b.append(s.charAt(i)); i += 1
          }
        }
        out += b.toString
      } else if (i + 2 < n && s.substring(i, i + 3) == "<=>") { out += "<=>"; i += 3 }
      else if (i + 1 < n && twoCharOps(s.substring(i, i + 2))) {
        out += s.substring(i, i + 2); i += 2
      } else { out += c.toString; i += 1 }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // AST
  // ------------------------------------------------------------------

  private[sql] sealed trait Bound
  private[sql] case object Unbounded extends Bound
  private[sql] case object CurrentRow extends Bound
  private[sql] final case class Prec(n: Long, open: Boolean) extends Bound

  private[sql] final case class WinDef(
      unions: Seq[TRef], partition: Seq[String],
      order: Option[String], orderDesc: Boolean,
      isRows: Boolean, lo: Bound, hi: Bound,
      maxSize: Int, exclCT: Boolean, exclCR: Boolean, inw: Boolean) {
    def isExtended: Boolean =
      maxSize > 0 || exclCT || exclCR || inw || unions.nonEmpty
  }

  private[sql] final case class Proj(tokens: Vector[String],
      over: Option[Either[String, WinDef]], alias: Option[String]) {
    def exprText: String = tokens.mkString(" ")
    def hasNestedOver: Boolean = tokens.exists(_.equalsIgnoreCase("OVER"))
  }

  /** a table reference: a named table or a parenthesized subquery */
  private[sql] type TRef = Either[String, Query]

  private[sql] final case class JoinClause(kind: String, table: TRef,
      alias: Option[String], order: Option[String], cond: String)

  private[sql] final case class Select(
      projs: Seq[Proj], fromTable: TRef, fromAlias: Option[String],
      joins: Seq[JoinClause], where: Option[String],
      groupBy: Seq[String], having: Option[String],
      windows: Map[String, WinDef], limit: Option[Int])

  private[sql] final case class Query(
      ctes: Seq[(String, Query)], selects: Seq[Select], setOps: Seq[String])

  // ------------------------------------------------------------------
  // Parser
  // ------------------------------------------------------------------

  private class Parser(val toks: Vector[String]) {
    var p = 0
    def peek: String = if (p < toks.length) toks(p) else ""
    def peekUp: String = peek.toUpperCase
    def next(): String = { val t = peek; p += 1; t }
    def expect(kw: String): Unit = {
      if (peekUp != kw.toUpperCase)
        fail(s"expected $kw but found '$peek'")
      p += 1
    }
    def accept(kw: String): Boolean =
      if (peekUp == kw.toUpperCase) { p += 1; true } else false
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"GraftSql parse error at token $p ('$peek'): $msg")

    private val clauseStoppers = Set("FROM", "WHERE", "GROUP", "HAVING",
      "WINDOW", "LIMIT", "UNION", "ON", "LAST", "LEFT", "ORDER")

    /** read expression tokens until a depth-0 stopper */
    def readExprTokens(extraStop: Set[String] = Set.empty): Vector[String] = {
      val stop = clauseStoppers ++ extraStop
      val b = Vector.newBuilder[String]
      var depth = 0
      var done = false
      while (!done && p < toks.length) {
        val t = peekUp
        if (depth == 0 && (t == ")" || t == "," || stop(t) || t == "OVER" || t == "AS")) done = true
        else {
          if (peek == "(") depth += 1
          if (peek == ")") depth -= 1
          b += next()
        }
      }
      val parts = b.result()
      if (parts.isEmpty) fail("empty expression")
      parts
    }

    def readExpr(extraStop: Set[String] = Set.empty): String =
      readExprTokens(extraStop).mkString(" ")

    def parseWinDefPublic(): WinDef = parseWinDef()

    def parseQuery(): Query = {
      val ctes = Seq.newBuilder[(String, Query)]
      if (accept("WITH")) {
        var more = true
        while (more) {
          val name = next()
          expect("AS"); expect("(")
          ctes += (name -> parseQuery())
          expect(")")
          more = accept(",")
        }
      }
      val selects = Seq.newBuilder[Select]
      val ops = Seq.newBuilder[String]
      selects += parseSelect()
      while (peekUp == "UNION") {
        next()
        val op = if (accept("ALL")) "all"
          else { accept("DISTINCT"); "distinct" }
        ops += op
        selects += parseSelect()
      }
      Query(ctes.result(), selects.result(), ops.result())
    }

    def parseSelect(): Select = {
      expect("SELECT")
      val projs = Seq.newBuilder[Proj]
      var more = true
      while (more) {
        val e =
          if (peek == "*") { next(); Vector("*") } else readExprTokens()
        val over: Option[Either[String, WinDef]] =
          if (accept("OVER")) {
            if (peek == "(") { next(); val w = parseWinDef(); expect(")"); Some(Right(w)) }
            else Some(Left(next()))
          } else None
        val alias =
          if (accept("AS")) Some(next())
          else None
        projs += Proj(e, over, alias)
        more = accept(",")
      }
      // no-FROM constant select (dql/NO_TABLE_SELECT_CLAUSE.md)
      if (peekUp != "FROM")
        return Select(projs.result(), Left(""), None, Nil, None, Nil, None,
          Map.empty, None)
      expect("FROM")
      val fromTable = parseTableRef()
      val fromAlias =
        if (accept("AS")) Some(next())
        else if (peek.nonEmpty && peek.head.isLetter &&
          !clauseStoppers(peekUp) && peekUp != "UNION") Some(next())
        else None
      val joins = Seq.newBuilder[JoinClause]
      var j = true
      while (j) {
        if (accept("LAST")) {
          expect("JOIN")
          val t = parseTableRef()
          val a = if (accept("AS")) Some(next())
            else if (peek.nonEmpty && peek.head.isLetter &&
              peekUp != "ORDER" && peekUp != "ON") Some(next())
            else None
          val ord = if (accept("ORDER")) { expect("BY"); Some(readExpr(Set("ON"))) } else None
          expect("ON")
          joins += JoinClause("last", t, a, ord, readExpr())
        } else if (accept("LEFT")) {
          expect("JOIN")
          val t = parseTableRef()
          val a = if (accept("AS")) Some(next())
            else if (peek.nonEmpty && peek.head.isLetter && peekUp != "ON") Some(next())
            else None
          expect("ON")
          joins += JoinClause("left", t, a, None, readExpr())
        } else j = false
      }
      val where = if (accept("WHERE")) Some(readExpr()) else None
      val groupBy = Seq.newBuilder[String]
      if (accept("GROUP")) {
        expect("BY")
        groupBy += readExpr()
        while (accept(",")) groupBy += readExpr()
      }
      val having = if (accept("HAVING")) Some(readExpr()) else None
      val windows = Map.newBuilder[String, WinDef]
      if (accept("WINDOW")) {
        var w = true
        while (w) {
          val name = next()
          expect("AS"); expect("(")
          windows += (name -> parseWinDef())
          expect(")")
          w = accept(",")
        }
      }
      val limit = if (accept("LIMIT")) Some(next().toInt) else None
      Select(projs.result(), fromTable, fromAlias, joins.result(), where,
        groupBy.result(), having, windows.result(), limit)
    }

    def parseTableRef(): TRef =
      if (peek == "(") { next(); val q = parseQuery(); expect(")"); Right(q) }
      else {
        var name = next()
        while (peek == ".") { next(); name = name + "." + next() } // db.table
        Left(name)
      }

    /** UNION t1,t2 [INSTANCE_NOT_IN_WINDOW] PARTITION BY ... ORDER BY ...
      * ROWS|ROWS_RANGE BETWEEN <bound> AND <bound>
      * [MAXSIZE n] [EXCLUDE CURRENT_TIME] [EXCLUDE CURRENT_ROW]
      * [INSTANCE_NOT_IN_WINDOW] */
    def parseWinDef(): WinDef = {
      val unions = Seq.newBuilder[TRef]
      if (accept("UNION")) {
        unions += parseTableRef()
        while (accept(",")) unions += parseTableRef()
      }
      val partition = Seq.newBuilder[String]
      expect("PARTITION"); expect("BY")
      partition += readExpr(Set("ROWS", "ROWS_RANGE"))
      while (accept(",")) partition += readExpr(Set("ROWS", "ROWS_RANGE"))
      var order: Option[String] = None
      var orderDesc = false
      if (accept("ORDER")) {
        expect("BY")
        order = Some(readExpr(Set("DESC", "ASC", "ROWS", "ROWS_RANGE")))
        if (accept("DESC")) orderDesc = true else accept("ASC")
      }
      val isRows =
        if (accept("ROWS_RANGE")) false
        else { expect("ROWS"); true }
      expect("BETWEEN")
      val lo = parseBound(isRows)
      expect("AND")
      val hi = parseBound(isRows)
      var maxSize = 0
      var exclCT = false; var exclCR = false; var inw = false
      var attrs = true
      while (attrs) {
        if (accept("MAXSIZE")) maxSize = next().toInt
        else if (accept("EXCLUDE")) {
          if (accept("CURRENT_TIME")) exclCT = true
          else { expect("CURRENT_ROW"); exclCR = true }
        }
        else if (accept("INSTANCE_NOT_IN_WINDOW")) inw = true
        else attrs = false
      }
      WinDef(unions.result(), partition.result(), order, orderDesc,
        isRows, lo, hi, maxSize, exclCT, exclCR, inw)
    }

    private def unitMs(u: String): Option[Long] = u.toLowerCase match {
      case "s" => Some(1000L)
      case "m" => Some(60000L)
      case "h" => Some(3600000L)
      case "d" => Some(86400000L)
      case _   => None
    }

    def parseBound(isRows: Boolean): Bound = {
      if (accept("UNBOUNDED")) { expect("PRECEDING"); Unbounded }
      else if (accept("CURRENT")) { expect("ROW"); CurrentRow }
      else {
        val n = next().toLong
        val mult =
          if (!isRows) unitMs(peek).map { m => p += 1; m }.getOrElse(1L)
          else 1L
        val open = accept("OPEN")
        expect("PRECEDING")
        Prec(n * mult, open)
      }
    }
  }

  // ------------------------------------------------------------------
  // Planner
  // ------------------------------------------------------------------

  private val UidCol = "__graft_uid"
  private val FlagCol = "__graft_primary"
  private val RequestFlagCol = "__graft_is_request"
  private val RequestUnionTable = "__graft_request_union"

  /** Render a parameter value as a SQL literal token. */
  private def literal(v: Any): String = v match {
    case null       => "NULL"
    case s: String  => "'" + s.replace("'", "''") + "'"
    case b: Boolean => b.toString
    case n          => String.valueOf(n)
  }

  /** Run a dialect query. `tables` overrides/augments the session's
    * temp-view catalog for table-name resolution; `params` bind `?`
    * placeholders in order (the reference's parameterized query mode —
    * cases/query/parameterized_query.yaml). */
  def sql(spark: SparkSession, text: String,
      tables: Map[String, DataFrame] = Map.empty,
      params: Seq[Any] = Nil): DataFrame = {
    var remaining = params
    val toks = tokenize(text).map {
      case "?" if remaining.nonEmpty =>
        val v = remaining.head; remaining = remaining.tail; literal(v)
      case t => t
    }
    val parser = new Parser(toks)
    val q = parser.parseQuery()
    if (parser.p != parser.toks.length)
      parser.fail("trailing tokens")
    planQuery(spark, q, tables)
  }

  /** Request mode: compute the query's features point-in-time for each
    * request row against the stored history — the reference's DEPLOY /
    * online-request semantics in batch form (sql_compiler.cc:173,
    * RequestUnionRunner). `requests` must be schema-compatible with the
    * query's FROM table; every window frame sees history rows plus the
    * request row itself, never other request rows
    * (PhysicalRequestUnionNode, physical_op.h:1504). Returns one output
    * row per request row. */
  def requestMode(spark: SparkSession, text: String, requests: DataFrame,
      tables: Map[String, DataFrame] = Map.empty): DataFrame = {
    val parser = new Parser(tokenize(text))
    val q = parser.parseQuery()
    if (parser.p != parser.toks.length) parser.fail("trailing tokens")
    require(q.ctes.isEmpty && q.selects.length == 1,
      "request mode supports a single SELECT")
    val sel = q.selects.head
    require(sel.groupBy.isEmpty && sel.joins.forall(_.kind == "last"),
      "request mode supports window projections and LAST JOINs only")
    val history = resolveRef(spark, sel.fromTable, tables)
    // union with provenance flag; the request row is the only primary
    val flagged = requests.withColumn(RequestFlagCol, lit(true))
      .unionByName(history.withColumn(RequestFlagCol, lit(false)),
        allowMissingColumns = true)
    val sel2 = sel.copy(fromTable = Left(RequestUnionTable))
    planSelect(spark, sel2, tables + (RequestUnionTable -> flagged),
      requestMode = true)
  }

  /** EXPLAIN: the planned query's formatted physical plan (the
    * reference's EXPLAIN surface, engine.cc:236-321). */
  def explain(spark: SparkSession, text: String,
      tables: Map[String, DataFrame] = Map.empty): String =
    sql(spark, text, tables).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  private def planQuery(spark: SparkSession, q: Query,
      scope0: Map[String, DataFrame]): DataFrame = {
    val scope = q.ctes.foldLeft(scope0) { case (sc, (name, sub)) =>
      sc + (name -> planQuery(spark, sub, sc))
    }
    val planned = q.selects.map(planSelect(spark, _, scope))
    q.setOps.zip(planned.tail).foldLeft(planned.head) {
      case (acc, ("all", df))      => acc.unionAll(df)
      case (acc, (_, df))          => acc.union(df).distinct()
    }
  }

  private def resolve(spark: SparkSession, name: String,
      scope: Map[String, DataFrame]): DataFrame =
    scope.getOrElse(name, spark.table(name))

  private def resolveRef(spark: SparkSession, ref: TRef,
      scope: Map[String, DataFrame]): DataFrame = ref match {
    case Left("")   => spark.range(1).toDF() // constant select anchor
    case Left(name) => resolve(spark, name, scope)
    case Right(sub) => planQuery(spark, sub, scope)
  }

  private def projName(pr: Proj, i: Int): String =
    pr.alias.getOrElse {
      val t = pr.exprText
      if (t.matches("[A-Za-z_][A-Za-z0-9_]*( \\. [A-Za-z_][A-Za-z0-9_]*)?"))
        t.split("\\.").last.trim
      else s"_c$i"
    }

  private def planSelect(spark: SparkSession, s: Select,
      scope: Map[String, DataFrame], requestMode: Boolean = false): DataFrame = {
    var df = resolveRef(spark, s.fromTable, scope)
    s.fromAlias.foreach(a => df = df.alias(a))

    s.joins.foreach { jc =>
      var right = resolveRef(spark, jc.table, scope)
      jc.alias.foreach(a => right = right.alias(a))
      df = jc.kind match {
        case "left" => df.join(right, expr(jc.cond), "left")
        case "last" =>
          val rightQual = jc.alias.orElse(jc.table.left.toOption).getOrElse("")
          equiKeys(jc.cond, rightQual, right.columns.toSet) match {
            case Some(keys) if jc.order.isDefined =>
              // scalable path: pre-reduce the right side to one row per
              // key with map-side max_by, then a plain equi-join the
              // optimizer can broadcast (LastJoin.apply's strategy,
              // inlined so the right alias survives for projections)
              val ord = expr(jc.order.get)
              val payload = right.columns.toSeq
              val reduced = right
                .groupBy(keys.map(_._2).map(col): _*)
                .agg(max_by(struct(payload.map(col): _*), ord).as("__last"))
                .select(payload.map(c => col(s"__last.$c").as(c)): _*)
                .alias(rightQual)
              val cond = keys.map { case (l, r) =>
                expr(l) === reduced(r) }.reduce(_ && _)
              df.join(reduced, cond, "left")
            case _ =>
              val ord = jc.order.map(expr).getOrElse(lit(1))
              LastJoin.general(df, right, expr(jc.cond), ord)
          }
      }
    }

    s.where.foreach(w => df = df.filter(expr(w)))

    var out: DataFrame =
      if (s.groupBy.nonEmpty) planAggregate(s, df)
      else if (s.projs.exists(p => p.over.isDefined || p.hasNestedOver))
        planWindows(spark, s, df, scope, requestMode)
      else if (s.projs.length == 1 && s.projs.head.exprText == "*") df
      else df.select(s.projs.zipWithIndex.map { case (pr, i) =>
        expr(pr.exprText).as(projName(pr, i)) }: _*)

    s.limit.foreach(n => out = out.limit(n))
    out
  }

  /** Detect a pure equi-conjunction join condition; returns
    * (leftExprText, rightColumnName) pairs when every conjunct is
    * `<left> = <rightQual>.<col>` (either side order). */
  private def equiKeys(cond: String, rightQual: String,
      rightCols: Set[String]): Option[Seq[(String, String)]] = {
    val ident = "[A-Za-z_][A-Za-z0-9_]*"
    val out = Seq.newBuilder[(String, String)]
    for (part <- cond.split("(?i)\\bAND\\b").map(_.trim)) {
      val sides = part.split("=").map(_.trim)
      if (sides.length != 2) return None
      def rightKey(sd: String): Option[String] = {
        val m = s"$rightQual \\. ($ident)".r
        sd match { case m(c) if rightCols(c) => Some(c); case _ => None }
      }
      (rightKey(sides(0)), rightKey(sides(1))) match {
        case (Some(r), None) => out += ((sides(1).replace(" . ", "."), r))
        case (None, Some(r)) => out += ((sides(0).replace(" . ", "."), r))
        case _               => return None
      }
    }
    Some(out.result())
  }

  private def planAggregate(s: Select, df: DataFrame): DataFrame = {
    val grouped = df.groupBy(s.groupBy.map(expr): _*)
    // hidden aliases: agg() auto-retains grouping columns, which would
    // collide with projections that re-select the group key by name
    val hidden = s.projs.indices.map(i => s"__graft_p$i")
    val aggCols = s.projs.zipWithIndex.map { case (pr, i) =>
      expr(pr.exprText).as(hidden(i)) }
    val hid = "__graft_having"
    val withHaving = s.having match {
      case None    => grouped.agg(aggCols.head, aggCols.tail: _*)
      case Some(h) =>
        // HAVING may reference aggregates not in the projection list —
        // compute it as a hidden aggregate column, filter, drop
        grouped.agg(aggCols.head, aggCols.tail :+ expr(h).as(hid): _*)
          .filter(col(hid))
    }
    withHaving.select(s.projs.zipWithIndex.map { case (pr, i) =>
      col(hidden(i)).as(projName(pr, i)) }: _*)
  }

  /** split "fn ( args )" into (fn, argText); argText "*" for count(*) */
  private def splitCall(t: String): (String, String) = {
    val i = t.indexOf('(')
    if (i < 0 || !t.endsWith(")")) ("", t)
    else (t.substring(0, i).trim.toLowerCase, t.substring(i + 1, t.length - 1).trim)
  }

  private def plainSpec(w: WinDef): WindowSpec = {
    val part = w.partition.map(expr)
    val ord = w.order.map(o => if (w.orderDesc) expr(o).desc else expr(o))
      .getOrElse(lit(1).asc)
    val base = Window.partitionBy(part: _*).orderBy(ord)
    def loVal(b: Bound): Long = b match {
      case Unbounded     => Window.unboundedPreceding
      case CurrentRow    => 0L
      case Prec(n, open) => -(n - (if (open) 1 else 0))
    }
    val (lo, hi0) = (loVal(w.lo), loVal(w.hi))
    // EXCLUDE CURRENT_ROW on a plain ROWS frame = end the frame one row
    // earlier (physical_op.h:1181-1186)
    val hi = if (w.exclCR && w.isRows) hi0 - 1 else hi0
    if (w.isRows) base.rowsBetween(lo, hi) else base.rangeBetween(lo, hi)
  }

  private val extAggs = Set("sum", "count", "avg", "min", "max",
    "distinct_count", "lag", "at", "first_value", "last_value")

  /** split an argument list at top-level commas */
  private def splitArgs(t: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val b = new StringBuilder
    t.foreach {
      case '(' => depth += 1; b.append('(')
      case ')' => depth -= 1; b.append(')')
      case ',' if depth == 0 => out += b.toString.trim; b.clear()
      case c => b.append(c)
    }
    if (b.nonEmpty) out += b.toString.trim
    out.result()
  }

  /** Extract `fn(args) OVER <w>` sub-expressions (top-level or nested
    * inside scalar calls like `round(sum(v) OVER w, 3)`), compute each
    * as a hidden window column, then evaluate the outer expressions. */
  private def planWindows(spark: SparkSession, s: Select, base: DataFrame,
      scope: Map[String, DataFrame], requestMode: Boolean = false): DataFrame = {
    var counter = 0
    val winExprs = Seq.newBuilder[(String, String, WinDef)]
    def fresh(): String = { counter += 1; s"__graft_w$counter" }
    def resolveWin(ref: Either[String, WinDef]): WinDef = ref match {
      case Left(name) => s.windows.getOrElse(name,
        throw new IllegalArgumentException(s"undefined window '$name'"))
      case Right(w) => w
    }
    def matchingClose(toks: Vector[String], open: Int): Int = {
      var depth = 0; var j = open
      while (j < toks.length) {
        if (toks(j) == "(") depth += 1
        if (toks(j) == ")") { depth -= 1; if (depth == 0) return j }
        j += 1
      }
      throw new IllegalArgumentException("unbalanced parens in projection")
    }
    def rewrite(toks: Vector[String]): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        val isCall = i + 1 < toks.length && toks(i + 1) == "(" &&
          toks(i).headOption.exists(c => c.isLetter || c == '_')
        if (isCall) {
          val close = matchingClose(toks, i + 1)
          if (close + 1 < toks.length && toks(close + 1).equalsIgnoreCase("OVER")) {
            val fnText = toks.slice(i, close + 1).mkString(" ")
            var after = close + 2
            val ref: Either[String, WinDef] =
              if (after < toks.length && toks(after) == "(") {
                val wclose = matchingClose(toks, after)
                val sub = new Parser(toks.slice(after + 1, wclose))
                val w = sub.parseWinDefPublic()
                after = wclose + 1
                Right(w)
              } else { val n = toks(after); after += 1; Left(n) }
            val id = fresh()
            winExprs += ((id, fnText, resolveWin(ref)))
            out += id
            i = after
          } else { out += toks(i); i += 1 }
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }

    val outerTokens: Seq[Vector[String]] = s.projs.map { pr =>
      pr.over match {
        case Some(ref) =>
          val id = fresh()
          winExprs += ((id, pr.exprText, resolveWin(ref)))
          Vector(id)
        case None if pr.hasNestedOver => rewrite(pr.tokens)
        case None => pr.tokens
      }
    }

    val exprs = winExprs.result()
    val used = exprs.map(_._3)
    val unionTables = used.flatMap(_.unions).distinct
    if (unionTables.nonEmpty && used.exists(w => w.unions.nonEmpty &&
        w.unions.toSet != unionTables.toSet))
      throw new IllegalArgumentException(
        "multiple WINDOW UNION lists in one SELECT are unsupported")

    var df = base
    val needsExtended = used.exists(_.isExtended) || requestMode
    if (unionTables.nonEmpty) {
      val sides = unionTables.map(t => resolveRef(spark, t, scope))
      df = df.withColumn(FlagCol, lit(true))
      sides.foreach { side =>
        df = df.unionByName(side.withColumn(FlagCol, lit(false)),
          allowMissingColumns = true)
      }
    }
    // uid is assigned ONCE, after any WINDOW UNION: per-side generators
    // would restart at (partition<<33)+0 and collide across sides, and
    // frameArray relies on uid uniqueness for EXCLUDE CURRENT_ROW,
    // strict-row-order ties, and the (ts, uid) MAXSIZE tie-break
    if (needsExtended) df = df.withColumn(UidCol, monotonically_increasing_id())

    val winCols: Seq[Column] = exprs.map { case (id, fnText, w) =>
      val c: Column =
        if (!w.isExtended && !requestMode) {
          // offset functions reject explicit frames in Spark; `at` is the
          // reference's alias for lag (window_functions_def.cc:252)
          val (fn0, argText) = splitCall(fnText)
          val text = if (fn0 == "at") s"lag ( $argText )" else fnText
          val spec =
            if (fn0 == "lag" || fn0 == "lead" || fn0 == "at") {
              val ord = w.order.map(o => if (w.orderDesc) expr(o).desc else expr(o))
                .getOrElse(lit(1).asc)
              Window.partitionBy(w.partition.map(expr): _*).orderBy(ord)
            } else plainSpec(w)
          expr(text).over(spec)
        } else {
          val (fn, argText) = splitCall(fnText)
          if (!extAggs(fn))
            throw new IllegalArgumentException(
              s"unsupported aggregate '$fn' over an extended window")
          val args = splitArgs(argText)
          val v = if (argText == "*") lit(1L) else expr(args.head)
          val ts = expr(w.order.getOrElse(
            throw new IllegalArgumentException("extended window needs ORDER BY")))
          // ROWS frames over an extended window: a row-count frame is an
          // unbounded range capped to the newest (n+1) at-or-before rows
          // (strict row order makes same-ts peers behave like ROWS)
          val (preceding, rowCap, strict) =
            if (w.isRows) {
              val n = w.lo match {
                case Prec(n0, open) => n0 - (if (open) 1 else 0)
                case Unbounded      => -1L
                case CurrentRow     => 0L
              }
              val frameCap =
                if (n < 0) 0 else (n + (if (w.exclCR) 0 else 1)).toInt
              val cap =
                if (w.maxSize > 0 && frameCap > 0) math.min(w.maxSize, frameCap)
                else math.max(w.maxSize, frameCap)
              (Long.MaxValue / 4, cap, true)
            } else {
              val p = w.lo match {
                case Prec(n, open) => n - (if (open) 1 else 0)
                case Unbounded     => Long.MaxValue / 4
                case CurrentRow    => 0L
              }
              (p, w.maxSize, false)
            }
          val effUnbounded = preceding >= WindowOps.UnboundedMs && rowCap == 0
          val simpleAgg = Set("sum", "count", "avg", "min", "max")(fn)
          if (effUnbounded && simpleAgg) {
            // Scale-safe unbounded frames: a collect_list of the entire
            // per-key history is O(partition^2) memory under a hot key.
            // Simple aggregates decompose into a native running aggregate
            // over STRICTLY-PRIOR rows plus the current row's own value —
            // constant state per row at any scale.
            WindowOps.unboundedAgg(fn, v, ts, col(UidCol),
              w.partition.map(expr),
              excludeCurrentTime = w.exclCT,
              excludeCurrentRow = w.exclCR,
              memberFlag =
                if (w.inw || requestMode)
                  Some(!col(if (requestMode) RequestFlagCol else FlagCol))
                else None)
          } else {
          val arr = WindowOps.frameArray(v, ts, col(UidCol),
            w.partition.map(expr), preceding,
            maxSize = rowCap,
            excludeCurrentTime = w.exclCT,
            excludeCurrentRow = w.exclCR,
            isPrimary =
              if (requestMode) col(RequestFlagCol)
              else if (unionTables.nonEmpty) col(FlagCol) else null,
            instanceNotInWindow = w.inw || requestMode,
            strictRowOrder = strict)
          fn match {
            case "sum"            => WindowOps.aggSum(arr)
            case "count"          => WindowOps.aggCount(arr)
            case "avg"            => WindowOps.aggAvg(arr)
            case "min"            => WindowOps.aggMin(arr)
            case "max"            => WindowOps.aggMax(arr)
            case "distinct_count" => WindowOps.aggDistinctCount(arr)
            case "lag" | "at"     =>
              WindowOps.aggLag(arr, if (args.length > 1) args(1).toInt else 1)
            case "first_value"    => WindowOps.aggFirstValue(arr)
            case "last_value"     => WindowOps.aggLastValue(arr)
          }
          }
        }
      c.as(id)
    }

    var windowed = df.select(col("*") +: winCols: _*)
    if (unionTables.nonEmpty) windowed = windowed.filter(col(FlagCol))
    if (requestMode) windowed = windowed.filter(col(RequestFlagCol))
    windowed.select(s.projs.zip(outerTokens).zipWithIndex.map {
      case ((pr, toks), i) => expr(toks.mkString(" ")).as(projName(pr, i)) }: _*)
  }
}
