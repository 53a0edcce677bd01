package graft.cases

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** One input table of a SQL case: `columns` are "name type" pairs,
  * `rows` hold Boolean / Long (integral) / Double (floating) / String /
  * null cells; `repeat` duplicates the row block. */
case class CaseInput(name: Option[String], columns: Seq[String],
    rows: Seq[Seq[Any]], repeat: Int,
    indexs: Seq[String] = Seq.empty,
    db: Option[String] = None,
    create: Option[String] = None,
    insert: Option[String] = None,
    storage: Option[String] = None)

/** Expected deployment metadata (deploy corpus): the reference's SHOW
  * DEPLOYMENT surface — name plus the request (in) and output (out)
  * schemas as "idx,name,kType,NULL?" strings. */
case class DeployExpect(name: Option[String],
    inColumns: Seq[String], outColumns: Seq[String])

/** Expected index metadata (ddl corpus `expect.idxs`): keys, ts column
  * ("-" when none), rendered ttl ("0min", "100", "10min&&10") and
  * ttlType (kAbsoluteTime | kLatestTime | kAbsAndLat | kAbsOrLat). */
case class IdxExpect(keys: Seq[String], ts: Option[String],
    ttl: Option[String], ttlType: Option[String])

/** Raw exported-file content expectation (out_in corpus `expect.cat`):
  * every line the csv holds, header rows included. */
case class CatExpect(path: String, lines: Seq[String])

/** Expected result: `success = false` marks a must-fail case.
  * `offlineColumns`/`offlineRows` carry the expectation of a case whose
  * final query runs in OFFLINE execute_mode (integration_test/out_in);
  * `offlineInfo` asserts the table's offline Data/Symbolic path after a
  * soft-copy LOAD (id 47). */
case class CaseExpect(success: Boolean, order: Option[String],
    columns: Option[Seq[String]], rows: Option[Seq[Seq[Any]]],
    count: Option[Long],
    deployment: Option[DeployExpect] = None,
    idxs: Option[Seq[IdxExpect]] = None,
    cat: Option[CatExpect] = None,
    offlineColumns: Option[Seq[String]] = None,
    offlineRows: Option[Seq[Seq[Any]]] = None,
    offlineInfo: Option[String] = None)

/** A fully-expanded SQL case (dataProvider variants resolved).
  * `key` is "file:id[variant]" — stable across runs, used for skip
  * lists and reporting. `parameters` (when present) bind the query's
  * `?` placeholders in order (parameterized_query.yaml). */
case class SqlCase(file: String, id: String, desc: String,
    inputs: Seq[CaseInput], sql: String, expect: CaseExpect,
    mode: Set[String], tags: Seq[String], variant: String,
    parameters: Option[CaseInput] = None,
    db: Option[String] = None,
    sqls: Seq[String] = Seq.empty,
    batchRequest: Option[CaseInput] = None,
    longWindow: Option[String] = None,
    tearDown: Seq[String] = Seq.empty) {
  def key: String = s"$file:$id$variant"
}

/** Loader for the reference's YAML SQL-case corpus
  * (reference: cases/function/window/test_window.yaml:18-44 for the
  * schema; hybridse/src/testing/engine_test_base.h:75-100 runs the same
  * files as the reference's correctness authority).
  *
  * Parses with jackson-dataformat-yaml (already on the Spark
  * classpath), expands `dataProvider` cross-products into concrete
  * cases substituting `d[i]` tokens, and resolves per-variant
  * `expectProvider` overrides keyed by the first provider dimension.
  */
object CaseLoader {
  private val mapper = new ObjectMapper(new YAMLFactory)

  private def cell(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()

  private def rows(n: JsonNode): Seq[Seq[Any]] =
    if (n == null || n.isNull) Seq.empty
    else n.elements.asScala.toSeq.map(r => r.elements.asScala.toSeq.map(cell))

  private def strs(n: JsonNode): Seq[String] =
    if (n == null || n.isNull) Seq.empty
    else n.elements.asScala.toSeq.map(_.asText())

  private def opt(n: JsonNode): Option[JsonNode] =
    if (n == null || n.isNull) None else Some(n)

  private def schemaCols(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty) // ",," appears
      .map(_.split("[:\\s]+")) // "c1:int" and the stray "c1 int" form
      .map(p => s"${p(0).trim} ${p(1).trim}")

  private def csvRows(d: String): Seq[Seq[Any]] =
    d.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split(",", -1).toSeq.map { c0 =>
        val c = c0.trim
        if (c.isEmpty || c.equalsIgnoreCase("null")) null else c
      })

  private def parseInput(n: JsonNode, baseDir: String): CaseInput = {
    // an input may alias a shared table definition file
    // (cases/resource/*.yaml `table:` block — window_query.yaml id 0)
    opt(n.get("resource")).foreach { r =>
      val t = mapper.readTree(new java.io.File(baseDir, r.asText()))
        .get("table")
      return CaseInput(
        name = opt(n.get("name")).orElse(opt(t.get("name"))).map(_.asText()),
        columns = schemaCols(t.get("schema").asText()),
        rows = csvRows(t.get("data").asText()),
        repeat = 1,
        indexs = strs(n.get("index")) ++ strs(t.get("index")) ++
          opt(n.get("index")).filter(_.isTextual).map(_.asText()).toSeq ++
          opt(t.get("index")).filter(_.isTextual).map(_.asText()).toSeq)
    }
    // columns: ["c1 string", ...]  OR  schema: "c1:string, c2:int32"
    val columns = opt(n.get("schema")) match {
      case Some(s) => schemaCols(s.asText())
      case None => strs(n.get("columns"))
    }
    // rows: [[...]]  OR  data: "a, 1, 2\nb, 3, 4\n" (CSV block; cells
    // stay strings — the runner's type-driven coercion parses them)
    val rowData = opt(n.get("data")) match {
      case Some(d) => csvRows(d.asText())
      case None => rows(n.get("rows"))
    }
    CaseInput(
      name = opt(n.get("name")).map(_.asText()),
      columns = columns,
      rows = rowData,
      repeat = opt(n.get("repeat")).map(_.asInt()).getOrElse(1),
      indexs = strs(n.get("indexs")) ++
        opt(n.get("index")).filter(_.isTextual).map(_.asText()).toSeq ++
        strs(n.get("index")),
      db = opt(n.get("db")).map(_.asText()),
      create = opt(n.get("create")).map(_.asText()),
      insert = opt(n.get("insert")).map(_.asText()),
      storage = opt(n.get("storage")).map(_.asText()))
  }

  private def parseDeploy(n: JsonNode): DeployExpect =
    DeployExpect(
      name = opt(n.get("name")).map(_.asText()),
      inColumns = strs(n.get("inColumns")),
      outColumns = strs(n.get("outColumns")))

  private def parseIdxs(n: JsonNode): Seq[IdxExpect] =
    n.elements().asScala.toSeq.map { e =>
      IdxExpect(
        keys = strs(e.get("keys")),
        ts = opt(e.get("ts")).map(_.asText()),
        ttl = opt(e.get("ttl")).map(_.asText()),
        ttlType = opt(e.get("ttlType")).map(_.asText()))
    }

  private def parseExpect(n: JsonNode): CaseExpect =
    if (n == null || n.isNull) CaseExpect(success = true, None, None, None, None)
    else CaseExpect(
      success = opt(n.get("success")).forall(_.asBoolean()),
      order = opt(n.get("order")).map(_.asText()),
      columns = opt(n.get("columns")).map(strs)
        .orElse(opt(n.get("schema")).map(s => schemaCols(s.asText())))
        // upstream typo in test_execute_mode.yaml id 5 ("colunms:") —
        // tolerated so the case still asserts its schema + rows
        .orElse(opt(n.get("colunms")).map(strs)),
      rows = opt(n.get("rows")).map(rows)
        .orElse(opt(n.get("data")).map(d => csvRows(d.asText()))),
      count = opt(n.get("count")).map(_.asLong()),
      deployment = opt(n.get("deployment")).map(parseDeploy),
      idxs = opt(n.get("idxs")).map(parseIdxs),
      cat = opt(n.get("cat")).map(cn => CatExpect(
        cn.get("path").asText(), strs(cn.get("lines")))),
      offlineColumns = opt(n.get("offlineColumns")).map(strs),
      offlineRows = opt(n.get("offlineRows")).map(rows),
      offlineInfo = opt(n.get("offlineInfo"))
        .flatMap(oi => opt(oi.get("path"))).map(_.asText()))

  /** expectProvider override: merge non-null fields over the base. */
  private def mergeExpect(base: CaseExpect, n: JsonNode): CaseExpect =
    CaseExpect(
      success = opt(n.get("success")).map(_.asBoolean()).getOrElse(base.success),
      order = opt(n.get("order")).map(_.asText()).orElse(base.order),
      columns = opt(n.get("columns")).map(strs).orElse(base.columns),
      rows = opt(n.get("rows")).map(rows).orElse(base.rows),
      count = opt(n.get("count")).map(_.asLong()).orElse(base.count),
      deployment = opt(n.get("deployment")).map(parseDeploy)
        .orElse(base.deployment),
      idxs = opt(n.get("idxs")).map(parseIdxs).orElse(base.idxs),
      cat = opt(n.get("cat")).map(cn => CatExpect(
        cn.get("path").asText(), strs(cn.get("lines")))).orElse(base.cat))

  /** Load one YAML case file; `fileTag` labels case keys (use the
    * basename without extension). Cases using unsupported schema
    * features (`sqls` lists, input `resource` refs) are dropped. */
  def load(path: String, fileTag: String): Seq[SqlCase] = {
    val out = load0(path, fileTag)
    // a few upstream files repeat an id (test_select_into_load_data
    // .yaml has two id-64 and two id-65 cases) — de-duplicate the keys
    // so skip lists and test names address exactly one case
    val seen = scala.collection.mutable.Map.empty[String, Int]
    out.map { c =>
      val n = seen.getOrElse(c.key, 0); seen(c.key) = n + 1
      if (n == 0) c else c.copy(variant = c.variant + "#" + (n + 1))
    }
  }

  private def load0(path: String, fileTag: String): Seq[SqlCase] = {
    val root = mapper.readTree(new java.io.File(path))
    // resource refs are written relative to the repository root
    // ("cases/resource/simple_t1.yaml")
    val baseDir = path.substring(0, path.indexOf("/cases/") + 1)
    val cases = opt(root.get("cases")).map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
    cases.flatMap { c =>
      val id = opt(c.get("id")).map(_.asText()).getOrElse("?")
      val desc = opt(c.get("desc")).map(_.asText()).getOrElse("")
      val sqlNode = c.get("sql")
      val sqlsList = opt(c.get("sqls")).map(strs).getOrElse(Seq.empty)
      val unsupported =
        ((sqlNode == null || sqlNode.isNull) && sqlsList.isEmpty) ||
          // tables populated via INSERT statement LISTS (udf_query.yaml
          // id 18, map-typed) are out of the loader's scope; singular
          // create/insert inputs are supported
          opt(c.get("inputs")).exists(_.elements.asScala.exists(i =>
            opt(i.get("inserts")).isDefined))
      if (unsupported) Seq.empty
      else {
        val inputs = opt(c.get("inputs"))
          .map(_.elements.asScala.toSeq.map(parseInput(_, baseDir)))
          .getOrElse(Seq.empty)
        val parameters = opt(c.get("parameters")).map(parseInput(_, baseDir))
        val batchRequest = opt(c.get("batch_request"))
          .map(parseInput(_, baseDir))
        val baseSql = opt(sqlNode).map(_.asText().trim.stripSuffix(";"))
          .getOrElse("")
        // `unequalExpect` carries mode-specific expectations where batch
        // and request results legitimately differ (ut_case
        // test_unique_expect id 0: MAXSIZE over out-of-order ingestion —
        // batch sorts by ts, the online buffer sees arrival order).
        // This runner executes the batch plan, so batch_expect applies.
        val baseExpect = Option(c.get("unequalExpect"))
          .flatMap(u => Option(u.get("batch_expect")))
          .map(parseExpect)
          .getOrElse(parseExpect(c.get("expect")))
        val mode = opt(c.get("mode")).map(_.asText())
          .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
        val tags = opt(c.get("tags")).map(strs).getOrElse(Seq.empty)
        val providers: Seq[Seq[String]] = opt(c.get("dataProvider"))
          .map(_.elements.asScala.toSeq.map(strs)).getOrElse(Seq.empty)
        val expectProvider = opt(c.get("expectProvider"))

        def mk(sql: String, sqls: Seq[String], expect: CaseExpect,
            variant: String) =
          SqlCase(fileTag, id, desc, inputs, sql, expect, mode, tags,
            variant, parameters, opt(c.get("db")).map(_.asText()),
            sqls, batchRequest,
            opt(c.get("longWindow")).map(_.asText()),
            tearDown = opt(c.get("tearDown")).map(strs).getOrElse(Seq.empty))

        if (providers.isEmpty) Seq(mk(baseSql, sqlsList, baseExpect, ""))
        else {
          // cross-product of provider dimensions
          val combos = providers.foldLeft(Seq(Seq.empty[Int])) { (acc, dim) =>
            acc.flatMap(prefix => dim.indices.map(prefix :+ _))
          }
          combos.map { combo =>
            def substD(s0: String): String =
              combo.zipWithIndex.foldLeft(s0) {
                case (s, (choice, dim)) =>
                  s.replace(s"d[$dim]", providers(dim)(choice))
              }
            val expect = expectProvider.flatMap(ep =>
              opt(ep.get(combo.head.toString))).map(mergeExpect(baseExpect, _))
              .getOrElse(baseExpect)
            mk(substD(baseSql), sqlsList.map(substD), expect,
              combo.mkString("[", ",", "]"))
          }
        }
      }
    }
  }
}
