package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sql.GraftSql

/** HTTP serving shim over the deployment registry — the engine-side
  * counterpart of the reference's apiserver
  * (src/apiserver/api_server_impl.cc): POST a JSON request row (or
  * batch) at a deployment and get the deployment's features back.
  *
  * Routes (reference route table, api_server_impl.cc:142,451-458,624):
  *   POST /dbs/{db}/deployments/{name}   body: {"input": [[...]|{...}]}
  *   POST /dbs/{db}/procedures/{name}    (a DEPLOY is an SP there too)
  *   GET  /dbs/{db}/deployments/{name}   → name + body SQL
  * Response envelope: {"code":0,"msg":"ok","data":{"data":[[...]]}}
  * (code -1 + msg on any error). Input rows are positional arrays or
  * column-name maps, typed by the deployment's request schema; set
  * "need_schema": true for an output-schema echo and
  * "write_nan_and_inf_null": true to null out NaN/Inf doubles — the
  * same request options the reference accepts.
  *
  * This is a thin I/O adapter: each request builds a small request
  * DataFrame and runs the SAME [[GraftSql.requestMode]] plan CALL
  * uses, so REST answers are CALL answers by construction (asserted in
  * ApiServerSpec). A production deployment would front many executors
  * with any HTTP fleet; the engine contract is this request/response
  * mapping, not the socket fabric — hence the JDK built-in server and
  * no connection tuning.
  */
object ApiServer {

  private val M = new ObjectMapper()

  final class Handle private[ApiServer] (server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Start serving the session's deployments on `port` (0 = ephemeral;
    * read the actual one off the returned handle). */
  def start(spark: SparkSession, port: Int = 0): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(spark, ex))
    server.setExecutor(null) // caller thread per exchange; spec-scale
    server.start()
    new Handle(server)
  }

  private val Route =
    "/dbs/([^/]+)/(deployments|procedures)/([^/]+)".r

  private def handle(spark: SparkSession, ex: HttpExchange): Unit = {
    val reply =
      try {
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("POST", Route(_, _, name)) =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            execute(spark, name, body)
          case ("GET", Route(_, _, name)) =>
            val sql = GraftSql.callableBody(spark, name).getOrElse(
              throw new IllegalArgumentException(
                s"no deployment or procedure named '$name'"))
            val data = M.createObjectNode()
            data.put("name", name)
            data.put("sql", sql)
            envelope(0, "ok", Some(data))
          case (m, p) =>
            envelope(-1, s"unsupported route: $m $p", None)
        }
      } catch {
        case e: Throwable =>
          envelope(-1, Option(e.getMessage).getOrElse(e.getClass.getName),
            None)
      }
    val bytes = reply.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def envelope(code: Int, msg: String,
      data: Option[JsonNode]): String = {
    val root = M.createObjectNode()
    root.put("code", code)
    root.put("msg", msg)
    data.foreach(root.set[ObjectNode]("data", _))
    M.writeValueAsString(root)
  }

  /** Run one POST body against a deployment: parse, type the input
    * rows by the request schema, request-mode them, render. */
  private def execute(spark: SparkSession, name: String,
      body: String): String = {
    val bodySql = GraftSql.callableBody(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"no deployment or procedure named '$name'"))
    val doc = M.readTree(body)
    val input = doc.get("input")
    if (input == null || !input.isArray || input.isEmpty)
      throw new IllegalArgumentException("Field input is invalid")
    val nanNull = Option(doc.get("write_nan_and_inf_null"))
      .exists(_.asBoolean(false))
    val needSchema = Option(doc.get("need_schema"))
      .exists(_.asBoolean(false))

    val schema = GraftSql.requestSchemaFor(spark, name)
    val rows = (0 until input.size()).map { i =>
      val r = input.get(i)
      val vals: Seq[Any] =
        if (r.isArray) {
          if (r.size() != schema.fields.length)
            throw new IllegalArgumentException(
              s"Invalid input data size in row $i")
          schema.fields.toSeq.zipWithIndex.map { case (f, j) =>
            coerce(r.get(j), f.dataType, f.name)
          }
        } else if (r.isObject) {
          schema.fields.toSeq.map(f => coerce(r.get(f.name), f.dataType,
            f.name))
        } else throw new IllegalArgumentException(
          s"Must be array or map, row $i")
      Row.fromSeq(vals)
    }
    val reqDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
    val out = GraftSql.requestMode(spark, bodySql, reqDf)
    val collected = out.collect()

    val data = M.createObjectNode()
    val arr = data.putArray("data")
    collected.foreach(r => arr.add(renderRow(r, out.schema, nanNull)))
    if (needSchema) {
      val sch = data.putArray("schema")
      out.schema.fields.foreach { f =>
        val fo = M.createObjectNode()
        fo.put("name", f.name)
        fo.put("type", wireType(f.dataType))
        sch.add(fo)
      }
    }
    // the reference always carries common-column data (empty when the
    // deployment declares none — ours never do; constants inline)
    data.putArray("common_cols_data")
    envelope(0, "ok", Some(data))
  }

  /** Reference wire type names (openmldb type system, not Spark's) —
    * cases/restful expects int16/int32/int64 etc. */
  private def wireType(dt: DataType): String = dt match {
    case ShortType     => "int16"
    case IntegerType   => "int32"
    case LongType      => "int64"
    case FloatType     => "float"
    case DoubleType    => "double"
    case StringType    => "string"
    case BooleanType   => "bool"
    case TimestampType => "timestamp"
    case DateType      => "date"
    case other         => other.simpleString
  }

  /** JSON value → Spark external row value for `dt` (the subset of
    * types a request table carries). */
  private def coerce(v: JsonNode, dt: DataType, field: String): Any = {
    if (v == null || v.isNull) return null
    dt match {
      case StringType  => v.asText()
      case BooleanType => v.asBoolean()
      case IntegerType => v.asInt()
      case ShortType   => v.asInt().toShort
      case LongType    => v.asLong()
      case FloatType   => v.asDouble().toFloat
      case DoubleType  => v.asDouble()
      case TimestampType =>
        // millis epoch (the reference's JSON timestamp form) or ISO text
        if (v.isNumber) new java.sql.Timestamp(v.asLong())
        else java.sql.Timestamp.valueOf(v.asText().replace('T', ' '))
      case DateType =>
        java.sql.Date.valueOf(v.asText())
      case other => throw new IllegalArgumentException(
        s"unsupported request column type ${other.simpleString} ($field)")
    }
  }

  private def renderRow(r: Row, schema: StructType,
      nanNull: Boolean): ArrayNode = {
    val a = M.createArrayNode()
    schema.fields.toSeq.zipWithIndex.foreach { case (f, i) =>
      if (r.isNullAt(i)) { a.addNull(); () }
      else f.dataType match {
        case StringType  => a.add(r.getString(i))
        case BooleanType => a.add(r.getBoolean(i))
        case IntegerType => a.add(r.getInt(i))
        case ShortType   => a.add(r.getShort(i).toInt)
        case LongType    => a.add(r.getLong(i))
        case FloatType =>
          val d = r.getFloat(i).toDouble
          if (nanNull && (d.isNaN || d.isInfinite)) a.addNull() else a.add(d)
        case DoubleType =>
          val d = r.getDouble(i)
          if (nanNull && (d.isNaN || d.isInfinite)) a.addNull() else a.add(d)
        case TimestampType =>
          a.add(r.getTimestamp(i).getTime)
        case DateType =>
          // reference wire format: unpadded y-M-d ("2020-5-1",
          // json_helper / restful corpus expectations)
          val ld = r.getDate(i).toLocalDate
          a.add(s"${ld.getYear}-${ld.getMonthValue}-${ld.getDayOfMonth}")
        case DecimalType() => a.add(r.getDecimal(i))
        case _ => a.add(String.valueOf(r.get(i)))
      }
    }
    a
  }
}
