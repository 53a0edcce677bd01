package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Per-request history pruning predicate for the compiled serving
  * template (graft.sql.GraftSql.serveRequest).
  *
  * The template's history-pruning used to be a broadcast key join
  * against the request relation — value-independent (reusable across
  * requests), but each distinct PARTITION BY key list paid ONE Spark
  * job per request to build its broadcast (SERVING_BENCH_r18: 2 prune
  * jobs + 1 main job per request; the reference's tablet does this
  * prune as a driver-free skiplist seek, src/storage/mem_table.cc).
  *
  * This expression removes those jobs: the template plans a Filter
  * over `ServeKeyMembership(keyCols, listIdx, keySet = None)`; at
  * request time the serving layer computes each list's key-tuple set
  * from the LITERAL request rows on the driver (no job — the rows are
  * already in hand) and transform-copies the prepared plan injecting
  * the sets. Pruning then rides the main job's scan: exactly one
  * Spark job per request.
  *
  * Semantics match the replaced join exactly: null-safe tuple
  * membership (`<=>` per column — a null-keyed request keeps
  * null-keyed history in its frames). The serving layer only routes
  * atomic non-floating key types here (UTF8String/boxed-integral
  * equality is value-based; floats would diverge on -0.0 and exotic
  * types on reference equality) — other key shapes keep the broadcast
  * key join.
  *
  * An UNSUBSTITUTED instance (keySet = None) evaluates to true: a
  * template that somehow executes without injection serves the
  * unpruned history — correct, just slower. Never wrong.
  */
case class ServeKeyMembership(children: Seq[Expression], listIdx: Int,
    keySet: Option[java.util.HashSet[Any]] = None)
    extends Expression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = keySet match {
    case None => true
    case Some(s) =>
      if (children.length == 1) s.contains(children.head.eval(input))
      else {
        val arr = new Array[Any](children.length)
        var i = 0
        while (i < children.length) {
          arr(i) = children(i).eval(input); i += 1
        }
        s.contains(java.util.Arrays.asList(arr: _*))
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "serve_key_member"
}

object ServeKeyPrune {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Column face: membership of `keys`' tuple in request list `idx`
    * (set injected per request by the serving layer). */
  def member(keys: Seq[Column], idx: Int): Column =
    CatalystBridge.column(
      ServeKeyMembership(keys.map(CatalystBridge.expression), idx))

  /** One row's key tuple at `fields` ((ordinal, type) pairs) —
    * single-key lists use the raw internal value, multi-key lists a
    * List wrapper: the same shapes [[ServeKeyMembership.eval]] probes
    * and the serving history index stores. */
  def keyOf(r: InternalRow, fields: Seq[(Int, DataType)]): Any =
    if (fields.length == 1) {
      val (o, t) = fields.head
      if (r.isNullAt(o)) null else r.get(o, t)
    } else {
      val arr = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        val (o, t) = fields(i)
        arr(i) = if (r.isNullAt(o)) null else r.get(o, t)
        i += 1
      }
      java.util.Arrays.asList(arr: _*)
    }

  /** Build one list's key-tuple set from literal request rows —
    * driver-side, no Spark job. */
  def keySetOf(rows: Seq[InternalRow],
      fields: Seq[(Int, DataType)]): java.util.HashSet[Any] = {
    val s = new java.util.HashSet[Any]()
    rows.foreach(r => s.add(keyOf(r, fields)))
    s
  }
}
