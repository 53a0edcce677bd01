package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL/DML surface: CREATE TABLE / INSERT / DELETE / TRUNCATE
  * (reference: physical_op.h:1917 CreateTable, :1935 Insert, :1895
  * Delete; docs/en/openmldb_sql/ddl/CREATE_TABLE_STATEMENT.md,
  * dml/INSERT_STATEMENT.md, dml/DELETE_STATEMENT.md).
  *
  * Tables are session temp views over DataFrames; INSERT unions and
  * re-registers, DELETE re-registers the anti-filter — the standard
  * immutable-snapshot formulation (a production deployment points these
  * at Delta/Iceberg tables where INSERT/DELETE are native; the API here
  * is the engine-level contract). Schema validation on INSERT mirrors
  * the reference's strict column check.
  */
object GraftCatalog {

  /** Quote a view name for parser-bound catalog APIs when it contains
    * characters an unquoted identifier cannot (back-quoted source
    * identifiers like aa-bb). */
  private def q(n: String): String =
    if (n.matches("[A-Za-z_][\\w]*")) n
    else "`" + n.replace("`", "``") + "`"

  /** CREATE TABLE name (schema): registers an empty table. Any delta
    * blocks pinned for a PREVIOUS incarnation of the name free now —
    * the old view is gone, nothing can read them. */
  def createTable(spark: SparkSession, name: String, schema: StructType): Unit = {
    freePinnedDeltas(spark, name)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .createOrReplaceTempView(q(name))
  }

  /** Unpersist the insertIgnore delta blocks pinned for `name` (used
    * when the table is dropped/truncated/re-created — derived handles
    * are invalid after that anyway). */
  def freePinnedDeltas(spark: SparkSession, name: String): Unit = {
    val ids = drainPinnedDeltas(name)
    if (ids.nonEmpty)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (ids.contains(id)) rdd.unpersist(false)
      }
    // also drop any streaming-write compaction generations pinned for
    // the name — a dropped table's final two localCheckpoint
    // generations would otherwise stay persisted forever
    graft.sources.GraftSource.releaseCompactState(spark, name)
  }

  /** INSERT INTO name SELECT ...: schema-checked append. */
  def insertInto(spark: SparkSession, name: String, rows: DataFrame): Unit = {
    val cur = spark.table(q(name))
    require(rows.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      cur.schema.fields.map(f => (f.name, f.dataType))),
      s"INSERT schema mismatch for $name: ${rows.schema.simpleString} " +
        s"vs ${cur.schema.simpleString}")
    cur.unionByName(rows).createOrReplaceTempView(q(name))
  }

  /** INSERT INTO name VALUES (...): literal rows against the declared
    * schema. */
  def insertValues(spark: SparkSession, name: String, rows: Seq[Row]): Unit = {
    val schema = spark.table(q(name)).schema
    insertInto(spark, name,
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
  }

  /** INSERT OR IGNORE / LOAD DATA put_if_absent: append only rows not
    * already present (full-row null-safe equality — the reference's
    * "ignoring data that already exists in the table",
    * dml/INSERT_STATEMENT.md:18; LOAD_DATA_STATEMENT.md put_if_absent).
    * EqualNullSafe conjunctions plan as hash-join keys, so the
    * dedup is one shuffle join, not a cross product. */
  def insertIgnore(spark: SparkSession, name: String, rows: DataFrame): Unit = {
    val cur = spark.table(q(name))
    require(rows.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      cur.schema.fields.map(f => (f.name, f.dataType))),
      s"INSERT schema mismatch for $name: ${rows.schema.simpleString} " +
        s"vs ${cur.schema.simpleString}")
    // Materialize the delta so the stored view references `cur` ONCE:
    // view = cur ∪ checkpoint(rows ⟕̸ cur). The lazy formulation
    // cur ∪ (rows anti-join cur) references cur TWICE, doubling the
    // plan per insert — 2^k leaf re-executions after k chained INSERT
    // OR IGNOREs (found by the r17 sf1 streaming soak: the 16-epoch
    // putIfAbsent chain's compaction ran 45+ min at 1 core; with the
    // delta pinned it is seconds). The eager job is bounded by one
    // anti-join scan of the current table per insert — the linear
    // cost full-row dedup without an index fundamentally pays. The
    // pinned delta blocks are drained into the streaming sink's
    // generational free at the next epoch compaction.
    val fresh = rows.join(cur,
      rows.columns.map(c => rows(c) <=> cur(c)).reduce(_ && _), "left_anti")
      .localCheckpoint(true)
    val ids = fresh.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
    pinnedDeltas.updateWith(name)(s => Some(s.getOrElse(Set.empty) ++ ids))
    cur.unionByName(fresh).createOrReplaceTempView(q(name))
  }

  // local-checkpoint block ids pinned by insertIgnore deltas, per view
  // name — drained by GraftWrites.compactIfDue so superseded delta
  // blocks free one compaction cycle after the snapshot replaces them
  private val pinnedDeltas =
    scala.collection.concurrent.TrieMap.empty[String, Set[Int]]

  /** Remove and return the delta block ids pinned for `name` (the
    * streaming sink's epoch compaction folds them into its deferred
    * free; for batch INSERT OR IGNORE flows with no compaction the
    * blocks simply ARE the table's resident data). */
  def drainPinnedDeltas(name: String): Set[Int] =
    pinnedDeltas.remove(name).getOrElse(Set.empty)

  /** DELETE FROM name WHERE cond: anti-filter rewrite. */
  def delete(spark: SparkSession, name: String, cond: Column): Unit =
    spark.table(q(name)).filter(!cond || cond.isNull)
      .createOrReplaceTempView(q(name))

  /** TRUNCATE TABLE name. */
  def truncate(spark: SparkSession, name: String): Unit =
    createTable(spark, name, spark.table(q(name)).schema)
}
