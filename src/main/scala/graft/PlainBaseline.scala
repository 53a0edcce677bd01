package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hand-written plain-Spark-SQL formulations of the headline bench
  * queries (BASELINE.md target: graft must be within 2x of these).
  *
  * These deliberately bypass every graft operator/helper: tables are
  * read with a bare `spark.read.parquet` and the queries are native
  * Spark SQL text — what a competent Spark user would write by hand to
  * compute the same thing. `graft.Bench` times both sides with the same
  * full-materialization methodology and reports per-query ratios.
  *
  * Semantic note: the reference's at-or-before tie handling for rows
  * with identical order keys (uid-strict frames) has no native Spark
  * expression; the plain formulations use ANSI RANGE peers + a
  * (ts, event_id) sort for MAXSIZE truncation, which matches graft's
  * output on the synthetic data (asserted in BenchParitySpec).
  */
object PlainBaseline {

  /** Register raw parquet views (no graft Tables normalization beyond
    * the ns→ms cast the data model requires). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach { n =>
        spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(s"pb_$n")
      }
    // events.ts encoding varies by generator run (ns-as-long vs
    // timestamp[us]) — derive the ms order key exactly as a plain user
    // would for whichever type the read gives back.
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val tsCols = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => Seq(
        "CAST((ts - pmod(ts, 1000000)) / 1000000 AS LONG) AS ts_ms",
        "ts AS ts_ns")
      case _ => Seq(
        "CAST((unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 1000)) / 1000 AS LONG) AS ts_ms",
        "unix_micros(CAST(ts AS TIMESTAMP)) * 1000 AS ts_ns")
    }
    ev.selectExpr(Seq("event_id", "user_id", "event_type", "value") ++ tsCols: _*)
      .createOrReplaceTempView("pb_events")
  }

  val sqlText: Map[String, String] = Map(
    "q_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  xd | shiftleft(yd, 1) AS zval
        |FROM (SELECT *, (xc | shiftleft(xc, 1)) & 1431655765 AS xd,
        |             (yc | shiftleft(yc, 1)) & 1431655765 AS yd
        |  FROM (SELECT *, (xb | shiftleft(xb, 2)) & 858993459 AS xc,
        |               (yb | shiftleft(yb, 2)) & 858993459 AS yc
        |    FROM (SELECT *, (xa | shiftleft(xa, 4)) & 252645135 AS xb,
        |                 (ya | shiftleft(ya, 4)) & 252645135 AS yb
        |      FROM (SELECT *, (x | shiftleft(x, 8)) & 16711935 AS xa,
        |                   (y | shiftleft(y, 8)) & 16711935 AS ya
        |        FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |                CAST(l_partkey AS BIGINT) & 65535 AS x,
        |                CAST(l_suppkey AS BIGINT) & 65535 AS y
        |              FROM pb_lineitem) t0) t1) t2) t3) t4""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM pb_lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_window_rows" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS w_sum,
        |  count(value) OVER w AS w_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_window_rows_range" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS r_sum,
        |  count(value) OVER w AS r_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |  RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // identical computation to q_sql_window — measures GraftSql
    // parse/plan overhead against the native SQL path
    "q_sql_window" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS r_sum,
        |  count(value) OVER w AS r_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |  RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_last_join" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  r.last_line, r.last_qty
        |FROM pb_orders o LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber AS last_line, l_quantity AS last_qty
        |  FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |          row_number() OVER (PARTITION BY l_orderkey
        |            ORDER BY l_linenumber DESC, l_quantity DESC,
        |                     l_extendedprice DESC) AS rn
        |        FROM pb_lineitem) t
        |  WHERE rn = 1
        |) r ON o.o_orderkey = r.l_orderkey""".stripMargin,

    // MAXSIZE 5 over 10-minute range: plain Spark has no MAXSIZE, so the
    // hand formulation collects the range frame and slices the newest 5 —
    // the same computation, expressed with native SQL builtins only.
    "q_window_maxsize" ->
      """WITH fr AS (
        |  SELECT event_id,
        |    slice(reverse(array_sort(collect_list(
        |        struct(ts_ms, event_id AS eid, value AS v)) OVER
        |      (PARTITION BY user_id ORDER BY ts_ms
        |       RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW))), 1, 5) AS arr
        |  FROM pb_events)
        |SELECT event_id,
        |  CASE WHEN size(filter(arr, x -> x.v IS NOT NULL)) > 0 THEN
        |    round(aggregate(filter(arr, x -> x.v IS NOT NULL),
        |      CAST(0.0 AS DOUBLE), (a, x) -> a + x.v), 3) END AS m_sum,
        |  CAST(size(filter(arr, x -> x.v IS NOT NULL)) AS LONG) AS m_cnt,
        |  array_min(transform(arr, x -> x.v)) AS m_min,
        |  array_max(transform(arr, x -> x.v)) AS m_max,
        |  CASE WHEN size(filter(arr, x -> x.v IS NOT NULL)) > 0 THEN
        |    round(aggregate(filter(arr, x -> x.v IS NOT NULL),
        |        CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)
        |      / size(filter(arr, x -> x.v IS NOT NULL)), 4) END AS m_avg,
        |  CAST(size(array_distinct(transform(filter(arr, x -> x.v IS NOT NULL),
        |    x -> x.v))) AS LONG) AS m_dc
        |FROM fr""".stripMargin,

    // the reference benchmark shape (BASELINE.md): scalar exprs + one
    // 30d MAXSIZE-100 window x {distinct_count,sum,count,2x case-when
    // count} + LAST JOIN to customer, all in native Spark SQL
    "q_groupby_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM pb_orders GROUP BY o_custkey HAVING count(*) >= 5""".stripMargin,

    // same bigram-LM shape in native Spark SQL (vocab top-20, add-one
    // smoothing, ordered fold per doc)
    "q_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    filter(split(trim(text), '\\s+'), x -> x != '') AS t
        |  FROM pb_documents),
        |tok AS (SELECT doc_id, explode(t) AS w FROM tk),
        |vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w
        |                         ORDER BY c DESC, w LIMIT 20)),
        |vs AS (SELECT CAST(count(*) + 1 AS DOUBLE) AS v FROM vocab),
        |raw AS (
        |  SELECT doc_id, posexplode(arrays_zip(
        |      slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)))
        |  FROM tk WHERE size(t) >= 2),
        |big AS (
        |  SELECT r.doc_id, r.pos,
        |    CASE WHEN v1.w IS NOT NULL THEN r.col.`0` ELSE '<unk>' END AS w1,
        |    CASE WHEN v2.w IS NOT NULL THEN r.col.`1` ELSE '<unk>' END AS w2
        |  FROM raw r
        |  LEFT JOIN vocab v1 ON r.col.`0` = v1.w
        |  LEFT JOIN vocab v2 ON r.col.`1` = v2.w),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
        |terms AS (
        |  SELECT b.doc_id, b.pos,
        |    ln((coalesce(c2.c2, 0) + 1.0D) / (coalesce(c1.c1, 0) + vs.v)) AS lp
        |  FROM big b LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN c1 ON b.w1 = c1.w1 CROSS JOIN vs),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    aggregate(array_sort(collect_list(struct(pos, lp))),
        |      CAST(0.0 AS DOUBLE), (a, x) -> a + x.lp) AS s
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |  round(a.s / a.n_bigrams, 6) AS avg_logprob,
        |  round(exp(-a.s / a.n_bigrams), 4) AS ppl
        |FROM pb_documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,

    // the textbook explode-based banded-MinHash first-seen dedup in
    // native Spark SQL (one row per shingle x permutation)
    "q_dedup_lshseen" ->
      """WITH tk AS (
        |  SELECT doc_id, filter(split(trim(text), '\\s+'), x -> x != '')
        |    AS ws
        |  FROM pb_documents),
        |sh AS (SELECT doc_id,
        |    CASE WHEN size(ws) = 0 THEN array()
        |         WHEN size(ws) < 3 THEN array(array_join(ws, ' '))
        |         ELSE transform(sequence(1, size(ws) - 2),
        |                p -> array_join(slice(ws, p, 3), ' ')) END AS grams
        |  FROM tk),
        |nz AS (SELECT doc_id, filter(grams, g -> g != '') AS t
        |       FROM sh WHERE size(grams) > 0),
        |hv AS (SELECT doc_id,
        |         CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)
        |           AS h0,
        |         CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT)
        |           AS h1
        |       FROM (SELECT doc_id, t FROM nz WHERE size(t) > 0)
        |       LATERAL VIEW explode(t) AS w),
        |ph AS (SELECT doc_id, i,
        |         min(pmod(h0 + i * h1, 4294967291L)) AS s
        |       FROM hv LATERAL VIEW explode(sequence(0, 11)) AS i
        |       GROUP BY doc_id, i),
        |sg AS (SELECT doc_id,
        |         transform(array_sort(collect_list(struct(i, s))),
        |           x -> x.s) AS sig
        |       FROM ph GROUP BY doc_id),
        |b AS (SELECT doc_id, bi AS band,
        |        md5(concat_ws(',', transform(slice(sig, bi * 3 + 1, 3),
        |          x -> CAST(x AS STRING)))) AS bh
        |      FROM sg LATERAL VIEW explode(sequence(0, 3)) AS bi),
        |f AS (SELECT band, bh, min(doc_id) AS first_id FROM b
        |      GROUP BY band, bh),
        |m AS (SELECT b.doc_id, min(first_id) AS matched_id
        |      FROM b JOIN f ON b.band = f.band AND b.bh = f.bh
        |      WHERE first_id < b.doc_id GROUP BY b.doc_id)
        |SELECT d.doc_id, m.matched_id IS NOT NULL AS is_dup, m.matched_id
        |FROM pb_documents d LEFT JOIN m ON d.doc_id = m.doc_id""".stripMargin,

    // same span-dedup shape in native Spark SQL
    "q_dedup_span" ->
      """WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS ws,
        |             trim(text) AS tt
        |           FROM pb_documents),
        |s AS (SELECT doc_id, CAST(st / 16 AS INT) AS span_idx,
        |        array_join(slice(ws, st + 1, 16), ' ') AS span,
        |        doc_id * 1000000 + CAST(st / 16 AS INT) AS ord
        |      FROM (SELECT doc_id, ws, size(ws) AS n,
        |              explode(sequence(0, greatest(size(ws) - 1, 0), 16)) AS st
        |            FROM t WHERE length(tt) > 0)
        |      WHERE st < n),
        |w AS (SELECT md5(span) AS h, min(ord) AS keep_ord, count(*) AS occ
        |      FROM s GROUP BY md5(span)),
        |kept AS (SELECT s.* FROM s JOIN w ON md5(s.span) = w.h
        |         WHERE occ = 1 OR ord = keep_ord),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |          concat_ws(' ', transform(array_sort(
        |            collect_list(struct(span_idx, span))), x -> x.span))
        |            AS text_dedup
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_spans FROM s GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(tot.n_spans, 0) AS n_spans,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  coalesce(agg.text_dedup, '') AS text_dedup
        |FROM pb_documents d
        |LEFT JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    "q_distinct_count" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS dc_cust,
        |  count(*) AS cnt
        |FROM pb_orders GROUP BY o_orderstatus""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM pb_documents GROUP BY md5(text)""".stripMargin,

    // identical regex/arithmetic shapes to TextOps (same IEEE op order,
    // so the floor(q*1e6) long is bit-identical)
    "q_text_stats" ->
      """SELECT doc_id,
        |  size(split(trim(text), '\\s+')) AS n_tokens,
        |  length(regexp_replace(text, '\\s+', '')) AS n_chars_x,
        |  round(CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE)
        |    / size(split(trim(text), '\\s+')), 6) AS avg_wlen,
        |  round(CAST(size(filter(split(trim(text), '\\s+'),
        |      w -> lower(w) IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
        |    / size(split(trim(text), '\\s+')), 6) AS stop_ratio,
        |  CAST(floor((CAST(0.5 AS DOUBLE) * least(
        |      CAST(size(split(trim(text), '\\s+')) AS DOUBLE) / CAST(100.0 AS DOUBLE),
        |      CAST(1.0 AS DOUBLE))
        |    + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      - CAST(size(filter(split(trim(text), '\\s+'),
        |          w -> lower(w) IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
        |        / size(split(trim(text), '\\s+')))
        |    + CAST(0.2 AS DOUBLE) * least(
        |      (CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE)
        |        / size(split(trim(text), '\\s+'))) / CAST(8.0 AS DOUBLE),
        |      CAST(1.0 AS DOUBLE))) * 1e6) AS LONG) AS q_score
        |FROM pb_documents""".stripMargin,

    // 3-day frame over user_id%10 hot keys — the long-window regime
    // (pairs with SparkEntry.benchVariants' MV formulation)
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id, split(trim(text), '\\s+') AS ws
        |  FROM pb_documents)
        |SELECT doc_id, size(ws) AS n_words,
        |  CAST(floor((CAST(1.0 AS DOUBLE)
        |    - CAST(size(array_distinct(ws)) AS DOUBLE) / size(ws)) * 1e6)
        |    AS BIGINT) AS dup_word_f6,
        |  CAST(floor((CASE WHEN size(ws) < 3 THEN CAST(0.0 AS DOUBLE)
        |    ELSE CAST(1.0 AS DOUBLE)
        |      - CAST(size(array_distinct(transform(sequence(1, size(ws) - 2),
        |          i -> array_join(slice(ws, i, 3), ' ')))) AS DOUBLE)
        |        / (size(ws) - 2) END) * 1e6) AS BIGINT) AS dup_3gram_f6
        |FROM w""".stripMargin,

    // same xxhash64 shingle family as the operator, written as plain
    // CTEs: membership outcomes are identical by construction
    "q_decontaminate" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN size(ws) < 3 THEN array(xxhash64(wh))
        |    ELSE array_distinct(transform(sequence(0, size(ws) - 3),
        |      i -> xxhash64(slice(wh, i + 1, 3)))) END AS gs
        |  FROM (SELECT doc_id, ws, transform(ws, w -> xxhash64(w)) AS wh
        |        FROM (SELECT doc_id, split(trim(text), '\\s+') AS ws
        |              FROM pb_documents))),
        |probe AS (SELECT DISTINCT explode(gs) AS g FROM h
        |  WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM
        |  (SELECT doc_id, explode(gs) AS g FROM h WHERE doc_id % 50 <> 0) t
        |  JOIN probe USING (g))
        |SELECT d.doc_id, h2.doc_id IS NOT NULL AS contaminated
        |FROM pb_documents d LEFT JOIN hit h2 ON d.doc_id = h2.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,

    // the Bloom-prefiltered operator races the plain exact 13-gram
    // formulation — the ratio is the prefilter's win over paying the
    // full explode + join for every document
    "q_decontaminate_bloom" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN size(ws) < 13 THEN array(xxhash64(wh))
        |    ELSE array_distinct(transform(sequence(0, size(ws) - 13),
        |      i -> xxhash64(slice(wh, i + 1, 13)))) END AS gs
        |  FROM (SELECT doc_id, ws, transform(ws, w -> xxhash64(w)) AS wh
        |        FROM (SELECT doc_id, split(trim(text), '\\s+') AS ws
        |              FROM pb_documents))),
        |probe AS (SELECT DISTINCT explode(gs) AS g FROM h
        |  WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM
        |  (SELECT doc_id, explode(gs) AS g FROM h WHERE doc_id % 50 <> 0) t
        |  JOIN probe USING (g))
        |SELECT d.doc_id, h2.doc_id IS NOT NULL AS contaminated
        |FROM pb_documents d LEFT JOIN hit h2 ON d.doc_id = h2.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,

    // same formulation a plain user would write (the operator's win is
    // organizational, not a special plan — the ratio should sit ~1.0)
    "q_profile" ->
      """WITH t AS (SELECT lang AS stratum, split(trim(text), '\\s+') AS ws,
        |             length(regexp_replace(text, '\\s+', '')) AS nc,
        |             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
        |           FROM pb_documents),
        |s AS (SELECT stratum, size(ws) AS toks, fp,
        |        CAST(floor((0.5D * least(CAST(size(ws) AS DOUBLE) / 100, 1.0D)
        |          + 0.3D * (1 - CAST(size(filter(ws, w -> lower(w) IN
        |              ('the','a','and','of','to','in','is'))) AS DOUBLE) / size(ws))
        |          + 0.2D * least((CAST(nc AS DOUBLE) / size(ws)) / 8, 1.0D)) * 1000000)
        |          AS BIGINT) AS q6
        |      FROM t)
        |SELECT stratum, count(*) AS n_docs, sum(toks) AS n_tokens,
        |  round(percentile(toks, 0.5D), 6) AS tok_p50,
        |  round(percentile(toks, 0.9D), 6) AS tok_p90,
        |  round(percentile(toks, 0.99D), 6) AS tok_p99,
        |  count(DISTINCT fp) AS n_unique,
        |  sum(CASE WHEN toks < 50 THEN 1L ELSE 0L END) AS n_short,
        |  sum(CASE WHEN q6 >= 500000 THEN 1L ELSE 0L END) AS n_quality
        |FROM s GROUP BY stratum""".stripMargin,

    "q_bm25" ->
      """WITH base AS (SELECT doc_id, split(trim(text), '\\s+') AS ws
        |              FROM pb_documents WHERE doc_id % 100 <> 0),
        |b2 AS (SELECT doc_id, ws, CAST(size(ws) AS DOUBLE) AS dl FROM base),
        |tc AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM (SELECT doc_id, dl, explode(ws) AS term FROM b2)
        |       GROUP BY doc_id, dl, term),
        |dfv AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tc GROUP BY term),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b2),
        |qs AS (SELECT doc_id AS qid,
        |         array_distinct(slice(split(trim(text), '\\s+'), 1, 8)) AS qts
        |       FROM pb_documents WHERE doc_id % 100 = 0),
        |qt AS (SELECT qid, explode(qts) AS term FROM qs),
        |c AS (SELECT qid, tc.doc_id AS doc_id, tc.term AS term,
        |        ln(1.0D + (n_docs - df + 0.5D) / (df + 0.5D)) * tf * (1.2D + 1.0D)
        |          / (tf + 1.2D * (1.0D - 0.75D + 0.75D * dl / avgdl)) AS w
        |      FROM qt JOIN tc USING (term) JOIN dfv USING (term) CROSS JOIN st),
        |s AS (SELECT qid, doc_id,
        |        aggregate(array_sort(collect_list(struct(term, w))),
        |          CAST(0 AS DOUBLE), (a, x) -> a + x.w) AS score
        |      FROM c GROUP BY qid, doc_id)
        |SELECT qid, CAST(rnk AS INT) AS rank, doc_id, round(score, 6) AS score
        |FROM (SELECT qid, doc_id, score, row_number() OVER
        |        (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk FROM s)
        |WHERE rnk <= 5""".stripMargin,

    "q_long_window" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS lw_sum,
        |  count(value) OVER w AS lw_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id % 10 ORDER BY ts_ms
        |  RANGE BETWEEN 259200000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_skew_window" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS sw_sum,
        |  count(value) OVER w AS sw_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |  RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // the direct window over 4 hot keys: each key's whole span sorts
    // and folds inside ONE task — the serialization the skew rewrite
    // exists to break
    "q_skew_window_hot" ->
      """SELECT event_id, round(sum(value) OVER w, 3) AS sw_sum,
        |  count(value) OVER w AS sw_cnt
        |FROM pb_events
        |WINDOW w AS (PARTITION BY user_id % 4 ORDER BY ts_ms
        |  RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // EXCLUDE CURRENT_TIME + newest-5 cap over hot keys (user_id % 10):
    // collect the range frame, drop same-ts non-self rows, slice newest 5
    "q_skew_window_arr" ->
      """WITH fr AS (
        |  SELECT event_id,
        |    slice(reverse(array_sort(filter(
        |      collect_list(struct(ts_ms, event_id AS eid, value AS v)) OVER
        |        (PARTITION BY user_id % 10 ORDER BY ts_ms
        |         RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW),
        |      x -> x.ts_ms <> ts_ms OR x.eid = event_id))), 1, 5) AS arr
        |  FROM pb_events)
        |SELECT event_id,
        |  CASE WHEN size(filter(arr, x -> x.v IS NOT NULL)) > 0 THEN
        |    round(aggregate(filter(arr, x -> x.v IS NOT NULL),
        |      CAST(0.0 AS DOUBLE), (a, x) -> a + x.v), 3) END AS k_sum,
        |  CAST(size(filter(arr, x -> x.v IS NOT NULL)) AS LONG) AS k_cnt,
        |  array_max(transform(arr, x -> x.v)) AS k_max
        |FROM fr""".stripMargin,

    "q_join_window" ->
      """WITH lj AS (
        |  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, r.l_quantity
        |  FROM pb_orders o LEFT JOIN (
        |    SELECT l_orderkey, l_quantity,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_quantity DESC,
        |                 l_extendedprice DESC) AS rn
        |    FROM pb_lineitem) r
        |    ON o.o_orderkey = r.l_orderkey AND r.rn = 1)
        |SELECT o_orderkey, round(sum(l_quantity) OVER w, 3) AS w_qty,
        |  count(l_quantity) OVER w AS w_cnt
        |FROM lj
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    // point-in-time features: history rows in the 10-minute range plus
    // the request row itself (other request rows excluded from frames)
    "q_request_mode" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts_ms, value,
        |    event_id % 97 = 0 AS is_req FROM pb_events),
        |fr AS (
        |  SELECT event_id, is_req,
        |    filter(collect_list(struct(ts_ms, event_id AS eid, value AS v,
        |        is_req AS rq)) OVER
        |      (PARTITION BY user_id ORDER BY ts_ms
        |       RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW),
        |      x -> NOT x.rq OR x.eid = event_id) AS arr
        |  FROM u)
        |SELECT event_id,
        |  CASE WHEN size(filter(arr, x -> x.v IS NOT NULL)) > 0 THEN
        |    round(aggregate(filter(arr, x -> x.v IS NOT NULL),
        |      CAST(0.0 AS DOUBLE), (a, x) -> a + x.v), 3) END AS pit_sum,
        |  CAST(size(filter(arr, x -> x.v IS NOT NULL)) AS LONG) AS pit_cnt
        |FROM fr WHERE is_req""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid,
        |    transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM pb_embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id,
        |    transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM pb_embeddings),
        |s AS (
        |  SELECT q.qid, c.vec_id,
        |    aggregate(zip_with(qe, ce, (x, y) -> x * y),
        |        CAST(0.0 AS DOUBLE), (a, x) -> a + x)
        |      / (sqrt(aggregate(zip_with(qe, qe, (x, y) -> x * y),
        |          CAST(0.0 AS DOUBLE), (a, x) -> a + x))
        |       * sqrt(aggregate(zip_with(ce, ce, (x, y) -> x * y),
        |          CAST(0.0 AS DOUBLE), (a, x) -> a + x))) AS cos
        |  FROM q JOIN c ON c.vec_id <> q.qid)
        |SELECT qid, vec_id, round(cos, 6) AS cos, rnk FROM (
        |  SELECT qid, vec_id, cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vec_id) AS rnk FROM s)
        |WHERE rnk <= 5""".stripMargin,

    "q_vocab" ->
      """WITH w AS (
        |  SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
        |  FROM pb_documents)
        |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM w GROUP BY term ORDER BY tf DESC, term LIMIT 50""".stripMargin,

    "q_tfidf" ->
      """WITH tc AS (
        |  SELECT doc_id, term, count(*) AS cnt
        |  FROM (SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
        |        FROM pb_documents)
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM pb_documents),
        |s AS (
        |  SELECT doc_id, term, cnt * ln(n_docs / df) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt * ln(n_docs / df) DESC, term) AS rn
        |  FROM tc JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, round(score, 6) AS score
        |FROM s WHERE rn <= 3""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS tk,
        |    pmod(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),
        |      ':p14')), 1, 8), 16, 10) AS BIGINT), 8) AS shard
        |  FROM pb_documents),
        |c AS (SELECT doc_id, shard, tk,
        |        sum(tk) OVER (PARTITION BY shard ORDER BY doc_id) AS en
        |      FROM t WHERE tk > 0),
        |s AS (SELECT doc_id, shard, en - tk AS st, en FROM c),
        |g AS (SELECT doc_id, shard, st, en,
        |        explode(sequence(CAST(floor(st / 256) AS BIGINT),
        |          CAST(floor((en - 1) / 256) AS BIGINT))) AS pack_id
        |      FROM s)
        |SELECT doc_id, shard, pack_id,
        |  greatest(st, pack_id * 256) - st AS doc_off,
        |  greatest(st, pack_id * 256) - pack_id * 256 AS pack_off,
        |  least(en, (pack_id + 1) * 256) - greatest(st, pack_id * 256)
        |    AS span_len
        |FROM g""".stripMargin,

    "q_bench_shape" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal
        |  FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        |          row_number() OVER (PARTITION BY c_custkey
        |            ORDER BY c_custkey DESC) AS rn
        |        FROM pb_customer) WHERE rn = 1),
        |fr AS (
        |  SELECT event_id, event_type, value, user_id,
        |    slice(reverse(array_sort(collect_list(
        |        struct(ts_ms, event_id AS eid, value AS v, event_type AS et)) OVER
        |      (PARTITION BY user_id ORDER BY ts_ms
        |       RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW))), 1, 100) AS arr
        |  FROM pb_events)
        |SELECT f.event_id, upper(f.event_type) AS et_up, f.value * 2 AS v2,
        |  c.c_nationkey, round(c.c_acctbal / 100, 4) AS bal_h,
        |  CAST(size(array_distinct(transform(filter(f.arr, x -> x.v IS NOT NULL),
        |    x -> x.v))) AS LONG) AS w_dc,
        |  CASE WHEN size(filter(f.arr, x -> x.v IS NOT NULL)) > 0 THEN
        |    round(aggregate(filter(f.arr, x -> x.v IS NOT NULL),
        |      CAST(0.0 AS DOUBLE), (a, x) -> a + x.v), 3) END AS w_sum,
        |  CAST(size(filter(f.arr, x -> x.v IS NOT NULL)) AS LONG) AS w_cnt,
        |  CAST(size(filter(f.arr, x -> x.et = 'click' AND x.v IS NOT NULL)) AS LONG) AS w_clicks,
        |  CAST(size(filter(f.arr, x -> x.v IS NOT NULL AND x.v > 100)) AS LONG) AS w_big
        |FROM fr f LEFT JOIN cust c ON f.user_id = c.c_custkey""".stripMargin
  )

  /** Plain-DataFrame twins for queries whose shape needs an explicit
    * materialization barrier no SQL text can express (a CTE re-inlines).
    * Same banded-MinHash-LSH pipeline a competent Spark user would
    * write by hand: cache the signature table, equi-join band buckets,
    * distinct the pairs, join signatures back, score with zip_with. */
  val dfBuilders: Map[String, SparkSession => DataFrame] = Map(
    "q_dedup_minhash" -> { spark =>
      import org.apache.spark.sql.functions._
      val k = 24; val bands = 8; val rowsPerBand = 3
      val docs = spark.table("pb_documents")
      val sig = docs.select(col("doc_id"),
          array((0 until k).map { i =>
            array_min(transform(
              array_distinct(transform(split(trim(col("text")), "\\s+"),
                w => xxhash64(w))),
              h => xxhash64(lit(i.toLong), h)))
          }: _*).as("sig"))
        .cache()
      val banded = sig.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))))))
        .toDF("doc_id", "band", "bh")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      sig.count() // materialize the cache before both attach sides
      cand
        .join(sig.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
        .join(sig.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
        .select(col("id1"), col("id2"),
          (size(filter(zip_with(col("sig1"), col("sig2"),
            (x, y) => x === y), b => b)).cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25)
    })

  /** Every query name the baseline can time. */
  def has(name: String): Boolean =
    sqlText.contains(name) || dfBuilders.contains(name)

  /** Run one baseline query. [[registerViews]] must have been called for
    * the target dir beforehand — view registration (parquet footer reads)
    * stays outside any timed region. */
  def query(spark: SparkSession, name: String): DataFrame =
    sqlText.get(name).map(spark.sql)
      .getOrElse(dfBuilders(name)(spark))
}
