package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * query covers, and §7 for the build plan.
  *
  * Oracle-parity conventions (the driver compares against DuckDB running
  * `oracleSql` on the same parquet):
  *  - money/double aggregates go through `floor(x*100 + 0.5)` → BIGINT
  *    ("cents") — floor on IEEE doubles is bit-identical across engines,
  *    unlike sum/avg of raw doubles (summation order differs);
  *  - every query has a deterministic total ORDER BY;
  *  - column names and types are aligned on both sides.
  */
object SparkEntry {

  /** Loads the named tables as temp views + registers graft SQL functions.
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects —
    * read it as long nanos and rebuild a microsecond timestamp (integer
    * division: ns since 2024 overflows double precision). */
  private def prep(spark: SparkSession, dir: String, tables: String*): Unit = {
    Graft.register(spark)
    tables.foreach { t =>
      val df =
        if (t == "events") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$dir/$t.parquet")
            .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        } else spark.read.parquet(s"$dir/$t.parquet")
      df.createOrReplaceTempView(t)
    }
  }

  /** Flagship: reference README's LATERAL VIEW flow over the events stream —
    * jq-extract a typed field from each JSON payload, aggregate per type. */
  def entry(spark: SparkSession): DataFrame = {
    prep(spark, "/root/testdata/sf0.001", "events")
    spark.sql("""
      SELECT e.event_type, count(*) AS n, sum(x.k) AS sum_k
      FROM events e
      LATERAL VIEW jq(e.props, '{k}', 'k:int') x
      GROUP BY e.event_type ORDER BY e.event_type""")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- jq surface (SURVEY §2.1/§2.2) ----------------------------------
    "jq_single_int" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_type, CAST(sum(x.col1) AS BIGINT) AS sum_k, count(*) AS n
        FROM events LATERAL VIEW jq(props, '.k', 'int') x
        GROUP BY event_type ORDER BY event_type""")
    },
    "jq_multi_col" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_id, x.k, x.d, x.s
        FROM events
        LATERAL VIEW jq(props, '{k, d: (.k*2), s: (.k|tostring)}',
                        'k:int', 'd:int', 's:string') x
        ORDER BY event_id""")
    },
    "jq_lateral_view" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_type, count(*) AS n, CAST(sum(x.k) AS BIGINT) AS sum_k
        FROM events LATERAL VIEW jq(props, '{k}', 'k:int') x
        WHERE x.k > 50
        GROUP BY event_type ORDER BY event_type""")
    },
    "jq_array_iterate" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_id, x.col1
        FROM events LATERAL VIEW jq(props, '.k, .k+1, .k+2', 'int') x
        WHERE event_id < 200
        ORDER BY event_id, col1""")
    },
    "jq_error_skip" -> { (s, dir) =>
      prep(s, dir, "events")
      // every 10th payload gets trailing garbage → $error → skipped via empty
      s.sql("""
        SELECT event_type, count(*) AS n, CAST(sum(x.k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                     concat(props, CASE WHEN event_id % 10 = 0 THEN 'x' ELSE '' END) AS p
              FROM events) t
        LATERAL VIEW jq(t.p, 'if $error then empty else {k: .k} end', 'k:int') x
        GROUP BY event_type ORDER BY event_type""")
    },
    "jq_error_substitute" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_type, count(*) AS n, CAST(sum(x.k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                     concat(props, CASE WHEN event_id % 10 = 0 THEN 'x' ELSE '' END) AS p
              FROM events) t
        LATERAL VIEW jq(t.p, 'if $error then {k: -1} else {k: .k} end', 'k:int') x
        GROUP BY event_type ORDER BY event_type""")
    },
    "jq_builtins_text" -> { (s, dir) =>
      prep(s, dir, "documents")
      // jq string builtins over real text (wrapped as JSON via to_json)
      s.sql("""
        SELECT doc_id,
               jq_string(to_json(struct(text)), '.text | ascii_upcase | .[0:20]') AS up20,
               CAST(jq_string(to_json(struct(text)),
                    '.text | split(" ") | map(select(length > 0)) | length') AS BIGINT) AS n_words
        FROM documents ORDER BY doc_id""")
    },
    "jq_extract_all" -> { (s, dir) =>
      prep(s, dir, "events")
      s.sql("""
        SELECT event_id,
               jq_extract_all(props, '.k, (.k*2)') AS vals
        FROM events WHERE event_id < 300 ORDER BY event_id""")
    },
    "jq_events_pipeline" -> { (s, dir) =>
      prep(s, dir, "events")
      // jq extraction feeding a relational pipeline: filter → join-free agg →
      // post-agg jq object construction (round-trips the agg through JSON)
      s.sql("""
        SELECT event_type,
               jq_string(to_json(struct(n, sum_k)), '"n=\\(.n),sum=\\(.sum_k)"') AS packed,
               n, sum_k
        FROM (
          SELECT event_type, count(*) AS n, CAST(sum(x.k) AS BIGINT) AS sum_k
          FROM events LATERAL VIEW jq(props, '{k}', 'k:int') x
          WHERE x.k >= 10 GROUP BY event_type
        ) ORDER BY event_type""")
    },

    // ---- relational core (SURVEY §2.3) ----------------------------------
    "rel_q1_agg" -> { (s, dir) =>
      prep(s, dir, "lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    },
    "rel_q3_join" -> { (s, dir) =>
      prep(s, dir, "customer", "orders", "lineitem")
      s.sql("""
        SELECT o.o_orderkey,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o.o_orderkey
        ORDER BY rev_cents DESC, o_orderkey
        LIMIT 10""")
    },
    "rel_q5_multijoin" -> { (s, dir) =>
      prep(s, dir, "region", "nation", "customer", "orders", "lineitem")
      s.sql("""
        SELECT n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY rev_cents DESC, n_name""")
    },
    "rel_exists_semi" -> { (s, dir) =>
      prep(s, dir, "orders", "lineitem")
      s.sql("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    "rel_not_exists_anti" -> { (s, dir) =>
      prep(s, dir, "orders", "lineitem")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    "rel_window_topn" -> { (s, dir) =>
      prep(s, dir, "customer", "orders")
      s.sql("""
        SELECT c_mktsegment, rn, o_orderkey, price_cents
        FROM (
          SELECT c.c_mktsegment,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                                    ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn,
                 o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        ) WHERE rn <= 3
        ORDER BY c_mktsegment, rn""")
    },
    "rel_distinct_parts" -> { (s, dir) =>
      prep(s, dir, "lineitem")
      s.sql("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    "stream_window_agg" -> { (s, dir) =>
      prep(s, dir, "events")
      // batch-equivalent of the streaming tumbling-window aggregation
      // (graft.streaming uses the same grouping over readStream)
      s.sql("""
        SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY h, event_type""")
    })

  def oracleSql: Map[String, String] = Map(
    "jq_single_int" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "jq_multi_col" ->
      """SELECT event_id, k, k*2 AS d, CAST(k AS VARCHAR) AS s
         FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         ORDER BY event_id""",
    "jq_lateral_view" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         WHERE k > 50 GROUP BY event_type ORDER BY event_type""",
    "jq_array_iterate" ->
      """SELECT event_id, CAST(unnest([k, k+1, k+2]) AS INT) AS col1
         FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         WHERE event_id < 200 ORDER BY event_id, col1""",
    "jq_error_skip" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k, event_id FROM events)
         WHERE event_id % 10 <> 0
         GROUP BY event_type ORDER BY event_type""",
    "jq_error_substitute" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CASE WHEN event_id % 10 = 0 THEN -1 ELSE k END) AS BIGINT) AS sum_k
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k, event_id FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "jq_builtins_text" ->
      """SELECT doc_id, substr(upper(text), 1, 20) AS up20,
                CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_words
         FROM documents ORDER BY doc_id""",
    "jq_extract_all" ->
      """SELECT event_id, [CAST(k AS VARCHAR), CAST(k*2 AS VARCHAR)] AS vals
         FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         WHERE event_id < 300 ORDER BY event_id""",
    "jq_events_pipeline" ->
      """SELECT event_type, 'n=' || n || ',sum=' || sum_k AS packed, n, sum_k
         FROM (SELECT event_type, count(*) AS n,
                      CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
               FROM events
               WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 10
               GROUP BY event_type)
         ORDER BY event_type""",
    "rel_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "rel_q3_join" ->
      """SELECT o.o_orderkey,
                CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         GROUP BY o.o_orderkey
         ORDER BY rev_cents DESC, o_orderkey
         LIMIT 10""",
    "rel_q5_multijoin" ->
      """SELECT n.n_name,
                CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM region r
         JOIN nation n ON n.n_regionkey = r.r_regionkey
         JOIN customer c ON c.c_nationkey = n.n_nationkey
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE r.r_name = 'ASIA'
         GROUP BY n.n_name
         ORDER BY rev_cents DESC, n_name""",
    "rel_exists_semi" ->
      """SELECT o_orderstatus, count(*) AS n
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "rel_not_exists_anti" ->
      """SELECT o_orderpriority, count(*) AS n
         FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "rel_window_topn" ->
      """SELECT c_mktsegment, rn, o_orderkey, price_cents
         FROM (
           SELECT c.c_mktsegment,
                  row_number() OVER (PARTITION BY c.c_mktsegment
                                     ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn,
                  o.o_orderkey,
                  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
           FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
         ) t WHERE rn <= 3
         ORDER BY c_mktsegment, rn""",
    "rel_distinct_parts" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events
         GROUP BY date_trunc('hour', ts), event_type
         ORDER BY h, event_type""")
}
