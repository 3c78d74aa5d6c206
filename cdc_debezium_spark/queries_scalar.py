"""Driver keys for the scalar function surface (SURVEY.md §2.D).

Grounding: the reference's SMT chain exercises regex/string ops (B1),
epoch-µs temporal math (B5), and JSON (de)serialization (A12); the
declared enrichment layer needs the standard remainder. All Spark
built-ins (JVM-side, codegen) — no Python UDFs on this path.

Cross-engine gotchas handled here:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all semantics.
- DuckDB map[key] yields a LIST; index [1] to get the scalar.
- Natural log: Spark F.log == DuckDB ln.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .registry import query
from .sources.catalog import load_table


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           substr(c_name, 1, 8) AS sub8,
           upper(c_name) AS up,
           lower(c_name) AS lo,
           trim(c_name) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           len(string_split(c_name, '#')) AS n_parts,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked,
           length(c_name) AS n_chars,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
             AS title_seg
    FROM customer
    """,
)
def scalar_string(spark, sf_dir):
    """String family (B1 regex routing heritage,
    postgresql-connector.yaml:51-53)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.upper("c_name").alias("up"),
        F.lower("c_name").alias("lo"),
        F.trim("c_name").alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "X").alias("masked"),
        F.length("c_name").alias("n_chars"),
        F.concat(
            F.upper(F.substring("c_mktsegment", 1, 1)),
            F.lower(F.substring("c_mktsegment", 2, 2_000_000)),
        ).alias("title_seg"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT event_id,
           year(ts) AS yr, month(ts) AS mo, day(ts) AS dy, hour(ts) AS hr,
           CAST(ts AS DATE) AS d,
           datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_in,
           CAST(ts AS DATE) + 7 AS d7,
           epoch_us(ts) // 60000000 AS minute_bucket
    FROM events
    """,
)
def scalar_datetime(spark, sf_dir):
    """Date/time family — µs temporal mode heritage
    (postgresql-connector.yaml:49); bucket math stays in integers."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dy"),
        F.hour("ts").alias("hr"),
        F.to_date("ts").alias("d"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("days_in"),
        F.date_add(F.to_date("ts"), 7).alias("d7"),
        F.expr("ts_us div 60000000").alias("minute_bucket"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 + l_tax) * 100 + 0.5) AS BIGINT)
             AS gross_cents,
           CAST(floor(l_quantity) AS BIGINT) AS fl,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
           round(abs(l_discount - 0.05), 4) AS dev,
           round(power(l_quantity, 2), 2) AS qty_sq,
           round(sqrt(l_extendedprice), 4) AS root,
           round(ln(l_extendedprice), 4) AS log_price,
           mod(l_linenumber, 3) AS m3
    FROM lineitem
    """,
)
def scalar_math(spark, sf_dir):
    """Math family — decimal-as-string arithmetic after cast (B5)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # cents trick: pure IEEE ops (mul/add/floor) are bit-identical
        # across engines, unlike round()'s half-up vs half-even at ties
        F.floor(F.col("l_extendedprice") * (1 + F.col("l_tax")) * 100 + 0.5)
        .cast("bigint")
        .alias("gross_cents"),
        F.floor("l_quantity").alias("fl"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("root"),
        F.round(F.log("l_extendedprice"), 4).alias("log_price"),
        F.pmod("l_linenumber", F.lit(3)).alias("m3"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS size_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           (o_orderdate IS NULL) AS missing_date,
           coalesce(NULL, o_orderpriority, 'none') AS prio
    FROM orders
    """,
)
def scalar_conditional(spark, sf_dir):
    """Conditional/null family — delete-rewrite null handling (B3)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.isnull("o_orderdate").alias("missing_date"),
        F.coalesce(F.lit(None), F.col("o_orderpriority"), F.lit("none")).alias("prio"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INT) AS k_int,
           props->>'k' AS k_str,
           (props->>'k' IS NOT NULL) AS has_k,
           CAST(props->>'missing' AS INT) AS k_missing
    FROM events
    """,
)
def scalar_json(spark, sf_dir):
    """JSON family — schemaless wire format (A12,
    prod-resources.yaml:12-13): extraction, typing, absent paths."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@query(
    "scalar_array_map",
    oracle="""
    SELECT event_id,
           round(list_aggregate(list_value(value, value * 2, value * 3), 'sum'), 2)
             AS arr_sum,
           len(list_value(value, value * 2, value * 3)) AS arr_size,
           list_contains(list_value(value, value * 2, value * 3), value * 2)
             AS has_double,
           round(list_value(value, value * 2, value * 3)[2], 2) AS second,
           round(list_aggregate(
             list_transform(list_value(value, value * 2, value * 3), x -> x + 1),
             'sum'), 2) AS arr_sum_plus,
           round(map(['a'], [value])['a'][1], 2) AS m_val
    FROM events
    """,
)
def scalar_array_map(spark, sf_dir):
    """Array/map + higher-order family — MongoDB/doc lane (A3,
    values.yaml:60-61). Higher-order transform/aggregate stay JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array(F.col("value"), F.col("value") * 2, F.col("value") * 3)
    return ev.select(
        "event_id",
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 2).alias("arr_sum"),
        F.size(arr).alias("arr_size"),
        F.array_contains(arr, F.col("value") * 2).alias("has_double"),
        F.round(F.element_at(arr, 2), 2).alias("second"),
        F.round(
            F.aggregate(
                F.transform(arr, lambda x: x + 1), F.lit(0.0), lambda a, x: a + x
            ),
            2,
        ).alias("arr_sum_plus"),
        F.round(
            F.element_at(F.create_map(F.lit("a"), F.col("value")), "a"), 2
        ).alias("m_val"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS md5_name,
           sha256(c_name) AS sha_name,
           length(sha256(c_name)) AS sha_len
    FROM customer
    """,
)
def scalar_hash(spark, sf_dir):
    """Hash family — keyed partitioning is hash-of-PK (A6). xxhash64 /
    crc32 exist Spark-side but have no portable oracle, so the oracle
    pins the portable pair (md5, sha256)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("md5_name"),
        F.sha2("c_name", 256).alias("sha_name"),
        F.length(F.sha2("c_name", 256)).alias("sha_len"),
    )


@query(
    "doc_nested_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n_lines,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def doc_nested_roundtrip(spark, sf_dir):
    """A3/A8 document lane, nested: build the Elasticsearch-style order
    document (header struct + sorted array of line structs, serialized
    with to_json), then SHRED it back (from_json + explode) and
    aggregate. The oracle computes the same aggregate straight from the
    relational tables, so a hash match proves the nest→JSON→shred
    roundtrip is lossless — the semantics the reference's ES sink
    relies on (reference README.md:48, values.yaml:60-61)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"), F.col("l_quantity").alias("qty")
        ).alias("item"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("item")).alias("items")
    )
    orders = load_table(spark, sf_dir, "orders")
    doc = orders.join(nested, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.to_json(F.struct("o_orderkey", "o_orderstatus", "items")).alias("doc")
    )
    shape = (
        "struct<o_orderkey:bigint,o_orderstatus:string,"
        "items:array<struct<ln:int,qty:double>>>"
    )
    shred = doc.select(F.from_json("doc", shape).alias("d"))
    return (
        shred.select(
            F.col("d.o_orderstatus").alias("status"), F.explode("d.items").alias("it")
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("it.qty").cast("bigint").alias("total_qty"),
        )
    )


@query(
    "json_map_explode",
    oracle="""
    SELECT key AS k, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
           min(v) AS min_v, max(v) AS max_v
    FROM (SELECT unnest(json_keys(props)) AS key,
                 json_extract(props, '$.' || unnest(json_keys(props)))::BIGINT AS v
          FROM events)
    GROUP BY key
    """,
)
def json_map_explode(spark, sf_dir):
    """A3 document lane: schemaless JSON payload -> typed map -> rows.

    The MongoDB-style path (reference values.yaml:60-61): no fixed
    struct, parse to map<string,long> and explode — the generic
    document-flattening primitive (SURVEY §2.C C24 + §1.3 map lane).
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS x,
           event_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS INTEGER) AS popcnt
    FROM events
    """,
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise scalar family — mask/flag/xor/shift/popcount (the ops
    behind the engine's own Morton keys, hash mixing, and SimHash bit
    slicing, exposed as a user-facing surface). Narrow codegen pass,
    zero exchanges."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("lo_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ user_id").alias("x"),
        F.expr("shiftleft(event_id, 2)").alias("shl"),
        F.expr("shiftright(event_id, 3)").alias("shr"),
        F.expr("bit_count(event_id)").alias("popcnt"),
    )


@query(
    "scalar_url",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/corpus/' || lang AS path,
           'doc=' || CAST(doc_id AS VARCHAR) || '&lang=' || lang AS query,
           CAST(doc_id AS VARCHAR) AS doc_param,
           'https' AS protocol
    FROM documents
    """,
)
def scalar_url(spark, sf_dir):
    """URL scalar family — parse_url over constructed document URLs
    (the provenance-URL handling every web-corpus pipeline needs:
    host for source-level quality priors, path/query for routing and
    dedup keys). The URL is BUILT from row data then PARSED back with
    Spark's parse_url (HOST/PATH/QUERY/param/PROTOCOL); the oracle
    computes the expected parts relationally, so a hash match proves
    the whole construct→parse chain. Narrow codegen pass — JVM
    builtins, zero exchanges.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("?doc="),
        F.col("doc_id").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("doc")).alias("doc_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "scalar_interval",
    oracle="""
    WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS od
               FROM orders)
    -- day arithmetic uses DATE + int, not INTERVAL n DAY: DuckDB 1.0
    -- miscomputes INTERVAL-day addition on the parquet-scan timestamp
    -- (returns the +3-month value); date+int is correct and matches
    -- Spark's date_add exactly
    SELECT o_orderkey,
           CAST(CAST(od + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS due,
           CAST(CAST(last_day(od) AS DATE) AS VARCHAR) AS month_end,
           CAST(quarter(od) AS INTEGER) AS qtr,
           CAST(week(od) AS INTEGER) AS iso_week,
           CAST(dayofweek(od) + 1 AS INTEGER) AS dow,
           CAST(CAST(od AS DATE) + 90 AS VARCHAR) AS plus_90d
    FROM o
    """,
)
def scalar_interval(spark, sf_dir):
    """Calendar/interval scalar family — month-end billing dates,
    quarter/ISO-week rollup keys, weekday buckets, and day/month
    interval arithmetic (the DW date dimension computed on the fly).
    Engine-exact: calendar arithmetic is integer; Spark dayofweek is
    1=Sunday, DuckDB 0=Sunday — the oracle aligns (+1). Narrow
    codegen pass, zero exchanges."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("string").alias("due"),
        F.last_day(d).cast("string").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.date_add(d, 90).cast("string").alias("plus_90d"),
    )
