"""§2.8 Scalar function families (SURVEY.md).

Reference status: absent (reference ``Main.java:1-7`` only).

Dialect bridging (SURVEY §4c): DuckDB's length/levenshtein/date-part
functions return BIGINT where Spark returns INT → both sides cast to INT;
DuckDB dayofweek is 0=Sunday where Spark is 1=Sunday → oracle adds 1; DuckDB
regexp_replace needs the 'g' flag to match Spark's replace-all; double→int
casts are avoided entirely (Spark truncates, DuckDB rounds).

Everything here is a Catalyst expression inside whole-stage codegen — no
Python crossing, so these run at JVM speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           LOWER(p_brand) AS lo,
           CAST(LENGTH(p_name) AS INT) AS len,
           SUBSTRING(p_name, 1, 5) AS sub,
           REPLACE(p_name, ' ', '_') AS rep,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS pad,
           REVERSE(p_brand) AS rev,
           CONCAT(p_brand, ':', p_type) AS cat,
           TRIM(CONCAT('  ', p_type, ' ')) AS tr
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("int").alias("len"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("pad"),
        F.reverse("p_brand").alias("rev"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("tr"),
    )


@query(
    "fn_string_split",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 50
    """,
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode: one row per token (generator inside codegen)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           (p_type SIMILAR TO '[A-Z]+') AS is_upper_word
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSIX-safe regex subset only (§4c.6); DuckDB needs the 'g' flag to
    match Spark's replace-all semantics."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_type").rlike("^[A-Z]+$").alias("is_upper_word"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, 'Customer#000000042') AS INT) AS dist
    FROM customer WHERE c_custkey < 100
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000042"))
        .cast("int")
        .alias("dist"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAY(o_orderdate) AS INT) AS dd,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 7 AS ship_by,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                AS INT) AS days_to_99,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dd"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 7).alias("ship_by"),
        F.datediff(F.lit("1999-01-01").cast("date"), d)
        .cast("int")
        .alias("days_to_99"),
        F.last_day(d).alias("month_end"),
    )


@query(
    "fn_date_extract",
    oracle="""
    SELECT event_id,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(week(ts) AS INT) AS iso_week
    FROM events
    """,
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect-mapped parts: Spark dayofweek is 1=Sunday, DuckDB 0=Sunday
    (oracle adds 1); week is ISO in both (§4c.4)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.dayofyear("ts").cast("int").alias("doy"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           SQRT(l_extendedprice) AS sq,
           EXP(l_discount) AS ex,
           LN(l_extendedprice) AS ln_price,
           POWER(l_quantity, 2) AS pw,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           ABS(l_discount - 0.05) AS ab,
           CAST(l_orderkey % 7 AS BIGINT) AS md,
           CAST(SIGN(l_discount - 0.05) AS INT) AS sg,
           GREATEST(l_quantity, l_extendedprice / 1000.0) AS gt,
           LEAST(l_quantity, l_extendedprice / 1000.0) AS lt
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family — all raw doubles (identical libm-style results for the
    same inputs; no rounding per the exact-float contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    price_k = F.col("l_extendedprice") / 1000.0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("sq"),
        F.exp("l_discount").alias("ex"),
        F.log("l_extendedprice").alias("ln_price"),
        F.pow("l_quantity", 2).alias("pw"),
        F.floor("l_extendedprice").cast("bigint").alias("fl"),
        F.ceil("l_extendedprice").cast("bigint").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("md"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
        F.greatest(F.col("l_quantity"), price_k).alias("gt"),
        F.least(F.col("l_quantity"), price_k).alias("lt"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st2,
           NULLIF(o_orderpriority, '5-LOW') AS pri,
           CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS sz
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
        ).alias("st2"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pri"),
        F.when(F.col("o_totalprice") > 250000.0, "big")
        .otherwise("small")
        .alias("sz"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_s,
           CAST(o_orderkey AS DOUBLE) AS key_d,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_s,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_s,
           CAST(SUBSTRING(CAST(o_orderkey AS VARCHAR), 1, 3) AS INT) AS key_prefix
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice: int↔string↔double, double→decimal→string, ts→date→string.
    double→int is deliberately absent (Spark truncates, DuckDB rounds)."""
    o = load_table(spark, sf_dir, "orders")
    key_s = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        key_s.alias("key_s"),
        F.col("o_orderkey").cast("double").alias("key_d"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_s"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_s"),
        F.substring(key_s, 1, 3).cast("int").alias("key_prefix"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(len(list_distinct(embedding)) AS INT) AS n_distinct,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(list_max(embedding) AS DOUBLE) AS mx,
           CAST(list_min(embedding) AS DOUBLE) AS mn,
           list_contains(embedding, CAST(0.0 AS FLOAT)) AS has_zero
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics over the 64-dim embedding column; float32 values are
    cast to double (exact) so both engines hash identical scalars."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.size(F.array_distinct("embedding")).cast("int").alias("n_distinct"),
        F.element_at("embedding", 1).cast("double").alias("e1"),
        F.array_max("embedding").cast("double").alias("mx"),
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           COALESCE(list_sum(list_filter(list_transform(embedding,
                    x -> CAST(x AS DOUBLE)), x -> x > 0)), 0.0) AS pos_sum
    FROM embeddings
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order transform/filter/aggregate over arrays — the JVM-side
    (non-UDF) path for vector math; sequential fold matches list_sum."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.aggregate(
            F.filter(
                F.transform("embedding", lambda x: x.cast("double")),
                lambda x: x > 0,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("pos_sum"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INT) AS n_entries,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(list_aggregate(list_transform(json_keys(props),
               kk -> CAST(json_extract_string(props, '$.' || kk) AS BIGINT)),
               'sum') AS BIGINT) AS vals_sum
    FROM events WHERE event_id < 1000
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props → MapType: keys/values/lookup/size, exercised through the
    full MapType surface but PROJECTED TO SCALARS in the output (map
    ordering prevents a stable cross-engine hash of the map itself; the
    scalar projections ARE deterministic, so they carry a full SQL oracle
    via DuckDB's json_keys/json_extract — r4 driver crash fixed, §7.3
    shape contract: no Array/Map/Struct/Binary column in any registered
    output)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        m["k"].alias("k_val"),
        F.size(m).alias("n_entries"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("vals_sum"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id", k.alias("k_str"), k.cast("int").alias("k_int")
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashes (md5/sha256 are engine-portable by definition —
    xxhash64 is not, it's Spark-internal and stays out of oracle paths)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15 AS b_and,
           p_size | 64 AS b_or,
           xor(p_size, 255) AS b_xor,
           p_size << 2 AS b_shl,
           p_size >> 1 AS b_shr
    FROM part
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (dialect note: DuckDB spells XOR as xor(), shifts as
    << / >>; Spark as ^ and shiftleft/shiftright — same two's-complement
    semantics on INT)."""
    p = load_table(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        s.bitwiseAND(15).alias("b_and"),
        s.bitwiseOR(64).alias("b_or"),
        s.bitwiseXOR(255).alias("b_xor"),
        F.shiftleft(s, 2).alias("b_shl"),
        F.shiftright(s, 1).alias("b_shr"),
    )


@query(
    "fn_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(string_split(text, 'zz')) = 0
                       THEN [NULL] ELSE string_split(text, 'zz') END) AS piece
    FROM documents WHERE doc_id < 50
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive as a single NULL row
    (plain explode drops them — the LEFT JOIN vs INNER JOIN of unnesting).
    DuckDB emulation: substitute [NULL] for the empty list."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.explode_outer(F.split("text", "zz")).alias("piece")
    )


@query(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_orderkey, p := o_totalprice).k AS sk,
           struct_pack(k := o_orderkey, p := o_totalprice).p AS sp
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access, flattened back to scalars (struct
    round-trip; scalar output keeps cross-engine hashing trivial)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    s = F.struct(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    return o.select(
        "o_orderkey", s.getField("k").alias("sk"), s.getField("p").alias("sp")
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS bad_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS good_int,
           TRY_CAST(source AS DOUBLE) AS bad_dbl
    FROM documents WHERE doc_id < 100
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST: malformed casts yield NULL instead of failing the job —
    at corpus scale one dirty row must never kill a 4000-task stage."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("bad_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("good_int"),
        F.col("source").try_cast("double").alias("bad_dbl"),
    )


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%s-%08d', o_orderpriority, o_orderkey) AS order_tag,
           printf('%.2f', o_totalprice) AS price_str
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (Spark format_string ≡ DuckDB printf —
    same %-conversions); the display/export formatting primitive."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.format_string(
            "%s-%08d", F.col("o_orderpriority"), F.col("o_orderkey")
        ).alias("order_tag"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT p_partkey,
           ROUND(sin(p_size), 4) AS s,
           ROUND(cos(p_size), 4) AS c,
           ROUND(atan2(p_size, 10), 4) AS a2,
           ROUND(degrees(atan(p_size)), 4) AS deg
    FROM part WHERE p_partkey < 500
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family (ROUND(·,4): libm results can differ in the
    last ulp between JVM and C implementations)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        F.round(F.sin(s), 4).alias("s"),
        F.round(F.cos(s), 4).alias("c"),
        F.round(F.atan2(s, F.lit(10)), 4).alias("a2"),
        F.round(F.degrees(F.atan(s)), 4).alias("deg"),
    )


@query(
    "fn_base64",
    oracle="""
    SELECT doc_id,
           to_base64(ENCODE(lang)) AS b64,
           hex(ENCODE(lang)) AS hex_bytes,
           decode(from_base64(to_base64(ENCODE(lang)))) AS roundtrip
    FROM documents WHERE doc_id < 100
    """,
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64/hex encode round-trip (Spark base64/unbase64/hex ≡ DuckDB
    to_base64/from_base64/hex over UTF-8 bytes) — the binary-safe transport
    encoding for payload columns in JSON/CSV exports. The raw BinaryType
    column is hex-encoded to a string: the driver comparator canonicalizes
    via a pandas sort that cannot hash bytearray cells (r4 driver crash),
    so no registered output may carry BinaryType (§7.3 shape contract)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    raw = F.encode("lang", "utf-8")
    return d.select(
        "doc_id",
        F.base64(raw).alias("b64"),
        F.hex(raw).alias("hex_bytes"),
        F.decode(F.unbase64(F.base64(raw)), "utf-8").alias("roundtrip"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS qlang
    FROM (
      SELECT doc_id,
             'https://' || regexp_replace(lower(source), '[^a-z0-9-]', '', 'g')
               || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (scheme/host/path/query param) — the canonicalization
    primitive for web-corpus pipelines (host-level grouping, tracking-param
    stripping, per-domain dedup). URLs are synthesized deterministically
    from fixture columns; Spark parses with the built-in `parse_url` (JVM
    java.net.URI), the oracle with equivalent anchored regexes — identical
    on well-formed absolute URLs.
    """
    d = load_table(spark, sf_dir, "documents")
    # Hostname-sanitize `source` (lower + strip non-[a-z0-9-]) so parse_url
    # (java.net.URI, strict) and the regex oracle agree even if fixture
    # values ever contain hostname-illegal characters.
    host_part = F.regexp_replace(F.lower(F.col("source")), "[^a-z0-9-]", "")
    url = F.concat(
        F.lit("https://"),
        host_part,
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qlang"),
    )


def _spread_bits_spark(c):
    """Interleave-ready bit spread: 16-bit int -> even bit positions of a
    32-bit word (the classic Morton magic-number cascade)."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def _spread_bits_duck(expr: str) -> str:
    s = expr
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        s = f"(({s}) | (({s}) << {shift})) & {mask}"
    return s


@query(
    "fn_zorder",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey,
             CAST(o_custkey % 65536 AS BIGINT) AS x,
             CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 65536
                  AS BIGINT) AS y
      FROM orders
    )
    SELECT o_orderkey, x, y,
           CAST(({_spread_bits_duck("x")})
                | (({_spread_bits_duck("y")}) << 1) AS BIGINT) AS zval
    FROM k
    """,
)
def fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve value: bit-interleave two 16-bit key
    components into one locality-preserving sort key — the data-layout
    primitive behind multi-dimensional clustering (Delta/Iceberg OPTIMIZE
    ZORDER): rows close in (customer, order-day) space land in the same
    Parquet row groups, so min/max stats prune scans on EITHER dimension.

    Pure integer bit arithmetic (shift/and/or magic-number cascade) —
    bit-identical everywhere, fully JVM-side. To actually lay data out,
    feed this through ``repartitionByRange(zval)`` + sorted write (see
    sink_partitioned / sink_bucketed for the write plumbing).
    """
    o = load_table(spark, sf_dir, "orders")
    k = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("bigint").alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            % 65536
        )
        .cast("bigint")
        .alias("y"),
    )
    z = (
        _spread_bits_spark(F.col("x"))
        .bitwiseOR(F.shiftleft(_spread_bits_spark(F.col("y")), 1))
        .cast("bigint")
    )
    return k.select("o_orderkey", "x", "y", z.alias("zval"))


@query(
    "fn_ip",
    oracle="""
    WITH k AS (
      SELECT o_orderkey,
             ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS ip
      FROM orders
    )
    SELECT o_orderkey,
           CAST(ip >> 24 AS INT) AS o1,
           CAST((ip >> 16) & 255 AS INT) AS o2,
           CAST((ip >> 8) & 255 AS INT) AS o3,
           CAST(ip & 255 AS INT) AS o4,
           CAST(ip >> 24 AS VARCHAR) || '.' ||
             CAST((ip >> 16) & 255 AS VARCHAR) || '.' ||
             CAST((ip >> 8) & 255 AS VARCHAR) || '.' ||
             CAST(ip & 255 AS VARCHAR) AS dotted,
           CAST(ip >> 8 AS BIGINT) AS net24,
           ((ip >> 24) = 10
            OR ((ip >> 24) = 172 AND ((ip >> 16) & 255) BETWEEN 16 AND 31)
            OR ((ip >> 24) = 192 AND ((ip >> 16) & 255) = 168))
             AS is_private
    FROM k
    """,
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parsing and CIDR bucketing — the web-log enrichment primitive:
    octet extraction, dotted-quad formatting, /24 network prefix (the
    per-subnet rollup key), RFC-1918 private-range classification. The
    address is synthesized deterministically (Knuth multiplicative hash of
    the order key mod 2³²) so both engines derive identical inputs.

    Pure 64-bit integer shift/mask arithmetic — bit-identical everywhere,
    fully inside whole-stage codegen. The key is reduced mod 2³¹ BEFORE
    the multiply: (2³¹−1)·2654435761 ≈ 5.7e18 stays inside BIGINT, so the
    synthesis is overflow-free at any scale factor (an unreduced key
    overflows past o_orderkey ≈ 3.5e9, where Spark's non-ANSI mode wraps
    silently while DuckDB raises — divergent engines).
    """
    o = load_table(spark, sf_dir, "orders")
    ip = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    o1 = F.shiftright(ip, 24)
    o2 = F.shiftright(ip, 16).bitwiseAND(F.lit(255))
    o3 = F.shiftright(ip, 8).bitwiseAND(F.lit(255))
    o4 = ip.bitwiseAND(F.lit(255))
    return o.select(
        "o_orderkey",
        o1.cast("int").alias("o1"),
        o2.cast("int").alias("o2"),
        o3.cast("int").alias("o3"),
        o4.cast("int").alias("o4"),
        F.concat_ws(
            ".",
            o1.cast("string"),
            o2.cast("string"),
            o3.cast("string"),
            o4.cast("string"),
        ).alias("dotted"),
        F.shiftright(ip, 8).cast("bigint").alias("net24"),
        (
            (o1 == 10)
            | ((o1 == 172) & o2.between(16, 31))
            | ((o1 == 192) & (o2 == 168))
        ).alias("is_private"),
    )


@query(
    "fn_haversine",
    oracle="""
    WITH p AS (
      SELECT c_custkey,
             CAST((c_custkey * 37) % 180 AS DOUBLE) - 90 AS lat1,
             CAST((c_custkey * 73) % 360 AS DOUBLE) - 180 AS lon1,
             CAST((c_custkey * 53) % 180 AS DOUBLE) - 90 AS lat2,
             CAST((c_custkey * 89) % 360 AS DOUBLE) - 180 AS lon2
      FROM customer
    )
    SELECT c_custkey, lat1, lon1, lat2, lon2,
           ROUND(2 * 6371.0 * ASIN(SQRT(
             POW(SIN(RADIANS(lat2 - lat1) / 2), 2)
             + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
               * POW(SIN(RADIANS(lon2 - lon1) / 2), 2))), 4) AS dist_km
    FROM p
    """,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance in km between two coordinate
    pairs — the geo-enrichment primitive (store-to-customer distance,
    geofence checks). Coordinates are synthesized deterministically from
    the key so both engines compute from identical doubles; the formula
    is built with the same expression shape on both sides and ROUNDs at 4
    (irrational trig output, exact.py rule 4).

    Pure JVM math inside whole-stage codegen — no shuffle, no Python.
    """
    c = load_table(spark, sf_dir, "customer")
    p = c.select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 180).cast("double") - 90).alias("lat1"),
        (((F.col("c_custkey") * 73) % 360).cast("double") - 180).alias("lon1"),
        (((F.col("c_custkey") * 53) % 180).cast("double") - 90).alias("lat2"),
        (((F.col("c_custkey") * 89) % 360).cast("double") - 180).alias("lon2"),
    )
    dlat = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlon = F.radians(F.col("lon2") - F.col("lon1")) / 2
    h = F.pow(F.sin(dlat), 2) + F.cos(F.radians("lat1")) * F.cos(
        F.radians("lat2")
    ) * F.pow(F.sin(dlon), 2)
    return p.select(
        "c_custkey",
        "lat1",
        "lon1",
        "lat2",
        "lon2",
        F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 4).alias("dist_km"),
    )


@query(
    "fn_uuid5",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('luxor:doc:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
             || '5' || substr(hx, 14, 3) || '-'
             || '8' || substr(hx, 18, 3) || '-' || substr(hx, 21, 12)
             AS stable_id
    FROM h
    """,
)
def fn_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUID minting (v5-style: namespace + name →
    md5 → UUID layout with version/variant nibbles pinned) — the stable
    row-identity primitive for pipelines: the same document gets the same
    id on every run, every engine, every retry, unlike uuid()/random ids
    that break idempotent re-processing and cross-run joins.

    Pure string/hash expressions inside codegen — no shuffle, no state.
    """
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("luxor:doc:"), F.col("doc_id").cast("string")))
    stable = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.concat(F.lit("5"), F.substring(hx, 14, 3)),
        F.concat(F.lit("8"), F.substring(hx, 18, 3)),
        F.substring(hx, 21, 12),
    )
    return d.select("doc_id", stable.alias("stable_id"))


def _luhn_terms_duck() -> str:
    # pan has 16 fixed digit positions; from the right, double every 2nd.
    terms = []
    for i in range(1, 17):
        d = f"CAST(substr(pan, {i}, 1) AS INT)"
        if (16 - i) % 2 == 1:  # doubled positions
            terms.append(f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


@query(
    "fn_luhn",
    oracle=f"""
    WITH p AS (
      SELECT o_orderkey,
             lpad(CAST(((o_orderkey % 2147483648) * 2654435761)
                       % 10000000000000000
                       AS VARCHAR), 16, '0') AS pan
      FROM orders
    )
    SELECT o_orderkey, pan,
           CAST(({_luhn_terms_duck()}) AS INT) AS luhn_sum,
           (({_luhn_terms_duck()}) % 10 = 0) AS is_valid
    FROM p
    """,
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation over synthesized 16-digit account numbers
    — the detector behind credit-card/IMEI PII scanning (a 16-digit
    string is only reportable PII if its Luhn check passes; validating
    first cuts false positives by ~10×, complementing `llm_pii_scrub`'s
    pattern-only matching).

    The mod-10 double-every-second-digit sum unrolls to 16 fixed digit
    expressions — pure integer arithmetic in whole-stage codegen,
    bit-identical in both engines. The key is reduced mod 2³¹ before the
    multiply so the product never exceeds BIGINT (see fn_ip) — without it
    the synthesis diverges past o_orderkey ≈ 3.5e9 (Spark wraps, DuckDB
    raises).
    """
    o = load_table(spark, sf_dir, "orders")
    pan = F.lpad(
        (
            ((F.col("o_orderkey") % 2147483648) * 2654435761)
            % 10000000000000000
        ).cast("string"),
        16,
        "0",
    )
    p = o.select("o_orderkey", pan.alias("pan"))
    total = None
    for i in range(1, 17):
        d = F.substring("pan", i, 1).cast("int")
        if (16 - i) % 2 == 1:
            term = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        else:
            term = d
        total = term if total is None else total + term
    return p.select(
        "o_orderkey",
        "pan",
        total.cast("int").alias("luhn_sum"),
        ((total % 10) == 0).alias("is_valid"),
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus_3mo,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 45 DAY AS DATE)
             AS minus_45d,
           CAST(date_diff('month', CAST(o_orderdate AS DATE),
                          DATE '2000-01-01') AS INT) AS months_to_y2k,
           make_date(CAST(YEAR(o_orderdate) AS INT), 12, 31) AS year_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          make_date(CAST(YEAR(o_orderdate) AS INT), 12, 31))
                AS INT) AS days_left_in_year
    FROM orders
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: month/day offsets, whole-month
    differences, and component-wise date construction — the billing /
    fiscal-period family (§2.8 date coverage beyond extraction).

    Dialect note: Spark's months_between returns fractional months — the
    oracle's date_diff('month') counts month-boundary crossings, so the
    Spark side reproduces that boundary-count semantic from (year, month)
    components instead (exact integers, no float compare).
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    months_to_y2k = (
        (2000 - F.year(d)) * 12 + (1 - F.month(d))
    ).cast("int")
    year_end = F.make_date(F.year(d), F.lit(12), F.lit(31))
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3mo"),
        F.date_sub(d, 45).alias("minus_45d"),
        months_to_y2k.alias("months_to_y2k"),
        year_end.alias("year_end"),
        F.datediff(year_end, d).cast("int").alias("days_left_in_year"),
    )
