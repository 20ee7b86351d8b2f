"""DuckDB oracle SQL — one ANSI statement per query in ``queries.py``.

Same aliases, same rounding, same deterministic arithmetic (minhash/simhash
parameters are interpolated from the single source of truth in
``operators/dedup.py``), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from geomesa_cassandra_tools_spark.functions.text import FINGERPRINT_MOD, STOPWORDS
from geomesa_cassandra_tools_spark.operators.dedup import MINHASH_PRIME, minhash_params

# Shared CTE: distinct (doc_id, 3-gram shingle) pairs — mirrors
# operators/dedup.py::shingle_sets.
_SHINGLES_CTE = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
  shx AS (SELECT doc_id, l, unnest(range(1, len(l)-1)) AS i FROM toks WHERE len(l) >= 3),
  sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle FROM shx)
"""

_VOCAB_CTE = """
  vocab AS (
    SELECT shingle, row_number() OVER (ORDER BY shingle) - 1 AS tid
    FROM (SELECT DISTINCT shingle FROM sh)
  ),
  sid AS (SELECT doc_id, tid FROM sh JOIN vocab USING (shingle))
"""


def _minhash_select(k: int = 16) -> str:
    terms = [
        f"min(({a} * tid + {b}) % {MINHASH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return ",\n           ".join(terms)


def _bands_union(bands: int = 8, rows: int = 2) -> str:
    parts = []
    for bi in range(bands):
        sig = " || ',' || ".join(
            f"CAST(h{bi * rows + r} AS VARCHAR)" for r in range(rows)
        )
        parts.append(f"SELECT doc_id, {bi} AS band, {sig} AS sig FROM sigs")
    return "\n    UNION ALL\n    ".join(parts)


def _simhash_sql(bits: int = 16) -> str:
    (a, b) = minhash_params(1)[0]
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    packed = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits)
    )
    return f"""
WITH {_SHINGLES_CTE}, {_VOCAB_CTE},
  hashes AS (SELECT doc_id, ({a} * tid + {b}) % {MINHASH_PRIME} AS h FROM sid),
  votes AS (SELECT doc_id, {votes} FROM hashes GROUP BY doc_id)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes
"""


_STOPWORD_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01'
GROUP BY l_returnflag, l_linestatus
""",
    "q02_revenue_by_nation": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT c_custkey) AS n_customers
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "q03_top_orders": """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    "q04_order_priorities": """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
    "q05_customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    "q06_open_order_customers": """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
GROUP BY c_mktsegment
""",
    "q07_nation_balance_health": """
SELECT n_name,
       bool_and(c_acctbal > 0) AS all_positive,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "q08_event_type_reach": """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY event_type
""",
    "q09_top_parts_per_brand": """
SELECT p_brand, p_partkey, p_retailprice, rnk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part
)
WHERE rnk <= 3
""",
    "q10_event_props_stats": """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       count(*) AS n
FROM events
GROUP BY event_type
""",
    "q11_hourly_event_stats": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    "q12_user_sessions": """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, sum(new_sess) AS n_sessions, count(*) AS n_events
FROM flagged
GROUP BY user_id
""",
    "q13_dedup_doc_buckets": """
SELECT lang, CAST(floor(n_chars / 10) AS BIGINT) AS bucket,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_in_bucket
FROM documents
GROUP BY lang, CAST(floor(n_chars / 10) AS BIGINT)
""",
    "q14_near_dup_pairs": f"""
WITH {_SHINGLES_CTE},
  sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
  pair_inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  )
SELECT doc_a, doc_b, inter,
       za.sz + zb.sz - inter AS union_sz,
       round(inter / (za.sz + zb.sz - inter), 6) AS jaccard
FROM pair_inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
""",
    "q15_minhash_signatures": f"""
WITH {_SHINGLES_CTE}, {_VOCAB_CTE}
SELECT doc_id,
           {_minhash_select(16)}
FROM sid
GROUP BY doc_id
""",
    "q16_lsh_near_dups": f"""
WITH {_SHINGLES_CTE}, {_VOCAB_CTE},
  sigs AS (
    SELECT doc_id,
           {_minhash_select(16)}
    FROM sid GROUP BY doc_id
  ),
  bands AS (
    {_bands_union(8, 2)}
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  ),
  sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
  pair_inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
  )
SELECT doc_a, doc_b,
       round(inter / (za.sz + zb.sz - inter), 6) AS jaccard
FROM pair_inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
""",
    "q17_text_quality_by_lang": f"""
WITH d AS (
  SELECT lang,
         len(string_split(text, ' ')) AS ntok,
         list_sum(list_transform(string_split(text, ' '),
                  t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1 ELSE 0 END))
           / len(string_split(text, ' ')) AS stopr,
         len(list_distinct(string_split(text, ' ')))
           / len(string_split(text, ' ')) AS distr
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       round(avg(ntok), 2) AS avg_tokens,
       round(avg(stopr), 4) AS avg_stopword_ratio,
       round(avg(distr), 4) AS avg_distinct_ratio,
       round(avg((least(ntok / 100.0, 1.0) + distr + (1 - stopr)) / 3), 4) AS avg_quality
FROM d
GROUP BY lang
""",
    "q18_doc_fingerprints": f"""
WITH tk AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY tok) - 1 AS tid
  FROM (SELECT DISTINCT tok FROM tk)
)
SELECT doc_id,
       sum((tid + 1) * pos) % {FINGERPRINT_MOD} AS fingerprint
FROM tk JOIN vocab USING (tok)
GROUP BY doc_id
""",
    "q19_cosine_topk": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (q.nrm * c.nrm) AS cos
  FROM n q, n c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
  FROM s
)
SELECT query_id, cand_id, rnk, round(cos, 6) AS cos FROM r WHERE rnk <= 5
""",
    "q20_sales_rollup": """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "q21_purchase_asof_view": """
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       p.ts AS purchase_ts, v.event_id AS view_id, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    "q22_geo_bbox": """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
)
SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat
FROM pts
WHERE lon >= -10.0 AND lon <= 40.0 AND lat >= 20.0 AND lat <= 60.0
""",
    "q23_ttl_surviving_events": """
SELECT event_type, count(*) AS n_survivors, min(ts) AS first_ts
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
GROUP BY event_type
""",
    "q24_suppliers_by_region": """
SELECT r_name, count(*) AS n_suppliers, round(avg(s_acctbal), 2) AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "q25_simhash_docs": _simhash_sql(16),
}
