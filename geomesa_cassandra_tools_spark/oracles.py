"""DuckDB oracle SQL — one ANSI statement per query in ``queries.py``.

Same aliases, same rounding, same deterministic arithmetic (minhash/simhash
parameters are interpolated from the single source of truth in
``operators/dedup.py``), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from geomesa_cassandra_tools_spark.functions.text import (
    BPE_SPLIT_RE,
    FINGERPRINT_MOD,
    STOPWORDS,
    rolling_hash_powers,
)
from geomesa_cassandra_tools_spark.operators.dedup import MINHASH_PRIME, minhash_params
from geomesa_cassandra_tools_spark.operators.similarity import (
    pq_codebooks,
    random_hyperplanes,
)

# Shared CTE: embeddings as double vectors with norms (cosine denominator).
_VEC_CTE = """
  v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
  n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v)
"""

_COS = "list_sum(list_transform(range(1, len({q}.e) + 1), i -> {q}.e[i] * {c}.e[i])) / ({q}.nrm * {c}.nrm)"


def _hyperplane_sig_sql(
    dim: int = 64, nbits: int = 8, planes: list | None = None
) -> str:
    """Signature expression mirroring similarity.hyperplane_signature: per
    plane a flat left-associated dot-product chain (same fold order as the
    Spark `aggregate`, so the sign test sees bit-identical doubles).
    ``planes`` overrides the default single-table plane set — the
    multi-table oracle (q150) passes each table's slice of the one LCG
    stream, exactly as the operator slices it."""
    planes = planes if planes is not None else random_hyperplanes(dim, nbits)
    terms = []
    for i, row in enumerate(planes):
        dot = " + ".join(f"e[{j + 1}] * ({x!r})" for j, x in enumerate(row))
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END")
    return " + ".join(terms)


def _centroid_assign_sql(filter_sql: str, rn_cap: int) -> str:
    """row_number-capped nearest-centroid assignment (ivf_topk's `assign`)."""
    cos = "list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * c.ce[i])) / (a.nrm * c.cnrm)"
    return f"""(
    SELECT vec_id, e, nrm, cid FROM (
      SELECT a.vec_id, a.e, a.nrm, c.cid,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, c.cid) AS rn
      FROM n a, cent c {filter_sql}
    ) WHERE rn <= {rn_cap}
  )"""

# Shared CTE: distinct (doc_id, 3-gram shingle) pairs — mirrors
# operators/dedup.py::shingle_sets.
_SHINGLES_CTE = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
  shx AS (SELECT doc_id, l, unnest(range(1, len(l)-1)) AS i FROM toks WHERE len(l) >= 3),
  sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle FROM shx)
"""

def _hashed_tid_sql(col: str) -> str:
    """Mirror of operators/dedup.py::hashed_tid: top 60 bits of md5 (15 hex
    chars, parsed by a left fold) reduced mod MINHASH_PRIME."""
    return (
        f"list_reduce(list_transform(string_split_regex(substr(md5({col}), 1, 15), ''),"
        f" x -> strpos('0123456789abcdef', x) - 1), (a, b) -> a * 16 + b)"
        f" % {MINHASH_PRIME}"
    )


_VOCAB_CTE = f"""
  sid AS (SELECT doc_id, {_hashed_tid_sql('shingle')} AS tid FROM sh)
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


def _cms_cells_sql(depth: int = 4, width: int = 512) -> str:
    """Per-occurrence (j, bucket) rows mirroring operators/sketches.py
    (`_buckets`: ((a*tid + b) % P) % width, params from
    minhash_params(depth, seed=7))."""
    parts = []
    for j, (a, b) in enumerate(minhash_params(depth, seed=7)):
        parts.append(
            f"SELECT token, {j} AS j,"
            f" CAST((({a} * tid + {b}) % {MINHASH_PRIME}) % {width} AS INT) AS bucket"
            " FROM tid"
        )
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
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
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
)
SELECT doc_id,
       CAST(sum(({_hashed_tid_sql('tok')} + 1) * pos) % {FINGERPRINT_MOD} AS BIGINT) AS fingerprint
FROM tk
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
ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
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
    "q26_lsh_cosine_topk": f"""
WITH {_VEC_CTE},
s0 AS (SELECT vec_id, e, nrm, ({_hyperplane_sig_sql(64, 8)}) AS sig FROM n),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS.format(q='q', c='c')} AS cos
  FROM s0 q JOIN s0 c ON q.sig = c.sig AND q.vec_id < 8 AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
  FROM s
)
SELECT query_id, cand_id, rnk, round(cos, 6) AS cos FROM r WHERE rnk <= 5
""",
    "q27_ivf_topk": f"""
WITH {_VEC_CTE},
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 4),
ca AS {_centroid_assign_sql("", 1)},
qa AS {_centroid_assign_sql("WHERE a.vec_id >= 4 AND a.vec_id < 12", 2)},
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS.format(q='q', c='c')} AS cos
  FROM qa q JOIN ca c USING (cid) WHERE q.vec_id <> c.vec_id
),
r AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
  FROM s
)
SELECT query_id, cand_id, rnk, round(cos, 6) AS cos FROM r WHERE rnk <= 3
""",
    "q58_neardup_clusters": f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_VOCAB_CTE},
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
  ),
  verified AS (
    SELECT doc_a, doc_b
    FROM pair_inter
    JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
    WHERE inter / (za.sz + zb.sz - inter) >= 0.1
  ),
  edges AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b, doc_a FROM verified
  ),
  reach(node, r) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
  )
SELECT node AS doc_id, min(r) AS cluster_id, (node = min(r)) AS is_keeper
FROM reach GROUP BY node
""",
    "q57_lsh_multiprobe_topk": f"""
WITH {_VEC_CTE},
s0 AS (SELECT vec_id, e, nrm, ({_hyperplane_sig_sql(64, 8)}) AS sig FROM n),
qprobe AS (
  SELECT vec_id, e, nrm, unnest([sig, xor(sig, 1), xor(sig, 2), xor(sig, 4), xor(sig, 8)]) AS sig
  FROM s0 WHERE vec_id < 8
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id, q.e AS qe, q.nrm AS qn,
                  c.e AS ce, c.nrm AS cn
  FROM qprobe q JOIN s0 c ON q.sig = c.sig AND c.vec_id <> q.vec_id
),
s AS (
  SELECT query_id, cand_id,
         list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) / (qn * cn) AS cos
  FROM cand
),
r AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
  FROM s
)
SELECT query_id, cand_id, rnk, round(cos, 6) AS cos FROM r WHERE rnk <= 5
""",
    "q28_embedding_near_dups": f"""
WITH {_VEC_CTE},
s AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS.format(q='a', c='b')} AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS cos FROM s WHERE cos >= 0.35
""",
    "q29_media_features": """
SELECT doc_id AS media_id,
       list_extract(list_value('image', 'audio', 'video'), doc_id % 3 + 1) AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       """
    + ",\n       ".join(
        f"round((coalesce(list_sum(list_transform(range({i + 1}, strlen(text) + 1, 8),"
        f" j -> unicode(text[j]))), 0) % 256) / 255.0, 6) AS f{i}"
        for i in range(8)
    )
    + """
FROM documents
""",
    "q30_media_dimensions": """
SELECT doc_id AS media_id, 'image/png' AS mime,
       CAST(64 + unicode(text[1]) % 64 AS BIGINT) AS width,
       CAST(64 + unicode(text[strlen(text)]) % 64 AS BIGINT) AS height
FROM documents WHERE doc_id % 3 = 0
""",
    "q31_video_frame_plan": """
SELECT doc_id AS media_id,
       CAST(floor(greatest(n_chars * 10 - 1, 0) / 1000) + 1 AS BIGINT) AS n_frames,
       CAST(floor(greatest(n_chars * 10 - 1, 0) / 1000) * 1000 AS BIGINT) AS last_frame_ts_ms
FROM documents WHERE doc_id % 3 = 2
""",
    "q32_stream_hourly_counts": """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    "q33_stream_user_sessions": """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM s
)
SELECT user_id, min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
       count(*) AS n_events
FROM g GROUP BY user_id, sess_id
""",
    "q34_catalog_missing_tables": """
WITH cat AS (
  SELECT lower(n_name) AS sft, n_nationkey,
         'Cat_' || lower(n_name) || '_z3' || chr(10) ||
         'cat_' || lower(n_name) || '_z2' || chr(10) ||
         'cat_' || lower(n_name) || '_id' || chr(10) ||
         'xtra_' || lower(n_name) AS value
  FROM nation
),
st AS (
  SELECT DISTINCT sft, n_nationkey, lower(trim(t.tbl)) AS tbl
  FROM cat, unnest(string_split(value, chr(10))) AS t(tbl)
  WHERE lower(trim(t.tbl)) LIKE 'cat%'
),
ex AS (SELECT tbl FROM st WHERE n_nationkey % 2 = 0 OR NOT ends_with(tbl, '_z3'))
SELECT sft, tbl AS missing_table FROM st WHERE tbl NOT IN (SELECT tbl FROM ex)
""",
    "q35_parse_compactions": """
WITH lines AS (
  SELECT md5(CAST(event_id AS VARCHAR)) AS m, event_type, user_id FROM events
)
SELECT 'ks' || (user_id % 3) AS keyspace, 't' || (user_id % 5) AS "table",
       count(*) AS n_compactions,
       count(DISTINCT substr(m, 1, 8) || '-' || substr(m, 9, 4) || '-' ||
             substr(m, 13, 4) || '-' || substr(m, 17, 4) || '-' || substr(m, 21, 12)) AS n_ids,
       count(DISTINCT event_type) AS n_types
FROM lines GROUP BY 1, 2
""",
    "q36_order_status_set_ops": """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
    "q37_customer_order_trends": """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS price,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       CAST(floor((2 * sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER fr
                   + count(*) OVER fr)
                  / (2 * count(*) OVER fr)) AS BIGINT) / 100.0 AS moving_avg3,
       row_number() OVER w AS order_seq
FROM orders WHERE o_custkey % 10 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       fr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    "q38_click_view_correlation": """
WITH e AS (
  SELECT event_id, user_id, event_type,
         date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS sec
  FROM events
),
c AS (SELECT event_id AS click_id, user_id, sec FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS view_id, user_id, sec FROM e WHERE event_type = 'view')
SELECT c.click_id, count(DISTINCT v.view_id) AS n_views
FROM c JOIN v ON c.user_id = v.user_id AND v.sec BETWEEN c.sec AND c.sec + 600
GROUP BY c.click_id
""",
    "q39_geo_dwithin": """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
),
d AS (
  SELECT c_custkey, lon, lat,
         12742.0176 * asin(sqrt(
             power(sin(radians(45.0 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(45.0)) * power(sin(radians(10.0 - lon) / 2), 2)
         )) AS dist_km
  FROM pts
)
SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat, round(dist_km, 6) AS dist_km
FROM d WHERE dist_km <= 500.0
""",
    "q40_lang_id_confusion": """
WITH d AS (SELECT lang, string_split(text, ' ') AS l FROM documents),
h AS (
  SELECT lang,
         coalesce(list_sum(list_transform(l, t -> CASE WHEN t IN ('customer','hash','join') THEN 1 ELSE 0 END)), 0) AS h_de,
         coalesce(list_sum(list_transform(l, t -> CASE WHEN t IN ('order','window','group') THEN 1 ELSE 0 END)), 0) AS h_en,
         coalesce(list_sum(list_transform(l, t -> CASE WHEN t IN ('agg','merge','vector') THEN 1 ELSE 0 END)), 0) AS h_es,
         coalesce(list_sum(list_transform(l, t -> CASE WHEN t IN ('scan','data','batch') THEN 1 ELSE 0 END)), 0) AS h_fr,
         coalesce(list_sum(list_transform(l, t -> CASE WHEN t IN ('small','value','the') THEN 1 ELSE 0 END)), 0) AS h_zh
  FROM d
)
SELECT lang,
       CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
            WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
            WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
            WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
            WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
            ELSE 'zh' END AS predicted,
       count(*) AS n_docs
FROM h GROUP BY 1, 2
""",
    "q41_rolling_hash_fingerprints": f"""
WITH ch AS (
  SELECT doc_id, unnest(range(1, strlen(text) + 1)) AS j, text FROM documents
)
SELECT doc_id,
       CAST(sum(CAST(unicode(ch.text[j]) AS BIGINT) * pw.p) % {FINGERPRINT_MOD} AS BIGINT) AS rolling_hash
FROM ch
JOIN (VALUES {", ".join(f"({i}, {p})" for i, p in rolling_hash_powers(1024))}) AS pw(i, p)
  ON pw.i = ch.j - 1
GROUP BY doc_id
""",
    "q42_sales_cube": """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "q44_stream_stateful_totals": """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id
""",
    "q45_token_stats_by_source": f"""
WITH d AS (
  SELECT source,
         len(string_split(text, ' ')) AS ws,
         len(regexp_extract_all(text, '{BPE_SPLIT_RE}')) AS bpe,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS punct
  FROM documents
)
SELECT source, count(*) AS n_docs, CAST(sum(ws) AS BIGINT) AS sum_ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens, CAST(sum(punct) AS BIGINT) AS sum_punct
FROM d GROUP BY source
""",
}


def _polygon_sql() -> str:
    from geomesa_cassandra_tools_spark.queries import Q46_POLYGON

    k = len(Q46_POLYGON)
    terms = []
    for i in range(k):
        x1, y1 = Q46_POLYGON[i]
        x2, y2 = Q46_POLYGON[(i + 1) % k]
        terms.append(
            f"(({x2 - x1!r}) * (lat - ({y1!r})) - ({y2 - y1!r}) * (lon - ({x1!r}))) >= 0"
        )
    cond = "\n  AND ".join(terms)
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
)
SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat
FROM pts
WHERE {cond}
"""


# q43 returns exact counts + an in-plan tolerance verdict on the HLL++
# estimate; the oracle reproduces the exact side and asserts the verdict
# is TRUE (rsd=0.02 sketch vs an 8% = 4-sigma gate: deterministic per
# dataset, and wide enough that corpus REGENERATION re-rolling the
# hash-induced error cannot flake the gate).
ORACLES["q43_approx_distinct_reach"] = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""

ORACLES["q46_geo_polygon_contains"] = _polygon_sql()

ORACLES["q47_stream_sliding_rates"] = """
WITH w AS (
  SELECT make_timestamp(CAST((floor(epoch(ts) / 900) - k) * 900 AS BIGINT) * 1000000) AS win_start
  FROM events, unnest([0, 1, 2, 3]) AS t(k)
)
SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, count(*) AS n_events
FROM w GROUP BY win_start
"""

ORACLES["q48_doc_length_geomean"] = """
SELECT lang, round(exp(avg(ln(n_chars))), 2) AS geomean_chars, count(*) AS n_docs
FROM documents GROUP BY lang
"""


def _raycast_sql() -> str:
    from geomesa_cassandra_tools_spark.queries import Q49_POLYGON

    k = len(Q49_POLYGON)
    terms = []
    for i in range(k):
        x1, y1 = Q49_POLYGON[i]
        x2, y2 = Q49_POLYGON[(i + 1) % k]
        terms.append(
            f"CASE WHEN (({y1!r}) > lat) <> (({y2!r}) > lat)"
            f" AND lon < ({x2 - x1!r}) * (lat - ({y1!r})) / ({y2 - y1!r}) + ({x1!r})"
            f" THEN 1 ELSE 0 END"
        )
    crossings = "\n     + ".join(terms)
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
)
SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat
FROM pts
WHERE ({crossings}) % 2 = 1
"""


ORACLES["q49_geo_concave_polygon"] = _raycast_sql()

ORACLES["q51_wkt_roundtrip_bbox"] = """
WITH pts AS (
  SELECT c_custkey,
         CAST(round((c_custkey * 7919 % 36000) / 100.0 - 180.0) AS INT) AS loni,
         CAST(round((c_custkey * 104729 % 18000) / 100.0 - 90.0) AS INT) AS lati
  FROM customer
),
wkt AS (
  SELECT c_custkey,
         'POINT (' || CAST(loni AS VARCHAR) || ' ' || CAST(lati AS VARCHAR) || ')' AS w
  FROM pts
),
parsed AS (
  SELECT c_custkey,
         CAST(regexp_extract(w, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 1) AS DOUBLE) AS lon,
         CAST(regexp_extract(w, 'POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)', 2) AS DOUBLE) AS lat
  FROM wkt
)
SELECT c_custkey, lon, lat FROM parsed
WHERE lon >= -10.0 AND lon <= 40.0 AND lat >= 20.0 AND lat <= 60.0
"""

ORACLES["q52_purchase_asof_left"] = """
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       p.ts AS purchase_ts, v.event_id AS view_id, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

ORACLES["q53_sql_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["q54_price_percentiles"] = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""

ORACLES["q55_nation_top_suppliers_list"] = """
WITH top AS (
  SELECT s_nationkey, s_suppkey,
         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier
)
SELECT n_name,
       array_to_string(list_sort(list(s_suppkey)), ',') AS top_suppliers,
       count(*) AS n
FROM top JOIN nation ON s_nationkey = n_nationkey
WHERE rn <= 3
GROUP BY n_name
"""

ORACLES["q56_ship_latency_by_priority"] = """
SELECT o_orderpriority,
       min(date_diff('day', o_orderdate, l_shipdate)) AS min_days,
       max(date_diff('day', o_orderdate, l_shipdate)) AS max_days,
       round(avg(date_diff('day', o_orderdate, l_shipdate)), 2) AS avg_days,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

ORACLES["q50_segment_minmax_scale"] = """
SELECT c_custkey, c_mktsegment,
       CASE WHEN max(c_acctbal) OVER w = min(c_acctbal) OVER w THEN 0.0
            ELSE round((c_acctbal - min(c_acctbal) OVER w) /
                       (max(c_acctbal) OVER w - min(c_acctbal) OVER w), 6)
       END AS scaled_bal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment)
"""

ORACLES["q59_tfidf_top_terms"] = """
WITH terms AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
lt AS (
  SELECT lang, term, count(*) AS total_tf
  FROM terms WHERE term <> '' GROUP BY lang, term
),
idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms WHERE term <> '' GROUP BY term),
nd AS (SELECT count(*) AS n_docs FROM documents),
by_lang AS (
  SELECT lang, term, round(total_tf * ln(n_docs / df), 4) AS score
  FROM lt JOIN idf USING (term) CROSS JOIN nd
)
SELECT lang, term, score, rank FROM (
  SELECT lang, term, score,
         row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rank
  FROM by_lang
) WHERE rank <= 5
"""

ORACLES["q60_wkt_polygon_area"] = """
WITH s AS (
  SELECT s_suppkey,
         CAST(s_suppkey * 7919 % 300 AS INT) AS x,
         CAST(s_suppkey * 104729 % 150 AS INT) AS y,
         CAST(s_suppkey % 9 + 1 AS INT) AS w,
         CAST(s_suppkey % 7 + 1 AS INT) AS h1,
         CAST(s_suppkey % 5 + 2 AS INT) AS h2
  FROM supplier
),
wkt AS (
  SELECT s_suppkey,
         'POLYGON ((' ||
         CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR) || ', ' ||
         CAST(x + w AS VARCHAR) || ' ' || CAST(y AS VARCHAR) || ', ' ||
         CAST(x + w AS VARCHAR) || ' ' || CAST(y + h1 AS VARCHAR) || ', ' ||
         CAST(x AS VARCHAR) || ' ' || CAST(y + h2 AS VARCHAR) || ', ' ||
         CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR) || '))' AS wkt
  FROM s
),
ring AS (
  SELECT s_suppkey,
         list_transform(regexp_extract_all(wkt, '(-?[0-9.]+) (-?[0-9.]+)', 0),
                        c -> struct_pack(
                          lon := CAST(string_split(c, ' ')[1] AS DOUBLE),
                          lat := CAST(string_split(c, ' ')[2] AS DOUBLE))) AS ring
  FROM wkt
),
m AS (
  SELECT s_suppkey,
         CAST(len(ring) - 1 AS INT) AS n_vertices,
         round(abs(list_sum(list_transform(range(1, len(ring)),
               i -> ring[i].lon * ring[i+1].lat - ring[i+1].lon * ring[i].lat))) / 2.0,
               2) AS area,
         list_aggregate(list_transform(ring, p -> p.lon), 'min') AS min_lon,
         list_aggregate(list_transform(ring, p -> p.lat), 'min') AS min_lat,
         list_aggregate(list_transform(ring, p -> p.lon), 'max') AS max_lon,
         list_aggregate(list_transform(ring, p -> p.lat), 'max') AS max_lat
  FROM ring
)
SELECT s_suppkey, n_vertices, area, min_lon, min_lat, max_lon, max_lat
FROM m WHERE area >= 10.0
"""

ORACLES["q61_hash_split_stats"] = f"""
WITH d AS (
  SELECT CASE WHEN ((doc_id % 1000003) * 1103515245 + 12345) % 100 < 80
              THEN 'train' ELSE 'held_out' END AS split,
         lang,
         len(string_split(text, ' ')) AS n_tokens,
         (least(len(string_split(text, ' ')) / 100.0, 1.0)
          + len(list_distinct(string_split(text, ' ')))
            / len(string_split(text, ' '))
          + (1 - list_sum(list_transform(string_split(text, ' '),
                  t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1 ELSE 0 END))
               / len(string_split(text, ' ')))) / 3 AS q
  FROM documents
)
SELECT split, lang, count(*) AS docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(q), 4) AS avg_quality
FROM d GROUP BY split, lang
"""

ORACLES["q63_z3_spacetime"] = """
WITH pts AS (
  SELECT event_type, value, ts,
         ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
         ((event_id * 104729) % 18000) / 100.0 - 90.0 AS lat
  FROM events
)
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM pts
WHERE lon >= -10.0 AND lon <= 40.0 AND lat >= 20.0 AND lat <= 60.0
  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-16'
GROUP BY event_type
"""

ORACLES["q64_repetition_filter"] = """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
b AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM d
),
c AS (
  SELECT doc_id, source, bigram, count(*) AS cnt
  FROM b GROUP BY doc_id, source, bigram
),
p AS (
  SELECT doc_id, source, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_frac
  FROM c GROUP BY doc_id, source
)
SELECT source, count(*) AS docs,
       CAST(sum(CASE WHEN top_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         AS repetitive_docs,
       round(avg(top_frac), 4) AS avg_top_bigram_frac
FROM p GROUP BY source
"""

ORACLES["q65_stratified_sample"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         (((doc_id % 1000003) * 1103515245 + 12345) % 2147483647) AS h,
         (least(len(string_split(text, ' ')) / 100.0, 1.0)
          + len(list_distinct(string_split(text, ' ')))
            / len(string_split(text, ' '))
          + (1 - list_sum(list_transform(string_split(text, ' '),
                  t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1 ELSE 0 END))
               / len(string_split(text, ' ')))) / 3 AS q
  FROM documents
),
r AS (
  SELECT doc_id, lang, q,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
  FROM d
)
SELECT lang, count(*) AS n_sampled, round(avg(q), 4) AS avg_quality,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM r WHERE rnk <= 50 GROUP BY lang
"""

ORACLES["q66_event_funnel"] = """
WITH ev AS (SELECT user_id, event_type, ts FROM events),
v AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS view_ts
  FROM ev GROUP BY user_id HAVING view_ts IS NOT NULL
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM ev e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM ev e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM ev)
SELECT count(*) AS users_total,
       count(v.view_ts) AS reached_view,
       count(c.click_ts) AS reached_click,
       count(p.purchase_ts) AS reached_purchase,
       round(CAST(count(p.purchase_ts) AS DOUBLE) / nullif(count(v.view_ts), 0), 4)
         AS view_to_purchase_rate
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""

ORACLES["q67_knn_classify"] = """
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS nbr_label,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (q.nrm * c.nrm) AS cos
  FROM n q, n c
  WHERE q.vec_id < 64 AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, nbr_label,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id)
           AS rnk
  FROM s
),
votes AS (
  SELECT query_id, nbr_label, count(*) AS nv
  FROM r WHERE rnk <= 5 GROUP BY query_id, nbr_label
),
pred AS (
  SELECT query_id, nbr_label AS pred_label
  FROM (SELECT query_id, nbr_label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY nv DESC, nbr_label) AS pr
        FROM votes)
  WHERE pr = 1
)
SELECT p.pred_label, t.label AS true_label, count(*) AS n
FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
GROUP BY p.pred_label, t.label
"""

ORACLES["q68_above_nation_avg"] = """
WITH na AS (
  SELECT c_nationkey, avg(c_acctbal) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c.c_nationkey, count(*) AS n_above,
       round(max(c.c_acctbal), 2) AS top_balance
FROM customer c JOIN na USING (c_nationkey)
WHERE c.c_acctbal > na.nation_avg
GROUP BY c.c_nationkey
"""

ORACLES["q69_hourly_type_pivot"] = """
SELECT hour(ts) AS hour,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY hour(ts)
"""

ORACLES["q70_order_value_deciles"] = """
WITH r AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
         percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
  FROM orders
)
SELECT decile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(max(pr), 6) AS max_percent_rank
FROM r GROUP BY decile
"""

ORACLES["q71_nation_top_supplier"] = """
SELECT s_nationkey,
       arg_max(s_name, s_acctbal) AS richest_supplier,
       round(max(s_acctbal), 2) AS max_bal,
       arg_min(s_name, s_acctbal) AS poorest_supplier,
       round(min(s_acctbal), 2) AS min_bal
FROM supplier GROUP BY s_nationkey
"""

# width_bucket does not exist in DuckDB; the CASE mirrors Spark's
# WidthBucket arithmetic term-for-term (same doubles, same floor).
ORACLES["q72_price_histogram"] = """
WITH b AS (
  SELECT CASE
           WHEN l_extendedprice < 900.0 THEN 0
           WHEN l_extendedprice >= 105000.0 THEN 11
           ELSE CAST(floor((l_extendedprice - 900.0)
                           / ((105000.0 - 900.0) / 10)) AS BIGINT) + 1
         END AS bucket,
         l_extendedprice
  FROM lineitem
)
SELECT bucket, count(*) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM b GROUP BY bucket
"""

ORACLES["q73_daily_orders_gapfill"] = """
WITH cal AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt,
         sum(o_totalprice) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT strftime(cal.day, '%Y-%m-%d') AS day,
       coalesce(daily.cnt, 0) AS n_orders,
       round(coalesce(daily.rev, 0.0), 2) AS revenue
FROM cal LEFT JOIN daily USING (day)
"""

ORACLES["q74_week_over_week_users"] = """
WITH w1 AS (
  SELECT user_id, count(*) AS n_w1 FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
  GROUP BY user_id
),
w2 AS (
  SELECT user_id, count(*) AS n_w2 FROM events
  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
  GROUP BY user_id
)
SELECT coalesce(w1.user_id, w2.user_id) AS user_id,
       coalesce(n_w1, 0) AS n_w1, coalesce(n_w2, 0) AS n_w2,
       CASE WHEN n_w1 IS NULL THEN 'new'
            WHEN n_w2 IS NULL THEN 'churned'
            ELSE 'retained' END AS status
FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id
"""

ORACLES["q75_embedding_quantization"] = """
WITH flat AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
scales AS (
  SELECT dim, max(abs(x)) AS scale FROM flat GROUP BY dim
),
q AS (
  SELECT f.dim, f.x, s.scale,
         least(greatest(round(f.x * 127.0 / s.scale), -127.0), 127.0) AS qv
  FROM flat f JOIN scales s USING (dim)
)
SELECT dim, round(max(scale), 6) AS scale,
       round(avg(abs(x - qv * scale / 127.0)), 6) AS avg_abs_err,
       round(max(abs(x - qv * scale / 127.0)), 6) AS max_abs_err
FROM q GROUP BY dim
"""

ORACLES["q76_stream_session_expiry"] = """
WITH u AS (
  SELECT user_id, count(*) AS n_events, max(ts) AS last_ts
  FROM events GROUP BY user_id
),
mx AS (SELECT max(ts) AS m FROM events)
SELECT user_id, n_events, FALSE AS closed FROM u
UNION ALL
SELECT u.user_id, u.n_events, TRUE AS closed
FROM u, mx
WHERE u.last_ts + INTERVAL 2 HOUR < mx.m - INTERVAL 30 SECOND
"""

# q77: the oracle states the naive points x polygons containment test
# (ray casting unrolled as a 7-edge group-by). Geometry is built with the
# same +/* arithmetic as the Spark side (UNIT_7GON literals, no trig), so
# vertices are bit-identical doubles.
ORACLES["q77_spatial_join"] = """
WITH polys AS (
  SELECT s_suppkey,
         ((s_suppkey * 13007) % 36000) / 100.0 - 180.0 AS cx,
         ((s_suppkey * 20011) % 18000) / 100.0 - 90.0 AS cy,
         2.0 + (s_suppkey % 7) * 0.5 AS r
  FROM supplier WHERE s_suppkey % 5 = 0
),
unit(k, ux, uy) AS (
  VALUES (1, 1.0, 0.1), (2, 0.55, 0.85), (3, -0.35, 0.95), (4, -0.95, 0.35),
         (5, -0.9, -0.45), (6, -0.25, -0.9), (7, 0.6, -0.75)
),
verts AS (
  SELECT s_suppkey, k, cx + r * ux AS vx, cy + r * uy AS vy FROM polys, unit
),
edges AS (
  SELECT a.s_suppkey, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM verts a JOIN verts b
    ON a.s_suppkey = b.s_suppkey AND b.k = (a.k % 7) + 1
),
pts AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon,
         ((c_custkey * 104729) % 18000) / 100.0 - 90.0 AS lat
  FROM customer
),
crossings AS (
  SELECT p.c_custkey, e.s_suppkey,
         sum(CASE WHEN ((e.y1 > p.lat) <> (e.y2 > p.lat))
                   AND p.lon < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1)
                                       / (e.y2 - e.y1)
             THEN 1 ELSE 0 END) AS n_cross
  FROM pts p, edges e
  GROUP BY p.c_custkey, e.s_suppkey
)
SELECT s_suppkey, count(*) AS n_customers_inside,
       min(c_custkey) AS first_customer
FROM crossings WHERE n_cross % 2 = 1
GROUP BY s_suppkey
"""

ORACLES["q62_decontaminate_train"] = f"""
WITH {_SHINGLES_CTE},
eval_sh AS (
  SELECT DISTINCT shingle
  FROM sh JOIN documents USING (doc_id) WHERE source = 'src19'
),
contaminated AS (
  SELECT DISTINCT sh.doc_id
  FROM sh JOIN documents d USING (doc_id) JOIN eval_sh USING (shingle)
  WHERE d.source <> 'src19'
),
flagged AS (
  SELECT d.doc_id, d.lang, (c.doc_id IS NOT NULL) AS is_contaminated
  FROM documents d LEFT JOIN contaminated c USING (doc_id)
  WHERE d.source <> 'src19'
)
SELECT lang, count(*) AS train_docs,
       CAST(sum(CASE WHEN is_contaminated THEN 1 ELSE 0 END) AS BIGINT) AS contaminated,
       CAST(sum(CASE WHEN is_contaminated THEN 0 ELSE 1 END) AS BIGINT) AS clean,
       round(avg(CASE WHEN is_contaminated THEN 1.0 ELSE 0.0 END), 4)
         AS contamination_rate
FROM flagged GROUP BY lang
"""

# q78: exact interpolated percentiles (quantile_cont == Spark percentile)
# over integer cents, snapped at 1/100-cent units where the true value is
# an integer (see the q78 docstring), plus TRUE tolerance verdicts on the
# Greenwald-Khanna estimates.
ORACLES["q78_approx_percentiles"] = """
WITH c AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT l_returnflag,
       CAST(round(quantile_cont(cents, 0.5) * 100) AS BIGINT) / 10000.0 AS p50,
       CAST(round(quantile_cont(cents, 0.9) * 100) AS BIGINT) / 10000.0 AS p90,
       CAST(round(quantile_cont(cents, 0.99) * 100) AS BIGINT) / 10000.0 AS p99,
       TRUE AS p50_ok,
       TRUE AS p90_ok,
       TRUE AS p99_ok,
       count(*) AS n
FROM c GROUP BY l_returnflag
"""

ORACLES["q79_price_qty_regression"] = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["q80_stream_view_click_join"] = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS sec
  FROM events
),
v AS (SELECT event_id AS view_id, user_id, sec FROM e WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id, sec FROM e WHERE event_type = 'click')
SELECT v.view_id, c.click_id, c.sec - v.sec AS gap_sec
FROM v JOIN c ON v.user_id = c.user_id
             AND c.sec BETWEEN v.sec AND v.sec + 600
"""

ORACLES["q81_stream_dedup_watermark"] = """
SELECT DISTINCT user_id, event_type FROM events
"""

ORACLES["q82_weekly_revenue_frame"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1995-07-01'
  GROUP BY 1, 4
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_orders,
       round(cents / 100.0, 2) AS revenue,
       CAST(floor((2 * sum(cents) OVER fr + count(*) OVER fr)
                  / (2 * count(*) OVER fr)) AS BIGINT) / 100.0 AS avg7
FROM daily
WINDOW fr AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

ORACLES["q83_fuzzy_name_match"] = """
WITH garbled AS (
  SELECT DISTINCT regexp_replace(n_name, '[AEIOUaeiou]', '', 'g') AS garbled
  FROM nation
),
clean AS (SELECT DISTINCT n_name AS candidate FROM nation),
scored AS (
  SELECT garbled, candidate, levenshtein(garbled, candidate) AS dist,
         row_number() OVER (PARTITION BY garbled
                            ORDER BY levenshtein(garbled, candidate), candidate)
           AS rn
  FROM garbled CROSS JOIN clean
)
SELECT garbled, candidate AS best_match, dist FROM scored WHERE rn = 1
"""

ORACLES["q84_hourly_pivot_unpivot"] = """
WITH hours AS (
  SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
types AS (SELECT unnest(['view', 'click', 'purchase']) AS event_type),
counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY 1, 2
)
SELECT hours.hour, types.event_type, coalesce(counts.n, 0) AS n_events
FROM hours CROSS JOIN types
LEFT JOIN counts USING (hour, event_type)
"""

ORACLES["q85_bitmap_reach"] = """
SELECT event_type,
       bit_or(1::BIGINT << CAST(user_id % 60 AS INT)) AS bitmap,
       count(*) AS n_events,
       CAST(bit_count(bit_or(1::BIGINT << CAST(user_id % 60 AS INT))) AS BIGINT)
         AS n_buckets
FROM events GROUP BY event_type
"""

ORACLES["q86_nearest_hub_assignment"] = """
WITH hubs AS (
  SELECT * FROM (VALUES (0, -120.0, 40.0), (1, -60.0, -20.0), (2, 0.0, 50.0),
                        (3, 30.0, -10.0), (4, 60.0, 20.0), (5, 100.0, 35.0),
                        (6, 140.0, -25.0), (7, 170.0, 60.0))
         AS t(hub_id, h_lon, h_lat)
),
pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
),
scored AS (
  SELECT c_custkey, hub_id,
         (lon - h_lon) * (lon - h_lon) + (lat - h_lat) * (lat - h_lat) AS dist2,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY (lon - h_lon) * (lon - h_lon) + (lat - h_lat) * (lat - h_lat),
                    hub_id) AS rn
  FROM pts CROSS JOIN hubs
)
SELECT hub_id, count(*) AS n_customers, min(c_custkey) AS first_cust
FROM scored WHERE rn = 1 GROUP BY hub_id
"""

ORACLES["q87_daily_value_interpolation"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_no
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 3
),
observed AS (SELECT day_no, cents FROM daily WHERE day_no % 3 = 0),
cal AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
j AS (
  SELECT cal.day, date_diff('day', DATE '2024-01-01', cal.day) AS day_no, cents
  FROM cal LEFT JOIN observed ON observed.day_no = date_diff('day', DATE '2024-01-01', cal.day)
),
anch AS (
  SELECT day, day_no, cents,
         last_value(cents IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN cents IS NOT NULL THEN day_no END IGNORE NULLS)
           OVER wp AS prev_no,
         first_value(cents IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN cents IS NOT NULL THEN day_no END IGNORE NULLS)
           OVER wn AS next_no
  FROM j
  WINDOW wp AS (ORDER BY day_no ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (ORDER BY day_no ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       (cents IS NOT NULL) AS observed,
       round(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                  WHEN prev_no IS NULL THEN CAST(next_v AS DOUBLE)
                  WHEN next_no IS NULL THEN CAST(prev_v AS DOUBLE)
                  ELSE prev_v + (next_v - prev_v) * (day_no - prev_no)
                       / (next_no - prev_no)
             END / 100.0, 2) AS daily_value
FROM anch
"""

ORACLES["q88_event_sequence_pattern"] = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, length(seq) AS seq_len,
       regexp_matches(seq, 'v.*c.*p') AS converted, seq
FROM seqs
"""

ORACLES["q89_lateral_topk_per_nation"] = """
SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
"""

ORACLES["q90_salted_hot_key_agg"] = """
SELECT event_type, count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS total_value
FROM events GROUP BY event_type
"""

ORACLES["q91_returned_order_multiset"] = """
WITH r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
a AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
both_keys AS (
  SELECT l_orderkey, count(*) AS n_both
  FROM (SELECT * FROM r INTERSECT ALL SELECT * FROM a) GROUP BY l_orderkey
),
r_only AS (
  SELECT l_orderkey, count(*) AS n_r_only
  FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM a) GROUP BY l_orderkey
)
SELECT coalesce(both_keys.l_orderkey, r_only.l_orderkey) AS l_orderkey,
       coalesce(n_both, 0) AS n_both, coalesce(n_r_only, 0) AS n_r_only
FROM both_keys FULL OUTER JOIN r_only USING (l_orderkey)
"""

ORACLES["q92_price_distribution_analytics"] = """
SELECT o_orderpriority, o_orderkey,
       round(o_totalprice, 2) AS price,
       round(cume_dist() OVER w, 6) AS cdf,
       round(first_value(o_totalprice) OVER f, 2) AS cheapest,
       round(last_value(o_totalprice) OVER f, 2) AS priciest,
       round(nth_value(o_totalprice, 2) OVER f, 2) AS second_cheapest
FROM orders WHERE o_custkey % 25 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
       f AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLES["q93_recursive_tree_depth"] = """
WITH RECURSIVE tree(k, depth) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION ALL
  SELECT c.c_custkey, t.depth + 1
  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.k
  WHERE c.c_custkey > 1 AND c.c_custkey < 1024
)
SELECT depth, count(*) AS n_nodes, min(k) AS min_key, max(k) AS max_key
FROM tree GROUP BY depth
"""

ORACLES["q94_bigram_lm_score"] = """
WITH tl AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
rows_ AS (
  SELECT doc_id, lang, l[i] AS ctx, l[i] || ' ' || l[i + 1] AS big
  FROM (SELECT doc_id, lang, l, unnest(range(1, len(l))) AS i FROM tl WHERE len(l) >= 2)
),
big_counts AS (SELECT big, count(*) AS c_big FROM rows_ GROUP BY big),
ctx_counts AS (SELECT ctx, count(*) AS c_ctx FROM rows_ GROUP BY ctx),
vocab AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(l) AS tok FROM tl))
SELECT doc_id, lang, count(*) AS n_bigrams,
       CAST(sum(CASE WHEN c_big = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rare_bigrams,
       round(avg((c_big + 1) / (c_ctx + v)), 6) AS avg_prob
FROM rows_ JOIN big_counts USING (big) JOIN ctx_counts USING (ctx)
CROSS JOIN vocab
WHERE doc_id % 5 = 0
GROUP BY doc_id, lang
"""

# q95: the sketch union estimate is graded through an 8% (~5-sigma)
# tolerance verdict;
# the oracle reproduces the exact distinct counts and the daily-sketch
# group count (one sketch per (type, day)).
ORACLES["q95_hll_sketch_rollup"] = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""

ORACLES["q96_union_schema_evolution"] = """
WITH u AS (
  SELECT user_id, event_type, round(value, 2) AS value FROM events
  WHERE event_id % 2 = 0
  UNION ALL BY NAME
  SELECT user_id, event_type, CAST(hour(ts) AS INT) AS hour FROM events
  WHERE event_id % 2 = 1
)
SELECT event_type, count(*) AS n_rows,
       count(value) AS n_with_value, count(hour) AS n_with_hour,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
FROM u GROUP BY event_type
"""

ORACLES["q97_user_trajectory_length"] = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (event_id * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM events
),
legs AS (
  SELECT user_id,
         sqrt((lon - lag(lon) OVER w) * (lon - lag(lon) OVER w)
              + (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)) AS leg
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(leg) AS n_legs,
       round(sum(leg), 4) AS path_len,
       round(max(leg), 4) AS longest_leg
FROM legs GROUP BY user_id
"""

ORACLES["q98_column_profile"] = """
SELECT 'o_orderkey' AS column_name,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate',
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderdate),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
"""

ORACLES["q99_scd2_event_state"] = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changed AS (
  SELECT user_id, event_type, ts, event_id FROM flagged
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to
FROM changed
"""

ORACLES["q100_token_cooccurrence"] = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
    FROM documents)
  WHERE length(tok) >= 3
),
df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
nd AS (SELECT count(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS pair_count
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
)
SELECT tok_a, tok_b, pair_count,
       round(nd.n_docs * pair_count / (fa.df * fb.df), 6) AS lift
FROM pairs
JOIN df fa ON fa.tok = pairs.tok_a
JOIN df fb ON fb.tok = pairs.tok_b
CROSS JOIN nd
WHERE pair_count >= 5
"""

ORACLES["q101_event_markov_transitions"] = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_state, next_type AS to_state,
         count(*) AS n_trans
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT from_state, to_state, n_trans,
       round(n_trans / sum(n_trans) OVER (PARTITION BY from_state), 6) AS p
FROM pairs
"""

ORACLES["q102_copurchase_triangles"] = """
WITH month AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-03-01'
    AND o_orderdate < TIMESTAMP '1995-04-01'
),
lines AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN month m ON l.l_orderkey = m.o_orderkey
),
edges AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM lines x JOIN lines y
    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
ne AS (SELECT count(*) AS n_edges FROM edges),
nn AS (SELECT count(*) AS n_nodes FROM
       (SELECT a AS v FROM edges UNION SELECT b FROM edges))
SELECT n_triangles, n_edges, n_nodes FROM tri, ne, nn
"""

ORACLES["q103_nation_pagerank"] = """
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY c.c_nationkey, s.s_nationkey
),
ew AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS frac FROM edges
),
nodes AS (SELECT n_nationkey AS node FROM nation),
nn AS (SELECT count(*) AS n FROM nation),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
c1 AS (SELECT ew.dst, sum(r0.rank * ew.frac) AS c
       FROM ew JOIN r0 ON r0.node = ew.src GROUP BY ew.dst),
r1 AS (SELECT node, 0.15 / nn.n + 0.85 * coalesce(c, 0) AS rank
       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.dst = node),
c2 AS (SELECT ew.dst, sum(r1.rank * ew.frac) AS c
       FROM ew JOIN r1 ON r1.node = ew.src GROUP BY ew.dst),
r2 AS (SELECT node, 0.15 / nn.n + 0.85 * coalesce(c, 0) AS rank
       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.dst = node),
c3 AS (SELECT ew.dst, sum(r2.rank * ew.frac) AS c
       FROM ew JOIN r2 ON r2.node = ew.src GROUP BY ew.dst),
r3 AS (SELECT node, 0.15 / nn.n + 0.85 * coalesce(c, 0) AS rank
       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.dst = node)
SELECT n_name, round(rank, 6) AS pagerank
FROM r3 JOIN nation ON n_nationkey = node
"""

ORACLES["q104_variant_props"] = """
WITH shred AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k,
       max(k) AS max_k
FROM shred GROUP BY event_type
"""

ORACLES["q105_modal_event_type"] = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n_events
  FROM events GROUP BY user_id, event_type
),
ranked AS (
  SELECT user_id, event_type, n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n_events DESC, event_type) AS rn
  FROM counts
)
SELECT user_id, event_type AS modal_type, n_events
FROM ranked WHERE rn = 1
"""

ORACLES["q106_winsorized_price_stats"] = """
WITH pct AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
),
j AS (
  SELECT o.o_orderpriority, o.o_totalprice, pct.p05, pct.p95,
         greatest(pct.p05, least(pct.p95, o.o_totalprice)) AS clipped,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN pct USING (o_orderpriority)
)
SELECT o_orderpriority,
       count(*) AS n,
       CAST(floor((2 * sum(cents) + count(*)) / (2 * count(*))) AS BIGINT)
         / 100.0 AS mean_raw,
       round(sum(clipped) / count(*), 4) AS mean_winsor,
       round(min(p05), 2) AS p05,
       round(min(p95), 2) AS p95
FROM j GROUP BY o_orderpriority
"""

ORACLES["q107_rolling_weekly_users"] = """
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
spine AS (SELECT DISTINCT d AS day FROM daily),
scattered AS (
  SELECT s.day, dl.user_id
  FROM (
    SELECT unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
             ::DATE AS day,
           user_id
    FROM daily
  ) dl
  JOIN spine s USING (day)
),
wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM scattered GROUP BY day),
dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM daily GROUP BY d)
SELECT strftime(wau.day, '%Y-%m-%d') AS day, dau, wau,
       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM wau JOIN dau USING (day)
"""

ORACLES["q108_fk_integrity_audit"] = """
SELECT 'lineitem.l_orderkey -> orders' AS fk_check,
       (SELECT count(*) FROM lineitem) AS n_checked,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
UNION ALL
SELECT 'orders.o_custkey -> customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""

ORACLES["q109_timed_view_purchase_funnel"] = """
WITH marked AS (
  SELECT ts, event_type,
         min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_purchase_ts
  FROM events
),
views AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN next_purchase_ts IS NOT NULL
               AND next_purchase_ts <= ts + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS converted
  FROM marked WHERE event_type = 'view'
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       count(*) AS n_views,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS cvr
FROM views GROUP BY day
"""

ORACLES["q110_nation_revenue_share"] = """
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       rev_cents / 100.0 AS revenue,
       round(rev_cents / sum(rev_cents) OVER (PARTITION BY r_name), 6)
         AS region_share
FROM per_nation
"""

ORACLES["q111_weighted_sample_stats"] = """
WITH marked AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN ((o_orderkey % 1000003) * 1103515245 + 12345) % 10000
              < least(CAST(round(o_totalprice * 100) AS BIGINT) // 5000,
                      10000)
              THEN 1 ELSE 0 END AS s
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_total,
       CAST(sum(s) AS BIGINT) AS n_sampled,
       CAST(sum(s * cents) AS BIGINT) / 100.0 AS sampled_value,
       round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS sample_rate
FROM marked GROUP BY o_orderpriority
"""

ORACLES["q112_acctbal_zscore"] = """
WITH scored AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         (c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
           / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey) AS z
  FROM customer
)
SELECT c_custkey, n_name,
       round(c_acctbal, 2) AS acctbal,
       round(z, 4) AS zscore
FROM scored JOIN nation ON c_nationkey = n_nationkey
WHERE abs(z) > 1.5
"""

ORACLES["q113_retention_cohorts"] = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY user_id
)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
       date_diff('day', cohort_wk, wk) // 7 AS week_offset,
       count(DISTINCT user_id) AS n_active
FROM weekly JOIN cohort USING (user_id)
GROUP BY cohort_wk, week_offset
"""

ORACLES["q114_session_paths"] = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessioned GROUP BY user_id, sess_id
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path HAVING count(*) >= 5
"""

ORACLES["q115_latest_event_per_user"] = """
WITH ranked AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) - 1 AS n_superseded
  FROM events
)
SELECT user_id, event_type AS last_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       CAST(n_superseded AS BIGINT) AS n_superseded
FROM ranked WHERE rn = 1
"""

ORACLES["q116_table_checksum_shards"] = """
WITH digests AS (
  SELECT o_orderkey % 16 AS shard,
         ((o_orderkey % 2147483648) * 2654435761
          + o_custkey * 40503
          + ascii(o_orderstatus) * 97
          + CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
         ) % 1000000007 AS h
  FROM orders
)
SELECT shard, CAST(bit_xor(h) AS BIGINT) AS checksum, count(*) AS n_rows
FROM digests GROUP BY shard
"""

ORACLES["q117_cosine_similarity_histogram"] = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
),
pairs AS (
  SELECT round(
           list_sum(list_transform(range(1, len(q.e) + 1),
                                   i -> q.e[i] * c.e[i]))
             / (q.nrm * c.nrm), 6) AS cos
  FROM n q JOIN n c ON c.vec_id = q.vec_id + 97
),
binned AS (
  SELECT CAST(least(greatest(floor((cos + 1.0) / 0.1), 0), 19) AS INT)
           AS bin,
         cos
  FROM pairs
)
SELECT bin, count(*) AS n_pairs, round(avg(cos), 6) AS mean_cos
FROM binned GROUP BY bin
"""

ORACLES["q118_stream_static_enrichment"] = """
SELECT date_trunc('day', ts) AS win_start, n_name,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
JOIN customer ON user_id = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2
"""

ORACLES["q119_nearest_view_to_purchase"] = """
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type = 'view' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view
  FROM events
),
p AS (
  -- elapsed-seconds floor over exact integer micros; date_diff would
  -- count boundary CROSSINGS and disagree with Spark's timestampdiff
  -- on fractional-second timestamps
  SELECT *,
         (epoch_us(ts) - epoch_us(prev_view)) // 1000000 AS back_gap,
         (epoch_us(next_view) - epoch_us(ts)) // 1000000 AS fwd_gap,
         (next_view IS NULL
          OR (prev_view IS NOT NULL
              AND (epoch_us(ts) - epoch_us(prev_view)) // 1000000
                  <= (epoch_us(next_view) - epoch_us(ts)) // 1000000))
           AS use_prev
  FROM marked
  WHERE event_type = 'purchase'
    AND (prev_view IS NOT NULL OR next_view IS NOT NULL)
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN use_prev THEN 'backward' ELSE 'forward' END AS direction,
       CAST(CASE WHEN use_prev THEN back_gap ELSE fwd_gap END AS BIGINT)
         AS gap_sec
FROM p
"""

ORACLES["q120_nation_summary_jsonl"] = """
WITH per AS (
  SELECT n_name,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name AS nation,
       to_json(struct_pack(nation := n_name,
                           n_orders := n_orders,
                           total_cents := total_cents))::VARCHAR AS record_json
FROM per
"""

ORACLES["q121_digit_token_stats"] = """
WITH per_doc AS (
  SELECT source,
         len(list_filter(regexp_extract_all(text, '[0-9]+'),
                         x -> length(x) <= 9)) AS n_tokens
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_digits,
       CAST(sum(n_tokens) AS BIGINT) AS total_digit_tokens
FROM per_doc GROUP BY source
"""

ORACLES["q122_trajectory_similarity_join"] = """
WITH cells AS (
  SELECT DISTINCT user_id,
         ((event_id * 7919 % 36000) // 3600) * 100
           + ((event_id * 104729 % 18000) // 1800) AS cell
  FROM events
),
sizes AS (SELECT user_id, count(*) AS n_cells FROM cells GROUP BY user_id),
inter AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_common
  FROM cells a JOIN cells b
    ON a.cell = b.cell AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)
SELECT user_a, user_b, n_common,
       round(n_common / (sa.n_cells + sb.n_cells - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.user_id = user_a
JOIN sizes sb ON sb.user_id = user_b
WHERE round(n_common / (sa.n_cells + sb.n_cells - n_common), 6) >= 0.5
"""

ORACLES["q123_partial_rollup_merge"] = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS revenue
FROM orders
GROUP BY date_trunc('month', o_orderdate), o_orderpriority
"""

ORACLES["q124_user_rank_footrule"] = """
WITH per_user AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
user_rank AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS r_user
  FROM per_user
),
global_rank AS (
  SELECT event_type,
         row_number() OVER (ORDER BY count(*) DESC, event_type) AS r_global
  FROM events GROUP BY event_type
)
SELECT user_id,
       CAST(sum(abs(r_user - r_global)) AS BIGINT) AS footrule,
       count(*) AS n_types
FROM user_rank JOIN global_rank USING (event_type)
GROUP BY user_id
"""

ORACLES["q125_sequence_packing"] = """
WITH toks AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS ntok FROM documents
),
packed AS (
  SELECT lang, ntok,
         sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM toks
)
SELECT lang,
       CAST(floor((cum - ntok) / 2048.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS tokens,
       round(sum(ntok) / 2048.0, 4) AS utilization
FROM packed
GROUP BY lang, CAST(floor((cum - ntok) / 2048.0) AS BIGINT)
"""

_MATCHES_16 = " + ".join(
    f"CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END" for i in range(16)
)

ORACLES["q126_minhash_accuracy"] = f"""
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
  ),
  jac AS (
    SELECT doc_a, doc_b, inter / (za.sz + zb.sz - inter) AS jaccard
    FROM pair_inter
    JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
  ),
  m AS (
    SELECT j.jaccard, CAST({{m16}} AS BIGINT) AS sig_matches
    FROM jac j
    JOIN sigs x ON x.doc_id = j.doc_a
    JOIN sigs y ON y.doc_id = j.doc_b
  )
SELECT sig_matches,
       count(*) AS n_pairs,
       round(avg(jaccard), 6) AS avg_jaccard,
       round(avg(abs(sig_matches / 16.0 - jaccard)), 6) AS mean_abs_err
FROM m
GROUP BY sig_matches
""".replace("{m16}", _MATCHES_16)

# Marker lists mirror queries.LANG_MARKERS (also hardcoded in q40's oracle).
_Q127_HITS = {
    "de": ("customer", "hash", "join"),
    "en": ("order", "window", "group"),
    "es": ("agg", "merge", "vector"),
    "fr": ("scan", "data", "batch"),
    "zh": ("small", "value", "the"),
}
_Q127_MAXHIT = "greatest(" + ", ".join(
    "list_sum(list_transform(string_split(text, ' '), t -> CASE WHEN t IN ("
    + ", ".join(f"'{w}'" for w in words)
    + ") THEN 1 ELSE 0 END))"
    for _, words in sorted(_Q127_HITS.items())
) + ")"

ORACLES["q127_filter_funnel"] = f"""
WITH d AS (
  SELECT len(string_split(text, ' ')) AS ntok,
         len(list_distinct(string_split(text, ' ')))
           / len(string_split(text, ' ')) AS distr,
         list_sum(list_transform(string_split(text, ' '),
                  t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1 ELSE 0 END))
           / len(string_split(text, ' ')) AS stopr,
         {_Q127_MAXHIT} AS maxhit
  FROM documents
),
f AS (
  SELECT (ntok >= 20) AS f1, (distr >= 0.4) AS f2,
         (stopr <= 0.5) AS f3, (maxhit > 0) AS f4
  FROM d
),
agg AS (
  SELECT count(*) AS c0,
         sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS c2,
         sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS c3,
         sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS c4
  FROM f
)
SELECT '0_total' AS stage, CAST(c0 AS BIGINT) AS surviving, round(c0 / c0, 4) AS pct FROM agg
UNION ALL SELECT '1_min_length', CAST(c1 AS BIGINT), round(c1 / c0, 4) FROM agg
UNION ALL SELECT '2_distinct_ratio', CAST(c2 AS BIGINT), round(c2 / c0, 4) FROM agg
UNION ALL SELECT '3_stopword_cap', CAST(c3 AS BIGINT), round(c3 / c0, 4) FROM agg
UNION ALL SELECT '4_lang_identified', CAST(c4 AS BIGINT), round(c4 / c0, 4) FROM agg
"""

ORACLES["q128_token_kl_divergence"] = """
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
  FROM documents
),
t2 AS (SELECT lang, tok FROM toks WHERE len(tok) >= 1),
lt AS (SELECT lang, tok, count(*) AS n_lt FROM t2 GROUP BY lang, tok),
lang_tot AS (SELECT lang, sum(n_lt) AS n_l FROM lt GROUP BY lang),
corp AS (SELECT tok, sum(n_lt) AS n_t FROM lt GROUP BY tok),
n AS (SELECT sum(n_lt) AS n FROM lt)
SELECT lt.lang,
       CAST(min(n_l) AS BIGINT) AS lang_tokens,
       count(*) AS vocab_size,
       round(sum((n_lt / n_l) * ln((n_lt / n_l) / (n_t / n.n))), 6) AS kl_vs_corpus
FROM lt
JOIN corp USING (tok)
JOIN lang_tot USING (lang)
CROSS JOIN n
GROUP BY lt.lang
"""

ORACLES["q129_spatial_dwithin_join"] = """
WITH s AS (
  SELECT s_suppkey,
         (s_suppkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (s_suppkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM supplier
),
c AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 36000) / 100.0 - 180.0 AS lon,
         (c_custkey * 104729 % 18000) / 100.0 - 90.0 AS lat
  FROM customer
),
pairs AS (
  SELECT s.s_suppkey, c.c_custkey,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(c.lat - s.lat) / 2), 2)
           + cos(radians(s.lat)) * cos(radians(c.lat))
             * pow(sin(radians(c.lon - s.lon) / 2), 2)
         )) AS km
  FROM s, c
  WHERE abs(s.lat) <= 60 AND abs(c.lat) <= 60
)
SELECT s_suppkey,
       count(*) AS n_customers_within,
       round(min(km), 3) AS min_km
FROM pairs
WHERE km <= 150.0
GROUP BY s_suppkey
"""

ORACLES["q130_snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 89 <> 0
),
d AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                   AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                THEN 'unchanged'
              ELSE 'changed' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, count(*) AS n_keys FROM d GROUP BY change_type
"""

ORACLES["q131_zordered_bbox_scan"] = """
WITH pts AS (
  SELECT event_type, value,
         ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
         ((event_id * 104729) % 18000) / 100.0 - 90.0 AS lat
  FROM events
)
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM pts
WHERE lon >= -10.0 AND lon <= 40.0 AND lat >= 20.0 AND lat <= 60.0
GROUP BY event_type
"""

ORACLES["q132_incremental_lsh_dedup"] = f"""
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
    SELECT DISTINCT least(n.doc_id, i.doc_id) AS doc_a,
                    greatest(n.doc_id, i.doc_id) AS doc_b
    FROM bands n
    JOIN bands i ON n.band = i.band AND n.sig = i.sig
                AND n.doc_id % 10 = 0 AND i.doc_id % 10 != 0
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
WHERE inter / (za.sz + zb.sz - inter) >= 0.1
"""


ORACLES["q133_cms_heavy_hitters"] = f"""
WITH t AS (
  SELECT token FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
tid AS (SELECT token, {_hashed_tid_sql('token')} AS tid FROM t),
cells AS (
    {_cms_cells_sql(4, 512)}
),
cms AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY j, bucket),
exact AS (SELECT token, count(*) AS exact_n FROM t GROUP BY token),
top AS (
  SELECT token, exact_n, rank FROM (
    SELECT token, exact_n,
           row_number() OVER (ORDER BY exact_n DESC, token) AS rank
    FROM exact
  ) WHERE rank <= 15
),
probes AS (
  SELECT DISTINCT c.token, c.j, c.bucket
  FROM cells c JOIN top USING (token)
),
est AS (
  SELECT p.token, min(c.cnt) AS cms_est
  FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.token
)
SELECT token, exact_n, cms_est, cms_est - exact_n AS overcount, rank
FROM top JOIN est USING (token)
"""

# q134 answers the SAME question as q63 over a different storage layout —
# the oracle IS q63's by design (aliased, not copied, so they cannot drift)
ORACLES["q134_z3_stored_spacetime_scan"] = ORACLES["q63_z3_spacetime"]


# q135: chunk construction (12-word tumbling slices) mirrored with
# list_slice; first occurrence ordered by (doc_id, chunk index) via
# row_number; retention in integer basis points (exact in both engines).
ORACLES["q135_chunk_dedup_retention"] = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
idx AS (
  SELECT doc_id, source, w,
         unnest(range(0, CAST(floor((len(w) - 1) / 12) AS BIGINT) + 1)) AS i
  FROM toks
),
ch AS (
  SELECT doc_id, source, i,
         array_to_string(list_slice(w, i * 12 + 1, i * 12 + 12), ' ') AS chunk
  FROM idx
),
flagged AS (
  SELECT source,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, i) AS rn
  FROM ch
)
SELECT source,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       (10000 * CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // count(*) AS retention_bp
FROM flagged GROUP BY source
"""

# q136: families keyed on the 16-word prefix; keeper = longest member,
# tie to the smaller doc_id (row_number mirror of Spark's struct-min).
ORACLES["q136_prefix_family_keeper"] = """
WITH fam AS (
  SELECT doc_id, n_chars,
         array_to_string(list_slice(string_split(text, ' '), 1, 16), ' ') AS prefix
  FROM documents
),
stats AS (
  SELECT prefix, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS family_chars
  FROM fam GROUP BY prefix HAVING count(*) > 1
),
rk AS (
  SELECT prefix, doc_id, n_chars,
         row_number() OVER (PARTITION BY prefix ORDER BY n_chars DESC, doc_id) AS rn
  FROM fam
)
SELECT md5(s.prefix) AS prefix_md5,
       s.n_docs,
       r.doc_id AS keeper_doc,
       r.n_chars AS keeper_chars,
       s.family_chars
FROM stats s JOIN rk r ON s.prefix = r.prefix AND r.rn = 1
"""

# q137: uniform-share rebalance plan — all-integer arithmetic
# (basis points + min), no double crosses the engine boundary.
ORACLES["q137_lang_rebalance_plan"] = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_langs FROM per_lang
)
SELECT lang, n_docs,
       least(10000, (10000 * total) // (n_langs * n_docs)) AS accept_bp,
       least(n_docs, total // n_langs) AS expected_kept
FROM per_lang, tot
"""

# q138: deterministic shuffle-shard plan — all-integer LCG permutation,
# the placement checksum certifies every (shard, position) assignment.
ORACLES["q138_shard_shuffle_plan"] = """
WITH placed AS (
  SELECT doc_id, n_chars,
         ((doc_id % 1000003) * 1103515245 + 12345) % 2147483647 AS perm
  FROM documents
),
pos AS (
  SELECT doc_id, n_chars, perm, perm % 8 AS shard,
         row_number() OVER (PARTITION BY perm % 8 ORDER BY perm, doc_id) AS pos
  FROM placed
)
SELECT shard, count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS shard_chars,
       min(perm) AS first_perm, max(perm) AS last_perm,
       CAST(sum((pos * doc_id) % 1000000007) % 1000000007 AS BIGINT)
         AS placement_checksum
FROM pos GROUP BY shard
"""

# q139: temperature-scaled source mixture (alpha = 0.5) — doubles rounded
# at the output edge; the sqrt-weight sum spans 20 values (~1 ulp noise).
ORACLES["q139_source_temperature_mixture"] = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
wt AS (
  SELECT source, n_docs, tokens, sqrt(CAST(tokens AS DOUBLE)) AS w FROM per
),
tot AS (
  SELECT sum(w) AS tot_w, CAST(sum(tokens) AS BIGINT) AS tot_tokens FROM wt
)
SELECT source, n_docs, tokens,
       round(tokens / CAST(tot_tokens AS DOUBLE), 6) AS raw_share,
       round(w / tot_w, 6) AS temp_share,
       CAST(round(1000000.0 * w / tot_w, 0) AS BIGINT) AS budget_tokens_1m
FROM wt, tot
"""

# q140: one deterministic k-means assign step — squared-L2 via the same
# index-order fold the Spark side uses (list_sum == sequential aggregate),
# ties broken by centroid id, output rounded to 4dp.
ORACLES["q140_kmeans_assign_step"] = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id AS cluster, e AS se FROM v WHERE vec_id < 8
),
d AS (
  SELECT v.vec_id, s.cluster,
         list_sum(list_transform(range(1, len(v.e) + 1),
                                 i -> (v.e[i] - s.se[i]) * (v.e[i] - s.se[i])))
           AS d2
  FROM v, s
),
a AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d
)
SELECT cluster, count(*) AS n_vecs,
       round(avg(sqrt(d2)), 4) AS avg_dist,
       min(vec_id) AS first_vec, max(vec_id) AS last_vec
FROM a WHERE rn = 1 GROUP BY cluster
"""

# q141: per-language vocabulary coverage curve — integer basis points,
# rank ties broken lexicographically (engine-deterministic).
ORACLES["q141_vocab_coverage_curve"] = """
WITH tf AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (
  SELECT lang, term, count(*) AS n FROM tf GROUP BY lang, term
),
ranked AS (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
  FROM cnt
),
agg AS (
  SELECT lang, count(*) AS vocab_size, CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN rk <= 5 THEN n ELSE 0 END) AS BIGINT) AS m5,
         CAST(sum(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS BIGINT) AS m10,
         CAST(sum(CASE WHEN rk <= 20 THEN n ELSE 0 END) AS BIGINT) AS m20
  FROM ranked GROUP BY lang
)
SELECT lang, vocab_size, total_tokens,
       (10000 * m5) // total_tokens AS cov5_bp,
       (10000 * m10) // total_tokens AS cov10_bp,
       (10000 * m20) // total_tokens AS cov20_bp
FROM agg
"""


# q142: Bloom-prefiltered decontamination audit — bit positions mirror
# operators/sketches.py::_bloom_positions (k=2, m=256, seed=11), so the
# confusion counts are deterministic and engine-identical; fn_free carries
# the no-false-negative invariant per row.
def _bloom_positions_sql(k: int, m: int, src: str) -> str:
    parts = []
    for a, b in minhash_params(k, seed=11):
        parts.append(
            f"SELECT *, CAST((({a} * tid + {b}) % {MINHASH_PRIME}) % {m} AS INT)"
            f" AS bit FROM {src}"
        )
    return "\n  UNION ALL\n  ".join(parts)


ORACLES["q142_bloom_decontaminate_audit"] = f"""
WITH d AS (
  SELECT doc_id, text,
         ((doc_id % 1000003) * 1103515245 + 12345) % 100 AS bucket
  FROM documents
),
held AS (SELECT DISTINCT {_hashed_tid_sql('text')} AS tid FROM d WHERE bucket >= 80),
train AS (SELECT doc_id, {_hashed_tid_sql('text')} AS tid FROM d WHERE bucket < 80),
bits AS (
  SELECT DISTINCT bit FROM (
  {_bloom_positions_sql(2, 256, 'held')}
  )
),
probes AS (
  {_bloom_positions_sql(2, 256, 'train')}
),
maybe AS (
  SELECT doc_id, bool_and(b.bit IS NOT NULL) AS maybe_member
  FROM probes p LEFT JOIN bits b ON p.bit = b.bit
  GROUP BY doc_id
),
exact AS (
  SELECT t.doc_id, h.tid IS NOT NULL AS exact_member
  FROM train t LEFT JOIN held h ON t.tid = h.tid
)
SELECT maybe_member, exact_member, count(*) AS n_docs,
       NOT (exact_member AND NOT maybe_member) AS fn_free
FROM maybe JOIN exact USING (doc_id)
GROUP BY maybe_member, exact_member
"""


# q143 answers the SAME question as q142 through the map-side bitmap probe
# — the oracle IS q142's by design (aliased, not copied, so they cannot
# drift); the q63/q134 stored-layout twin pattern applied to a sketch.
ORACLES["q143_bloom_mapside_prefilter"] = ORACLES["q142_bloom_decontaminate_audit"]

# q145 unrolls kmeans_iterate's two rounds in SQL. It can only exist
# because the trainer's centroid update is ORDER-EXACT: sums of
# floor(x*1e6) as int64 are the same integers in any fold order, so both
# engines derive bit-identical round-2 centroids ((s6/1e6)/n in left-to-
# right double division), and the round-2 distances (index-order fold)
# match before the 4dp output round. Empty clusters keep their seed.
_KM_D2 = """list_sum(list_transform(range(1, 65),
                                 i -> (v.e[i] - {c}[i]) * (v.e[i] - {c}[i])))"""
ORACLES["q145_kmeans_lloyd_trainer"] = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id AS cluster, e AS se FROM v WHERE vec_id < 8
),
d1 AS (
  SELECT v.vec_id, s.cluster, {_KM_D2.format(c="s.se")} AS d2
  FROM v, s
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d1
  ) WHERE rn = 1
),
ud AS (
  SELECT a1.cluster, t.i AS dim,
         SUM(CAST(floor(v.e[t.i] * 1000000.0) AS BIGINT)) AS s6,
         COUNT(*) AS n
  FROM a1 JOIN v USING (vec_id), range(1, 65) AS t(i)
  GROUP BY a1.cluster, t.i
),
m AS (
  SELECT cluster,
         list(CAST(s6 AS DOUBLE) / 1000000.0 / n ORDER BY dim) AS ce
  FROM ud GROUP BY cluster
),
c2 AS (
  SELECT s.cluster, CASE WHEN m.ce IS NULL THEN s.se ELSE m.ce END AS ce
  FROM s LEFT JOIN m USING (cluster)
),
d2r AS (
  SELECT v.vec_id, c2.cluster, {_KM_D2.format(c="c2.ce")} AS d2
  FROM v, c2
),
a2 AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT vec_id, cluster, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d2r
  ) WHERE rn = 1
)
SELECT cluster, count(*) AS n_vecs,
       round(avg(sqrt(d2)), 4) AS avg_dist,
       min(vec_id) AS first_vec, max(vec_id) AS last_vec
FROM a2 GROUP BY cluster
"""

# q146 composes the exact (q19), LSH (q26), and IVF (q27) pipelines and
# counts overlaps — recall@5 per query point as integers. The approximate
# sides replay the exact same deterministic hyperplanes / centroid
# assignment as their parent queries, so the hit counts are lockstep.
ORACLES["q146_ann_recall_calibration"] = f"""
WITH {_VEC_CTE},
ex AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_COS.format(q='q', c='c')} DESC, c.vec_id) AS rnk
    FROM n q, n c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 5
),
s0 AS (SELECT vec_id, e, nrm, ({_hyperplane_sig_sql(64, 8)}) AS sig FROM n),
lsh AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_COS.format(q='q', c='c')} DESC, c.vec_id) AS rnk
    FROM s0 q JOIN s0 c ON q.sig = c.sig AND q.vec_id < 8 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 5
),
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 4),
ca AS {_centroid_assign_sql("", 1)},
qa AS {_centroid_assign_sql("WHERE a.vec_id < 8", 2)},
ivf AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_COS.format(q='q', c='c')} DESC, c.vec_id) AS rnk
    FROM qa q JOIN ca c USING (cid) WHERE q.vec_id <> c.vec_id
  ) WHERE rnk <= 5
)
SELECT ex.query_id,
       count(*) AS k_exact,
       CAST(sum(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS lsh_hits,
       CAST(sum(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS ivf_hits
FROM ex
LEFT JOIN lsh l ON ex.query_id = l.query_id AND ex.cand_id = l.cand_id
LEFT JOIN ivf i ON ex.query_id = i.query_id AND ex.cand_id = i.cand_id
GROUP BY ex.query_id
"""

# q147's oracle is the UNSALTED plain join+window — the salted physical
# plan must be pure implementation detail (same answer, bounded task size).
ORACLES["q147_salted_skew_join"] = """
WITH dim AS (
  SELECT event_type, count(*) AS type_total FROM events GROUP BY event_type
),
per_user AS (
  SELECT e.event_type, e.user_id, count(*) AS n_events,
         min(d.type_total) AS type_total
  FROM events e JOIN dim d USING (event_type)
  GROUP BY e.event_type, e.user_id
)
SELECT event_type, user_id, rnk, n_events,
       (n_events * 10000) // type_total AS share_bp
FROM (
  SELECT event_type, user_id, n_events, type_total,
         row_number() OVER (
           PARTITION BY event_type ORDER BY n_events DESC, user_id) AS rnk
  FROM per_user
)
WHERE rnk <= 5
"""

# q148 replays the manifest lifecycle (init %3==0 -> merge_schema append
# %3==1 with `priority` -> delete price>200k) as plain set algebra: the
# commit/evolution machinery must not change a single row at any version.
ORACLES["q148_manifest_evolution_timetravel"] = """
WITH v0 AS (
  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS priority
  FROM orders WHERE o_orderkey % 3 = 0
),
v1 AS (
  SELECT * FROM v0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 3 = 1
),
v2 AS (
  SELECT * FROM v1 WHERE NOT (o_totalprice > 200000.0)
),
lifecycle AS (
  SELECT 0 AS version, * FROM v0
  UNION ALL SELECT 1 AS version, * FROM v1
  UNION ALL SELECT 2 AS version, * FROM v2
)
SELECT version, count(*) AS n_rows,
       count(priority) AS n_with_priority,
       round(sum(o_totalprice), 2) AS total_price,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM lifecycle GROUP BY version
"""

# q144 proves the manifest-table data-skipping read is pure cover-and-refine:
# the oracle is the plain full-scan bbox filter (q131's shape, different box)
# — file pruning from manifest min/max spans must never change the answer.
ORACLES["q144_manifest_skipping_scan"] = """
WITH pts AS (
  SELECT event_type, value,
         ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
         ((event_id * 104729) % 18000) / 100.0 - 90.0 AS lat
  FROM events
)
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM pts
WHERE lon >= -60.0 AND lon <= -5.0 AND lat >= -35.0 AND lat <= 10.0
GROUP BY event_type
"""

# q149 proves OPTIMIZE changes layout, never data: the pre-compaction
# snapshot, post-compaction snapshot, and a skipping read over the packed
# files' re-harvested stats must all equal plain SQL over orders.
ORACLES["q149_manifest_compaction"] = """
WITH s AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
)
SELECT 'pre_compact' AS snapshot, count(*) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
       count(DISTINCT o_orderstatus) AS n_status
FROM s
UNION ALL
SELECT 'post_compact', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM s
UNION ALL
SELECT 'post_compact_pruned', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM s WHERE o_orderkey BETWEEN 100 AND 5000
"""

# q150 unrolls the MULTI-TABLE LSH path: four independent 8-bit signatures
# per vector (four consecutive slices of the ONE LCG plane stream — exactly
# how the operator slices it), candidates = pairs agreeing in ANY table,
# then the same exact-cosine rerank as q26.
_MT_PLANES = random_hyperplanes(64, 8 * 4)
_MT_SIGS = ", ".join(
    f"({_hyperplane_sig_sql(64, 8, planes=_MT_PLANES[t * 8:(t + 1) * 8])}) AS g{t}"
    for t in range(4)
)
ORACLES["q150_lsh_multitable_topk"] = f"""
WITH {_VEC_CTE},
s0 AS (SELECT vec_id, e, nrm, {_MT_SIGS} FROM n),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {_COS.format(q='q', c='c')} AS cos
  FROM s0 q JOIN s0 c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
   AND (q.g0 = c.g0 OR q.g1 = c.g1 OR q.g2 = c.g2 OR q.g3 = c.g3)
),
r AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
  FROM s
)
SELECT query_id, cand_id, rnk, round(cos, 6) AS cos FROM r WHERE rnk <= 5
"""

# q152 replays the MERGE's row-level change feed as set algebra: updated
# keys surface as before-image delete + after-image insert, new keys as
# insert — and nothing else, because table_changes' EXCEPT ALL cancels
# every row the file-granular rewrite merely carried. Money in exact
# cents (o_totalprice is 2-decimal, so round(x*100) snaps the integer
# identically in both engines; the +1000.0 update is the same IEEE
# double add on both sides).
ORACLES["q152_manifest_change_feed"] = """
WITH updates AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 3 = 0
),
news AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 5 = 0
)
SELECT o_orderkey, o_orderstatus,
       CAST(round((o_totalprice + 1000.0) * 100) AS BIGINT) AS price_cents,
       'insert' AS change_type, 1 AS commit_version
FROM updates
UNION ALL
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       'delete' AS change_type, 1 AS commit_version
FROM updates
UNION ALL
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       'insert' AS change_type, 1 AS commit_version
FROM news
"""

# q156: the streaming-feed drain of the append-only q156 fixture must
# reproduce events exactly (its 4 slices partition events completely),
# so the oracle is the plain batch aggregate — the q37 integer-cents rule
# for the one float column.
# q172: one partition of the date-partitioned events manifest table ==
# a plain WHERE over the raw parquet — the layout changes I/O, never
# values (cover-and-refine: manifest partition pruning, then the exact
# row filter).
ORACLES["q172_partitioned_events_day"] = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type
"""

# q175: q58's cluster CTEs + q17's quality arithmetic; keeper =
# (quality-bp, -doc_id) max per cluster. FLOORED basis points (no
# half-way rounding rule crosses engines; the doubles underneath are
# bit-identical — q17's proven contract).
ORACLES["q175_cluster_keeper_by_quality"] = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_VOCAB_CTE},
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
  ),
  verified AS (
    SELECT doc_a, doc_b
    FROM pair_inter
    JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
    WHERE inter / (za.sz + zb.sz - inter) >= 0.1
  ),
  edges AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b, doc_a FROM verified
  ),
  reach(node, r) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
  ),
  clusters AS (
    SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
  ),
  qual AS (
    SELECT doc_id,
           CAST(floor(
             ((least(len(string_split(text, ' ')) / 100.0, 1.0)
               + len(list_distinct(string_split(text, ' ')))
                 / len(string_split(text, ' '))
               + (1 - list_sum(list_transform(string_split(text, ' '),
                     t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1 ELSE 0 END))
                     / len(string_split(text, ' ')))) / 3) * 10000
           ) AS BIGINT) AS qbp
    FROM documents
  ),
  members AS (
    SELECT c.cluster_id, c.node, q.qbp
    FROM clusters c JOIN qual q ON q.doc_id = c.node
  ),
  ranked AS (
    SELECT cluster_id, node, qbp,
           row_number() OVER (
             PARTITION BY cluster_id ORDER BY qbp DESC, node
           ) AS rn
    FROM members
  )
SELECT m.cluster_id,
       count(*) AS n_docs,
       max(CASE WHEN r.rn = 1 THEN r.node END) AS keeper_doc,
       max(CASE WHEN r.rn = 1 THEN r.qbp END) AS keeper_qbp,
       min(m.qbp) AS worst_qbp
FROM members m
JOIN ranked r ON r.cluster_id = m.cluster_id AND r.node = m.node
GROUP BY m.cluster_id
"""

# q174: PII redaction replayed byte-for-byte — same injected message
# construction, same in-order masking chain (email -> ip -> phone), same
# dialect-portable patterns (PII_PATTERNS: no \\d/\\w/\\b shorthands, so
# Java and RE2 agree on every match). DuckDB regexp_replace needs the
# explicit 'g' flag (Spark's is global by default); counts =
# len(regexp_extract_all(...)) over the progressively masked string.
from geomesa_cassandra_tools_spark.functions.text import PII_PATTERNS

_PII_MSG = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.org from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_sql() -> str:
    masked = "m"
    count_cols = []
    for kind, pat, token in PII_PATTERNS:
        count_cols.append(
            f"len(regexp_extract_all({masked}, '{pat}')) AS n_{kind}"
        )
        masked = f"regexp_replace({masked}, '{pat}', '{token}', 'g')"
    return f"""
WITH inj AS (
  SELECT lang,
         CASE WHEN doc_id % 4 = 0 THEN text ELSE {_PII_MSG} END AS m
  FROM documents
),
aud AS (
  SELECT lang, {', '.join(count_cols)}, len({masked}) AS rlen FROM inj
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_ip) AS BIGINT) AS ips,
       CAST(sum(n_phone) AS BIGINT) AS phones,
       CAST(sum(rlen) AS BIGINT) AS redacted_chars
FROM aud GROUP BY lang
"""


ORACLES["q174_pii_redaction_audit"] = _pii_sql()

# q173: the partition-pruned FEED nets the same rows as a plain WHERE —
# pruning is I/O-only (superset + exact refine), streaming adds nothing.
ORACLES["q173_partitioned_feed_day"] = """
SELECT EXTRACT(hour FROM ts) AS hour, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY 1
"""

ORACLES["q156_manifest_stream_feed"] = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""

# q185: the mapped-feed fixture's thirds (user_id % 3) partition events
# completely and the renames are metadata-only, so the stream across the
# column-mapping boundary must net the full batch table under the final
# logical names — plain SQL over events is the exact oracle.
ORACLES["q185_mapped_stream_feed"] = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       max(event_id) AS max_event_id
FROM events
GROUP BY event_type
"""

# q186: the pure-SQL ALTER lifecycle as set algebra — insert = union,
# rename = column alias, update = CASE, the refused negative insert
# ABSENT before DROP CONSTRAINT and present after; the v0 face replays
# only the init slice under the pre-rename name. Column names ride in
# the hashed `cols` value.
ORACLES["q186_sql_alter_lifecycle"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1
),
after_ins AS (
  SELECT * FROM base
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 2
),
live AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
              ELSE o_totalprice END AS amount
  FROM after_ins
  UNION ALL
  SELECT -1, 'X', CAST(-5.0 AS DOUBLE)
)
SELECT 'live' AS face,
       'o_orderkey,o_orderstatus,amount' AS cols,
       o_orderstatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT)
         AS amount_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM live GROUP BY o_orderstatus
UNION ALL
SELECT 'v0',
       'o_orderkey,o_orderstatus,o_totalprice',
       o_orderstatus,
       count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       CAST(sum(o_orderkey) AS BIGINT)
FROM base GROUP BY o_orderstatus
"""

# q189: CONVERT TO MANIFEST as set algebra — v0 = the converted plain
# slice (% 5 = 3), live = union with the SQL-inserted slice (% 5 = 4),
# pruned = the live face filtered (the engine's face must stats-prune
# to the same rows the filter selects).
# q199: column defaults as three constant-tagged slices — pre-column
# rows read null (write-time semantics), each insert carries the
# default in force when it ran.
ORACLES["q199_column_defaults"] = """
WITH s4 AS (
  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT)
    AS cents, '<pre>' AS tier
  FROM orders WHERE o_orderkey % 17 = 4
),
s5 AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT), 'std'
  FROM orders WHERE o_orderkey % 17 = 5
),
s6 AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT), 'gold'
  FROM orders WHERE o_orderkey % 17 = 6
),
u AS (
  SELECT * FROM s4 UNION ALL SELECT * FROM s5 UNION ALL
  SELECT * FROM s6
)
SELECT tier, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM u GROUP BY tier
"""

# q201: identity allocation replayed arithmetically — contiguous
# per-commit blocks mean the live id SET is a pure function of the
# three slice counts (A at start 1000 step 3; B rolled back by RESTORE
# but its range stays reserved; C starts past B's high-water; the
# final DELETE keeps odd ids only).
ORACLES["q201_identity_columns"] = """
WITH n AS (
  SELECT
    CAST(sum(CASE WHEN o_orderkey % 19 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS na,
    CAST(sum(CASE WHEN o_orderkey % 19 = 2 THEN 1 ELSE 0 END) AS BIGINT)
      AS nb,
    CAST(sum(CASE WHEN o_orderkey % 19 = 3 THEN 1 ELSE 0 END) AS BIGINT)
      AS nc
  FROM orders
),
ids AS (
  SELECT CAST(1000 + 3 * (u - 1) AS BIGINT) AS id
  FROM (SELECT unnest(range(1, na + 1)) AS u FROM n)
  UNION ALL
  SELECT CAST(1000 + 3 * (na + nb + u - 1) AS BIGINT)
  FROM (SELECT unnest(range(1, nc + 1)) AS u, na, nb FROM n)
),
live AS (SELECT id FROM ids WHERE id % 2 <> 0),
hw AS (SELECT CAST(1000 + 3 * (na + nb + nc - 1) AS BIGINT) AS high FROM n)
SELECT id % 7 AS bucket,
       count(*) AS n_rows,
       count(DISTINCT id) AS n_distinct,
       min(id) AS id_min,
       max(id) AS id_max,
       CAST(sum(id) AS BIGINT) AS id_sum,
       (SELECT high FROM hw) AS high_water
FROM live GROUP BY bucket
"""

# q203/q204: the trained linear quality classifier replayed in SQL —
# the full batch-perceptron trajectory unrolled as chained MATERIALIZED
# CTEs (the q196 lesson: self-referencing chains must materialize or
# DuckDB's inliner duplicates the base scan exponentially). Round 1
# starts from w=0, so every labeled doc is an error and the first
# gradient is the full label-weighted feature sum; later rounds join
# the previous weight vector, classify, and accumulate.
def _classifier_train_cte(rounds: int = 3, dim: int = 32) -> str:
    markers = ", ".join(f"'{m}'" for m in ("order", "window", "group"))
    blocks = [f"""cw AS MATERIALIZED (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
cfeat AS MATERIALIZED (
  SELECT doc_id, CAST(({_hashed_tid_sql('word')}) % {dim} AS INTEGER)
           AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cw GROUP BY 1, 2
),
clab AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN sum(CASE WHEN word IN ({markers}) THEN 1 ELSE 0 END)
                >= 2 THEN 1 ELSE -1 END AS y
  FROM cw GROUP BY doc_id
),
cfj AS MATERIALIZED (
  SELECT f.doc_id, f.bucket, f.cnt, l.y
  FROM cfeat f JOIN clab l USING (doc_id)
),
g1 AS MATERIALIZED (
  SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS g FROM cfj GROUP BY bucket
),
w1 AS MATERIALIZED (
  SELECT CAST(b.bucket AS INTEGER) AS bucket, coalesce(g1.g, 0) AS w
  FROM (SELECT unnest(range(0, {dim})) AS bucket) b
  LEFT JOIN g1 ON g1.bucket = b.bucket
)"""]
    for t in range(2, rounds + 1):
        blocks.append(f"""m{t} AS MATERIALIZED (
  SELECT f.doc_id, any_value(f.y) AS y,
         CAST(sum(f.cnt * w.w) AS BIGINT) AS margin
  FROM cfj f JOIN w{t - 1} w USING (bucket) GROUP BY f.doc_id
),
e{t} AS MATERIALIZED (
  SELECT doc_id FROM m{t} WHERE y * margin <= 0
),
g{t} AS MATERIALIZED (
  SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS g
  FROM cfj WHERE doc_id IN (SELECT doc_id FROM e{t})
  GROUP BY bucket
),
w{t} AS MATERIALIZED (
  SELECT p.bucket, p.w + coalesce(g{t}.g, 0) AS w
  FROM w{t - 1} p LEFT JOIN g{t} ON g{t}.bucket = p.bucket
)""")
    return ",\n".join(blocks)


ORACLES["q203_quality_classifier_train"] = f"""
WITH {_classifier_train_cte(3, 32)}
SELECT CAST(1 AS INTEGER) AS round, bucket, w,
       (SELECT count(DISTINCT doc_id) FROM cfj) AS n_errors FROM w1
UNION ALL
SELECT CAST(2 AS INTEGER), bucket, w,
       (SELECT count(*) FROM e2) FROM w2
UNION ALL
SELECT CAST(3 AS INTEGER), bucket, w,
       (SELECT count(*) FROM e3) FROM w3
"""

ORACLES["q204_classifier_cluster_keeper"] = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_VOCAB_CTE},
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
  ),
  verified AS (
    SELECT doc_a, doc_b
    FROM pair_inter
    JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
    WHERE inter / (za.sz + zb.sz - inter) >= 0.1
  ),
  edges AS (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION
    SELECT doc_b, doc_a FROM verified
  ),
  reach(node, r) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
  ),
  clusters AS (
    SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
  ),
{_classifier_train_cte(3, 32)},
  cmarg AS (
    SELECT f.doc_id, CAST(sum(f.cnt * w.w) AS BIGINT) AS margin
    FROM cfeat f JOIN w3 w USING (bucket) GROUP BY f.doc_id
  ),
  members AS (
    SELECT c.cluster_id, c.node, m.margin
    FROM clusters c JOIN cmarg m ON m.doc_id = c.node
  ),
  ranked AS (
    SELECT cluster_id, node, margin,
           row_number() OVER (
             PARTITION BY cluster_id ORDER BY margin DESC, node
           ) AS rn
    FROM members
  )
SELECT m.cluster_id,
       count(*) AS n_docs,
       max(CASE WHEN r.rn = 1 THEN r.node END) AS keeper_doc,
       max(CASE WHEN r.rn = 1 THEN r.margin END) AS keeper_margin,
       min(m.margin) AS worst_margin
FROM members m
JOIN ranked r ON r.cluster_id = m.cluster_id AND r.node = m.node
GROUP BY m.cluster_id
"""

# q206: the multiclass language-ID perceptron replayed in SQL — both
# training rounds AND the final scoring pass. Round 1's margins are all
# zero (w0 = 0), so every featured doc predicts the alphabetically
# first language; later rounds join the previous weight table, take the
# per-doc argmax (margin DESC, class ASC — the tie rule), and fold the
# +true/-pred gradients of the misclassified docs.
ORACLES["q206_langid_classifier"] = f"""
WITH cw AS MATERIALIZED (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE length(w) > 0
),
cfeat AS MATERIALIZED (
  SELECT doc_id, CAST(({_hashed_tid_sql('word')}) % 32 AS INTEGER)
           AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cw GROUP BY 1, 2
),
ml AS MATERIALIZED (SELECT doc_id, lang AS cls FROM documents),
k AS MATERIALIZED (SELECT DISTINCT lang AS cls FROM documents),
buckets AS (SELECT CAST(unnest(range(0, 32)) AS INTEGER) AS bucket),
fdocs AS MATERIALIZED (SELECT DISTINCT doc_id FROM cfeat),
p1 AS MATERIALIZED (
  SELECT doc_id, (SELECT min(cls) FROM k) AS pred FROM fdocs
),
e1 AS MATERIALIZED (
  SELECT l.doc_id, l.cls AS true_cls, p.pred
  FROM ml l JOIN p1 p USING (doc_id) WHERE l.cls <> p.pred
),
g1 AS MATERIALIZED (
  SELECT c, bucket, CAST(sum(g) AS BIGINT) AS g FROM (
    SELECT e.true_cls AS c, f.bucket, f.cnt AS g
    FROM e1 e JOIN cfeat f USING (doc_id)
    UNION ALL
    SELECT e.pred, f.bucket, -f.cnt
    FROM e1 e JOIN cfeat f USING (doc_id)
  ) GROUP BY c, bucket
),
w1 AS MATERIALIZED (
  SELECT kb.cls, kb.bucket, coalesce(g1.g, 0) AS w
  FROM (SELECT k.cls, b.bucket FROM k CROSS JOIN buckets b) kb
  LEFT JOIN g1 ON g1.c = kb.cls AND g1.bucket = kb.bucket
),
m2 AS MATERIALIZED (
  SELECT f.doc_id, w.cls,
         CAST(sum(f.cnt * w.w) AS BIGINT) AS margin
  FROM cfeat f JOIN w1 w ON w.bucket = f.bucket
  GROUP BY f.doc_id, w.cls
),
p2 AS MATERIALIZED (
  SELECT doc_id, cls AS pred FROM (
    SELECT doc_id, cls,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY margin DESC, cls
           ) AS rn
    FROM m2
  ) WHERE rn = 1
),
e2 AS MATERIALIZED (
  SELECT l.doc_id, l.cls AS true_cls, p.pred
  FROM ml l JOIN p2 p USING (doc_id) WHERE l.cls <> p.pred
),
g2 AS MATERIALIZED (
  SELECT c, bucket, CAST(sum(g) AS BIGINT) AS g FROM (
    SELECT e.true_cls AS c, f.bucket, f.cnt AS g
    FROM e2 e JOIN cfeat f USING (doc_id)
    UNION ALL
    SELECT e.pred, f.bucket, -f.cnt
    FROM e2 e JOIN cfeat f USING (doc_id)
  ) GROUP BY c, bucket
),
w2 AS MATERIALIZED (
  SELECT p.cls, p.bucket, p.w + coalesce(g2.g, 0) AS w
  FROM w1 p LEFT JOIN g2 ON g2.c = p.cls AND g2.bucket = p.bucket
),
m3 AS MATERIALIZED (
  SELECT f.doc_id, w.cls,
         CAST(sum(f.cnt * w.w) AS BIGINT) AS margin
  FROM cfeat f JOIN w2 w ON w.bucket = f.bucket
  GROUP BY f.doc_id, w.cls
),
p3 AS MATERIALIZED (
  SELECT doc_id, cls AS pred FROM (
    SELECT doc_id, cls,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY margin DESC, cls
           ) AS rn
    FROM m3
  ) WHERE rn = 1
)
SELECT 'w' AS face, CAST(1 AS INTEGER) AS round, cls, bucket, w FROM w1
UNION ALL
SELECT 'w', CAST(2 AS INTEGER), cls, bucket, w FROM w2
UNION ALL
SELECT 'err', CAST(1 AS INTEGER), '', -1,
       (SELECT count(*) FROM e1)
UNION ALL
SELECT 'err', CAST(2 AS INTEGER), '', -1,
       (SELECT count(*) FROM e2)
UNION ALL
SELECT 'conf', CAST(2 AS INTEGER), l.cls || '>' || p.pred, -1,
       CAST(count(*) AS BIGINT)
FROM ml l JOIN p3 p USING (doc_id)
GROUP BY l.cls || '>' || p.pred
"""

# q202: the WAV PCM generator replayed analytically — the Spark side
# decodes real RIFF/WAVE bytes back into samples; the oracle never sees
# bytes, it recomputes the integer waveform and folds the same stats
# (any decode defect — endianness, chunk-walk off-by-one, sign
# convention — diverges). Longest silence run is gaps-and-islands over
# the sub-threshold rows; zero crossings lag the sign with initial +1.
ORACLES["q202_audio_pcm_stats"] = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 29 = 7),
s AS MATERIALIZED (
  SELECT doc_id, u AS t,
         CASE WHEN u % 37 < 5 THEN u % 3
              ELSE GREATEST(-32768, LEAST(32767,
                ((11 * doc_id + 13 * u + (u * u) % 101) % 80011) - 40005))
         END AS v
  FROM (SELECT doc_id, unnest(range(0, 480)) AS u FROM d)
),
x AS (
  SELECT doc_id, t, v,
         CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sgn,
         lag(CASE WHEN v >= 0 THEN 1 ELSE -1 END, 1, 1)
           OVER (PARTITION BY doc_id ORDER BY t) AS psgn
  FROM s
),
runs AS (
  SELECT doc_id, max(runlen) AS maxrun FROM (
    SELECT doc_id, count(*) AS runlen
    FROM (
      SELECT doc_id, t,
             t - row_number() OVER (PARTITION BY doc_id ORDER BY t) AS isl
      FROM s WHERE abs(v) < 256
    ) GROUP BY doc_id, isl
  ) GROUP BY doc_id
)
SELECT x.doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
       CAST(sum(CASE WHEN sgn <> psgn THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_cross,
       CAST(coalesce(any_value(runs.maxrun), 0) AS BIGINT)
         AS max_silence_run
FROM x LEFT JOIN runs ON x.doc_id = runs.doc_id
GROUP BY x.doc_id
"""

# q196/q197: the REAL BPE tokenizer replayed in SQL — each training
# iteration is one chained block (pair count over the previous state,
# deterministic argmax, gaps-and-islands-parity merge application), so
# the merge table AND the encoded tokens bit-match functions/bpe.py.
def _bpe_apply_block(i: int, prefix: str, keys: list[str],
                     state_prev: str, msrc: str) -> str:
    """One merge-application block: {prefix}c{i} (state + lookahead),
    {prefix}k{i} (kept candidate positions: island-parity selection),
    {prefix}s{i} (the merged, renumbered state)."""
    K = ", ".join(keys)
    ck = ", ".join(f"c.{k}" for k in keys)
    on_k = " AND ".join(f"c.{k} = k.{k}" for k in keys)
    on_a = " AND ".join(f"c.{k} = ka.{k}" for k in keys)
    return f"""{prefix}c{i} AS MATERIALIZED (
  SELECT {K}, pos, sym,
         lead(sym) OVER (PARTITION BY {K} ORDER BY pos) AS nxt
  FROM {state_prev}
),
{prefix}k{i} AS MATERIALIZED (
  SELECT {K}, pos FROM (
    SELECT {K}, pos,
           row_number() OVER (PARTITION BY {K}, isl ORDER BY pos) - 1
             AS off
    FROM (
      SELECT {ck}, c.pos,
             c.pos - row_number()
               OVER (PARTITION BY {ck} ORDER BY c.pos) AS isl
      FROM {prefix}c{i} c, {msrc} m
      WHERE c.sym = m.lhs AND c.nxt = m.rhs
    )
  ) WHERE off % 2 = 0
),
{prefix}s{i} AS MATERIALIZED (
  SELECT {K}, row_number() OVER (PARTITION BY {K} ORDER BY pos) AS pos,
         sym
  FROM (
    SELECT {ck}, c.pos,
           CASE WHEN k.pos IS NOT NULL THEN c.sym || c.nxt
                ELSE c.sym END AS sym
    FROM {prefix}c{i} c
    LEFT JOIN {prefix}k{i} k ON {on_k} AND c.pos = k.pos
    LEFT JOIN {prefix}k{i} ka ON {on_a} AND c.pos = ka.pos + 1
    WHERE ka.pos IS NULL
  )
)"""


def _bpe_train_ctes(top_v: int, n_merges: int) -> str:
    """The full training chain: vocab -> char state s0 -> per-iteration
    (argmax m{{i}} + merge application) -> s{{n}}. m{{i}} CTEs hold the
    learned merge table rows."""
    blocks = ["""w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
v AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wcount
  FROM w WHERE length(word) > 0
  GROUP BY word ORDER BY wcount DESC, word LIMIT %d
),
s0 AS MATERIALIZED (
  SELECT word, wcount, CAST(i AS INT) AS pos,
         substring(word, CAST(i AS INT), 1) AS sym
  FROM (SELECT word, wcount,
               unnest(range(1, length(word) + 1)) AS i FROM v)
)""" % top_v]
    keys = ["word", "wcount"]
    for i in range(1, n_merges + 1):
        prev = "s0" if i == 1 else f"ts{i - 1}"
        K = ", ".join(keys)
        blocks.append(f"""tc{i} AS MATERIALIZED (
  SELECT {K}, pos, sym,
         lead(sym) OVER (PARTITION BY {K} ORDER BY pos) AS nxt
  FROM {prev}
),
m{i} AS MATERIALIZED (
  SELECT sym AS lhs, nxt AS rhs, CAST(sum(wcount) AS BIGINT) AS cnt
  FROM tc{i} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt ORDER BY cnt DESC, lhs, rhs LIMIT 1
)""")
        # the apply block re-derives the lookahead itself (tc{i} is the
        # argmax's input; reusing it would be fine but keeping the block
        # generator uniform costs one extra window over a tiny state)
        blocks.append(
            _bpe_apply_block(i, "t", keys, prev, f"m{i}").replace(
                f"tc{i} AS MATERIALIZED (", f"tac{i} AS MATERIALIZED ("
            ).replace(f"tc{i} c", f"tac{i} c")
        )
    return ",\n".join(blocks)


_BPE_TOP_V, _BPE_N_MERGES = 60, 8

ORACLES["q196_bpe_train_merges"] = "WITH " + _bpe_train_ctes(
    _BPE_TOP_V, _BPE_N_MERGES
) + "\n" + "\nUNION ALL\n".join(
    f"SELECT {i} AS step, lhs, rhs, cnt FROM m{i}"
    for i in range(1, _BPE_N_MERGES + 1)
)

def _bpe_encode_ctes(pred: str, extra_cols: str = "") -> str:
    """The encode-side state bootstrap over a document slice: words with
    indexes, then the char state ``es0``. ``extra_cols`` (e.g.
    ``"lang,"``) carries extra document columns through the chain."""
    x = f"{extra_cols} " if extra_cols else ""
    return f"""d AS (
  SELECT {x}doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE {pred}
),
wd AS (
  SELECT {x}doc_id, CAST(i AS BIGINT) AS widx,
         ws[CAST(i AS INT)] AS word
  FROM (SELECT {x}doc_id, ws,
               unnest(range(1, len(ws) + 1)) AS i FROM d)
  WHERE length(ws[CAST(i AS INT)]) > 0
),
es0 AS MATERIALIZED (
  SELECT {x}doc_id, widx, CAST(i AS INT) AS pos,
         substring(word, CAST(i AS INT), 1) AS sym
  FROM (SELECT {x}doc_id, widx, word,
               unnest(range(1, length(word) + 1)) AS i FROM wd)
)"""


_BPE_ENCODE_CTES = _bpe_encode_ctes("doc_id % 47 = 5")

ORACLES["q197_bpe_encode"] = (
    "WITH " + _bpe_train_ctes(_BPE_TOP_V, _BPE_N_MERGES) + ",\n"
    + _BPE_ENCODE_CTES + ",\n"
    + ",\n".join(
        _bpe_apply_block(
            i, "e", ["doc_id", "widx"],
            "es0" if i == 1 else f"es{i - 1}", f"m{i}",
        ).replace(f"ec{i} AS MATERIALIZED (", f"eac{i} AS MATERIALIZED (")
         .replace(f"ec{i} c", f"eac{i} c")
         .replace(f"ek{i}", f"eek{i}")
         .replace(f"es{i} AS (", f"es{i} AS (")
        for i in range(1, _BPE_N_MERGES + 1)
    )
    + """,
pt AS (SELECT doc_id, sym, count(*) AS n FROM es%d GROUP BY doc_id, sym),
tt AS (
  SELECT doc_id, sym AS top_tok, n AS top_tok_n FROM (
    SELECT doc_id, sym, n,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, sym) AS rn
    FROM pt
  ) WHERE rn = 1
),
ag AS (
  SELECT doc_id, count(DISTINCT widx) AS n_words, count(*) AS n_tokens,
         count(DISTINCT sym) AS n_distinct_toks
  FROM es%d GROUP BY doc_id
)
SELECT ag.doc_id, n_words, n_tokens, n_distinct_toks, top_tok, top_tok_n
FROM ag JOIN tt USING (doc_id)
""" % (_BPE_N_MERGES, _BPE_N_MERGES)
)

# q200: real-BPE sequence packing — the train chain + the encode chain
# over the % 11 slice, per-doc token counts, then q125's cumsum.
ORACLES["q200_bpe_sequence_packing"] = (
    "WITH " + _bpe_train_ctes(_BPE_TOP_V, _BPE_N_MERGES) + ",\n"
    + _bpe_encode_ctes("doc_id % 11 = 0") + ",\n"
    + ",\n".join(
        _bpe_apply_block(
            i, "e", ["doc_id", "widx"],
            "es0" if i == 1 else f"es{i - 1}", f"m{i}",
        ).replace(f"ec{i} AS MATERIALIZED (", f"eac{i} AS MATERIALIZED (")
         .replace(f"ec{i} c", f"eac{i} c")
         .replace(f"ek{i}", f"eek{i}")
        for i in range(1, _BPE_N_MERGES + 1)
    )
    + """,
nt AS (SELECT doc_id, count(*) AS ntok FROM es%d GROUP BY doc_id),
dl AS (SELECT doc_id, lang FROM documents WHERE doc_id %% 11 = 0),
toks AS (SELECT dl.lang, dl.doc_id, nt.ntok FROM dl JOIN nt USING (doc_id)),
packed AS (
  SELECT lang, ntok,
         sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM toks
)
SELECT lang,
       CAST(floor((cum - ntok) / 2048.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS tokens,
       round(sum(ntok) / 2048.0, 4) AS utilization
FROM packed
GROUP BY lang, CAST(floor((cum - ntok) / 2048.0) AS BIGINT)
""" % _BPE_N_MERGES
)

# q198: the image decode + perceptual hash replayed ANALYTICALLY —
# the oracle never touches bytes; it derives the 16x16 gradient the
# fixture wrote, folds the same integer block/mean/bit arithmetic to
# the hex hash, and computes near-dup pairs as the full bit-difference
# join (Hamming <= 3 pairs ARE the banded candidates by pigeonhole).
ORACLES["q198_image_phash_dedup"] = """
WITH ds AS MATERIALIZED (
  SELECT doc_id FROM documents WHERE doc_id % 23 = 9
),
px AS MATERIALIZED (
  SELECT doc_id, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
         (7 * doc_id + 3 * x + 5 * y + (x * y) % 13) % 256 AS v
  FROM ds,
       (SELECT unnest(range(0, 16)) AS x),
       (SELECT unnest(range(0, 16)) AS y)
),
blk AS MATERIALIZED (
  SELECT doc_id, x // 2 AS bx, y // 2 AS by, sum(v) // 4 AS bval
  FROM px GROUP BY doc_id, x // 2, y // 2
),
mn AS MATERIALIZED (
  SELECT doc_id, sum(bval) // 64 AS mean FROM blk GROUP BY doc_id
),
bits AS MATERIALIZED (
  SELECT b.doc_id, b.by, b.bx,
         CASE WHEN b.bval >= m.mean THEN 1 ELSE 0 END AS bit
  FROM blk b JOIN mn m ON b.doc_id = m.doc_id
),
bytes_ AS MATERIALIZED (
  SELECT doc_id, by,
         CAST(sum(bit * (1 << (7 - CAST(bx AS INT)))) AS INT) AS bv
  FROM bits GROUP BY doc_id, by
),
hashes AS MATERIALIZED (
  SELECT doc_id, string_agg(printf('%02x', bv), '' ORDER BY by) AS ahash
  FROM bytes_ GROUP BY doc_id
),
hash_face AS (
  SELECT 'hash' AS face, doc_id AS doc_a, CAST(-1 AS BIGINT) AS doc_b,
         ahash, CAST(31 AS BIGINT) AS m
  FROM hashes
),
ham AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT)
           AS m
  FROM bits a JOIN bits b
    ON a.by = b.by AND a.bx = b.bx AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pair_face AS (
  SELECT 'pair' AS face, doc_a, doc_b, '' AS ahash, m
  FROM ham WHERE m <= 3
)
SELECT * FROM hash_face
UNION ALL
SELECT * FROM pair_face
"""

# q205: video frame decode + per-frame aHash replayed analytically —
# the q198 arithmetic extended with the frame dimension; sampling at
# 250 ms against the 4 fps container visits every frame (ts 0/250/500/
# 750 -> idx 0..3); near-dups on frame 0 are the full bit-difference
# join (pigeonhole-exact at Hamming <= 3, like q198's pairs).
ORACLES["q205_video_frame_dedup"] = """
WITH ds AS MATERIALIZED (
  SELECT doc_id FROM documents WHERE doc_id % 31 = 6
),
px AS MATERIALIZED (
  SELECT doc_id, CAST(f AS BIGINT) AS f, CAST(x AS INT) AS x,
         CAST(y AS INT) AS y,
         (7 * doc_id + 3 * x + 5 * y + 11 * f + (x * y) % 13) % 256 AS v
  FROM ds,
       (SELECT unnest(range(0, 4)) AS f),
       (SELECT unnest(range(0, 16)) AS x),
       (SELECT unnest(range(0, 16)) AS y)
),
blk AS MATERIALIZED (
  SELECT doc_id, f, x // 2 AS bx, y // 2 AS by, sum(v) // 4 AS bval
  FROM px GROUP BY doc_id, f, x // 2, y // 2
),
mn AS MATERIALIZED (
  SELECT doc_id, f, sum(bval) // 64 AS mean FROM blk GROUP BY doc_id, f
),
bits AS MATERIALIZED (
  SELECT b.doc_id, b.f, b.by, b.bx,
         CASE WHEN b.bval >= m.mean THEN 1 ELSE 0 END AS bit
  FROM blk b JOIN mn m ON b.doc_id = m.doc_id AND b.f = m.f
),
bytes_ AS MATERIALIZED (
  SELECT doc_id, f, by,
         CAST(sum(bit * (1 << (7 - CAST(bx AS INT)))) AS INT) AS bv
  FROM bits GROUP BY doc_id, f, by
),
hashes AS MATERIALIZED (
  SELECT doc_id, f,
         string_agg(printf('%02x', bv), '' ORDER BY by) AS ahash
  FROM bytes_ GROUP BY doc_id, f
),
hash_face AS (
  SELECT 'hash' AS face, doc_id AS doc_a, f AS doc_b, ahash,
         CAST(f * 250 AS BIGINT) AS m
  FROM hashes
),
ham AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT)
           AS m
  FROM bits a JOIN bits b
    ON a.by = b.by AND a.bx = b.bx AND a.f = 0 AND b.f = 0
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pair_face AS (
  SELECT 'pair' AS face, doc_a, doc_b, '' AS ahash, m
  FROM ham WHERE m <= 3
)
SELECT * FROM hash_face
UNION ALL
SELECT * FROM pair_face
"""

# q195: the metastore pure-name read as set algebra + the constant
# catalog row (name only — paths are machine-local and never hashed).
ORACLES["q195_metastore_pure_name"] = """
WITH base AS (
  SELECT o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 13 = 1
)
SELECT 'live' AS face, status,
       count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS cents_sum
FROM base GROUP BY status
UNION ALL
SELECT 'catalog', 'q195_sales', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
"""

# q192: the general MERGE clause surface replayed as join algebra —
# matched even-source-cents rows update (first-match-wins), remaining
# matched rows delete, unmatched source rows with cents % 5 != 0
# insert, target rows that left the source purge (cents % 10 < 3) or
# flag (status || '_S').
ORACLES["q192_merge_conditional_clauses"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 7 = 1
),
src AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) + 11 AS cents
  FROM orders WHERE o_orderkey % 7 IN (1, 2) AND o_orderkey % 3 = 0
),
live AS (
  SELECT b.k, 'U' AS status, s.cents
  FROM base b JOIN src s ON b.k = s.k WHERE s.cents % 2 = 0
  UNION ALL
  SELECT s.k, 'I' AS status, s.cents
  FROM src s ANTI JOIN base b ON s.k = b.k WHERE s.cents % 5 <> 0
  UNION ALL
  SELECT b.k,
         CASE WHEN b.cents % 10 >= 3 THEN b.status || '_S' END AS status,
         b.cents
  FROM base b ANTI JOIN src s ON b.k = s.k WHERE b.cents % 10 >= 3
),
f AS (
  SELECT 'live' AS face, status, k, cents FROM live
  UNION ALL
  SELECT 'v0', status, k, cents FROM base
)
SELECT face, status,
       count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM f GROUP BY face, status
"""

# q193: INSERT OVERWRITE / replaceWhere as two-branch set algebra —
# live = untouched partitions + the backfill batch; v0 = the original;
# pruned = live restricted to the replaced partition.
ORACLES["q193_insert_overwrite_backfill"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderkey % 4 AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 9 = 2
),
live AS (
  SELECT k, d, cents FROM base WHERE d <> 2
  UNION ALL
  SELECT k, d, cents + 777 FROM base WHERE d = 2 AND k % 2 = 0
),
f AS (
  SELECT 'live' AS face, d, k, cents FROM live
  UNION ALL
  SELECT 'v0', d, k, cents FROM base
  UNION ALL
  SELECT 'pruned', d, k, cents FROM live WHERE d = 2
)
SELECT face, d,
       count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM f GROUP BY face, d
"""

# q194: hive-partitioned CONVERT as set algebra — v0 = the converted
# tree, live = v0 minus the post-convert delete, pruned = live's 'F'
# partition.
ORACLES["q194_convert_hive_partitioned"] = """
WITH v0 AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 11 = 0
),
live AS (
  SELECT * FROM v0 WHERE NOT (cents % 10 = 3 AND status = 'O')
),
f AS (
  SELECT 'live' AS face, status, k, cents FROM live
  UNION ALL
  SELECT 'v0', status, k, cents FROM v0
  UNION ALL
  SELECT 'pruned', status, k, cents FROM live WHERE status = 'F'
)
SELECT face, status,
       count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM f GROUP BY face, status
"""

ORACLES["q189_convert_in_place"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 3
),
live AS (
  SELECT * FROM v0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 4
),
f AS (
  SELECT 'live' AS face, o_orderstatus, o_orderkey, o_totalprice FROM live
  UNION ALL
  SELECT 'v0', o_orderstatus, o_orderkey, o_totalprice FROM v0
  UNION ALL
  SELECT 'pruned', o_orderstatus, o_orderkey, o_totalprice
  FROM live WHERE o_orderkey < 1000
)
SELECT face, o_orderstatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM f GROUP BY face, o_orderstatus
"""

# q190: DSIR importance weights replayed long-form — unnest bigrams,
# the certified md5 content hash mod 4096 buckets, raw/target bucket
# counts, the fixed-point integer-micros likelihood ratio via exact
# integer division, per-doc summed scores, top-5 per lang.
ORACLES["q190_dsir_importance_weights"] = f"""
WITH wdoc AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM wdoc
),
f AS (
  SELECT doc_id, lang,
         ({_hashed_tid_sql('gram')}) % 4096 AS b
  FROM g
),
tot AS (
  SELECT count(*) AS nraw,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ntgt
  FROM f
),
raw AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en' GROUP BY b),
w AS (
  SELECT raw.b,
         (1000000 * (COALESCE(tgt.ct, 0) + 1) * (tot.nraw + 4096))
           // ((raw.cr + 1) * (tot.ntgt + 4096)) AS w_micro
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot
),
scored AS (
  SELECT f.doc_id, f.lang,
         CAST(sum(w.w_micro) AS BIGINT) AS score_micro,
         count(*) AS n_grams
  FROM f JOIN w ON f.b = w.b
  GROUP BY f.doc_id, f.lang
)
SELECT lang, doc_id, rank, score_micro, n_grams FROM (
  SELECT lang, doc_id, score_micro, n_grams,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 5
"""

# q191: the line gates over REAL newlines — the multi-line view rebuilt
# char-identically (newline before token i>1 when (i-1)%3=0), then the
# q187 long-form machinery over string_split(text2, newline).
ORACLES["q191_line_gates_real_newlines"] = """
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
t2 AS (
  SELECT doc_id, lang,
         array_to_string(list_transform(range(1, len(ws) + 1),
           i -> CASE WHEN i = 1 THEN ws[i]
                     WHEN (i - 1) % 3 = 0 THEN chr(10) || ws[i]
                     ELSE ' ' || ws[i] END), '') AS text2
  FROM w
),
g AS (
  SELECT doc_id, lang, text2,
         string_split(text2, chr(10)) AS lines
  FROM t2
),
cl AS (SELECT doc_id, line, count(*) AS c
       FROM (SELECT doc_id, unnest(lines) AS line FROM g)
       GROUP BY doc_id, line),
la AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
              count(*) AS dn,
              CAST(sum(CASE WHEN c >= 2 THEN c * length(line)
                            ELSE 0 END) AS BIGINT) AS dupchars
       FROM cl GROUP BY doc_id),
tl AS (SELECT doc_id, bc, bg FROM (
         SELECT doc_id, c AS bc, line AS bg,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, line ASC) AS rn
         FROM cl) WHERE rn = 1),
m AS (
  SELECT g.lang,
         CASE WHEN la.total > 0 THEN
           CAST(floor((la.total - la.dn) * 10000 / la.total) AS BIGINT)
         ELSE 0 END AS dupline_bp,
         CASE WHEN la.total > 0 AND length(g.text2) > 0 THEN
           CAST(floor(la.dupchars * CAST(10000 AS BIGINT)
                / length(g.text2)) AS BIGINT)
         ELSE 0 END AS duplinec_bp,
         CASE WHEN tl.bc IS NOT NULL AND length(g.text2) > 0 THEN
           CAST(floor(tl.bc * length(tl.bg) * CAST(10000 AS BIGINT)
                / length(g.text2)) AS BIGINT)
         ELSE 0 END AS topline_bp
  FROM g
  LEFT JOIN la USING (doc_id)
  LEFT JOIN tl USING (doc_id)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dupline_bp > 3000 OR duplinec_bp > 2000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(dupline_bp) AS BIGINT) AS dupline_sum,
       CAST(SUM(duplinec_bp) AS BIGINT) AS duplinec_sum,
       CAST(SUM(topline_bp) AS BIGINT) AS topline_sum,
       CAST(MAX(dupline_bp) AS BIGINT) AS dupline_max
FROM m GROUP BY lang
"""

# q187: the Gopher character-fraction gates replayed in DuckDB's
# NATURAL form — grams/lines unnested once into long form, counts by
# (doc, gram), top gram = row_number over (count desc, gram asc) (the
# same max-multiplicity/smallest-string tie rule as the engine's
# sorted-run fold), duplicated chars = sum over recurring grams of
# count * length (overlaps double-count, same as the engine). The
# first cut used per-distinct list_filter lambdas — O(distinct x
# grams) per doc, 56 s at sf0.1 vs ~1 s for this form; an oracle that
# slow would sandbag the DuckDB baseline the bench compares against.
ORACLES["q187_gopher_char_gates"] = """
WITH w AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, lang, text,
         list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i + 1]) AS g2,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
           AS g3,
         list_transform(range(1, len(ws) - 2),
                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                             || ' ' || ws[i + 3]) AS g4,
         list_transform(range(0, (len(ws) + 4) // 5),
                        i -> array_to_string(
                               list_slice(ws, i * 5 + 1, i * 5 + 5), ' '))
           AS lines
  FROM w
),
c2 AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram),
c3 AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY doc_id, gram),
c4 AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(g4) AS gram FROM g) GROUP BY doc_id, gram),
t2 AS (SELECT doc_id, bc, bg FROM (
         SELECT doc_id, c AS bc, gram AS bg,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, gram ASC) AS rn
         FROM c2) WHERE rn = 1),
t3 AS (SELECT doc_id, bc, bg FROM (
         SELECT doc_id, c AS bc, gram AS bg,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, gram ASC) AS rn
         FROM c3) WHERE rn = 1),
t4 AS (SELECT doc_id, bc, bg FROM (
         SELECT doc_id, c AS bc, gram AS bg,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, gram ASC) AS rn
         FROM c4) WHERE rn = 1),
cl AS (SELECT doc_id, line, count(*) AS c
       FROM (SELECT doc_id, unnest(lines) AS line FROM g)
       GROUP BY doc_id, line),
la AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
              count(*) AS dn,
              CAST(sum(CASE WHEN c >= 2 THEN c * length(line)
                            ELSE 0 END) AS BIGINT) AS dupchars
       FROM cl GROUP BY doc_id),
m AS (
  SELECT g.lang,
         CASE WHEN t2.bc IS NOT NULL AND length(g.text) > 0 THEN
           CAST(floor(t2.bc * length(t2.bg) * CAST(10000 AS BIGINT)
                / length(g.text)) AS BIGINT)
         ELSE 0 END AS top2c_bp,
         CASE WHEN t3.bc IS NOT NULL AND length(g.text) > 0 THEN
           CAST(floor(t3.bc * length(t3.bg) * CAST(10000 AS BIGINT)
                / length(g.text)) AS BIGINT)
         ELSE 0 END AS top3c_bp,
         CASE WHEN t4.bc IS NOT NULL AND length(g.text) > 0 THEN
           CAST(floor(t4.bc * length(t4.bg) * CAST(10000 AS BIGINT)
                / length(g.text)) AS BIGINT)
         ELSE 0 END AS top4c_bp,
         CASE WHEN la.total > 0 THEN
           CAST(floor((la.total - la.dn) * 10000 / la.total) AS BIGINT)
         ELSE 0 END AS dupline_bp,
         CASE WHEN la.total > 0 AND length(g.text) > 0 THEN
           CAST(floor(la.dupchars * CAST(10000 AS BIGINT)
                / length(g.text)) AS BIGINT)
         ELSE 0 END AS duplinec_bp
  FROM g
  LEFT JOIN t2 USING (doc_id)
  LEFT JOIN t3 USING (doc_id)
  LEFT JOIN t4 USING (doc_id)
  LEFT JOIN la USING (doc_id)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN top2c_bp > 2000 OR top3c_bp > 1800
                      OR top4c_bp > 1600 OR dupline_bp > 3000
                      OR duplinec_bp > 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(top2c_bp) AS BIGINT) AS top2c_sum,
       CAST(SUM(top3c_bp) AS BIGINT) AS top3c_sum,
       CAST(SUM(top4c_bp) AS BIGINT) AS top4c_sum,
       CAST(SUM(dupline_bp) AS BIGINT) AS dupline_sum,
       CAST(SUM(duplinec_bp) AS BIGINT) AS duplinec_sum,
       CAST(MAX(top2c_bp) AS BIGINT) AS top2c_max
FROM m GROUP BY lang
"""

# q157 replays product quantization end to end: the same LCG codebooks as
# literals (CAST to DOUBLE[][][] — bare float literals would parse as
# DECIMAL), codes re-derived per subspace as list_position-of-list_min
# (first occurrence = smallest code, the struct-min tie rule), and the
# ADC distance as index-order list_sum folds — Spark's aggregate/zip_with
# and the driver-side Python table build fold the same order, so every
# double is bit-identical before the 6-decimal display rounding.
_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8
_PQ_CB = pq_codebooks(_PQ_M * _PQ_SUB, _PQ_M, _PQ_K)
_PQ_CB_LIT = (
    "CAST(["
    + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(f"{x!r}" for x in w) + "]" for w in words
        ) + "]"
        for words in _PQ_CB
    )
    + "] AS DOUBLE[][][])"
)
# d2 of relation alias {a}'s subspace s (1-based SQL var) to codeword c
_PQ_D2 = (
    "list_sum(list_transform(range(1, {n}), i -> "
    "({a}.e[(s-1)*{sub} + i] - b[s][{c}][i])"
    " * ({a}.e[(s-1)*{sub} + i] - b[s][{c}][i])))"
).format
_PQ_DLIST = (
    f"list_transform(range(1, {_PQ_K + 1}), c -> "
    + _PQ_D2(n=_PQ_SUB + 1, a="v", sub=_PQ_SUB, c="c")
    + ")"
)
ORACLES["q157_pq_adc_topk"] = f"""
WITH {_VEC_CTE},
cb AS (SELECT {_PQ_CB_LIT} AS b),
enc AS (
  SELECT v.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_PQ_DLIST}, list_min({_PQ_DLIST})) - 1
         ) AS codes
  FROM v, cb
),
pairs AS (
  SELECT v.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           {_PQ_D2(n=_PQ_SUB + 1, a="v", sub=_PQ_SUB, c="c.codes[s] + 1")}
         )) AS d2
  FROM v JOIN enc c ON v.vec_id < 8 AND c.vec_id <> v.vec_id, cb
),
r AS (
  SELECT query_id, cand_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
           AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, round(d2, 6) AS d2 FROM r WHERE rank <= 5
"""

# q164: the incremental index must equal the FULL re-derivation — the
# oracle is q157's encode + ADC shape with the query window moved to
# 8..15 and the delta-generation tag (cand_id % 4 = 0, the slice that
# arrived via pq_encode_delta + append).
ORACLES["q164_pq_incremental_index"] = f"""
WITH {_VEC_CTE},
cb AS (SELECT {_PQ_CB_LIT} AS b),
enc AS (
  SELECT v.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_PQ_DLIST}, list_min({_PQ_DLIST})) - 1
         ) AS codes
  FROM v, cb
),
pairs AS (
  SELECT v.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           {_PQ_D2(n=_PQ_SUB + 1, a="v", sub=_PQ_SUB, c="c.codes[s] + 1")}
         )) AS d2
  FROM v JOIN enc c
    ON v.vec_id >= 8 AND v.vec_id < 16 AND c.vec_id <> v.vec_id, cb
),
r AS (
  SELECT query_id, cand_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
           AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, round(d2, 6) AS d2,
       (cand_id % 4 = 0) AS from_delta
FROM r WHERE rank <= 5
"""

# q168: IVF-PQ — q27's centroid-assign CTEs composed with q157's
# code/ADC CTEs; candidates fenced to each query's 2 probed cells, then
# ranked by the same index-order ADC fold.
ORACLES["q168_ivfpq_topk"] = f"""
WITH {_VEC_CTE},
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 4),
ca AS {_centroid_assign_sql("", 1)},
qa AS {_centroid_assign_sql("WHERE a.vec_id >= 16 AND a.vec_id < 24", 2)},
cb AS (SELECT {_PQ_CB_LIT} AS b),
enc AS (
  SELECT v.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_PQ_DLIST}, list_min({_PQ_DLIST})) - 1
         ) AS codes
  FROM v, cb
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           {_PQ_D2(n=_PQ_SUB + 1, a="q", sub=_PQ_SUB, c="e2.codes[s] + 1")}
         )) AS d2
  FROM qa q JOIN ca c USING (cid) JOIN enc e2 ON e2.vec_id = c.vec_id, cb
  WHERE c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, cand_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
           AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, round(d2, 6) AS d2 FROM r WHERE rank <= 5
"""

# q171: RESIDUAL IVF-PQ with TRAINED codebooks, re-derived END TO END —
# cell assignment (q27's cosine contract), residuals r = e - ce, one
# integer-quantized training round per subspace starting from the q157
# seed literals (q145's floor(x*1e6) int64-sum contract, empty codewords
# keep their seed), encode via list_position-of-list_min against the
# TRAINED words, then per-(query, probed-cell) asymmetric distance
# ||(q - c) - decode||² as index-order folds. Spark serves the same
# values from the persisted manifest index + persisted trained books, so
# a hash match certifies training determinism, incremental maintenance,
# and serving at once.
_RPQ_RD2 = (
    "list_sum(list_transform(range(1, {n}), i -> "
    "(res.r[(s-1)*{sub} + i] - {w})"
    " * (res.r[(s-1)*{sub} + i] - {w})))"
).format
_RPQ_SEED_DLIST = (
    f"list_transform(range(1, {_PQ_K + 1}), c -> "
    + _RPQ_RD2(n=_PQ_SUB + 1, sub=_PQ_SUB, w="b[s][c][i]")
    + ")"
)
_RPQ_TRAINED_DLIST = (
    f"list_transform(range(1, {_PQ_K + 1}), c -> "
    + _RPQ_RD2(n=_PQ_SUB + 1, sub=_PQ_SUB, w="tb[s][c][i]")
    + ")"
)
ORACLES["q171_ivfpq_residual_topk"] = f"""
WITH {_VEC_CTE},
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 4),
ca AS {_centroid_assign_sql("", 1)},
res AS (
  SELECT ca.vec_id, ca.cid,
         list_transform(range(1, 65), i -> ca.e[i] - c.ce[i]) AS r
  FROM ca JOIN cent c USING (cid)
),
cb AS (SELECT {_PQ_CB_LIT} AS b),
ta AS (
  SELECT res.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_RPQ_SEED_DLIST}, list_min({_RPQ_SEED_DLIST})) - 1
         ) AS tcodes
  FROM res, cb
),
tac AS (
  SELECT ta.vec_id, t.s, ta.tcodes[t.s] AS code
  FROM ta, range(1, {_PQ_M + 1}) AS t(s)
),
ud AS (
  SELECT tac.s, tac.code, u.i,
         SUM(CAST(floor(res.r[(tac.s - 1) * {_PQ_SUB} + u.i] * 1000000.0)
             AS BIGINT)) AS s6,
         COUNT(*) AS nn
  FROM tac JOIN res USING (vec_id), range(1, {_PQ_SUB + 1}) AS u(i)
  GROUP BY tac.s, tac.code, u.i
),
tw0 AS (
  SELECT s, code, list(CAST(s6 AS DOUBLE) / 1000000.0 / nn ORDER BY i) AS w
  FROM ud GROUP BY s, code
),
tw AS (
  SELECT g.s, g.code,
         COALESCE(tw0.w,
           list_transform(range(1, {_PQ_SUB + 1}),
                          i -> b[g.s][g.code + 1][i])) AS w
  FROM (SELECT t.s, c.code
        FROM range(1, {_PQ_M + 1}) AS t(s), range(0, {_PQ_K}) AS c(code)) g
  CROSS JOIN cb
  LEFT JOIN tw0 ON tw0.s = g.s AND tw0.code = g.code
),
twa AS (
  SELECT list(wl ORDER BY s) AS tb
  FROM (SELECT s, list(w ORDER BY code) AS wl FROM tw GROUP BY s)
),
enc AS (
  SELECT res.vec_id, res.cid,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_RPQ_TRAINED_DLIST},
                         list_min({_RPQ_TRAINED_DLIST})) - 1
         ) AS codes
  FROM res, twa
),
qa AS {_centroid_assign_sql("WHERE a.vec_id >= 32 AND a.vec_id < 40", 2)},
qres AS (
  SELECT qa.vec_id AS query_id, qa.cid,
         list_transform(range(1, 65), i -> qa.e[i] - c.ce[i]) AS qr
  FROM qa JOIN cent c USING (cid)
),
pairs AS (
  SELECT q.query_id, c2.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           list_sum(list_transform(range(1, {_PQ_SUB + 1}), i ->
             (q.qr[(s-1)*{_PQ_SUB} + i] - tb[s][c2.codes[s] + 1][i])
             * (q.qr[(s-1)*{_PQ_SUB} + i] - tb[s][c2.codes[s] + 1][i])))
         )) AS d2
  FROM qres q JOIN enc c2 ON c2.cid = q.cid AND c2.vec_id <> q.query_id, twa
),
r AS (
  SELECT query_id, cand_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
           AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, round(d2, 6) AS d2 FROM r WHERE rank <= 5
"""

# q188: the residual IVF-PQ + exact-cosine REFINE recipe replayed end to
# end — q171's training/encode/ADC CTEs with the query window at 40..47,
# the candidate cut at k*overfetch = 20, then q160's rescored-cosine
# tail over exactly that candidate set. A hash match certifies the whole
# production recipe (persisted index serve + refine) in one gate.
ORACLES["q188_residual_rerank_topk"] = f"""
WITH {_VEC_CTE},
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 4),
ca AS {_centroid_assign_sql("", 1)},
res AS (
  SELECT ca.vec_id, ca.cid,
         list_transform(range(1, 65), i -> ca.e[i] - c.ce[i]) AS r
  FROM ca JOIN cent c USING (cid)
),
cb AS (SELECT {_PQ_CB_LIT} AS b),
ta AS (
  SELECT res.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_RPQ_SEED_DLIST}, list_min({_RPQ_SEED_DLIST})) - 1
         ) AS tcodes
  FROM res, cb
),
tac AS (
  SELECT ta.vec_id, t.s, ta.tcodes[t.s] AS code
  FROM ta, range(1, {_PQ_M + 1}) AS t(s)
),
ud AS (
  SELECT tac.s, tac.code, u.i,
         SUM(CAST(floor(res.r[(tac.s - 1) * {_PQ_SUB} + u.i] * 1000000.0)
             AS BIGINT)) AS s6,
         COUNT(*) AS nn
  FROM tac JOIN res USING (vec_id), range(1, {_PQ_SUB + 1}) AS u(i)
  GROUP BY tac.s, tac.code, u.i
),
tw0 AS (
  SELECT s, code, list(CAST(s6 AS DOUBLE) / 1000000.0 / nn ORDER BY i) AS w
  FROM ud GROUP BY s, code
),
tw AS (
  SELECT g.s, g.code,
         COALESCE(tw0.w,
           list_transform(range(1, {_PQ_SUB + 1}),
                          i -> b[g.s][g.code + 1][i])) AS w
  FROM (SELECT t.s, c.code
        FROM range(1, {_PQ_M + 1}) AS t(s), range(0, {_PQ_K}) AS c(code)) g
  CROSS JOIN cb
  LEFT JOIN tw0 ON tw0.s = g.s AND tw0.code = g.code
),
twa AS (
  SELECT list(wl ORDER BY s) AS tb
  FROM (SELECT s, list(w ORDER BY code) AS wl FROM tw GROUP BY s)
),
enc AS (
  SELECT res.vec_id, res.cid,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_RPQ_TRAINED_DLIST},
                         list_min({_RPQ_TRAINED_DLIST})) - 1
         ) AS codes
  FROM res, twa
),
qa AS {_centroid_assign_sql("WHERE a.vec_id >= 40 AND a.vec_id < 48", 2)},
qres AS (
  SELECT qa.vec_id AS query_id, qa.cid,
         list_transform(range(1, 65), i -> qa.e[i] - c.ce[i]) AS qr
  FROM qa JOIN cent c USING (cid)
),
pairs AS (
  SELECT q.query_id, c2.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           list_sum(list_transform(range(1, {_PQ_SUB + 1}), i ->
             (q.qr[(s-1)*{_PQ_SUB} + i] - tb[s][c2.codes[s] + 1][i])
             * (q.qr[(s-1)*{_PQ_SUB} + i] - tb[s][c2.codes[s] + 1][i])))
         )) AS d2
  FROM qres q JOIN enc c2 ON c2.cid = q.cid AND c2.vec_id <> q.query_id, twa
),
cand AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
             AS r
    FROM pairs
  ) WHERE r <= 20
),
rescored AS (
  SELECT ca.query_id, ca.cand_id,
         {_COS.format(q='q', c='c')} AS cos
  FROM cand ca
  JOIN n q ON q.vec_id = ca.query_id
  JOIN n c ON c.vec_id = ca.cand_id
)
SELECT query_id, cand_id, rank, round(cos, 6) AS cos FROM (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id)
           AS rank
  FROM rescored
) WHERE rank <= 5
"""

# q160 replays the two-stage PQ recipe: q157's code/ADC CTEs cut at
# k*overfetch = 20 candidates, then the q19-contract cosine over exactly
# that candidate set, top-5 per query.
ORACLES["q160_pq_rerank_topk"] = f"""
WITH {_VEC_CTE},
cb AS (SELECT {_PQ_CB_LIT} AS b),
enc AS (
  SELECT v.vec_id,
         list_transform(range(1, {_PQ_M + 1}), s ->
           list_position({_PQ_DLIST}, list_min({_PQ_DLIST})) - 1
         ) AS codes
  FROM v, cb
),
pairs AS (
  SELECT v.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, {_PQ_M + 1}), s ->
           {_PQ_D2(n=_PQ_SUB + 1, a="v", sub=_PQ_SUB, c="c.codes[s] + 1")}
         )) AS d2
  FROM v JOIN enc c ON v.vec_id < 8 AND c.vec_id <> v.vec_id, cb
),
cand AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
             AS r
    FROM pairs
  ) WHERE r <= 20
),
rescored AS (
  SELECT ca.query_id, ca.cand_id,
         {_COS.format(q='q', c='c')} AS cos
  FROM cand ca
  JOIN n q ON q.vec_id = ca.query_id
  JOIN n c ON c.vec_id = ca.cand_id
)
SELECT query_id, cand_id, rank, round(cos, 6) AS cos FROM (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id)
           AS rank
  FROM rescored
) WHERE rank <= 5
"""

# q155: longest shared token run per doc pair — 5-token windows equi-join
# on the gram string, gaps-and-islands per (pair, diagonal). All-integer.
# DuckDB's list_slice / range are 1-based inclusive, mirroring Spark's
# 1-based slice(a, i, w) exactly.
ORACLES["q155_shared_run_pairs"] = """
WITH arr AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         list_aggregate(list_slice(a, i, i + 4), 'string_agg', ' ') AS gram
  FROM arr, unnest(range(1, len(a) - 3)) AS t(i)
  WHERE len(a) >= 5
),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
),
islands AS (
  SELECT a, b, pa - pb AS diag, pa,
         pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
  FROM p
),
runs AS (
  SELECT a, b, count(*) AS run FROM islands GROUP BY a, b, diag, grp
)
SELECT a AS doc_a, b AS doc_b, CAST(max(run) + 4 AS BIGINT) AS run_tokens
FROM runs GROUP BY a, b HAVING max(run) + 4 >= 8
"""

# q154 replays BM25 in SQL with the same expression SHAPE as the Spark
# side: each (doc, term) weight is one deterministic arithmetic expression
# over exact integers + the single avgdl division, snapped to integer
# micro-units BEFORE the per-doc sum — float summation order (which
# neither engine fixes) never touches the certified values.
ORACLES["q154_bm25_retrieval"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tot AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
q AS (SELECT unnest(['merge', 'scan', 'window']) AS term),
tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t JOIN q USING (term) GROUP BY t.doc_id, t.term
),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / tot.avgdl)))
             * 1000000.0
         ) AS BIGINT) AS w_micro
  FROM tf
  JOIN dfq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id, count(*) AS n_terms, CAST(sum(w_micro) AS BIGINT) AS score_micro
  FROM w GROUP BY doc_id
)
SELECT doc_id, n_terms, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
FROM scored
ORDER BY rnk LIMIT 10
"""

# q159: the streamed CDF images of the q151 fixture fold to exactly the
# post-merge state, so the oracle replays the merge as set algebra and
# aggregates that final state; net_violations is 0 by the fold contract.
ORACLES["q159_manifest_cdf_stream_fold"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0
),
batch AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 5 = 0
),
v1 AS (
  SELECT * FROM v0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
  UNION ALL
  SELECT * FROM batch
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
       CAST(0 AS BIGINT) AS net_violations
FROM v1
"""

# q161: the dv lifecycle replayed as set algebra over orders — pre
# (the % 4 == 2 slice), post (minus % 9 == 0), and the pruned read
# (BETWEEN over post). Vectors change physical layout, never values.
ORACLES["q161_manifest_deletion_vectors"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 2
),
v1 AS (
  SELECT * FROM v0 WHERE o_orderkey % 9 <> 0
)
SELECT 'pre_delete' AS snapshot, count(*) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
       count(DISTINCT o_orderstatus) AS n_status
FROM v0
UNION ALL
SELECT 'post_delete', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM v1
UNION ALL
SELECT 'post_delete_pruned', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM v1 WHERE o_orderkey BETWEEN 100 AND 5000
"""

# q162: RESTORE replayed as set algebra — the restored latest equals the
# v1 state (both slices, every row back after the dv un-delete), the bad
# v2 snapshot stays travelable (minus % 7 == 0), pruning composes.
ORACLES["q162_manifest_restore"] = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 IN (1, 3)
),
v2 AS (
  SELECT * FROM v1 WHERE o_orderkey % 7 <> 0
)
SELECT 'restored' AS snapshot, count(*) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
       count(DISTINCT o_orderstatus) AS n_status
FROM v1
UNION ALL
SELECT 'bad_delete', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM v2
UNION ALL
SELECT 'restored_pruned', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey), count(DISTINCT o_orderstatus)
FROM v1 WHERE o_orderkey BETWEEN 100 AND 5000
"""

# q163: the SQL-view face of the q148 lifecycle — v1 EXCEPT v2 is exactly
# the deleted slice: v1 = keys % 3 IN (0, 1), delete = o_totalprice >
# 200000 (see _manifest_orders_lifecycle_path).
ORACLES["q163_manifest_sql_view"] = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n_deleted,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS deleted_cents,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key
FROM orders
WHERE o_orderkey % 3 IN (0, 1) AND o_totalprice > 200000
GROUP BY o_orderstatus
ORDER BY status
"""

# q158 fuses the q154 BM25 ranking (cut at 20) with the q19-contract
# dense cosine ranking for query vec 0 via fixed-point reciprocal rank
# fusion: floor(1e9/(60+rank)) per system, absent -> 0 — all-integer, so
# the fusion carries no float discipline of its own.
ORACLES["q158_hybrid_rrf_retrieval"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tot AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
q AS (SELECT unnest(['merge', 'scan', 'window']) AS term),
tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM toks t JOIN q USING (term) GROUP BY t.doc_id, t.term
),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / tot.avgdl)))
             * 1000000.0
         ) AS BIGINT) AS w_micro
  FROM tf
  JOIN dfq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id, CAST(sum(w_micro) AS BIGINT) AS score_micro
  FROM w GROUP BY doc_id
),
bm AS (
  SELECT doc_id, bm25_rank FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT)
             AS bm25_rank
    FROM scored
  ) WHERE bm25_rank <= 20
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
),
s AS (
  SELECT c.vec_id AS doc_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (q.nrm * c.nrm) AS cos
  FROM n q, n c
  WHERE q.vec_id = 0 AND c.vec_id <> 0
),
dense AS (
  SELECT doc_id, dense_rank FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT)
             AS dense_rank
    FROM s
  ) WHERE dense_rank <= 20
),
f AS (
  SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
         COALESCE(b.bm25_rank, 0) AS bm25_rank,
         COALESCE(d.dense_rank, 0) AS dense_rank,
         CAST(COALESCE(1000000000 // (60 + b.bm25_rank), 0)
            + COALESCE(1000000000 // (60 + d.dense_rank), 0) AS BIGINT)
           AS rrf_micro
  FROM bm b FULL OUTER JOIN dense d ON b.doc_id = d.doc_id
)
SELECT doc_id, bm25_rank, dense_rank, rrf_micro,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT) AS rnk
FROM f
ORDER BY rnk LIMIT 10
"""

# q153 replays SemDeDup in SQL: the q140 assignment CTE (exact index-order
# squared-L2 fold, ties to the smaller centroid id) fences the threshold
# join inside clusters; a pruned vector is one with ANY earlier-id
# same-cluster neighbor at cosine >= 0.30. All outputs are integers; the
# corpus's nearest cosine to the threshold is >=5.9e-7 at every SF, so
# BLAS-vs-fold ulp differences cannot flip a comparison.
ORACLES["q153_semdedup_prune"] = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v WHERE list_sum(list_transform(e, x -> x * x)) > 0
),
s AS (
  SELECT vec_id AS cluster, e AS se FROM v WHERE vec_id < 8
),
d AS (
  SELECT n.vec_id, s.cluster,
         list_sum(list_transform(range(1, len(n.e) + 1),
                                 i -> (n.e[i] - s.se[i]) * (n.e[i] - s.se[i])))
           AS d2
  FROM n, s
),
a AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d
),
asg AS (
  SELECT n.vec_id, n.e, n.nrm, a.cluster
  FROM n JOIN a ON a.vec_id = n.vec_id AND a.rn = 1
),
sup AS (
  SELECT hi.vec_id, hi.cluster, lo.vec_id AS sup_id
  FROM asg hi JOIN asg lo
    ON hi.cluster = lo.cluster AND lo.vec_id < hi.vec_id
   AND list_sum(list_transform(range(1, len(hi.e) + 1),
                               i -> hi.e[i] * lo.e[i]))
         / (hi.nrm * lo.nrm) >= 0.30
)
SELECT vec_id, CAST(cluster AS INT) AS cluster,
       count(*) AS n_suppressors, min(sup_id) AS keeper_id
FROM sup GROUP BY vec_id, cluster
"""

# q151 replays the atomic MERGE as set algebra: matched keys (the %3==0
# subset of the base slice) take the batch's updated price, new keys
# (%4==1 AND %5==0) append, everything else carries — proving merge_upsert
# changed exactly the intended rows and nothing else, across time travel.
ORACLES["q151_manifest_merge_upsert"] = """
WITH v0 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0
),
batch AS (
  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 5 = 0
),
v1 AS (
  SELECT * FROM v0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
  UNION ALL
  SELECT * FROM batch
)
SELECT 'pre_merge' AS snapshot, count(*) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM v0
UNION ALL
SELECT 'post_merge', count(*),
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       min(o_orderkey), max(o_orderkey)
FROM v1
"""

# q165: the multi-column z-order read is cover-and-refine, so the oracle
# is the plain 2-predicate filter + aggregate over raw orders — any
# pruning divergence would change the values.
ORACLES["q165_zorder_multicol_scan"] = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders
WHERE o_custkey BETWEEN 100 AND 500
  AND o_totalprice BETWEEN 50000.0 AND 150000.0
GROUP BY o_orderstatus
"""

# q166: q122's production twin — fine grid (divisor 720), hot-cell cap
# (cells with > 64 users dropped from the pairing join only; sizes stay
# exact, jaccard a lower bound), deterministic global top-20.
ORACLES["q166_trajectory_join_finegrid"] = """
WITH cells AS (
  SELECT DISTINCT user_id,
         ((event_id * 7919 % 36000) // 720) * 1000
           + ((event_id * 104729 % 18000) // 720) AS cell
  FROM events
),
sizes AS (SELECT user_id, count(*) AS n_cells FROM cells GROUP BY user_id),
hot AS (SELECT cell FROM cells GROUP BY cell HAVING count(*) > 64),
joinable AS (
  SELECT * FROM cells WHERE cell NOT IN (SELECT cell FROM hot)
),
inter AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_common
  FROM joinable a JOIN joinable b
    ON a.cell = b.cell AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)
SELECT user_a, user_b, n_common,
       round(n_common / (sa.n_cells + sb.n_cells - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.user_id = user_a
JOIN sizes sb ON sb.user_id = user_b
ORDER BY jaccard DESC, user_a, user_b
LIMIT 20
"""

# q167: the whole bronze->CDF->silver chain folds to set algebra — base
# slice % 5 = 0, even keys +1.00 by the merge, % 5 = 1 added, % 7 = 0
# dv-deleted; silver must equal that live state exactly.
ORACLES["q167_multihop_cdf_pipeline"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 0
),
merged AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM base
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 1
),
live AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key,
       COUNT(DISTINCT o_orderkey) AS n_keys
FROM live
GROUP BY o_orderstatus
"""


# q169: SQ8 replayed end to end — per-dim [lo, hi] calibration (cross
# join v x dims, group by dim), floor(x+0.5) code snapping, and the
# term-for-term reconstruction distance (q_i - (lo_i + code_i*s255_i)),
# all index-order folds.
ORACLES["q169_sq8_adc_topk"] = f"""
WITH {_VEC_CTE},
dims AS (SELECT unnest(range(1, 65)) AS i),
cal AS (SELECT i, min(e[i]) AS lo, max(e[i]) AS hi FROM v, dims GROUP BY i),
arrs AS (
  SELECT list(lo ORDER BY i) AS lo_a,
         list(CASE WHEN hi > lo THEN hi - lo ELSE 1.0 END ORDER BY i)
           AS span_a,
         list((hi - lo) / 255 ORDER BY i) AS s255_a
  FROM cal
),
enc AS (
  SELECT v.vec_id,
         list_transform(range(1, 65), i ->
           least(255, greatest(0, CAST(floor(
             (e[i] - lo_a[i]) / span_a[i] * 255 + 0.5) AS INT)))) AS codes
  FROM v, arrs
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, 65), i ->
           pow(q.e[i] - (lo_a[i] + c.codes[i] * s255_a[i]), 2))) AS d2
  FROM v q JOIN enc c ON c.vec_id <> q.vec_id, arrs
  WHERE q.vec_id >= 24 AND q.vec_id < 32
),
r AS (
  SELECT query_id, cand_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
           AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, round(d2, 6) AS d2 FROM r WHERE rank <= 5
"""

# q170: the recorded instant resolves to v0 (the % 11 slice); live = v0
# minus the o_totalprice > 150000 delete.
ORACLES["q170_timestamp_asof_read"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 0
),
live AS (SELECT * FROM v0 WHERE NOT (o_totalprice > 150000.0))
SELECT 'as_of' AS snapshot, COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
FROM v0
UNION ALL
SELECT 'live', COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey)
FROM live
"""

# q176: the SQL DML lifecycle as set algebra — insert = union, update =
# CASE, merge upsert = anti-join + union of the source, delete = filter.
# The *2 and +10 arithmetic are single IEEE double ops both engines
# compute bit-identically from the same parquet doubles.
ORACLES["q176_sql_dml_lifecycle"] = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1
),
inserted AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 2
),
v1 AS (SELECT * FROM base UNION ALL SELECT * FROM inserted),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM v1
),
src AS (
  SELECT o_orderkey, 'M' AS o_orderstatus,
         o_totalprice + CAST(10 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 8 IN (1, 3)
),
v3 AS (
  SELECT * FROM v2
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL SELECT * FROM src
),
final AS (SELECT * FROM v3 WHERE o_orderkey % 5 <> 0)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key
FROM final GROUP BY o_orderstatus
"""

# q177: column mapping as set algebra — v0 = the init slice; live = init
# union the post-rename append, minus the % 7 delete; pruned = live
# filtered on the renamed column. The `cols` strings certify each
# snapshot's OWN column names inside the hashed values.
ORACLES["q177_column_mapping_timetravel"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT o_orderkey, o_totalprice FROM v0
  UNION ALL
  SELECT o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 1
),
live AS (SELECT * FROM v2 WHERE o_orderkey % 7 <> 0)
SELECT 'v0_pre_rename' AS snapshot,
       'o_orderkey,o_orderstatus,o_totalprice' AS cols,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
FROM v0
UNION ALL
SELECT 'live', 'o_orderkey,amount', COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey)
FROM live
UNION ALL
SELECT 'live_pruned', 'o_orderkey,amount', COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey)
FROM live WHERE o_totalprice BETWEEN 50000.0 AND 150000.0
"""

# q178: the writer/parser round-trip's closed form — the same doc_id
# arithmetic the generator used, so any byte-level disagreement between
# build_* and parse_media_header breaks parity.
ORACLES["q178_media_header_decode"] = """
WITH m AS (
  SELECT doc_id % 4 AS k,
         1 + (doc_id * 31 + 7) % 509 AS w,
         1 + (doc_id * 17 + 3) % 383 AS h,
         ((100 + doc_id % 400) * 1000) // (8000 + (doc_id % 5) * 1000)
           AS dur
  FROM documents
)
SELECT CASE k
         WHEN 0 THEN 'image/bmp'
         WHEN 1 THEN 'image/png'
         WHEN 2 THEN 'image/x-portable-pixmap'
         ELSE 'audio/wav'
       END AS mime,
       COUNT(*) AS n_media,
       CAST(SUM(CASE WHEN k = 3 THEN NULL ELSE w END) AS BIGINT)
         AS width_sum,
       CAST(SUM(CASE WHEN k = 3 THEN NULL ELSE h END) AS BIGINT)
         AS height_sum,
       CAST(SUM(CASE WHEN k = 3 THEN dur ELSE NULL END) AS BIGINT)
         AS duration_ms_sum,
       CAST(MIN(CASE WHEN k = 3 THEN NULL ELSE w END) AS BIGINT)
         AS width_min,
       CAST(MAX(CASE WHEN k = 3 THEN NULL ELSE w END) AS BIGINT)
         AS width_max
FROM m GROUP BY 1
"""

# q179: partition evolution as set algebra; pruned_subset hard-codes the
# layout contract (a status-scoped read after the re-layout opens a
# strict subset of live files; the flat snapshot and full read do not).
ORACLES["q179_partition_evolution_scan"] = """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 2
),
v2 AS (
  SELECT * FROM v0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 4
),
live AS (SELECT * FROM v2 WHERE o_orderkey % 9 <> 0)
SELECT 'live_status_F' AS snapshot, COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key,
       TRUE AS pruned_subset
FROM live WHERE o_orderstatus = 'F'
UNION ALL
SELECT 'v0_flat', COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey), FALSE
FROM v0
UNION ALL
SELECT 'live_all', COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey), FALSE
FROM live
"""

# q180: Gopher repetition gates as list lambdas — DuckDB's range(a, b)
# is empty when b <= a (verified), so short docs get empty gram lists
# exactly like the Spark side's guarded shingles(). One IEEE double
# division per metric (floor(int*10000/int)) matches Spark bit-exactly.
ORACLES["q180_repetition_filters"] = """
WITH w AS (
  SELECT lang, source, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT lang, source, ws,
         list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i + 1]) AS g2,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
           AS g3
  FROM w
),
m AS (
  SELECT lang, source,
         CAST(floor(list_max(list_transform(list_distinct(ws),
                t -> len(list_filter(ws, x -> x = t))))
              * 10000 / len(ws)) AS BIGINT) AS top1_bp,
         CASE WHEN len(g2) > 0 THEN
           CAST(floor((len(g2) - len(list_distinct(g2))) * 10000
                / len(g2)) AS BIGINT)
         ELSE 0 END AS dup2_bp,
         CASE WHEN len(g3) > 0 THEN
           CAST(floor((len(g3) - len(list_distinct(g3))) * 10000
                / len(g3)) AS BIGINT)
         ELSE 0 END AS dup3_bp
  FROM g
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dup3_bp > 1500 OR dup2_bp > 3000
                      OR top1_bp > 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(dup2_bp) AS BIGINT) AS dup2_bp_sum,
       CAST(SUM(dup3_bp) AS BIGINT) AS dup3_bp_sum,
       CAST(SUM(top1_bp) AS BIGINT) AS top1_bp_sum,
       CAST(MAX(top1_bp) AS BIGINT) AS top1_bp_max
FROM m GROUP BY lang, source
"""

# q181: shallow clone as set algebra — the clone pins src v0
# (custkey % 3 = 0), dv-deletes % 7 = 0 through the absolute refs,
# appends % 3 = 2; the source separately rewrite-deletes negative
# balances after the fork. Money snapped to integer cents.
ORACLES["q181_shallow_clone_divergence"] = """
WITH v0 AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0
),
clone_live AS (
  SELECT * FROM v0 WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 2
),
src_live AS (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_custkey % 3 IN (0, 1) AND NOT (c_acctbal < 0)
)
SELECT 'clone_live' AS snapshot, COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents,
       MIN(c_custkey) AS first_key, MAX(c_custkey) AS last_key
FROM clone_live
UNION ALL
SELECT 'clone_v0', COUNT(*),
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT),
       MIN(c_custkey), MAX(c_custkey)
FROM v0
UNION ALL
SELECT 'src_live', COUNT(*),
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT),
       MIN(c_custkey), MAX(c_custkey)
FROM src_live
"""

# q182: generated-column partition pruning — the layout contract
# (two days opened, strict subset) is hard-coded; values are plain SQL
# over events with the same ts range. Money snapped to integer cents.
ORACLES["q182_generated_partition_pruning"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       COUNT(DISTINCT user_id) AS n_users,
       2 AS days_opened,
       TRUE AS pruned_subset
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-12 00:00:00'
GROUP BY event_type
"""

# q183: the SQL DDL lifecycle as set algebra — insert = the % 4 slice,
# update = CASE *2 on % 3, delete = % 5 filter; the ts-range and the
# generated-column grouping re-derive as plain SQL; layout observables
# (two days opened, strict subset) hard-coded like q179/q182.
ORACLES["q183_sql_ddl_generated_lifecycle"] = """
WITH base AS (
  SELECT event_id, ts, value FROM events WHERE event_id % 4 = 0
),
upd AS (
  SELECT event_id, ts,
         CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END AS value
  FROM base
),
fin AS (SELECT * FROM upd WHERE event_id % 5 <> 0)
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       CAST(SUM(event_id) AS BIGINT) AS key_sum,
       2 AS days_opened,
       TRUE AS pruned_subset
FROM fin
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-12 00:00:00'
GROUP BY 1
"""

# q184: the combined C4/Gopher keep-drop gate — first-triggered-reason
# CASE over the same per-doc lambdas as q17/q180; quality snapped to
# floored basis points (identical IEEE doubles both engines).
ORACLES["q184_corpus_quality_gate"] = f"""
WITH w AS (
  SELECT lang, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT lang, ws,
         list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i + 1]) AS g2,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
           AS g3
  FROM w
),
m AS (
  SELECT lang, len(ws) AS ntok,
         CAST(floor(list_max(list_transform(list_distinct(ws),
                t -> len(list_filter(ws, x -> x = t))))
              * 10000 / len(ws)) AS BIGINT) AS top1_bp,
         CASE WHEN len(g2) > 0 THEN
           CAST(floor((len(g2) - len(list_distinct(g2))) * 10000
                / len(g2)) AS BIGINT) ELSE 0 END AS dup2_bp,
         CASE WHEN len(g3) > 0 THEN
           CAST(floor((len(g3) - len(list_distinct(g3))) * 10000
                / len(g3)) AS BIGINT) ELSE 0 END AS dup3_bp,
         CAST(floor((least(len(ws) / 100.0, 1.0)
               + len(list_distinct(ws)) / len(ws)
               + (1 - list_sum(list_transform(ws,
                    t -> CASE WHEN t IN ({_STOPWORD_LIST}) THEN 1
                         ELSE 0 END)) / len(ws))) / 3 * 10000)
           AS BIGINT) AS q_bp
  FROM g
),
r AS (
  SELECT lang, ntok,
         CASE WHEN ntok < 10 THEN 'short'
              WHEN dup3_bp > 1500 OR dup2_bp > 3000 OR top1_bp > 2000
                THEN 'repetition'
              WHEN q_bp < 5000 THEN 'quality'
              ELSE 'kept' END AS reason
  FROM m
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN reason = 'kept' THEN ntok ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(SUM(CASE WHEN reason = 'short' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short,
       CAST(SUM(CASE WHEN reason = 'repetition' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_repetition,
       CAST(SUM(CASE WHEN reason = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality
FROM r GROUP BY lang
"""

# q207 replays the full ExactSubstr removal in SQL: windows exactly as
# q155's oracle, duplicated-window marking by a corpus-frequency window
# count over the EXACT gram string (the Spark side's hashed 128-bit key
# must be transparent — the hash gate proves it), gaps-and-islands spans,
# DISTINCT coverage union (adjacent spans overlap by up to w-1 tokens),
# and a positional anti-join token filter with an ORDER BY i string_agg.
# A fully-erased document yields no clean rows -> COALESCE to ''.
ORACLES["q207_exact_substring_removal"] = """
WITH arr AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         list_aggregate(list_slice(a, i, i + 4), 'string_agg', ' ') AS gram
  FROM arr, unnest(range(1, len(a) - 3)) AS t(i)
  WHERE len(a) >= 5
),
dupw AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n_sites FROM g
  ) WHERE n_sites >= 2
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dupw
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
  FROM isl GROUP BY doc_id, grp
  HAVING (max(pos) + 4) - min(pos) + 1 >= 8
),
cov AS (
  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
  FROM spans, unnest(range(s, e + 1)) AS t(p)
),
nsp AS (
  SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
),
nrem AS (
  SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id
),
toks AS (
  SELECT arr.doc_id, i, a[CAST(i AS INTEGER)] AS tok
  FROM arr, unnest(range(1, len(a) + 1)) AS t(i)
  WHERE arr.doc_id IN (SELECT doc_id FROM nsp)
),
clean AS (
  SELECT toks.doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
  FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.i = cov.p
  WHERE cov.p IS NULL
  GROUP BY toks.doc_id
)
SELECT nsp.doc_id,
       CAST(len(arr.a) AS BIGINT) AS n_tokens,
       nsp.n_spans,
       nrem.n_removed,
       COALESCE(clean.clean_text, '') AS clean_text
FROM nsp
JOIN arr ON arr.doc_id = nsp.doc_id
JOIN nrem ON nrem.doc_id = nsp.doc_id
LEFT JOIN clean ON clean.doc_id = nsp.doc_id
"""

# q208 re-estimates the add-1 bigram LM on the src0 slice and replays the
# scoring join with the SAME expression shape as the Spark side (the q154
# rule): each -ln p snaps to integer micro-nats before the per-doc sum,
# the mean is integer division (values nonnegative, so // == div), and
# the kept flag is an integer comparison. 3500000 interpolates
# queries.PPL_THRESHOLD_MICRO.
ORACLES["q208_perplexity_filter"] = """
WITH arr AS (
  SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
),
train_bi AS (
  SELECT a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2,
         count(*) AS c
  FROM arr, unnest(range(1, len(a))) AS t(i)
  WHERE source = 'src0' AND len(a) >= 2
  GROUP BY 1, 2
),
ctx AS (SELECT w1, sum(c) AS n FROM train_bi GROUP BY w1),
vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(a) AS tok FROM arr WHERE source = 'src0')
),
corpus_bi AS (
  SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
  FROM arr, unnest(range(1, len(a))) AS t(i)
  WHERE len(a) >= 2
),
scored AS (
  SELECT cb.doc_id,
         CAST(round(-ln(
           (COALESCE(tb.c, 0) + 1.0) / (COALESCE(cx.n, 0) + vocab.v)
         ) * 1000000.0) AS BIGINT) AS nll_micro
  FROM corpus_bi cb
  LEFT JOIN train_bi tb ON cb.w1 = tb.w1 AND cb.w2 = tb.w2
  LEFT JOIN ctx cx ON cb.w1 = cx.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(CAST(sum(nll_micro) AS BIGINT) // count(*) AS BIGINT)
         AS avg_nll_micro,
       CAST(CASE WHEN CAST(sum(nll_micro) AS BIGINT) // count(*) <= 3500000
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM scored GROUP BY doc_id
"""
