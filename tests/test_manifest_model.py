"""Model-based certification of the manifest delta log: a random sequence
of append / delete (rewrite AND deletion-vector modes) / key-set delete /
merge (upsert AND general clauses) / INSERT OVERWRITE (replaceWhere) /
compact (bin-pack AND zorder re-layout) / truncate / checkpoint /
RESTORE / partition-evolution (replace_table_layout) commits is
replayed against a trivial in-memory model (a Counter of rows). After
EVERY op the table must equal the model; afterwards, every recorded
version must time-travel back to its model snapshot, and folding the
whole change feed (insert +1 / delete −1) must land exactly on the final
model — one property that ties read_table, table_changes, and the
checkpoint/tail resolution together under arbitrary interleavings the
hand-written battery doesn't enumerate.
"""

from __future__ import annotations

import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.operators import transactional as tx

_seq = itertools.count()

_rows = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 5)), min_size=1, max_size=5
)

_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("delete"), st.tuples(st.integers(0, 12), st.integers(0, 12))),
    st.tuples(st.just("dvdelete"), st.tuples(st.integers(0, 12), st.integers(0, 12))),
    st.tuples(st.just("merge"), _rows),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("truncate"), st.none()),
    st.tuples(st.just("checkpoint"), st.none()),
    st.tuples(st.just("restore"), st.integers(0, 100)),
    st.tuples(st.just("keysdelete"), st.lists(st.integers(0, 12), min_size=1, max_size=4)),
    st.tuples(st.just("zorder"), st.none()),
    st.tuples(st.just("scopedcompact"), st.integers(0, 5)),
    st.tuples(st.just("relayout"), st.sampled_from(["flat", "v", "k"])),
    st.tuples(st.just("mergeclauses"), _rows),
    st.tuples(
        st.just("overwrite"),
        st.tuples(st.integers(0, 12), st.integers(0, 12), _rows),
    ),
)


def _snap(spark, path, version=None):
    return Counter(
        (r["k"], r["v"])
        for r in tx.read_table(spark, path, version=version).collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=6))
def test_manifest_log_matches_model(spark, tmp_path, ops):
    _run_model(spark, tmp_path, ops, partition_by=None)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=6))
def test_manifest_log_matches_model_partitioned(spark, tmp_path, ops):
    """The same random-interleaving property on a PARTITIONED table
    (partition_by=["v"]): every op preserves the hive layout through the
    self-wiring staging, partition-valued spans ride the stats map, and
    time travel / the change feed stay exact across re-partitioned
    rewrites (a merge can MOVE a row between partitions)."""
    _run_model(spark, tmp_path, ops, partition_by=["v"])


def _run_model(spark, tmp_path, ops, partition_by):
    path = str(tmp_path / f"t{next(_seq)}")
    tx.init_table(
        spark.createDataFrame([(0, 0), (1, 1)], "k bigint, v bigint")
        .repartitionByRange(2, "k"),
        path,
        partition_by=partition_by,
    )
    model: Counter = Counter({(0, 0): 1, (1, 1): 1})
    history = {0: Counter(model)}

    for kind, arg in ops:
        if kind == "append":
            tx.append_batch(
                spark.createDataFrame(arg, "k bigint, v bigint"), path
            )
            model.update(arg)
        elif kind in ("delete", "dvdelete"):
            lo, hi = min(arg), max(arg)
            tx.delete_where(
                spark, path, (F.col("k") >= lo) & (F.col("k") <= hi),
                mode="dv" if kind == "dvdelete" else "rewrite",
            )
            model = Counter(
                {r: c for r, c in model.items() if not lo <= r[0] <= hi}
            )
        elif kind == "merge":
            # merge batches must be key-unique: keep the last value per key
            batch = list({k: (k, v) for k, v in arg}.values())
            tx.merge_upsert(
                spark,
                path,
                spark.createDataFrame(batch, "k bigint, v bigint"),
                ["k"],
            )
            keys = {k for k, _ in batch}
            model = Counter({r: c for r, c in model.items() if r[0] not in keys})
            model.update(batch)
        elif kind == "compact":
            tx.compact_table(spark, path, target_bytes=1 << 30)
        elif kind == "scopedcompact":
            # OPTIMIZE ... WHERE (r9): content-identity, scope-only
            tx.compact_table(
                spark, path, target_bytes=1 << 30, where=[("v", "=", arg)]
            )
        elif kind == "zorder":
            # OPTIMIZE ZORDER: content-identity re-layout (r8)
            tx.compact_table(
                spark, path, target_bytes=1 << 30, zorder_by=["k", "v"]
            )
        elif kind == "relayout":
            # partition evolution (r10): content-identity full rewrite
            # under a new partition_by (or back to flat)
            tx.replace_table_layout(
                spark, path, None if arg == "flat" else [arg]
            )
        elif kind == "keysdelete":
            # r8 distributed key-set delete (dv mode)
            kdf = spark.createDataFrame([(k,) for k in set(arg)], "k bigint")
            tx.delete_where(spark, path, mode="dv", keys=kdf, key_cols=["k"])
            keys = set(arg)
            model = Counter(
                {r: c for r, c in model.items() if r[0] not in keys}
            )
        elif kind == "mergeclauses":
            # r12 general MERGE: conditional update / delete /
            # conditional insert / both BY-SOURCE shapes in one commit
            batch = list({k: (k, v) for k, v in arg}.values())
            tx.merge_clauses(
                spark, path,
                spark.createDataFrame(batch, "k bigint, v bigint"), ["k"],
                matched=[
                    {"cond": "__s_v % 2 = 0", "action": "update",
                     "set": {"v": "__s_v + 100"}},
                    {"cond": None, "action": "delete"},
                ],
                not_matched=[{"cond": "__s_v % 3 != 0", "values": "*"}],
                not_matched_by_source=[
                    {"cond": "k >= 9", "action": "delete"},
                    {"cond": None, "action": "update",
                     "set": {"v": "v + 1000"}},
                ],
            )
            bk = dict(batch)
            tgt_keys = {r[0] for r in model}
            new: Counter = Counter()
            for (k, v), c in model.items():
                if k in bk:
                    if bk[k] % 2 == 0:
                        new[(k, bk[k] + 100)] += c
                    # else: matched DELETE
                elif k >= 9:
                    pass  # BY SOURCE purge
                else:
                    new[(k, v + 1000)] += c
            for k, v in batch:
                if k not in tgt_keys and v % 3 != 0:
                    new[(k, v)] += 1
            model = new
        elif kind == "overwrite":
            lo, hi, rows = arg
            lo, hi = min(lo, hi), max(lo, hi)
            # batch keys folded INTO the scope (the replaceWhere gate
            # refuses out-of-scope rows — that's its own battery)
            batch = [(lo + k % (hi - lo + 1), v) for k, v in rows]
            tx.overwrite_where(
                spark, path,
                spark.createDataFrame(batch, "k bigint, v bigint"),
                preds=[("k", "between", (lo, hi))],
            )
            model = Counter(
                {r: c for r, c in model.items() if not lo <= r[0] <= hi}
            )
            model.update(batch)
        elif kind == "truncate":
            tx.truncate_table(path)
            model = Counter()
        elif kind == "checkpoint":
            tx.checkpoint_table(path)
            continue  # no commit happened — no new version to record
        elif kind == "restore":
            versions = sorted(history)
            target = versions[arg % len(versions)]
            tx.restore_table(path, target)
            model = Counter(history[target])
        history[tx.current_version(path)] = Counter(model)
        assert _snap(spark, path) == model, f"after {kind}"
        # layout invariant vs the CURRENT manifest (relayout can change
        # it mid-sequence): partitioned => every live file in a hive dir
        # of the declared column; flat => no dirs at all
        man = tx._read_manifest(path, tx.current_version(path))
        declared = man.get("partition_cols") or []
        if declared:
            assert all(
                f.split("/")[0].startswith(f"{declared[0]}=")
                for f in man["files"]
            ), f"layout broken after {kind}"
        else:
            assert all(
                "/" not in f for f in man["files"]
            ), f"flat layout broken after {kind}"

    # every committed version time-travels back to its model snapshot
    # (compact commits burn a version without changing rows — resolve
    # each recorded version explicitly)
    for v, snap in history.items():
        assert _snap(spark, path, version=v) == snap, f"time travel to v{v}"

    # the full change feed folds to the final model
    fold: Counter = Counter()
    for r in tx.table_changes(spark, path).collect():
        d = (r["k"], r["v"])
        fold[d] += 1 if r["_change_type"] == "insert" else -1
    assert +fold == model, "change feed does not fold to the final state"


# --- identity-columns model (r13) --------------------------------------

_ident_op = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 6)),
    st.tuples(st.just("delete"), st.tuples(st.integers(1, 40), st.integers(1, 40))),
    st.tuples(st.just("truncate"), st.none()),
    st.tuples(st.just("checkpoint"), st.none()),
    st.tuples(st.just("restore"), st.integers(0, 100)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_ident_op, min_size=1, max_size=6))
def test_identity_log_matches_model(spark, tmp_path, ops):
    """Model-based identity certification: appends allocate exactly the
    contiguous block past the high-water mark (the allocated SET is
    deterministic even though the row->value mapping is not), deletes
    never disturb surviving values, RESTORE rolls rows back while the
    mark stays monotone (rolled-back ids are never reissued), and the
    mark in the manifest equals the model's after every op."""
    path = str(tmp_path / f"ident{next(_seq)}")
    tx.init_table(
        spark.createDataFrame([], "name string"), path,
        identity={"id": {"start": 1, "step": 1}},
    )
    live: set[int] = set()
    high = 0
    history = {0: (set(), 0)}

    for kind, arg in ops:
        if kind == "append":
            tx.append_batch(
                spark.createDataFrame(
                    [(f"r{high + j}",) for j in range(arg)], "name string"
                ),
                path,
            )
            live |= set(range(high + 1, high + arg + 1))
            high += arg
        elif kind == "delete":
            lo, hi = min(arg), max(arg)
            res = tx.delete_where(
                spark, path, (F.col("id") >= lo) & (F.col("id") <= hi)
            )
            live -= set(range(lo, hi + 1))
            if res["files_rewritten"] == 0 and res["version"] in history:
                continue  # no-match delete burns no version
        elif kind == "truncate":
            tx.truncate_table(path)
            live = set()
        elif kind == "checkpoint":
            tx.checkpoint_table(path)
            continue
        elif kind == "restore":
            versions = sorted(history)
            target = versions[arg % len(versions)]
            tx.restore_table(path, target)
            live = set(history[target][0])
            # high NEVER rolls back (monotone across restore)
        history[tx.current_version(path)] = (set(live), high)
        got = sorted(
            r["id"] for r in tx.read_table(spark, path).collect()
        )
        assert got == sorted(live), f"live ids diverge after {kind}"
        man = tx._read_manifest(path, tx.current_version(path))
        assert man["identity"]["id"]["high"] == high, f"mark after {kind}"

    # time travel: every version's id set replays exactly
    for v, (snap, _h) in history.items():
        got = sorted(
            r["id"] for r in tx.read_table(spark, path, version=v).collect()
        )
        assert got == sorted(snap), f"time travel to v{v}"
