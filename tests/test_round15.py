"""Round-15 witnesses.

1. ADVICE r14 medium: the PQ kernel's null-mask segmentation — the old
   reduceat-over-clamped-offsets missed a trailing NULL element when a row
   ended exactly at the values buffer and was followed by null/empty rows,
   so the row mis-entered the vectorized path and floor(NaN) produced a
   garbage code.  The fixture here is EXACTLY that geometry.
2. ADVICE r14 low: a REAL scalar-vs-vector agreement test (the r14 test
   only checked determinism; renamed accordingly) — both kernel paths are
   compared against an independent pure-Python reference on a batch that
   mixes clean, null, short, long, and trailing-NULL rows.
3. VERDICT r14 item 2: batch-local top-k — the kernel emits at most k rows
   per query per batch, and those rows ARE the batch's true top-k; the
   declarative siblings' rank windows carry Spark 4's native Partial
   WindowGroupLimit below the exchange (plan pin).
4. The NULL-codeword argmin convention (oracle-inexpressible — DuckDB's
   list_inner_product errors on NULL elements) pinned Spark-side.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from gcp_cloudsql_to_bigquery_spark.operators.similarity import (
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    _PQ_TOPK,
    _pq_build_kernel,
)

DIM = _PQ_M * _PQ_SUB
SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Pure-Python reference: same contracts as the kernel docstrings state
# (sequential-fold dot, NULL poisons, NULL-q-wins argmin with lowest-j ties,
# ADC sum skips NULL table entries, all-NULL -> None).
# ---------------------------------------------------------------------------


def _pydot(a, b):
    if a is None or b is None:
        return None
    s = 0.0
    for i in range(max(len(a), len(b))):
        x = a[i] if i < len(a) else None
        y = b[i] if i < len(b) else None
        if x is None or y is None:
            return None
        s += x * y
    return s


def _sub_of(v, m):
    return None if v is None else v[m * _PQ_SUB : m * _PQ_SUB + _PQ_SUB]


def _q_of(sub, cw):
    d1, dx, d3 = _pydot(sub, sub), _pydot(sub, cw), _pydot(cw, cw)
    if d1 is None or dx is None or d3 is None:
        return None
    return int(math.floor((d1 - 2 * dx + d3) * 1e6 + 0.5))


def _ref_pairs(head, ids, vecs):
    """All (query_id, neighbor_id) -> approx (or None) for one batch."""
    cb_js = sorted(head)
    q_ids = [j for j in cb_js if j < 10]
    out = {}
    for rid, vec in zip(ids, vecs):
        codes = []
        for m in range(_PQ_M):
            best = None
            for j in cb_js:
                q = _q_of(_sub_of(vec, m), _sub_of(head[j], m))
                key = (1, q, j) if q is not None else (0, 0, j)
                if best is None or key < best:
                    best = key
            codes.append(best[2])
        for qid in q_ids:
            if rid == qid:
                continue
            terms = [
                _q_of(_sub_of(head[qid], m), _sub_of(head[codes[m]], m))
                for m in range(_PQ_M)
            ]
            nn = [t for t in terms if t is not None]
            out[(qid, rid)] = sum(nn) if nn else None
    return out


def _run_kernel(head, ids, vecs, topk=None):
    kernel = _pq_build_kernel(head, **({} if topk is None else {"topk": topk}))
    assert kernel is not None
    batch = pa.RecordBatch.from_arrays(
        [pa.array(ids, type=pa.int64()), pa.array(vecs, type=pa.list_(pa.float64()))],
        names=["vec_id", "v"],
    )
    rows = []
    for out in kernel(iter([batch])):
        tbl = out.to_pydict()
        rows += list(
            zip(tbl["query_id"], tbl["neighbor_id"], tbl["approx_d2_x1e6"])
        )
    return rows


def _mk_head(rng):
    return {j: [float(x) for x in rng.normal(size=DIM)] for j in range(_PQ_K)}


# ---------------------------------------------------------------------------
# 1. ADVICE r14 medium — the exact triggering geometry
# ---------------------------------------------------------------------------


def test_pq_kernel_trailing_null_element_at_buffer_end_is_not_missed():
    """Row 0 is 64 elements whose LAST element is NULL and ends exactly at
    the values-buffer end; rows 1-2 are a null row and an empty row (both
    contribute no values).  Pre-fix, the clamped reduceat counted row 0 as
    clean -> NaN -> garbage int64 code.  Post-fix it must route to the
    scalar path and match the reference exactly."""
    rng = np.random.default_rng(15)
    head = _mk_head(rng)
    v0 = [float(x) for x in rng.normal(size=DIM)]
    v0[-1] = None
    ids = [100, 101, 102]
    vecs = [v0, None, []]
    got = {(q, n): d for q, n, d in _run_kernel(head, ids, vecs, topk=10**9)}
    want = _ref_pairs(head, ids, vecs)
    assert got == want
    # load-bearing: the fixture really does exercise the old bug's geometry
    varr = pa.array(vecs, type=pa.list_(pa.float64()))
    offs = varr.offsets.to_numpy(zero_copy_only=False)
    elem_null = varr.values.is_null().to_numpy(zero_copy_only=False)
    assert offs[1] == len(elem_null) and elem_null[-1]
    old = np.add.reduceat(elem_null, np.minimum(offs[:-1], len(elem_null) - 1))
    assert old[0] == 0, "old mask must miss the trailing NULL (the r14 bug)"


# ---------------------------------------------------------------------------
# 2. scalar-vs-vector agreement (the honest version of the r14 test)
# ---------------------------------------------------------------------------


def test_pq_kernel_scalar_and_vector_paths_agree_with_reference():
    """One batch mixing 40 clean rows (vectorized path) with degenerate
    rows (scalar path: null row, empty, short, long, mid-NULL, trailing-
    NULL): every emitted (query, neighbor, approx) triple must equal the
    pure-Python reference, which computes BOTH kinds of row one way."""
    rng = np.random.default_rng(151)
    head = _mk_head(rng)
    ids, vecs = [], []
    for i in range(40):  # clean -> vectorized
        ids.append(100 + i)
        vecs.append([float(x) for x in rng.normal(size=DIM)])
    degenerate = [
        None,  # null row
        [],  # empty
        [1.0] * (DIM - 1),  # short
        [0.5] * (DIM + 3),  # long
    ]
    mid = [float(x) for x in rng.normal(size=DIM)]
    mid[17] = None  # NULL inside subspace 1
    tail = [float(x) for x in rng.normal(size=DIM)]
    tail[-1] = None  # trailing NULL
    degenerate += [mid, tail]
    for i, v in enumerate(degenerate):
        ids.append(200 + i)
        vecs.append(v)
    got = {(q, n): d for q, n, d in _run_kernel(head, ids, vecs, topk=10**9)}
    want = _ref_pairs(head, ids, vecs)
    assert got == want


# ---------------------------------------------------------------------------
# 3. batch-local top-k boundedness + exactness (VERDICT r14 item 2)
# ---------------------------------------------------------------------------


def test_pq_kernel_emits_at_most_topk_rows_per_query_per_batch():
    rng = np.random.default_rng(152)
    head = _mk_head(rng)
    ids = list(range(100, 300))
    vecs = [[float(x) for x in rng.normal(size=DIM)] for _ in ids]
    # a couple of degenerate rows so the NULL-distance branch is in play
    vecs[0] = None
    vecs[1] = [1.0] * (DIM - 1)
    rows = _run_kernel(head, ids, vecs)  # default topk=_PQ_TOPK
    per_q = {}
    for q, n, d in rows:
        per_q.setdefault(q, []).append((n, d))
    assert per_q and all(len(v) <= _PQ_TOPK for v in per_q.values())
    # and the kept rows are the TRUE batch top-k under the window order
    # (approx ASC NULLS FIRST, neighbor ASC)
    want = _ref_pairs(head, ids, vecs)
    for qid, kept in per_q.items():
        cand = [(n, d) for (q, n), d in want.items() if q == qid]
        cand.sort(key=lambda t: (t[1] is not None, t[1] or 0, t[0]))
        assert sorted(kept) == sorted(cand[:_PQ_TOPK])


def test_pq_rank_windows_have_partial_window_group_limit(spark):
    """Plan pin (VERDICT r14 item 2, declarative half): every PQ rank
    window (row_number + rnk<=k filter) must carry Spark 4's
    WindowGroupLimit in Partial mode BELOW the query_id exchange, so each
    map task ships at most k rows per query and the per-query reducer
    sees k*parts rows — the native map-side top-k.  (A manual salt-bucket
    two-level rank was tried and removed this round: same bound, one
    extra shuffle — see ranked_topk's docstring.)"""
    import re

    from gcp_cloudsql_to_bigquery_spark.operators import similarity as S
    from gcp_cloudsql_to_bigquery_spark.operators.similarity import (
        ann_pq_topk_candidates,
    )
    from gcp_cloudsql_to_bigquery_spark.plans.inspect import physical_plan
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    # fresh build (see test_plans.test_pq_encode_is_scan_local): a cached,
    # already-executed prepared plan explains in its final adaptive shape
    S._PQ_PLAN_CACHE.clear()
    for df, k in (
        (queries()["ann_pq_topk"](spark, SF0001), 5),
        (queries()["ann_ivfpq_topk"](spark, SF0001), 5),
        (ann_pq_topk_candidates(spark, SF0001, k=25), 25),
    ):
        plan = physical_plan(df)
        m = re.search(
            rf"Exchange hashpartitioning\(query_id[\s\S]*?"
            rf"WindowGroupLimit \[query_id[^\n]*row_number\(\), {k}, Partial",
            plan,
        )
        assert m, f"no Partial group-limit below the query_id exchange:\n{plan}"


# ---------------------------------------------------------------------------
# 4. NULL-codeword argmin convention (oracle-inexpressible; pinned here)
# ---------------------------------------------------------------------------


def test_pq_null_codeword_convention():
    """A NULL element inside a vec_id<16 codebook vector makes that
    codeword's q NULL against EVERY row, and NULL-q wins the argmin at
    the lowest such j (Spark ASC-nulls-first).  DuckDB cannot state this
    case (list_inner_product errors on NULL elements), so the convention
    is pinned Spark-side: clean rows take the fast cb_null path, scalar
    rows take code_py — both must agree with the reference."""
    rng = np.random.default_rng(154)
    head = _mk_head(rng)
    head[12][5] = None  # subspace 0 of codeword 12 degenerates
    head[14][3] = None  # a second NULL codeword: min(null_js) must win
    ids = [100, 101, 102]
    clean = [float(x) for x in rng.normal(size=DIM)]
    short = [1.0] * (DIM - 2)  # scalar path
    tail = [float(x) for x in rng.normal(size=DIM)]
    tail[-1] = None  # scalar path
    got = {(q, n): d for q, n, d in _run_kernel(head, ids, [clean, short, tail], topk=10**9)}
    want = _ref_pairs(head, ids, [clean, short, tail])
    assert got == want
    # and the convention itself, stated directly: for a clean sub in
    # subspace 0, codeword 12 (the lowest NULL-q j) is the argmin even
    # though numeric codewords exist
    best = None
    for j in sorted(head):
        q = _q_of(_sub_of(clean, 0), _sub_of(head[j], 0))
        key = (1, q, j) if q is not None else (0, 0, j)
        if best is None or key < best:
            best = key
    assert best[2] == 12


def test_pq_build_kernel_empty_head_returns_none():
    assert _pq_build_kernel({}) is None
    # codewords but no queries (all ids >= 10): adc CTE empty on both sides
    rng = np.random.default_rng(155)
    assert (
        _pq_build_kernel({12: [float(x) for x in rng.normal(size=DIM)]}) is None
    )


# ---------------------------------------------------------------------------
# 5. Sibling audit of the element-validity bug class (ADVICE r14 medium
# generalized): every Python Arrow kernel over list<double> columns whose
# oracle CAN state element-level NULLs must match DuckDB on that geometry.
# embedding_normalize_arrow's old fast path NaN'd NULL elements where
# list_sum skips them; embedding_label_centroid_arrow's np.stack did the
# same to the per-dim integer sums.  (The cosine-ranking kernels are
# oracle-INEXPRESSIBLE on this geometry — DuckDB list_cosine_similarity /
# list_inner_product error on NULL elements — so there is no differential
# to hold them to; documented at their nonzero()/codebook contracts.)
# ---------------------------------------------------------------------------

import shutil

from gcp_cloudsql_to_bigquery_spark.catalog import TABLES as _TABLES


def _copy_sf(dst):
    for name in _TABLES:
        shutil.copy(f"{SF0001}/{name}.parquet", dst / f"{name}.parquet")


@pytest.fixture(scope="module")
def nullelem_embeddings_sf(tmp_path_factory):
    """sf0.001 with element-level degeneracy planted in embeddings: mid
    NULL, trailing NULL, all-NULL, empty list, short vector, NULL first
    element, and one row-NULL — geometries no hostile tier plants."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("nullelem_embeddings_sf")
    _copy_sf(out)
    t = pq.read_table(out / "embeddings.parquet")
    idx = t.schema.get_field_index("embedding")
    elem_t = t.schema.field(idx).type.value_type
    vecs = t.column("embedding").to_pylist()
    ids = t.column("vec_id").to_pylist()
    pos = {v: i for i, v in enumerate(ids) if v is not None}
    mut = {
        100: lambda v: v[:5] + [None] + v[6:],   # mid NULL element
        101: lambda v: v[:-1] + [None],           # trailing NULL element
        102: lambda v: [None] * len(v),           # all-NULL elements
        103: lambda v: [],                        # empty list
        104: lambda v: v[:32],                    # short vector
        105: lambda v: [None] + v[1:],            # NULL first element
        106: lambda v: None,                      # row NULL
    }
    applied = 0
    for vid, fn in mut.items():
        if vid in pos and vecs[pos[vid]] is not None:
            vecs[pos[vid]] = fn(vecs[pos[vid]])
            applied += 1
    assert applied == len(mut), "fixture ids missing from sf0.001 embeddings"
    col = pa.array(vecs, type=pa.list_(elem_t))
    t = t.set_column(idx, "embedding", col)
    pq.write_table(t, out / "embeddings.parquet")
    return str(out)


def _match(spark, sf_dir, name):
    import importlib.util
    from pathlib import Path

    import duckdb

    import __spark_entry__ as entry

    # repo-relative (ADVICE r15 low: the old absolute /root/repo path broke
    # any other checkout)
    spec = importlib.util.spec_from_file_location(
        "selfcheck",
        str(Path(__file__).resolve().parents[1] / "scripts" / "selfcheck.py"),
    )
    selfcheck = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(selfcheck)

    sdf = entry.queries()[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        res = con.execute(entry.oracle_sql()[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} duckdb={len(orows)}"
    )
    s = selfcheck.rowset(scols, srows)
    o = selfcheck.rowset(ocols, orows)
    assert s == o, f"{name}: first diffs {[p for p in zip(s, o) if p[0] != p[1]][:3]}"


def test_normalize_arrow_null_elements_match_oracle(spark, nullelem_embeddings_sf):
    """list_sum skips NULL elements (sum over the valid ones), empty and
    all-NULL lists sum to NULL, the unit numerator is the POSITIONAL first
    element — the old kernel emitted NaN for every one of these."""
    _match(spark, nullelem_embeddings_sf, "embedding_normalize_arrow")


def test_label_centroid_null_elements_match_oracle(spark, nullelem_embeddings_sf):
    """Per-dim integer sums skip NULL (and short-vector-missing) elements
    while count(*) still counts the vector; an all-NULL dim is NULL — the
    old np.stack path poisoned whole dims with NaN-garbage codes."""
    _match(spark, nullelem_embeddings_sf, "embedding_label_centroid_arrow")


def test_normalize_arrow_fast_and_exact_paths_agree(spark, nullelem_embeddings_sf):
    """Rows untouched by the fixture flow through the exact path there
    (the batch carries degenerate siblings) and through the vectorized
    fast path on pristine sf0.001 — their outputs must be identical."""
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    q = queries()["embedding_normalize_arrow"]
    base = {
        r["vec_id"]: (r["l2_norm"], r["unit_first"])
        for r in q(spark, SF0001).collect()
    }
    mixed = {
        r["vec_id"]: (r["l2_norm"], r["unit_first"])
        for r in q(spark, nullelem_embeddings_sf).collect()
    }
    touched = {100, 101, 102, 103, 104, 105, 106}
    for vid, vals in base.items():
        if vid not in touched:
            assert mixed[vid] == vals, vid


# ---------------------------------------------------------------------------
# 6. Registry-wide WindowGroupLimit scan finds (r15): rank-filter queries
# whose plan shape silently defeated Spark's map-side group-limit.
# ---------------------------------------------------------------------------


def test_top_paths_is_take_ordered_not_global_sort(spark):
    """Global top-20 must plan as TakeOrderedAndProject (per-partition
    heap + k-row driver merge) — the old rank-then-filter shape
    single-partition-sorted every distinct trigram, and
    InferWindowGroupLimit never fires for empty partition specs."""
    from gcp_cloudsql_to_bigquery_spark.plans.inspect import physical_plan
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    plan = physical_plan(queries()["analytics_top_paths"](spark, SF0001))
    assert "TakeOrderedAndProject" in plan, plan


def test_cluster_representatives_rank_window_group_limited(spark):
    """With n_members computed BELOW the rank window, the rn==1 filter
    sits directly on the row_number window and WindowGroupLimit fires
    (the old interleaving count window defeated it)."""
    from gcp_cloudsql_to_bigquery_spark.plans.inspect import physical_plan
    from gcp_cloudsql_to_bigquery_spark.workload import queries

    plan = physical_plan(queries()["dedup_cluster_representatives"](spark, SF0001))
    assert "WindowGroupLimit" in plan, plan
