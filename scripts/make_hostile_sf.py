"""Deterministic HOSTILE-DATA scale factor: degenerate-but-valid tables.

The per-round sweeps vary EXECUTION geometry (local[3]/local[5]/local[8],
prime shuffle counts); this script varies DATA geometry.  It writes a
schema-identical micro-dataset whose content is adversarial in every way
the fixed driver testdata is benign:

- documents: empty text, whitespace-only, single-char, CJK + emoji +
  combining accents, a 10k-char doc, exact-duplicate and near-duplicate
  pairs, quote/comma/pipe/newline payloads.
- embeddings: the all-zero vector (cosine 0/0), an exact-duplicate pair
  INSIDE the PQ codebook range (vec_id < 16 → duplicate codewords →
  argmin ties), a colinear pair (exact cosine ties in every top-k).
- events: a 12-event same-microsecond burst (window/session ties), full
  duplicate rows, 50% single-user key skew, malformed / empty / nested
  JSON in props.
- orders/lineitem: boundary dates (1995-01-01 / 2001-08-01 exactly),
  shipdate == orderdate, tied prices/quantities/dates everywhere, a
  dangling o_custkey, one customer owning a third of all orders.
- customer/supplier/part: duplicate names, empty-string names, tied
  acctbals, 0.0 and -0.0, dangling nation keys, out-of-domain segment.

Everything is seeded and hand-pinned — rerunning the script reproduces
the bytes.  No NULLs (the driver testdata invariant); a null tier would
test the ORACLES' null semantics more than the engine's, so it is kept
out of scope here.  region/nation are copied verbatim from the real
sf0.001 so literal-name filters (ASIA, GERMANY, ...) still select rows.

Usage: python scripts/make_hostile_sf.py [outdir]   (default /tmp/hostile_sf)
"""

from __future__ import annotations

import datetime as dt
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REAL = "/root/testdata/sf0.001"
SEED = 1212

VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer line "
    "value column big vector agg a"
).split()


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


_NULL_PLAN: dict[str, dict[str, list[int]]] = {}


def _write(outdir: str, name: str, cols: dict) -> None:
    for col, rows in _NULL_PLAN.get(name, {}).items():
        vals = list(cols[col])
        for i in rows:
            vals[i] = None
        cols[col] = vals
    schema = pq.read_schema(f"{REAL}/{name}.parquet")
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    t = pa.table({k: pa.array(v) for k, v in cols.items()}).cast(schema)
    pq.write_table(t, f"{outdir}/{name}.parquet")


def _copy(outdir: str, name: str) -> None:
    pq.write_table(pq.read_table(f"{REAL}/{name}.parquet"), f"{outdir}/{name}.parquet")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def make_customer(outdir: str) -> None:
    rng = random.Random(SEED + 1)
    keys, names, nk, bal, seg = [], [], [], [], []
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    for i in range(30):
        keys.append(i)
        if i == 3:
            names.append("")  # empty name
        elif i == 4:
            names.append(" ")  # whitespace name
        elif i == 5:
            names.append("客户#0x7f 🚀")  # unicode
        elif i in (6, 7):
            names.append("Customer#DUP")  # duplicate names
        else:
            names.append(f"Customer#{i:09d}")
        nk.append(99 if i == 8 else i % 25)  # one dangling nationkey
        if i < 5:
            bal.append(100.0)  # five-way tie
        elif i == 9:
            bal.append(0.0)
        elif i == 10:
            bal.append(-0.0)
        elif i == 11:
            bal.append(-999.99)
        elif i == 12:
            bal.append(9999999.99)
        else:
            bal.append(round(rng.uniform(-1000, 10000), 2))
        seg.append("UNKNOWN" if i == 13 else segs[i % 5])
    _write(outdir, "customer", {
        "c_custkey": keys, "c_name": names, "c_nationkey": nk,
        "c_acctbal": bal, "c_mktsegment": seg,
    })


def make_supplier(outdir: str) -> None:
    keys = list(range(8))
    names = ["Supplier#DUP", "Supplier#DUP"] + [f"Supplier#{i:09d}" for i in range(2, 8)]
    nk = [99] + [i % 25 for i in range(1, 8)]  # one dangling
    bal = [500.0, 500.0, 500.0, -42.5, 0.0, 123.45, 123.45, 7777.77]  # ties
    _write(outdir, "supplier", {
        "s_suppkey": keys, "s_name": names, "s_nationkey": nk, "s_acctbal": bal,
    })


def make_part(outdir: str) -> None:
    rng = random.Random(SEED + 2)
    adjs = ["cold", "small", "large", "blue", "green", "red"]
    nouns = ["widget", "bolt", "rod", "gear", "cog"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    keys, names, brands, ptypes, sizes, prices = [], [], [], [], [], []
    for i in range(36):
        keys.append(i)
        if i == 0:
            names.append("")  # empty part name
        elif i in (1, 2, 3):
            names.append("cold widget")  # triplicate name
        else:
            names.append(f"{rng.choice(adjs)} {rng.choice(nouns)}")
        brands.append(f"Brand#{(i % 5) + 1}")
        ptypes.append(types[i % 6])
        sizes.append(0 if i == 4 else (7 if i < 12 else i % 20))  # ties + zero
        prices.append(100.0 if i < 10 else round(rng.uniform(1, 2000), 2))
    _write(outdir, "part", {
        "p_partkey": keys, "p_name": names, "p_brand": brands,
        "p_type": ptypes, "p_size": sizes, "p_retailprice": prices,
    })


def make_orders_lineitem(outdir: str) -> None:
    rng = random.Random(SEED + 3)
    statuses, prios = ["F", "O", "P"], [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    lo, hi = _ts("1995-01-01"), _ts("2001-08-01")
    okeys, ocust, ostat, oprice, odate, oprio = [], [], [], [], [], []
    for i in range(120):
        okeys.append(i)
        if i < 40:
            ocust.append(5)  # one customer owns a third of all orders
        elif i == 40:
            ocust.append(424242)  # dangling custkey
        else:
            ocust.append(rng.randrange(30))
        ostat.append(statuses[i % 3])
        oprice.append(1000.0 if i < 15 else round(rng.uniform(10, 300000), 2))
        if i < 8:
            odate.append(lo)  # boundary cluster, exact ties
        elif i == 8:
            odate.append(hi)  # upper boundary
        elif i < 30:
            odate.append(_ts("1997-06-15"))  # big date tie group
        else:
            odate.append(lo + dt.timedelta(seconds=rng.randrange(0, 208224000)))
        oprio.append(prios[i % 5])
    _write(outdir, "orders", {
        "o_orderkey": okeys, "o_custkey": ocust, "o_orderstatus": ostat,
        "o_totalprice": oprice, "o_orderdate": odate, "o_orderpriority": oprio,
    })

    lkeys, lpart, lsupp, lln, lqty, lprice, ldisc, ltax, lrf, lls, lship = (
        [], [], [], [], [], [], [], [], [], [], [])
    rfs, lss = ["A", "N", "R"], ["F", "O"]
    for i in range(120):
        n_lines = 1 + (i * 7 + 3) % 7
        for ln in range(1, n_lines + 1):
            lkeys.append(i)
            lln.append(ln)
            # partkey skew: 25% on part 0; some %10==0 keys feed graph filters
            r = rng.random()
            lpart.append(0 if r < 0.25 else (10 if r < 0.35 else rng.randrange(36)))
            lsupp.append(0 if rng.random() < 0.4 else rng.randrange(8))
            lqty.append(1.0 if rng.random() < 0.3 else float(rng.randrange(1, 51)))
            lprice.append(500.0 if rng.random() < 0.2 else round(rng.uniform(1, 90000), 2))
            ldisc.append([0.0, 0.01, 0.05, 0.06, 0.07, 0.1][rng.randrange(6)])
            ltax.append([0.0, 0.02, 0.08][rng.randrange(3)])
            lrf.append(rfs[(i + ln) % 3])
            lls.append(lss[(i + ln) % 2])
            od = odate[i]
            if ln == 1:
                lship.append(od)  # shipdate == orderdate boundary
            else:
                lship.append(min(od + dt.timedelta(days=rng.randrange(0, 120)), hi))
    _write(outdir, "lineitem", {
        "l_orderkey": lkeys, "l_partkey": lpart, "l_suppkey": lsupp,
        "l_linenumber": lln, "l_quantity": lqty, "l_extendedprice": lprice,
        "l_discount": ldisc, "l_tax": ltax, "l_returnflag": lrf,
        "l_linestatus": lls, "l_shipdate": lship,
    })


def make_events(outdir: str) -> None:
    rng = random.Random(SEED + 4)
    types = ["click", "error", "purchase", "signup", "view"]
    base = _ts("2024-01-05 12:00:00")
    ids, tss, uids, etyp, vals, props = [], [], [], [], [], []
    eid = 0

    def add(ts, uid, typ, val, pr):
        nonlocal eid
        ids.append(eid); tss.append(ts); uids.append(uid)
        etyp.append(typ); vals.append(val); props.append(pr)
        eid += 1

    burst = base + dt.timedelta(hours=1)
    for _ in range(12):  # same-microsecond burst: window/session assignment ties
        add(burst, 1, "click", 1.0, '{"k": 0}')
    add(base, 2, "view", 0.0, "")            # empty props
    add(base, 2, "view", 0.0, "")            # full duplicate row
    add(base + dt.timedelta(minutes=1), 3, "error", -1.5, "not json")
    add(base + dt.timedelta(minutes=2), 3, "purchase", 1e9, '{"k": null}')
    add(base + dt.timedelta(minutes=3), 3, "signup", 1.0, '{"k": {"nested": [1, 2]}}')
    add(base + dt.timedelta(minutes=4), 4, "view", 1.0, "{}")
    # out-of-order: later event_id, earlier ts
    add(base - dt.timedelta(days=3), 5, "click", 2.0, '{"k": 7}')
    # a SIXTH event type with <= 10 rows: a 5-each-end trimmed aggregate
    # empties this group (it must VANISH from post-trim GROUP BYs)
    for i in range(6):
        add(base + dt.timedelta(minutes=10 + i), 6, "gdpr_delete", 3.5, "{}")
    while eid < 160:
        uid = 1 if rng.random() < 0.5 else rng.randrange(2, 40)  # 50% skew to user 1
        ts = base + dt.timedelta(seconds=rng.randrange(-200000, 2000000))
        add(ts, uid, types[rng.randrange(5)],
            round(rng.uniform(0, 100), 3), f'{{"k": {rng.randrange(100)}}}')
    _write(outdir, "events", {
        "event_id": ids, "ts": tss, "user_id": uids,
        "event_type": etyp, "value": vals, "props": props,
    })


def make_documents(outdir: str) -> None:
    rng = random.Random(SEED + 5)
    langs = ["de", "en", "es", "fr", "zh"]
    texts = [
        "",                                   # 0 empty
        "a",                                  # 1 single char
        "   ",                                # 2 whitespace only
        "\n\t\n",                             # 3 control whitespace
        ("数据 管理 系统 查询 优化 " * 12).strip(),   # 4 CJK
        "café 🚀 café 🚀 naïve résumé straße",  # 5 emoji + combining
        _sentence(random.Random(SEED + 6), 2000),           # 6 ~10k chars
    ]
    dup = _sentence(random.Random(SEED + 7), 50)
    texts += [dup, dup]                       # 7, 8 exact duplicates
    near = dup.split()
    near[25] = "changed"
    texts += [" ".join(near)]                 # 9 near-duplicate of 7/8
    texts += ['he said "hi, there" | then\tleft, fast\nrow']  # 10 csv-hostile
    # 64 docs so doc_id crosses the eval/train split at 50 that
    # text_contamination_ngram uses (48 docs left its train side empty)
    while len(texts) < 64:
        texts.append(_sentence(rng, rng.randrange(5, 81)))
    texts[52] = texts[7]                      # cross-boundary exact duplicate
    near2 = texts[9].split()
    near2[3] = "tweaked"
    texts[56] = " ".join(near2)               # cross-boundary near-duplicate
    # planted contamination: eval doc 20 and train doc 55 share a 12-token
    # run (>= 8 common 5-grams, above the >= 5 flag threshold)
    shared = _sentence(random.Random(SEED + 9), 12)
    texts[20] = f"{shared} {_sentence(rng, 20)}"
    texts[55] = f"{_sentence(rng, 15)} {shared}"
    srcs = ["src0"] * 15 + [f"src{i % 20}" for i in range(49)]  # source skew
    _write(outdir, "documents", {
        "doc_id": list(range(64)),
        "text": texts,
        "lang": [langs[i % 5] for i in range(64)],
        "source": srcs[:64],
        "n_chars": [len(t) for t in texts],
    })


def make_embeddings(outdir: str) -> None:
    rs = np.random.RandomState(SEED + 8)
    vecs = rs.standard_normal((48, 64)).astype(np.float32)
    vecs[0] = 0.0                      # zero vector: cosine 0/0
    vecs[2] = vecs[1]                  # exact duplicates INSIDE PQ codebook range
    vecs[3] = 0.5                      # constant vector
    vecs[4] = vecs[3] * 2.0            # colinear: exact cosine tie with vec 3
    _write(outdir, "embeddings", {
        "vec_id": list(range(48)),
        "embedding": [v.tolist() for v in vecs],
        "label": [9 if i == 47 else i % 9 for i in range(48)],  # singleton label 9
    })


# Tier-2 "nulls" plan: NULLs in VALUE-ish nullable columns (text, props,
# measures, names, one whole embedding) at pinned row positions.  Join keys
# and primary ids stay non-null — null-KEY semantics (null-safe joins,
# engine ORDER BY null placement on sort keys) are their own contract
# surface; this tier isolates null PROPAGATION through kernels and folds.
# Sort-relevant measure columns (c_acctbal, o_totalprice) get one null each
# on purpose: rankings over nullable measures must pin explicit null
# placement or diverge (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST).
_NULLS_TIER: dict[str, dict[str, list[int]]] = {
    "documents": {"text": [60, 61], "lang": [62], "source": [63]},
    "events": {"props": [20, 21], "value": [22, 23]},
    "customer": {"c_name": [20], "c_acctbal": [21]},
    "orders": {"o_totalprice": [100]},
    "lineitem": {"l_discount": [400], "l_returnflag": [401]},
    "part": {"p_retailprice": [30]},
    "embeddings": {"embedding": [40]},
}


# Tier-4 "nullkeys" plan: NULLs in JOIN / GROUP / SORT / PRIMARY-ID KEY
# columns — the axis wave 3 deliberately kept non-null.  This isolates the
# remaining Spark-vs-DuckDB asymmetry surface: inner joins drop null keys
# (symmetric), but ORDER BY over a nullable key diverges on placement
# (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST), window partitions keyed
# by NULL group together, and id-keyed pairing (dedup doc_id, ANN vec_id)
# must state what a NULL identity means.  Positions are pinned on filler
# rows so the planted structures (PQ codebook vec_id<16, contamination docs
# 20/55, dup docs 7/8/52, burst user 1) survive intact.  Lineitem rows for
# order 47 keep their generated shipdates while the parent's o_orderdate is
# NULL — the realistic torn-parent inconsistency.
_NULLKEYS_TIER: dict[str, dict[str, list[int]]] = {
    "orders": {
        "o_custkey": [45, 46],
        "o_orderdate": [47],
        "o_orderpriority": [48],
        "o_orderkey": [49],
    },
    "lineitem": {
        "l_orderkey": [200, 201],
        "l_partkey": [202],
        "l_suppkey": [203],
        "l_shipdate": [204],
    },
    "events": {"user_id": [30, 31], "event_type": [32, 33], "ts": [34, 35]},
    "customer": {"c_custkey": [24], "c_nationkey": [22], "c_mktsegment": [23]},
    "supplier": {"s_nationkey": [5]},
    "part": {"p_partkey": [22], "p_brand": [20], "p_type": [21]},
    "documents": {"doc_id": [60, 61]},
    "embeddings": {"vec_id": [44]},
}


def _truncate(outdir: str, name: str) -> None:
    t = pq.read_table(f"{outdir}/{name}.parquet")
    pq.write_table(t.slice(0, 0), f"{outdir}/{name}.parquet")


def main(outdir: str = "/tmp/hostile_sf", tier: str = "values") -> str:
    """tier: 'values' (degenerate non-null content), 'nulls' (NULLs in
    value-ish columns), 'nullkeys' (NULLs in join/group/sort/id KEY
    columns), or 'empty' (documents/embeddings/events have ZERO rows — the
    day-one-pipeline scenario: every driver-side collect, codebook slice,
    k-means init and stream drain must yield an empty result, not a crash;
    TPC-H tables stay populated so only the extension-table surface is
    exercised)."""
    import os

    global _NULL_PLAN
    _NULL_PLAN = {"nulls": _NULLS_TIER, "nullkeys": _NULLKEYS_TIER}.get(tier, {})
    os.makedirs(outdir, exist_ok=True)
    _copy(outdir, "region")
    _copy(outdir, "nation")
    make_customer(outdir)
    make_supplier(outdir)
    make_part(outdir)
    make_orders_lineitem(outdir)
    make_events(outdir)
    make_documents(outdir)
    make_embeddings(outdir)
    if tier == "empty":
        for name in ("documents", "embeddings", "events"):
            _truncate(outdir, name)
    return outdir


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
