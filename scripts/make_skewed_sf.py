"""VOLUME-hostile scale factor (round 14, VERDICT r13 item 2).

The r12/r13 hostile tiers prove crash-free handling of degenerate VALUES
at micro row counts — where every query sits at the scheduling floor, so
a shuffle-skew *cliff* is unobservable by construction.  This script
derives a dataset with sf0.1 VOLUME and hostile DISTRIBUTIONS: the one
perf geometry the benign bench cannot see.

Transforms are deterministic index masks over the real sf0.1 bytes (no
RNG, no synthetic rows — rerunning reproduces the bytes; row counts and
schemas match sf0.1 exactly so oracle differentials still apply):

- events (100k rows): 50% of rows collapse onto ONE user_id (the micro
  tier's "50% single-key skew" at volume — one window/session/group
  partition holds 50k events), and those rows also collapse onto a
  single event_type (hot (user, type) pair for two-key groupings).
- orders (150k rows): one customer owns a third of all orders (hot
  probe-side key through every customer join).
- lineitem (600k rows): 50% quantity ties, one shipdate on ~33% of
  rows, one extendedprice on 25% — sort/window/agg tie pressure at
  volume.
- customer/supplier/part/region/nation/documents/embeddings: copied
  verbatim (the text/ANN headliners measure corpus-shaped work; their
  value hostility is covered by the micro tiers).

Usage: python scripts/make_skewed_sf.py [outdir]  (default /tmp/skewed_sf)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REAL = "/root/testdata/sf0.1"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mask(n: int, mod: int, rem: int = 0) -> pa.Array:
    return pa.array(np.arange(n) % mod == rem)


def make_events(outdir: str) -> None:
    t = pq.read_table(f"{REAL}/events.parquet")
    n = t.num_rows
    hot = _mask(n, 2)  # every other row -> the hot user
    hot_user = pc.min(t["user_id"])
    user = pc.if_else(hot, hot_user, t["user_id"])
    etype = pc.if_else(hot, pa.scalar("view"), t["event_type"])
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id", user)
    t = t.set_column(t.schema.get_field_index("event_type"), "event_type", etype)
    pq.write_table(t, f"{outdir}/events.parquet")


def make_orders(outdir: str) -> None:
    t = pq.read_table(f"{REAL}/orders.parquet")
    n = t.num_rows
    hot = _mask(n, 3)  # a third of all orders -> one customer
    hot_cust = pc.min(t["o_custkey"])
    cust = pc.if_else(hot, hot_cust, t["o_custkey"])
    t = t.set_column(t.schema.get_field_index("o_custkey"), "o_custkey", cust)
    pq.write_table(t, f"{outdir}/orders.parquet")


def make_lineitem(outdir: str) -> None:
    t = pq.read_table(f"{REAL}/lineitem.parquet")
    n = t.num_rows
    qty = pc.if_else(_mask(n, 2), pa.scalar(25.0), t["l_quantity"])
    ship = pc.if_else(
        _mask(n, 3), pc.min(t["l_shipdate"]), t["l_shipdate"]
    )
    price = pc.if_else(_mask(n, 4), pa.scalar(10000.0), t["l_extendedprice"])
    for name, col in (
        ("l_quantity", qty),
        ("l_shipdate", ship),
        ("l_extendedprice", price),
    ):
        t = t.set_column(t.schema.get_field_index(name), name, col)
    pq.write_table(t, f"{outdir}/lineitem.parquet")


def main(outdir: str = "/tmp/skewed_sf") -> str:
    os.makedirs(outdir, exist_ok=True)
    for name in TABLES:
        if name == "events":
            make_events(outdir)
        elif name == "orders":
            make_orders(outdir)
        elif name == "lineitem":
            make_lineitem(outdir)
        else:
            pq.write_table(
                pq.read_table(f"{REAL}/{name}.parquet"),
                f"{outdir}/{name}.parquet",
            )
    return outdir


if __name__ == "__main__":
    print(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewed_sf"))
