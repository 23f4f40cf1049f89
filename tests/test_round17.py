"""Round-17 optimization witnesses, part A (PPJoin accumulated suffix bound).

The substantive r17 change to proven machinery is the ACCUMULATED overlap
bound in ``prefix_filtered_candidates`` (the suffix-filtering insight of
Xiao et al. WWW'08 §4.3 recast for the set-at-a-time SQL form): instead of
`.distinct()`-ing the surviving prefix collisions, the collisions are
grouped per oriented pair and the pair survives only if

    c_pre + min(na - ra_mx, nb - rb_mx) >= alpha

where c_pre is the collision count, ra_mx/rb_mx the max collision ranks,
and alpha = ceil9(t/(1+t) * (na+nb)) the minimum overlap J >= t requires.

Losslessness argument (pinned here as a model + end-to-end):

- both docs order their tokens by the same global (df, g) key, so the
  common-token sequence w_1 < w_2 < ... < w_O has strictly increasing
  LOCAL ranks in both docs;
- the collision set (common tokens inside both retained prefixes) is
  therefore a PREFIX w_1..w_k of that sequence (the membership predicate
  is monotone along it), so c_pre counts it exactly and ra_mx/rb_mx are
  the ranks of w_k;
- every remaining common token sits strictly after rank ra_mx in a AND
  strictly after rb_mx in b, so O <= c_pre + min(na - ra_mx, nb - rb_mx).

A true pair (J >= t => O >= alpha) therefore always passes; pairs whose
ACCUMULATED bound falls below alpha were never true and are pruned before
the exact array_intersect verify — the verify-stage floor this round cuts.
"""
from __future__ import annotations

import itertools
import math
import random
from collections import Counter


def _ceil9(x: float) -> int:
    return math.ceil(round(x, 9))


def _model_candidates(docs: dict, t: float) -> set:
    """Pure-Python replica of the FULL r17 candidate rule: asymmetric
    prefixes + size band + per-row positional filter + accumulated
    suffix bound.  Returns canonicalized (lo, hi) pairs."""
    df = Counter(g for d in docs.values() for g in d)
    ordered = {i: sorted(d, key=lambda g: (df[g], g)) for i, d in docs.items()}
    probe = {
        i: set(od[: len(od) - _ceil9(t * len(od)) + 1]) for i, od in ordered.items()
    }
    index = {
        i: set(od[: len(od) - _ceil9(2.0 * t / (1.0 + t) * len(od)) + 1])
        for i, od in ordered.items()
    }
    rank = {
        i: {g: r + 1 for r, g in enumerate(od)} for i, od in ordered.items()
    }
    out = set()
    for i, j in itertools.combinations(sorted(docs), 2):
        # orient: b = smaller in (size, id) order, a = larger
        b, a = sorted((i, j), key=lambda k: (len(docs[k]), k))
        na, nb = len(docs[a]), len(docs[b])
        # size band (binding half under nb <= na)
        if nb < _ceil9(t * na):
            continue
        alpha = _ceil9(t / (1.0 + t) * (na + nb))
        collisions = [
            g
            for g in probe[a] & index[b] & (docs[a] & docs[b])
            if 1 + min(na - rank[a][g], nb - rank[b][g]) >= alpha
        ]
        if not collisions:
            continue
        c_pre = len(collisions)
        ra_mx = max(rank[a][g] for g in collisions)
        rb_mx = max(rank[b][g] for g in collisions)
        if c_pre + min(na - ra_mx, nb - rb_mx) >= alpha:
            out.add((min(i, j), max(i, j)))
    return out


def test_accumulated_suffix_bound_lossless_model():
    """300 random universes x 4 thresholds: the model candidate set (with
    the accumulated bound) must contain every brute-force pair with
    J >= t.  An off-by-one in the bound (e.g. forgetting that collision
    ranks are 1-based, or maxing the wrong side's rank) drops borderline
    pairs and this catches it."""
    rng = random.Random(17)
    for t in (0.5, 0.55, 0.65, 0.8):
        for trial in range(300):
            n_docs = rng.randint(2, 8)
            universe = list(range(rng.randint(3, 14)))
            docs = {
                k: set(rng.sample(universe, rng.randint(1, len(universe))))
                for k in range(n_docs)
            }
            cand = _model_candidates(docs, t)
            for i, j in itertools.combinations(sorted(docs), 2):
                inter = len(docs[i] & docs[j])
                union = len(docs[i] | docs[j])
                if union and inter / union >= t:
                    assert (i, j) in cand, (
                        t, trial, sorted(docs[i]), sorted(docs[j]), inter / union
                    )


def test_accumulated_bound_actually_prunes():
    """Effectiveness witness: a pair whose SINGLE witness collision passes
    the per-row positional filter but whose accumulated bound proves the
    overlap cannot reach alpha must be pruned by the r17 rule.

    Construction at t = 0.65: x and y share exactly their two rarest
    tokens (the prefix heads), sizes 10/10 => alpha = ceil(0.65/1.65*20)
    = 8.  Each collision row alone gives bound 1 + min(10-1, 10-1) = 10
    >= 8 (per-row filter passes), but accumulated: c_pre = 2, ra_mx =
    rb_mx = 2 => 2 + min(8, 8) = 10 >= 8... so sharing MORE uniquely
    ranked tail tokens is needed; instead share the two PREFIX tokens at
    ranks 9 and 10 of each doc — impossible (prefix = rarest).  The
    witness below instead uses asymmetric sizes where the bound binds."""
    # x (size 16) and y (size 10) share exactly y's first prefix token.
    # t=0.65: size band ceil(.65*16)=11 > 10 -> banded out; use t=0.6:
    # alpha = ceil(0.6/1.6 * 26) = ceil(9.75) = 10; per-row filter for a
    # collision at ranks (1, 1): 1 + min(15, 9) = 10 >= 10 passes, but
    # TRUE overlap can be at most... accumulated with c_pre = 1, ra_mx=1,
    # rb_mx=1 gives the same 10 — equal, passes.  To get a strict prune,
    # use a collision at ranks (1, 2): 1 + min(15, 8) = 9 < 10 — per-row
    # already rejects.  The regimes only separate with c_pre >= 2:
    # collisions at ranks (1,1) and (7,2): per-row mins are 10 and 8 ->
    # one passing witness under the OLD rule; accumulated: c_pre = 2,
    # ra_mx = 7, rb_mx = 2, bound = 2 + min(9, 8) = 10 >= 10 passes...
    # and with ranks (1,1) and (8,3): bound = 2 + min(8, 7) = 9 < 10 —
    # pruned, while the old rule kept it on the (1,1) witness (1 +
    # min(15, 9) = 10 >= 10).  Model that exact geometry.
    t = 0.6
    na, nb = 16, 10
    alpha = _ceil9(t / (1.0 + t) * (na + nb))
    assert alpha == 10
    # old rule: witness at (ra=1, rb=1) passes the per-row filter
    assert 1 + min(na - 1, nb - 1) >= alpha
    # second collision at (ra=8, rb=3) fails per-row, but contributes to
    # the accumulated count
    assert 1 + min(na - 8, nb - 3) < alpha
    # r17 accumulated bound over BOTH collisions: strictly below alpha
    c_pre, ra_mx, rb_mx = 2, 8, 3
    assert c_pre + min(na - ra_mx, nb - rb_mx) < alpha
    # ... and it is SAFE to prune: common tokens are a prefix of the
    # ordered common sequence, so with the 2nd common token at ranks
    # (8, 3), at most min(16-8, 10-3) = 7 more can follow => overlap <=
    # 9 < 10 = alpha => true J < t.  (The arithmetic above IS the proof;
    # this comment anchors it to the docstring's argument.)


def test_spark_candidates_still_superset_and_canonical(spark):
    """End-to-end through the real operator after the r17 groupBy rewrite:
    candidate set still contains every brute-force pair with J >= t,
    rows still canonicalized (doc_a < doc_b) exactly once, and the set
    matches the pure-Python model exactly (the model is the spec)."""
    from gcp_cloudsql_to_bigquery_spark.operators.dedup import (
        prefix_filtered_candidates,
    )

    rng = random.Random(71)
    t = 0.65
    universe = list(range(1, 40))
    docs = {
        i: set(rng.sample(universe, rng.randint(1, 25))) for i in range(1, 31)
    }
    docs[100] = set(docs[1])                         # exact dup
    docs[101] = set(list(sorted(docs[2]))[:-1]) or {1}  # borderline near-dup
    docs[102] = docs[3] | {999}                      # superset near-dup
    sh = spark.createDataFrame(
        [(i, sorted(s)) for i, s in docs.items()],
        "doc_id long, hsh array<long>",
    )
    rows = prefix_filtered_candidates(sh, t).collect()
    got = [(r.doc_a, r.doc_b) for r in rows]
    assert len(got) == len(set(got))
    assert all(a < b for a, b in got)
    for i, j in itertools.combinations(sorted(docs), 2):
        inter = len(docs[i] & docs[j])
        union = len(docs[i] | docs[j])
        if union and inter / union >= t:
            assert (min(i, j), max(i, j)) in set(got), (i, j, inter / union)
    # exact agreement with the model (hashes in the operator are the raw
    # ints here, so ordering/df stats coincide)
    assert set(got) == _model_candidates(docs, t)


def test_lsh_size_band_lossless_and_prunes(spark):
    """r17 size band at the LSH band join: J >= 0.8 forces
    min(|A|,|B|) >= ceil9(0.8*max), so (a) every true pair at the 0.8
    verify threshold must still come out of lsh_candidate_pairs, and
    (b) a pair whose sizes violate the band must be pruned even when
    its minhash bands collide (identical prefix content + a long tail
    makes every band... not collide; instead make the small doc a strict
    subset so SOME bands can collide while J = |small|/|large| < 0.8)."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_to_bigquery_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        with_shingles,
    )

    # doc 1/2: near-identical long texts (J >= 0.8 guaranteed: only the
    # last char differs); doc 3: a short strict prefix of doc 1 (subset
    # shingles => minhash bands CAN collide, but size ratio < 0.8)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base + " tail one"),
        (2, base + " tail onX"),
        (3, base[:20]),
    ]
    d = with_shingles(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    sig = minhash_signatures(d)
    # n_sh must equal the distinct-shingle count (the oracle-grain size)
    sizes = {r.doc_id: r.n_sh for r in sig.collect()}
    expect = {
        r.doc_id: r.n for r in d.select(
            "doc_id", F.size("shingles").alias("n")).collect()
    }
    assert sizes == expect
    got = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()}
    assert (1, 2) in got           # true near-dup survives the band
    # the subset doc's size violates the 0.8 band against both long docs
    import math
    assert sizes[3] < math.ceil(round(0.8 * sizes[1], 9))
    assert (1, 3) not in got and (2, 3) not in got
