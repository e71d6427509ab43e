"""Property-based tests (hypothesis) for the core snapshot/skew
operators — the invariants that must hold for ANY input, not just the
testdata: fold/batch equivalence and strict-newest-wins for the MERGE
rewrite, and salting-never-changes-the-answer for the skew remedies.

Strategy sizes are kept small (each example builds Spark DataFrames),
with deadline disabled — JVM calls are orders of magnitude slower than
hypothesis' default budget assumes.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.operators.skew import salted_aggregate
from currency_etl_pipeline_spark.operators.upsert import latest_per_key, upsert_newest_wins

T0 = datetime(2024, 1, 1)

# A row: (key, minutes-offset timestamp, value, row_id). Few distinct
# keys + few distinct minutes force key collisions AND ts ties, the
# interesting cases for newest-wins.
row = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=0, max_value=10**6),
)
batches = st.lists(st.lists(row, min_size=0, max_size=6), min_size=1, max_size=4)

SCHEMA = "key string, ts timestamp, value int, row_id long"


def _df(spark, rows):
    data = [(k, T0 + timedelta(minutes=m), v, rid) for (k, m, v, rid) in rows]
    return spark.createDataFrame(data, SCHEMA)


@given(batches=batches)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_incremental_upsert_equals_one_shot(spark, batches):
    """Folding upsert_newest_wins over batches == latest_per_key of the
    concatenation, for every input where (key, ts) is unique ACROSS
    batches (the streaming foreachBatch invariant). With cross-batch ts
    ties the two deliberately differ: the strict `>` rule gives
    arrival-order precedence (earlier batch wins), while the one-shot
    argmax picks by tie-breaker — hypothesis found exactly that case,
    and test_equal_timestamp_keeps_current pins it separately."""
    seen = set()
    uniq_batches = []
    for b in batches:
        kept = []
        for r in b:
            sig = (r[0], r[1])  # (key, ts) unique across ALL batches
            if sig not in seen:
                seen.add(sig)
                kept.append(r)
        uniq_batches.append(kept)
    all_rows = [r for b in uniq_batches for r in b]
    if not all_rows:
        return

    snap = None
    for b in uniq_batches:
        batch = _df(spark, b)
        if snap is None:
            snap = latest_per_key(batch, ["key"], "ts", tie_breakers=["row_id"])
        else:
            snap = upsert_newest_wins(snap, batch, ["key"], "ts", tie_breakers=["row_id"])
    got = sorted(tuple(r) for r in snap.collect())

    want = sorted(
        tuple(r)
        for r in latest_per_key(_df(spark, all_rows), ["key"], "ts", tie_breakers=["row_id"]).collect()
    )
    assert got == want


@given(rows=st.lists(row, min_size=1, max_size=8), upd=st.lists(row, min_size=1, max_size=8))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_equal_timestamp_keeps_current(spark, rows, upd):
    """The strict `>` rule: an update with ts EQUAL to the current
    row's ts must never replace it (load_to_bigquery.py:102 semantics),
    regardless of values or tie-breakers."""
    current = latest_per_key(_df(spark, rows), ["key"], "ts", tie_breakers=["row_id"])
    cur = {r["key"]: r for r in current.collect()}
    cur_keys = sorted(cur)
    # Force every update onto an existing key at the exact current ts.
    data = [
        (k, cur[k]["ts"], v, rid)
        for i, (_, _, v, rid) in enumerate(upd)
        for k in [cur_keys[i % len(cur_keys)]]
    ]
    updates = spark.createDataFrame(data, SCHEMA)
    merged = {r["key"]: r for r in upsert_newest_wins(current, updates, ["key"], "ts").collect()}
    for k, r in cur.items():
        assert tuple(merged[k]) == tuple(r), f"equal-ts update replaced current row for {k}"


@given(rows=st.lists(row, min_size=0, max_size=12), n_salts=st.sampled_from([2, 5, 16]))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_salted_aggregate_matches_plain(spark, rows, n_salts):
    """Salting changes the plan, never the answer — for any data and
    any salt fan-out, including empty input and single-row groups."""
    df = _df(spark, rows)
    salted = salted_aggregate(
        df,
        keys=["key"],
        partial_aggs={"pn": F.count(F.lit(1)), "psum": F.sum("value"), "pmax": F.max("value")},
        final_aggs={
            "n": F.sum("pn"),
            "total": F.sum("psum"),
            "vmax": F.max("pmax"),
        },
        salt_col=F.xxhash64("row_id"),
        salt_n=n_salts,
    )
    plain = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("vmax"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_connected_components_chain_and_islands(spark):
    """Transitive chains collapse to one component (min id), disjoint
    islands stay apart, direction is ignored."""
    from currency_etl_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 12), (20, 21), (40, 30)], "s long, d long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges, "s", "d").collect()}
    assert got == {3: 3, 5: 3, 9: 3, 12: 3, 20: 20, 21: 20, 30: 30, 40: 30}


# A snapshot row: (key 0..5, value or None). Small key space forces
# overlaps; None values exercise the null-safe struct compare.
snap_row = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
)


def _snap(rows):
    # unique per key: last write wins (dict semantics)
    return dict(rows)


@given(
    old=st.lists(snap_row, min_size=0, max_size=8),
    new=st.lists(snap_row, min_size=0, max_size=8),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_snapshot_diff_applies_back_to_new(spark, old, new):
    """The CDC contract: applying diff(old, new) onto old must
    reconstruct new EXACTLY — inserts added, deletes removed, updates
    replaced, untouched keys carried over — for any pair of snapshots,
    including None-valued columns."""
    from currency_etl_pipeline_spark.operators.upsert import snapshot_diff

    o, n = _snap(old), _snap(new)
    odf = spark.createDataFrame(
        [(k, v) for k, v in o.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    ndf = spark.createDataFrame(
        [(k, v) for k, v in n.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    changes = snapshot_diff(odf, ndf, ["k"]).collect()
    rebuilt = dict(o)
    for r in changes:
        if r["change_type"] == "delete":
            del rebuilt[r["k"]]
        else:
            rebuilt[r["k"]] = r["new"]["v"]
    assert rebuilt == n, f"diff does not transport old -> new: {changes}"
    # and unchanged keys never appear in the feed
    changed_keys = {r["k"] for r in changes}
    for k in set(o) & set(n):
        if o[k] == n[k]:
            assert k not in changed_keys


# An as-of row: (key, minutes offset, is_probe, value). Row ids are
# assigned by position (unique across BOTH sides — the operator's
# tie_breaker contract); few keys/minutes force same-timestamp ties.
asof_row = st.tuples(
    st.sampled_from(["k1", "k2"]),
    st.integers(min_value=0, max_value=4),
    st.booleans(),
    st.integers(min_value=-5, max_value=5),
)


@given(
    rows=st.lists(asof_row, min_size=1, max_size=14),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_asof_join_matches_bruteforce(spark, rows, direction):
    """Both as-of directions must agree with the obvious per-probe
    scan for ANY input: backward = newest quote at-or-before by
    (ts, id); forward = earliest quote at-or-after. Includes equal-ts
    ties resolved by the tie_breaker and probes with no match (NULL)."""
    from currency_etl_pipeline_spark.operators.asof import asof_join

    data = [
        (k, T0 + timedelta(minutes=m), i, float(v), probe)
        for i, (k, m, probe, v) in enumerate(rows)
    ]
    quotes = [(k, ts, i, v) for (k, ts, i, v, probe) in data if not probe]
    probes = [(k, ts, i) for (k, ts, i, v, probe) in data if probe]
    if not probes or not quotes:
        return
    qdf = spark.createDataFrame(quotes, "key string, ts timestamp, rid long, val double")
    pdf = spark.createDataFrame(probes, "key string, ts timestamp, rid long")
    got = {
        r["rid"]: r["val"]
        for r in asof_join(
            pdf, qdf, on="key", ts_col="ts", value_col="val",
            tie_breaker="rid", direction=direction,
        ).collect()
    }
    want = {}
    for k, ts, i in probes:
        if direction == "backward":
            cands = [q for q in quotes if q[0] == k and (q[1], q[2]) <= (ts, i)]
            pick = max(cands, key=lambda q: (q[1], q[2]), default=None)
        else:
            cands = [q for q in quotes if q[0] == k and (q[1], q[2]) >= (ts, i)]
            pick = min(cands, key=lambda q: (q[1], q[2]), default=None)
        want[i] = pick[3] if pick else None
    assert got == want


def _union_find_components(pairs):
    """Ground-truth CC: plain driver-side union-find, min-id labels."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


# Random small graphs: node ids up to 30, up to 25 edges (self-loops
# and parallel edges included — both must be harmless).
cc_edge = st.tuples(
    st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)
)


@given(pairs=st.lists(cc_edge, min_size=1, max_size=25))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_star_contraction_matches_union_find(spark, pairs):
    """The large-star/small-star path must produce exactly the same
    (node -> min-id component) labeling as driver-side union-find for
    ANY small graph — including self-loops, parallel edges, and
    reversed duplicates."""
    from currency_etl_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(pairs, "s long, d long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "s", "d", algorithm="star").collect()
    }
    assert got == _union_find_components(pairs)


def test_cc_auto_falls_back_to_star_on_giant_diameter(spark):
    """A 60-node path has diameter 59 > max_iter=20 supersteps:
    'propagate' must raise, 'star' must solve it in O(log n) rounds,
    and the default 'auto' must fall back to star instead of failing —
    the max_iter raise is retired for callers."""
    import pytest as _pytest

    from currency_etl_pipeline_spark.operators.graph import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(59)], "s long, d long")
    want = {i: 0 for i in range(60)}

    star = {
        r["node"]: r["component"]
        for r in connected_components(path, "s", "d", algorithm="star").collect()
    }
    assert star == want

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, "s", "d", max_iter=5, algorithm="propagate").collect()

    auto = {
        r["node"]: r["component"]
        for r in connected_components(path, "s", "d", max_iter=5).collect()
    }
    assert auto == want


# A packing corpus row: (doc_id, lang, n_tokens). Small doc_ids force
# multi-doc blocks; token counts larger than the budget exercise the
# oversized-document case (a doc longer than the budget must still
# land in exactly one shard and push subsequent docs onward).
pack_row = st.tuples(
    st.integers(min_value=0, max_value=200),
    st.sampled_from(["en", "de"]),
    st.integers(min_value=0, max_value=40),
)


@given(rows=st.lists(pack_row, min_size=0, max_size=30), budget=st.sampled_from([16, 64]))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sequence_packing_matches_sequential_scan(spark, rows, budget):
    """The two-level distributed prefix sum must agree with the
    obvious single-threaded scan for ANY corpus and any budget:
    shard = floor(exclusive-running-total / budget) per language in
    doc_id order, total tokens conserved."""
    from currency_etl_pipeline_spark.queries.llm_prep import packed_docs

    uniq = {}
    for did, lang, n in rows:
        uniq[did] = (lang, n)
    data = [(did, lang, " ".join(["w"] * n)) for did, (lang, n) in sorted(uniq.items())]
    if not data:
        return
    docs = spark.createDataFrame(data, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in packed_docs(docs, budget=budget, block=8).collect()
    }
    # Oracle: sequential scan per language.
    running: dict = {}
    for did, (lang, n) in sorted(uniq.items()):
        # split(" ".join([])) tokenizes the empty string to [''] — one
        # token — matching the engine's whitespace tokenizer on
        # zero-word docs.
        n_tok = max(n, 1)
        cum = running.get(lang, 0)
        assert got[did] == (n_tok, cum // budget), (
            f"doc {did} ({lang}): got {got[did]}, want ({n_tok}, {cum // budget})"
        )
        running[lang] = cum + n_tok
    assert len(got) == len(uniq)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=25,
    ),
    rejected=st.sets(st.integers(0, 14), max_size=6),
)
@settings(max_examples=60, deadline=None)
def test_sequential_admission_pandas_matches_reference(edges, rejected):
    """operators/dedup.sequential_admission_pandas (the per-component
    greedy shared by stream_minhash_ingest(exact_chains=True) and
    sequential_dedup_admission) must equal a brute-force sequential
    reference on arbitrary graphs: iterate node ids ascending, reject
    on corpus flag or any previously-ADMITTED neighbor. Exercised
    directly on the pandas function (one 'component' holding the whole
    graph — the grouping only shards the work)."""
    import pandas as pd

    from currency_etl_pipeline_spark.operators.dedup import (
        sequential_admission_pandas,
    )

    nodes = sorted({n for e in edges for n in e} | rejected)
    rows = [
        {"component": 0, "a": n, "b": None, "rej": 1 if n in rejected else 0}
        for n in nodes
    ] + [{"component": 0, "a": a, "b": b, "rej": 0} for a, b in edges]
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["component", "a", "b", "rej"])
    got = sorted(sequential_admission_pandas(pdf)["doc_id"].tolist())

    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    admitted: set = set()
    for n in nodes:
        if n in rejected or adj.get(n, set()) & admitted:
            continue
        admitted.add(n)
    assert got == sorted(admitted)


def test_semdedup_kernel_pairwise_semantics_and_guards():
    """queries/vectors._semdedup_prune_cell (the per-cell SemDeDup
    kernel): pin the pairwise-admission rule on a planted a~b~c chain
    (cos(a,b)=cos(b,c)=0.707 >= 0.45, cos(a,c)=0 < 0.45): b is pruned
    by a AND c is pruned by b even though c's only duplicate neighbor
    was itself pruned — the documented difference from the exact-chain
    semantics of sequential_dedup_admission. Also pins the d > 0 guard
    (antipodal vectors have |cos| = 1 but are NOT duplicates) and that
    neighbor counts are symmetric."""
    import numpy as np
    import pandas as pd

    from currency_etl_pipeline_spark.queries.vectors import _semdedup_prune_cell

    dim = 64
    a = [0.0] * dim
    b = [0.0] * dim
    c = [0.0] * dim
    neg_a = [0.0] * dim
    a[0] = 100.0
    b[0] = 100.0
    b[1] = 100.0
    c[1] = 100.0
    neg_a[0] = -100.0
    pdf = pd.DataFrame(
        {
            "vec_id": [3, 1, 2, 4],  # deliberately unsorted input
            "cid": [0, 0, 0, 0],
            "qv": [c, a, b, neg_a],
        }
    )
    out = _semdedup_prune_cell(pdf).set_index("vec_id")
    assert out.loc[1, "pruned"] == False  # noqa: E712 — numpy bool
    assert out.loc[2, "pruned"] == True  # noqa: E712
    assert out.loc[3, "pruned"] == True  # noqa: E712
    assert out.loc[4, "pruned"] == False  # noqa: E712 — dot(a, -a) < 0
    assert out["n_dup_neighbors"].to_dict() == {1: 1, 2: 2, 3: 1, 4: 0}


def test_semdedup_kernel_int64_headroom():
    """Worst-case int8 codes (every component ±127) must stay exact in
    the kernel's int64 products: 400·dot² = 400·(127²·64)² ≈ 4.3e14 and
    81·na·nb ≈ 8.7e13, both far under 2^63 — the same bound the oracle's
    BIGINT arithmetic relies on. A full-magnitude identical pair and its
    negation exercise the extremes."""
    import pandas as pd

    from currency_etl_pipeline_spark.queries.vectors import _semdedup_prune_cell

    hi = [127.0] * 64
    lo = [-127.0] * 64
    out = _semdedup_prune_cell(
        pd.DataFrame({"vec_id": [1, 2, 3], "cid": [0] * 3, "qv": [hi, hi, lo]})
    ).set_index("vec_id")
    assert bool(out.loc[2, "pruned"]) and not bool(out.loc[1, "pruned"])
    assert not bool(out.loc[3, "pruned"]) and out.loc[3, "n_dup_neighbors"] == 0


@given(
    vecs=st.lists(
        st.lists(st.integers(-127, 127), min_size=4, max_size=4),
        min_size=1,
        max_size=12,
    ),
    rej_mask=st.lists(st.booleans(), min_size=12, max_size=12),
)
@settings(max_examples=80, deadline=None)
def test_semdedup_admit_kernel_matches_reference(vecs, rej_mask):
    """sources/semdedup_index._admit_cell_greedy must equal a
    brute-force sequential reference on arbitrary int8-ish code sets:
    iterate ids ascending, reject on the corpus flag or on a duplicate
    (d > 0 and den2·d² ≥ num2·na·nb) against any previously-ADMITTED
    row. 4-dim codes keep hypothesis fast; the inequality arithmetic is
    identical at any width. Zero vectors get na = 0, so they are never
    duplicates of anything (d = 0 fails the d > 0 guard) — the kernel
    must admit them unless corpus-flagged."""
    import pandas as pd

    from currency_etl_pipeline_spark.sources.semdedup_index import _admit_cell_greedy

    n = len(vecs)
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(n)),
            "cid": [0] * n,
            "qv": [[float(x) for x in v] for v in vecs],
            "rej": [bool(rej_mask[i]) for i in range(n)],
            "tn2": [81] * n,
            "td2": [400] * n,
        }
    )
    got = {
        int(r.vec_id): bool(r.admitted)
        for r in _admit_cell_greedy(pdf).itertuples()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    admitted: list = []
    want = {}
    for i in range(n):
        if rej_mask[i]:
            want[i] = False
            continue
        na = dot(vecs[i], vecs[i])
        dup = any(
            dot(vecs[i], vecs[j]) > 0
            and 400 * dot(vecs[i], vecs[j]) ** 2 >= 81 * na * dot(vecs[j], vecs[j])
            for j in admitted
        )
        want[i] = not dup
        if not dup:
            admitted.append(i)
    assert got == want


# --- r11: independent references for the shared-construction kernels ---
# The simhash verify and the BPE loop use the SAME device in Spark and
# in their DuckDB oracles (array set-intersection; double-space string
# replace), so oracle parity alone cannot catch a flaw in the device
# itself. These properties check both against textbook list-based
# python implementations that share nothing with either engine.


_jv_doc = st.lists(
    st.sampled_from(["a", "b", "c", "aa", "ab"]), min_size=0, max_size=12
)


@given(docs=st.lists(_jv_doc, min_size=2, max_size=6), thr_pct=st.sampled_from([30, 50, 80]))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_jaccard_verify_pairs_matches_bruteforce(spark, docs, thr_pct):
    """jaccard_verify_pairs == per-pair python set Jaccard, for every
    candidate pair over random tiny corpora: same surviving pairs, same
    rounded values; pairs where a side has no shingles are dropped."""
    from currency_etl_pipeline_spark.operators.dedup import jaccard_verify_pairs

    threshold = thr_pct / 100.0
    shingle_sets = {
        i: {" ".join(d[j : j + 3]) for j in range(len(d) - 2)} if len(d) >= 3 else set()
        for i, d in enumerate(docs)
    }
    cand_rows = [(a, b) for a in shingle_sets for b in shingle_sets if a < b]
    if not cand_rows:
        return
    cand = spark.createDataFrame(cand_rows, "id_a long, id_b long")
    sh_rows = [(i, s) for i, ss in shingle_sets.items() for s in ss]
    if not sh_rows:
        return
    shingled = spark.createDataFrame(sh_rows, "doc_id long, shingle string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verify_pairs(
            cand, shingled, "doc_id", "shingle", threshold=threshold
        ).collect()
    }
    want = {}
    for a, b in cand_rows:
        sa, sb = shingle_sets[a], shingle_sets[b]
        if not sa or not sb:
            continue  # unverifiable side -> dropped (inner-join semantics)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            want[(a, b)] = round(j, 6)
    assert got == want


def _ref_bpe(word_counts: dict, iters: int):
    """Textbook list-based BPE (Sennrich et al.): count adjacent symbol
    pairs weighted by word frequency, merge the arg-max (ties: lowest
    (pa, pb)) left-to-right non-overlapping, repeat."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(iters):
        counts: dict = {}
        for w, syms in vocab.items():
            wf = word_counts[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + wf
        if not counts:
            break
        (pa, pb), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((pa, pb, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


_bpe_word = st.text(alphabet="ab", min_size=1, max_size=5)


@given(docs=st.lists(st.lists(_bpe_word, min_size=1, max_size=6), min_size=1, max_size=5))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_learn_matches_textbook_reference(spark, docs, tmp_path_factory):
    """_bpe_learn (string-replace merges over double-space-delimited
    sequences) == textbook list-based BPE, merge table AND final
    per-word symbol sequences, on random tiny two-letter corpora — the
    alphabet forces overlap cases ('aaa') and back-to-back merges
    ('abab') every few examples."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_pipeline_spark.queries.llm_prep import _bpe_learn

    tmp = tmp_path_factory.mktemp("bpe_prop")
    texts = [" ".join(ws) for ws in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp / "documents.parquet",
    )
    word_counts = collections.Counter(w for ws in docs for w in ws)
    ref_merges, ref_vocab = _ref_bpe(dict(word_counts), iters=4)
    merges, vocab = _bpe_learn(spark, str(tmp), iters=4)
    assert [(pa_, pb_, c) for _, pa_, pb_, _, c in merges] == ref_merges
    got_vocab = {
        r["word"]: r["seq"].strip(" ").split("  ") for r in vocab.collect()
    }
    assert got_vocab == {w: syms for w, syms in ref_vocab.items()}


@given(docs=st.lists(st.lists(_bpe_word, min_size=1, max_size=6), min_size=1, max_size=5))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_encode_matches_textbook_reference(spark, docs, tmp_path_factory):
    """bpe_encode_docs == textbook encode, ids and order, on random
    tiny corpora (r12). The Spark encode and its DuckDB oracle share
    the whole device (rank-of-symbol ids, positional assembly), so
    oracle parity cannot catch a flaw in the device itself — this is
    the independent check, per the r11 convention: encode each doc by
    looking its words up in the textbook reference's final vocab and
    assigning each symbol the 1-based rank within the sorted distinct
    symbol inventory (exactly what sym_ids' row_number ORDER BY sym
    computes)."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from currency_etl_pipeline_spark.queries.llm_prep import (
        _BPE_ITERS,
        bpe_encode_docs,
    )

    tmp = tmp_path_factory.mktemp("bpe_enc_prop")
    texts = [" ".join(ws) for ws in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp / "documents.parquet",
    )
    word_counts = collections.Counter(w for ws in docs for w in ws)
    _, ref_vocab = _ref_bpe(dict(word_counts), iters=_BPE_ITERS)
    inventory = sorted({s for seq in ref_vocab.values() for s in seq})
    tid = {s: i + 1 for i, s in enumerate(inventory)}
    expected = {
        i: ([tid[s] for w in ws for s in ref_vocab[w]], len(ws))
        for i, ws in enumerate(docs)
    }
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_words"])
        for r in bpe_encode_docs(spark, str(tmp)).collect()
    }
    assert got == expected
    for r in bpe_encode_docs(spark, str(tmp)).select("token_ids", "n_bpe_tokens").collect():
        assert len(r["token_ids"]) == r["n_bpe_tokens"]


# ---------------------------------------------------------------------------
# Sub-passage (arbitrary-boundary) exact substring dedup — r13.
# The planted cross-boundary duplicate BELOW is the query's reason to
# exist: a 16-word span duplicated at off-grid offsets in both docs,
# which the fixed-chunk passage rewrite provably cannot see.
# ---------------------------------------------------------------------------


def test_subpassage_catches_cross_boundary_dup_that_fixed_chunks_miss(spark):
    from currency_etl_pipeline_spark.queries.llm_prep import (
        passage_rewrite,
        subpassage_rewrite,
    )

    a_words = [f"alpha{i}" for i in range(24)]
    span = a_words[4:20]  # 16 words, starting off-grid (offset 4) in doc 1
    b_words = [f"filler{i}" for i in range(8)] + span + [f"tail{i}" for i in range(4)]
    docs = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, " ".join(b_words))], ["doc_id", "text"]
    )

    # Fixed 16-word chunks: the duplicate starts at offset 4 in doc 1
    # and offset 8 in doc 2 — no chunk of one doc equals any chunk of
    # the other, so the fixed-grid rewrite keeps EVERYTHING.
    fixed = {r["doc_id"]: r for r in passage_rewrite(docs).collect()}
    assert all(r["n_kept"] == r["n_passages"] for r in fixed.values())
    assert fixed[2]["clean_text"] == " ".join(b_words)

    # Stride-1 windows: doc 2's window at position 8 is byte-identical
    # to doc 1's window at position 4; keep-first removes the doc-2
    # copy (positions 8..23) and leaves doc 1 intact.
    sub = {r["doc_id"]: r for r in subpassage_rewrite(docs).collect()}
    assert sub[1]["n_removed_words"] == 0
    assert sub[1]["clean_text"] == " ".join(a_words)
    assert sub[2]["n_dup_spans"] == 1
    assert sub[2]["n_removed_words"] == 16
    assert sub[2]["clean_text"] == " ".join(b_words[:8] + b_words[24:])


def test_subpassage_conservation_and_nonvacuity(spark, sf_dir):
    """Every rewritten doc conserves words (kept + removed == total),
    span counts agree with removal counts, and the fixture corpus
    actually exercises the operator (organic duplicated spans)."""
    from currency_etl_pipeline_spark.queries import all_queries

    rows = all_queries()["subpassage_dedup_rewrite"].spark(spark, sf_dir).collect()
    assert rows
    n_dup_docs = 0
    for r in rows:
        kept = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert kept == r["n_words"] - r["n_removed_words"], r["doc_id"]
        assert 0 <= r["n_removed_words"] <= r["n_words"]
        assert (r["n_dup_spans"] > 0) == (r["n_removed_words"] > 0)
        # a merged span is at least one full window wide
        if r["n_dup_spans"]:
            assert r["n_removed_words"] >= 16
            n_dup_docs += 1
    assert n_dup_docs > 0  # non-vacuous: sf0.001 has 22 such docs


def _subpassage_reference(texts: dict[int, str], w: int):
    """Textbook single-node reference for subpassage_rewrite: find all
    w-word windows, keep the globally first occurrence of each distinct
    window (ordered by (doc_id, position)), mark every other
    occurrence's word range, merge ranges per doc, drop covered words."""
    toks = {d: t.strip().split() if t.strip() else [""] for d, t in texts.items()}
    first: dict[tuple, tuple] = {}
    for d in sorted(toks):
        ws = toks[d]
        for i in range(len(ws) - w + 1):
            key = tuple(ws[i : i + w])
            if key not in first:
                first[key] = (d, i)
    out = {}
    for d in sorted(toks):
        ws = toks[d]
        covered = set()
        spans = []
        for i in range(len(ws) - w + 1):
            if first[tuple(ws[i : i + w])] != (d, i):
                covered.update(range(i, i + w))
        # merged maximal spans = islands of the covered position set
        pos = sorted(covered)
        for p in pos:
            if spans and p == spans[-1][1]:
                spans[-1][1] = p + 1
            elif not spans or p > spans[-1][1]:
                spans.append([p, p + 1])
        kept = [x for j, x in enumerate(ws) if j not in covered]
        out[d] = (len(ws), len(spans), len(covered), " ".join(kept))
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(  # tiny vocab + short docs force organic window collisions
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_subpassage_rewrite_matches_reference(spark, docs, w):
    from currency_etl_pipeline_spark.queries.llm_prep import subpassage_rewrite

    texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_dup_spans"],
            r["n_removed_words"],
            r["clean_text"],
        )
        for r in subpassage_rewrite(df, w=w).collect()
    }
    assert got == _subpassage_reference(texts, w)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=25, unique=True),
    st.integers(min_value=2, max_value=16),
)
def test_merged_spans_fold_matches_textbook_merge(spark, hits, w):
    """The array-fold span merge (merged_spans — the streaming-safe
    form window functions can't provide) == textbook interval merge of
    [h, h+w) ranges, on random hit position sets."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.llm_prep import merged_spans

    hits = sorted(hits)
    df = spark.createDataFrame([(hits,)], "hits array<int>")
    got = [
        (s["s"], s["e"])
        for s in df.select(merged_spans(F.col("hits"), w).alias("sp")).collect()[0]["sp"]
    ]
    ref = []
    for h in hits:
        if ref and h <= ref[-1][1]:
            ref[-1][1] = h + w
        else:
            ref.append([h, h + w])
    assert got == [tuple(r) for r in ref]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_rolling_hash_equality_pattern_matches_window_strings(spark, docs, n):
    """The rolling-window device's whole contract: two positions get
    the same 62-bit hash IFF their window strings are equal (tiny
    vocab forces dense organic collisions; a polynomial-chain bug —
    wrong base order, a dropped token, NULL-tail misalignment — shows
    up as a pattern mismatch here before any oracle would see it)."""
    from pyspark.sql import functions as F

    from currency_etl_pipeline_spark.queries.text import (
        positional_windows,
        rolled_window_hashes,
        token_hashes,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = (
        df.select("doc_id", positional_windows("text", n).alias("w"), token_hashes().alias("tv"))
        .select("doc_id", "w", rolled_window_hashes(F.col("tv"), n).alias("h"))
        .collect()
    )
    by_string: dict[str, int] = {}
    hashes = set()
    for r in out:
        ws = r["w"] or []
        hs = r["h"] or []
        assert len(ws) == len(hs)
        for s, h in zip(ws, hs):
            assert by_string.setdefault(s, h) == h, "equal windows, different hash"
            hashes.add(h)
    assert len(hashes) == len(by_string), "distinct windows collided"


def test_subpassage_oracle_nongate_bytes_pinned():
    """The gate parameterization (r14) must never drift the long-green
    batch oracle: _subpassage_oracle() is pinned to the md5 of the
    exact string the r13 driver sweep hash-validated."""
    import hashlib

    from currency_etl_pipeline_spark.queries.llm_prep import _subpassage_oracle

    digest = hashlib.md5(_subpassage_oracle().encode()).hexdigest()
    assert digest == "253240a83b3de577599a3c76bec73210", digest


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(["x", "y", "zz"]), min_size=0, max_size=20),
    st.integers(min_value=2, max_value=13),
)
def test_shingles_matches_textbook_sliding_windows(spark, words, n):
    """Independent reference for the zip_with shingle device (the
    shared-construction-oracle lesson): distinct n-token windows in
    first-occurrence order equal a plain python sliding window scan."""
    from currency_etl_pipeline_spark.queries.text import shingles

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(shingles(n=n).alias("sh")).collect()[0]["sh"]
    toks = text.strip().split() if text.strip() else [""]
    seen, ref = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            ref.append(s)
    assert got == ref
