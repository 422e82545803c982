"""Property-based differential tests (hypothesis): engine operators vs
straight-Python models on randomized inputs. Complements the
fixed-corpus oracle — hypothesis hunts the edge cases a static corpus
misses (empty inputs, all-duplicate keys, single groups, negative
values).

Example counts are kept small: every example is a full Spark
plan+execute round trip (~0.5 s); the value is input shape diversity,
not volume.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_etl_spark.dedup import dedup_exact
from aws_etl_spark.ops import salted_agg, upsert

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_kv_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: few values → collisions
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=30,
)


@_settings
@given(target=_kv_rows, updates=_kv_rows)
def test_upsert_matches_dict_model(spark, target, updates):
    """upsert == dict-overwrite model, up to per-key multiplicity:
    updates fully replace a key's rows; untouched keys pass through."""
    # model: dedupe updates to one row per key (merge-semantics input)
    upd = {}
    for k, v in updates:
        upd[k] = v
    t_df = spark.createDataFrame(target, ["k", "v"])
    u_df = spark.createDataFrame(sorted(upd.items()), ["k", "v"])
    got = Counter((r.k, r.v) for r in upsert(t_df, u_df, ["k"]).collect())
    expected = Counter()
    for k, v in upd.items():
        expected[(k, v)] += 1
    for k, v in target:
        if k not in upd:
            expected[(k, v)] += 1
    assert got == expected


@_settings
@given(rows=_kv_rows)
def test_dedup_exact_keeps_min_survivor(spark, rows):
    """dedup_exact: exactly one survivor per distinct key group, and it
    is the minimum id; idempotent on its own output."""
    data = [(i, k) for i, (k, _) in enumerate(rows)]
    df = spark.createDataFrame(data, ["id", "k"])
    out = dedup_exact(df, ["k"], "id")
    got = {r.k: r.id for r in out.collect()}
    expected = {}
    for i, k in data:
        expected[k] = min(expected.get(k, i), i)
    assert got == expected
    again = dedup_exact(out, ["k"], "id")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


@_settings
@given(rows=_kv_rows, n_salts=st.integers(min_value=1, max_value=7))
def test_salted_agg_matches_plain_groupby(spark, rows, n_salts):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: (r.s, r.n, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
            n_salts=n_salts,
        ).collect()
    }
    expected = {}
    for k, v in rows:
        s, n, mx = expected.get(k, (0, 0, None))
        expected[k] = (s + v, n + 1, v if mx is None else max(mx, v))
    assert got == expected


@_settings
@given(a=_kv_rows, b=_kv_rows)
def test_set_ops_match_multiset_model(spark, a, b):
    """exceptAll/intersectAll are MULTISET ops — model with Counters."""
    da = spark.createDataFrame(a, ["k", "v"])
    db = spark.createDataFrame(b, ["k", "v"])
    ca, cb = Counter(a), Counter(b)
    got_except = Counter(map(tuple, da.exceptAll(db).collect()))
    got_inter = Counter(map(tuple, da.intersectAll(db).collect()))
    assert got_except == ca - cb
    assert got_inter == ca & cb


# ---------------------------------------------------------------------------
# Misra-Gries kernel invariants (pure python — the streaming heavy
# hitters' correctness core, independent of Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
import pytest

# Round-14 verify-budget split (r13 verdict item 1): this is one of
# the heavyweight gate suites excluded from the driver's default
# pytest run; builder gates run it via -m "slow or not slow".
pytestmark = pytest.mark.slow


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=5),
)
def test_misra_gries_bounds(stream, capacity, n_batches):
    """For ANY stream, batch split, and capacity: every counter is an
    under-estimate, the error is bounded by total decrements, and
    decrements ≤ n/(capacity+1)."""
    import pandas as pd

    from aws_etl_spark.streaming.heavy_hitters import _mg_update

    counters: dict = {}
    decrements = 0
    size = max(1, len(stream) // n_batches)
    for i in range(0, len(stream), size):
        batch = pd.Series(stream[i : i + size]).value_counts()
        decrements += _mg_update(counters, batch, capacity)
    exact = pd.Series(stream).value_counts().to_dict()
    assert len(counters) <= capacity
    assert decrements <= len(stream) // (capacity + 1)
    for v, c in counters.items():
        assert c <= exact[v]
        assert exact[v] - c <= decrements
    # completeness: anything with true count > decrements must survive
    for v, n in exact.items():
        if n > decrements:
            assert v in counters, (v, n, decrements, counters)


_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    min_size=1,
    max_size=20,
).filter(lambda es: any(a != b for a, b in es))


@_settings
@given(edges=_edge_lists)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered wedge enumeration == brute-force triangle scan
    on random multigraph inputs (self-loops/dups/orientation noise)."""
    from itertools import combinations

    from aws_etl_spark.dedup.graph_metrics import triangle_counts

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: (r.degree, r.triangles)
        for r in triangle_counts(df).collect()
    }
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in es for n in e}
    adj = {n: {m for e in es for m in e if n in e and m != n} for n in nodes}
    tri = Counter()
    for a, b, c in combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    expected = {n: (len(adj[n]), tri.get(n, 0)) for n in nodes}
    assert got == expected


@_settings
@given(edges=_edge_lists)
def test_neighborhood_jaccard_matches_bruteforce(spark, edges):
    from itertools import combinations

    from aws_etl_spark.dedup.graph_metrics import neighborhood_jaccard

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): (r.n_common, r.deg_a, r.deg_b)
        for r in neighborhood_jaccard(df).collect()
    }
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in es for n in e}
    adj = {n: {m for e in es for m in e if n in e and m != n} for n in nodes}
    expected = {}
    for a, b in combinations(sorted(nodes), 2):
        common = adj[a] & adj[b]
        if common:
            expected[(a, b)] = (len(common), len(adj[a]), len(adj[b]))
    assert got == expected


@_settings
@given(edges=_edge_lists)
def test_label_propagation_matches_python_model(spark, edges):
    """4-round synchronous LPA == a straight-Python reimplementation
    with the same vote/tiebreak — pins the round semantics the
    unrolled-CTE oracle also encodes."""
    from aws_etl_spark.dedup.graph_metrics import label_propagation

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.label
        for r in label_propagation(df, n_rounds=4).collect()
    }
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    adj = {n: sorted({m for e in es for m in e if n in e and m != n}) for n in nodes}
    labels = {n: n for n in nodes}
    for _ in range(4):
        nxt = {}
        for n in nodes:
            votes = Counter(labels[m] for m in adj[n])
            best = min(votes, key=lambda l: (-votes[l], l))
            nxt[n] = best
        labels = nxt
    assert got == labels


_doc_lists = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=0,
        max_size=9,
    ),
    min_size=1,
    max_size=6,
)


@_settings
@given(docs=_doc_lists)
def test_span_profile_matches_python_model(spark, docs):
    """doc_span_profile == set-model: per-doc distinct k-grams and
    how many occur in ≥1 other doc (short docs → zero spans)."""
    from aws_etl_spark.dedup.spans import doc_span_profile

    k = 3
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in doc_span_profile(df, k=k).collect()
    }
    spans = {
        i: {
            " ".join(words[j : j + k])
            for j in range(len(words) - k + 1)
        }
        for i, words in enumerate(docs)
    }
    expected = {}
    for i, s in spans.items():
        dup = {
            sp for sp in s if any(sp in o for j, o in spans.items() if j != i)
        }
        expected[i] = (len(s), len(dup))
    assert got == expected


@_settings
@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8).filter(
            lambda w: w.strip()
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_rounds_match_python_model(spark, texts):
    """Fixed-round BPE training == the shared canonical Python model
    (tests/bpe_reference.py) on random 2-letter corpora — tiny
    alphabet maximizes same-symbol runs, adjacent matches, and argmax
    ties (the gaps-and-islands and tiebreak seams). Degenerate corpora
    (every word fully merged before n_rounds) are kept: the operator
    must stop early with the same rule list."""
    from bpe_reference import canonical_bpe

    from aws_etl_spark.text.bpe import bpe_train

    corpus = " ".join(texts)
    df = spark.createDataFrame([(0, corpus)], ["doc_id", "text"])
    n_rounds = 2
    expected_merges, expected_vocab = canonical_bpe([corpus], n_rounds)

    merges, vocab = bpe_train(df, "text", n_rounds=n_rounds)
    got = [
        (r.round, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in merges.orderBy("round").collect()
    ]
    assert got == expected_merges
    assert {
        r.sym: r.n_occurrences for r in vocab.collect()
    } == expected_vocab


@_settings
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_canonical_distance_propagation_matches_bfs(spark, edges):
    """The enc = label*64 + dist min-propagation equals per-component
    BFS from the min node on arbitrary small graphs. The replay runs
    n_nodes - 1 iterations — diameter is at most n_nodes - 1 (a
    13-node path graph has diameter 12, which the old fixed 8 rounds
    could NOT cover), so convergence is guaranteed for every
    generable graph (the production query's k=8 is justified
    separately by corpus cluster diameter)."""
    from collections import deque

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    # inline the query's propagation on an arbitrary edge list
    e = (
        pdf.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pdf.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
    )
    state = e.select("u").distinct().select(
        "u", (F.col("u") * 64).cast("long").alias("enc")
    )
    n_nodes = len({n for p in pairs for n in p})
    for _ in range(max(1, n_nodes - 1)):
        neigh = (
            e.join(state.select(F.col("u").alias("src"), "enc"),
                   F.col("u") == F.col("src"))
            .groupBy(F.col("v").alias("nu"))
            .agg(F.min(F.col("enc") + 1).alias("nenc"))
        )
        state = state.join(neigh, state["u"] == neigh["nu"], "left").select(
            state["u"],
            F.least(state["enc"], F.coalesce(F.col("nenc"), state["enc"])).alias("enc"),
        )
        # Each round references `state` twice; without lineage
        # truncation the unrolled plan doubles per round (2^12 leaves
        # on a 13-node graph blew past 30 min of Catalyst analysis).
        # The production query checkpoints per round for the same
        # reason (queries/dedup_queries.py).
        state = state.localCheckpoint(eager=True)
    got = {
        r["u"]: (r["enc"] // 64, r["enc"] % 64) for r in state.collect()
    }

    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect, seen = {}, set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = {start}, deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    q.append(v)
        seen |= comp
        root = min(comp)
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for u in comp:
            expect[u] = (root, dist[u])
    assert got == expect


@_settings
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=50), min_size=2, max_size=20
    )
)
def test_cusum_window_identity_matches_recurrence(spark, xs):
    """prefix-sum-minus-running-extremum == max(0, S+e) recurrence on
    arbitrary integer series (the identity events_cusum_changepoint
    relies on), exercised through Spark windows."""
    n = len(xs)
    total = sum(xs)
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["i", "x"])
    out = spark.sql(
        """
        WITH e AS (
          SELECT i, x, x * {n} - {total} AS e_q FROM {df}
        ),
        p AS (
          SELECT i, e_q,
                 SUM(e_q) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS p_q
          FROM e
        )
        SELECT i,
               p_q - LEAST(CAST(0 AS BIGINT),
                           MIN(p_q) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING))
                 AS pos,
               GREATEST(CAST(0 AS BIGINT),
                        MAX(p_q) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING))
                 - p_q AS neg
        FROM p ORDER BY i
        """.replace("{n}", str(n)).replace("{total}", str(total)),
        df=df,
    ).collect()
    s_pos = s_neg = 0
    for row, x in zip(out, xs):
        e = x * n - total
        s_pos = max(0, s_pos + e)
        s_neg = max(0, s_neg - e)
        assert row["pos"] == s_pos
        assert row["neg"] == s_neg


# -- round-9 additions: randomized-input models -------------------------------


_daily_series = st.lists(
    st.integers(min_value=1, max_value=40),  # events per day
    min_size=1,
    max_size=8,
)


@_settings
@given(per_day=_daily_series)
def test_theilsen_matches_python_model(spark, per_day):
    """events_theilsen_trend == brute-force pairwise-slope median with
    the query's exact rank semantics (order by (slope, t1, t2), pick
    the integer-division middle ranks, mean them)."""
    import datetime as dt

    from aws_etl_spark.queries.event_analytics import _theilsen_spark

    rows, eid = [], 0
    for d, n in enumerate(per_day):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, d + 1, i % 24, 0, 0), i, "view", 1.0)
            )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).createOrReplaceTempView("events")
    got = spark.sql(_theilsen_spark()).collect()[0]

    days = sorted({(r[1].date() - dt.date(1970, 1, 1)).days for r in rows})
    vol = {}
    for r in rows:
        t = (r[1].date() - dt.date(1970, 1, 1)).days
        vol[t] = vol.get(t, 0) + 1
    pairs = [
        ((vol[t2] - vol[t1]) / (t2 - t1), t1, t2)
        for i, t1 in enumerate(days)
        for t2 in days[i + 1 :]
    ]
    assert got["n_days"] == len(days) and got["n_pairs"] == len(pairs)
    if not pairs:
        assert got["slope_per_day"] is None
        return
    pairs.sort()
    m = len(pairs)
    picks = sorted({(m + 1) // 2, (m + 2) // 2})
    sel = [pairs[rn - 1][0] for rn in picks]
    assert got["slope_per_day"] == sum(sel) / len(sel)


_mw_values = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),  # day of January
        st.integers(min_value=0, max_value=6),  # value bucket → ties
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_mw_values)
def test_mann_whitney_matches_python_model(spark, rows):
    """stat_mann_whitney == brute-force pairwise U (ties at 0.5) and
    the tie-corrected z replayed with the query's expression order."""
    import datetime as dt
    import math

    from aws_etl_spark.queries.stats_queries import _mw_sql
    from aws_etl_spark.queries.sql_seams import spark_declared

    data = [
        (i, dt.datetime(2024, 1, d, 3, 0, 0), i, "view", float(v * 50))
        for i, (d, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).createOrReplaceTempView("events")
    got = spark.sql(_mw_sql(spark_declared)).collect()[0]

    x = [float(v * 50) for d, v in rows if d < 16]
    y = [float(v * 50) for d, v in rows if d >= 16]
    u2 = sum(
        2 * sum(1 for yv in y if xv > yv) + sum(1 for yv in y if xv == yv)
        for xv in x
    )
    from collections import Counter

    t = Counter(x + y)
    tie = sum(c**3 - c for c in t.values())
    n1, n2 = len(x), len(y)
    assert (got["n1"], got["n2"], got["u2"], got["tie_cubes"]) == (
        n1, n2, u2, tie,
    )
    N = n1 + n2
    if n1 == 0 or n2 == 0 or tie == N**3 - N:
        assert got["z_score"] == 0.0
        return
    z = (
        float(u2) / 2.0 - float(n1) * float(n2) / 2.0
    ) / math.sqrt(
        (float(n1) * float(n2) / (float(N) * float(N - 1)))
        * ((float(N) * float(N) * float(N) - float(N) - float(tie)) / 12.0)
    )
    assert got["z_score"] == z


_chains = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=3),  # event type id
    ),
    min_size=0,
    max_size=25,
)


@_settings
@given(seq=_chains)
def test_markov_stationary_matches_python_replay(spark, seq):
    """events_markov_stationary == a dict replay of the quantized
    power iteration (per-term floor division, 12 steps)."""
    import datetime as dt

    from aws_etl_spark.queries.registry import REGISTRY
    from aws_etl_spark.queries.timeseries_queries import _STATIONARY_STEPS

    types = ["view", "click", "purchase", "signup"]
    data = [
        (i, dt.datetime(2024, 1, 1 + i // 20, i % 20, 0, 0), u, types[t], 1.0)
        for i, (u, t) in enumerate(seq)
    ]
    # write a scratch sf dir (the registry fn loads parquet)
    import os
    import tempfile

    import pandas as pd

    d = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "event_id": [r[0] for r in data],
            "ts": [r[1] for r in data],
            "user_id": [r[2] for r in data],
            "event_type": [r[3] for r in data],
            "value": [r[4] for r in data],
            "props": ["{}"] * len(data),
        }
    ).to_parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_type"]: r["pi_micro"]
        for r in REGISTRY["events_markov_stationary"].fn(spark, d).collect()
    }

    # python replay
    by_user = {}
    for i, (u, t) in enumerate(seq):
        by_user.setdefault(u, []).append((data[i][1], i, types[t]))
    counts = {}
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    if not counts:
        assert got == {}
        return
    states = sorted({s for s, _ in counts})
    tot = {s: sum(n for (a, b), n in counts.items() if a == s) for s in states}
    pi = {s: 1_000_000 // len(states) for s in states}
    for _ in range(_STATIONARY_STEPS):
        new = {}
        for (a, b), n in counts.items():
            if a in pi:
                new[b] = new.get(b, 0) + (pi[a] * n) // tot[a]
        pi = new
    assert got == pi


_kw_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group id
        st.integers(min_value=1, max_value=28),  # day of January
        st.integers(min_value=0, max_value=6),  # value bucket → ties
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_kw_rows)
def test_kruskal_wallis_oracle_matches_python_model(rows, tmp_path_factory):
    """The stat_kruskal_wallis ORACLE == brute-force midranks + the
    query's quantized-contribution chain on randomized group/tie
    shapes (pure DuckDB — the Spark↔oracle equality is hash-checked
    separately, so this closes the model↔spark↔oracle triangle
    cheaply). Covers single-group, all-tied, and singleton inputs the
    corpus never produces."""
    import datetime as dt
    import math
    from collections import Counter

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("kw")
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [dt.datetime(2024, 1, d, 3, 0, 0) for _, d, _ in rows],
            "user_id": [g for g, _, _ in rows],
            "event_type": [f"g{g}" for g, _, _ in rows],
            "value": [float(v * 50) for _, _, v in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(str(tmp / "events.parquet"))
    # run_oracle registers every table view; symlink the rest
    import os

    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    got = run_oracle(REGISTRY["stat_kruskal_wallis"].oracle, str(tmp))
    got = {
        r["event_type"]: r for _, r in got.iterrows()
    }

    pooled = Counter(float(v * 50) for _, _, v in rows)
    f_below, mr2, acc = {}, {}, 0
    for v in sorted(pooled):
        f_below[v] = acc
        mr2[v] = 2 * acc + pooled[v] + 1
        acc += pooled[v]
    N = acc
    tie = sum(c**3 - c for c in pooled.values())
    groups = {}
    for g, _, v in rows:
        groups.setdefault(f"g{g}", Counter())[float(v * 50)] += 1
    sq = 0
    for grp, cnt in groups.items():
        n_i = sum(cnt.values())
        r2_i = sum(c * mr2[v] for v, c in cnt.items())
        row = got[grp]
        assert (int(row["n_i"]), int(row["r2_i"])) == (n_i, r2_i), grp
        assert row["mean_rank"] == float(r2_i) / (2.0 * float(n_i)), grp
        sq += math.floor(
            (float(r2_i) / 2.0) * (float(r2_i) / 2.0) / float(n_i)
        )
    if N <= 1 or tie == N**3 - N:
        h = 0.0
    else:
        h = (
            12.0 * float(sq) / (float(N) * float(N + 1)) - 3.0 * float(N + 1)
        ) / (1.0 - float(tie) / (float(N) ** 3 - float(N)))
    for row in got.values():
        assert row["h_stat"] == h


_auc_rows = st.lists(
    st.tuples(
        st.booleans(),  # positive (purchase)?
        st.integers(min_value=0, max_value=5),  # value bucket → ties
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_auc_rows)
def test_auc_roc_oracle_matches_brute_force(rows, tmp_path_factory):
    """The ml_auc_roc ORACLE == brute-force pair counting (ties worth
    half) on randomized class/tie shapes, including one-class inputs
    the corpus never produces (pure DuckDB — the Spark↔oracle
    equality is hash-checked separately)."""
    import datetime as dt
    import os

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("auc")
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [dt.datetime(2024, 1, 5, 3, 0, 0)] * len(rows),
            "user_id": [1] * len(rows),
            "event_type": ["purchase" if p else "view" for p, _ in rows],
            "value": [float(v * 25) for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(str(tmp / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    got = run_oracle(REGISTRY["ml_auc_roc"].oracle, str(tmp)).iloc[0]

    pos = sorted(float(v * 25) for p, v in rows if p)
    neg = sorted(float(v * 25) for p, v in rows if not p)
    u2 = sum(
        2 * sum(1 for n in neg if n < p) + sum(1 for n in neg if n == p)
        for p in pos
    )
    assert (int(got["n_pos"]), int(got["n_neg"]), int(got["u2"])) == (
        len(pos), len(neg), u2,
    )
    if not pos or not neg:
        assert got["auc"] == 0.5 and got["gini"] == 0.0
    else:
        auc = float(u2) / (2.0 * float(len(pos)) * float(len(neg)))
        assert got["auc"] == auc
        assert got["gini"] == 2.0 * auc - 1.0


_sp_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # x bucket → heavy ties
        st.integers(min_value=0, max_value=6),  # y bucket
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_sp_rows)
def test_spearman_oracle_matches_midrank_model(rows, tmp_path_factory):
    """The stat_spearman_corr ORACLE == Pearson on python midranks,
    replaying the query's exact IEEE chain (integer moments → two
    SQRTs → one division) on randomized tie shapes incl. constant
    columns and single rows."""
    import math
    import os

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("sp")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet").head(
        len(rows)
    ).copy()
    # hypothesis may ask for more rows than the base has — tile it
    while len(li) < len(rows):
        li = pd.concat([li, li]).head(len(rows)).copy()
    li["l_quantity"] = [float(x * 10 + 1) for x, _ in rows]
    li["l_extendedprice"] = [float(y * 500 + 1000) for _, y in rows]
    li.to_parquet(str(tmp / "lineitem.parquet"))
    for t in (
        "region nation customer supplier part orders events "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    got = run_oracle(REGISTRY["stat_spearman_corr"].oracle, str(tmp)).iloc[0]

    def mr2_map(vals):
        from collections import Counter

        cnt = Counter(vals)
        acc, out = 0, {}
        for v in sorted(cnt):
            out[v] = 2 * acc + cnt[v] + 1
            acc += cnt[v]
        return out

    xs = [float(x * 10 + 1) for x, _ in rows]
    ys = [float(y * 500 + 1000) for _, y in rows]
    mx, my = mr2_map(xs), mr2_map(ys)
    n = len(rows)
    sx = sum(mx[v] for v in xs)
    sy = sum(my[v] for v in ys)
    sxy = sum(mx[a] * my[b] for a, b in zip(xs, ys))
    sxx = sum(mx[v] ** 2 for v in xs)
    syy = sum(my[v] ** 2 for v in ys)
    assert (int(got["n"]), int(got["sum_2rx"]), int(got["sum_2ry"])) == (
        n, sx, sy,
    )
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx == 0 or dy == 0:
        assert got["spearman_rho"] == 0.0
    else:
        rho = float(n * sxy - sx * sy) / (
            math.sqrt(float(dx)) * math.sqrt(float(dy))
        )
        assert got["spearman_rho"] == rho


_gini_rows = st.lists(
    st.integers(min_value=0, max_value=9),  # spend bucket → ties + zeros
    min_size=1,
    max_size=30,
)


@_settings
@given(spends=_gini_rows)
def test_gini_oracle_matches_pairwise_brute_force(spends, tmp_path_factory):
    """The stat_gini_spend ORACLE == the O(n²) definition
    G = ΣᵢΣⱼ|xᵢ−xⱼ|/(2n²μ) on randomized tie/zero shapes — proving the
    sorted-prefix tied-block identity, not just the implementation."""
    import os

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("gini")
    od = pd.read_parquet("/root/testdata/sf0.001/orders.parquet").head(
        len(spends)
    ).copy()
    while len(od) < len(spends):
        od = pd.concat([od, od]).head(len(spends)).copy()
    od["o_custkey"] = range(len(spends))
    od["o_totalprice"] = [float(s * 137) for s in spends]
    od.to_parquet(str(tmp / "orders.parquet"))
    for t in (
        "region nation customer supplier part lineitem events "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    got = run_oracle(REGISTRY["stat_gini_spend"].oracle, str(tmp)).iloc[0]

    x = [s * 13700 for s in spends]  # exact cents
    n = len(x)
    total = sum(x)
    assert int(got["n_customers"]) == n
    if total == 0:
        assert got["gini"] == 0.0
    else:
        num = sum(abs(a - b) for a in x for b in x)  # = 2 * prefix identity
        assert got["gini"] == float(num // 2) / (float(n) * float(total))


_acf_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),  # day of January
        st.integers(min_value=1, max_value=5),  # events that day
    ),
    min_size=1,
    max_size=20,
)


@_settings
@given(rows=_acf_rows)
def test_acf_daily_oracle_matches_python_model(rows, tmp_path_factory):
    """The events_acf_daily ORACLE == the multiply-through estimator
    replayed in python on randomized sparse calendars (gaps, single
    days, constant series)."""
    import datetime as dt
    import os
    from collections import Counter

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("acf")
    ev_rows = []
    eid = 0
    for day, n in rows:
        for i in range(n):
            eid += 1
            ev_rows.append((eid, dt.datetime(2024, 1, day, 8, 0, 0), i))
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in ev_rows],
            "ts": [r[1] for r in ev_rows],
            "user_id": [r[2] for r in ev_rows],
            "event_type": ["view"] * len(ev_rows),
            "value": [1.0] * len(ev_rows),
            "props": ["{}"] * len(ev_rows),
        }
    )
    ev.to_parquet(str(tmp / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    got = {
        int(r["lag"]): r
        for _, r in run_oracle(
            REGISTRY["events_acf_daily"].oracle, str(tmp)
        ).iterrows()
    }

    cnt = Counter(d for d, n in rows for _ in range(n))
    by_day = Counter()
    for d, n in rows:
        by_day[d] += n
    days, total = len(by_day), sum(by_day.values())
    e = {d: x * days - total for d, x in by_day.items()}
    den = sum(v * v for v in e.values())
    for lag in range(1, 8):
        pairs = [(d, d + lag) for d in e if d + lag in e]
        if not pairs:
            # a lag with no calendar pair yields NO row (inner join on
            # dn + lag) — identically on both engines
            assert lag not in got
            continue
        num = sum(e[a] * e[b] for a, b in pairs)
        row = got[lag]
        assert (int(row["n_pairs"]), int(row["num_q"]), int(row["den_q"])) == (
            len(pairs), num, den,
        )
        assert row["acf"] == (0.0 if den == 0 else float(num) / float(den))


_burst_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=100),  # minute offset → ties
    ),
    min_size=1,
    max_size=25,
)


@_settings
@given(rows=_burst_rows)
def test_burstiness_oracle_matches_python_model(rows, tmp_path_factory):
    """The events_burstiness ORACLE == (σ−μ)/(σ+μ) over per-user gap
    replays on randomized schedules (duplicate timestamps, single
    events, n=1 gap shapes)."""
    import datetime as dt
    import math
    import os

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("burst")
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                dt.datetime(2024, 1, 5, 0, 0, 0) + dt.timedelta(minutes=m)
                for _, m in rows
            ],
            "user_id": [u for u, _ in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(str(tmp / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    out = run_oracle(REGISTRY["events_burstiness"].oracle, str(tmp))

    # python replay: gaps per user in (ts, event_id) order
    gaps = []
    byu: dict = {}
    for eid, (u, m) in enumerate(rows):
        byu.setdefault(u, []).append((m * 60, eid))
    for u, lst in byu.items():
        lst.sort()
        gaps.extend(b[0] - a[0] for a, b in zip(lst, lst[1:]))
    if not gaps:
        assert len(out) == 0
        return
    row = out.iloc[0]
    n = len(gaps)
    sg, ssq = sum(gaps), sum(g * g for g in gaps)
    assert int(row["n"]) == n and int(row["sum_gap_sec"]) == sg
    if n <= 1 or (n * ssq - sg * sg == 0 and sg == 0):
        assert row["burstiness"] == 0.0
    else:
        root = math.sqrt(float(n * ssq - sg * sg))
        assert row["burstiness"] == (root - float(sg)) / (root + float(sg))


_anova_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group
        st.integers(min_value=0, max_value=6),  # value bucket
    ),
    min_size=1,
    max_size=30,
)


@_settings
@given(rows=_anova_rows)
def test_anova_f_oracle_matches_python_model(rows, tmp_path_factory):
    """The stat_anova_f ORACLE == the quantized SSB/SSW chain replayed
    in python on randomized group/tie shapes (single groups, constant
    values, singleton groups)."""
    import datetime as dt
    import math
    import os

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    tmp = tmp_path_factory.mktemp("anova")
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [dt.datetime(2024, 1, 5, 3, 0, 0)] * len(rows),
            "user_id": [1] * len(rows),
            "event_type": [f"g{g}" for g, _ in rows],
            "value": [float(v * 7) + 0.25 for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(str(tmp / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
        )
    out = run_oracle(REGISTRY["stat_anova_f"].oracle, str(tmp))

    groups: dict = {}
    for g, v in rows:
        y = math.floor((v * 7 + 0.25) * 100)
        groups.setdefault(f"g{g}", []).append(y)
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    ssq_milli = sum(y * y for g in groups.values() for y in g) * 1000
    bq_milli = sum(
        math.floor(float(sum(g)) * float(sum(g)) / float(len(g)) * 1000)
        for g in groups.values()
    )
    ssb = bq_milli - math.floor(float(s) * float(s) / float(n) * 1000)
    ssw = ssq_milli - bq_milli
    if k <= 1 or n <= k or ssw <= 0:
        f_ref = 0.0
    else:
        f_ref = (float(ssb) / float(k - 1)) / (float(ssw) / float(n - k))
    for _, row in out.iterrows():
        assert row["f_stat"] == f_ref


# ---------------------------------------------------------------------------
# Round-11 additions: oracle-vs-brute-force property models (pure
# DuckDB — the Spark<->oracle equality is hash-checked separately, so
# these close the model<->spark<->oracle triangle cheaply).
# ---------------------------------------------------------------------------


def _scratch_sf(tmp_path_factory, name, **frames):
    import os

    tmp = tmp_path_factory.mktemp(name)
    for t, df in frames.items():
        df.to_parquet(str(tmp / f"{t}.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in frames:
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", str(tmp / f"{t}.parquet")
            )
    return str(tmp)


def _ev_frame(rows):
    """rows: (day, type_id, value_bucket) tuples -> events frame."""
    import datetime as dt

    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [dt.datetime(2024, 1, d, 3, 0, 0) for d, _, _ in rows],
            "user_id": [i for i in range(len(rows))],
            "event_type": [
                "purchase" if g == 0 else f"g{g}" for _, g, _ in rows
            ],
            "value": [float(v * 25) for _, _, v in rows],
            "props": ["{}"] * len(rows),
        }
    )


_prauc_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=0, max_value=2),  # type 0 = positive
        st.integers(min_value=0, max_value=5),  # score bucket → ties
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_prauc_rows)
def test_pr_auc_oracle_matches_step_ap(rows, tmp_path_factory):
    """The ml_pr_auc ORACLE == the textbook step average precision
    (thresholds descending, ties grouped), within the stated
    nano-quantization error n_thresholds/1e9/P. Covers all-positive,
    all-negative, and heavy-tie inputs."""
    from collections import Counter

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "prauc", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["ml_pr_auc"].oracle, sf).iloc[0]

    by_score = Counter()
    pos_by_score = Counter()
    for _, g, v in rows:
        s = float(v * 25)
        by_score[s] += 1
        pos_by_score[s] += g == 0
    p = sum(pos_by_score.values())
    n = sum(by_score.values())
    assert int(got["n_pos"]) == p and int(got["n_neg"]) == n - p
    assert int(got["n_thresholds"]) == len(by_score)
    assert int(got["quant_budget_exceeded"]) == int(
        p > 0 and len(by_score) > 1000 * p
    )
    if p == 0:
        assert got["avg_precision"] == 0.0
        return
    tp = pp = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        tp += pos_by_score[s]
        pp += by_score[s]
        ap += (pos_by_score[s] / p) * (tp / pp)
    assert abs(got["avg_precision"] - ap) <= len(by_score) / 1e9 / p + 1e-15


_cramers_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_cramers_rows)
def test_cramers_v_oracle_matches_contingency(rows, tmp_path_factory):
    """The stat_cramers_v ORACLE == the direct chi-square contingency
    computation (structural zeros included), within the micro-
    quantization error cells/1e6. Covers r=1, c=1, and sparse
    tables."""
    import datetime as dt
    import math
    from collections import Counter

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "cram", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["stat_cramers_v"].oracle, sf).iloc[0]

    cells = Counter()
    for d, g, _ in rows:
        dow = dt.date(2024, 1, d).isoweekday()
        t = "purchase" if g == 0 else f"g{g}"
        cells[(t, dow)] += 1
    n = sum(cells.values())
    types = sorted({t for t, _ in cells})
    dows = sorted({d for _, d in cells})
    rm = {t: sum(v for (tt, _), v in cells.items() if tt == t) for t in types}
    cm = {d: sum(v for (_, dd), v in cells.items() if dd == d) for d in dows}
    chi = sum(
        (cells.get((t, d), 0) - rm[t] * cm[d] / n) ** 2 / (rm[t] * cm[d] / n)
        for t in types
        for d in dows
    )
    n_cells = len(types) * len(dows)
    assert int(got["n_events"]) == n
    assert (int(got["n_types"]), int(got["n_dows"])) == (len(types), len(dows))
    assert abs(got["chi2_stat"] - chi) <= n_cells / 1e6 + 1e-12
    if len(types) <= 1 or len(dows) <= 1:
        assert got["cramers_v"] == 0.0
    else:
        v = math.sqrt(chi / (n * min(len(types) - 1, len(dows) - 1)))
        assert abs(got["cramers_v"] - v) <= 1e-3


_grubbs_rows = st.lists(
    st.integers(min_value=-10000, max_value=10000),
    min_size=1,
    max_size=40,
)


@_settings
@given(cents=_grubbs_rows)
def test_grubbs_oracle_matches_definition(cents, tmp_path_factory):
    """The stat_grubbs_outlier ORACLE == G = max|x-mean|/std(ddof=1)
    on randomized integer-cent columns, and the reported outlier is
    the correct extreme. Covers constant, n<3, and negative-side
    extremes."""
    import math
    import statistics

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(cents)),
            "o_custkey": [i % 5 for i in range(len(cents))],
            "o_orderstatus": ["F"] * len(cents),
            "o_totalprice": [c / 100.0 for c in cents],
            "o_orderdate": pd.to_datetime(["1997-01-15"] * len(cents)),
            "o_orderpriority": ["3-MEDIUM"] * len(cents),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "grubbs", orders=orders)
    got = run_oracle(REGISTRY["stat_grubbs_outlier"].oracle, sf).iloc[0]

    # replicate the cents quantization (c/100.0*100 can floor to c-1)
    ys = [math.floor((c / 100.0) * 100) for c in cents]
    n = len(ys)
    assert int(got["n_orders"]) == n
    if n < 3 or min(ys) == max(ys):
        assert got["g_stat"] == 0.0
        assert got["outlier_cents"] is None or (
            isinstance(got["outlier_cents"], float)
            and math.isnan(got["outlier_cents"])
        )
        return
    mean = statistics.fmean(ys)
    sd = statistics.stdev(ys)
    g = max(abs(x - mean) for x in ys) / sd
    assert abs(got["g_stat"] - g) <= 1e-9 * max(1.0, g)
    dev_hi, dev_lo = n * max(ys) - sum(ys), sum(ys) - n * min(ys)
    assert int(got["outlier_cents"]) == (max(ys) if dev_hi >= dev_lo else min(ys))


_lb_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=1, max_value=4),  # events that day
    ),
    min_size=1,
    max_size=15,
)


@_settings
@given(days=_lb_rows)
def test_ljung_box_oracle_matches_definition(days, tmp_path_factory):
    """The stat_ljung_box ORACLE == Q = n(n+2) sum rho_k^2/(n-k) with
    the standard acf estimator (the multiply-through deviations
    cancel exactly in the ratio), within the pico-quantization error.
    Covers constant series, single-day, and gapped calendars."""
    import datetime as dt

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    counts = {}
    for d, k in days:
        counts[d] = counts.get(d, 0) + k
    rows = []
    rid = 0
    for d, k in sorted(counts.items()):
        for _ in range(k):
            rows.append((rid, dt.datetime(2024, 1, d, 3, 0, 0)))
            rid += 1
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "lb", events=ev)
    got = run_oracle(REGISTRY["stat_ljung_box"].oracle, sf).iloc[0]

    dn = sorted(counts)
    n_days = len(dn)
    total = sum(counts.values())
    e = {d: counts[d] * n_days - total for d in dn}
    den = sum(v * v for v in e.values())
    q = 0.0
    for lag in range(1, 8):
        num = sum(e[d] * e[d + lag] for d in dn if d + lag in e)
        pairs = sum(1 for d in dn if d + lag in e)
        if den == 0 or pairs == 0 or n_days <= lag:
            continue
        rho = num / den
        q += rho * rho / (n_days - lag)
    q *= n_days * (n_days + 2)
    assert int(got["n_days"]) == n_days
    tol = 7 / 1e12 * n_days * (n_days + 2) + 1e-12
    assert abs(got["q_stat"] - q) <= tol


# ---------------------------------------------------------------------------
# Round-11 late batch: runs test, Pettitt, Kendall tau-b, Jarque-Bera
# ---------------------------------------------------------------------------

_rt_days = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=16,
)


@_settings
@given(days=_rt_days)
def test_runs_test_oracle_matches_definition(days, tmp_path_factory):
    """The stat_runs_test ORACLE == the textbook runs count (iterate
    the above/below sequence) with the standard z. Covers constant
    series (all excluded), one-sided series, and tied medians."""
    import datetime as dt
    import math

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    counts = {}
    for d, k in days:
        counts[d] = counts.get(d, 0) + k
    rows = []
    rid = 0
    for d, k in sorted(counts.items()):
        for _ in range(k):
            rows.append((rid, dt.datetime(2024, 1, d, 3, 0, 0)))
            rid += 1
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "runs", events=ev)
    got = run_oracle(REGISTRY["stat_runs_test"].oracle, sf).iloc[0]

    xs = sorted(counts.values())
    nd = len(xs)
    med2 = xs[(nd + 1) // 2 - 1] + xs[(nd + 2) // 2 - 1]
    seq = [
        1 if 2 * counts[d] > med2 else 0
        for d in sorted(counts)
        if 2 * counts[d] != med2
    ]
    n_used, n1 = len(seq), sum(seq)
    n2 = n_used - n1
    runs = sum(1 for i in range(len(seq)) if i == 0 or seq[i - 1] != seq[i])
    assert int(got["n_days"]) == nd
    assert int(got["n_used"]) == n_used
    assert (int(got["n_above"]), int(got["n_below"])) == (n1, n2)
    assert int(got["n_runs"]) == runs
    if 2 * n1 * n2 * (2 * n1 * n2 - n_used) <= 0:
        assert got["z_stat"] == 0.0
    else:
        mu = 2.0 * n1 * n2 / n_used + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n_used)
            / (float(n_used) ** 2 * (n_used - 1))
        )
        assert abs(got["z_stat"] - (runs - mu) / math.sqrt(var)) < 1e-9


@_settings
@given(days=_rt_days)
def test_pettitt_oracle_matches_brute_force(days, tmp_path_factory):
    """The stat_pettitt_change ORACLE's K == the DEFINITIONAL
    U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j) brute force — an
    independent formulation of the midrank prefix identity the query
    uses. Exact integer equality, argmax day included."""
    import datetime as dt

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    counts = {}
    for d, k in days:
        counts[d] = counts.get(d, 0) + k
    if len(counts) < 2:
        return  # the query emits no row below 2 days
    rows = []
    rid = 0
    for d, k in sorted(counts.items()):
        for _ in range(k):
            rows.append((rid, dt.datetime(2024, 1, d, 3, 0, 0)))
            rid += 1
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "pett", events=ev)
    got = run_oracle(REGISTRY["stat_pettitt_change"].oracle, sf).iloc[0]

    dns = sorted(counts)
    xs = [counts[d] for d in dns]
    nd = len(xs)
    best_k, best_dn = -1, None
    for t in range(1, nd):
        u = sum(
            (xs[i] > xs[j]) - (xs[i] < xs[j])
            for i in range(t)
            for j in range(t, nd)
        )
        if abs(u) > best_k:
            best_k, best_dn = abs(u), dns[t - 1]
    epoch_dn = int(
        pd.Timestamp(f"2024-01-{best_dn:02d}").timestamp() // 86400
    )
    assert int(got["n_days"]) == nd
    assert int(got["k_stat"]) == best_k
    assert int(got["change_dn"]) == epoch_dn


_kt_days = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),  # day
        st.integers(min_value=1, max_value=4),  # orders that day
        st.integers(min_value=1, max_value=5),  # price bucket
    ),
    min_size=1,
    max_size=12,
)


@_settings
@given(days=_kt_days)
def test_kendall_oracle_matches_brute_force(days, tmp_path_factory):
    """The stat_kendall_tau_daily ORACLE == brute-force tau-b over
    the daily (count, revenue) aggregates, including tie corrections
    and the all-tied degenerate."""
    import math

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    agg = {}
    for d, k, p in days:
        c, v = agg.get(d, (0, 0))
        agg[d] = (c + k, v + k * p * 2500)  # k orders at p*25.00 dollars
    prices, dates = [], []
    for d, (c, v) in sorted(agg.items()):
        per = v // c
        for i in range(c):
            # split v into c integer-cent parts summing exactly to v
            cents = per + (1 if i < v - per * c else 0)
            prices.append(cents / 100.0)
            dates.append(f"1997-03-{d:02d}")
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, len(prices) + 1), dtype="int64"),
            "o_custkey": pd.array([1] * len(prices), dtype="int64"),
            "o_orderstatus": ["F"] * len(prices),
            "o_totalprice": pd.array(prices, dtype="float64"),
            "o_orderdate": pd.to_datetime(dates).astype("datetime64[us]"),
            "o_orderpriority": ["3-MEDIUM"] * len(prices),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "kend", orders=orders)
    got = run_oracle(REGISTRY["stat_kendall_tau_daily"].oracle, sf).iloc[0]

    # replay the DECLARED cent quantization — both engines read cents
    # as FLOOR(CAST(price AS DOUBLE) * 100), and FLOOR((c/100.0)*100)
    # loses a cent for some c (6786/100.0*100 = 6785.999...), so the
    # replay must quantize the same stored doubles, not assume the
    # construction-time integers round-trip (hypothesis-found seam)
    day_cents: dict = {}
    for p, ds in zip(prices, dates):
        d = int(ds[-2:])
        c, v = day_cents.get(d, (0, 0))
        day_cents[d] = (c + 1, v + math.floor(p * 100))
    pts = [day_cents[d] for d in sorted(day_cents)]
    nd = len(pts)
    conc = disc = 0
    for i in range(nd):
        for j in range(i + 1, nd):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    from collections import Counter

    tx = sum(t * (t - 1) // 2 for t in Counter(c for c, _ in pts).values())
    ty = sum(t * (t - 1) // 2 for t in Counter(v for _, v in pts).values())
    n0 = nd * (nd - 1) // 2
    assert (int(got["concordant"]), int(got["discordant"])) == (conc, disc)
    assert (int(got["ties_x"]), int(got["ties_y"])) == (tx, ty)
    if n0 - tx <= 0 or n0 - ty <= 0:
        assert got["tau_b"] == 0.0
    else:
        tau = (conc - disc) / math.sqrt(float(n0 - tx) * float(n0 - ty))
        assert abs(got["tau_b"] - tau) < 1e-12


_jb_prices = st.lists(
    st.integers(min_value=-500, max_value=5000), min_size=1, max_size=25
)


@_settings
@given(dollars=_jb_prices)
def test_jarque_bera_oracle_matches_numpy(dollars, tmp_path_factory):
    """The stat_jarque_bera ORACLE == numpy's definitional skewness /
    excess kurtosis / JB on the whole-dollar values (independent
    float path -> small relative tolerance). Covers negatives,
    constants, and n=1."""
    import numpy as np
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    prices = [float(d) + 0.25 for d in dollars]
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, len(prices) + 1), dtype="int64"),
            "o_custkey": pd.array([1] * len(prices), dtype="int64"),
            "o_orderstatus": ["F"] * len(prices),
            "o_totalprice": pd.array(prices, dtype="float64"),
            "o_orderdate": pd.to_datetime(
                ["1997-01-15"] * len(prices)
            ).astype("datetime64[us]"),
            "o_orderpriority": ["3-MEDIUM"] * len(prices),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "jb", orders=orders)
    got = run_oracle(REGISTRY["stat_jarque_bera"].oracle, sf).iloc[0]

    y = np.floor(np.array(prices, dtype=np.float64))
    n = len(y)
    spread = max(prices) - min(prices)
    assert int(got["unit_contract_violated"]) == int(n >= 2 and 0 < spread < 1)
    if n < 2 or y.min() == y.max():
        assert got["skewness"] == 0.0
        assert got["ex_kurtosis"] == 0.0
        assert got["jb_stat"] == 0.0
        return
    c = y - y.mean()
    m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3.0
    jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
    assert abs(got["skewness"] - skew) < 1e-8 * max(1.0, abs(skew))
    assert abs(got["ex_kurtosis"] - exk) < 1e-8 * max(1.0, abs(exk))
    assert abs(got["jb_stat"] - jb) < 1e-7 * max(1.0, abs(jb))


# ---------------------------------------------------------------------------
# Round-11 late batch, second wave: Theil's U, Brown-Forsythe,
# forecast eval, silhouette, contamination, RAKE
# ---------------------------------------------------------------------------

_tu_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=14),  # day (2 ISO weeks)
        st.integers(min_value=0, max_value=3),  # type
        st.integers(min_value=0, max_value=3),  # unused value bucket
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_tu_rows)
def test_theil_u_oracle_matches_definition(rows, tmp_path_factory):
    """The stat_theil_u ORACLE == the definitional float entropies
    H(Y) = -sum p ln p and H(Y|X), within the per-term
    micro-quantization bound. Covers single-type and single-day."""
    import math

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "theil", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["stat_theil_u"].oracle, sf).iloc[0]

    ev = _ev_frame(rows)
    dow = pd.to_datetime(ev["ts"]).dt.isocalendar().day.astype(int)
    ct = pd.crosstab(ev["event_type"], dow)
    n = int(ct.values.sum())
    py = [int(v) / n for v in ct.sum(axis=1)]
    h_y = -sum(p * math.log(p) for p in py if p > 0)
    h_yx = 0.0
    for dj in ct.columns:
        cmv = int(ct[dj].sum())
        for gi in ct.index:
            c = int(ct.loc[gi, dj])
            if c > 0:
                h_yx += (c / n) * math.log(cmv / c)
    cells = int((ct.values > 0).sum())
    tol = (cells + len(py)) * 1e-6 / max(n, 1) + 1e-9
    assert int(got["n_events"]) == n
    assert abs(got["h_y"] - h_y) <= tol
    assert abs(got["h_y_given_x"] - h_yx) <= tol
    if len(py) <= 1:
        assert got["theil_u"] == 0.0
    else:
        assert abs(got["theil_u"] - (h_y - h_yx) / h_y) <= 3 * tol / max(h_y, 1e-9)


_lv_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # day (irrelevant)
        st.integers(min_value=0, max_value=2),  # group
        st.integers(min_value=0, max_value=6),  # value bucket (ties)
    ),
    min_size=2,
    max_size=40,
)


@_settings
@given(rows=_lv_rows)
def test_levene_oracle_matches_definition(rows, tmp_path_factory):
    """The stat_levene_bf ORACLE == the definitional Brown-Forsythe W
    (one-way F on |y - group median|, float path) within the
    milli-quantization bound. Doubling cancels: |2y - med2| = 2|y -
    median|, and the factor 4 cancels between SSB and SSW."""
    import statistics

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "lev", events=_ev_frame(rows))
    out = run_oracle(REGISTRY["stat_levene_bf"].oracle, sf)

    ev = _ev_frame(rows)
    groups = {}
    for g, sub in ev.groupby("event_type"):
        groups[g] = [int(v * 100) for v in sub["value"]]
    # definitional: z = |y - median(group)| (cents), classic one-way F
    z = {
        g: [abs(y - statistics.median(ys)) for y in ys]
        for g, ys in groups.items()
    }
    k = len(z)
    n = sum(len(v) for v in z.values())
    grand = sum(sum(v) for v in z.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in z.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in z.values()
    )
    got_w = {r["event_type"]: r["w_stat"] for _, r in out.iterrows()}
    if k <= 1 or n <= k or ssw <= 1e-12:
        assert all(w == 0.0 for w in got_w.values())
        return
    w = (ssb / (k - 1)) / (ssw / (n - k))
    # the query computes on DOUBLED cents with milli-quantization:
    # absolute SS error <= k+1 milli-units on values scaled by 4
    tol = max(1e-9, 2e-3 * (1 + w) / max(ssw, 1e-6) * n) + 1e-6 * (1 + w)
    for g, wg in got_w.items():
        assert abs(wg - w) <= tol, (g, wg, w)


_fe_days = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=21),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=15,
)


@_settings
@given(days=_fe_days)
def test_forecast_eval_oracle_matches_definition(days, tmp_path_factory):
    """The events_forecast_eval ORACLE == the direct python backtest
    (MAE/WAPE exact, sMAPE within the nano-quantization bound),
    including missing-lag coverage and the no-pairs degenerate."""
    import datetime as dt
    import math

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    counts = {}
    for d, kk in days:
        counts[d] = counts.get(d, 0) + kk
    rows = []
    rid = 0
    for d, kk in sorted(counts.items()):
        for _ in range(kk):
            rows.append((rid, dt.datetime(2024, 1, d, 3, 0, 0)))
            rid += 1
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "fce", events=ev)
    out = run_oracle(REGISTRY["events_forecast_eval"].oracle, sf)
    got = {r["model"]: r for _, r in out.iterrows()}

    for model, lag in (("naive_1", 1), ("snaive_7", 7)):
        pairs = [(counts[d], counts[d - lag]) for d in counts if d - lag in counts]
        if not pairs:
            assert model not in got
            continue
        n = len(pairs)
        sae = sum(abs(x - f) for x, f in pairs)
        sy = sum(x for x, _ in pairs)
        smape = sum(2 * abs(x - f) / (x + f) for x, f in pairs) / n
        r = got[model]
        assert int(r["n_days"]) == n
        assert r["mae"] == sae / n
        assert r["wape"] == sae / sy
        assert abs(r["smape"] - smape) <= (n + 1) * 1e-9 / n + 1e-12


_sil_vecs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.integers(min_value=-8, max_value=8),  # x component (/4)
        st.integers(min_value=-8, max_value=8),  # y component (/4)
    ),
    min_size=1,
    max_size=20,
)


@_settings
@given(vecs=_sil_vecs)
def test_silhouette_oracle_matches_definition(vecs, tmp_path_factory):
    """The embeddings_silhouette ORACLE == the definitional simplified
    silhouette on the quantized components (float centroid means,
    euclidean distances), within the nano-quantization bound."""
    import math

    import numpy as np
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    emb = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": [
                np.asarray([x / 4.0, y / 4.0], dtype=np.float32)
                for _, x, y in vecs
            ],
            "label": pd.array([lab for lab, _, _ in vecs], dtype="int32"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "sil", embeddings=emb)
    out = run_oracle(REGISTRY["embeddings_silhouette"].oracle, sf)
    got = {int(r["label"]): r for _, r in out.iterrows()}

    q = [
        [math.floor(x / 4.0 * 1e6), math.floor(y / 4.0 * 1e6)]
        for _, x, y in vecs
    ]
    labs = [lab for lab, _, _ in vecs]
    cent = {}
    for lab in set(labs):
        idx = [i for i, l2 in enumerate(labs) if l2 == lab]
        cent[lab] = (
            [sum(q[i][d] for i in idx) / len(idx) for d in range(2)],
            len(idx),
        )
    sums: dict[int, list[float]] = {}
    for i, lab in enumerate(labs):
        dists = {
            cl: math.sqrt(sum((q[i][d] - c[d]) ** 2 for d in range(2)))
            for cl, (c, _) in cent.items()
        }
        a = dists[lab]
        others = [v for cl, v in dists.items() if cl != lab]
        s = 0.0 if not others or max(a, min(others)) <= 1e-12 else (
            (min(others) - a) / max(a, min(others))
        )
        sums.setdefault(lab, []).append(s)
    for lab, ss in sums.items():
        r = got[lab]
        assert int(r["n_vecs"]) == len(ss)
        assert abs(r["mean_silhouette"] - sum(ss) / len(ss)) <= 1e-6


_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "the", "and", "of", "to"]
)
_doc_words = st.lists(_word, min_size=0, max_size=12)
_corpus = st.lists(_doc_words, min_size=1, max_size=8)


@_settings
@given(docs=_corpus)
def test_rake_oracle_matches_python_model(docs, tmp_path_factory):
    """The text_rake_keywords ORACLE == the integer RAKE model
    (stopword segmentation, 4-word cap, degree*1e6 DIV freq scores,
    top-20 with the score/phrase tiebreak) — exact equality."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round11_late import _rake_replay

    _ensure_loaded()
    texts = [" ".join(ws) for ws in docs]
    frame = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, len(texts) + 1), dtype="int64"),
            "text": pd.array(texts, dtype="object"),
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "rake", documents=frame)
    out = run_oracle(REGISTRY["text_rake_keywords"].oracle, sf)
    expect = _rake_replay(texts)
    assert len(out) == len(expect)
    for (_, r), (phrase, n_words, n_occ, score) in zip(out.iterrows(), expect):
        assert r["phrase"] == phrase
        assert int(r["n_words"]) == n_words
        assert int(r["n_occurrences"]) == n_occ
        assert r["rake_score"] == score


_cont_docs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=60),  # doc_id (split coin)
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10
        ),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@_settings
@given(docs=_cont_docs)
def test_contamination_oracle_matches_set_model(docs, tmp_path_factory):
    """The corpus_ngram_contamination ORACLE == the set-based python
    model (md5 split buckets, 5-gram windows, per-occurrence hit
    counting) — exact equality including the short-doc dropout."""
    import hashlib

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    texts = {did: " ".join(ws) for did, ws in docs}
    frame = pd.DataFrame(
        {
            "doc_id": pd.array(sorted(texts), dtype="int64"),
            "text": pd.array([texts[d] for d in sorted(texts)], dtype="object"),
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": pd.array(
                [len(texts[d]) for d in sorted(texts)], dtype="int64"
            ),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "cont", documents=frame)
    out = run_oracle(REGISTRY["corpus_ngram_contamination"].oracle, sf)
    got = {int(r["doc_id"]): r for _, r in out.iterrows()}

    def split_of(did):
        b = int(hashlib.md5(str(did).encode()).hexdigest()[:4], 16)
        return "train" if b < 52428 else ("test" if b >= 58982 else "val")

    grams = {
        did: [
            " ".join(ws[i : i + 5]) for i in range(len(ws) - 4)
        ]
        for did, ws in (
            # empty tokens are filtered before gram construction
            (d, [w for w in t.split(" ") if w != ""])
            for d, t in texts.items()
        )
    }
    train = {
        g for did, gs in grams.items() if split_of(did) == "train" for g in gs
    }
    expect = {
        did: (len(gs), sum(1 for g in gs if g in train))
        for did, gs in grams.items()
        if split_of(did) == "test" and gs
    }
    assert set(got) == set(expect)
    for did, (n, hits) in expect.items():
        r = got[did]
        assert (int(r["n_grams"]), int(r["n_contaminated"])) == (n, hits)
        assert r["contaminated_share"] == hits / n
        assert int(r["flag_contaminated"]) == int(2 * hits >= n)


_mcc_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4000),  # orderkey (coin seed)
        st.integers(min_value=0, max_value=4),  # priority bucket
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _mcc_frame(rows):
    import pandas as pd

    return pd.DataFrame(
        {
            "o_orderkey": pd.array([k for k, _ in rows], dtype="int64"),
            "o_custkey": pd.array([1] * len(rows), dtype="int64"),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": pd.array([100.0] * len(rows), dtype="float64"),
            "o_orderdate": pd.to_datetime(["1997-01-15"] * len(rows)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": [_PRIOS[p] for _, p in rows],
        }
    )


@_settings
@given(rows=_mcc_orders)
def test_mcc_oracle_matches_definition(rows, tmp_path_factory):
    """The ml_mcc_confusion ORACLE == the textbook MCC/precision/
    recall/F1 over the replayed confusion cells, including every
    zero-margin guard (all-positive, all-negative, all-flipped)."""
    import hashlib
    import math

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "mcc", orders=_mcc_frame(rows))
    got = run_oracle(REGISTRY["ml_mcc_confusion"].oracle, sf).iloc[0]

    tp = fp = fn = tn = 0
    for k, p in rows:
        y = int(p <= 1)
        coin = int(hashlib.md5(f"mcc#{k}".encode()).hexdigest()[:4], 16)
        yhat = abs(y - int(coin < 9830))
        tp += y and yhat
        fp += (not y) and yhat
        fn += y and (not yhat)
        tn += (not y) and (not yhat)
    assert (int(got["tp"]), int(got["fp"]), int(got["fn"]), int(got["tn"])) == (
        tp, fp, fn, tn,
    )
    assert got["precision_"] == (tp / (tp + fp) if tp + fp else 0.0)
    assert got["recall_"] == (tp / (tp + fn) if tp + fn else 0.0)
    assert got["f1"] == (2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0)
    if min(tp + fp, tp + fn, tn + fp, tn + fn) == 0:
        assert got["mcc"] == 0.0
    else:
        mcc = (tp * tn - fp * fn) / (
            math.sqrt(tp + fp) * math.sqrt(tp + fn)
            * math.sqrt(tn + fp) * math.sqrt(tn + fn)
        )
        assert abs(got["mcc"] - mcc) < 1e-12


@_settings
@given(rows=_mcc_orders)
def test_brier_oracle_matches_definition(rows, tmp_path_factory):
    """The ml_brier_decomposition ORACLE: brier == the EXACT integer
    numerator over 65536^2 n; reliability/resolution == the
    definitional binned float formulas within the nano-quantization
    bound; uncertainty == ybar(1-ybar) exactly."""
    import hashlib

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "brier", orders=_mcc_frame(rows))
    got = run_oracle(REGISTRY["ml_brier_decomposition"].oracle, sf).iloc[0]

    data = []
    for k, p in rows:
        y = int(p <= 1)
        coin = int(hashlib.md5(f"cal#{k}".encode()).hexdigest()[:4], 16)
        data.append((coin, y))
    n = len(data)
    bq = sum((c - 65536 * y) ** 2 for c, y in data)
    assert got["brier"] == float(bq) / (float(n) * 65536.0 * 65536.0)
    pos = sum(y for _, y in data)
    ybar = pos / n
    assert abs(got["uncertainty"] - ybar * (1 - ybar)) < 1e-15
    bins: dict[int, list] = {}
    for c, y in data:
        bins.setdefault(c * 10 // 65536, []).append((c, y))
    rel = sum(
        len(v)
        * (sum(c for c, _ in v) / (len(v) * 65536) - sum(y for _, y in v) / len(v))
        ** 2
        for v in bins.values()
    ) / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - ybar) ** 2
        for v in bins.values()
    ) / n
    tol = (len(bins) + 1) * 1e-9 / n + 1e-12
    assert abs(got["reliability"] - rel) <= tol
    assert abs(got["resolution"] - res) <= tol


# ---------------------------------------------------------------------------
# Round-12 additions: oracle-vs-model property models (pure DuckDB —
# the Spark<->oracle equality is hash-checked separately; the replays
# in tests/test_round12_ops.py declare the exact integer semantics,
# so these close the model<->spark<->oracle triangle on randomized
# shapes: empty groups, all-tied series, one-class labels).
# ---------------------------------------------------------------------------


def _orders_frame(rows):
    """rows: (orderkey, prio_bucket, dollars, day) -> orders frame."""
    import pandas as pd

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return pd.DataFrame(
        {
            "o_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
            "o_custkey": pd.array(
                [r[0] % 7 for r in rows], dtype="int64"
            ),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": pd.array(
                [float(r[2]) + 0.25 for r in rows], dtype="float64"
            ),
            "o_orderdate": pd.to_datetime(
                [f"2024-01-{r[3]:02d}" for r in rows]
            ).astype("datetime64[us]"),
            "o_orderpriority": [prios[r[1]] for r in rows],
        }
    )


_r12_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4000),  # orderkey (coin seed)
        st.integers(min_value=0, max_value=4),  # priority bucket
        st.integers(min_value=0, max_value=3000),  # dollars
        st.integers(min_value=1, max_value=14),  # order day
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@_settings
@given(rows=_r12_orders)
def test_mann_kendall_oracle_matches_brute_force(rows, tmp_path_factory):
    """The stat_mann_kendall ORACLE == brute-force pairwise signs +
    tie-corrected variance + the exact 1.96 inversion, exactly."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_ops import _mk_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "mk", orders=_orders_frame(rows))
    got = run_oracle(REGISTRY["stat_mann_kendall"].oracle, sf).iloc[0]
    n, s, var18, z, flag = _mk_replay(C(r[3] for r in rows))
    assert (int(got["n_days"]), int(got["s_stat"]), int(got["var_s_x18"])) == (
        n, s, var18,
    )
    assert got["z_stat"] == z
    assert int(got["trend_5pct"]) == flag


@_settings
@given(rows=_r12_orders)
def test_fleiss_oracle_matches_float_definition(rows, tmp_path_factory):
    """The ml_fleiss_kappa ORACLE (exact rational) == the textbook
    float Fleiss computation within 1e-12 — an independent float path,
    not the integer identity."""
    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round11_late import _coin

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "fleiss", orders=_orders_frame(rows))
    got = run_oracle(REGISTRY["ml_fleiss_kappa"].oracle, sf).iloc[0]
    n = len(rows)
    n1s = []
    for k, pb, _, _ in rows:
        y = int(pb in (0, 1))
        n1s.append(
            sum(
                ((1 - y) if _coin(f"fl{j}#{k}") < 9830 else y)
                for j in (1, 2, 3)
            )
        )
    p_i = [(v * (v - 1) + (3 - v) * (2 - v)) / 6.0 for v in n1s]
    p_bar = sum(p_i) / n
    p1 = sum(n1s) / (3.0 * n)
    p_e = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    assert abs(got["p_bar"] - p_bar) < 1e-12
    assert abs(got["p_e"] - p_e) < 1e-12
    if abs(1.0 - p_e) < 1e-15:
        assert got["fleiss_kappa"] == 0.0
    else:
        assert abs(got["fleiss_kappa"] - (p_bar - p_e) / (1.0 - p_e)) < 1e-9


_r12_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=14),  # day
        st.integers(min_value=0, max_value=3),  # type
        st.integers(min_value=0, max_value=3),  # value bucket
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_r12_events)
def test_friedman_oracle_matches_replay(rows, tmp_path_factory):
    """The stat_friedman_test ORACLE == the doubled-midrank Conover
    replay on randomized (day, type) cells — ties, missing cells, and
    single-type degenerates included."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_ops import _friedman_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "fried", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["stat_friedman_test"].oracle, sf).iloc[0]
    import datetime as dt

    cells = C(
        (("purchase" if g == 0 else f"g{g}"),
         dt.date(2024, 1, d).isoweekday())
        for d, g, _ in rows
    )
    b, k, chi2 = _friedman_replay(dict(cells))
    assert (int(got["b_blocks"]), int(got["k_treatments"])) == (b, k)
    assert got["friedman_chi2"] == chi2


@_settings
@given(rows=_r12_events)
def test_dispersion_oracle_matches_float_variance(rows, tmp_path_factory):
    """The events_dispersion_index ORACLE (exact integers) == the
    float sample-variance / mean path within 1e-9 relative — an
    independent float computation."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "disp", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["events_dispersion_index"].oracle, sf).iloc[0]
    daily = C(d for d, _, _ in rows)
    xs = list(daily.values())
    n = len(xs)
    assert int(got["n_days"]) == n
    if n < 2 or sum(xs) == 0:
        assert got["fano_factor"] == 0.0
        return
    mean = sum(xs) / n
    var = sum((x - mean) ** 2 for x in xs) / (n - 1)
    fano = var / mean
    assert abs(got["fano_factor"] - fano) < 1e-9 * max(1.0, fano)
    assert int(got["overdispersed"]) == int(fano > 1.0 + 1e-12) or abs(
        fano - 1.0
    ) < 1e-9


@_settings
@given(rows=_r12_events)
def test_durbin_watson_oracle_matches_float(rows, tmp_path_factory):
    """The stat_durbin_watson ORACLE == the float mean-residual DW
    within 1e-9 relative (the days*x - total multiply-through cancels
    exactly in the num/den ratio)."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "dw", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["stat_durbin_watson"].oracle, sf).iloc[0]
    daily = C(d for d, _, _ in rows)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    mean = sum(xs) / n
    e = [x - mean for x in xs]
    den = sum(v * v for v in e)
    if n < 2 or den == 0:
        assert got["dw_stat"] == 2.0
        return
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / den
    assert abs(got["dw_stat"] - dw) < 1e-9 * max(1.0, dw)


@_settings
@given(rows=_r12_orders)
def test_log_loss_oracle_within_quantization_bound(rows, tmp_path_factory):
    """The ml_log_loss ORACLE == the unquantized float model within
    the stated micro-quantization bound (1e-6 absolute on the mean),
    and the baseline/skill chain exactly."""
    import math as m

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round11_late import _coin

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "ll", orders=_orders_frame(rows))
    got = run_oracle(REGISTRY["ml_log_loss"].oracle, sf).iloc[0]
    n = len(rows)
    pos = sum(1 for _, pb, _, _ in rows if pb in (0, 1))
    ll_float = -sum(
        (m.log((2.0 * _coin(f"cal#{k}") + 1.0) / 131072.0)
         if pb in (0, 1)
         else m.log(1.0 - (2.0 * _coin(f"cal#{k}") + 1.0) / 131072.0))
        for k, pb, _, _ in rows
    ) / n
    assert (int(got["n_orders"]), int(got["n_pos"])) == (n, pos)
    assert abs(got["log_loss"] - ll_float) <= 1e-6 + 1e-12
    base = 0.0
    if pos:
        base += pos * m.log(pos / n)
    if pos < n:
        base += (n - pos) * m.log((n - pos) / n)
    base = -base / n
    assert got["baseline_ll"] == base


_r12_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=6,
)


@_settings
@given(docs=_r12_docs)
def test_msttr_oracle_matches_replay(docs, tmp_path_factory):
    """The text_msttr ORACLE == the exact segmentation replay —
    boundary truncation, repeated-type segments, empty docs."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_ops import _msttr_replay

    _ensure_loaded()
    texts = [" ".join(ws) for ws in docs]
    frame = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, len(texts) + 1), dtype="int64"),
            "text": pd.array(texts, dtype="object"),
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "msttr", documents=frame)
    got = run_oracle(REGISTRY["text_msttr"].oracle, sf).iloc[0]
    n_seg, n_docs, n_tok, g_ttr, ms = _msttr_replay(texts)
    assert (int(got["n_segments"]), int(got["n_docs_covered"]),
            int(got["n_tokens"])) == (n_seg, n_docs, n_tok)
    assert got["global_ttr"] == g_ttr
    assert got["msttr_50"] == ms


@_settings
@given(lengths=st.lists(st.integers(min_value=0, max_value=5000),
                        min_size=1, max_size=25))
def test_doclen_gini_oracle_matches_pairwise_definition(
    lengths, tmp_path_factory
):
    """The corpus_doclen_gini ORACLE (sorted-prefix identity) == the
    O(n^2) pairwise definition G = sum|xi-xj| / (2 n^2 mu) within
    1e-12 — the independent quadratic path the identity replaces."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    frame = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, len(lengths) + 1), dtype="int64"),
            "text": pd.array(["x" * min(l, 10) for l in lengths],
                             dtype="object"),
            "lang": ["en"] * len(lengths),
            "source": ["src0"] * len(lengths),
            "n_chars": pd.array(lengths, dtype="int64"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "dlg", documents=frame)
    got = run_oracle(REGISTRY["corpus_doclen_gini"].oracle, sf).iloc[0]
    n, s = len(lengths), sum(lengths)
    if n == 0 or s == 0:
        assert got["gini"] == 0.0
        return
    pairwise = sum(
        abs(a - b) for a in lengths for b in lengths
    )
    g = pairwise / (2.0 * n * s)  # 2 n^2 mu = 2 n s
    assert abs(got["gini"] - g) < 1e-12


@_settings
@given(rows=_r12_events)
def test_wilcoxon_oracle_matches_replay(rows, tmp_path_factory):
    """The stat_wilcoxon_signed_rank ORACLE == the doubled-midrank
    replay on randomized daily calendars — missing lag-7 partners,
    zero diffs, and all-tied |d| included."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_ops import _wilcoxon_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "wx", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["stat_wilcoxon_signed_rank"].oracle, sf).iloc[0]
    # _ev_frame puts all rows in 2024-01; epoch-day of 2024-01-d is
    # 19722 + d (only relative day numbers matter for the lag-7 join,
    # but keep the absolute mapping honest)
    n, w_plus, z, flag = _wilcoxon_replay(C(19722 + d for d, _, _ in rows))
    assert int(got["n_pairs"]) == n
    assert got["w_plus"] == w_plus
    assert got["z_stat"] == z
    assert int(got["shift_5pct"]) == flag


@_settings
@given(rows=_r12_events)
def test_pauc_oracle_matches_replay(rows, tmp_path_factory):
    """The ml_pauc_fpr10 ORACLE == the clipped-trapezoid replay with
    the same femto-quantization — heavy ties, one-class inputs, and
    tiny negative pools (budget < one tie group) included."""
    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_ops import _pauc_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "pauc10", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["ml_pauc_fpr10"].oracle, sf).iloc[0]
    p, nneg, nt, pauc, std = _pauc_replay(
        [(float(v * 25), int(g == 0)) for _, g, v in rows]
    )
    assert (int(got["n_pos"]), int(got["n_neg"]),
            int(got["n_thresholds"])) == (p, nneg, nt)
    assert got["pauc_fpr10"] == pauc
    assert got["pauc_std"] == std


# ---------------------------------------------------------------------------
# Round-12 late batch: oracle-vs-replay property models
# ---------------------------------------------------------------------------


@_settings
@given(rows=_r12_events)
def test_youden_oracle_matches_brute_force(rows, tmp_path_factory):
    """The ml_youden_threshold ORACLE == the brute-force argmax with
    the lowest-threshold tiebreak — ties, one-class, and
    single-threshold inputs included."""
    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _youden_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "yj", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["ml_youden_threshold"].oracle, sf).iloc[0]
    p, n, thr, tpr, fpr, j = _youden_replay(
        [(float(v * 25), int(g == 0)) for _, g, v in rows]
    )
    assert (int(got["n_pos"]), int(got["n_neg"])) == (p, n)
    if thr is None:
        assert got["best_threshold"] is None or got["best_threshold"] != got["best_threshold"]
        assert got["youden_j"] == 0.0
    else:
        assert got["best_threshold"] == thr
        assert got["tpr_at_best"] == tpr and got["fpr_at_best"] == fpr
        assert got["youden_j"] == j


@_settings
@given(rows=_r12_orders)
def test_weighted_kappa_oracle_matches_replay(rows, tmp_path_factory):
    """The ml_weighted_kappa ORACLE == the exact 3x3 replay."""
    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _wkappa_replay

    _ensure_loaded()
    frame = _orders_frame(rows)
    sf = _scratch_sf(tmp_path_factory, "wk", orders=frame)
    got = run_oracle(REGISTRY["ml_weighted_kappa"].oracle, sf).iloc[0]
    n, ow, ew, k = _wkappa_replay(frame)
    assert int(got["n_items"]) == n
    assert got["observed_w_disagreement"] == ow
    assert got["expected_w_disagreement"] == ew
    assert got["weighted_kappa"] == k


@_settings
@given(rows=_r12_events)
def test_pacf_oracle_matches_replay(rows, tmp_path_factory):
    """The events_pacf_daily ORACLE == the Levinson-Durbin replay on
    randomized sparse calendars — negative lag sums (the MAX-pivot
    defect this replay caught), missing lags, constants."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _pacf_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "pacf", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["events_pacf_daily"].oracle, sf).iloc[0]
    n, p1, p2, p3 = _pacf_replay(C(19722 + d for d, _, _ in rows))
    assert int(got["n_days"]) == n
    assert got["pacf_1"] == p1
    assert got["pacf_2"] == p2
    assert got["pacf_3"] == p3


@_settings
@given(rows=_r12_events)
def test_seasonal_strength_oracle_matches_replay(rows, tmp_path_factory):
    """The events_seasonal_strength ORACLE == the milli-quantized
    eta-squared replay (pure integer epoch-day weekday)."""
    from collections import Counter as C

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _seasonal_strength_replay

    _ensure_loaded()
    sf = _scratch_sf(tmp_path_factory, "sstr", events=_ev_frame(rows))
    got = run_oracle(REGISTRY["events_seasonal_strength"].oracle, sf).iloc[0]
    n, n_dows, eta2 = _seasonal_strength_replay(
        C(19722 + d for d, _, _ in rows)
    )
    assert (int(got["n_days"]), int(got["n_dows"])) == (n, n_dows)
    assert got["eta2_dow"] == eta2


_r12_kl_docs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=600),  # doc_id (split coin)
        st.integers(min_value=0, max_value=3),  # source id
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@_settings
@given(docs=_r12_kl_docs)
def test_split_kl_oracle_matches_replay(docs, tmp_path_factory):
    """The corpus_split_balance_kl ORACLE == the set-based replay —
    sources fully outside the train buckets, single-source corpora."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _split_kl_replay

    _ensure_loaded()
    frame = pd.DataFrame(
        {
            "doc_id": pd.array([d for d, _ in docs], dtype="int64"),
            "text": ["word " * 3] * len(docs),
            "lang": ["en"] * len(docs),
            "source": [f"s{g}" for _, g in docs],
            "n_chars": pd.array([15] * len(docs), dtype="int64"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "skl", documents=frame)
    got = run_oracle(REGISTRY["corpus_split_balance_kl"].oracle, sf).iloc[0]
    ns, miss, mt, nt, kl = _split_kl_replay(
        [(d, f"s{g}") for d, g in docs]
    )
    assert (int(got["n_sources"]), int(got["n_sources_missing_in_train"])) == (
        ns, miss,
    )
    assert (int(got["n_train_docs"]), int(got["n_docs"])) == (mt, nt)
    assert got["kl_train_vs_corpus"] == kl


@_settings
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_participation_ratio_oracle_matches_numpy(vecs, tmp_path_factory):
    """The embeddings_participation_ratio ORACLE == the quantized
    numpy replay on random low-dim vectors (zero-padded to the 64-dim
    contract) — rank-collapse and zero-vector shapes included."""
    import numpy as np
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round12_late import _pr_replay

    _ensure_loaded()
    full = [[x / 1000.0 for x in v] + [0.0] * 60 for v in vecs]
    frame = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(full) + 1), dtype="int64"),
            "embedding": [np.asarray(v, dtype=np.float32) for v in full],
            "label": pd.array([0] * len(full), dtype="int32"),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "prr", embeddings=frame)
    got = run_oracle(
        REGISTRY["embeddings_participation_ratio"].oracle, sf
    ).iloc[0]
    n, d, tr, pr = _pr_replay(np.stack([np.asarray(v, dtype=np.float32) for v in full]).astype(np.float64))
    assert (int(got["n_vectors"]), int(got["n_dims"])) == (n, d)
    assert got["trace_cov"] == tr
    assert got["participation_ratio"] == pr


# ---------------------------------------------------------------------------
# Round-13 additions: oracle-vs-replay property models
# ---------------------------------------------------------------------------

_r13_scores = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # value bucket (ties!)
        st.booleans(),  # is positive
    ),
    min_size=1,
    max_size=50,
)


@_settings
@given(rows=_r13_scores)
def test_ksep_oracle_matches_replay(rows, tmp_path_factory):
    """The ml_ks_separation ORACLE == the exact integer KS replay on
    randomized tied scores — one-class inputs included."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_ops import _ksep_replay

    _ensure_loaded()
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(["2024-01-05 03:00:00"] * len(rows)),
            "user_id": [1] * len(rows),
            "event_type": [
                "purchase" if pos else "view" for _, pos in rows
            ],
            "value": [float(v * 25) for v, _ in rows],
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "ksep", events=ev)
    got = run_oracle(REGISTRY["ml_ks_separation"].oracle, sf).iloc[0]
    p, n, ks, thr = _ksep_replay(
        [(float(v * 25), pos) for v, pos in rows]
    )
    assert (int(got["n_pos"]), int(got["n_neg"])) == (p, n)
    assert got["ks_stat"] == ks
    if p == 0 or n == 0:
        import math as _m

        assert got["ks_threshold"] is None or _m.isnan(got["ks_threshold"])
    else:
        assert got["ks_threshold"] == thr


_r13_chain = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=3),  # type
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(rows=_r13_chain)
def test_markov_oracle_matches_replay(rows, tmp_path_factory):
    """The events_markov_entropy ORACLE == the micro-nat replay on
    randomized multi-user chains (singleton users contribute no
    transitions)."""
    import datetime as dt

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_ops import _markov_replay

    _ensure_loaded()
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                dt.datetime(2024, 1, 3, 1, 0, 0) + dt.timedelta(minutes=i)
                for i in range(len(rows))
            ],
            "user_id": [u for u, _ in rows],
            "event_type": [f"t{g}" for _, g in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "markov", events=ev)
    ora = run_oracle(REGISTRY["events_markov_entropy"].oracle, sf)
    got = {
        r["prev_type"]: (r["n_out"], r["n_next_types"], r["entropy_nats"])
        for _, r in ora.iterrows()
    }
    model = _markov_replay(
        [
            (i, ev["ts"][i], u, f"t{g}")
            for i, (u, g) in enumerate(rows)
        ]
    )
    assert got == model


_r13_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "", "aa"]),
        min_size=0,
        max_size=6,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@_settings
@given(texts=_r13_texts)
def test_distinct_ngrams_oracle_matches_replay(texts, tmp_path_factory):
    """The text_distinct_ngrams ORACLE == the cleaned-sequence replay
    on randomized corpora with empty tokens and repeated words."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_ops import _distinct_ngrams_replay

    _ensure_loaded()
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _scratch_sf(tmp_path_factory, "distn", documents=docs)
    got = run_oracle(REGISTRY["text_distinct_ngrams"].oracle, sf).iloc[0]
    n_tok, d1, n_bi, d2 = _distinct_ngrams_replay(texts)
    assert (int(got["n_tokens"]), int(got["distinct_unigrams"])) == (
        n_tok, d1,
    )
    assert (int(got["n_bigrams"]), int(got["distinct_bigrams"])) == (
        n_bi, d2,
    )


_r13_prices = st.lists(
    st.sampled_from([10.0, 10.01, 99.99, 250.5, 250.5, 1000.33, 5.0]),
    min_size=1,
    max_size=30,
)


@_settings
@given(prices=_r13_prices)
def test_mad_oracle_matches_replay(prices, tmp_path_factory):
    """The stat_mad_robust_z ORACLE == the interpolated-median replay
    on randomized tied prices — odd/even counts and MAD=0 shapes."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_ops import _mad_replay

    _ensure_loaded()
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(len(prices)), dtype="int64"),
            "o_custkey": pd.array([1] * len(prices), dtype="int64"),
            "o_orderstatus": ["O"] * len(prices),
            "o_totalprice": pd.array(prices, dtype="float64"),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * len(prices)
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * len(prices),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "mad", orders=orders)
    got = run_oracle(REGISTRY["stat_mad_robust_z"].oracle, sf).iloc[0]
    n, med, mad, outl, mz = _mad_replay(prices)
    assert int(got["n"]) == n
    assert got["median_price"] == med
    assert got["mad_price"] == mad
    assert int(got["n_outliers_3s"]) == outl
    assert got["max_robust_z"] == mz


_r13_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10_000),  # orderkey space
        st.sampled_from([10.0, 55.5, 99.99, 250.5, 1000.33]),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@_settings
@given(rows=_r13_orders)
def test_qsk_oracle_matches_replay(rows, tmp_path_factory):
    """The sketch_quantile_bottomk ORACLE == the md5 bottom-k replay —
    n < k inputs collapse est == exact with abs_error 0."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_ops import _qsk_replay

    _ensure_loaded()
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array([k for k, _ in rows], dtype="int64"),
            "o_custkey": pd.array([1] * len(rows), dtype="int64"),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": pd.array([p for _, p in rows], dtype="float64"),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(rows)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "qsk", orders=orders)
    ora = run_oracle(REGISTRY["sketch_quantile_bottomk"].oracle, sf)
    dec = [
        (k, Decimal(repr(p)).quantize(Decimal("0.01"), ROUND_HALF_UP))
        for k, p in rows
    ]
    n, ka, model = _qsk_replay(dec)
    got = {
        r["quantile"]: (r["est_value"], r["exact_value"], r["abs_error"])
        for _, r in ora.iterrows()
    }
    assert len(got) == 3
    for p, vals in model.items():
        assert got[p] == vals
        assert int(ora.iloc[0]["n_rows"]) == n
        assert int(ora.iloc[0]["k_sample"]) == ka


@_settings
@given(texts=_r13_texts)
def test_repetition_oracle_matches_replay(texts, tmp_path_factory):
    """The text_repetition_profile ORACLE == the n-gram Counter
    replay on randomized corpora (docs shorter than the gram width
    contribute nothing; an all-short corpus yields 0 rows)."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_late import _repetition_replay

    _ensure_loaded()
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _scratch_sf(tmp_path_factory, "rep", documents=docs)
    ora = run_oracle(REGISTRY["text_repetition_profile"].oracle, sf)
    got = {
        int(r["gram_n"]): (
            int(r["total_grams"]), int(r["top_gram_count"]),
            int(r["dup_instances"]), r["top_gram_share"],
            r["dup_instance_share"],
        )
        for _, r in ora.iterrows()
    }
    assert got == _repetition_replay(texts)


@_settings
@given(prices=_r13_prices)
def test_tukey_oracle_matches_replay(prices, tmp_path_factory):
    """The stat_tukey_fences ORACLE == the dyadic-quartile replay on
    randomized tied prices."""
    import pandas as pd

    from aws_etl_spark.oracle import run_oracle
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tests.test_round13_late import _tukey_replay

    _ensure_loaded()
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(len(prices)), dtype="int64"),
            "o_custkey": pd.array([1] * len(prices), dtype="int64"),
            "o_orderstatus": ["O"] * len(prices),
            "o_totalprice": pd.array(prices, dtype="float64"),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(prices)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(prices),
        }
    )
    sf = _scratch_sf(tmp_path_factory, "tukey", orders=orders)
    got = run_oracle(REGISTRY["stat_tukey_fences"].oracle, sf).iloc[0]
    n, q1, q3, iqr, lo, hi = _tukey_replay(prices)
    assert int(got["n"]) == n
    assert (got["q1_price"], got["q3_price"], got["iqr_price"]) == (q1, q3, iqr)
    assert (int(got["n_low_outliers"]), int(got["n_high_outliers"])) == (lo, hi)
