"""Parity tests for the round-3 operators: connected components
(large-star/small-star) vs a union-find reference, Lloyd k-means vs a
numpy reference, repetition signals vs a pure-Python count."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# connected components

def _uf_clusters(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


CC_CASES = {
    # chains are the adversarial shape: diameter = n, where naive
    # min-propagation needs O(n) rounds but star-contraction O(log² n)
    "chain": [(i, i + 1) for i in range(40)],
    "clique": [(i, j) for i in range(8) for j in range(i + 1, 8)],
    "star": [(0, i) for i in range(1, 30)],
    "two_components": ([(i, i + 1) for i in range(20)]
                       + [(100 + i, 101 + i) for i in range(15)]),
    "dups_and_loops": [(1, 2), (2, 1), (1, 2), (5, 5), (7, 8)],
}


# small_graph_edges=0 forces the distributed star-contraction loop;
# the default takes the adaptive driver union-find path — both must
# match the reference union-find on every shape
@pytest.mark.parametrize("small", [0, 10 ** 6],
                         ids=["distributed", "driver"])
@pytest.mark.parametrize("name", sorted(CC_CASES))
def test_connected_components_shapes(spark, name, small):
    from pii_extract_base_spark.operators.graph import connected_components
    edges = CC_CASES[name]
    nodes = sorted({x for e in edges for x in e if e[0] != e[1]})
    expected = _uf_clusters([e for e in edges if e[0] != e[1]], nodes)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["cluster"]
           for r in connected_components(
               df, small_graph_edges=small).collect()}
    assert got == expected


@pytest.mark.parametrize("small", [0, 10 ** 6],
                         ids=["distributed", "driver"])
def test_connected_components_random(spark, small):
    from pii_extract_base_spark.operators.graph import connected_components
    rng = random.Random(1234)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    nodes = sorted({x for e in edges for x in e if e[0] != e[1]})
    expected = _uf_clusters([e for e in edges if e[0] != e[1]], nodes)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["cluster"]
           for r in connected_components(
               df, small_graph_edges=small).collect()}
    assert got == expected


def test_connected_components_paths_identical_rows(spark):
    """The adaptive short circuit must be row-for-row interchangeable
    with the distributed fixed point (schema + exact rows)."""
    from pii_extract_base_spark.operators.graph import connected_components
    rng = random.Random(77)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = connected_components(df)
    slow = connected_components(df, small_graph_edges=0)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, slow.collect()))


def test_connected_components_null_edges(spark):
    from pii_extract_base_spark.operators.graph import connected_components
    df = spark.createDataFrame([(1, 2), (None, 3), (4, None)],
                               "id_a long, id_b long")
    got = {r["node"]: r["cluster"]
           for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1}


def test_dup_clusters_canonical_flag(spark):
    from pii_extract_base_spark.operators.graph import dup_clusters
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["cluster"], r["is_canonical"])
           for r in dup_clusters(docs, pairs).collect()}
    # 0-3-5 chain collapses to cluster 0; others are singletons
    assert out == {0: (0, True), 3: (0, False), 5: (0, False),
                   1: (1, True), 2: (2, True), 4: (4, True)}


# ---------------------------------------------------------------------------
# k-means

# small_rows=0 forces the distributed Lloyd loop; the default takes
# the adaptive driver replay — both must satisfy the same oracle
@pytest.mark.parametrize("small", [0, 65536],
                         ids=["distributed", "driver"])
def test_kmeans_matches_numpy_lloyd(spark, small):
    np = pytest.importorskip("numpy")
    from pii_extract_base_spark.operators.cluster import kmeans

    rng = np.random.RandomState(7)
    dim, n, k, iters = 8, 120, 3, 2
    pts = rng.randn(n, dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")

    # reference Lloyd with the operator's exact contract: smallest-id
    # init, round-4dp centroid updates, (dist, cid) tie-break
    v = pts.astype(np.float64)
    cents = {i: v[i].copy() for i in range(k)}

    def assign(cents):
        lab = {}
        for i in range(n):
            best = min((round(float(((v[i] - c) ** 2).sum()), 9), cid)
                       for cid, c in cents.items())
            lab[i] = best[1]
        return lab

    for _ in range(iters):
        lab = assign(cents)
        cents = {}
        for cid in sorted(set(lab.values())):
            members = np.array([v[i] for i in range(n) if lab[i] == cid])
            cents[cid] = np.round(members.mean(axis=0), 4)
    expected = assign(cents)

    assigned, final_cents = kmeans(df, k=k, iters=iters, dim=dim,
                                   small_rows=small)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == expected
    assert sorted(c for c, _ in final_cents) == sorted(cents)


def test_kmeans_paths_identical(spark):
    """The adaptive driver Lloyd replay must equal the distributed
    loop EXACTLY — centroid doubles and assignments — on a random
    float32 input (summation-order drift absorbed by the round_dp
    quantization, everything else bit-replayed)."""
    np = pytest.importorskip("numpy")
    from pii_extract_base_spark.operators.cluster import kmeans
    rng = np.random.RandomState(23)
    pts = rng.randn(150, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(150)],
        "vec_id long, embedding array<float>")
    a_fast, c_fast = kmeans(df, k=4, iters=3, dim=8)
    a_slow, c_slow = kmeans(df, k=4, iters=3, dim=8, small_rows=0)
    assert c_fast == c_slow
    assert sorted(map(tuple, a_fast.collect())) == \
        sorted(map(tuple, a_slow.collect()))


def test_kmeans_requires_dim(spark):
    from pii_extract_base_spark.operators.cluster import kmeans
    df = spark.createDataFrame([(0, [0.0, 1.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        kmeans(df, k=2)


# ---------------------------------------------------------------------------
# repetition signals

def test_repetition_signals_vs_python(spark):
    from pii_extract_base_spark.functions.quality import repetition_signals
    texts = {
        0: "a b a b a b c",              # heavy 2-gram repetition
        1: "w x y z",                    # all unique
        2: "q q q q q",                  # one gram repeated
        3: "one two three one two",      # partial repeats
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in repetition_signals(df).collect()}
    for doc_id, text in texts.items():
        w = text.split()
        for n in (2, 3):
            grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
            c = Counter(grams)
            total = len(grams)
            row = got[doc_id]
            assert row[f"n{n}"] == total
            assert row[f"top{n}_frac"] == round(max(c.values()) / total, 6)
            dup = sum(v for v in c.values() if v > 1)
            assert row[f"dup{n}_frac"] == round(dup / total, 6)


def test_repetition_signals_short_doc_dropped(spark):
    from pii_extract_base_spark.functions.quality import repetition_signals
    df = spark.createDataFrame([(0, "solo"), (1, "a b c")],
                               "doc_id long, text string")
    got = {r["doc_id"] for r in repetition_signals(df).collect()}
    assert got == {1}    # doc 0 has no 2-grams; inner join drops it


# ---------------------------------------------------------------------------
# PageRank (operators/graph.pagerank)

def _numpy_pagerank(edges, iters=8, d=0.85, quant=10):
    """Dense power-iteration reference with the same quantization and
    dangling-mass rule as the operator."""
    nodes = sorted({u for u, v, w in edges} | {v for u, v, w in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    outdeg = Counter()
    for u, v, w in edges:
        outdeg[u] += w
    r = [1.0 / N] * N
    for _ in range(iters):
        contrib = [0.0] * N
        for u, v, w in edges:
            contrib[idx[v]] += r[idx[u]] * (w / outdeg[u])
        dang = sum(r[idx[n]] for n in nodes if outdeg[n] == 0)
        r = [round((1 - d) / N + d * (contrib[i] + dang / N), quant)
             for i in range(N)]
    return dict(zip(nodes, r))


def _run_pagerank(spark, edges, **kw):
    from pii_extract_base_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    out = pagerank(df, src="src", dst="dst", weight="w", **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


# small_graph_edges=0 forces the distributed loop; the default takes
# the adaptive driver replay — both must satisfy the same oracles
@pytest.mark.parametrize("small", [0, 10 ** 5],
                         ids=["distributed", "driver"])
def test_pagerank_matches_power_iteration(spark, small):
    import random
    rng = random.Random(7)
    edges = list({(rng.randrange(12), rng.randrange(12))
                  for _ in range(40)})
    edges = [(u, v, float(rng.randint(1, 3)))
             for u, v in edges if u != v]
    got = _run_pagerank(spark, edges, small_graph_edges=small)
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
    assert abs(sum(got.values()) - 1.0) < 1e-6     # mass conserved


def test_pagerank_paths_identical_values(spark):
    """The adaptive driver replay must equal the distributed loop
    EXACTLY (same HALF_UP quantization every round, summation-order
    drift absorbed by design) — not merely within tolerance. Random
    weighted multigraph with dangling nodes and skewed degrees."""
    import random
    rng = random.Random(55)
    edges = [(rng.randrange(30), rng.randrange(40),
              float(rng.randint(1, 5))) for _ in range(180)]
    edges = [e for e in edges if e[0] != e[1]]
    fast = _run_pagerank(spark, edges)
    slow = _run_pagerank(spark, edges, small_graph_edges=0)
    assert fast == slow


def test_pagerank_paths_identical_with_null_weights(spark):
    """NULL edge weights: the distributed plan sums them away (F.sum
    skips NULLs; a NULL frac contributes nothing, and a source whose
    weights are ALL NULL still counts as non-dangling via its deg
    row). The driver replay must mirror that, not crash on None."""
    edges = [(0, 1, 1.0), (1, 2, None), (1, 3, 2.0), (2, 3, None),
             (3, 0, 1.0), (4, 0, None)]   # node 2 and 4: only-NULL out
    fast = _run_pagerank(spark, edges)
    slow = _run_pagerank(spark, edges, small_graph_edges=0)
    assert fast == slow
    assert set(fast) == {0, 1, 2, 3, 4}


def test_pagerank_zero_weight_sum_paths_agree_both_ansi_modes(spark):
    """A source whose weights sum to 0.0 is SESSION-DEPENDENT
    distributed-side: ANSI (Spark 4 default) raises DIVIDE_BY_ZERO,
    non-ANSI yields NULL fracs (contributions summed away, source
    stays non-dangling). The driver replay must mirror whichever mode
    the session runs — crash-vs-result must never depend on the
    small_graph_edges gate."""
    edges = [(0, 1, 1.0), (1, 0, 0.0), (1, 2, 0.0), (2, 0, 1.0)]
    old = spark.conf.get("spark.sql.ansi.enabled", "true")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        fast = _run_pagerank(spark, edges)
        slow = _run_pagerank(spark, edges, small_graph_edges=0)
        assert fast == slow and set(fast) == {0, 1, 2}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    # ANSI default: BOTH paths raise
    with pytest.raises(Exception):
        _run_pagerank(spark, edges)
    with pytest.raises(Exception):
        _run_pagerank(spark, edges, small_graph_edges=0)


def test_pagerank_driver_promotes_mixed_src_dst_types(spark):
    """int src ∪ long dst: the distributed union promotes node to
    long; the driver replay must emit the SAME schema, not the src
    column's narrower type."""
    from pii_extract_base_spark.operators.graph import pagerank
    df = spark.createDataFrame([(1, 2 ** 40, 1.0), (2, 1, 1.0)],
                               "src int, dst long, w double")
    fast = pagerank(df, src="src", dst="dst", weight="w")
    slow = pagerank(df, src="src", dst="dst", weight="w",
                    small_graph_edges=0)
    assert fast.schema == slow.schema
    assert ({tuple(r) for r in fast.collect()}
            == {tuple(r) for r in slow.collect()})


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up (the driver replay's quantizer) must agree with
    Catalyst's F.round on DoubleType bit-for-bit, including half-digit
    ties where Python's builtin banker's rounding diverges."""
    import random
    from pii_extract_base_spark.operators.graph import _round_half_up
    from decimal import Decimal
    q = Decimal(1).scaleb(-10)
    rng = random.Random(99)
    vals = ([rng.random() for _ in range(200)]
            + [rng.random() * 1e-6 for _ in range(50)]
            + [0.00000000005, 0.00000000015, 0.12345678905,
               1.5e-10, 2.5e-10, 0.1 + 0.2, 1.0 / 3.0])
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["y"] for r in
           df.select(F.round("x", 10).alias("y")).collect()]
    want = [_round_half_up(v, q) for v in vals]
    assert got == want


def test_pagerank_ring_is_uniform(spark):
    n = 6
    edges = [(i, (i + 1) % n, 1.0) for i in range(n)]
    got = _run_pagerank(spark, edges, iters=5)
    for v in got.values():
        assert abs(v - 1.0 / n) < 1e-9             # symmetric fixed point


def test_pagerank_dangling_mass_redistributed(spark):
    # 0 -> 1 -> 2, node 2 dangles; without redistribution total mass
    # leaks every round
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    got = _run_pagerank(spark, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got[2] > got[1] > 0                     # chain accumulates
    want = _numpy_pagerank(edges)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9


# ---------------------------------------------------------------------------
# Product quantization (q73 composition: per-subspace kmeans + codes)

def test_pq_codes_separate_subspace_patterns(spark):
    """Vectors built from 2 distinct patterns per 4-d subspace: PQ
    codes must agree for same-pattern vectors and the reconstruction
    error must be ~0 (every vector sits ON a codebook centroid)."""
    from pii_extract_base_spark.operators.cluster import _sq_dist, kmeans
    from pyspark.sql import functions as F
    pats = [[0.0] * 4, [10.0] * 4]
    # combo per vec: vec 0 = all pattern-0, vec 1 = all pattern-1 (the
    # smallest-id deterministic inits must differ in EVERY subspace or
    # that subspace's 2-means starts with two identical centroids)
    combos = [0, 7] + [(i - 2) % 8 for i in range(2, 16)]
    rows = []
    for i, cmb in enumerate(combos):
        vec = []
        for s in range(3):                      # 3 subspaces x 4 dims
            vec += pats[(cmb >> s) & 1]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.select("vec_id", F.col("embedding").alias("v"))
    out = base
    for s in range(3):
        sub = base.select("vec_id",
                          F.slice("v", 4 * s + 1, 4).alias("embedding"))
        _, cents = kmeans(sub, k=2, iters=2, dim=4)
        sv = F.slice(F.col("v"), 4 * s + 1, 4)
        best = F.array_min(F.array(*[
            F.struct(_sq_dist(sv, c).alias("dist"),
                     F.lit(int(cid)).alias("cid"))
            for cid, c in cents]))
        out = (out.withColumn(f"c{s}", best["cid"])
                  .withColumn(f"d{s}", best["dist"]))
    got = {r["vec_id"]: r.asDict() for r in out.collect()}
    for i in range(16):
        for s in range(3):
            assert got[i][f"d{s}"] == 0.0        # on-centroid
    for s in range(3):
        by_pattern = {}
        for i, cmb in enumerate(combos):
            by_pattern.setdefault((cmb >> s) & 1,
                                  set()).add(got[i][f"c{s}"])
        assert all(len(v) == 1 for v in by_pattern.values())
        assert by_pattern[0] != by_pattern[1]


@pytest.mark.parametrize("small", [0, 65536],
                         ids=["distributed", "driver"])
def test_kmeans_grouped_matches_per_group_kmeans(spark, small):
    """The shared-loop grouped trainer (r4, the PQ shape) must produce
    EXACTLY the per-group `kmeans` centroids and assignments — same
    init, same rounding, same tie-breaks, just 1 job per round instead
    of |groups| — on BOTH its execution paths (the adaptive driver
    replay and the distributed loop)."""
    import random
    from pyspark.sql import functions as F
    from pii_extract_base_spark.operators.cluster import (kmeans,
                                                          kmeans_grouped)
    rng = random.Random(11)
    dim = 6
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(2 * dim)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    slices = F.array(F.slice("v", 1, dim), F.slice("v", dim + 1, dim))
    subs = df.select("vec_id", F.posexplode(slices).alias("sub", "v"))
    ga, gc = kmeans_grouped(subs, groups=[0, 1], k=3, iters=2,
                            group_col="sub", vec_col="v", dim=dim,
                            small_rows=small)
    got_assign = {(r["sub"], r["vec_id"]): r["cluster"]
                  for r in ga.collect()}
    for s in (0, 1):
        sub = df.select("vec_id",
                        F.slice("v", s * dim + 1, dim).alias("embedding"))
        a, c = kmeans(sub, k=3, iters=2, dim=dim)
        assert gc[s] == c, f"centroids diverge in group {s}"
        ref = {r["vec_id"]: r["cluster"] for r in a.collect()}
        for vid, cl in ref.items():
            assert got_assign[(s, vid)] == cl
