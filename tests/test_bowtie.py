"""Bow-tie decomposition (operators/bowtie.py) vs a scalar oracle composed
from the Kosaraju SCC oracle + deque reachability: textbook bow-tie shapes,
the giant-SCC tie-break, and a random digraph."""

from __future__ import annotations

from collections import deque

from accelerating_tc_spark.operators import bowtie
from test_scc import python_scc


def python_reach(pairs, seeds: set[int]) -> set[int]:
    adj: dict[int, list[int]] = {}
    for a, b in {(a, b) for a, b in pairs if a != b}:
        adj.setdefault(a, []).append(b)
    seen = set(seeds)
    q = deque(seeds)
    while q:
        v = q.popleft()
        for w in adj.get(v, []):
            if w not in seen:
                seen.add(w)
                q.append(w)
    return seen


def python_bowtie(pairs) -> dict[int, str]:
    comp = python_scc(pairs)
    if not comp:
        return {}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    giant = min(c for c in sizes if sizes[c] == max(sizes.values()))
    core = {v for v, c in comp.items() if c == giant}
    fwd = python_reach(pairs, core)
    rev = python_reach([(b, a) for a, b in pairs], core)
    out = {}
    for v in comp:
        if v in core:
            out[v] = "core"
        elif v in fwd:
            out[v] = "out"
        elif v in rev:
            out[v] = "in"
        else:
            out[v] = "other"
    return out


def run_bowtie(spark, pairs) -> dict[int, str]:
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["vertex"]: r["cls"] for r in bowtie.bowtie_classes(spark, df).collect()}


def test_textbook_bowtie(spark):
    pairs = [
        (1, 2), (2, 3), (3, 1),      # core: 3-cycle
        (10, 1), (11, 10),           # IN chain
        (3, 20), (20, 21),           # OUT chain
        (30, 31), (31, 30),          # detached 2-cycle -> other
        (40, 41),                    # detached edge -> other
    ]
    got = run_bowtie(spark, pairs)
    assert got == {
        1: "core", 2: "core", 3: "core",
        10: "in", 11: "in",
        20: "out", 21: "out",
        30: "other", 31: "other", 40: "other", 41: "other",
    }
    assert got == python_bowtie(pairs)


def test_giant_tiebreak_is_min_component_id(spark):
    # two 2-cycles, no path between: giant = the one holding the min id
    pairs = [(5, 6), (6, 5), (1, 2), (2, 1)]
    got = run_bowtie(spark, pairs)
    assert got == {1: "core", 2: "core", 5: "other", 6: "other"}


def test_tube_and_tendril_are_other(spark):
    # Broder tendrils/tubes collapse into 'other' (documented 4-way split):
    # 50 hangs off IN going nowhere; 60 bridges IN->OUT around the core
    pairs = [
        (1, 2), (2, 1),              # core
        (10, 1),                     # in
        (1, 20),                     # out
        (10, 50),                    # tendril off IN: not reached by core,
                                     # does not reach core
        (10, 60), (60, 20),          # tube: IN -> 60 -> OUT bypassing core
    ]
    got = run_bowtie(spark, pairs)
    assert got[50] == "other" and got[60] == "other"
    assert got == python_bowtie(pairs)


def test_summary_counts(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (10, 1), (3, 20), (30, 31)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["cls"]: r["n_vertices"]
        for r in bowtie.bowtie_summary(spark, df).collect()
    }
    assert got == {"core": 3, "in": 1, "out": 1, "other": 2}


def test_directed_graph_stats(spark):
    # 1<->2 mutual, 1->3, 4->1, self-loop + dup dropped; 4 is a source,
    # 3 is a sink
    pairs = [(1, 2), (2, 1), (1, 3), (4, 1), (1, 1), (1, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = bowtie.directed_graph_stats(spark, df).collect()[0]
    assert row["n_vertices"] == 4
    assert row["n_edges"] == 4
    assert row["n_reciprocal"] == 2
    assert row["reciprocity"] == 0.5
    assert row["n_sources"] == 1  # vertex 4
    assert row["n_sinks"] == 1    # vertex 3


def test_random_digraph_matches_python_oracle(spark):
    n = 72
    pairs = []
    for v in range(n):
        pairs.append((v, (v * 13 + 7) % n))
        if v % 3 == 0:
            pairs.append((v, (v * 5 + 1) % n))
        if v % 7 == 0:
            pairs.append(((v * 11 + 2) % n, v))
    assert run_bowtie(spark, pairs) == python_bowtie(pairs)
