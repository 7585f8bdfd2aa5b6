"""Graph operator semantics on hand-built tiny graphs.

Oracle parity (test_oracle_parity) checks engine agreement; these
check the *algorithms* against hand-computed expectations, modeled on
the reference's embedded asserts (DeduperUtils.java:955-1050 for
union-find; PageRankUtils finalizePageRank damping).
"""

from __future__ import annotations

import pytest

from commoncrawl_crawler_spark.operators import graph


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(s, d, "t") for s, d in pairs], "src long, dst long, link_type string"
    )


def test_connected_components_two_islands(spark):
    # {1-2-3} and {10-11}, 20 isolated-by-self? (no: nodes come from edges)
    labels = graph.connected_components(
        _edges_df(spark, [(1, 2), (2, 3), (10, 11)])
    )
    got = {r["node"]: r["comp"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_chain_converges(spark):
    # a 64-node chain has diameter 63: min-label propagation would need
    # ~63 rounds; star contraction must finish in O(log n)
    chain = [(i, i + 1) for i in range(1, 64)]
    labels = graph.connected_components(_edges_df(spark, chain))
    comps = {r["comp"] for r in labels.collect()}
    assert comps == {1}
    assert graph.connected_components.last_rounds <= 10


def test_connected_components_handles_self_loops_and_dups(spark):
    labels = graph.connected_components(
        _edges_df(spark, [(5, 5), (1, 2), (2, 1), (2, 3)])
    )
    got = {r["node"]: r["comp"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5}


def test_pagerank_sink_gets_all_rank(spark):
    # 1 -> 3, 2 -> 3: after one iteration rank(3) = 0.15 + 0.85*(1+1)
    ranks = graph.pagerank(_edges_df(spark, [(1, 3), (2, 3)]), iterations=1)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got[1] == pytest.approx(0.15)
    assert got[2] == pytest.approx(0.15)
    assert got[3] == pytest.approx(0.15 + 0.85 * 2.0)


def test_pagerank_split_outdegree(spark):
    # 1 -> {2,3}: each target receives rank/2
    ranks = graph.pagerank(_edges_df(spark, [(1, 2), (1, 3)]), iterations=1)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.5)
    assert got[3] == pytest.approx(0.15 + 0.85 * 0.5)


def test_pagerank_root_averaging_dampens_nepotism(spark):
    # targets 200 and 201: 200 receives from 3 sources sharing one root
    # (97, 194, 291 are all ==0 mod 97 -> averaged to one contribution);
    # 201 receives from 3 sources in distinct roots (summed).
    same_root_sources = [(97, 200), (194, 200), (291, 200)]
    cross_root_sources = [(1, 201), (2, 201), (3, 201)]
    edges = _edges_df(spark, same_root_sources + cross_root_sources)
    ranks = graph.pagerank_root_averaged(edges, iterations=1)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got[200] == pytest.approx(0.15 + 0.85 * 1.0)  # avg of three 1.0s
    assert got[201] == pytest.approx(0.15 + 0.85 * 3.0)  # plain sum


def test_pagerank_super_root_keeps_sum(spark):
    same_root_sources = [(97, 200), (194, 200), (291, 200)]
    edges = _edges_df(spark, same_root_sources)
    super_roots = spark.createDataFrame([(0,)], "root long")
    ranks = graph.pagerank_root_averaged(
        edges, super_roots=super_roots, iterations=1
    )
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got[200] == pytest.approx(0.15 + 0.85 * 3.0)


def test_inverse_links_caps_sample(spark):
    edges = _edges_df(spark, [(s, 999) for s in range(1, 150)])
    row = graph.inverse_links(edges).collect()[0]
    assert row["inlink_count"] == 149
    sample = row["src_sample"].split(",")
    assert len(sample) == graph.SAMPLE_CAP
    assert sample[0] == "1" and sample[-1] == "100"  # sorted, truncated


def test_domain_rank_monotone_in_cross_root_links(spark):
    # dst 500: 1 cross-root inlink; dst 501: 30 cross-root inlinks
    edges = _edges_df(
        spark, [(1, 500)] + [(i, 501) for i in range(1, 31)]
    )
    got = {r["dst"]: r["domain_rank"] for r in graph.domain_rank(edges).collect()}
    assert got[501] > got[500] > 0
    assert got[501] <= 10.0  # capped scale


def test_hits_two_iterations_hand_graph(spark):
    """Hand graph: hub points at two authorities; iteration math
    checked exactly (auth1 = indegree, hub1 = sum of neighbor auth1,
    auth2 = sum of in-hub1)."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "src long, dst long"
    )
    out = {r["node"]: r for r in graph.hits_scores(edges, iterations=2).collect()}
    # auth1: 10->2, 20->1; hub1: 1 -> auth1(10)+auth1(20)=3, 2 -> 2
    # auth2: 10 -> hub1(1)+hub1(2)=5, 20 -> hub1(1)=3
    assert (out[10]["auth"], out[20]["auth"]) == (5, 3)
    # hub2: 1 -> auth2(10)+auth2(20)=8, 2 -> auth2(10)=5
    assert (out[1]["hub"], out[2]["hub"]) == (8, 5)
    # pure hubs have zero authority and vice versa
    assert out[1]["auth"] == 0 and out[10]["hub"] == 0


def test_triangle_counts_hand_graph_and_cap(spark):
    """K4 minus one edge: nodes 1-2-3 and 2-3-4 form two triangles;
    capping degree to 2 removes the two degree-3 hubs and with them
    every triangle."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r["triangles"] for r in graph.triangle_counts(edges).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}
    assert sum(out.values()) % 3 == 0  # 3 participations per triangle
    capped = graph.triangle_counts(edges, max_degree=2).collect()
    assert capped == []
    # duplicate + reversed edges must not inflate counts
    edges2 = edges.unionByName(
        spark.createDataFrame([(2, 1), (3, 1)], "src long, dst long")
    )
    out2 = {r["node"]: r["triangles"] for r in graph.triangle_counts(edges2).collect()}
    assert out2 == out


def test_clustering_coefficients_hand_graph(spark):
    """K4-minus-one-edge: degree-2 corners have coefficient 1 (their
    single wedge closes), degree-3 centers 2/3; nodes below degree 2
    emit 0."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    out = {r["node"]: r for r in graph.clustering_coefficients(edges).collect()}
    assert (out[1]["degree"], out[1]["coefficient"]) == (2, 1.0)
    assert (out[2]["degree"], out[2]["coefficient"]) == (3, 0.666667)
    assert out[5]["degree"] == 1 and out[5]["coefficient"] == 0.0
    assert out[5]["triangles"] == 0


def test_pagerank_converged_stops_on_delta(spark):
    """The data-driven loop must stop when the exact fixed-point
    max-delta reaches epsilon -- and report the iteration count."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    out = graph.pagerank_converged(
        edges, epsilon=0.01, damp_num=50, damp_den=100, max_iterations=30
    ).collect()
    iters = graph.pagerank_converged.last_iterations
    assert 1 < iters < 30  # converged, data-driven, not the cap
    assert all(r["iterations"] == iters for r in out)
    # a tighter epsilon must take MORE iterations (monotone stopping)
    graph.pagerank_converged(
        edges, epsilon=0.0001, damp_num=50, damp_den=100, max_iterations=60
    ).collect()
    assert graph.pagerank_converged.last_iterations > iters
    # converged ranks are close to the closed-form stationary point
    # of the 3-cycle + feeder graph (node 4 contributes to 1)
    ranks = {r["node"]: r["rank"] for r in out}
    assert ranks[4] == 0.5  # no in-edges: base only
    assert ranks[1] > ranks[2] > ranks[4]


def test_k_core_peels_tail_and_cascades(spark):
    # K4 on {1,2,3,4} plus a chain 4-5-6: k=3 keeps exactly the K4
    # (5 peels first, THEN 6 -- the cascade needs a second round);
    # degrees are measured inside the surviving core
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    out = {
        r["node"]: r["degree"]
        for r in graph.k_core(_edges_df(spark, k4 + chain), k=3).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert graph.k_core.last_rounds <= 4

    # k=2: triangle survives, pendant node peels
    out2 = {
        r["node"]: r["degree"]
        for r in graph.k_core(
            _edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 9)]), k=2
        ).collect()
    }
    assert out2 == {1: 2, 2: 2, 3: 2}

    # k above the max core -> empty result
    assert (
        graph.k_core(_edges_df(spark, [(1, 2), (2, 3)]), k=2).count() == 0
    )


def test_label_propagation_separates_cliques(spark):
    # two 4-cliques joined by a single bridge: LPA must keep them as
    # two communities, each labeled by its smallest member
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = _edges_df(spark, clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)])
    out = {r.node: r.community for r in graph.label_propagation(edges).collect()}
    assert len(out) == 8
    left = {out[n] for n in (1, 2, 3)}
    right = {out[n] for n in (11, 12, 13)}
    assert left == {1} and right == {10}
    # the bridge endpoints join their own clique, not the other side
    assert out[4] == 1 and out[10] == 10


def test_label_propagation_tiebreak_is_smallest_label(spark):
    # a path 1-2-3: node 2 sees labels {1, 3} once each -> picks 1
    out = {
        r.node: r.community
        for r in graph.label_propagation(
            _edges_df(spark, [(1, 2), (2, 3)]), iterations=1
        ).collect()
    }
    assert out[2] == 1
    # endpoints see only node 2's label
    assert out[1] == 2 and out[3] == 2


def test_label_propagation_is_layout_independent(spark):
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    pairs = clique([1, 2, 3, 4]) + clique([7, 8, 9]) + [(3, 7), (5, 6)]
    one = graph.label_propagation(_edges_df(spark, pairs)).collect()
    many = graph.label_propagation(
        _edges_df(spark, pairs).repartition(7)
    ).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_personalized_pagerank_confines_mass_to_seed_reachable(spark):
    # 1 -> 2 -> 3, and an isolated pair 8 <-> 9; seed = {1}
    edges = _edges_df(spark, [(1, 2), (2, 3), (8, 9), (9, 8)])
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r.node: r
        for r in graph.pagerank_personalized(
            edges, seeds, iterations=2
        ).collect()
    }
    # exact fixed-point trace (scale 1e6, damp 85/100):
    # r0: 1 -> 1e6, others 0
    # r1: 1 -> 150000; 2 -> 0 + 85% of 1e6 = 850000; 3 -> 0
    # r2: 1 -> 150000; 2 -> 85% of 150000 = 127500;
    #     3 -> 85% of 850000 = 722500; 8, 9 -> 0 forever
    assert out[1].rank == 0.15 and out[1].is_seed
    assert out[2].rank == 0.1275 and not out[2].is_seed
    assert out[3].rank == 0.7225
    assert out[8].rank == 0.0 and out[9].rank == 0.0


def test_transitive_closure_long_chain_log_rounds(spark):
    """A 64-node chain needs 63 one-hop rounds; doubling must close
    it in ~log2 rounds, and the closure is exactly the i<j pairs."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["src", "dst"]
    )
    clo = graph.transitive_closure(edges)
    assert clo.count() == 64 * 63 // 2
    assert graph.transitive_closure.last_rounds <= 8


def test_scc_bowtie(spark):
    """Broder bow-tie: IN-tail -> SCC core (3-cycle) -> OUT-tail, plus
    a disjoint 2-cycle; exact labels, reach counts per position."""
    from commoncrawl_crawler_spark.operators import graph

    # 0 -> core {1,2,3} cycle -> 4 -> 5 ; disjoint cycle {10, 11}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 11), (11, 10)],
        ["src", "dst"],
    )
    scc = {r["node"]: r["scc_id"]
           for r in graph.strongly_connected_components(edges).collect()}
    assert scc == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 10: 10, 11: 10}
    reach = {r["node"]: r["n_reach"]
             for r in graph.reach_counts(edges).collect()}
    # node 0 reaches everything downstream (1,2,3,4,5); core nodes
    # reach the other two core members + out-tail; tails taper
    assert reach == {0: 5, 1: 4, 2: 4, 3: 4, 4: 1, 5: 0, 10: 1, 11: 1}


def test_bowtie_decomposition(spark):
    """IN-tail -> 3-cycle core -> OUT-tail, disjoint 2-cycle: the
    2-cycle is smaller than the core, so it classifies 'other'."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 11), (11, 10)],
        ["src", "dst"],
    )
    cls = {r["node"]: r["cls"] for r in graph.bowtie_classes(edges).collect()}
    assert cls == {
        0: "in", 1: "core", 2: "core", 3: "core",
        4: "out", 5: "out", 10: "other", 11: "other",
    }


def test_condensation_levels_hand_graph(spark):
    """Diamond of SCCs: source 2-cycle at level 0, two middle
    singletons at level 1, sink 2-cycle at level 2 via BOTH arms --
    longest-path semantics, not BFS distance."""
    from commoncrawl_crawler_spark.operators import graph

    edges = spark.createDataFrame(
        # SCC A = {0,1}; B = {2}; C = {3}; D = {4,5}
        # A->B->D and A->C->D, plus a long arm A->B->C so D's longest
        # path is 3, not 2
        [(0, 1), (1, 0), (0, 2), (2, 3), (0, 3), (3, 4), (2, 4),
         (4, 5), (5, 4)],
        ["src", "dst"],
    )
    rows = {r["scc_id"]: (r["level"], r["n_nodes"])
            for r in graph.condensation_levels(edges).collect()}
    assert rows == {0: (0, 2), 2: (1, 1), 3: (2, 1), 4: (3, 2)}


def test_hyperball_matches_exact_register_model(spark):
    # rebuild the register model independently (hashlib md5, pure
    # python) from EXACT BFS balls and compare est + harmonic -- the
    # lossless-union property the operator's docstring claims
    import collections
    import hashlib

    pairs = [(1, 2), (2, 3), (3, 4), (4, 2), (5, 1), (7, 8)]
    out = {
        r["node"]: (r["ball_est_micro"], r["harmonic_micro"])
        for r in graph.hyperball(_edges_df(spark, pairs)).collect()
    }

    adj = collections.defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
    nodes = sorted({x for e in pairs for x in e})

    def est(members):
        regs = {}
        for u in members:
            h = hashlib.md5(str(u).encode()).hexdigest()
            b = int(h[:15], 16) % 64
            w = int(h[15:30], 16) % (1 << 40)
            regs[b] = max(regs.get(b, 0), 41 - w.bit_length() if w else 41)
        denom = sum(1 << (41 - r) for r in regs.values())
        denom += (64 - len(regs)) * (1 << 41)
        return (709390 * 64 * 64 * (1 << 41)) // denom

    for v in nodes:
        ball, prev, harm, t = {v}, est({v}), 0, 0
        while True:
            t += 1
            grown = set(ball)
            for u in ball:
                grown |= adj.get(u, set())
            if grown == ball:
                break
            ball = grown
            e2 = est(ball)
            harm += (e2 - prev) // t
            prev = e2
        assert out[v] == (prev, harm), f"node {v}"


def test_hyperball_rounds_scale_with_eccentricity(spark):
    # a 12-hop chain stabilizes within one checkpoint cadence past its
    # eccentricity, far below the max_rounds budget
    chain = [(i, i + 1) for i in range(1, 13)]
    graph.hyperball(_edges_df(spark, chain), max_rounds=40)
    assert 12 <= graph.hyperball.last_rounds <= 17


def test_redirect_chains_all_verdict_classes(spark):
    # terminal / chain / cycle / chain-into-cycle / self-loop
    pairs = [(1, 2), (2, 3), (3, 10), (20, 21), (21, 20), (22, 20), (30, 30)]
    out = {
        r["node"]: (r["final_node"], r["hops"], r["on_cycle"])
        for r in graph.resolve_redirect_chains(_edges_df(spark, pairs)).collect()
    }
    assert out[1] == (10, 3, False)
    assert out[2] == (10, 2, False)
    assert out[10] == (10, 0, False)  # terminal
    assert out[20] == (None, None, True)  # cycle member
    assert out[22] == (None, None, True)  # chain INTO a cycle
    assert out[30] == (30, 0, False)  # self-redirect == canonical


def test_redirect_chains_long_chain_log_rounds(spark):
    # 200-hop chain resolves inside the 8-round doubling budget
    # (2^8 = 256 >= 200); a per-hop walk would need 200 rounds
    chain = [(i, i + 1) for i in range(1, 201)]
    out = graph.resolve_redirect_chains(
        _edges_df(spark, chain), max_rounds=8
    ).collect()
    got = {r["node"]: (r["final_node"], r["hops"]) for r in out}
    assert got[1] == (201, 200)
    assert got[200] == (201, 1)
    assert not any(r["on_cycle"] for r in out)


def test_anchor_text_topk_and_totals(spark):
    rows = [
        ("u1", "home", "h1"),
        ("u1", "home", "h2"),
        ("u1", "start", "h1"),
        ("u1", "alpha", "h3"),
        ("u1", "beta", "h3"),
        ("u2", "x", "h1"),
    ]
    df = spark.createDataFrame(
        rows, "url string, anchor string, src_host string"
    )
    out = [tuple(r) for r in graph.anchor_text_summary(df, k=2).collect()]
    # rank 1 = most-used anchor; count ties broken by anchor asc
    assert out == [
        ("u1", 1, "home", 2, 5, 3),
        ("u1", 2, "alpha", 1, 5, 3),
        ("u2", 1, "x", 1, 1, 1),
    ]


def test_opic_matches_hand_model_and_conserves_cash(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (2, 6)]
    out = {
        r["node"]: (r["cash_micro"], r["hist_micro"])
        for r in graph.opic(_edges_df(spark, pairs), iterations=4).collect()
    }

    import collections

    adj = collections.defaultdict(list)
    for s, d in pairs:
        adj[s].append(d)
    nodes = sorted({x for e in pairs for x in e})
    cash = {v: 1_000_000 for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(4):
        recv = collections.defaultdict(int)
        for s in nodes:
            if adj[s]:
                share = cash[s] // len(adj[s])
                for d in adj[s]:
                    recv[d] += share
        dang = sum(cash[v] for v in nodes if not adj[v])
        ds = dang // len(nodes)
        for v in nodes:
            hist[v] += cash[v]
        for v in nodes:
            cash[v] = recv[v] + ds
    assert out == {v: (cash[v], hist[v]) for v in nodes}
    # cash never inflates: truncating DIV only LEAKS micro-units
    assert sum(c for c, _ in out.values()) <= len(nodes) * 1_000_000


def test_hyperball_neighborhood_curve_on_chain(spark):
    # 1 -> 2 -> 3 -> 4: N(t) grows for t=0..3 then the register
    # fixpoint stops the curve; deltas telescope to final - initial
    rows = graph.hyperball_neighborhood(
        _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    ).collect()
    ts = [r["t"] for r in rows]
    assert ts == list(range(len(ts))) and len(ts) == 4
    totals = [r["total_est_micro"] for r in rows]
    assert totals == sorted(totals)  # monotone non-decreasing
    assert sum(r["delta_micro"] for r in rows) == totals[-1] - totals[0]
    assert rows[-1]["reached_90pct"]  # the final row always qualifies
    flagged = [r["t"] for r in rows if r["reached_90pct"]]
    # 90%-reach flags form a suffix of the curve
    assert flagged == list(range(flagged[0], len(ts)))


def test_random_walks_match_md5_model_and_terminate_on_dangling(spark):
    import collections
    import hashlib

    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (2, 9)]  # 9 dangles
    rows = graph.random_walks(
        _edges_df(spark, pairs), walks_per_node=2, steps=4
    ).collect()
    got = collections.defaultdict(list)
    for r in rows:
        got[(r["walk_id"], r["start_node"])].append((r["step"], r["node"]))

    adj = collections.defaultdict(list)
    for s, d in pairs:
        adj[s].append(d)
    for s in adj:
        adj[s].sort()
    for w in (0, 1):
        for start in (1, 2, 3, 4, 9):
            walk, cur = [(0, start)], start
            for t in range(1, 5):
                outs = adj.get(cur)
                if not outs:
                    break
                h = int(
                    hashlib.md5(f"{w}#{cur}#{t}".encode()).hexdigest()[:15],
                    16,
                )
                cur = outs[h % len(outs)]
                walk.append((t, cur))
            assert sorted(got[(w, start)]) == walk, (w, start)
    # the dangling node contributes exactly its step-0 rows
    assert sorted(got[(0, 9)]) == [(0, 9)]
