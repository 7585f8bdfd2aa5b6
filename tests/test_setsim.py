"""Prefix-filtered set-similarity joins + MinHash clusters.

The prefix filter (AllPairs/PPJoin family) must be OUTPUT-NEUTRAL:
its only job is pruning candidate generation, so the gold standard is
brute-force over all pairs. These tests compute the naive answer in
Python over small synthetic corpora and require exact equality --
pair set, intersection sizes, and integer micro-unit scores.
"""

from __future__ import annotations

import itertools

import pytest

from commoncrawl_crawler_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _shingles(text, w=5):
    ws = text.strip().split()
    if len(ws) < w:
        return None
    return {" ".join(ws[i : i + w]) for i in range(len(ws) - w + 1)}


def _brute_jaccard(texts, num, den, w=5):
    sets = {i: _shingles(t, w) for i, t in enumerate(texts)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if sa is None or sb is None:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * den >= union * num:
            out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


def _brute_containment(texts, num, den, w=5):
    sets = {i: _shingles(t, w) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a == b or sets[a] is None or sets[b] is None:
                continue
            inter = len(sets[a] & sets[b])
            na = len(sets[a])
            if inter * den >= na * num:
                out[(a, b)] = (inter, na, inter * 1_000_000 // na)
    return out


# deterministic pseudo-random corpus with planted structure: pairs of
# near-dup docs (shared long runs), one short doc, one quote inclusion
WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _corpus():
    def gen(seed, n):
        x = seed
        out = []
        for _ in range(n):
            x = (x * 1103515245 + 12345) % (1 << 31)
            out.append(WORDS[x % len(WORDS)])
        return out

    base1 = gen(1, 40)
    base2 = gen(2, 40)
    texts = [
        " ".join(base1),
        " ".join(base1[:35] + gen(3, 5)),       # near-dup of 0
        " ".join(base2),
        " ".join(gen(4, 12) + base2 + gen(5, 3)),  # contains 2
        " ".join(gen(6, 40)),                   # unrelated
        "tiny doc",                             # < 5 words: out of scope
        " ".join(gen(7, 25)),
    ]
    return texts


def test_setsim_prefix_matches_brute_force(spark):
    texts = _corpus()
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size, r.jaccard_micro)
        for r in dedup.setsim_prefix_pairs(
            _docs(spark, texts), threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == _brute_jaccard(texts, 1, 2)
    assert got  # the planted near-dup pair must actually be found


@pytest.mark.parametrize("num,den", [(3, 10), (4, 5)])
def test_setsim_prefix_other_thresholds(spark, num, den):
    texts = _corpus()
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size, r.jaccard_micro)
        for r in dedup.setsim_prefix_pairs(
            _docs(spark, texts), threshold_num=num, threshold_den=den
        ).collect()
    }
    assert got == _brute_jaccard(texts, num, den)


def test_setsim_threshold_boundary_is_inclusive(spark):
    # two 6-word docs differing in the last word: shingle sets of
    # size 2 each, sharing 1 -> jaccard exactly 1/3
    texts = ["a b c d e f", "a b c d e g"]
    got = dedup.setsim_prefix_pairs(
        _docs(spark, texts), threshold_num=1, threshold_den=3
    ).collect()
    assert [(r.doc_a, r.doc_b, r.inter_size, r.union_size) for r in got] == [
        (0, 1, 1, 3)
    ]
    # one notch tighter excludes it
    assert (
        dedup.setsim_prefix_pairs(
            _docs(spark, texts), threshold_num=34, threshold_den=100
        ).count()
        == 0
    )


def test_containment_matches_brute_force_and_finds_quote(spark):
    texts = _corpus()
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.size_a, r.containment_micro)
        for r in dedup.containment_pairs(
            _docs(spark, texts), threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == _brute_containment(texts, 1, 2)
    # doc 2 is verbatim inside doc 3: full containment, directed
    assert got[(2, 3)][2] == 1_000_000
    assert (3, 2) not in got or got[(3, 2)][2] < 1_000_000


def test_short_documents_are_out_of_scope(spark):
    texts = ["one two three four", "one two three four", "a b c d e f g"]
    assert (
        dedup.setsim_prefix_pairs(_docs(spark, texts)).count() == 0
    )
    assert dedup.containment_pairs(_docs(spark, texts)).count() == 0


def _uf_components(n, pairs):
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully so every node points at its root
    return {i: find(i) for i in range(n)}


def test_minhash_clusters_are_transitive_and_complete(spark):
    base = _corpus()
    # chain: X ~ Y ~ Z by long shared runs (X,Z need not match directly)
    words = base[0].split()
    x = " ".join(words)
    y = " ".join(words[:30] + ["q1", "q2", "q3"] + words[30:33])
    z = " ".join(words[:28] + ["q4", "q5"] + words[28:30])
    # the isolate uses a DISJOINT vocabulary: zero shingle overlap, so
    # no minhash value can agree except by md5 collision
    iso = " ".join(f"w{i % 9}x{i % 7}" for i in range(40))
    texts = [x, y, z, iso]
    docs = _docs(spark, texts)
    labels = {
        r.doc_id: r.cluster
        for r in dedup.md5_minhash_clusters(docs, min_matching=8).collect()
    }
    # every doc labeled exactly once
    assert sorted(labels) == [0, 1, 2, 3]
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.md5_minhash_pairs(docs, min_matching=8).collect()
    }
    # labels must be EXACTLY the connected components of the pair graph
    assert labels == _uf_components(len(texts), pairs)
    # and the planted chain actually merged into one cluster
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _names_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def _brute_editdist(names, k):
    uniq = sorted({n for n in names if len(n) > k})
    return {
        (a, b): _lev(a, b)
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= k
    }


@pytest.mark.parametrize("k", [1, 2])
def test_passjoin_matches_brute_force(spark, k):
    # adversarial mix: equal lengths, off-by-k lengths, shared
    # prefixes/suffixes, edits at segment boundaries, duplicates
    names = [
        "example.com",
        "exampel.com",     # transposition = 2 substit-ish edits
        "examples.com",    # insertion
        "exmple.com",      # deletion
        "sample.com",
        "sampel.org",
        "abc",
        "abd",
        "ab",              # length <= 2: out of scope at k=2
        "xexample.com",
        "example.com",     # duplicate row must not duplicate pairs
        "wholly-unrelated-host.net",
    ]
    got = {
        (r.name_a, r.name_b): r.distance
        for r in dedup.editdist_pairs(_names_df(spark, names), k=k).collect()
    }
    assert got == _brute_editdist(names, k)
    assert got  # sanity: the planted near-misses were found


def test_passjoin_boundary_distance_is_inclusive(spark):
    # distance exactly k must be reported, k+1 must not
    names = ["abcdefgh", "abXdeYgh", "QbXdeYgh"]
    got = {
        (r.name_a, r.name_b): r.distance
        for r in dedup.editdist_pairs(_names_df(spark, names), k=2).collect()
    }
    assert got[("abXdeYgh", "abcdefgh")] == 2  # subs at positions 3, 6
    assert got[("QbXdeYgh", "abXdeYgh")] == 1
    assert ("QbXdeYgh", "abcdefgh") not in got  # distance 3


def test_minhash_quality_report_matches_independent_model(spark):
    import hashlib

    texts = _corpus() + [" ".join(_corpus()[0].split()[:36] + ["zz"] * 4)]
    docs = _docs(spark, texts)

    # independent Python model of the whole report
    def shingles3(t):
        ws = [w for w in t.lower().split() if w]
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    M = 2305843009213693951
    perms = [(((1000003 * (p + 1)) % (1 << 31)) | 1, 777767777 * (p + 1) + 9176)
             for p in range(16)]

    def sig(toks):
        bases = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 2147483647
            for t in toks
        ]
        return [min((b * a + c) % M for b in bases) for a, c in perms]

    sets = {i: shingles3(t) for i, t in enumerate(texts)}
    sets = {i: s for i, s in sets.items() if s}
    sigs = {i: sig(s) for i, s in sets.items()}
    ids = sorted(sets)
    exact, sketch = set(), set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if i * 16 >= u * 13:
                exact.add((a, b))
            shares_band = any(
                sigs[a][2 * k : 2 * k + 2] == sigs[b][2 * k : 2 * k + 2]
                for k in range(8)
            )
            matching = sum(1 for p in range(16) if sigs[a][p] == sigs[b][p])
            if shares_band and matching >= 13:
                sketch.add((a, b))
    tp = len(exact & sketch)
    fp = len(sketch - exact)
    fn = len(exact - sketch)

    row = dedup.minhash_quality_report(docs).collect()[0]
    assert (row.tp, row.fp, row.fn) == (tp, fp, fn)
    if tp + fp:
        assert row.precision_micro == tp * 1_000_000 // (tp + fp)
    if tp + fn:
        assert row.recall_micro == tp * 1_000_000 // (tp + fn)
    assert tp > 0  # the planted near-dup must land in both sides


def test_zipf_profile_matches_integer_model(spark):
    import math

    from commoncrawl_crawler_spark.operators import textstats

    # planted frequencies: a:8 b:4 c:2 d:1 (one doc, order scrambled)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    row = textstats.corpus_zipf_profile(_docs(spark, [text])).collect()[0]
    assert (row.total_tokens, row.vocab_size, row.hapax_count) == (15, 4, 1)

    pairs = [(1, 8), (2, 4), (3, 2), (4, 1)]  # (rank, freq)
    mk = lambda v: math.floor(math.log(v) * 1e6 + 0.5)
    xs = [mk(r) for r, _ in pairs]
    ys = [mk(f) for _, f in pairs]
    n = len(pairs)
    numer = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    denom = n * sum(x * x for x in xs) - sum(xs) ** 2
    expected = (
        (numer * 1_000_000) // denom
        if numer >= 0
        else -((-numer * 1_000_000) // denom)
    )
    assert row.zipf_slope_micro == expected
    assert -1_600_000 < row.zipf_slope_micro < -1_200_000  # ~ -3/2 here

    # degenerate single-term vocabulary: slope undefined
    row1 = textstats.corpus_zipf_profile(_docs(spark, ["x x x"])).collect()[0]
    assert row1.zipf_slope_micro is None
    assert (row1.total_tokens, row1.vocab_size) == (3, 1)


def test_heaps_profile_growth_curve(spark):
    from commoncrawl_crawler_spark.operators import textstats

    # doc ids 0..9; new vocab appears only in docs 0, 5, 9
    texts = (
        ["a b c"] + ["a b"] * 4 + ["d e"] + ["a"] * 3 + ["f g h"]
    )
    rows = textstats.corpus_heaps_profile(
        _docs(spark, texts), checkpoints=3
    ).collect()
    # range 0..9 -> thresholds 3, 6, 9
    assert [(r.checkpoint, r.doc_threshold) for r in rows] == [
        (1, 3), (2, 6), (3, 9),
    ]
    by_cp = {r.checkpoint: r for r in rows}
    assert (by_cp[1].docs_seen, by_cp[1].vocab_seen) == (4, 3)  # a b c
    assert (by_cp[2].docs_seen, by_cp[2].vocab_seen) == (7, 5)  # + d e
    assert (by_cp[3].docs_seen, by_cp[3].vocab_seen) == (10, 8)  # + f g h
    assert by_cp[3].tokens_seen == sum(len(t.split()) for t in texts)
    # monotone growth
    assert by_cp[1].vocab_seen <= by_cp[2].vocab_seen <= by_cp[3].vocab_seen
