"""Interpolated Kneser-Ney trigram scoring vs an independent
reference implementation (pure Python over the same formulas, written
from the Chen & Goodman description, not from the operator)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from commoncrawl_crawler_spark.operators import textstats

D = 0.75


def _reference_kn(train_texts, heldout_texts):
    tri = Counter()
    bg_types = set()
    vocab = set()
    for t in train_texts:
        toks = [w for w in t.lower().strip().split() if w]
        vocab.update(toks)
        for i in range(len(toks) - 2):
            tri[(toks[i], toks[i + 1], toks[i + 2])] += 1
        for i in range(len(toks) - 1):
            bg_types.add((toks[i], toks[i + 1]))
    c12 = Counter()
    n1p12 = Counter()
    mid_num = defaultdict(set)
    mid_types = Counter()
    mid_cont = defaultdict(set)
    for (u, v, w), c in tri.items():
        c12[(u, v)] += c
        n1p12[(u, v)] += 1
        mid_num[(v, w)].add(u)
        mid_types[v] += 1
        mid_cont[v].add(w)
    n1p_dotw = Counter()
    for (p, w) in bg_types:
        n1p_dotw[w] += 1
    n1pdd = len(bg_types)
    vv = len(vocab)

    def p_kn(u, v, w):
        p1 = (n1p_dotw.get(w, 0) + 1) / (n1pdd + vv + 1)
        if mid_types.get(v):
            p2 = max(len(mid_num.get((v, w), ())) - D, 0.0) / mid_types[v] + (
                (D * len(mid_cont[v])) / mid_types[v]
            ) * p1
        else:
            p2 = p1
        if c12.get((u, v)):
            return max(tri.get((u, v, w), 0) - D, 0.0) / c12[(u, v)] + (
                (D * n1p12[(u, v)]) / c12[(u, v)]
            ) * p2
        return p2

    out = {}
    for doc_id, t in heldout_texts:
        toks = [w for w in t.lower().strip().split() if w]
        s = 0
        n = 0
        for i in range(len(toks) - 2):
            p = p_kn(toks[i], toks[i + 1], toks[i + 2])
            pm = max(int(math.floor(p * 1e9 + 0.5)), 1)
            s += int(math.floor(math.log(pm) * 1e6 + 0.5)) - 20723266
            n += 1
        if n:
            out[doc_id] = (n, -s, (-s) // n)
    return out


def test_kneser_ney_matches_reference(spark):
    train = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "a dog sat on a log",
        "the dog sat on the mat",
    ]
    heldout = [
        (1, "the cat sat on a log"),
        (3, "a cat sat on the rug"),
        (5, "unknown words only here"),
    ]
    rows = [(2 * i, t) for i, t in enumerate(train)] + [
        (k, t) for k, t in heldout
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_scored, r.neg_logprob_micro, r.avg_surprisal_micro)
        for r in textstats.kneser_ney_scores(docs).collect()
    }
    ref = _reference_kn(train, heldout)
    assert got == ref


def test_kneser_ney_probabilities_bounded(spark):
    # surprisal of every scored trigram is positive (p < 1) and the
    # unknown-word floor keeps it finite
    docs = spark.createDataFrame(
        [(0, "a b c a b c a b d"), (1, "zz yy xx ww")],
        "doc_id long, text string",
    )
    rows = textstats.kneser_ney_scores(docs).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1
    assert rows[0].n_scored == 2
    assert rows[0].neg_logprob_micro > 0
