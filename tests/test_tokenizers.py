"""WordPiece greedy and Unigram-LM Viterbi tokenizers.

The gate oracles in __spark_entry__ are golden tables; this file is
where they're derived: the DP Viterbi is checked against EXHAUSTIVE
segmentation enumeration over the exact gate fixture, and the greedy
WordPiece against the published BERT behavior.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import tokenizers as T

GATE_WORDS = [
    "the", "thing", "running", "under", "tested", "stable",
    "thunder", "ingest", "hello", "big", "dog", "xyz",
]
WP_VOCAB = (
    list("abdeghilnorstu")
    + ["##" + c for c in "abdeghilnorstu"]
    + ["th", "the", "un", "##ing", "##er", "##ed", "##le", "##st"]
)
UNI_SCORES = {
    **{c: -5_000_000 for c in "abdeghilnorstu"},
    "th": -6_000_000, "the": -7_000_000, "ing": -6_500_000,
    "un": -6_200_000, "er": -6_000_000, "ed": -6_100_000,
    "st": -6_300_000, "run": -8_000_000, "ning": -9_000_000,
    "der": -8_500_000, "hello": -12_000_000, "ll": -7_000_000,
}


def _brute_unigram(word: str, scores: dict[str, int]):
    """Independent oracle: enumerate EVERY segmentation, apply the
    documented tie-break (score desc, fewer pieces, smallest joined
    string)."""
    n = len(word)
    best = None
    for k in range(n):
        for cuts in combinations(range(1, n), k):
            pos = [0, *cuts, n]
            pieces = [word[pos[i] : pos[i + 1]] for i in range(len(pos) - 1)]
            if any(p not in scores for p in pieces):
                continue
            sc = sum(scores[p] for p in pieces)
            joined = " ".join(pieces)
            cand = (sc, -len(pieces), joined, pieces)
            if (
                best is None
                or (cand[0], cand[1]) > (best[0], best[1])
                or ((cand[0], cand[1]) == (best[0], best[1]) and joined < best[2])
            ):
                best = cand
    return None if best is None else (best[3], best[0])


def test_unigram_dp_matches_exhaustive_on_gate_fixture():
    for w in GATE_WORDS:
        assert T.unigram_viterbi_word(w, UNI_SCORES) == _brute_unigram(
            w, UNI_SCORES
        ), w


def test_unigram_dp_matches_exhaustive_randomized():
    import random

    rng = random.Random(7)
    alphabet = "abc"
    for _ in range(60):
        vocab = {c: -rng.randint(1, 9) * 1_000_000 for c in alphabet}
        for _ in range(rng.randint(2, 6)):
            ln = rng.randint(2, 3)
            piece = "".join(rng.choice(alphabet) for _ in range(ln))
            vocab[piece] = -rng.randint(1, 25) * 1_000_000
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        assert T.unigram_viterbi_word(word, vocab) == _brute_unigram(
            word, vocab
        ), (word, vocab)


def test_wordpiece_published_example():
    # the canonical BERT README example: unaffable -> un ##aff ##able
    vocab = frozenset(["un", "##aff", "##able", "u", "##n"])
    assert T.wordpiece_word("unaffable", vocab) == ["un", "##aff", "##able"]


def test_wordpiece_longest_match_first_and_unk():
    vocab = frozenset(["a", "ab", "abc", "##d", "##cd"])
    # longest match at position 0 is 'abc', then ##d
    assert T.wordpiece_word("abcd", vocab) == ["abc", "##d"]
    # no piece for 'x' anywhere -> whole-word UNK (None)
    assert T.wordpiece_word("abxd", vocab) is None
    # continuation pieces never match at position 0
    assert T.wordpiece_word("cd", frozenset(["##cd", "c", "##d"])) == [
        "c",
        "##d",
    ]


def test_wordpiece_gate_golden_rows():
    expect = {
        "the": "the",
        "thing": "th ##ing",
        "running": "r ##u ##n ##n ##ing",
        "under": "un ##d ##er",
        "tested": "t ##e ##st ##ed",
        "stable": "s ##t ##a ##b ##le",
        "thunder": "th ##u ##n ##d ##er",
        "ingest": "i ##n ##g ##e ##st",
        "hello": "h ##e ##l ##l ##o",
        "big": "b ##i ##g",
        "dog": "d ##o ##g",
    }
    vs = frozenset(WP_VOCAB)
    for w, joined in expect.items():
        assert " ".join(T.wordpiece_word(w, vs)) == joined, w
    assert T.wordpiece_word("xyz", vs) is None


def test_spark_encoders_and_corpus_join(spark):
    words = spark.createDataFrame(
        [(w,) for w in GATE_WORDS], "word string"
    )
    wp = {r.word: r for r in T.wordpiece_encode(words, WP_VOCAB).collect()}
    assert wp["thing"].pieces == "th ##ing" and wp["thing"].n_pieces == 2
    assert wp["xyz"].pieces == "[UNK]" and wp["xyz"].is_unk == 1
    uni = {r.word: r for r in T.unigram_encode(words, UNI_SCORES).collect()}
    assert uni["running"].pieces == "run ning"
    assert uni["running"].score_micro == -17_000_000

    docs = spark.createDataFrame(
        [(1, "the thing"), (2, "xyz hello UNKWORD")],
        "doc_id long, text string",
    )
    pieces = T.wordpiece_encode(
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("word")
        ).distinct(),
        WP_VOCAB,
    )
    out = {r.doc_id: r for r in T.tokenize_corpus(docs, pieces).collect()}
    assert out[1].n_words == 2 and out[1].n_tokens == 1 + 2  # the + thing
    # xyz -> UNK(1), hello -> 5 pieces, unkword -> UNK(1)
    assert out[2].n_words == 3 and out[2].n_tokens == 1 + 5 + 1
    assert out[2].n_unk_words == 2


def test_unigram_hard_em_reference_and_stability(spark):
    """The trainer's converged segmentations equal an independent
    offline EM over the same fixture, and the structure is stable
    across corpus sizes (the gate-oracle precondition)."""
    import math
    from collections import Counter

    seed = list("abdeghilnorstu") + [
        "th", "the", "ing", "un", "er", "ed", "st", "run", "ning",
        "der", "hello", "ll",
    ]

    def offline(n_docs, rounds=2):
        freqs = {
            w: n_docs // 12 + (1 if k < n_docs % 12 else 0)
            for k, w in enumerate(GATE_WORDS)
        }
        scores = {p: -5_000_000 for p in seed}
        counts = Counter()
        for _ in range(rounds):
            counts = Counter()
            for w, f in freqs.items():
                out = T.unigram_viterbi_word(w, scores)
                if out is None:
                    continue
                for p in out[0]:
                    counts[p] += f
            total = sum(counts.values())
            scores = {
                p: int(math.floor(math.log(counts.get(p, 0) + 1) * 1e6 + 0.5))
                - int(math.floor(math.log(total + len(seed)) * 1e6 + 0.5))
                for p in seed
            }
        return counts

    ref = offline(96)
    assert offline(960) == Counter(
        {p: c * 10 for p, c in ref.items()}
    )  # structure identical, counts scale

    rows = [(i, GATE_WORDS[i % 12]) for i in range(96)]
    freqs = (
        spark.createDataFrame(rows, "doc_id long, word string")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    got = {
        r.piece: r["count"]
        for r in T.unigram_train_hard_em(freqs, seed, rounds=2).collect()
    }
    assert got == dict(ref)


# ---- round-7: derived Viterbi window + EM fixed-point exit -----------


def test_unigram_viterbi_matches_long_pieces():
    """A vocab piece longer than 32 chars must match (the old code
    silently capped the lookback window at 32)."""
    long_piece = "a" * 40
    scores = {long_piece: -1_000_000, "a": -3_000_000}
    out = T.unigram_viterbi_word(long_piece, scores)
    assert out is not None
    pieces, score = out
    assert pieces == [long_piece]
    assert score == -1_000_000


def test_unigram_viterbi_window_param_consistent():
    scores = {"ab": -100, "a": -300, "b": -300, "abab": -150}
    explicit = T.unigram_viterbi_word("abab", scores, 4)
    derived = T.unigram_viterbi_word("abab", scores)
    assert explicit == derived


def test_unigram_hard_em_fixed_point_early_exit(spark):
    """Once scores stop changing, extra rounds must not change the
    result (the early-exit makes rounds=50 cost the same as the
    convergence round count)."""
    wf = spark.createDataFrame(
        [("abc", 10), ("ab", 5), ("c", 3)], "word string, freq long"
    )
    seed = ["a", "b", "c", "ab", "bc", "abc"]
    r3 = {
        (r["piece"], r["count"])
        for r in T.unigram_train_hard_em(wf, seed, rounds=3).collect()
    }
    r50 = {
        (r["piece"], r["count"])
        for r in T.unigram_train_hard_em(wf, seed, rounds=50).collect()
    }
    assert r3 == r50
