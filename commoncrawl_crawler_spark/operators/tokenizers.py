"""WordPiece and Unigram-LM tokenizers (inference at corpus scale).

Training-data tier: together with `operators/bpe.py` (BPE train +
encode) this covers the three subword-tokenizer families production
models use -- BPE (GPT lineage), WordPiece greedy longest-match-first
(BERT lineage; Wu et al. 2016), and Unigram-LM Viterbi segmentation
(SentencePiece; Kudo 2018). A 100 TB pipeline runs tokenizer
INFERENCE corpus-wide (token budgeting, fertility audits, sequence
packing); training happens once on a bounded sample -- so inference
is what must scale.

Spark-first shape (the same trick as BPE): tokenize the DISTINCT
WORD table, never the corpus -- 100 TB of text collapses to a
|vocab|-row word table in one groupBy, the per-word segmentation runs
in an Arrow-batched kernel over that small table with the vocab
broadcast, and the corpus only ever joins the (word -> pieces)
result back by word (broadcastable: distinct words ≪ corpus rows).

Determinism contracts:
- WordPiece: greedy longest-match-first, '##' continuation prefix,
  whole-word [UNK] when any position has no match (the published
  BERT behavior).
- Unigram: Viterbi max-score path over integer micro-scores
  (score x 1e6 as bigint -- no float comparisons anywhere); ties
  break toward FEWER pieces, then the lexicographically smallest
  piece string, so the path is unique and engine-independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WORDPIECE_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("pieces", StringType()),  # space-joined
        StructField("n_pieces", IntegerType()),
        StructField("is_unk", IntegerType()),
    ]
)


def wordpiece_word(word: str, vocab: frozenset[str]) -> list[str] | None:
    """Greedy longest-match-first WordPiece segmentation of one word;
    None = whole-word [UNK] (some position had no matching piece)."""
    pieces: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        cur = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                cur = cand
                break
            end -= 1
        if cur is None:
            return None
        pieces.append(cur)
        pos = end
    return pieces


def wordpiece_encode(
    words: DataFrame, vocab: list[str], word_col: str = "word"
) -> DataFrame:
    """Segment a distinct-word table with WordPiece. The vocab ships
    in the serialized kernel closure (tokenizer vocabularies are
    10k-100k entries -- broadcast-sized by construction)."""
    vset = frozenset(vocab)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in WORDPIECE_SCHEMA.fields}
            for w in pdf[word_col]:
                seg = wordpiece_word(str(w), vset)
                rows["word"].append(str(w))
                if seg is None:
                    rows["pieces"].append("[UNK]")
                    rows["n_pieces"].append(1)
                    rows["is_unk"].append(1)
                else:
                    rows["pieces"].append(" ".join(seg))
                    rows["n_pieces"].append(len(seg))
                    rows["is_unk"].append(0)
            yield pd.DataFrame(rows)

    return words.select(F.col(word_col).alias(word_col)).mapInPandas(
        _encode, WORDPIECE_SCHEMA
    )


UNIGRAM_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("pieces", StringType()),
        StructField("n_pieces", IntegerType()),
        StructField("score_micro", LongType()),
    ]
)


def unigram_viterbi_word(
    word: str, scores: dict[str, int], max_piece_len: int | None = None
) -> tuple[list[str], int] | None:
    """Viterbi max-score segmentation under integer micro-scores.
    Returns (pieces, total_score) or None when no full segmentation
    exists. Ties break to fewer pieces, then the lexicographically
    smallest space-joined piece string -- a total order, so the
    winning path is unique.

    The inner loop only looks back `max_piece_len` characters; when
    not supplied it is derived from the score table (so every vocab
    piece is reachable -- no silent length cap).  Batch callers should
    compute it once per vocab and pass it in."""
    n = len(word)
    if max_piece_len is None:
        max_piece_len = max((len(p) for p in scores), default=1)
    # best[i] = (score, -n_pieces, neg_lex_key?, pieces) for word[:i]
    best: list[tuple[int, int, str, list[str]] | None] = [None] * (n + 1)
    best[0] = (0, 0, "", [])
    for i in range(1, n + 1):
        cand_best = None
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            sc = scores.get(piece)
            if sc is None:
                continue
            score = best[j][0] + sc
            pieces = best[j][3] + [piece]
            key = (score, -len(pieces), " ".join(pieces))
            if cand_best is None:
                cand_best = (key, pieces)
            else:
                ck = cand_best[0]
                # higher score, then fewer pieces, then SMALLEST
                # joined string (note: string compares inverted)
                if (key[0], key[1]) > (ck[0], ck[1]) or (
                    (key[0], key[1]) == (ck[0], ck[1]) and key[2] < ck[2]
                ):
                    cand_best = (key, pieces)
        if cand_best is not None:
            k, p = cand_best
            best[i] = (k[0], k[1], k[2], p)
    if best[n] is None:
        return None
    return best[n][3], best[n][0]


def unigram_encode(
    words: DataFrame, vocab_scores: dict[str, int], word_col: str = "word"
) -> DataFrame:
    """Segment a distinct-word table with Unigram-LM Viterbi.
    Unsegmentable words emit pieces='[UNK]' with score 0."""

    max_len = max((len(p) for p in vocab_scores), default=1)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in UNIGRAM_SCHEMA.fields}
            for w in pdf[word_col]:
                out = unigram_viterbi_word(str(w), vocab_scores, max_len)
                rows["word"].append(str(w))
                if out is None:
                    rows["pieces"].append("[UNK]")
                    rows["n_pieces"].append(1)
                    rows["score_micro"].append(0)
                else:
                    pieces, score = out
                    rows["pieces"].append(" ".join(pieces))
                    rows["n_pieces"].append(len(pieces))
                    rows["score_micro"].append(score)
            yield pd.DataFrame(rows)

    return words.select(F.col(word_col).alias(word_col)).mapInPandas(
        _encode, UNIGRAM_SCHEMA
    )


def tokenize_corpus(
    documents: DataFrame,
    word_pieces: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Join a (word -> n_pieces) table back onto the corpus and
    aggregate per-document token counts -- the corpus-wide step. The
    piece table is the BROADCAST side (distinct words ≪ corpus);
    unknown-to-the-table words count as 1 piece ([UNK])."""
    words = documents.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("word"),
    )
    aggs = [
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.coalesce("n_pieces", F.lit(1)))
        .cast("long")
        .alias("n_tokens"),
    ]
    if "is_unk" in word_pieces.columns:
        aggs.append(
            F.sum(F.coalesce("is_unk", F.lit(1)))
            .cast("long")
            .alias("n_unk_words")
        )
    return (
        words.join(F.broadcast(word_pieces), "word", "left")
        .groupBy("doc_id")
        .agg(*aggs)
        .orderBy("doc_id")
    )


def unigram_train_hard_em(
    word_freqs: DataFrame,
    seed_vocab: list[str],
    rounds: int = 2,
) -> DataFrame:
    """Hard-EM Unigram-LM training (the Viterbi-count variant of
    Kudo 2018's EM): each round segments every DISTINCT word under
    the current integer micro-scores, accumulates frequency-weighted
    piece counts, and re-estimates scores as
    ``q(count+1) - q(total+V)`` (the add-one floor keeps every seed
    piece alive and the ln-over-integers quantization is the
    stupid-backoff engine-parity discipline). Seed scores are uniform,
    so round 1 prefers the FEWEST pieces with the documented
    lexicographic tie-break -- fully deterministic end to end.

    Scale shape: the corpus collapses to the word-frequency table
    (one groupBy); each round is one Arrow-batched segmentation pass
    over DISTINCT words plus one piece-count aggregation; the only
    driver state is the piece->count table (vocabulary-bounded, the
    BPE merge-loop collect discipline). Unsegmentable words are
    excluded from counts (they would be [UNK] at encode time).

    Returns (piece, count) for pieces used by the final segmentation,
    with ``count`` = sum of word frequencies times per-word usage.

    Unlike BPE merge learning (batched in `bpe.learn_merges`), EM
    rounds are inherently sequential -- round i+1's segmentation needs
    round i's scores -- and the round count is a small parameter (2-10)
    rather than the vocabulary size, so the per-round bounded collect
    is the right shape.  Two cost guards: the collect is the
    vocabulary-sized piece table (never corpus rows), and the loop
    exits early once the score table reaches a fixed point (a further
    round would re-segment identically).
    """
    import math

    def q(n: int) -> int:
        return int(math.floor(math.log(n) * 1e6 + 0.5))

    v = len(seed_vocab)
    scores = {p: -5_000_000 for p in seed_vocab}
    counts_df = None
    for _ in range(rounds):
        sc = dict(scores)  # capture for the closure

        max_len = max((len(p) for p in sc), default=1)

        def _segment(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_w, out_p, out_n = [], [], []
                for w, f in zip(pdf["word"], pdf["freq"]):
                    seg = unigram_viterbi_word(str(w), sc, max_len)
                    if seg is None:
                        continue
                    pieces, _ = seg
                    for p in pieces:
                        out_w.append(str(w))
                        out_p.append(p)
                        out_n.append(int(f))
                yield pd.DataFrame(
                    {"word": out_w, "piece": out_p, "freq": out_n}
                )

        exploded = word_freqs.select("word", "freq").mapInPandas(
            _segment,
            StructType(
                [
                    StructField("word", StringType()),
                    StructField("piece", StringType()),
                    StructField("freq", LongType()),
                ]
            ),
        )
        counts_df = (
            exploded.groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("count"))
            .orderBy("piece")
        )
        # vocabulary-bounded collect (the BPE merge-round discipline)
        counts = {r["piece"]: int(r["count"]) for r in counts_df.collect()}
        total = sum(counts.values())
        scores = {
            p: q(counts.get(p, 0) + 1) - q(total + v) for p in seed_vocab
        }
        if scores == sc:  # fixed point: another round segments identically
            break
    return counts_df
