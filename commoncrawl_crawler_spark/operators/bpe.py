"""Byte-pair-encoding tokenizer: distributed merge learning + encode.

The training-data tier's missing piece between "whitespace tokens"
(textstats.vocabulary) and "token budget planning" (text_mixture_plan)
is an actual subword tokenizer. This module implements classic BPE
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units") the way public implementations do: learn
the top-N most frequent adjacent symbol pairs over the word-frequency
table, merging greedily; encode by replaying the learned merges in
rank order.

Spark-first shape:

- The WORD-FREQUENCY table (not the corpus) is the training input --
  the classic trick that makes BPE training independent of corpus
  size: 100 TB of text collapses to a |vocab|-row table in one
  groupBy, and every merge iteration is a tiny job over that table.
  The word-frequency base is localCheckpoint'd once (loop-invariant).
- Each iteration is a pure Catalyst plan: hoisted symbol-array
  projection (a `transform` lambda re-evaluates captured expressions
  PER ELEMENT, so the regexp_extract_all is projected first), adjacent
  pairs via `transform(sequence(...))` + explode, one partial-agg
  groupBy, and a 1-ROW bounded collect of the argmax pair -- the same
  bounded-collect discipline as the crawler filter rule compile.
- Words travel in a DELIMITED form, one symbol per "(...)" group:
  "hello" -> "(h)(e)(l)(l)(o)(#)" ('#' is the end-of-word marker).
  Merging pair (l, r) is then a plain string replace of "(l)(r)" with
  "(lr)" -- leftmost non-overlapping, exactly BPE's one-pass greedy
  merge, and bit-identical between Spark's `replace` and the SQL
  oracle's `replace` (both scan left-to-right, non-overlapping, so
  "(a)(a)(a)" merges to "(aa)(a)" in both engines). No regex in the
  merge step, hence no lookbehind-support divergence (RE2 vs Java).

Determinism contract (what makes the DuckDB oracle hash-match): pair
ranking ties break by (count DESC, left ASC, right ASC); tokens are
lowercase `[a-z0-9]+` runs; counts are exact bigints.

At 100 TB: one corpus-wide groupBy(word) shuffle builds the frequency
table; every subsequent iteration touches only that table, and encode
is a map-only chain of `replace` Column expressions -- no shuffle, no
Python, whole-stage codegen throughout.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpointing import ckpt_eager, ckpt_lazy, stable_checkpoint
# a symbol is any run of word chars and/or the end-of-word marker
_SYM_RE = r"\(([a-z0-9#]+)\)"
_WORD_RE = "[a-z0-9]+"
END_MARK = "#"


def _delimited(col):
    """'hello' -> '(h)(e)(l)(l)(o)(#)': wrap every char in its own
    group, append the end-of-word marker symbol."""
    return F.concat(
        F.regexp_replace(col, "(.)", "($1)"), F.lit(f"({END_MARK})")
    )


def word_frequencies(documents: DataFrame) -> DataFrame:
    """(w, cnt): the delimited word-frequency table BPE trains on."""
    words = documents.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_WORD_RE), 0
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("cnt")).select(
        _delimited(F.col("word")).alias("w"), "cnt"
    )


def _pair_counts(freqs: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the (possibly partly merged)
    delimited word table: (l, r, c)."""
    arrs = freqs.select(
        # HOIST the symbol array: referencing the extract inside the
        # transform lambda would re-run the regex per element
        F.regexp_extract_all(F.col("w"), F.lit(_SYM_RE), 1).alias("arr"),
        "cnt",
    ).filter(F.size("arr") >= 2)  # also guards sequence(1, size-1)
    pairs = arrs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(arr) - 1),"
                " i -> struct(arr[i - 1] AS l, arr[i] AS r))"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").alias("c")
    )


def _select_safe_batch(
    top: list,
    seen_all: bool,
    alphabet: set[str],
    quota: int,
) -> list[tuple[str, str, int]]:
    """Pick the longest PREFIX of the sorted pair list that is provably
    identical to applying the merges one at a time with a full recount
    between each (the SentencePiece/YouTokenToMe batching, made exact).

    Why each rule is required for batched == serial:

    - *Pairwise symbol-disjoint, including the merged string*: merging
      (l1,r1) only changes counts of pairs touching l1, r1, or the new
      symbol l1+r1.  A disjoint pair's count is bit-identical after the
      merge, so it is still counted correctly without a recount.
    - *Stop at the first conflict; trim selections to count > bound*:
      old pairs sharing a symbol with an applied merge only LOSE
      occurrences, and every pair newly created by a merge has count
      <= the count of some old pair sharing a symbol with that merge.
      All such sharing pairs rank at or below the first conflict in
      the sorted list, so `bound` (the first conflict's count, or the
      collected tail's count when the list was truncated) caps every
      count that can rise between serial steps.  A selection with
      count strictly above `bound` therefore stays the argmax at its
      serial step; ties are unsafe (the tie-break key of a new pair is
      unknowable without a recount), hence strict.
    - *Close the batch when a merged string already exists in the
      alphabet*: if symbol "ab" pre-exists and we merge (a,b), textual
      replacement mints NEW "(ab)" groups, so pairs like (ab, y) can
      GAIN count -- up to old(ab,y) + old(b,y), i.e. 2x the bound --
      so nothing after that merge is provably still the argmax.  The
      colliding merge itself is safe (it was selected before any
      conflict), so it closes the batch rather than being dropped.

    The rank-1 pair is the exact argmax by construction, so the batch
    is never empty when `top` is non-empty.
    """
    used: set[str] = set()
    sel: list[tuple[str, str, int]] = []
    bound: int | None = None
    closed = False
    for row in top:
        l, r, c = row["l"], row["r"], int(row["c"])
        if l in used or r in used or (l + r) in used:
            bound = c  # first (hence highest-count) conflict
            break
        if not closed and len(sel) < quota:
            sel.append((l, r, c))
            used.update((l, r, l + r))
            if (l + r) in alphabet:
                closed = True
    if bound is None and not seen_all:
        bound = int(top[-1]["c"])  # unseen pairs can hide below the tail
    if bound is not None:
        # counts in sel are non-increasing, so this trims to a prefix
        sel = [t for t in sel if t[2] > bound]
    if not sel:
        r0 = top[0]
        sel = [(r0["l"], r0["r"], int(r0["c"]))]
    return sel


def learn_merges(
    documents: DataFrame,
    num_merges: int = 6,
    batch_size: int = 16,
    stats: dict | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn `num_merges` BPE merges; returns
    [(rank, left, right, merged, pair_count), ...] in rank order.

    Batched rounds (round 6 verdict item 1): instead of one Spark job
    per merge, each round collects the top-K pair counts ONCE and
    applies every merge in the provably-safe disjoint prefix (see
    `_select_safe_batch` -- the result is bit-identical to the serial
    one-merge-per-recount algorithm, not an approximation).  A
    production 32k-merge vocabulary then costs ~32k/batch_size rounds
    instead of 32k serial jobs.  Each round collects a bounded K-row
    sample plus re-checkpoints the vocabulary-sized word table, so
    driver state stays O(K + |alphabet|).

    `stats`, when a dict is passed, receives {"rounds": int,
    "batch_sizes": [int, ...]} for round-count assertions.
    """
    base = word_frequencies(documents).transform(ckpt_eager)
    merges: list[tuple[int, str, str, str, int]] = []
    # driver-side alphabet: every symbol ever present.  Seeded from the
    # single-char + end-marker symbols of the delimited words (one
    # bounded collect over the vocabulary-sized table), grown with each
    # merged symbol.  Merges never mint symbols outside this set, and a
    # stale entry (symbol fully consumed) only closes batches early --
    # conservative, never wrong.
    alphabet = {
        r["s"]
        for r in base.select(
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.col("w"), F.lit(_SYM_RE), 1)
                )
            ).alias("s")
        )
        .distinct()
        .collect()
    }
    sample_k = max(4 * batch_size, 32)
    rounds = 0
    batch_sizes: list[int] = []
    cur = base
    while len(merges) < num_merges:
        top = (
            _pair_counts(cur)
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(sample_k)
            .collect()
        )
        if not top:  # degenerate corpus: every word is one symbol
            break
        rounds += 1
        batch = _select_safe_batch(
            top,
            seen_all=len(top) < sample_k,
            alphabet=alphabet,
            quota=num_merges - len(merges),
        )
        batch_sizes.append(len(batch))
        w = F.col("w")
        for l, r, c in batch:
            merges.append((len(merges) + 1, l, r, l + r, c))
            alphabet.add(l + r)
            w = F.replace(w, F.lit(f"({l})({r})"), F.lit(f"({l}{r})"))
        # materialize the (vocab-sized) table so per-round plans stay
        # bounded no matter how many rounds the vocabulary takes
        cur = cur.select(w.alias("w"), "cnt").transform(ckpt_eager)
    if stats is not None:
        stats["rounds"] = rounds
        stats["batch_sizes"] = batch_sizes
    return merges


def merge_table(
    documents: DataFrame,
    num_merges: int = 6,
    merges: list[tuple[int, str, str, str, int]] | None = None,
) -> DataFrame:
    """The learned merge table as a DataFrame:
    (rank, left_sym, right_sym, merged, pair_count). Pass `merges`
    to reuse an already-learned list (the gated pipeline trains once
    per session and feeds both this and encode_token_counts)."""
    spark = documents.sparkSession
    rows = merges if merges is not None else learn_merges(
        documents, num_merges
    )
    return spark.createDataFrame(
        rows,
        "rank int, left_sym string, right_sym string,"
        " merged string, pair_count long",
    ).orderBy("rank")


def apply_merges(col, merges: list[tuple[int, str, str, str, int]]):
    """Chain the learned merges over a delimited-word Column, in rank
    order -- the BPE encode step as pure codegen'd `replace` calls."""
    out = col
    for _, l, r, _, _ in merges:
        out = F.replace(out, F.lit(f"({l})({r})"), F.lit(f"({l}{r})"))
    return out


def encode_token_counts(
    documents: DataFrame,
    num_merges: int = 6,
    merges: list[tuple[int, str, str, str, int]] | None = None,
) -> DataFrame:
    """Per-document BPE token accounting after `num_merges` learned
    merges: (doc_id, n_words, n_tokens). n_tokens counts subword
    symbols including the end-of-word marker symbol each word carries
    (possibly merged into its last subword), so an unmerged word of k
    chars contributes k + 1. Documents with no `[a-z0-9]+` runs emit
    zeros. The token budget this yields feeds text_mixture_plan-style
    planning with a real tokenizer instead of whitespace counts.
    Pass `merges` to reuse an already-learned list."""
    if merges is None:
        merges = learn_merges(documents, num_merges)
    words = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_WORD_RE), 0
            )
        ).alias("word"),
    )
    applied = words.select(
        "doc_id", apply_merges(_delimited(F.col("word")), merges).alias("w")
    )
    counts = applied.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(
            F.size(F.regexp_extract_all(F.col("w"), F.lit(_SYM_RE), 1))
        ).alias("n_tokens"),
    )
    return (
        documents.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def fertility_by_language(
    documents: DataFrame,
    num_merges: int = 6,
    merges: list[tuple[int, str, str, str, int]] | None = None,
) -> DataFrame:
    """Tokenizer-fertility report per language: subword tokens per
    word and characters per token -- the standard check that a
    learned vocabulary serves every language in the mix (high
    fertility = that language pays more sequence length per word than
    the languages the merges were learned on; the multilingual-
    tokenizer fairness metric).

    Ratios are truncating integer micro-units (x * 1e6 DIV y), exact
    on any engine; languages whose documents produce no words report
    NULL. One extra groupBy over encode_token_counts' per-doc output
    -- everything upstream is the shared merge table and the linear
    encode pass.
    """
    enc = encode_token_counts(documents, num_merges, merges=merges)
    j = documents.select("doc_id", "lang", "n_chars").join(enc, "doc_id")
    agg = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum("n_words").cast("bigint").alias("words"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    return agg.select(
        "lang",
        "docs",
        "words",
        "tokens",
        F.when(
            F.col("words") > 0,
            F.expr("tokens * 1000000 DIV words"),
        ).alias("fertility_micro"),
        F.when(
            F.col("tokens") > 0,
            F.expr("chars * 1000000 DIV tokens"),
        ).alias("chars_per_token_micro"),
    ).orderBy("lang")
