"""String matchers: prefix/suffix/trie-style multi-pattern matching.

Reference (SURVEY.md section 2.8): util/PrefixStringMatcher.java,
SuffixStringMatcher.java, TrieStringMatcher.java (~500 LoC of
hand-built tries) back the crawler's URL filter family
(service/crawler/filters/).

Spark-first: small pattern sets compile to ONE disjunctive Column
expression (codegen-friendly, short-circuiting); the matched-pattern
variant folds `when` chains ordered longest-first, which reproduces
trie longest-match semantics without any trie.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F


def matches_any_prefix(col: Column, prefixes: list[str]) -> Column:
    """True if the value starts with any pattern (PrefixStringMatcher)."""
    return reduce(
        lambda a, b: a | b,
        [col.startswith(p) for p in prefixes],
        F.lit(False),
    )


def matches_any_suffix(col: Column, suffixes: list[str]) -> Column:
    return reduce(
        lambda a, b: a | b,
        [col.endswith(s) for s in suffixes],
        F.lit(False),
    )


def longest_prefix_match(col: Column, prefixes: list[str]) -> Column:
    """The longest matching prefix, else NULL (trie longest-match).

    A `when` chain with the longest pattern outermost evaluates
    exactly like a trie walk's deepest match; for pattern sets small
    enough to broadcast (filter lists always are) this beats shipping
    a trie to every task. Built shortest-first because each wrap
    becomes the new outermost branch.
    """
    expr: Column = F.lit(None).cast("string")
    for p in sorted(prefixes, key=len):
        expr = F.when(col.startswith(p), F.lit(p)).otherwise(expr)
    return expr


def domain_suffix_match(col: Column, suffixes: list[str]) -> Column:
    """Host-aware suffix match: '.example.com' patterns match
    subdomains but 'example.com' also matches itself exactly --
    the SuperDomainFilter convention."""
    checks = []
    for s in suffixes:
        dotted = s if s.startswith(".") else "." + s
        bare = s.lstrip(".")
        checks.append(col.endswith(dotted) | (col == bare))
    return reduce(lambda a, b: a | b, checks, F.lit(False))
