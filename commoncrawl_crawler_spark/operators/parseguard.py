"""Corruption guard for binary-parser entry points.

A crawl corpus delivers truncated, bit-flipped and adversarial
bytes.  The parser contract this package promises (and the
mutation-fuzz suite enforces, tests/test_fuzz_parsers.py) is:
return a value, or raise a NAMED error (ValueError /
NotImplementedError) -- never leak an implementation exception
(IndexError out of a bounds walk, struct.error out of an unpack,
zlib.error out of a filter) and never hang.

`guard(fmt)` wraps a parse entry point: ValueError and
NotImplementedError pass through untouched (they ARE the contract);
the low-level exception types a corrupt input can provoke are
re-raised as ValueError naming the format and the original cause.
Everything else (programming errors, MemoryError, RecursionError)
still propagates -- masking those would hide real bugs.
"""

from __future__ import annotations

import binascii
import functools
import struct
import zlib
from collections.abc import Callable

_CORRUPTION_EXCS = (
    IndexError,
    KeyError,
    OverflowError,
    EOFError,
    UnicodeDecodeError,
    struct.error,
    zlib.error,
    binascii.Error,
)


def guard(fmt: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _CORRUPTION_EXCS as exc:
                raise ValueError(
                    f"corrupt {fmt}: {type(exc).__name__}: {exc}"
                ) from exc

        return wrapped

    return deco
