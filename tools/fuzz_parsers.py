"""Mutation-fuzz driver for the binary-parser contract.

Usage:
    python tools/fuzz_parsers.py [--n 1000] [--formats a,b] [--seed 0]
                                 [--timeout 5.0]

For each registered target (tools/fuzz_targets.py) this mutates the
clean seeds N times (bit flips, truncation, field stomps, splices)
and calls the parser.  The contract: return a value, or raise
ValueError / NotImplementedError.  Anything else -- an implementation
exception leaking out, or a hang past --timeout seconds -- is a
finding, printed with a reproduction recipe (format, seed index,
mutation index, RNG seed) and a hex dump of the offending input.

Exit status: number of formats with findings (0 = contract holds).
"""

from __future__ import annotations

import argparse
import random
import signal
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.fuzz_targets import TARGETS  # noqa: E402


class Hang(Exception):
    pass


def mutate(blob: bytes, rng: random.Random) -> bytes:
    """One corruption: bit flips, truncation, field stomp, or splice
    (duplicate/delete a run) -- the damage profiles of flaky storage,
    cut-off transfers, and adversarial inputs."""
    b = bytearray(blob)
    if not b:
        return bytes(b)
    mode = rng.randrange(4)
    if mode == 0:  # bit flips
        for _ in range(rng.randrange(1, 9)):
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
    elif mode == 1:  # truncate
        del b[rng.randrange(len(b)):]
    elif mode == 2:  # stomp a short run (length/dim fields)
        i = rng.randrange(len(b))
        for j in range(i, min(i + rng.randrange(1, 5), len(b))):
            b[j] = 0xFF if rng.random() < 0.5 else rng.randrange(256)
    else:  # splice: duplicate or delete a slice
        i = rng.randrange(len(b))
        n = rng.randrange(1, 17)
        if rng.random() < 0.5:
            b[i:i] = b[i : i + n]
        else:
            del b[i : i + n]
    return bytes(b)


def run_one(parse, data: bytes, timeout: float):
    """Call under a wall-clock alarm; classify the outcome."""

    def _alarm(signum, frame):
        raise Hang()

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.setitimer(signal.ITIMER_REAL, timeout)
    try:
        parse(data)
        return None
    except (ValueError, NotImplementedError):
        return None  # the contract
    except Hang:
        return "HANG"
    except BaseException as exc:  # noqa: BLE001 -- classifying leaks
        return f"{type(exc).__name__}: {exc}"
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def fuzz_format(name: str, n: int, rng_seed: int, timeout: float,
                max_findings: int = 5) -> list[tuple]:
    seeds_fn, parse = TARGETS[name]
    seeds = seeds_fn()
    findings = []
    rng = random.Random(rng_seed)
    for k in range(n):
        si = k % len(seeds)
        data = seeds[si]
        # stack 1-3 mutations so damage compounds like real corruption
        for _ in range(rng.randrange(1, 4)):
            data = mutate(data, rng)
        verdict = run_one(parse, data, timeout)
        if verdict is not None:
            findings.append((k, si, verdict, data))
            if len(findings) >= max_findings:
                break
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--formats", type=str, default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=5.0)
    args = ap.parse_args()

    names = (
        [f for f in args.formats.split(",") if f]
        if args.formats
        else list(TARGETS)
    )
    bad = 0
    for name in names:
        t0 = time.monotonic()
        findings = fuzz_format(name, args.n, args.seed, args.timeout)
        dt = time.monotonic() - t0
        if findings:
            bad += 1
            print(f"FAIL {name} ({dt:.1f}s): {len(findings)} finding(s)")
            for k, si, verdict, data in findings:
                print(f"  mutation {k} of seed {si}: {verdict}")
                print(f"    repro: fuzz_format({name!r}, n={k + 1}, "
                      f"rng_seed={args.seed}) last input "
                      f"({len(data)} bytes): {data[:96].hex()}")
        else:
            print(f"ok   {name} ({dt:.1f}s, {args.n} mutations)")
        sys.stdout.flush()
    return bad


if __name__ == "__main__":
    sys.exit(main())
