"""Instrumented positioned-read scheme for the ranged-I/O contract
test: serves bytes from the local file named in the ctr:// URI while
appending one "path\toffset\tlength" line per request to the file
named by $RANGED_IO_LOG -- so the driver can assert that executors
issued EXACTLY the planned bounded reads, through the seam, and
nothing else."""

from __future__ import annotations

import os
import re


def read_ctr(path: str, offset: int, length: int | None) -> bytes:
    local = re.sub("^ctr:/*", "/", path)
    log = os.environ.get("RANGED_IO_LOG")
    if log:
        with open(log, "a") as f:
            f.write(f"{path}\t{offset}\t{length}\n")
    with open(local, "rb") as f:
        f.seek(offset)
        return f.read() if length is None else f.read(length)
