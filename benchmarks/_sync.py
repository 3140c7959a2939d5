"""Fetch-based synchronization for timing on the relayed TPU.

`jax.block_until_ready` does NOT reliably block through this TPU relay
(docs/ROADMAP.md round-2 measurement correction: a 1000-epoch program
"completed" as fast as a 100-epoch one under block_until_ready, while a
real host fetch scaled 9x).  Every timed region must therefore end with
an actual device->host value fetch.
"""

from __future__ import annotations

import jax
import numpy as np


def fetch_sync(tree) -> float:
    """Force completion of `tree`'s computation by fetching one scalar.

    Returns the fetched value (so callers can also assert finiteness).
    """
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])
