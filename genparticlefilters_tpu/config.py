"""Global performance toggles."""

from __future__ import annotations

import contextlib

#: Use the Pallas ranged-DMA clustered gather (ops/sorted_gather.py) for the
#: resampling ancestry gather when parents are non-decreasing
#: (systematic/stratified with sort_particles=False). Single-chip only — a
#: pallas_call does not partition under automatic sharding; leave False for
#: states sharded with jax.sharding (shard-local resampling in parallel/
#: keeps the XLA gather).
clustered_gather: bool = False


@contextlib.contextmanager
def use_clustered_gather(enabled: bool = True):
    global clustered_gather
    prev = clustered_gather
    clustered_gather = enabled
    try:
        yield
    finally:
        clustered_gather = prev
