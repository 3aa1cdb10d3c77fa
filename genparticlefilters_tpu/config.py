"""Global performance toggles."""

from __future__ import annotations

import contextlib

#: Use the fused Pallas clustered gather+unpack (ops/fused_gather.py) for the
#: resampling ancestry gather when parents are non-decreasing
#: (systematic/stratified with sort_particles=False); measured ~4x over the
#: XLA take-then-unpack path on v5e at N=100K. Per-chip only — a pallas_call
#: does not partition under GSPMD auto-sharding, so the resampling ops
#: auto-detect multi-device inputs (``smc/resample.py::_maybe_partitioned``)
#: and fall back to the XLA gather path regardless of this flag; the flag
#: remains as a manual kill switch (the shard-local ops in parallel/ are
#: unaffected — they never take the Pallas path).
clustered_gather: bool = True


@contextlib.contextmanager
def use_clustered_gather(enabled: bool = True):
    global clustered_gather
    prev = clustered_gather
    clustered_gather = enabled
    try:
        yield
    finally:
        clustered_gather = prev
