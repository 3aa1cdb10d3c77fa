"""Stratification utilities: ``choiceproduct`` and stratum assignment.

Reference semantics: ``stratified_map!`` (/root/reference/src/utils.jl:29-55)
partitions N particle indices over K strata either in ``:contiguous`` blocks
or ``:interleaved`` stride-K order, and assigns the remainder
``R = N − K·⌊N/K⌋`` particles (at the tail indices) to uniformly random
strata. ``choiceproduct`` (/root/reference/src/utils.jl:84-98) builds the
Cartesian product of ``(addr, vals)`` pairs as a list of choicemaps.

TPU-native: instead of a Julia closure loop, we compute a per-particle
stratum index vector ``[N]`` with pure index arithmetic, stack the strata
choicemaps into one batched pytree, and gather — the stratified op then runs
as a single vmap with per-particle constraints.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.choicemap import ChoiceMap, choicemap

__all__ = ["choiceproduct", "stratum_assignment", "stack_strata",
           "gather_strata"]


def choiceproduct(*choices) -> List[ChoiceMap]:
    """Cartesian product of ``(addr, vals)`` tuples (or one dict) into a
    list of ChoiceMaps (ref: src/utils.jl:84-98)."""
    if len(choices) == 1 and isinstance(choices[0], dict):
        items = list(choices[0].items())
    else:
        items = [(addr, vals) for addr, vals in choices]
    pools = [[(addr, v) for v in vals] for addr, vals in items]
    return [choicemap(*combo) for combo in itertools.product(*pools)]


def stratum_assignment(key, n_total: int, n_strata: int,
                       layout: str = "contiguous") -> jax.Array:
    """Per-particle stratum indices ``[n_total]`` int32.

    Layout semantics match src/utils.jl:33-52: ``contiguous`` gives blocks
    of size B = N//K per stratum; ``interleaved`` strides by K; the last
    ``N - K*B`` indices get uniformly random strata.
    """
    if layout not in ("contiguous", "interleaved"):
        raise ValueError(f"unknown layout {layout!r}")
    block = n_total // n_strata
    idx = jnp.arange(n_total, dtype=jnp.int32)
    if layout == "contiguous":
        base = idx // max(block, 1)
    else:
        base = idx % n_strata
    n_main = n_strata * block
    rand = jr.randint(key, (n_total,), 0, n_strata, dtype=jnp.int32)
    return jnp.where(idx < n_main, jnp.minimum(base, n_strata - 1), rand)


def stack_strata(strata: Sequence[ChoiceMap]) -> ChoiceMap:
    """Stack K structurally-identical choicemaps into one with a leading
    [K] axis on every entry value (masks must be static True)."""
    strata = list(strata)
    proto = strata[0]
    entries = {}
    for k, e in proto.entries.items():
        vals = jnp.stack([jnp.asarray(s.entries[k].value) for s in strata])
        entries[k] = type(e)(vals, True)
    return ChoiceMap(entries)


def gather_strata(stacked: ChoiceMap, assignment: jax.Array) -> ChoiceMap:
    """Per-particle constraints: index the stacked strata with the [N]
    assignment vector, giving entries with a leading particle axis."""
    entries = {}
    for k, e in stacked.entries.items():
        entries[k] = type(e)(jnp.asarray(e.value)[assignment], True)
    return ChoiceMap(entries)
