"""Device mesh + sharded particle states.

The reference has no distributed backend (SURVEY.md §2: its parallelism-
shaped features are particle views, stratification, and replication). The
TPU-native realization: the particle axis of every state leaf is sharded
over a 1-D ``jax.sharding.Mesh`` axis (named ``"p"``); a shard is exactly a
:class:`~..smc.state.ParticleFilterSubState` block, so the reference's
sub-state weight semantics (/root/reference/src/resample.jl:205-218) are the
correctness spec for shard-local operations. Global reductions (ESS, LML,
normalization) lower to ``psum``-style collectives XLA inserts automatically
for sharded inputs; cross-shard ancestry uses all-to-all gathers only in the
exact/global resampling path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..smc.state import ParticleFilterState

__all__ = ["particle_mesh", "shard_state", "state_sharding",
           "replicated_sharding"]

PARTICLE_AXIS = "p"


def particle_mesh(devices=None, axis_name: str = PARTICLE_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices with the particle axis."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(jnp.array(devices).reshape(-1) if False else devices,
                (axis_name,))


def state_sharding(mesh: Mesh, state: ParticleFilterState,
                   axis_name: str = PARTICLE_AXIS):
    """Sharding pytree: leaves with a leading particle axis are sharded on
    it; scalars (log_ml_est) are replicated."""
    n = state.n_particles

    def leaf_sharding(leaf):
        if hasattr(leaf, "shape") and len(jnp.shape(leaf)) > 0 \
                and jnp.shape(leaf)[0] == n:
            return NamedSharding(
                mesh, P(axis_name, *([None] * (len(jnp.shape(leaf)) - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, state)


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_state(state: ParticleFilterState, mesh: Mesh,
                axis_name: str = PARTICLE_AXIS) -> ParticleFilterState:
    """Place a state on the mesh with the particle axis sharded."""
    sh = state_sharding(mesh, state, axis_name)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), state, sh)
