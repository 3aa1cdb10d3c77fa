"""Unit tests for the packed step storage (core/packed.py): round-trips,
column reads/writes, batched/per-particle form agreement, and the layout
of real Unfold traces."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from genparticlefilters_tpu.core.packed import (
    StepStorage, make_storage, unpack_tree, read_step, write_steps,
    zeros_column, pack_column)


def _mk_tree(T, n=None, K=3):
    """A representative stacked logical tree: per-particle f32 [T,(n),K,2],
    scalar i32 [T,(n)], bool [T,(n)], a shared f32 [T,K], and a zero-width
    placeholder [T,(n),0]."""
    shp = (lambda *s: (T, n) + s) if n else (lambda *s: (T,) + s)
    k = jr.key(0)
    tree = {
        "x": jr.normal(k, shp(K, 2), jnp.float32),
        "i": jr.randint(jr.key(1), shp(), 0, 100, jnp.int32),
        "b": jr.bernoulli(jr.key(2), 0.5, shp()),
        "shared": jr.normal(jr.key(3), (T, K), jnp.float32),
        "z": jnp.zeros(shp(0), jnp.float32),
    }
    ax = 1 if n else 1  # particle axis / insertion position
    spec = {"x": ax, "i": ax, "b": ax, "shared": None, "z": ax}
    return tree, spec


@pytest.mark.parametrize("n", [None, 7])
def test_roundtrip(n):
    T = 5
    tree, spec = _mk_tree(T, n)
    st = make_storage(tree, spec, T, batched=n is not None)
    out = unpack_tree(st)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(tree[k]), err_msg=k)
    # shared leaf must be stored as an extra (no N-fold copy) when batched
    if n is not None:
        assert any(e is tree["shared"] for e in st.extras)
        assert st.mat.shape == (T * st.layout.R, n)
        assert st.layout.R == 3 * 2 + 1 + 1  # x rows + i + b


@pytest.mark.parametrize("n", [None, 7])
def test_read_step_matches_slices(n):
    T = 5
    tree, spec = _mk_tree(T, n)
    st = make_storage(tree, spec, T, batched=n is not None)
    for t in (0, 2, T - 1):
        col = read_step(st, jnp.asarray(t, jnp.int32))
        for k in ("x", "i", "b", "shared"):
            np.testing.assert_array_equal(np.asarray(col[k]),
                                          np.asarray(tree[k][t]),
                                          err_msg=f"{k}@{t}")


@pytest.mark.parametrize("n", [None, 7])
def test_write_steps_roundtrip(n):
    T = 6
    tree, spec = _mk_tree(T, n)
    st = make_storage(tree, spec, T, batched=n is not None)
    t0 = 2
    cols = [read_step(st, jnp.asarray(t, jnp.int32)) for t in (4, 5)]
    st2 = write_steps(st, jnp.asarray(t0, jnp.int32), cols)
    out = unpack_tree(st2)
    ref = {k: np.asarray(v).copy() for k, v in tree.items()}
    for j, src in enumerate((4, 5)):
        for k in ("x", "i", "b", "shared"):
            ref[k][t0 + j] = np.asarray(tree[k][src])
    for k in ("x", "i", "b", "shared"):
        np.testing.assert_array_equal(np.asarray(out[k]), ref[k],
                                      err_msg=k)


def test_write_shared_column_broadcasts():
    # an under-shaped (shared) column value written to a per-particle leaf
    # broadcasts over the particle lanes
    T, n = 4, 6
    tree, spec = _mk_tree(T, n)
    st = make_storage(tree, spec, T, batched=True)
    col = zeros_column(st)
    col["x"] = jnp.full((3, 2), 2.5, jnp.float32)  # no particle axis
    st2 = write_steps(st, jnp.asarray(1, jnp.int32), [col])
    out = unpack_tree(st2)
    np.testing.assert_array_equal(np.asarray(out["x"][1]),
                                  np.full((n, 3, 2), 2.5, np.float32))


def test_pack_column_zero_and_extras():
    T, n = 4, 6
    tree, spec = _mk_tree(T, n)
    st = make_storage(tree, spec, T, batched=True)
    col = read_step(st, jnp.asarray(0, jnp.int32))
    slab, extra_cols = pack_column(st, col)
    assert slab.shape == (st.layout.R, n)
    assert sum(v is not None for v in extra_cols) == 1  # the shared leaf


def test_vmap_stacks_per_particle_form_to_batched():
    # vmap with mat out-axis 1 must produce exactly the batched packing of
    # the same per-step values (per-particle creation path)
    T, n, K = 5, 8, 3

    def one(key):
        tree = {
            "x": jr.normal(key, (T, K, 2), jnp.float32),
            "i": jr.randint(key, (T,), 0, 100, jnp.int32),
        }
        spec = {"x": 1, "i": 1}
        return make_storage(tree, spec, T, batched=False)

    shape = jax.eval_shape(one, jr.key(9))
    sts = jax.vmap(one, out_axes=StepStorage(
        1, (), shape.layout))(jr.split(jr.key(9), n))
    assert sts.mat.shape == (T * sts.layout.R, n)
    out = unpack_tree(sts)
    for i in range(n):
        ref = unpack_tree(jax.tree_util.tree_map(
            lambda l: l[..., i] if l.ndim == 2 else l,
            one(jr.split(jr.key(9), n)[i])))
        np.testing.assert_array_equal(np.asarray(out["x"][:, i]),
                                      np.asarray(ref["x"]))


def test_unfold_trace_is_packed():
    # a real Unfold trace stores ONE [T*R, N] int32 matrix; the resampling
    # pack sees it as a single zero-copy piece (the round-5 design goal)
    import genparticlefilters_tpu as g
    from genparticlefilters_tpu.models.multi_object import (
        MOTParams, make_mot_model, mot_obs_dense, synthesize_mot_data)
    from genparticlefilters_tpu.smc.resample import (_flatten_with_axes,
                                                     _pack_rows)
    p = MOTParams()
    T, N = 6, 32
    y = synthesize_mot_data(jr.key(5), T, p)
    model = make_mot_model(T, p)
    x0 = jnp.zeros((p.n_objects, 2), jnp.float32)
    st = g.pf_initialize(jr.key(0), model, (1, x0), mot_obs_dense(y), N)
    leaves, axes, _ = _flatten_with_axes(st.traces)
    rows, meta = _pack_rows(leaves, axes)
    packed = [r for r in rows if r is not None]
    # exactly two pieces: the per-particle score row and the packed mat —
    # and the mat piece is the stored matrix itself (zero-copy reshape).
    # (MOT's wide [N, K, 2] retval is NOT carry-cached — the scalar-carry
    # gate in combinators._inner_c keeps wide carries out of the
    # resampling pack, where they would pay a moveaxis transpose.)
    assert len(packed) == 2, [p_.shape for p_ in packed]
    widths = sorted(p_.shape[0] for p_ in packed)
    store = st.traces.inner["store"]
    assert widths == [1, T * store.layout.R]
    # no moveaxis: the wide piece must BE the stored mat object
    assert any(r is store.mat for r in packed)
