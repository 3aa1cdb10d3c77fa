"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from genparticlefilters_tpu.ops.sorted_gather import gather_rows_clustered
from genparticlefilters_tpu.ops.fused_gather import (
    gather_transposed_clustered, resample_gather_transposed)
from genparticlefilters_tpu.ops.gather import gather_rows_pallas


def test_clustered_gather_interpret():
    n, d, m = 2048, 72, 512
    mat = jr.randint(jr.key(0), (n, d), -2**30, 2**30, dtype=jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_rows_clustered(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))


def test_clustered_gather_extreme_values():
    # byte-split must be exact for all int32 bit patterns
    n, m = 256, 256
    vals = jnp.array([[0, -1, 2**31 - 1, -2**31, 12345, -12345, 65536,
                       -65536]] * n, jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_rows_clustered(vals, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(vals, parents, axis=0)))


def test_clustered_gather_tight_cluster():
    # all parents equal (fully degenerate resampling)
    n, d, m = 1024, 40, 256
    mat = jr.randint(jr.key(0), (n, d), -1000, 1000, dtype=jnp.int32)
    parents = jnp.full((m,), 777, jnp.int32)
    out = gather_rows_clustered(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))


@pytest.mark.parametrize("n,m,d", [
    (2048, 512, 72),     # mixed
    (1000, 1000, 43),    # m not a multiple of 256, d not a multiple of 8
    (256, 256, 128),     # exactly one full tile
])
def test_fused_gather_transposed_interpret(n, m, d):
    mat = jr.randint(jr.key(0), (n, d), -2**30, 2**30, dtype=jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_transposed_clustered(mat, parents, interpret=True)
    ref = jnp.take(mat, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_gather_transposed_degenerate_parents():
    n, m, d = 1024, 512, 32
    mat = jr.randint(jr.key(0), (n, d), -2**31, 2**31 - 1, dtype=jnp.int32)
    parents = jnp.full((m,), 1023, jnp.int32)  # all mass on the last particle
    out = gather_transposed_clustered(mat, parents, interpret=True)
    ref = jnp.take(mat, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_gather_transposed_extreme_values():
    n, m = 256, 256
    vals = jnp.array([[0, -1, 2**31 - 1, -2**31, 12345, -12345, 65536,
                       -65536]] * n, jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_transposed_clustered(vals, parents, interpret=True)
    ref = jnp.take(vals, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _F_from_weights(key, n):
    from genparticlefilters_tpu.smc.resample import systematic_F
    w = jax.nn.softmax(jr.normal(key, (n,)) * 2.0)
    return systematic_F(jr.fold_in(key, 1), w)


@pytest.mark.parametrize("n,d", [(2048, 72), (1000, 43), (512, 96)])
def test_resample_gather_from_F_interpret(n, d):
    from genparticlefilters_tpu.smc.resample import _F_to_parents
    mat = jr.randint(jr.key(0), (n, d), -2**30, 2**30, dtype=jnp.int32)
    F = _F_from_weights(jr.key(n), n)
    parents_ref = _F_to_parents(F, n)
    out, parents = resample_gather_transposed(mat, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    ref = jnp.take(mat, parents_ref, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_resample_gather_from_F_degenerate():
    # all offspring from one particle: F jumps 0 -> n at i=777
    n, d = 1024, 32
    mat = jr.randint(jr.key(0), (n, d), -2**31, 2**31 - 1, dtype=jnp.int32)
    F = jnp.where(jnp.arange(n) >= 777, n, 0).astype(jnp.int32)
    out, parents = resample_gather_transposed(mat, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.full((n,), 777, np.int32))
    ref = jnp.broadcast_to(mat[777][:, None], (d, n))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("n,d", [(2048, 53), (1000, 21), (513, 96)])
def test_lane_resample_gather_interpret(n, d):
    # lane-major (time-major packing) staircase kernel vs reference gather
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows
    from genparticlefilters_tpu.smc.resample import _F_to_parents
    big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    F = _F_from_weights(jr.key(n + 1), n)
    parents_ref = _F_to_parents(F, n)
    out, parents = resample_gather_rows(big, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(big, parents_ref, axis=1)))


def test_lane_clustered_gather_interpret():
    from genparticlefilters_tpu.ops.fused_gather import (
        gather_rows_clustered as lane_clustered)
    n, d, m = 2048, 29, 700
    big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = lane_clustered(big, parents, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(big, parents, axis=1)))


def test_lane_resample_gather_degenerate():
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows
    n, d = 1024, 16
    big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    F = jnp.where(jnp.arange(n) >= 777, n, 0).astype(jnp.int32)
    out, parents = resample_gather_rows(big, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.full((n,), 777, np.int32))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.broadcast_to(big[:, 777:778],
                                                     (d, n))))


def test_dma_row_gather_interpret():
    n, d, m = 1024, 64, 256
    mat = jr.normal(jr.key(0), (n, d))
    parents = jr.randint(jr.key(1), (m,), 0, n)
    out = gather_rows_pallas(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))


def test_bitonic_merge_kernel_interpret():
    """The VMEM bitonic-merge kernel (ops/merge_count.py) sorts a bitonic
    int32 sequence exactly (Pallas interpreter on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    import jax.random as jr
    from genparticlefilters_tpu.ops.merge_count import bitonic_merge_sorted

    for seed, m in [(0, 512), (1, 2048), (2, 4096)]:
        a = np.sort(np.asarray(
            jr.randint(jr.key(seed), (m // 2,), 0, 1 << 28)))
        b = np.sort(np.asarray(
            jr.randint(jr.key(seed + 10), (m // 2,), 0, 1 << 28)))
        z = jnp.asarray(np.concatenate([a, b[::-1]]), jnp.int32)  # bitonic
        got = np.asarray(bitonic_merge_sorted(z, interpret=True))
        np.testing.assert_array_equal(got, np.sort(np.concatenate([a, b])))


@pytest.mark.parametrize("n,d", [(2048, 53), (1000, 21), (513, 40)])
def test_lane_resample_gather_u_interpret(n, d):
    # float-bracket (inverse-CDF) multinomial kernel vs the merge-count
    # F formulation: same (c, u) must give identical parents and gather
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    from genparticlefilters_tpu.smc.resample import (
        _F_to_parents, _merge_count, _pinned_F)
    big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    w = jr.dirichlet(jr.key(n), jnp.ones(n) * 0.5)
    # a few zero-weight particles (duplicate cumsum values)
    w = w.at[5:9].set(0.0)
    w = w / w.sum()
    c = jnp.cumsum(w)
    c = c / c[-1]
    ce = jnp.cumsum(jr.exponential(jr.key(n + 1), (n + 1,), jnp.float32))
    u = ce[:-1] / ce[-1]
    parents_ref = _F_to_parents(_pinned_F(_merge_count(c, u), n), n)
    out, parents = resample_gather_rows_u(big, c, u, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(big, parents_ref, axis=1)))


@pytest.mark.parametrize("n", [2048, 777])
def test_residual_F_fused_interpret(n):
    # role-swapped bracket kernel (G = parents of rc among sorted uniforms)
    # must reproduce the merge-count residual_F exactly (same key -> same
    # draws; random case is tie-free)
    from genparticlefilters_tpu.smc.resample import residual_F, residual_F_fused
    w = jr.dirichlet(jr.key(n), jnp.ones(n) * 0.6)
    w = w.at[3:6].set(0.0)  # zero-weight prefix-ish particles
    w = w / w.sum()
    F_ref = residual_F(jr.key(1), w)
    F_new = residual_F_fused(jr.key(1), w, interpret=True)
    np.testing.assert_array_equal(np.asarray(F_new), np.asarray(F_ref))


def test_lane_resample_gather_u_zero_query():
    # ADVICE r3: u[0] == 0.0 exactly (p ~ 2^-23 underflow in the first
    # exponential spacing) must NOT emit the corrupt 0x80808080 pattern;
    # the wrapper clamps it to 1e-37, which lands in the first
    # positive-weight bracket exactly like the multinomial_cu guard
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    n, d = 512, 7
    big = jr.randint(jr.key(2), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    w = jr.dirichlet(jr.key(5), jnp.ones(n))
    c = jnp.cumsum(w)
    c = c / c[-1]
    u = jnp.sort(jr.uniform(jr.key(6), (n,), jnp.float32))
    u = u.at[0].set(0.0)
    out, parents = resample_gather_rows_u(big, c, u, interpret=True)
    assert int(parents[0]) == 0  # first positive-weight particle
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(big[:, 0]))


def test_lane_resample_gather_u_catchall_bracket():
    # ADVICE r3: a degenerate direct-caller c with c[-1] < max(u) must fall
    # into the widened last bracket (parent n-1), never corrupt output
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    n, d = 512, 5
    big = jr.randint(jr.key(3), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    w = jr.dirichlet(jr.key(7), jnp.ones(n))
    c = jnp.cumsum(w)
    c = (c / c[-1]) * 0.999  # violates the c[-1] == 1 contract
    u = jnp.sort(jr.uniform(jr.key(8), (n,), jnp.float32))
    u = u.at[-1].set(0.99995)  # beyond c[-1]
    out, parents = resample_gather_rows_u(big, c, u, interpret=True)
    assert int(parents[-1]) == n - 1
    np.testing.assert_array_equal(np.asarray(out[:, -1]),
                                  np.asarray(big[:, -1]))
    assert np.all(np.asarray(parents) >= 0)
    assert np.all(np.asarray(parents) < n)


@pytest.mark.parametrize("n,m", [(2048, 1024), (1000, 2000), (513, 513)])
def test_lane_resample_gather_resize_interpret(n, m):
    # n_out != n (resizing): F path and float-bracket path vs reference
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows, resample_gather_rows_u)
    from genparticlefilters_tpu.smc.resample import (
        _F_to_parents, _merge_count, _pinned_F)
    d = 23
    big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    w = jr.dirichlet(jr.key(n + m), jnp.ones(n) * 0.5)
    c = jnp.cumsum(w)
    c = c / c[-1]
    ce = jnp.cumsum(jr.exponential(jr.key(3), (m + 1,), jnp.float32))
    u = ce[:-1] / ce[-1]
    F = _pinned_F(_merge_count(c, u), m)
    parents_ref = _F_to_parents(F, m)
    out, parents = resample_gather_rows(big, F, n_out=m, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(big, parents_ref, axis=1)))
    out2, parents2 = resample_gather_rows_u(big, c, u, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents2),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(
        np.asarray(out2), np.asarray(jnp.take(big, parents_ref, axis=1)))


# ---------------------------------------------------------------------------
# Blockwise fused composition (VERDICT r3 #6)
# ---------------------------------------------------------------------------

def test_blockwise_compose_systematic_bit_identical():
    # composed global F must reproduce the per-block fallback parents
    # bit-for-bit (systematic is pure cumsum arithmetic)
    from genparticlefilters_tpu.smc.resample import (
        blockwise_compose, systematic_F, _F_to_parents)
    K, b = 8, 512
    keys = jr.split(jr.key(0), K)
    w = jr.dirichlet(jr.key(1), jnp.ones(b), shape=(K,))
    kind, F = blockwise_compose(jr.key(0), w, "systematic")
    assert kind == "F"
    parents = np.asarray(_F_to_parents(F, K * b))
    for k in range(K):
        pk = np.asarray(_F_to_parents(systematic_F(keys[k], w[k]), b))
        np.testing.assert_array_equal(parents[k * b:(k + 1) * b], pk + k * b)


def test_blockwise_compose_multinomial_matches_per_block():
    # composed (c', u') through the float-bracket kernel == per-block
    # merge-count parents on the same draws (random weights: tie-free)
    from genparticlefilters_tpu.smc.resample import (
        blockwise_compose, multinomial_cu, _merge_count, _pinned_F,
        _F_to_parents)
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    K, b = 4, 512
    n = K * b
    keys = jr.split(jr.key(3), K)
    w = jr.dirichlet(jr.key(4), jnp.ones(b) * 0.7, shape=(K,))
    kind, (cg, ug) = blockwise_compose(jr.key(3), w, "multinomial")
    assert kind == "cu"
    big = jr.randint(jr.key(5), (5, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    out, parents = resample_gather_rows_u(big, cg, ug, interpret=True)
    parents = np.asarray(parents)
    for k in range(K):
        c, u = multinomial_cu(keys[k], w[k])
        pk = np.asarray(_F_to_parents(_pinned_F(_merge_count(c, u), b), b))
        blk = parents[k * b:(k + 1) * b]
        assert (blk >= k * b).all() and (blk < (k + 1) * b).all()
        np.testing.assert_array_equal(blk, pk + k * b)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(big, parents, axis=1)))


@pytest.mark.parametrize("K", [3, 5, 7, 12])
def test_blockwise_compose_multinomial_boundary_collapse(K):
    # directed boundary test (ADVICE r4): at non-power-of-two K the rescale
    # (k + u)*invK can round ONTO the block boundary k*invK when u carries
    # only ~1 ulp of margin, so the strict c_prev < u bracket condition
    # matches nothing and the kernel emits the corrupt 0x80808080 slot.
    # Build the composed brackets with every uniform forced to the clamp
    # minimum (the worst case the clamp must protect) and assert every
    # parent lands inside its own block with sane data.
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    b = 128
    n = K * b
    umin = max(K, 2) * 2.0 ** -21          # the clamp floor
    kf = jnp.arange(K, dtype=jnp.float32)[:, None]
    invK = 1.0 / float(K)
    # per-block c ascending from ~0 (first weight tiny: c_0 well below the
    # clamp floor, so slot 0 must land on bracket 0 only via the clamp);
    # per-block u all at the clamp floor -> every composed query sits as
    # close to its block boundary as the clamp allows
    c = jnp.linspace(1.0 / b, 1.0, b, dtype=jnp.float32)[None, :]
    c = jnp.broadcast_to(c, (K, b)).at[:, 0].set(2.0 ** -25)
    u = jnp.full((K, b), umin, jnp.float32)
    cg = ((kf + c) * invK).reshape(n)
    ug = ((kf + u) * invK).reshape(n)
    big = jr.randint(jr.key(99), (3, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    out, parents = resample_gather_rows_u(big, cg, ug, interpret=True)
    parents = np.asarray(parents)
    blocks = parents // b
    np.testing.assert_array_equal(
        blocks, np.repeat(np.arange(K), b),
        err_msg="a composed query crossed (or missed) its block boundary")
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(big, parents, axis=1)))


@pytest.mark.parametrize("n", [100, 4096, 5000, 100_001])
def test_blocked_scans_match_xla(n):
    # _cumsum1/_cummax1 (blocked reformulation of the pathological XLA 1-D
    # scans) must agree with the XLA ops: exactly for int32, and within
    # reordering roundoff for f32 — with monotone enforcement preserved
    from genparticlefilters_tpu.smc.resample import _cumsum1, _cummax1
    xi = jr.randint(jr.key(1), (n,), -50, 50, jnp.int32)
    np.testing.assert_array_equal(np.asarray(_cumsum1(xi)),
                                  np.cumsum(np.asarray(xi)))
    np.testing.assert_array_equal(np.asarray(_cummax1(xi)),
                                  np.maximum.accumulate(np.asarray(xi)))
    xf = jr.uniform(jr.key(2), (n,), jnp.float32)
    np.testing.assert_allclose(np.asarray(_cumsum1(xf)),
                               np.cumsum(np.asarray(xf, np.float64)),
                               rtol=2e-6, atol=2e-3)
    cm = np.asarray(_cummax1(_cumsum1(xf)))
    assert (np.diff(cm) >= 0).all()


def test_blockwise_compose_stratified_matches_per_block():
    # composed (c', u') for UNSORTED stratified through the float-bracket
    # kernel == per-block merge-count parents on the same draws
    from genparticlefilters_tpu.smc.resample import (
        blockwise_compose, stratified_cu, _merge_count, _pinned_F,
        _F_to_parents)
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    K, b = 8, 512
    n = K * b
    keys = jr.split(jr.key(21), K)
    w = jr.dirichlet(jr.key(22), jnp.ones(b) * 0.8, shape=(K,))
    kind, (cg, ug) = blockwise_compose(jr.key(21), w, "stratified")
    assert kind == "cu"
    big = jr.randint(jr.key(23), (4, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    out, parents = resample_gather_rows_u(big, cg, ug, interpret=True)
    parents = np.asarray(parents)
    for k in range(K):
        c, u = stratified_cu(keys[k], w[k])
        pk = np.asarray(_F_to_parents(_pinned_F(_merge_count(c, u), b), b))
        blk = parents[k * b:(k + 1) * b]
        assert (blk >= k * b).all() and (blk < (k + 1) * b).all()
        np.testing.assert_array_equal(blk, pk + k * b)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(big, parents, axis=1)))


def test_blockwise_compose_residual_matches_per_block():
    # composed role-swapped remainder pass == per-block residual_F counts
    from genparticlefilters_tpu.smc.resample import (
        blockwise_compose, residual_F, _F_to_parents)
    K, b = 4, 512
    keys = jr.split(jr.key(7), K)
    w = jr.dirichlet(jr.key(8), jnp.ones(b) * 0.6, shape=(K,))
    w = w.at[:, 3:6].set(0.0)
    w = w / w.sum(axis=1, keepdims=True)
    kind, F = blockwise_compose(jr.key(7), w, "residual", interpret=True)
    assert kind == "F"
    parents = np.asarray(_F_to_parents(F, K * b))
    for k in range(K):
        pk = np.asarray(_F_to_parents(residual_F(keys[k], w[k]), b))
        np.testing.assert_array_equal(parents[k * b:(k + 1) * b], pk + k * b)


def test_resample_gather_rows_pieces_interpret():
    # pieces-list input (Pallas pack kernel assembles the matrix in place)
    # must match the single-matrix path bit for bit
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows
    n = 2048
    widths = (10, 10, 1, 1, 7)
    pieces = [jr.randint(jr.key(i), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate(widths)]
    big = jnp.concatenate(pieces, axis=0)
    F = _F_from_weights(jr.key(n + 5), n)
    out_ref_, parents_ref = resample_gather_rows(big, F, interpret=True)
    out, parents = resample_gather_rows(pieces, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref_))


def test_resample_gather_rows_u_pieces_interpret():
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows_u
    n = 1000  # not a multiple of the pack block
    widths = (9, 3, 1)
    pieces = [jr.randint(jr.key(i + 50), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate(widths)]
    big = jnp.concatenate(pieces, axis=0)
    w = jr.dirichlet(jr.key(60), jnp.ones(n) * 0.5)
    cvec = jnp.cumsum(w)
    cvec = cvec / cvec[-1]
    u = jnp.sort(jr.uniform(jr.key(61), (n,), jnp.float32))
    out_ref_, parents_ref = resample_gather_rows_u(big, cvec, u,
                                                   interpret=True)
    out, parents = resample_gather_rows_u(pieces, cvec, u, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref_))


@pytest.mark.parametrize("n,m", [(2048, 2048), (1000, 1000), (2048, 1024),
                                 (600, 1200)])
def test_resample_gather_split_interpret(n, m):
    # the pack-free split kernel (per-piece outputs, in-kernel index row,
    # clamped edge DMAs) must match the packed-matrix kernel bit for bit
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows, resample_gather_split)
    from genparticlefilters_tpu.smc.resample import systematic_F
    widths = (40, 1, 7)
    pieces = [jr.randint(jr.key(i + 70), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate(widths)]
    big = jnp.concatenate(pieces, axis=0)
    w = jr.dirichlet(jr.key(80), jnp.ones(n) * 0.4)
    F = systematic_F(jr.key(81), w, m)
    ref_out, ref_par = resample_gather_rows(big, F, n_out=m, interpret=True)
    outs, parents = resample_gather_split(pieces, F, n_out=m,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(parents), np.asarray(ref_par))
    off = 0
    for o_, wd in zip(outs, widths):
        np.testing.assert_array_equal(np.asarray(o_),
                                      np.asarray(ref_out[off:off + wd]))
        off += wd


def test_resample_gather_split_u_interpret():
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows_u, resample_gather_split_u)
    n = 1500
    widths = (33, 2)
    pieces = [jr.randint(jr.key(i + 90), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate(widths)]
    big = jnp.concatenate(pieces, axis=0)
    w = jr.dirichlet(jr.key(91), jnp.ones(n) * 0.5)
    cvec = jnp.cumsum(w)
    cvec = cvec / cvec[-1]
    u = jnp.sort(jr.uniform(jr.key(92), (n,), jnp.float32))
    ref_out, ref_par = resample_gather_rows_u(big, cvec, u, interpret=True)
    outs, parents = resample_gather_split_u(pieces, cvec, u, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents), np.asarray(ref_par))
    off = 0
    for o_, wd in zip(outs, widths):
        np.testing.assert_array_equal(np.asarray(o_),
                                      np.asarray(ref_out[off:off + wd]))
        off += wd


def test_resample_gather_split_slab_residual_interpret():
    # weights on every 8th particle: each 512-output block's parents span
    # ~4096 source lanes, overflowing the slab kernel's 1024-lane slab —
    # forces the residual chunk loop (and its shifted-coverage premask)
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows, resample_gather_split)
    from genparticlefilters_tpu.smc.resample import systematic_F
    n = 4096
    pieces = [jr.randint(jr.key(31), (9, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32),
              jr.randint(jr.key(32), (1, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32)]
    big = jnp.concatenate(pieces, axis=0)
    w = jnp.where(jnp.arange(n) % 8 == 0, 1.0, 0.0)
    w = w / w.sum()
    F = systematic_F(jr.key(33), w)
    ref_out, ref_par = resample_gather_rows(big, F, interpret=True)
    outs, parents = resample_gather_split(pieces, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents), np.asarray(ref_par))
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate(outs, axis=0)), np.asarray(ref_out))


def test_resample_gather_split_degenerate_interpret():
    # all mass on one particle: every output comes from a single source
    # lane; also exercises the shifted-edge-chunk mask at the array end
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows, resample_gather_split)
    from genparticlefilters_tpu.smc.resample import systematic_F
    n = 900
    pieces = [jr.randint(jr.key(7), (5, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32)]
    w = jnp.zeros((n,)).at[n - 1].set(1.0)
    F = systematic_F(jr.key(8), w)
    ref_out, ref_par = resample_gather_rows(
        jnp.concatenate(pieces, axis=0), F, interpret=True)
    outs, parents = resample_gather_split(pieces, F, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents), np.asarray(ref_par))
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(ref_out))


def test_resample_gather_rows_pieces_resize_interpret():
    from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows
    from genparticlefilters_tpu.smc.resample import systematic_F
    n, m = 2048, 1024
    pieces = [jr.randint(jr.key(i + 9), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate((5, 1))]
    big = jnp.concatenate(pieces, axis=0)
    w = jr.dirichlet(jr.key(70), jnp.ones(n))
    F = systematic_F(jr.key(71), w, m)
    out_ref_, parents_ref = resample_gather_rows(big, F, n_out=m,
                                                 interpret=True)
    out, parents = resample_gather_rows(pieces, F, n_out=m, interpret=True)
    np.testing.assert_array_equal(np.asarray(parents),
                                  np.asarray(parents_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref_))
