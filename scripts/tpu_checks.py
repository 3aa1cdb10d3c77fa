"""On-hardware checks that CPU tests cannot cover (VERDICT r4: missing #1,
weak #3; ADVICE r4 #5). Runs on the real TPU chip and writes a JSON
artifact ``TPU_CHECKS_r05.json``:

1. **shard_map + fused Pallas composition actually executes on TPU**: a
   1-device mesh is built on the chip, ``pf_resample_blockwise(mesh=...)``
   and ``pf_rotate_blocks(mesh=...)`` run end-to-end, and the compiled
   TPU HLO of the shard_map body is asserted to contain the Mosaic
   custom-call (i.e. ``use_fused`` FIRED inside the body — the CPU suite
   always takes the fallback branch) while matching the no-mesh oracle.
2. **Pack-kernel pieces path at n far below the 2048 pack block** on
   hardware: edge-block garbage lanes must stay inert (the CPU interpret
   tests zero-fill OOB reads; hardware reads real tile padding).
3. **Split-kernel (pack-free) path vs pack-kernel path bit-equality on
   hardware** across n in {600, 4096, 100_000, 2**18+13} incl.
   non-128-multiples (the clamped edge DMA logic differs from interpret
   emulation by design and must be validated on the chip).

Usage: nohup python scripts/tpu_checks.py > /tmp/tpu_checks.log 2>&1 &
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.sharding import Mesh

import genparticlefilters_tpu as g
from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_dense, synthesize_data)
from genparticlefilters_tpu.parallel import (pf_resample_blockwise,
                                             pf_rotate_blocks)

RESULTS = {}


def check(name, ok, detail=""):
    RESULTS[name] = {"ok": bool(ok), "detail": detail}
    print(f"[{'OK' if ok else 'FAIL'}] {name}: {detail}", flush=True)
    if not ok:
        RESULTS["all_ok"] = False


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    assert dev.platform == "tpu", "tpu_checks must run on the real chip"
    RESULTS["device"] = str(dev)
    RESULTS["all_ok"] = True

    # ---- 1. shard_map + fused Pallas on a real-TPU mesh -----------------
    T, N = 10, 8192
    model = make_object_motion(T)
    y, _ = synthesize_data(jr.key(1), T, T // 2)
    st = g.pf_initialize(jr.key(0), model, (T, init_state()),
                         obs_dense(y), N)
    mesh = Mesh(np.array(jax.devices()[:1]), ("p",))

    def block_mesh(key, s):
        s = pf_resample_blockwise(key, s, 1, "systematic", mesh=mesh)
        return pf_rotate_blocks(s, 1, mesh=mesh)

    def block_nomesh(key, s):
        s = pf_resample_blockwise(key, s, 1, "systematic")
        return pf_rotate_blocks(s, 1)

    lowered = jax.jit(block_mesh).lower(jr.key(3), st)
    hlo = lowered.compile().as_text()
    has_mosaic = ("tpu_custom_call" in hlo) or ("Mosaic" in hlo)
    check("shardmap_fused_lowered", has_mosaic,
          "Mosaic custom-call present in TPU HLO of the shard_map "
          "blockwise body" if has_mosaic else
          "NO Mosaic custom-call — fused path did not fire in shard_map")

    out_mesh = jax.jit(block_mesh)(jr.key(3), st)
    out_ref = jax.jit(block_nomesh)(jr.key(3), st)
    lw_eq = np.array_equal(np.asarray(out_mesh.log_weights),
                           np.asarray(out_ref.log_weights))
    par_eq = np.array_equal(np.asarray(out_mesh.parents),
                            np.asarray(out_ref.parents))
    tr_eq = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(out_mesh.traces),
                        jax.tree_util.tree_leaves(out_ref.traces)))
    check("shardmap_fused_executed_matches_oracle",
          lw_eq and par_eq and tr_eq,
          f"mesh path ran on chip; bit-equal to no-mesh oracle "
          f"(lw={lw_eq} parents={par_eq} traces={tr_eq})")

    # ---- 2 & 3. pack-kernel and split-kernel vs ground truth ------------
    from genparticlefilters_tpu.ops.fused_gather import (
        resample_gather_rows, resample_gather_split,
        resample_gather_rows_u, resample_gather_split_u)
    from genparticlefilters_tpu.smc.resample import (systematic_F,
                                                     multinomial_cu)

    for n in (600, 1000, 4096, 100_000, (1 << 18) + 13):
        widths = (40, 1, 7)
        pieces = [jr.randint(jr.key(97 + i), (w, n), -2**31, 2**31 - 1,
                             dtype=jnp.int32) for i, w in enumerate(widths)]
        big = jnp.concatenate(pieces, axis=0)
        w = jr.dirichlet(jr.key(5), jnp.ones(n) * 0.4)
        F = systematic_F(jr.key(6), w)
        out_pack, par_pack = jax.jit(
            lambda p, F: resample_gather_rows(p, F))(pieces, F)
        truth = jnp.take(big, par_pack, axis=1)
        ok_pack = np.array_equal(np.asarray(out_pack), np.asarray(truth))
        in_range = bool((np.asarray(par_pack) >= 0).all()
                        and (np.asarray(par_pack) < n).all())
        check(f"pack_pieces_hw_n{n}", ok_pack and in_range,
              f"pack-kernel pieces path == jnp.take ground truth "
              f"(parents in range: {in_range})")
        if n >= 512:
            outs, par_s = jax.jit(
                lambda p, F: resample_gather_split(p, F))(pieces, F)
            eq_par = np.array_equal(np.asarray(par_s), np.asarray(par_pack))
            off = 0
            eq_out = True
            for o_, wd in zip(outs, widths):
                eq_out &= np.array_equal(np.asarray(o_),
                                         np.asarray(out_pack[off:off + wd]))
                off += wd
            check(f"split_vs_pack_hw_n{n}", eq_par and eq_out,
                  f"split kernel bit-equal to pack kernel on hardware "
                  f"(parents={eq_par} outs={eq_out})")
            # float-bracket variant
            c, u = multinomial_cu(jr.key(7), w)
            out_u, par_u = jax.jit(
                lambda p, c, u: resample_gather_rows_u(p, c, u))(pieces, c, u)
            outs_u, par_su = jax.jit(
                lambda p, c, u: resample_gather_split_u(p, c, u))(pieces, c, u)
            equ = np.array_equal(np.asarray(par_su), np.asarray(par_u))
            off = 0
            eqo = True
            for o_, wd in zip(outs_u, widths):
                eqo &= np.array_equal(np.asarray(o_),
                                      np.asarray(out_u[off:off + wd]))
                off += wd
            check(f"split_u_vs_pack_hw_n{n}", equ and eqo,
                  f"float-bracket split kernel bit-equal on hardware")

    # slab-kernel RESIDUAL loop on hardware: weights on every 8th particle
    # spread each output block's parents over ~8*B lanes, overflowing the
    # 1024-lane slab so the in-kernel residual DMA loop (and its
    # shifted-coverage premask) must run
    n = 100_000
    widths = (40, 1, 7)
    pieces = [jr.randint(jr.key(201 + i), (w, n), -2**31, 2**31 - 1,
                         dtype=jnp.int32) for i, w in enumerate(widths)]
    big = jnp.concatenate(pieces, axis=0)
    w = jnp.where(jnp.arange(n) % 8 == 0, 1.0, 0.0)
    w = w / w.sum()
    F = systematic_F(jr.key(202), w)
    outs, par_s = jax.jit(
        lambda p, F: resample_gather_split(p, F))(pieces, F)
    truth = jnp.take(big, par_s, axis=1)
    ok = np.array_equal(np.asarray(jnp.concatenate(outs, axis=0)),
                        np.asarray(truth))
    stride_ok = bool((np.asarray(par_s) % 8 == 0).all())
    check("split_slab_residual_hw", ok and stride_ok,
          f"slab-overflow residual loop on hardware == jnp.take truth "
          f"(parents all stride-8: {stride_ok})")

    path = __file__.rsplit("/", 2)[0] + "/TPU_CHECKS_r05.json"
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("wrote", path, "all_ok =", RESULTS["all_ok"], flush=True)


if __name__ == "__main__":
    main()
