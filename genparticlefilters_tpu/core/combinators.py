"""Combinators: ``Unfold`` (state-space scan) and ``MapCombinator`` (plate).

Gen.jl's ``Unfold`` combinator powers the reference's state-space models
(fixture at /root/reference/test/runtests.jl:10, README driver at
/root/reference/README.md:66-77): each ``pf_update!`` extends the unfolded
trace by one timestep with incremental re-scoring.

TPU-native design: an ``Unfold(step, max_steps)`` trace holds the step
sub-traces **stacked along a static time axis** ``[T_max, ...]`` plus a traced
active length ``t``; extension is *masking*, not reallocation. All interpreters
are a single ``lax.scan`` over the time axis, so the whole SMC step — including
trace extension — stays inside one XLA computation with fixed shapes. The
active mask keeps inactive steps out of scores, weights, and presence masks
(NaN/Inf-safe via ``jnp.where``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from .choicemap import ChoiceMap, Entry, Selection, EMPTY
from .gfi import (GenFn, Trace, UnknownChange, current_batch, _to_batch,
                  batched_interpretation)
from .packed import (StepStorage, make_storage, unpack_tree, read_step,
                     write_steps, zeros_column, pack_column)

__all__ = ["Unfold", "MapCombinator"]


def _tree_where(cond, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(cond, x, y), a, b)


def _inner(store, t, outer_mask=True):
    """Unfold trace payload: the packed step storage
    (:class:`~.packed.StepStorage`, holding BOTH the stacked step choices
    and the stacked retval carries — see core/packed.py) plus the traced
    active length. The ``outer_mask`` key exists ONLY when the mask is
    non-trivial: a Python ``True`` stored as a pytree leaf would be
    canonicalized to a traced array by any jit/scan boundary, silently
    failing the ``is True`` static gates (and with them the O(1) Extend and
    O(window) regenerate fast paths) for every state carried through
    ``lax.scan`` — the absent-key form keeps "unmasked" in the treedef."""
    if outer_mask is True:
        return {"store": store, "t": t}
    return {"store": store, "t": t, "outer_mask": outer_mask}


def _inner_c(store, t, carry, outer_mask=True):
    """Like :func:`_inner` plus the ``carry`` cache: the retval tree AFTER
    the last active step (= ``read_step(store, t-1)["retval"]`` when
    ``t > 0``; unspecified values at ``t == 0``). Caching it on the trace
    saves the O(k) extension path a dynamic row-slab read of the packed
    matrix per step (~12 µs/step at N=100K, more at 1M) — the rows are
    still stored in ``mat`` (resampling gathers the carry leaves as
    ordinary per-particle rows alongside it). Every hot-path constructor
    provides it; carry-less traces (e.g. restored checkpoints) fall back
    to the row read.

    Gated to SCALAR-per-particle carries (batched ``[b]`` leaves / ``()``
    under per-particle interpretation): a wide carry (e.g. MOT's
    ``[N, K, 2]``) would pay a moveaxis transpose in every resampling
    pack — measured as a few ms at the config-5 N=1M shape — where the
    row read it replaces is cheap. The gate depends only on the
    interpretation form and static shapes, so every construction path of
    a given model makes the same decision (treedef consistency)."""
    d = _inner(store, t, outer_mask)
    from .gfi import current_batch
    b = current_batch()
    want = () if b is None else (b,)
    for l in jax.tree_util.tree_leaves(carry):
        if tuple(jnp.shape(l)) != want:
            return d
    d["carry"] = carry
    return d


def _trace_carry(tr: Trace, fallback_idx=None):
    """The carry cache, or the stored row read when absent."""
    c = tr.inner.get("carry")
    if c is not None:
        return c
    t = tr.inner["t"] if fallback_idx is None else fallback_idx
    return read_step(tr.inner["store"], jnp.maximum(t - 1, 0))["retval"]


def _outer_mask(tr):
    return tr.inner.get("outer_mask", True)


def _and_lead(mask, active, value_ndim):
    """AND an entry mask (broadcastable over leading axes) with a leading-axis
    mask ``active`` of shape [T]."""
    if mask is False:
        return False
    a = jnp.asarray(active, bool)
    if mask is True:
        return a
    m = jnp.asarray(mask, bool)
    if m.ndim < a.ndim:
        m = jnp.broadcast_to(m, a.shape + m.shape[a.ndim:])
    extra = m.ndim - a.ndim
    a = a.reshape(a.shape + (1,) * extra)
    return jnp.logical_and(m, a)




def _onehot_read(leaf, t, T):
    """Read ``leaf[t]`` (t traced) as a dynamic slice on the MAJOR (time)
    axis. The stacked trace storage is time-major (particle axis at 1; see
    core/batching.py), so this touches only step ``t``'s lane-dense row —
    O(N) HBM traffic, vs the full-array pass a one-hot masked reduce (or a
    minor-axis dynamic index, in the particle-major layout) would cost."""
    return lax.dynamic_index_in_dim(leaf, t, axis=0, keepdims=False)


def _onehot_write(leaf, t, value, T):
    """``leaf.at[t].set(value)`` (t traced) as a major-axis dynamic update
    slice: O(N) touched bytes, and XLA aliases the buffer in scan carries."""
    v = jnp.asarray(value, leaf.dtype)
    return lax.dynamic_update_index_in_dim(leaf, v, t, axis=0)


def _tree_read_at(tree, t, T):
    return jax.tree_util.tree_map(lambda l: _onehot_read(l, t, T), tree)


def _tree_write_at(tree, t, values, T):
    return jax.tree_util.tree_map(
        lambda l, v: _onehot_write(l, t, v, T), tree, values)


def _batch_state0(state0, b):
    """Give every carried-state leaf a leading particle axis in batched
    interpretation, so the scan carry has a fixed shape from step 0 (shared
    initial states broadcast; leading-dim==b leaves pass through)."""
    if b is None:
        return state0
    return jax.tree_util.tree_map(lambda l: _to_batch(l, b), state0)


def _reduce_steps(vals, active, b):
    """Σ over the time axis of per-step accumulators ``vals`` ([T] or
    [T, b]) under the active mask ([T] or [T, b]); keeps the particle axis
    in batched mode."""
    if b is None:
        return jnp.sum(jnp.where(active, vals, 0.0))
    vals = jnp.asarray(vals)
    a = jnp.asarray(active, bool)
    if vals.ndim == 1:  # shared accumulator (no per-particle sites)
        vals = vals[:, None]
    if a.ndim == 1:
        a = a[:, None]
    return jnp.sum(jnp.where(a, vals, 0.0), axis=0)


def _slim_steps(steps: Trace) -> Trace:
    """Drop per-step args/retval AND the per-step score from stacked step
    traces: args are reconstructed on every interpretation, carried states
    are stacked separately as the Unfold retval, and the old step score is
    recovered exactly by the ``_sel_logp`` forced re-execution pass the
    window-rejuvenation paths already run — so storing any of them per step
    only inflates the particle state that every resampling gather and
    trace-extension write has to move. The score slot keeps a width-0
    placeholder so the pytree structure of a slimmed column matches a
    slimmed stack minus its leading axis."""
    score = jnp.zeros(jnp.shape(steps.score) + (0,), jnp.float32)
    return Trace(steps.gen_fn, (), None, score, steps.inner)


def _col_tree(steps_col, state):
    """Per-step logical column: the slimmed step trace + the retval carry
    (the two live side by side in the packed storage)."""
    return {"retval": state, "steps": steps_col}


class Unfold(GenFn):
    """Markov-chain combinator over a step generative function.

    ``step`` has signature ``step(t, state, *params) -> new_state`` (addresses
    inside are per-step). ``Unfold(step, max_steps)`` is called with args
    ``(t_active, init_state, *params)`` where ``t_active`` may be a traced
    int32; the trace always has static shape ``[max_steps, ...]`` with steps
    ``t >= t_active`` masked inactive.

    The retval is the stacked sequence of carried states ``[max_steps, ...]``:
    slot ``t`` holds the state carried out of step ``t`` for every ACTIVE
    step; slots at inactive steps (``t >= t_active``) are unspecified
    (full-scan interpreters happen to repeat the last active state there;
    the O(1) extension and O(window) rejuvenation paths leave them
    untouched). Read the current carry as slot ``t_active - 1`` — on the
    time-major layout that dynamic row read is O(N) and costs nothing to
    maintain, unlike the earlier always-refreshed ``[-1]`` tail slot
    (two extra tile-RMW row writes per extension step).

    Batched storage is TIME-MAJOR: across particles, stacked step/retval
    leaves carry the particle axis at position 1 (``[T, N, ...]``, lane-dense
    in particles — see :meth:`trace_axes` and core/batching.py), so dynamic
    per-timestep reads/writes touch O(N) bytes and the resampling ancestry
    gather is an in-lane gather.
    """

    def __init__(self, step: GenFn, max_steps: int):
        self.step = step
        self.T = int(max_steps)

    @property
    def batch_safe(self):
        return self.step.batch_safe

    def __repr__(self):
        return f"Unfold({self.step!r}, T={self.T})"

    # -- helpers ----------------------------------------------------------
    def _split_args(self, args):
        t_active = jnp.asarray(args[0], jnp.int32)
        state0 = args[1]
        params = tuple(args[2:])
        return t_active, state0, params

    def active_mask(self, tr: Trace):
        """Public [T] (or [*B, T]) bool mask of ACTIVE timesteps for a trace
        of this Unfold. Retval/choice slots at inactive steps are
        *unspecified* (structural zeros on the O(k) generate/extend paths,
        last-state repeats on full-scan paths — the two interpreters differ,
        so padded slots must never be read): mask any per-timestep read of
        ``get_retval()`` / ``statistics.mean(fn=...)`` with this before
        reducing over time. See docs/gfi.md "Unfold padding contract"."""
        return self._active(tr.inner["t"], _outer_mask(tr))

    def _active_tb(self, t_active, outer_mask, b):
        """Interpreter-internal active mask in TIME-LEADING orientation:
        [T], or [T, b] in batched interpretation with a per-particle
        outer mask (``t_active`` is always a shared scalar here)."""
        a = (jnp.arange(self.T, dtype=jnp.int32)
             < jnp.asarray(t_active, jnp.int32))
        if outer_mask is not True:
            om = jnp.asarray(outer_mask, bool)
            if b is not None and om.ndim >= 1:
                a = jnp.logical_and(a[:, None], om[None, :])
            else:
                a = jnp.logical_and(a, om)
        return a

    def _active(self, t_active, outer_mask):
        """Active-step mask; supports batched ``t_active`` of shape [*B]
        (e.g. a stacked particle axis), giving a [*B, T] mask."""
        t = jnp.asarray(t_active, jnp.int32)
        steps = jnp.arange(self.T, dtype=jnp.int32)
        a = steps < (t[..., None] if t.ndim else t)
        if outer_mask is not True:
            om = jnp.asarray(outer_mask, bool)
            a = jnp.logical_and(a, om[..., None] if om.ndim else om)
        return a

    def _densify(self, cm: ChoiceMap) -> ChoiceMap:
        """Convert int-keyed (per-timestep) constraints into dense
        ``[T, ...]`` entries with ``[T]`` masks; pass dense entries through."""
        dense: Dict[Tuple, Entry] = dict(cm.str_keyed().entries)
        by_t = cm.int_keyed()
        if by_t:
            addr_proto = {}
            for t, sub in by_t.items():
                if not (0 <= t < self.T):
                    raise IndexError(
                        f"constraint timestep {t} out of range [0,{self.T})")
                for k, e in sub.entries.items():
                    addr_proto.setdefault(k, e)
            for k, proto in addr_proto.items():
                v0 = jnp.asarray(proto.value)
                vals = jnp.zeros((self.T,) + v0.shape, dtype=v0.dtype)
                mask = jnp.zeros((self.T,), dtype=bool)
                for t, sub in by_t.items():
                    e = sub.entries.get(k)
                    if e is None:
                        continue
                    vals = vals.at[t].set(jnp.asarray(e.value, dtype=v0.dtype))
                    m = True if e.mask is True else jnp.asarray(e.mask, bool)
                    mask = mask.at[t].set(m)
                if k in dense:
                    dense[k] = Entry(vals, mask) if dense[k] is None else (
                        ChoiceMap({k: dense[k]}).merge(
                            ChoiceMap({k: Entry(vals, mask)})).entries[k])
                else:
                    dense[k] = Entry(vals, mask)
        return ChoiceMap(dense)

    def _densify_selection(self, sel: Selection) -> Selection:
        if sel.all_:
            return sel
        entries = dict(sel.str_keyed().entries)
        by_t = sel.int_keyed()
        if by_t:
            addr_masks: Dict[Tuple, jnp.ndarray] = {}
            for t, sub in by_t.items():
                for k, m in sub.entries.items():
                    cur = addr_masks.get(k)
                    if cur is None:
                        cur = jnp.zeros((self.T,), dtype=bool)
                    mv = True if m is True else jnp.asarray(m, bool)
                    addr_masks[k] = cur.at[t].set(mv)
            for k, m in addr_masks.items():
                if k in entries:
                    prev = entries[k]
                    if prev is True:
                        continue
                    entries[k] = jnp.logical_or(jnp.asarray(prev, bool), m)
                else:
                    entries[k] = m
        return Selection(entries)

    def _slice_cm(self, dense: ChoiceMap):
        """Pytree of per-step entries for lax.scan xs (leading T axis).

        Entries with static True masks or values lacking a leading T axis are
        broadcast to [T, ...] first.
        """
        out = {}
        for k, e in dense.entries.items():
            v = jnp.asarray(e.value)
            if v.ndim == 0 or v.shape[0] != self.T:
                v = jnp.broadcast_to(v, (self.T,) + v.shape)
            if e.mask is True:
                m = True  # STATIC: per-step slices stay statically
                # constrained, so handlers take the no-sampling fast path
                # and store the site SHARED (see docs/gfi.md)
            else:
                m = jnp.asarray(e.mask, bool)
                if m.ndim == 0 or m.shape[0] != self.T:
                    m = jnp.broadcast_to(m, (self.T,) + m.shape)
            out[k] = Entry(v, m)
        return ChoiceMap(out)

    def _slice_sel(self, dsel: Selection):
        """Selection pytree scannable over T (static entries broadcast)."""
        if dsel.all_:
            return dsel, True  # static, not scanned
        entries = {}
        static = True
        for k, m in dsel.entries.items():
            if m is True or m is False:
                entries[k] = m
            else:
                mm = jnp.asarray(m, bool)
                if mm.ndim == 0 or mm.shape[0] != self.T:
                    mm = jnp.broadcast_to(mm, (self.T,) + mm.shape)
                entries[k] = mm
                static = False
        return Selection(entries), static

    @staticmethod
    def _skip_inactive(active, run_fn, operands):
        """Run ``run_fn(*operands)`` only when the scalar step-activity
        predicate holds; inactive steps return structural zeros WITHOUT
        executing the step body. The predicate is the scan step index vs
        the traced active length — scalar even under a particle-axis vmap,
        so ``lax.cond`` is a real runtime branch: at init (t_active=1 of
        max_steps) this skips ~(T-1)/T of all sampling/PRNG work, which
        dominated pf_initialize."""
        shapes = jax.eval_shape(run_fn, *operands)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return lax.cond(active, lambda op: run_fn(*op),
                        lambda op: zeros, operands)

    # -- packed storage plumbing (core/packed.py) -------------------------
    def _make_store(self, slim_steps, states, b) -> StepStorage:
        """Pack scan-stacked (slimmed) step traces + stacked retval carries
        into the [T*R, N] step storage. ``b`` = current batch (None under
        per-particle/vmapped interpretation)."""
        from .batching import gen_spec, perparticle_specs
        logical = _col_tree(slim_steps, states)
        if b is None:
            with perparticle_specs():
                spec = _col_tree(self.step.trace_axes(slim_steps, 1),
                                 gen_spec(states, 1, None))
            return make_storage(logical, spec, self.T, batched=False)
        spec = _col_tree(self.step.trace_axes(slim_steps, 1),
                         gen_spec(states, 1, b))
        return make_storage(logical, spec, self.T, batched=True)

    @staticmethod
    def _steps_of(tr: Trace):
        """Materialized stacked step trace (cold paths only: choicemaps,
        full-scan discard construction; under jit unused leaves are DCE'd)."""
        return unpack_tree(tr.inner["store"])["steps"]

    @staticmethod
    def _retvals_of(tr: Trace):
        """Materialized stacked retval carries [T, ...]."""
        return unpack_tree(tr.inner["store"])["retval"]

    def trace_retval(self, tr: Trace):
        return self._retvals_of(tr)

    # -- GFI --------------------------------------------------------------
    def simulate(self, key, args):
        t_active, state0, params = self._split_args(args)
        b = current_batch()
        state0 = _batch_state0(state0, b)
        ts = jnp.arange(self.T, dtype=jnp.int32)

        def body(state, t):
            k = jr.fold_in(key, t)
            a = t < t_active
            tr = self._skip_inactive(
                a, lambda k_, s_, t_: self.step.simulate(k_, (t_, s_) + params),
                (k, state, t))
            new_state = _tree_where(a, tr.get_retval(), state)
            return new_state, (tr, new_state)

        fin, (steps, states) = lax.scan(body, state0, ts)
        active = self._active_tb(t_active, True, b)
        score = _reduce_steps(steps.score, active, b)
        inner = _inner_c(self._make_store(_slim_steps(steps), states, b),
                         t_active, fin)
        return Trace(self, args, None, score, inner)

    def _empty_trace(self, key, args, constraints: ChoiceMap = EMPTY):
        """A t_active=0 trace (all steps inactive): structural zeros built
        from an abstract evaluation of a CONSTRAINED generate — no step body
        executes. Shaping against the constraints matters: fully-constrained
        sites are stored SHARED (no particle axis), and the extension writes
        into this proto must preserve that (an unconstrained ``simulate``
        shape would batch them). t_active=0 keeps the full-scan path (no
        fast-path recursion)."""
        _, state0, params = self._split_args(args)
        zero_args = (jnp.asarray(0, jnp.int32), state0) + params
        shapes = jax.eval_shape(
            lambda k: self.generate(k, zero_args, constraints)[0], key)
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def generate(self, key, args, constraints: ChoiceMap = EMPTY):
        t_active, state0, params = self._split_args(args)
        # small static active length: build the trace by extending an empty
        # (zeros) trace with the O(k) incremental path instead of scanning
        # all max_steps — pf_initialize at t_active=1 is the dominant case
        # (weight = score − logq = Σ log p(constrained), the generate
        # contract; values/masks at inactive steps are structural zeros
        # either way). Staticness is judged on the RAW args[0]: JAX >= 0.9
        # lifts ``jnp.asarray(1)`` to a tracer under an active trace, so
        # checking the converted ``t_active`` would (silently) disable this
        # path under jit — the full-T scan cost ~0.5 ms of the 2.2 ms
        # N=100K headline filter before this was caught on an xprof trace
        if not isinstance(args[0], jax.core.Tracer):
            k_static = int(args[0])
            if 0 < k_static <= 2 and self.T > k_static:
                tr0 = self._empty_trace(key, args, constraints)
                new_tr, logq, _ = self._update_extend(
                    key, tr0, args, constraints, k_static)
                return new_tr, new_tr.score - logq
        dense = self._slice_cm(self._densify(constraints))
        b = current_batch()
        state0 = _batch_state0(state0, b)
        ts = jnp.arange(self.T, dtype=jnp.int32)

        def body(state, xs):
            t, step_c = xs
            k = jr.fold_in(key, t)
            a = t < t_active
            tr, w = self._skip_inactive(
                a, lambda k_, s_, t_, c_: self.step.generate(
                    k_, (t_, s_) + params, c_),
                (k, state, t, step_c))
            new_state = _tree_where(a, tr.get_retval(), state)
            return new_state, (tr, new_state, w)

        fin, (steps, states, ws) = lax.scan(body, state0, (ts, dense))
        active = self._active_tb(t_active, True, b)
        score = _reduce_steps(steps.score, active, b)
        weight = _reduce_steps(ws, active, b)
        inner = _inner_c(self._make_store(_slim_steps(steps), states, b),
                         t_active, fin)
        return Trace(self, args, None, score, inner), weight

    def assess(self, args, choices: ChoiceMap):
        t_active, state0, params = self._split_args(args)
        dense = self._slice_cm(self._densify(choices))
        ts = jnp.arange(self.T, dtype=jnp.int32)

        # eager coverage check: every active step of every address must be
        # constrained (a plain @gen model raises on a missing address; the
        # dense-mask representation would otherwise silently score zeros).
        # Raw-args staticness, not the asarray'd t_active (see generate)
        if not isinstance(args[0], jax.core.Tracer):
            act = jnp.arange(self.T) < int(args[0])
            for k2, e in dense.entries.items():
                m = e.mask
                m = jnp.asarray(m, bool) if m is not True else jnp.ones(
                    (self.T,), bool)
                covered = jnp.logical_or(m.reshape(self.T, -1).all(axis=1),
                                         jnp.logical_not(act))
                if not isinstance(covered, jax.core.Tracer) and not bool(
                        jnp.all(covered)):
                    raise ValueError(
                        f"assess: address {k2} missing at some active "
                        "timesteps")

        b = current_batch()
        state0 = _batch_state0(state0, b)

        def body(state, xs):
            t, step_c = xs
            # assess per-step: all sites constrained by the dense arrays
            retval, s = self.step.assess((t, state) + params,
                                         step_c.map_values(lambda v: v))
            a = t < t_active
            new_state = _tree_where(a, retval, state)
            return new_state, (new_state, s)

        _, (states, ss) = lax.scan(body, state0, (ts, dense))
        active = self._active_tb(t_active, True, b)
        score = _reduce_steps(ss, active, b)
        return states, score

    def _update(self, key, tr: Trace, new_args, constraints: ChoiceMap,
                argdiffs=None):
        # incremental extension fast path: argdiffs = (Extend(k), NoChange...)
        # promises t_new = t_old + k with params/state0 unchanged and
        # constraints only on the new steps -> compute just k steps instead
        # of re-scanning all max_steps (the TPU analogue of Gen's
        # incremental Unfold update, /root/reference/src/update.jl:16-17)
        from .gfi import Extend, NoChange
        if (argdiffs is not None and len(argdiffs) >= 1
                and isinstance(argdiffs[0], Extend)
                and all(isinstance(d, NoChange) for d in argdiffs[1:])
                and _outer_mask(tr) is True):
            return self._update_extend(key, tr, new_args, constraints,
                                       argdiffs[0].k)
        t_new, state0, params = self._split_args(new_args)
        t_old = tr.inner["t"]
        outer_mask = _outer_mask(tr)
        old_store = tr.inner["store"]
        dense = self._slice_cm(self._densify(constraints))
        b = current_batch()
        state0 = _batch_state0(state0, b)
        ts = jnp.arange(self.T, dtype=jnp.int32)

        def body(state, xs):
            t, step_c = xs
            old_step = read_step(old_store, t)["steps"]
            a_old = t < t_old
            if outer_mask is not True:
                a_old = jnp.logical_and(a_old, outer_mask)
            masked_old = self.step.mask_trace(old_step, a_old)
            k = jr.fold_in(key, t)
            new_step, logq_t, disc_t = self.step._update(
                k, masked_old, (t, state) + params, step_c)
            a_new = t < t_new
            state = _tree_where(a_new, new_step.get_retval(), state)
            return state, (new_step, state, logq_t, disc_t)

        fin, (steps, states, logqs, disc) = lax.scan(
            body, state0, (ts, dense))
        a_new = self._active_tb(t_new, True, b)
        a_old = self._active_tb(t_old, outer_mask, b)
        if b is not None and jnp.ndim(a_old) > jnp.ndim(a_new):
            a_new = jnp.broadcast_to(a_new[:, None], a_old.shape)
        score = _reduce_steps(steps.score, a_new, b)
        logq = _reduce_steps(logqs, a_new, b)
        # discard entries: per-step stacked (masks already include the
        # constraint∧old masks); mask them with new-activity, and add choices
        # of steps deactivated by shrinking t (spec: Gen update discard
        # semantics as exercised at /root/reference/src/update.jl:16-20).
        disc_entries = {}
        for k2, e in disc.entries.items():
            disc_entries[k2] = Entry(
                e.value, _and_lead(e.mask, a_new, jnp.ndim(e.value)))
        shrink = jnp.logical_and(a_old, jnp.logical_not(a_new))
        old_choices = self.step.trace_choices(self._steps_of(tr))
        shrink_cm_entries = {}
        for k2, e in old_choices.entries.items():
            shrink_cm_entries[k2] = Entry(
                e.value, _and_lead(e.mask, shrink, jnp.ndim(e.value)))
        discard = ChoiceMap(disc_entries).merge(ChoiceMap(shrink_cm_entries))
        inner = _inner_c(self._make_store(_slim_steps(steps), states, b),
                         t_new, fin)
        new_tr = Trace(self, new_args, None, score, inner)
        # adjust logq: caller computes weight = new.score - old.score - logq,
        # where old.score was computed with the *old* masks. Consistent.
        return new_tr, logq, discard

    def _update_extend(self, key, tr: Trace, new_args,
                       constraints: ChoiceMap, k: int):
        """O(k) trace extension: run only the k newly activated steps and
        write them into the stacked step traces at dynamic indices.

        The new active length must not exceed ``max_steps`` (checked
        eagerly; under jit the caller owns the promise)."""
        t_new, state0, params = self._split_args(new_args)
        t_old = tr.inner["t"]
        if not isinstance(new_args[0], jax.core.Tracer):
            if int(new_args[0]) > self.T:
                raise ValueError(
                    f"Extend({k}) would grow the Unfold past max_steps="
                    f"{self.T} (new active length {int(t_new)})")
        old_store = tr.inner["store"]
        dense = self._slice_cm(self._densify(constraints))

        # carry state entering step t_old: the cached carry (no row read);
        # carry-less traces (restored checkpoints) read the packed slab
        prev_state = _trace_carry(tr)
        state = _tree_where(t_old > 0, prev_state, state0)

        score_add = jnp.asarray(0.0, jnp.float32)
        logq = jnp.asarray(0.0, jnp.float32)
        # proto: a structurally identical step trace masked fully absent —
        # values never matter under a False mask, so build it from layout
        # zeros instead of reading a column of the store (saves one slab
        # read per extension)
        proto = self.step.mask_trace(zeros_column(old_store)["steps"], False)
        cols = []
        for j in range(int(k)):
            t = t_old + j
            step_c = _tree_read_at(dense, t, self.T)
            kj = jr.fold_in(key, t)
            new_step, logq_t, _ = self.step._update(
                kj, proto, (t, state) + params, step_c)
            state = new_step.get_retval()
            cols.append(_col_tree(_slim_steps(new_step), state))
            score_add = score_add + new_step.score
            logq = logq + logq_t

        # ONE [k*R, N] aligned slab write for choices AND retval carries
        # (was: one tile-RMW row write per leaf per step)
        store = write_steps(old_store, t_old, cols)
        inner = _inner_c(store, t_new, state)
        new_tr = Trace(self, new_args, None, tr.score + score_add, inner)
        return new_tr, logq, ChoiceMap({})

    def _old_prev_states(self, tr: Trace, fallback_state0, fallback_params,
                         old_args=None):
        """Old carry state entering each step t (= old stacked retval at
        t−1; old state0 at t=0), plus the old params — reconstructed from an
        explicit ``old_args`` (preferred) or the trace's stored args so
        per-step ``old_args`` can be passed down for exact sel_old
        recomputation."""
        src_args = old_args if old_args is not None else tr.args
        if src_args:
            _, old_state0, old_params = self._split_args(src_args)
        else:
            old_state0, old_params = fallback_state0, fallback_params
        old_prev = jax.tree_util.tree_map(
            lambda stk, s0: jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(s0, stk.dtype),
                                  stk[:1].shape), stk[:-1]], axis=0),
            self._retvals_of(tr), old_state0)
        return old_prev, old_params

    def _regenerate(self, key, tr: Trace, new_args, selection: Selection,
                    window=None, old_args=None, need_sel_old=True):
        if (window is not None and _outer_mask(tr) is True):
            return self._regenerate_window(key, tr, new_args, selection,
                                           int(window))
        t_new, state0, params = self._split_args(new_args)
        b = current_batch()
        state0 = _batch_state0(state0, b)
        t_old = tr.inner["t"]
        outer_mask = _outer_mask(tr)
        old_store = tr.inner["store"]
        old_prev, old_params = self._old_prev_states(tr, state0, params,
                                                     old_args=old_args)
        dsel, sel_static = self._slice_sel(self._densify_selection(selection))
        ts = jnp.arange(self.T, dtype=jnp.int32)

        def body(state, xs):
            if sel_static:
                t, old_prev_t = xs
                step_sel = dsel
            else:
                t, old_prev_t, step_sel = xs
            old_step = read_step(old_store, t)["steps"]
            a_old = t < t_old
            if outer_mask is not True:
                a_old = jnp.logical_and(a_old, outer_mask)
            masked_old = self.step.mask_trace(old_step, a_old)
            k = jr.fold_in(key, t)
            new_step, sn_t, so_t = self.step._regenerate(
                k, masked_old, (t, state) + params, step_sel,
                old_args=(t, old_prev_t) + old_params,
                need_sel_old=need_sel_old)
            a_new = t < t_new
            state = _tree_where(a_new, new_step.get_retval(), state)
            return state, (new_step, state, sn_t, so_t)

        xs = ((ts, old_prev) if sel_static
              else (ts, old_prev, dsel))
        fin, (steps, states, sns, sos) = lax.scan(body, state0, xs)
        a_new = self._active_tb(t_new, True, b)
        score = _reduce_steps(steps.score, a_new, b)
        sel_new = _reduce_steps(sns, a_new, b)
        sel_old = _reduce_steps(sos, a_new, b)
        inner = _inner_c(self._make_store(_slim_steps(steps), states, b),
                         t_new, fin)
        return Trace(self, new_args, None, score, inner), sel_new, sel_old

    def regenerate_delta(self, key, tr: Trace, new_args, argdiffs,
                         selection: Selection, window=None):
        """O(window) rejuvenation delta: recompute only the last ``window``
        active steps and return their column values WITHOUT materializing
        the written stacked arrays — :meth:`apply_regenerate_delta` folds
        the accept mask into one fused masked-column write per leaf. This
        keeps an MH sweep at ~2 full passes over the stacked trace instead
        of ~6 (write-back per window step + whole-trace accept select).

        Caller promise (same as :meth:`_regenerate_window`): the selection
        only touches the last ``window`` active steps AND the args are
        unchanged — the returned score delta covers only the window, so
        changed params/state0 (whose effect reaches earlier steps) would
        corrupt the MH weight."""
        if window is None or _outer_mask(tr) is not True:
            return super().regenerate_delta(key, tr, new_args, argdiffs,
                                            selection, window=window)
        k = int(window)
        t_new, state0, params = self._split_args(new_args)
        t_old = tr.inner["t"]
        old_store = tr.inner["store"]
        dsel, _ = self._slice_sel(self._densify_selection(selection))

        t_start = t_old - k
        idx_prev = jnp.maximum(t_start - 1, 0)
        prev_state = read_step(old_store, idx_prev)["retval"]
        state = _tree_where(t_start > 0, prev_state, state0)
        # old carry entering each window step: the stored stacked retval at
        # j=0 when t_start>0, else the OLD args' state0 (new state0 would
        # corrupt sel_old/old scores if regenerate ever ran with changed
        # args); stored stacked retvals thereafter
        if tr.args:
            _, old_state0, old_params = self._split_args(tr.args)
        else:
            old_state0, old_params = state0, params
        old_state = _tree_where(t_start > 0, prev_state, old_state0)

        cols = []
        score_delta = jnp.asarray(0.0, jnp.float32)
        sel_new = jnp.asarray(0.0, jnp.float32)
        sel_old = jnp.asarray(0.0, jnp.float32)
        for j in range(k):
            t = t_start + j
            t_c = jnp.clip(t, 0, self.T - 1)
            active_j = jnp.logical_and(t >= 0, t < t_old)
            old_col = read_step(old_store, t_c)
            old_step = old_col["steps"]
            step_sel = (dsel if dsel.all_ else Selection(
                {k2: (m if isinstance(m, bool) else
                      _onehot_read(jnp.asarray(m), t_c, self.T))
                 for k2, m in dsel.entries.items()}))
            kj = jr.fold_in(key, t_c)
            # one forced old-value pass per window step recovers BOTH the
            # reverse-proposal lp (sel_old) and the old step score (replacing
            # per-step score storage); the regenerate pass itself skips its
            # internal sel_old recomputation
            _, so_t, old_score_t = self.step._sel_logp(
                old_step, (t_c, old_state) + old_params, step_sel)
            new_step, sn_t, _ = self.step._regenerate(
                kj, old_step, (t_c, state) + params, step_sel,
                need_sel_old=False)
            new_col = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active_j, jnp.asarray(
                    new, jnp.asarray(old).dtype), old),
                _slim_steps(new_step), old_step)
            new_state = _tree_where(active_j, new_step.get_retval(), state)
            cols.append((t_c, active_j, new_col, new_state))
            score_delta = score_delta + jnp.where(
                active_j, new_step.score - old_score_t, 0.0)
            sel_new = sel_new + jnp.where(active_j, sn_t, 0.0)
            sel_old = sel_old + jnp.where(active_j, so_t, 0.0)
            state = new_state
            old_state = _tree_where(active_j, old_col["retval"], old_state)

        delta = {"cols": cols, "t_old": t_old, "last_state": state,
                 "score_delta": score_delta, "new_args": new_args}
        weight = score_delta - sel_new + sel_old
        return delta, weight

    def apply_regenerate_delta(self, tr: Trace, delta, accept):
        if isinstance(delta, Trace):  # generic fallback delta
            return super().apply_regenerate_delta(tr, delta, accept)
        cols = delta["cols"]
        t_old = delta["t_old"]

        from .gfi import _where_lead

        k = len(cols)
        # all window rows are CONTIGUOUS: [t_old-k, t_old) clipped at 0
        # (clipped entries are inactive). Slab start: t_start when >= 0,
        # else 0 — in both cases every active entry's row is s + (t_c - s)
        # with t_c - s in [0, k).
        slab_s = jnp.clip(t_old - k, 0, max(self.T - k, 0))

        store = tr.inner["store"]
        lo = store.layout
        R = lo.R
        batched = store.batched
        acc = jnp.asarray(accept)

        # pack each column ONCE; all accept/active selection then runs on
        # [R, N] slabs where the particle axis is uniformly on lanes — one
        # [k*R, N] aligned read + one write on the packed matrix replaces
        # the per-leaf tile-RMW row writes of the unpacked layout. The
        # window rows carry the updated retval carries too (rows in
        # [t_old, T-1] stay unspecified; readers use row t-1 dynamic reads).
        packed_cols = []
        for (t_c, active_j, col, state) in cols:
            cslab, extra_cols = pack_column(store, _col_tree(col, state))
            packed_cols.append((t_c, active_j, cslab, extra_cols))

        mat = store.mat
        if mat is not None:
            if k > self.T:
                for (t_c, active_j, cslab, _) in packed_cols:
                    take = jnp.logical_and(acc, active_j)
                    start = (t_c * R, 0) if batched else (t_c * R,)
                    old_slab = lax.dynamic_slice(mat, start, cslab.shape)
                    sel = (take[None, :] if batched and take.ndim == 1
                           else take)
                    mat = lax.dynamic_update_slice(
                        mat, jnp.where(sel, cslab, old_slab), start)
            else:
                start = (slab_s * R, 0) if batched else (slab_s * R,)
                big_shape = ((k * R, mat.shape[1]) if batched
                             else (k * R,))
                big = lax.dynamic_slice(mat, start, big_shape)
                for (t_c, active_j, cslab, _) in packed_cols:
                    take = jnp.logical_and(acc, active_j)
                    sel = (take[None, :] if batched and take.ndim == 1
                           else take)
                    off = ((t_c - slab_s) * R, 0) if batched \
                        else ((t_c - slab_s) * R,)
                    old_slab = lax.dynamic_slice(big, off, cslab.shape)
                    big = lax.dynamic_update_slice(
                        big, jnp.where(sel, cslab, old_slab), off)
                mat = lax.dynamic_update_slice(mat, big, start)

        # extras (values shared across particles): both sides hold the same
        # kept-old value under a per-particle accept (the _where_lead shared
        # convention), so a row-select write suffices
        extras = list(store.extras)
        for (t_c, active_j, _, extra_cols) in packed_cols:
            for i, v in enumerate(extra_cols):
                if v is None:
                    continue
                e = extras[i]
                take = jnp.logical_and(acc, active_j)
                old_row = _onehot_read(e, t_c, self.T)
                new_row = _where_lead(take, jnp.asarray(v, e.dtype), old_row)
                extras[i] = _onehot_write(e, t_c, new_row, self.T)

        new_store = StepStorage(mat, tuple(extras), lo)
        score = tr.score + jnp.where(accept, delta["score_delta"], 0.0)
        # carry: the delta's post-window state where accepted (the window
        # always ends at the last active step on this path), else the old
        # carry; cols[-1] is inactive only when t_old == 0, where
        # last_state degenerates to the old carry values anyway
        from .gfi import _where_lead as _wl
        take_last = jnp.logical_and(jnp.asarray(accept), cols[-1][1])
        old_carry = _trace_carry(tr)
        carry = jax.tree_util.tree_map(
            lambda nw, od: _wl(take_last, jnp.asarray(nw, jnp.asarray(
                od).dtype), od), delta["last_state"], old_carry)
        inner = _inner_c(new_store, t_old, carry)
        return Trace(self, delta["new_args"], None, score, inner)

    def _regenerate_window(self, key, tr: Trace, new_args,
                           selection: Selection, k: int):
        """O(k) rejuvenation: recompute only the last k active steps.

        Caller promise (like :class:`~.gfi.Extend`): the selection does not
        touch steps before ``t_active - k``, and the args are unchanged.
        """
        t_new, state0, params = self._split_args(new_args)
        t_old = tr.inner["t"]
        store = tr.inner["store"]
        dsel, _ = self._slice_sel(self._densify_selection(selection))

        t_start = t_old - k
        idx_prev = jnp.maximum(t_start - 1, 0)
        prev_state = read_step(store, idx_prev)["retval"]
        state = _tree_where(t_start > 0, prev_state, state0)
        if tr.args:
            _, old_state0, old_params = self._split_args(tr.args)
        else:
            old_state0, old_params = state0, params
        old_state = _tree_where(t_start > 0, prev_state, old_state0)

        score_delta = jnp.asarray(0.0, jnp.float32)
        sel_new = jnp.asarray(0.0, jnp.float32)
        sel_old = jnp.asarray(0.0, jnp.float32)
        for j in range(k):
            t = t_start + j
            t_c = jnp.clip(t, 0, self.T - 1)
            active_j = jnp.logical_and(t >= 0, t < t_old)
            old_col = read_step(store, t_c)
            old_step = old_col["steps"]
            step_sel = (dsel if dsel.all_ else Selection(
                {k2: (m if isinstance(m, bool) else
                      _onehot_read(jnp.asarray(m), t_c, self.T))
                 for k2, m in dsel.entries.items()}))
            kj = jr.fold_in(key, t_c)
            _, so_t, old_score_t = self.step._sel_logp(
                old_step, (t_c, old_state) + old_params, step_sel)
            new_step, sn_t, _ = self.step._regenerate(
                kj, old_step, (t_c, state) + params, step_sel,
                need_sel_old=False)
            write = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active_j, jnp.asarray(
                    new, jnp.asarray(old).dtype), old),
                _slim_steps(new_step), old_step)
            state = _tree_where(active_j, new_step.get_retval(), state)
            new_rv = _tree_where(active_j, state, old_col["retval"])
            store = write_steps(store, t_c, [_col_tree(write, new_rv)])
            score_delta = score_delta + jnp.where(
                active_j, new_step.score - old_score_t, 0.0)
            sel_new = sel_new + jnp.where(active_j, sn_t, 0.0)
            sel_old = sel_old + jnp.where(active_j, so_t, 0.0)
            old_state = _tree_where(active_j, old_col["retval"], old_state)

        # rows in [t_old, T-1] stay unspecified; readers use row t-1
        # dynamic reads (no [-1] tail row to maintain). The loop's final
        # ``state`` is the retval after step t_old-1 = the new carry.
        inner = _inner_c(store, t_old, state)
        new_tr = Trace(self, new_args, None, tr.score + score_delta, inner)
        return new_tr, sel_new, sel_old

    def _sel_logp(self, tr: Trace, args, selection: Selection, window=None):
        """Forced re-execution over the old stacked steps: recovers the
        selection-masked old log-probs without per-site score storage.

        With ``window`` (promise: the selection only touches the last
        ``window`` active steps), only those steps are forced — keeping
        wrapped-model windowed rejuvenation O(window) instead of O(T). The
        returned score term then covers only the windowed steps."""
        if window is not None and _outer_mask(tr) is True:
            return self._sel_logp_window(tr, args, selection, int(window))
        _, state0, params = self._split_args(args)
        b = current_batch()
        state0 = _batch_state0(state0, b)
        t_old = tr.inner["t"]
        outer_mask = _outer_mask(tr)
        old_store = tr.inner["store"]
        dsel, sel_static = self._slice_sel(self._densify_selection(selection))
        ts = jnp.arange(self.T, dtype=jnp.int32)

        def body(state, xs):
            if sel_static:
                t = xs
                step_sel = dsel
            else:
                t, step_sel = xs
            old_step = read_step(old_store, t)["steps"]
            a = t < t_old
            if outer_mask is not True:
                a = jnp.logical_and(a, outer_mask)
            masked_old = self.step.mask_trace(old_step, a)
            rv, so, sc = self.step._sel_logp(masked_old, (t, state) + params,
                                             step_sel)
            new_state = _tree_where(a, rv, state)
            return new_state, (new_state, so, sc)

        xs = ts if sel_static else (ts, dsel)
        _, (states, sos, scs) = lax.scan(body, state0, xs)
        if b is not None:
            return states, jnp.sum(sos, axis=0), jnp.sum(scs, axis=0)
        return states, jnp.sum(sos), jnp.sum(scs)

    def _sel_logp_window(self, tr: Trace, args, selection: Selection,
                         k: int):
        """O(k) forced pass over the last k active steps (``args`` are the
        OLD args here — callers pass the args the trace was produced under).
        Retval = the stored stacked states (already the old sequence)."""
        _, state0, params = self._split_args(args)
        t_old = tr.inner["t"]
        store = tr.inner["store"]
        dsel, _ = self._slice_sel(self._densify_selection(selection))

        t_start = t_old - k
        idx_prev = jnp.maximum(t_start - 1, 0)
        prev_state = read_step(store, idx_prev)["retval"]
        old_state = _tree_where(t_start > 0, prev_state, state0)
        sel_old = jnp.asarray(0.0, jnp.float32)
        score = jnp.asarray(0.0, jnp.float32)
        for j in range(k):
            t = t_start + j
            t_c = jnp.clip(t, 0, self.T - 1)
            active_j = jnp.logical_and(t >= 0, t < t_old)
            old_col = read_step(store, t_c)
            old_step = old_col["steps"]
            step_sel = (dsel if dsel.all_ else Selection(
                {k2: (m if isinstance(m, bool) else
                      _onehot_read(jnp.asarray(m), t_c, self.T))
                 for k2, m in dsel.entries.items()}))
            _, so_t, sc_t = self.step._sel_logp(
                old_step, (t_c, old_state) + params, step_sel)
            sel_old = sel_old + jnp.where(active_j, so_t, 0.0)
            score = score + jnp.where(active_j, sc_t, 0.0)
            old_state = _tree_where(active_j, old_col["retval"], old_state)
        return self._retvals_of(tr), sel_old, score

    # -- structure --------------------------------------------------------
    def trace_choices(self, tr: Trace) -> ChoiceMap:
        active = self._active(tr.inner["t"], _outer_mask(tr))
        stacked = self.step.trace_choices(self._steps_of(tr))
        out = {}
        for k, e in stacked.entries.items():
            out[k] = Entry(e.value, _and_lead(e.mask, active, jnp.ndim(e.value)))
        return ChoiceMap(out)

    def mask_trace(self, tr: Trace, m) -> Trace:
        om = _outer_mask(tr)
        if m is True:
            new_om = om
        elif om is True:
            new_om = m
        else:
            new_om = jnp.logical_and(om, m)
        inner = _inner(tr.inner["store"], tr.inner["t"], new_om)
        if "carry" in tr.inner:
            inner["carry"] = tr.inner["carry"]
        return Trace(tr.gen_fn, tr.args, tr.retval, tr.score, inner)

    def batch_stored_args(self, tr: Trace, batch: int) -> Trace:
        """Batched sub-call storage: state0/params leaves get the particle
        axis; the lockstep active length (args[0]) STAYS shared (its spec is
        ``None`` — see :meth:`trace_axes`)."""
        from .gfi import _batch_tree
        if not tr.args:
            return tr
        args = (tr.args[0],) + tuple(_batch_tree(a, batch)
                                     for a in tr.args[1:])
        return Trace(self, args, tr.retval, tr.score, tr.inner)

    def trace_axes(self, tr: Trace, axis: int = 0, args_shared: bool = False):
        """Time-major batched layout: the packed ``mat [T*R, N]`` holds the
        particle axis on LANES (position ``axis+1``); the active length
        ``t`` is ALWAYS shared across particles (spec ``None`` — the SMC
        layer extends all particles in lockstep, and an unbatched ``t`` is
        what lets the extension write lower to one O(N)
        ``dynamic_update_slice`` instead of a per-particle scatter). The
        spec mirrors the :class:`~.packed.StepStorage` treedef: each extra
        carries the particle-axis position its layout spec recorded
        (``None`` for shared leaves), offset by ``axis``."""
        from .batching import gen_spec, _const_spec, spec_n
        n = spec_n(tr.score, axis)
        inner = tr.inner
        store = inner["store"]
        mat_spec = None if store.mat is None else axis + 1
        extras_spec = [None] * len(store.extras)
        for s in store.layout.specs:
            if s.kind == 1:  # _KIND_EXTRA
                extras_spec[s.off] = (None if s.pax is None
                                      else s.pax + axis)
        store_spec = StepStorage(mat_spec, tuple(extras_spec), store.layout)
        spec_inner = {"store": store_spec, "t": None}
        if "carry" in inner:
            spec_inner["carry"] = gen_spec(inner["carry"], axis, n)
        if "outer_mask" in inner:
            spec_inner["outer_mask"] = gen_spec(inner["outer_mask"], axis, n)
        if args_shared:
            args_spec = _const_spec(tr.args, None)
        else:
            # sub-call position: state0/params may derive from per-particle
            # upstream values; the active length stays shared by contract
            args_spec = ((None,) + tuple(gen_spec(a, axis, n)
                                         for a in tr.args[1:])
                         if tr.args else ())
        return Trace(self, args_spec, None, axis, spec_inner)

    def retval_axes(self, tr: Trace, axis: int = 0):
        """Particle-axis spec for the MATERIALIZED retval (``get_retval()``
        output): the packed storage keeps the stored form's spec ``None``
        at the retval slot, so consumers of materialized retvals (e.g.
        smc/statistics) ask here instead of ``trace_axes``."""
        from .batching import gen_spec, spec_n
        n = spec_n(tr.score, axis)
        shapes = jax.eval_shape(self.trace_retval, tr)
        return gen_spec(shapes, axis + 1, n)

    def trace_choice_axes(self, tr: Trace, axis: int = 0):
        steps = jax.eval_shape(self._steps_of, tr)
        return self.step.trace_choice_axes(steps, axis + 1)

    def select_trace(self, accept, new_tr: Trace, old_tr: Trace) -> Trace:
        """Accept/reject select keeping the lockstep active length (and any
        args) from the NEW trace — they agree on both sides by the MH-kernel
        contract, and selecting them would batch layout-shared leaves.
        A per-particle [b] accept (batched interpretation) aligns against
        the LANE particle axis of the packed storage (position 1)."""
        from .gfi import select_batched, _where_lead
        # the packed mat is [T*R, b]: lift a batched accept over the
        # leading row axis; shared extras skip via tree_select_shared
        acc_t = (accept if jnp.ndim(accept) == 0
                 else jnp.asarray(accept)[None])
        store = select_batched(acc_t, new_tr.inner["store"],
                               old_tr.inner["store"])
        om_new = _outer_mask(new_tr)
        om_old = _outer_mask(old_tr)
        if om_new is True and om_old is True:
            om = True
        else:
            om = _where_lead(accept, jnp.asarray(om_new, bool),
                             jnp.asarray(om_old, bool))
        inner = _inner(store, new_tr.inner["t"], om)
        if "carry" in new_tr.inner and "carry" in old_tr.inner:
            inner["carry"] = jax.tree_util.tree_map(
                lambda nw, od: _where_lead(accept, jnp.asarray(
                    nw, jnp.asarray(od).dtype), od),
                new_tr.inner["carry"], old_tr.inner["carry"])
        return Trace(self, new_tr.args, None,
                     _where_lead(accept, new_tr.score, old_tr.score), inner)


class MapCombinator(GenFn):
    """IID plate combinator: vmap the kernel over a static leading axis.

    ``MapCombinator(kernel, n)`` called with args that are either broadcast
    (python/0-d) or have a leading ``[n]`` axis; all addresses get a leading
    ``[n]`` axis in the trace. Equivalent of Gen's ``Map`` combinator.
    """

    def __init__(self, kernel: GenFn, n: int):
        self.kernel = kernel
        self.n = int(n)

    @property
    def batch_safe(self):
        return self.kernel.batch_safe

    def _pvmap(self, fn, *operands):
        """``vmap`` over the PLATE axis with per-leaf axis placement.

        Per-particle (unbatched) interpretation: plate leaves map at 0,
        shared leaves pass whole. Batched interpretation: leaves shaped
        ``[b, n, ...]`` (particle-major storage) map at 1; plate-only
        leaves ``[n, ...]`` (e.g. SHARED constrained sites, split keys,
        plate-indexed args) map at 0; everything else — including
        per-particle-but-plate-shared ``[b, ...]`` values — passes whole.
        Output axes come from an abstract element evaluation: leaves with
        a leading particle dim stack the plate at 1 (keeping the
        particle-major layout ``trace_axes`` promises), the rest at 0."""
        b = current_batch()
        n = self.n

        def in_leaf(x):
            nd, shp = jnp.ndim(x), jnp.shape(x)
            if b is not None and nd >= 2 and shp[0] == b and shp[1] == n:
                return 1   # particle-major [b, n, ...]
            if nd >= 1 and shp[0] == n:
                return 0   # plate-leading [n, ...]
            return None    # shared (incl. per-particle plate-shared [b, ...])

        in_specs = tuple(jax.tree_util.tree_map(in_leaf, op)
                         for op in operands)

        def drop(x, ax):
            if ax is None or not hasattr(x, "shape"):
                return x
            shp = tuple(x.shape)
            return jax.ShapeDtypeStruct(shp[:ax] + shp[ax + 1:], x.dtype)

        from .batching import spec_map
        avals = tuple(spec_map(drop, op, sp)
                      for op, sp in zip(operands, in_specs))
        out_sh = jax.eval_shape(fn, *avals)

        def out_leaf(s):
            if (b is not None and hasattr(s, "shape") and len(s.shape) >= 1
                    and s.shape[0] == b):
                return 1
            return 0

        out_specs = jax.tree_util.tree_map(out_leaf, out_sh)
        return jax.vmap(fn, in_axes=in_specs, out_axes=out_specs)(*operands)

    @staticmethod
    def _psum(x):
        """Σ over the plate axis of a per-element accumulator stack:
        [n] -> scalar, or [b, n] -> [b] in batched interpretation."""
        return jnp.sum(x) if jnp.ndim(x) == 1 else jnp.sum(x, axis=1)

    def _store(self, tr):
        """Per-element stored-args layout fix under batched interpretation
        (see GenFn.batch_stored_args)."""
        b = current_batch()
        return tr if b is None else self.kernel.batch_stored_args(tr, b)

    def simulate(self, key, args):
        keys = jr.split(key, self.n)
        steps = self._pvmap(
            lambda k, *a: self._store(self.kernel.simulate(k, a)),
            keys, *args)
        score = self._psum(steps.score)
        return Trace(self, args, steps.retval, score, {"steps": steps})

    def generate(self, key, args, constraints: ChoiceMap = EMPTY):
        keys = jr.split(key, self.n)

        def one(k, c, *a):
            tr, w = self.kernel.generate(k, a, c)
            return self._store(tr), w

        # constraints: dense entries with [n] leading axis
        steps, ws = self._pvmap(one, keys, constraints, *args)
        score = self._psum(steps.score)
        return (Trace(self, args, steps.retval, score, {"steps": steps}),
                self._psum(ws))

    def assess(self, args, choices: ChoiceMap):
        retvals, ss = self._pvmap(
            lambda c, *a: self.kernel.assess(a, c), choices, *args)
        return retvals, self._psum(ss)

    def _update(self, key, tr: Trace, new_args, constraints: ChoiceMap,
                argdiffs=None):
        keys = jr.split(key, self.n)

        def one(k, o, c, *a):
            s, lq, d = self.kernel._update(k, o, a, c)
            return self._store(s), lq, d

        steps, logqs, disc = self._pvmap(
            one, keys, tr.inner["steps"], constraints, *new_args)
        score = self._psum(steps.score)
        return (Trace(self, new_args, steps.retval, score, {"steps": steps}),
                self._psum(logqs), disc)

    def _regenerate(self, key, tr: Trace, new_args, selection: Selection,
                    window=None, old_args=None, need_sel_old=True):
        keys = jr.split(key, self.n)
        if old_args is not None:
            def one(k, o, a, oa):
                s, sn, so = self.kernel._regenerate(
                    k, o, a, selection, old_args=oa,
                    need_sel_old=need_sel_old)
                return self._store(s), sn, so

            steps, sns, sos = self._pvmap(
                one, keys, tr.inner["steps"], tuple(new_args),
                tuple(old_args))
        else:
            def one(k, o, *a):
                s, sn, so = self.kernel._regenerate(
                    k, o, a, selection, need_sel_old=need_sel_old)
                return self._store(s), sn, so

            steps, sns, sos = self._pvmap(
                one, keys, tr.inner["steps"], *new_args)
        score = self._psum(steps.score)
        return (Trace(self, new_args, steps.retval, score, {"steps": steps}),
                self._psum(sns), self._psum(sos))

    def _sel_logp(self, tr: Trace, args, selection: Selection, window=None):
        retvals, sos, scs = self._pvmap(
            lambda o, *a: self.kernel._sel_logp(o, a, selection,
                                                window=window),
            tr.inner["steps"], *args)
        return retvals, self._psum(sos), self._psum(scs)

    def trace_choices(self, tr: Trace) -> ChoiceMap:
        return self.kernel.trace_choices(tr.inner["steps"])

    def mask_trace(self, tr: Trace, m) -> Trace:
        steps = self.kernel.mask_trace(tr.inner["steps"], m)
        return Trace(tr.gen_fn, tr.args, tr.retval, tr.score,
                     {"steps": steps})

    def trace_axes(self, tr: Trace, axis: int = 0, args_shared: bool = False):
        """Particle-major throughout: Map's plate axis is not dynamically
        indexed, so nothing is gained by a deeper particle axis — every leaf
        under the plate (including nested combinator traces and their args)
        stacks at ``axis``."""
        from .batching import _const_spec, gen_spec, spec_n
        n = spec_n(tr.score, axis)
        args_spec = (_const_spec(tr.args, None) if args_shared
                     else gen_spec(tr.args, axis, n))
        return Trace(self, args_spec, _const_spec(tr.retval, axis, n), axis,
                     {"steps": _const_spec(tr.inner["steps"], axis, n)})

    def trace_choice_axes(self, tr: Trace, axis: int = 0):
        return {k: axis for k in
                self.kernel.trace_choice_axes(tr.inner["steps"], axis)}
