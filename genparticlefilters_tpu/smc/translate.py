"""Trace translators for SMC-across-models and SMCP³
(ref: /root/reference/src/translate.jl).

- :class:`ExtendingTraceTranslator` (ref lines 33-120): extend a trace with
  choices from a forward proposal (or the model's default proposal),
  optionally passed through a deterministic transform.
- :class:`UpdatingTraceTranslator` (ref lines 160-274): forward + backward
  proposals; without a transform this is Del Moral SMC, with one it is SMCP³.
  Weight = Δscore + log|det J| − fwd_score + bwd_score (ref lines 261-264).

TPU-native improvement over the reference's trace-transform DSL
(``run_first_pass`` / ``jacobian_correction``): the deterministic transform
is an ordinary JAX function on choicemaps and **the Jacobian correction is
computed by automatic differentiation** (``jax.jacfwd`` over the declared
continuous addresses), so no special DSL is needed and the correction is
exact to machine precision.

Translators are registered pytrees (proposal gen-fns static, argument/
observation leaves traced), so a translator can be passed into jitted,
vmapped SMC steps.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.choicemap import ChoiceMap, Entry, EMPTY, normalize_address
from ..core.gfi import GenFn, Trace, UnknownChange, update as gfi_update

__all__ = ["TraceTransform", "ExtendingTraceTranslator",
           "UpdatingTraceTranslator", "GeneralTraceTranslator",
           "check_round_trip"]


# ---------------------------------------------------------------------------
# Deterministic transforms with AD Jacobian correction
# ---------------------------------------------------------------------------

def _get_val(cms, spec):
    which, addr = spec
    e = cms[which].entries.get(normalize_address(addr))
    if e is None:
        raise KeyError(f"transform: missing continuous address {spec}")
    return jnp.asarray(e.value)


def _set_val(cms, spec, val):
    which, addr = spec
    cm = cms[which]
    k = normalize_address(addr)
    old = cm.entries.get(k)
    mask = old.mask if old is not None else True
    entries = dict(cm.entries)
    entries[k] = Entry(jnp.reshape(val, jnp.shape(old.value)) if old is not None
                       else val, mask)
    cms[which] = ChoiceMap(entries)


class TraceTransform:
    """A deterministic (bijective over its continuous part) map between
    choicemaps, with AD-computed log|det J|.

    For an :class:`ExtendingTraceTranslator`: ``fn(fwd_choices) ->
    model_constraints``; continuous specs use ``("fwd", addr)`` inputs and
    ``("model", addr)`` outputs.

    For an :class:`UpdatingTraceTranslator` (SMCP³): ``fn(prev_model_choices,
    fwd_choices) -> (model_constraints, bwd_choices)``; inputs may be
    ``("prev", addr)`` or ``("fwd", addr)``, outputs ``("model", addr)`` or
    ``("bwd", addr)``.

    ``inverse_fn`` (same signature, roles swapped) enables ``inverse()`` and
    round-trip checking (ref: src/translate.jl:176-189,266-272).
    """

    def __init__(self, fn: Callable, continuous_in: Sequence = (),
                 continuous_out: Sequence = (), inverse_fn: Callable = None,
                 inverse_continuous_in: Sequence = None,
                 inverse_continuous_out: Sequence = None):
        self.fn = fn
        self.continuous_in = tuple(continuous_in)
        self.continuous_out = tuple(continuous_out)
        self.inverse_fn = inverse_fn
        self.inverse_continuous_in = tuple(
            inverse_continuous_in if inverse_continuous_in is not None
            else continuous_out)
        self.inverse_continuous_out = tuple(
            inverse_continuous_out if inverse_continuous_out is not None
            else continuous_in)

    def inverse(self) -> "TraceTransform":
        if self.inverse_fn is None:
            raise ValueError("transform has no inverse_fn; provide one to "
                             "use inverse()/round-trip checks")
        return TraceTransform(self.inverse_fn,
                              continuous_in=self.inverse_continuous_in,
                              continuous_out=self.inverse_continuous_out,
                              inverse_fn=self.fn,
                              inverse_continuous_in=self.continuous_out,
                              inverse_continuous_out=self.continuous_in)

    # -- application ------------------------------------------------------
    def _logdet(self, input_maps: dict, run):
        """AD log|det J| over the declared continuous part of one
        (per-particle) set of input maps."""
        in_vals = [_get_val(input_maps, s) for s in self.continuous_in]
        sizes = [int(jnp.size(v)) for v in in_vals]
        shapes = [jnp.shape(v) for v in in_vals]
        total_in = sum(sizes)

        def g(x_flat):
            maps = dict(input_maps)
            off = 0
            for s, sz, shp in zip(self.continuous_in, sizes, shapes):
                _set_val(maps, s, jnp.reshape(x_flat[off:off + sz], shp))
                off += sz
            out = run(maps)
            out_named = self._name_outputs(out)
            pieces = []
            for s in self.continuous_out:
                pieces.append(jnp.ravel(_get_val(out_named, s)))
            return jnp.concatenate(pieces) if pieces else jnp.zeros((0,))

        x0 = jnp.concatenate([jnp.ravel(v) for v in in_vals]).astype(
            jnp.float32)
        J = jax.jacfwd(g)(x0)
        if J.shape != (total_in, total_in):
            raise ValueError(
                f"transform Jacobian is {J.shape}, not square "
                f"({total_in}); continuous_in/continuous_out must "
                "cover the same total dimension")
        sign, logabs = jnp.linalg.slogdet(J)
        return logabs

    def _apply(self, input_maps: dict, n_outputs: int):
        """Run fn and compute log|det J| over the declared continuous part.

        Under a batched interpretation (``core.gfi.current_batch()`` is N),
        ``fn`` runs ONCE with [N]-leading entry values (it must be
        batch-polymorphic, like any ``batch_safe`` model body) and the
        Jacobian is computed as N per-particle blocks via a vmapped
        ``jacfwd`` — the [N·d, N·d] joint Jacobian is block-diagonal by
        construction (particles are independent), so the per-particle
        ``slogdet``s are exact."""
        from ..core.gfi import batched_interpretation, current_batch

        def run(maps):
            args = [maps[k] for k in self._input_order(maps)]
            out = self.fn(*args)
            if n_outputs == 1:
                out = (out,)
            return out

        outs = run(input_maps)
        logdet = jnp.asarray(0.0, jnp.float32)
        if self.continuous_in:
            b = current_batch()
            if b is None:
                logdet = self._logdet(input_maps, run)
            else:
                def leaf_axis(l):
                    return 0 if (hasattr(l, "ndim") and jnp.ndim(l) >= 1
                                 and jnp.shape(l)[0] == b) else None

                in_axes = jax.tree_util.tree_map(leaf_axis, input_maps)

                def pp_logdet(maps_pp):
                    return self._logdet(maps_pp, run)

                with batched_interpretation(None):
                    logdet = jax.vmap(pp_logdet, in_axes=(in_axes,))(
                        input_maps)
        return outs, logdet

    def _input_order(self, maps):
        if "prev" in maps:
            return ("prev", "fwd")
        return ("fwd",)

    def _name_outputs(self, outs):
        if len(outs) == 1:
            return {"model": outs[0]}
        return {"model": outs[0], "bwd": outs[1]}

    def apply_extending(self, fwd_choices: ChoiceMap):
        outs, logdet = self._apply({"fwd": fwd_choices}, 1)
        return outs[0], logdet

    def apply_updating(self, prev_choices: ChoiceMap, fwd_choices: ChoiceMap):
        outs, logdet = self._apply(
            {"prev": prev_choices, "fwd": fwd_choices}, 2)
        return outs[0], outs[1], logdet


# ---------------------------------------------------------------------------
# Round-trip checking (ref: src/translate.jl:266-272 via Gen.check_round_trip)
# ---------------------------------------------------------------------------

def _choices_close(a: ChoiceMap, b: ChoiceMap, atol=1e-4):
    """Traced bool: every present entry of ``a`` matches ``b`` within
    ``atol``. Structural mismatches (missing address, shape) are static and
    yield a Python ``False``."""
    ok_all = jnp.asarray(True)
    for k, e in a.entries.items():
        e2 = b.entries.get(k)
        if e2 is None:
            return False
        va, vb = jnp.asarray(e.value), jnp.asarray(e2.value)
        if va.shape != vb.shape:
            return False
        ma = e.mask_array() if e.mask is not True else None
        diff = jnp.abs(va.astype(jnp.float32) - vb.astype(jnp.float32))
        ok = diff <= atol
        if ma is not None:
            ok = jnp.logical_or(ok, jnp.logical_not(ma))
        ok_all = jnp.logical_and(ok_all, jnp.all(ok))
    return ok_all


def _raise_round_trip(model_bad, prop_bad):
    import numpy as np
    if np.any(model_bad):
        raise ValueError("round-trip check failed: model trace mismatch")
    if np.any(prop_bad):
        raise ValueError("round-trip check failed: proposal trace mismatch")


def check_round_trip(prev_trace: Trace, prev_trace_rt: Trace,
                     fwd_trace: Trace = None, fwd_trace_rt: Trace = None):
    """Bijection check: the inverse translator must reconstruct the input
    traces within tolerance (ref: src/translate.jl:266-272). Works eagerly
    (Python raise) and inside jit/vmap (raising ``jax.debug.callback``, so a
    per-particle SMCP³ update with ``check=True`` fails at execution time —
    the reference applies it per particle inside ``pf_update!``)."""
    model_ok = _choices_close(prev_trace.get_choices(),
                              prev_trace_rt.get_choices())
    prop_ok = True
    if fwd_trace is not None and fwd_trace_rt is not None:
        prop_ok = _choices_close(fwd_trace.get_choices(),
                                 fwd_trace_rt.get_choices())
    traced = (isinstance(model_ok, jax.core.Tracer)
              or isinstance(prop_ok, jax.core.Tracer))
    model_bad = jnp.logical_not(model_ok)
    prop_bad = jnp.logical_not(prop_ok)
    if traced or isinstance(prev_trace.get_score(), jax.core.Tracer):
        jax.debug.callback(_raise_round_trip, model_bad, prop_bad)
        return
    _raise_round_trip(bool(model_bad), bool(prop_bad))


# ---------------------------------------------------------------------------
# ExtendingTraceTranslator (ref: src/translate.jl:33-120)
# ---------------------------------------------------------------------------

class ExtendingTraceTranslator:
    def __init__(self, p_new_args=(), p_argdiffs=None,
                 new_observations: ChoiceMap = EMPTY,
                 q_forward: GenFn | None = None, q_forward_args=(),
                 transform: TraceTransform | None = None):
        self.p_new_args = tuple(p_new_args)
        self.p_argdiffs = (tuple(p_argdiffs) if p_argdiffs is not None
                           else tuple(UnknownChange() for _ in self.p_new_args))
        self.new_observations = new_observations
        self.q_forward = q_forward
        self.q_forward_args = tuple(q_forward_args)
        self.transform = transform

    def replace(self, **kw):
        vals = dict(p_new_args=self.p_new_args, p_argdiffs=self.p_argdiffs,
                    new_observations=self.new_observations,
                    q_forward=self.q_forward,
                    q_forward_args=self.q_forward_args,
                    transform=self.transform)
        vals.update(kw)
        return ExtendingTraceTranslator(**vals)

    def __call__(self, key, prev_trace: Trace, check: bool = True):
        """Returns (new_trace, incremental log weight)
        (ref: src/translate.jl:57-120)."""
        if self.q_forward is None:
            # pure-update specialization (ref lines 108-120)
            new_tr, w, _, discard = gfi_update(
                key, prev_trace, self.p_new_args, self.p_argdiffs,
                self.new_observations)
            _check_no_discard(discard, check)
            return new_tr, w
        k1, k2 = jr.split(key)
        fwd_choices, fwd_score, _ = self.q_forward.propose(
            k1, (prev_trace,) + self.q_forward_args)
        logdet = jnp.asarray(0.0, jnp.float32)
        if self.transform is not None:
            constraints, logdet = self.transform.apply_extending(fwd_choices)
        else:
            constraints = fwd_choices
        constraints = constraints.merge(self.new_observations)
        new_tr, score_diff, _, discard = gfi_update(
            k2, prev_trace, self.p_new_args, self.p_argdiffs, constraints)
        _check_no_discard(discard, check)
        return new_tr, score_diff - fwd_score + logdet


# ---------------------------------------------------------------------------
# UpdatingTraceTranslator (ref: src/translate.jl:160-274)
# ---------------------------------------------------------------------------

class UpdatingTraceTranslator:
    def __init__(self, p_new_args=(), p_argdiffs=None,
                 new_observations: ChoiceMap = EMPTY,
                 q_forward: GenFn = None, q_forward_args=(),
                 q_backward: GenFn = None, q_backward_args=(),
                 transform: TraceTransform | None = None,
                 p_prev_args=None):
        self.p_new_args = tuple(p_new_args)
        self.p_argdiffs = (tuple(p_argdiffs) if p_argdiffs is not None
                           else tuple(UnknownChange() for _ in self.p_new_args))
        self.new_observations = new_observations
        self.q_forward = q_forward
        self.q_forward_args = tuple(q_forward_args)
        self.q_backward = q_backward
        self.q_backward_args = tuple(q_backward_args)
        self.transform = transform
        #: static model args the PREVIOUS trace was produced under — used by
        #: :meth:`inverse` (round-trip checking). Under vmap/jit the trace's
        #: stored args are traced, which breaks models whose args are
        #: structural (e.g. a static length); supplying them here keeps the
        #: round-trip check usable per particle inside jitted pf_update.
        self.p_prev_args = None if p_prev_args is None else tuple(p_prev_args)

    def replace(self, **kw):
        vals = dict(p_new_args=self.p_new_args, p_argdiffs=self.p_argdiffs,
                    new_observations=self.new_observations,
                    q_forward=self.q_forward,
                    q_forward_args=self.q_forward_args,
                    q_backward=self.q_backward,
                    q_backward_args=self.q_backward_args,
                    transform=self.transform,
                    p_prev_args=self.p_prev_args)
        vals.update(kw)
        return UpdatingTraceTranslator(**vals)

    def inverse(self, prev_trace: Trace,
                prev_observations: ChoiceMap = EMPTY):
        """Swap forward/backward and invert the transform
        (ref: src/translate.jl:176-189)."""
        prev_args = (self.p_prev_args if self.p_prev_args is not None
                     else prev_trace.get_args())
        return UpdatingTraceTranslator(
            p_new_args=prev_args,
            p_argdiffs=tuple(UnknownChange() for _ in prev_args),
            new_observations=prev_observations,
            q_forward=self.q_backward, q_forward_args=self.q_backward_args,
            q_backward=self.q_forward, q_backward_args=self.q_forward_args,
            transform=(self.transform.inverse()
                       if self.transform is not None else None))

    def run_transform(self, key, prev_trace: Trace, fwd_trace: Trace):
        """(new_model_trace, bwd_trace, log|det J|, model_score_diff)
        (ref: src/translate.jl:191-229)."""
        k1, k2 = jr.split(key)
        if self.transform is None:
            constraints = fwd_trace.get_choices().merge(self.new_observations)
            new_tr, score_diff, _, discard = gfi_update(
                k1, prev_trace, self.p_new_args, self.p_argdiffs, constraints)
            logdet = jnp.asarray(0.0, jnp.float32)
            bwd_constraints = discard
        else:
            constraints, bwd_constraints, logdet = (
                self.transform.apply_updating(prev_trace.get_choices(),
                                              fwd_trace.get_choices()))
            constraints = constraints.merge(self.new_observations)
            new_tr, score_diff, _, _ = gfi_update(
                k1, prev_trace, self.p_new_args, self.p_argdiffs, constraints)
        bwd_tr, _ = self.q_backward.generate(
            k2, (new_tr,) + self.q_backward_args, bwd_constraints)
        return new_tr, bwd_tr, logdet, score_diff

    def __call__(self, key, prev_trace: Trace, check: bool = False,
                 prev_observations: ChoiceMap = EMPTY):
        """Returns (new_trace, incremental log weight)
        (ref: src/translate.jl:248-274)."""
        k1, k2, k3 = jr.split(key, 3)
        fwd_trace = self.q_forward.simulate(
            k1, (prev_trace,) + self.q_forward_args)
        new_tr, bwd_tr, logdet, score_diff = self.run_transform(
            k2, prev_trace, fwd_trace)
        weight = (score_diff + logdet
                  - fwd_trace.get_score() + bwd_tr.get_score())
        if check:
            inverter = self.inverse(prev_trace, prev_observations)
            prev_rt, fwd_rt, _, _ = inverter.run_transform(
                k3, new_tr, bwd_tr)
            check_round_trip(prev_trace, prev_rt, fwd_trace, fwd_rt)
        return new_tr, weight


# ---------------------------------------------------------------------------
# GeneralTraceTranslator — SMC across *different* models (schema changes)
# ---------------------------------------------------------------------------

class GeneralTraceTranslator:
    """Move particles between two different generative functions (Gen's
    ``GeneralTraceTranslator``; the capability behind the reference's
    model-sequence SMC with ``dynamic=true``, src/initialize.jl:27-29 —
    on TPU each model has its own fixed trace schema and this translator
    maps states between schemas).

    ``transform(old_choices, fwd_choices) -> (new_model_constraints,
    bwd_choices)`` must constrain EVERY choice of ``new_model`` (the new
    trace is generated fully constrained). Weight = score_new − score_old
    + log|det J| − fwd_score + bwd_score.
    """

    def __init__(self, new_model: GenFn, new_args=(),
                 q_forward: GenFn = None, q_forward_args=(),
                 q_backward: GenFn = None, q_backward_args=(),
                 transform: TraceTransform = None):
        self.new_model = new_model
        self.new_args = tuple(new_args)
        self.q_forward = q_forward
        self.q_forward_args = tuple(q_forward_args)
        self.q_backward = q_backward
        self.q_backward_args = tuple(q_backward_args)
        self.transform = transform

    def __call__(self, key, prev_trace: Trace, check: bool = False):
        k1, k2, k3 = jr.split(key, 3)
        logdet = jnp.asarray(0.0, jnp.float32)
        fwd_score = jnp.asarray(0.0, jnp.float32)
        fwd_choices = EMPTY
        if self.q_forward is not None:
            fwd_choices, fwd_score, _ = self.q_forward.propose(
                k1, (prev_trace,) + self.q_forward_args)
        constraints, bwd_constraints, logdet = (
            self.transform.apply_updating(prev_trace.get_choices(),
                                          fwd_choices))
        new_tr, gen_w = self.new_model.generate(k2, self.new_args,
                                                constraints)
        bwd_score = jnp.asarray(0.0, jnp.float32)
        if self.q_backward is not None:
            bwd_tr, _ = self.q_backward.generate(
                k3, (new_tr,) + self.q_backward_args, bwd_constraints)
            bwd_score = bwd_tr.get_score()
        weight = (new_tr.get_score() - prev_trace.get_score() + logdet
                  - fwd_score + bwd_score)
        return new_tr, weight


def _raise_discard(any_disc):
    import numpy as np
    if np.any(any_disc):
        raise ValueError(
            "Choices were updated or deleted during pf_update; pass "
            "check=False to allow replacing previous observations.")


def _check_no_discard(discard: ChoiceMap, check: bool):
    """Reference errors when an update discards choices
    (src/update.jl:18-20, src/translate.jl:77-79). Eager-mode raise; under
    jit the mask is traced, so a raising ``jax.debug.callback`` is staged —
    the error surfaces as ``jax.errors.JaxRuntimeError`` at execution time."""
    if not check or discard.is_empty():
        return
    any_disc = discard.total_mask_any()
    if not isinstance(any_disc, jax.core.Tracer):
        _raise_discard(bool(any_disc))
        return
    jax.debug.callback(_raise_discard, any_disc)


# -- pytree registrations ---------------------------------------------------
#
# Model/proposal arg tuples mix STRUCTURAL Python scalars (e.g. a static
# Unfold length, consumed by ``range``/shape logic) with data arrays. Across
# a jit/vmap boundary the structural entries must stay Python values — a
# traced static length breaks the model — so each tuple is split: arrays
# flatten as pytree children, everything else rides in static aux data
# (mirroring how jit treats Python scalars in closures).

_DYN = object()  # aux-data placeholder marking a dynamic (array) slot


def _split_static(tup):
    import numpy as _np
    dyn = tuple(x for x in tup
                if isinstance(x, (jax.Array, _np.ndarray, _np.generic)))
    spec = tuple(_DYN if isinstance(x, (jax.Array, _np.ndarray, _np.generic))
                 else x for x in tup)
    return dyn, spec


def _merge_static(dyn, spec):
    it = iter(dyn)
    return tuple(next(it) if s is _DYN else s for s in spec)


def _ett_flatten(t):
    p_dyn, p_spec = _split_static(t.p_new_args)
    f_dyn, f_spec = _split_static(t.q_forward_args)
    return ((p_dyn, t.new_observations, f_dyn),
            (t.p_argdiffs, t.q_forward, t.transform, p_spec, f_spec))


def _ett_unflatten(aux, children):
    p_argdiffs, q_forward, transform, p_spec, f_spec = aux
    p_dyn, new_observations, f_dyn = children
    return ExtendingTraceTranslator(
        p_new_args=_merge_static(p_dyn, p_spec), p_argdiffs=p_argdiffs,
        new_observations=new_observations, q_forward=q_forward,
        q_forward_args=_merge_static(f_dyn, f_spec), transform=transform)


jax.tree_util.register_pytree_node(
    ExtendingTraceTranslator, _ett_flatten, _ett_unflatten)


def _utt_flatten(t):
    # p_prev_args exists precisely to keep round-trip checking usable across
    # jit/vmap boundaries (static model args of the previous trace) — carry
    # it as STATIC aux data so a translator passed through a pytree boundary
    # does not silently lose it.
    p_dyn, p_spec = _split_static(t.p_new_args)
    f_dyn, f_spec = _split_static(t.q_forward_args)
    b_dyn, b_spec = _split_static(t.q_backward_args)
    return ((p_dyn, t.new_observations, f_dyn, b_dyn),
            (t.p_argdiffs, t.q_forward, t.q_backward, t.transform,
             t.p_prev_args, p_spec, f_spec, b_spec))


def _utt_unflatten(aux, children):
    (p_argdiffs, q_forward, q_backward, transform, p_prev_args,
     p_spec, f_spec, b_spec) = aux
    p_dyn, new_observations, f_dyn, b_dyn = children
    return UpdatingTraceTranslator(
        p_new_args=_merge_static(p_dyn, p_spec), p_argdiffs=p_argdiffs,
        new_observations=new_observations,
        q_forward=q_forward, q_forward_args=_merge_static(f_dyn, f_spec),
        q_backward=q_backward, q_backward_args=_merge_static(b_dyn, b_spec),
        transform=transform, p_prev_args=p_prev_args)


jax.tree_util.register_pytree_node(
    UpdatingTraceTranslator, _utt_flatten, _utt_unflatten)
