"""Mesh-sharded MPPI solve: K samples distributed over devices.

Greenfield TPU-native scale-out (nothing to port — the reference is
single-device, SURVEY.md §2.8). Design:

- each device draws its own noise shard by folding its mesh-axis index into
  the PRNG key, rolls out its K/n samples locally (zero communication), and
  participates in exactly four collectives for the update law:
  ``pmin`` (beta), ``pmax`` (normalizer), ``psum`` (nabla), ``psum``
  (weighted noise) — see ops/update.py;
- the updated sequence and emitted action come out replicated, so the
  controller's host logic is identical to the single-device path;
- a noise-injection variant shards a provided noise tensor over K for
  parity tests: the sharded solve must equal the single-device solve to
  tolerance (reduction order differs, values don't).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 stable API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from ..controller.missions import MissionMixin
from ..ops import noise as noise_ops
from ..ops import update as upd
from ..ops.rollout import rollout_costs
from .mesh import SAMPLE_AXIS


def build_sharded_solve(
    model,
    cost,
    k: int,
    tau: int,
    lam: float,
    upsilon: float,
    sigma,
    mesh: Mesh,
    normalize_cost: bool = False,
    clip_actions: bool = False,
    axis: str = SAMPLE_AXIS,
    antithetic: bool = False,
    filter_mat=None,
    schedule=None,
):
    """Return (solve, solve_with_noise) jitted over ``mesh``.

    solve(key, state, useq, mparams, cparams) -> (action, next_useq, info)
    with all inputs replicated; K is sharded internally. ``k`` must be
    divisible by the mesh size along ``axis``. ``filter_mat`` (optional
    [tau, tau]) applies Savitzky–Golay smoothing as a linear operator —
    same semantics as the single-device controller (mppi.savgol_matrix).

    A head/tail ``overlap_merge`` two-phase variant existed through round
    4; it LOST on every recorded measurement — 2-process gloo speedup
    0.694 (BENCH_r04), and 0.997/0.817/0.681/0.416 across the round-5
    weak-scaling sweep (OVERLAP_DECISION.json), worst exactly in the
    multi-host regime it targeted (the early all-reduce serializes
    against the tail instead of hiding behind it) — so the knob was
    deleted rather than left user-facing (VERDICT r4 #5).
    """
    n = mesh.shape[axis]
    if k % n != 0:
        raise ValueError(f"k={k} not divisible by mesh axis {axis}={n}")
    k_local = k // n
    adim = model.get_action_dim()
    sigma = jnp.asarray(np.asarray(sigma, np.float64), dtype=model.dtype)
    # per-step noise schedule (construction-time config on the sharded
    # path): sigma_t = c_t * sigma — ops/noise.resolve_noise_schedule
    sched_np = noise_ops.resolve_noise_schedule(schedule, tau)
    sched_c = (None if sched_np is None
               else jnp.asarray(sched_np, model.dtype))
    if filter_mat is not None:
        filter_mat = jnp.asarray(np.asarray(filter_mat, np.float64),
                                 dtype=model.dtype)

    def _local_costs(state, useq, eps, mparams, cparams):
        return rollout_costs(
            step_fn=lambda x, u: model.step(mparams, x, u),
            state_cost_fn=lambda x: cost.state_cost(cparams, x),
            action_cost_fn=cost.action_cost,
            terminal_cost_fn=lambda x: cost.final_cost(cparams, x),
            x0=state,
            useq=useq,
            noises=eps,
            sched=sched_c,
        )

    def _update(useq, costs, eps):
        wnoise = upd.mppi_update(
            costs, eps, lam, normalize=normalize_cost, axis_name=axis
        )
        info = {
            "cost_min": jax.lax.pmin(jnp.min(costs), axis),
            "cost_mean": jax.lax.pmean(jnp.mean(costs), axis),
            "cost_max": jax.lax.pmax(jnp.max(costs), axis),
        }
        return _finish(useq, wnoise, info)

    def _finish(useq, wnoise, stats):
        new_useq = useq + wnoise
        if clip_actions:
            new_useq = jnp.clip(new_useq, model.min_act(), model.max_act())
        if filter_mat is not None:
            new_useq = filter_mat @ new_useq
        action = new_useq[0]
        shifted = upd.shift(
            new_useq, jnp.zeros((1, adim), dtype=new_useq.dtype), 1
        )
        return action, shifted, stats

    def _solve_shard(key, state, useq, mparams, cparams):
        mparams = model.precompute(mparams)
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)
        # antithetic mirrors pairs within each shard (ops/noise.py)
        sampler = (noise_ops.sample_noise_antithetic if antithetic
                   else noise_ops.sample_noise)
        eps = sampler(
            key, k_local, tau, adim, sigma, upsilon, dtype=useq.dtype,
            schedule=sched_c,
        )
        costs = _local_costs(state, useq, eps, mparams, cparams)
        return _update(useq, costs, eps)

    def _solve_with_noise_shard(eps, state, useq, mparams, cparams):
        mparams = model.precompute(mparams)
        costs = _local_costs(state, useq, eps, mparams, cparams)
        return _update(useq, costs, eps)

    rep = P()  # replicated
    solve = jax.jit(
        shard_map(
            _solve_shard,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
        ),
        donate_argnums=(2,),
    )
    solve_with_noise = jax.jit(
        shard_map(
            _solve_with_noise_shard,
            mesh=mesh,
            in_specs=(P(axis), rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
        )
    )
    return solve, solve_with_noise


class ShardedControllerMixin(MissionMixin):
    """trace/profile/dump_hlo for the sharded controllers — parity with the
    single-device surface (controller/mppi.py MPPI.trace/profile/dump_hlo),
    plus the waypoint-mission surface (controller/missions.py).

    Concrete classes provide ``next``, ``_solve`` (jitted), ``_model``,
    ``_example_solve_args()`` and ``_reset_after_trace()``.
    """

    def _fake_state(self):
        fake = np.zeros((self._model.get_state_dim(),))
        if self._model.get_state_dim() >= 7:
            fake[6] = 1.0  # unit quaternion for AUV-style states
        return fake

    def trace(self):
        """Pre-compile the sharded solve with a fake state, then reset the
        mutable controller state disturbed by the warmup (so a traced
        controller emits the same sequence as an untraced one)."""
        snap = self._trace_snapshot()
        _ = self.next(self._fake_state())
        self._trace_restore(snap)

    def profile(self, logdir: Optional[str] = None):
        """Run one sharded solve under the JAX profiler."""
        if logdir is None and self._observer is not None:
            logdir = self._observer.get_logdir()
        if logdir is not None:
            with jax.profiler.trace(logdir):
                a = self.next(self._fake_state())
                jax.block_until_ready(a)
        else:
            a = self.next(self._fake_state())
            jax.block_until_ready(a)

    def dump_hlo(self) -> str:
        """Compiled HLO of the sharded solve (collectives included)."""
        lowered = self._solve.lower(*self._example_solve_args())
        return lowered.compile().as_text()


class ShardedMPPI(ShardedControllerMixin):
    """Stateful wrapper mirroring controller.MPPI but mesh-sharded over K.

    Same user-facing surface as the single-device controller
    (next/save/set_goal), so swapping in pod-scale K is a one-line change.
    """

    def __init__(
        self,
        model,
        cost,
        mesh: Mesh,
        k: int = 1,
        tau: int = 1,
        lam: float = 1.0,
        upsilon: float = 1.0,
        sigma=None,
        normalize_cost: bool = False,
        clip_actions: bool = False,
        seed: int = 0,
        axis: str = SAMPLE_AXIS,
        antithetic: bool = False,
        filter_seq: bool = False,
        filter_window: int = 9,
        filter_polyorder: int = 3,
        observer=None,
        init_seq=None,
        prng_impl: str = "auto",
        noise_schedule=None,
    ):
        if sigma is None:
            raise ValueError("sigma (noise scale matrix) is required")
        self._model = model
        self._cost = cost
        self._mesh = mesh
        self._tau = int(tau)
        self._adim = model.get_action_dim()
        self._dtype = model.dtype
        self._k = int(k)
        filter_mat = None
        if filter_seq:
            from ..controller.mppi import savgol_matrix

            filter_mat = savgol_matrix(tau, filter_window, filter_polyorder)
        self._solve, self._solve_with_noise = build_sharded_solve(
            model, cost, k, tau, lam, upsilon, sigma, mesh,
            normalize_cost=normalize_cost, clip_actions=clip_actions,
            axis=axis, antithetic=antithetic, filter_mat=filter_mat,
            schedule=noise_schedule,
        )
        if init_seq is not None:
            self._useq = jnp.asarray(
                np.asarray(init_seq, np.float64).reshape(tau, self._adim),
                dtype=self._dtype)
        else:
            self._useq = jnp.zeros((tau, self._adim), dtype=self._dtype)
        from ..controller.mppi import make_prng_key

        self._key, self._prng_impl = make_prng_key(seed, prng_impl)
        self._mparams = model.init_params()
        self._cparams = cost.init_params()
        self._observer = observer
        self._timing = {"total": 0.0, "calls": 0}

    def next(self, state) -> np.ndarray:
        state = jnp.asarray(np.asarray(state, np.float64).reshape(-1),
                            dtype=self._dtype)
        start = time.perf_counter()
        self._key, sub = jax.random.split(self._key)
        action, self._useq, info = self._solve(
            sub, state, self._useq, self._mparams, self._cparams
        )
        out = np.asarray(action)
        self._timing["total"] += time.perf_counter() - start
        self._timing["calls"] += 1
        if self._observer is not None:
            self._observer.write_control(state=state, action=out, info=info)
        return out

    def save(self, x, u, x_next):
        """One-step prediction-error logging (mirrors MPPI.save)."""
        if self._observer is None:
            return
        x = jnp.asarray(np.asarray(x, np.float64).reshape(-1),
                        dtype=self._dtype)
        u = jnp.asarray(np.asarray(u, np.float64).reshape(-1),
                        dtype=self._dtype)
        pred = self._model.predict(self._mparams, x, u)
        self._observer.write_predict(
            x=x, u=u,
            x_next=jnp.asarray(np.asarray(x_next, np.float64).reshape(-1),
                               dtype=self._dtype),
            pred=pred, cost=self._cost, cparams=self._cparams)
        self._observer.advance()

    def set_goal(self, goal):
        self._cparams = self._cost.set_goal(self._cparams, goal)

    def _example_solve_args(self):
        state = jnp.asarray(self._fake_state(), dtype=self._dtype)
        return (self._key, state, self._useq, self._mparams, self._cparams)

    def _trace_snapshot(self):
        # copy: the jitted solve donates the useq buffer (donate_argnums)
        return (self._key, jnp.array(self._useq))

    def _trace_restore(self, snap):
        # restore the nominal sequence too: a configured init_seq must
        # survive trace() (same contract as MPPI.trace)
        self._key, self._useq = snap
        self._timing = {"total": 0.0, "calls": 0}

    def save_state(self, path: str):
        """Checkpoint the mutable controller state (mirrors MPPI.save_state;
        SURVEY.md §5.4 — the reference has no controller-state checkpoint)."""
        from ..controller.state_io import cparams_entries

        np.savez(path, useq=np.asarray(self._useq),
                 key=np.asarray(jax.random.key_data(self._key)),
                 key_impl=np.str_(self._prng_impl),
                 timing_total=self._timing["total"],
                 timing_calls=self._timing["calls"],
                 **cparams_entries(self._cparams))

    def load_state(self, path: str):
        d = np.load(path)
        if d["useq"].shape != tuple(self._useq.shape):
            raise ValueError(
                f"checkpoint useq {d['useq'].shape} != controller "
                f"{tuple(self._useq.shape)}")
        self._useq = jnp.asarray(d["useq"], dtype=self._dtype)
        impl = str(d["key_impl"]) if "key_impl" in d else "threefry2x32"
        self._key = jax.random.wrap_key_data(jnp.asarray(d["key"]),
                                             impl=impl)
        self._prng_impl = impl
        self._timing = {"total": float(d["timing_total"]),
                        "calls": int(d["timing_calls"])}
        from ..controller.state_io import load_cparams

        self._cparams = load_cparams(d, self._cparams)

    @property
    def useq(self):
        return self._useq

    @property
    def timing(self):
        return dict(self._timing)

    @property
    def model_params(self):
        return self._mparams

    @model_params.setter
    def model_params(self, p):
        self._mparams = p
