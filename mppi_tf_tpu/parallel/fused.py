"""Mesh-sharded fused-kernel MPPI: Pallas per shard + collective merge.

Composes the fused VMEM-resident kernels (kernels/pm_mppi.py point-mass,
kernels/auv_mppi.py AUV) with the K-axis device mesh: every device runs the
kernel on its K/n shard with raw outputs (return_raw=True), then the shards
merge with the SAME online-softmax algebra the kernel uses to merge its
K-tiles — ``pmax`` for the running max m, ``psum`` for the rescaled
normalizer l and weighted-normal sum, plus ``pmin``/``pmax``/``psum`` for
the cost stats. Greenfield design (the reference is single-device,
SURVEY.md §2.8); these four collectives ride ICI on a real pod.

    wnoise = scale @ (psum(zsum_i * exp(m_i - pmax m)) /
                      psum(l_i    * exp(m_i - pmax m)))
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import update as upd
from .mesh import SAMPLE_AXIS
from .sharded import ShardedControllerMixin


def _shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the default vma check rejects inside shard_map.
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def build_sharded_fused_solve(local_fused, mesh: Mesh, k_global: int,
                              axis: str = SAMPLE_AXIS,
                              normalize_cost: bool = False,
                              clip_actions: bool = False,
                              act_min=None, act_max=None,
                              filter_mat=None):
    """Return (solve, solve_with_noise) jitted over ``mesh``.

    ``local_fused`` is a FusedPointMassMPPI / FusedAUVMPPI built with the
    PER-SHARD sample count (k_global // mesh size). solve(seed, state,
    useq, mparams, cparams) -> (action, next_useq, info) with all inputs
    replicated. solve_with_noise takes chunked normals (the kernel's
    chunk_noise layout over all k_global samples) sharded over the lane
    axis for parity tests.

    Options mirror the single-device controller (controller/mppi.py):
    ``clip_actions`` clips the updated sequence to [act_min, act_max];
    ``filter_mat`` applies Savitzky-Golay smoothing as a [tau, tau] matmul;
    ``normalize_cost`` runs the two-phase normalized kernels with the
    global beta/max reduced across shards (pmin/pmax) between the phases.

    A head/tail ``overlap_merge`` variant (issue the head tiles' cross-
    shard reduction before the tail kernel) existed through round 4; it
    lost on every recorded transport-level measurement (2-process gloo
    0.694x, round-5 weak-scaling sweep 0.42-1.00x — OVERLAP_DECISION.json)
    and was deleted per VERDICT r4 #5.
    """
    n = mesh.shape[axis]
    if k_global % n != 0:
        raise ValueError(f"k={k_global} not divisible by mesh axis "
                         f"{axis}={n}")
    if local_fused.k != k_global // n:
        raise ValueError(
            f"local_fused.k={local_fused.k} must equal k_global/n="
            f"{k_global // n}")
    n_tiles_local = (local_fused.k + local_fused.tile - 1) // local_fused.tile
    tau, adim = local_fused.tau, local_fused.adim
    scale = jnp.asarray(local_fused._scale, jnp.float32)
    if clip_actions and (act_min is None or act_max is None):
        raise ValueError("clip_actions needs act_min/act_max")
    if filter_mat is not None:
        filter_mat = jnp.asarray(np.asarray(filter_mat, np.float64),
                                 jnp.float32)

    def _postprocess(useq, wnoise, info):
        new_useq = useq + wnoise.astype(useq.dtype)
        if clip_actions:
            new_useq = jnp.clip(new_useq, act_min, act_max)
        if filter_mat is not None:
            new_useq = filter_mat @ new_useq
        action = new_useq[0]
        shifted = upd.shift(
            new_useq, jnp.zeros((1, adim), dtype=new_useq.dtype), 1)
        return action, shifted, info

    def _shard_reduce(raw, axis_name):
        """Cross-shard online-softmax reduction of one raw piece -> a
        globally-merged (m, l, zsum, cost stats) partial (replicated)."""
        m_g = jax.lax.pmax(raw["m"], axis_name)
        f = jnp.exp(raw["m"] - m_g)
        return {
            "m": m_g,
            "l": jax.lax.psum(raw["l"] * f, axis_name),
            "zsum": jax.lax.psum(raw["zsum"] * f, axis_name),
            "cost_min": jax.lax.pmin(raw["cost_min"], axis_name),
            "cost_max": jax.lax.pmax(raw["cost_max"], axis_name),
            "cost_sum": jax.lax.psum(raw["cost_sum"], axis_name),
        }

    def _finish(useq, g):
        # unfold_wnoise applies scale AND the (construction-time) noise
        # schedule: wnoise_t = c_t * scale @ zsum_t
        wnoise = local_fused.unfold_wnoise(g["zsum"]) / g["l"]
        info = {
            "cost_min": g["cost_min"],
            "cost_max": g["cost_max"],
            "cost_mean": g["cost_sum"] / k_global,
            "nabla": g["l"],
        }
        return _postprocess(useq, wnoise, info)

    def _merge(useq, raw, axis_name):
        return _finish(useq, _shard_reduce(raw, axis_name))

    def _merge_normalized(seed, useq, raw, axis_name, z=None,
                          use_prng=True):
        """Two-phase normalized merge: the beta/max of the normalization are
        global across shards (pmin/pmax between the kernel phases), so the
        sharded result equals the single-device normalized solve."""
        beta = jax.lax.pmin(raw["beta"], axis_name)
        cmax = jax.lax.pmax(raw["cmax"], axis_name)
        zsum, l = local_fused.weights_phase(seed, raw["costs"], beta, cmax,
                                            z=z, use_prng=use_prng)
        l_g = jax.lax.psum(l, axis_name)
        zsum_g = jax.lax.psum(zsum, axis_name)
        wnoise = local_fused.unfold_wnoise(zsum_g) / l_g
        info = {
            "cost_min": beta,
            "cost_max": cmax,
            "cost_mean": jax.lax.psum(raw["cost_sum"], axis_name) / k_global,
            "nabla": l_g,
        }
        return _postprocess(useq, wnoise, info)

    def _solve_shard(seed, state, useq, mparams, cparams):
        idx = jax.lax.axis_index(axis)
        shard_seed = seed + idx * n_tiles_local
        raw = local_fused.solve(shard_seed, state, useq,
                                mparams, cparams, use_prng=True,
                                return_raw=True, normalize=normalize_cost)
        if normalize_cost:
            return _merge_normalized(shard_seed, useq, raw, axis)
        return _merge(useq, raw, axis)

    def _solve_with_noise_shard(z, state, useq, mparams, cparams):
        raw = local_fused.solve(0, state, useq, mparams, cparams, z=z,
                                use_prng=False, return_raw=True,
                                normalize=normalize_cost)
        if normalize_cost:
            return _merge_normalized(0, useq, raw, axis, z=z,
                                     use_prng=False)
        return _merge(useq, raw, axis)

    rep = P()
    solve = jax.jit(_shard_map(
        _solve_shard, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep),
    ))
    solve_with_noise = jax.jit(_shard_map(
        _solve_with_noise_shard, mesh=mesh,
        in_specs=(P(None, None, axis), rep, rep, rep, rep),
        out_specs=(rep, rep, rep),
    ))
    return solve, solve_with_noise


class ShardedFusedMPPI(ShardedControllerMixin):
    """ShardedMPPI with a fused Pallas kernel per device shard.

    Same user-facing surface (next/set_goal/useq). Supports the kernels'
    model/cost domains: PointMassModel + {StaticCost, WayPointsCost,
    ElipseCost}, or AUVModel + {StaticQuatCost, ElipseCost3D}, with the
    single-device
    option set (normalize_cost/clip/filter/antithetic/noise_schedule/
    kernel_dtype).
    """

    def __init__(self, model, cost, mesh: Mesh, k: int, tau: int,
                 lam: float, upsilon: float, sigma, tile=None,
                 seed: int = 0, axis: str = SAMPLE_AXIS,
                 interpret: bool = False, observer=None, init_seq=None,
                 normalize_cost: bool = False, clip_actions: bool = False,
                 filter_seq: bool = False, filter_window: int = 9,
                 filter_polyorder: int = 3, antithetic: bool = False,
                 noise_schedule=None,
                 kernel_dtype: str = "float32"):
        from ..kernels.auv_mppi import FusedAUVMPPI
        from ..kernels.errors import KernelUnsupportedError
        from ..kernels.nn_mppi import FusedNNMPPI
        from ..kernels.pm_mppi import FusedLTIMPPI, FusedPointMassMPPI

        n = mesh.shape[axis]
        if k % n != 0:
            raise ValueError(f"k={k} not divisible by mesh axis {axis}={n}")
        k_local = k // n
        if tile is None:  # measured default, per-shard (pm_mppi sweep)
            from ..kernels.pm_mppi import default_tile

            tile = default_tile(k_local)
        tile = int(tile)
        err = None
        self._fused = None
        # FusedNNMPPI included: reaching ShardedFusedMPPI at all requires
        # an explicit kernel='pallas' or TPU 'auto' via get_controller,
        # which itself keeps NN on the XLA path unless forced
        for cls in (FusedPointMassMPPI, FusedLTIMPPI, FusedAUVMPPI,
                    FusedNNMPPI):
            try:
                # the schedule is construction-time config on the sharded
                # path: the kernel's init values are the single source of
                # truth (solve()'s sched default falls back to them)
                self._fused = cls(model, cost, k=k_local, tau=tau, lam=lam,
                                  upsilon=upsilon, sigma=sigma, tile=tile,
                                  interpret=interpret, antithetic=antithetic,
                                  schedule=noise_schedule,
                                  compute_dtype=kernel_dtype)
                break
            except KernelUnsupportedError as e:
                err = e
        if self._fused is None:
            raise KernelUnsupportedError(
                "no fused kernel supports "
                f"{type(model).__name__} + "
                f"{type(cost).__name__}") from err
        filter_mat = None
        if filter_seq:
            from ..controller.mppi import savgol_matrix

            filter_mat = savgol_matrix(tau, filter_window, filter_polyorder)
        self._solve, self._solve_with_noise = build_sharded_fused_solve(
            self._fused, mesh, k, axis=axis,
            normalize_cost=normalize_cost, clip_actions=clip_actions,
            act_min=model.min_act(), act_max=model.max_act(),
            filter_mat=filter_mat)
        self._seed_stride = n * ((k_local + tile - 1) // tile)
        self._base_seed = int(seed)
        self._dtype = model.dtype
        self._cost = cost
        adim = model.get_action_dim()
        if init_seq is not None:
            self._useq = jnp.asarray(
                np.asarray(init_seq, np.float64).reshape(tau, adim),
                dtype=self._dtype)
        else:
            self._useq = jnp.zeros((tau, adim), dtype=self._dtype)
        self._mparams = model.init_params()
        self._cparams = cost.init_params()
        self._model = model
        self._observer = observer
        self._steps = 0
        self._timing = {"total": 0.0, "calls": 0}

    def next(self, state) -> np.ndarray:
        state = jnp.asarray(np.asarray(state, np.float64).reshape(-1),
                            dtype=self._dtype)
        start = time.perf_counter()
        seed = np.int32(self._base_seed + self._steps * self._seed_stride)
        action, self._useq, info = self._solve(
            seed, state, self._useq, self._mparams, self._cparams)
        out = np.asarray(action)
        self._timing["total"] += time.perf_counter() - start
        self._timing["calls"] += 1
        self._steps += 1
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
        return (np.int32(self._base_seed), state, self._useq, self._mparams,
                self._cparams)

    def _trace_snapshot(self):
        return (self._steps, jnp.array(self._useq))

    def _trace_restore(self, snap):
        # restore the nominal sequence too: a configured init_seq must
        # survive trace() (same contract as MPPI.trace)
        self._steps, self._useq = snap
        self._timing = {"total": 0.0, "calls": 0}

    def save_state(self, path: str):
        """Checkpoint the mutable controller state (mirrors MPPI.save_state;
        the PRNG position is the deterministic step counter). Cost params
        (re-tasked goals, mission queues) are state too — see
        controller/state_io.py."""
        from ..controller.state_io import cparams_entries

        np.savez(path, useq=np.asarray(self._useq), steps=self._steps,
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
        self._steps = int(d["steps"])
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
