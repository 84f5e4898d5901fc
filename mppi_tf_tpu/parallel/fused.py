"""Mesh-sharded fused-kernel MPPI: Pallas per shard + collective merge.

Composes the fused VMEM-resident point-mass kernel (kernels/pm_mppi.py)
with the K-axis device mesh (parallel/sharded.py): every device runs the
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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.pm_mppi import FusedPointMassMPPI, fused_pm_solve
from ..ops import update as upd
from .mesh import SAMPLE_AXIS


def _shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the default vma check rejects inside shard_map.
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def build_sharded_fused_solve(fused: FusedPointMassMPPI, mesh: Mesh,
                              axis: str = SAMPLE_AXIS):
    """Return (solve, solve_with_noise) jitted over ``mesh``.

    solve(seed, state, useq, mparams, cparams) -> (action, next_useq, info);
    all inputs replicated, K sharded internally. fused.k must be divisible
    by the mesh size along ``axis``. solve_with_noise takes chunked normals
    (kernels.pm_mppi.chunk_noise layout, lane dim = padded K) sharded over
    the lane axis for parity tests.
    """
    n = mesh.shape[axis]
    if fused.k % n != 0:
        raise ValueError(f"k={fused.k} not divisible by mesh axis {axis}={n}")
    k_local = fused.k // n
    n_tiles_local = (k_local + fused.tile - 1) // fused.tile
    tau, adim = fused.tau, fused.adim

    def _merge(useq, raw, scale, axis_name):
        m_g = jax.lax.pmax(raw["m"], axis_name)
        f = jnp.exp(raw["m"] - m_g)
        l_g = jax.lax.psum(raw["l"] * f, axis_name)
        zsum_g = jax.lax.psum(raw["zsum"] * f, axis_name)
        wnoise = (zsum_g @ scale.T) / l_g
        new_useq = useq + wnoise.astype(useq.dtype)
        action = new_useq[0]
        shifted = upd.shift(
            new_useq, jnp.zeros((1, adim), dtype=new_useq.dtype), 1)
        info = {
            "cost_min": jax.lax.pmin(raw["cost_min"], axis_name),
            "cost_max": jax.lax.pmax(raw["cost_max"], axis_name),
            "cost_mean": jax.lax.psum(raw["cost_sum"], axis_name) / fused.k,
            "nabla": l_g,
        }
        return action, shifted, info

    def _solve_shard(seed, state, useq, mparams, cparams):
        idx = jax.lax.axis_index(axis)
        consts, Bm = fused.consts_for(mparams, cparams, state)
        scale = consts[44:44 + adim, 0:adim]
        raw = fused_pm_solve(
            seed + idx * n_tiles_local, consts, Bm,
            jnp.asarray(useq, jnp.float32),
            tau=tau, adim=adim, k=k_local, tile=fused.tile, lam=fused.lam,
            gamma=fused.gamma, upsilon=fused.upsilon, use_prng=True,
            interpret=fused.interpret, return_raw=True)
        return _merge(useq, raw, scale, axis)

    def _solve_with_noise_shard(z, state, useq, mparams, cparams):
        consts, Bm = fused.consts_for(mparams, cparams, state)
        scale = consts[44:44 + adim, 0:adim]
        raw = fused_pm_solve(
            0, consts, Bm, jnp.asarray(useq, jnp.float32), z,
            tau=tau, adim=adim, k=k_local, tile=fused.tile, lam=fused.lam,
            gamma=fused.gamma, upsilon=fused.upsilon, use_prng=False,
            interpret=fused.interpret, return_raw=True)
        return _merge(useq, raw, scale, axis)

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


class ShardedFusedMPPI:
    """ShardedMPPI with the fused Pallas kernel per device shard.

    Same user-facing surface (next/set_goal/useq); PointMassModel +
    StaticCost only (the kernel's domain).
    """

    def __init__(self, model, cost, mesh: Mesh, k: int, tau: int,
                 lam: float, upsilon: float, sigma, tile: int = 8192,
                 seed: int = 0, axis: str = SAMPLE_AXIS,
                 interpret: bool = False):
        self._fused = FusedPointMassMPPI(model, cost, k=k, tau=tau, lam=lam,
                                         upsilon=upsilon, sigma=sigma,
                                         tile=tile, interpret=interpret)
        self._solve, self._solve_with_noise = build_sharded_fused_solve(
            self._fused, mesh, axis=axis)
        n = mesh.shape[axis]
        self._seed_stride = n * ((k // n + tile - 1) // tile)
        self._base_seed = int(seed)
        self._dtype = model.dtype
        self._cost = cost
        self._useq = jnp.zeros((tau, model.get_action_dim()), dtype=self._dtype)
        self._mparams = model.init_params()
        self._cparams = cost.init_params()
        self._steps = 0
        self._timing = {"total": 0.0, "calls": 0}

    def next(self, state) -> np.ndarray:
        state = jnp.asarray(np.asarray(state, np.float64).reshape(-1),
                            dtype=self._dtype)
        start = time.perf_counter()
        seed = np.int32(self._base_seed + self._steps * self._seed_stride)
        action, self._useq, _info = self._solve(
            seed, state, self._useq, self._mparams, self._cparams)
        out = np.asarray(action)
        self._timing["total"] += time.perf_counter() - start
        self._timing["calls"] += 1
        self._steps += 1
        return out

    def set_goal(self, goal):
        self._cparams = self._cost.set_goal(self._cparams, goal)

    @property
    def useq(self):
        return self._useq

    @property
    def timing(self):
        return dict(self._timing)

    @property
    def model_params(self):
        return self._mparams
