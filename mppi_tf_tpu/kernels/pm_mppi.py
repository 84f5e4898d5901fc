"""Fused Pallas MPPI solve for LTI (point-mass) dynamics + quadratic cost.

The hot path of the whole framework. The XLA lax.scan path costs ~2.6 ms per
solve at K=100k, H=50 on one v5e chip (rollout ~2.2 ms + update ~0.8 ms),
bounded by materialising the noise tensor and the per-step scan carry in HBM.
This kernel fuses noise generation, the tau-step rollout, the cost
accumulation, and the softmax-weighted noise reduction into ONE pass over
K-tiles that never leaves VMEM:

- the K axis is tiled over a sequential grid; each tile keeps its state
  [8, tile] and its noise history [tau, 8, tile] resident in VMEM;
- noise is drawn in-kernel (pltpu.prng_* + Box-Muller) so the [K, tau, aDim]
  noise tensor NEVER exists in HBM (60 MB/solve saved three times over);
  a variant takes pre-drawn normals as input for exact parity testing;
- the per-tile softmax is merged across tiles online (flash-attention style
  running-max rescaling), so the weighted noise needs no second pass over
  HBM: outputs are just [tau, 8] + a handful of scalars per solve.

Layout notes (TPU): everything is transposed to [component, K-tile] so the
lane axis is the 128-multiple sample axis; components (sDim=6, aDim=3) pad
to 8 sublanes. The LTI step and quadratic cost become 8x8 @ 8xTILE matmuls
and row reductions — VPU/MXU friendly at any sDim <= 8.

Semantics match ops/update.mppi_update + ops/rollout.rollout_costs exactly
(reference: controller_base.py:299-346): per-step cost is state cost of the
*next* state + the gamma/upsilon action cost, terminal cost added on top,
weights = softmax(-(cost-beta)/lambda), wnoise = sum_k w_k eps_k.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # padded component dimension (sDim, aDim <= 8)
NEG_BIG = -1e30


def _bits_to_uniform(bits):
    """uint32 bits -> uniform f32 in [0, 1) without an int->float cast.

    Mosaic can't lower uint32->f32 converts; instead stuff the top 23 random
    bits into the mantissa of 1.0f (giving a uniform in [1, 2)) via bitcast
    and subtract 1.
    """
    mantissa = bits >> 9
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return one_to_two - 1.0


def _box_muller(bits1, bits2):
    """Standard normals from two uint32 bit fields."""
    u1 = _bits_to_uniform(bits1) + (2.0 ** -24)  # (0, 1]
    u2 = _bits_to_uniform(bits2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * math.pi) * u2)


def _make_kernel(tau: int, tile: int, k_total: int, lam: float,
                 nc_half: float, use_prng: bool):
    """Build the fused kernel body.

    Refs (in order):
        seed_ref:   SMEM [1] int32 — per-solve seed (ignored if not use_prng)
        consts_ref: VMEM [48, 128] — packed constant matrices (see pack_consts)
        steps_ref:  VMEM [tau, 128] — per-step constants
                    (cols 0:8 = B@u_t/m, 8:16 = gamma*invSig@u_t, 16 = half
                    pure-action cost)
        [z_ref]:    VMEM [tau, 8, tile] — pre-drawn normals (only if not
                    use_prng)
        S_ref:      VMEM out [tau, 8] — running sum_k exp(z_k - m) eps_k
        stats_ref:  SMEM out [8] — m, l, cost_min, cost_max, cost_sum
        eps_scr:    VMEM scratch [tau, 8, tile]
    """

    def kernel(*refs):
        if use_prng:
            seed_ref, consts_ref, steps_ref, s_ref, stats_ref, eps_scr = refs
            z_ref = None
        else:
            seed_ref, consts_ref, steps_ref, z_ref, s_ref, stats_ref, eps_scr = refs

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            s_ref[:] = jnp.zeros_like(s_ref)
            stats_ref[0] = NEG_BIG   # running max of z = -cost/lam
            stats_ref[1] = 0.0       # running l = sum exp(z - m)
            stats_ref[2] = -NEG_BIG  # cost min
            stats_ref[3] = NEG_BIG   # cost max
            stats_ref[4] = 0.0       # cost sum

        consts = consts_ref[:]
        A = consts[0:8, 0:8]
        Bm = consts[8:16, 0:8]
        Q = consts[16:24, 0:8]
        scale = consts[24:32, 0:8]
        invsig = consts[32:40, 0:8]
        x0 = consts[40, 0:8]
        goal = consts[41, 0:8]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + pid)

        x_init = jnp.broadcast_to(x0[:, None], (_ROWS, tile))
        cost_init = jnp.zeros((1, tile), dtype=jnp.float32)

        def step(t, carry):
            x, cost = carry
            if use_prng:
                bits1 = pltpu.prng_random_bits((_ROWS, tile))
                bits2 = pltpu.prng_random_bits((_ROWS, tile))
                z_t = _box_muller(pltpu.bitcast(bits1, jnp.uint32),
                                  pltpu.bitcast(bits2, jnp.uint32))
            else:
                z_t = z_ref[t]
            eps_t = jnp.dot(scale, z_t, preferred_element_type=jnp.float32)
            eps_scr[t] = eps_t
            row = steps_ref[t]
            bu_t = row[0:8]
            rhs_u = row[8:16]
            u_cost_half = row[16]
            x = (jnp.dot(A, x, preferred_element_type=jnp.float32)
                 + bu_t[:, None]
                 + jnp.dot(Bm, eps_t, preferred_element_type=jnp.float32))
            d = x - goal[:, None]
            cost = cost + jnp.sum(
                d * jnp.dot(Q, d, preferred_element_type=jnp.float32),
                axis=0, keepdims=True)
            # action cost: 0.5*gamma*u^T S^-1 u + gamma*(S^-1 u)^T eps
            #            + 0.5*lam*(1-1/ups)*eps^T S^-1 eps
            cost = cost + u_cost_half
            cost = cost + jnp.sum(rhs_u[:, None] * eps_t, axis=0,
                                  keepdims=True)
            if nc_half != 0.0:
                cost = cost + nc_half * jnp.sum(
                    eps_t * jnp.dot(invsig, eps_t,
                                    preferred_element_type=jnp.float32),
                    axis=0, keepdims=True)
            return x, cost

        x_fin, cost = jax.lax.fori_loop(0, tau, step, (x_init, cost_init))
        # terminal cost phi(x) = state cost of the final state
        d = x_fin - goal[:, None]
        cost = cost + jnp.sum(
            d * jnp.dot(Q, d, preferred_element_type=jnp.float32),
            axis=0, keepdims=True)

        # mask lanes beyond K
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        valid = (pid * tile + lane) < k_total
        z = jnp.where(valid, -cost / lam, NEG_BIG)

        # tile-local softmax pieces
        m_i = jnp.max(z)
        w = jnp.where(valid, jnp.exp(z - m_i), 0.0)  # [1, tile]
        l_i = jnp.sum(w)

        # online merge with the running (m, l, S)
        m_old = stats_ref[0]
        l_old = stats_ref[1]
        m_new = jnp.maximum(m_old, m_i)
        f_old = jnp.exp(m_old - m_new)
        f_new = jnp.exp(m_i - m_new)
        stats_ref[0] = m_new
        stats_ref[1] = l_old * f_old + l_i * f_new

        # weighted noise for this tile: [tau, 8]
        s_i = jnp.sum(w[None, :, :] * eps_scr[:], axis=-1)
        s_ref[:] = s_ref[:] * f_old + s_i * f_new

        # cost stats
        cost_masked_min = jnp.min(jnp.where(valid, cost, -NEG_BIG))
        cost_masked_max = jnp.max(jnp.where(valid, cost, NEG_BIG))
        stats_ref[2] = jnp.minimum(stats_ref[2], cost_masked_min)
        stats_ref[3] = jnp.maximum(stats_ref[3], cost_masked_max)
        stats_ref[4] = stats_ref[4] + jnp.sum(jnp.where(valid, cost, 0.0))

    return kernel


def pack_consts(A, B_over_m, Q, scale, inv_sigma, x0, goal):
    """Pack the small constant matrices into one [48, 128] f32 VMEM array."""
    consts = jnp.zeros((48, 128), dtype=jnp.float32)

    def put(mat, row):
        mat = jnp.asarray(mat, jnp.float32)
        r, c = mat.shape
        return consts.at[row:row + r, 0:c].set(mat)

    consts = put(A, 0)
    consts = put(B_over_m, 8)
    consts = put(Q, 16)
    consts = put(scale, 24)
    consts = put(inv_sigma, 32)
    consts = consts.at[40, 0:x0.shape[0]].set(jnp.asarray(x0, jnp.float32))
    consts = consts.at[41, 0:goal.shape[0]].set(jnp.asarray(goal, jnp.float32))
    return consts


def pack_steps(useq, B_over_m, inv_sigma, gamma):
    """Per-step constants [tau, 128]: B u_t / m, gamma invSig u_t, and half
    the pure-action cost 0.5 * gamma * u_t^T invSig u_t."""
    tau, adim = useq.shape
    useq = jnp.asarray(useq, jnp.float32)
    bu = useq @ jnp.asarray(B_over_m, jnp.float32)[:, :adim].T  # [tau, 8]
    rhs = gamma * (useq @ jnp.asarray(inv_sigma, jnp.float32)[:adim, :adim].T)
    u_cost_half = 0.5 * gamma * jnp.einsum(
        "ti,ij,tj->t", useq,
        jnp.asarray(inv_sigma, jnp.float32)[:adim, :adim], useq)
    steps = jnp.zeros((tau, 128), dtype=jnp.float32)
    steps = steps.at[:, 0:bu.shape[1]].set(bu)
    steps = steps.at[:, 8:8 + adim].set(rhs)
    steps = steps.at[:, 16].set(u_cost_half)
    return steps


@functools.partial(
    jax.jit,
    static_argnames=("tau", "adim", "k", "tile", "lam", "gamma", "upsilon",
                     "use_prng", "interpret"),
)
def fused_pm_solve(
    seed,
    consts,
    useq,
    z=None,
    *,
    tau: int,
    adim: int,
    k: int,
    tile: int = 2048,
    lam: float,
    gamma: float,
    upsilon: float,
    use_prng: bool = True,
    interpret: bool = False,
):
    """Run the fused solve. Returns (wnoise [tau, adim], stats dict).

    consts: output of :func:`pack_consts`; useq: [tau, adim] (full-precision
    step constants derived here); z: [tau, 8, k_padded] pre-drawn normals
    when use_prng=False (k_padded = ceil(k/tile)*tile).
    """
    n_tiles = (k + tile - 1) // tile
    k_padded = n_tiles * tile
    nc_half = 0.5 * lam * (1.0 - 1.0 / upsilon)

    Bm = consts[8:16, 0:8]
    invsig = consts[32:40, 0:8]
    steps = pack_steps(jnp.asarray(useq, jnp.float32), Bm, invsig, gamma)

    kernel = _make_kernel(tau, tile, k, lam, float(nc_half), use_prng)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # seed
        pl.BlockSpec((48, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                  # consts
        pl.BlockSpec((tau, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                  # steps
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), consts, steps]
    if not use_prng:
        assert z is not None and z.shape == (tau, _ROWS, k_padded), (
            z.shape, (tau, _ROWS, k_padded))
        in_specs.append(
            pl.BlockSpec((tau, _ROWS, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM))
        args.append(jnp.asarray(z, jnp.float32))

    out_shape = (
        jax.ShapeDtypeStruct((tau, _ROWS), jnp.float32),  # S
        jax.ShapeDtypeStruct((8,), jnp.float32),          # stats
    )
    out_specs = (
        pl.BlockSpec((tau, _ROWS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    S, stats = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tau, _ROWS, tile), jnp.float32)],
        interpret=(pltpu.InterpretParams() if interpret else False),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)

    l = stats[1]
    wnoise = (S[:, :adim] / l).astype(jnp.float32)
    info = {
        "cost_min": stats[2],
        "cost_max": stats[3],
        "cost_mean": stats[4] / k,
        "nabla": l,  # sum of exp(-(c-beta)/lam): beta = -lam*m
    }
    return wnoise, info


class FusedPointMassMPPI:
    """Drop-in fused solve for MPPI over PointMassModel + StaticCost.

    Used by controller.MPPI when ``kernel="pallas"``: computes the weighted
    noise + cost stats with :func:`fused_pm_solve`, then the sequence
    update/shift happens in plain XLA (ops/update.py).
    """

    def __init__(self, model, cost, k: int, tau: int, lam: float,
                 upsilon: float, sigma, tile: int = 2048,
                 interpret: bool = False):
        from ..costs.static import StaticCost
        from ..models.point_mass import PointMassModel

        if not isinstance(model, PointMassModel):
            raise TypeError("fused kernel supports PointMassModel only")
        if type(cost) is not StaticCost:
            raise TypeError("fused kernel supports StaticCost only")
        self.model = model
        self.cost = cost
        self.k = int(k)
        self.tau = int(tau)
        self.lam = float(lam)
        self.gamma = cost.gamma
        self.upsilon = float(upsilon)
        self.tile = int(tile)
        self.interpret = bool(interpret)
        self.adim = model.get_action_dim()
        self.sdim = model.get_state_dim()
        sigma = np.asarray(sigma, np.float64)
        self._scale = jnp.asarray(upsilon * sigma, jnp.float32)
        self._inv_sigma = jnp.asarray(np.linalg.inv(sigma), jnp.float32)

    def consts_for(self, mparams, cparams, x0):
        A = self.model._A
        B_over_m = self.model._B / mparams["mass"]
        return pack_consts(A, B_over_m, self.cost.Q, self._scale,
                           self._inv_sigma, jnp.asarray(x0, jnp.float32),
                           cparams["goal"])

    def solve(self, seed, x0, useq, mparams, cparams, z=None,
              use_prng: bool = True):
        consts = self.consts_for(mparams, cparams, x0)
        return fused_pm_solve(
            seed, consts, useq, z,
            tau=self.tau, adim=self.adim, k=self.k, tile=self.tile,
            lam=self.lam, gamma=self.gamma, upsilon=self.upsilon,
            use_prng=use_prng, interpret=self.interpret,
        )
