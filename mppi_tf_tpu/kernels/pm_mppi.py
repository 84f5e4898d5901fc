"""Fused Pallas MPPI solve for LTI (point-mass) dynamics + quadratic cost.

The hot path of the whole framework. The XLA lax.scan path costs ~2.6 ms per
solve at K=100k, H=50 on one v5e chip, bounded by materialising the noise
tensor and the per-step scan carry in HBM. This kernel fuses noise
generation, the tau-step rollout, the cost accumulation, and the
softmax-weighted noise reduction into ONE pass over K-tiles that never
leaves VMEM:

- the K axis is tiled over a sequential grid; each tile keeps its state
  [8, tile] and its standard-normal history resident in VMEM;
- noise is drawn in-kernel (pltpu.prng_* + Box-Muller) so the [K, tau, aDim]
  noise tensor NEVER exists in HBM; a variant takes pre-drawn normals as
  input for exact parity testing;
- the per-tile softmax is merged across tiles online (flash-attention style
  running-max rescaling), so the weighted noise needs no second pass over
  HBM: outputs are just a small [rows, 128] block + a few scalars per solve.

Performance-critical structure (measured on v5e, K=100k H=50):
- Transcendentals dominate a naive design: Box-Muller's log/sqrt/cos on an
  8-sublane [8, tile] block per step costs ~1.2 ms/solve when only aDim=3
  rows are useful and the sin half of each pair is discarded (~5x waste).
  Here normals are generated in CHUNK_STEPS-step blocks of [adim*CH, tile]
  rows — every sublane useful — and BOTH halves (r*cos, r*sin) of each
  Box-Muller pair are consumed, cutting transcendental work ~5x.
- The noise-scale matrix is FOLDED into the constants: dynamics use
  B@scale, the action-cost linear term uses scale^T(gamma Sig^-1 u), and the
  quadratic term uses M_z = scale^T Sig^-1 scale, so the kernel only ever
  touches raw normals z; eps = scale@z is never materialised. The weighted
  noise is un-folded once at the end: sum_k w eps = scale @ (sum_k w z).
- The horizon loop is Python-unrolled (tau is static) so all chunk/row
  slices are static — no dynamic sublane indexing.
- The small matmuls (8x8 @ 8xtile on the MXU) are effectively free — they
  overlap with the VPU work.

Layout notes (TPU): everything is transposed to [component, K-tile] so the
lane axis is the 128-multiple sample axis; components (sDim=6, aDim=3) pad
to 8 sublanes.

Semantics match ops/update.mppi_update + ops/rollout.rollout_costs exactly
(reference: controller_base.py:299-346): per-step cost is state cost of the
*next* state + the gamma/upsilon action cost, terminal cost added on top,
weights = softmax(-(cost-beta)/lambda), wnoise = sum_k w_k eps_k.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # padded component dimension (sDim, aDim <= 8)
NEG_BIG = -1e30


def chunk_steps(adim: int) -> int:
    """Steps per noise chunk: smallest CH with adim*CH a multiple of 16
    (so the Box-Muller pair block adim*CH/2 is sublane-aligned)."""
    ch = 1
    while (adim * ch) % 16:
        ch += 1
    return ch


def _bits_to_uniform(bits):
    """uint32 bits -> uniform f32 in [0, 1) without an int->float cast.

    Mosaic can't lower uint32->f32 converts; instead stuff the top 23 random
    bits into the mantissa of 1.0f (giving a uniform in [1, 2)) via bitcast
    and subtract 1.
    """
    mantissa = bits >> 9
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return one_to_two - 1.0


def _make_kernel(tau: int, adim: int, tile: int, k_total: int, lam: float,
                 nc_half: float, use_prng: bool):
    """Build the fused kernel body.

    Refs (in order):
        seed_ref:   SMEM [1] int32 — per-solve seed (ignored if not use_prng)
        consts_ref: VMEM [48, 128] — packed constant matrices (pack_consts)
        steps_ref:  VMEM [tau, 128] — per-step constants (pack_steps)
        [z_ref]:    VMEM [n_chunks, rows, tile] — pre-drawn normals in
                    chunked layout (only if not use_prng); row j*adim+i of
                    chunk c is (step c*CH+j, action dim i)
        s_ref:      VMEM out [rows, 128] — col c = running sum_k w_k z_k for
                    chunk c's rows
        stats_ref:  SMEM out [8] — m, l, cost_min, cost_max, cost_sum
        [z_scr]:    VMEM scratch [n_chunks, rows, tile] (only if use_prng)
    """
    ch = chunk_steps(adim)
    rows = adim * ch
    pairs = rows // 2
    n_chunks = (tau + ch - 1) // ch

    def kernel(*refs):
        if use_prng:
            seed_ref, consts_ref, steps_ref, s_ref, stats_ref, z_scr = refs
        else:
            seed_ref, consts_ref, steps_ref, z_scr, s_ref, stats_ref = refs

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
        BmS = consts[8:16, 0:adim]   # (B/m) @ scale, adim useful columns
        Q = consts[16:24, 0:8]
        Mz = consts[24:32, 0:adim][0:adim]  # scale^T Sig^-1 scale
        x0 = consts[40, 0:8]
        goal = consts[41, 0:8]
        steps = steps_ref[:]

        # ---- noise generation: full-utilisation Box-Muller per chunk ----
        if use_prng:
            pltpu.prng_seed(seed_ref[0] + pid)
            for c in range(n_chunks):
                b1 = pltpu.bitcast(pltpu.prng_random_bits((pairs, tile)),
                                   jnp.uint32)
                b2 = pltpu.bitcast(pltpu.prng_random_bits((pairs, tile)),
                                   jnp.uint32)
                u1 = _bits_to_uniform(b1) + (2.0 ** -24)  # (0, 1]
                theta = (2.0 * math.pi) * _bits_to_uniform(b2)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                z_scr[c] = jnp.concatenate(
                    [r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)

        def z_at(t):
            c, j = divmod(t, ch)
            return z_scr[c, j * adim:(j + 1) * adim, :]  # (adim, tile)

        # ---- rollout: tau unrolled steps, all-static slicing ----
        # Per-step costs are accumulated WITHOUT row reductions: acc8/acc3
        # keep full (rows, tile) partial products and the sublane reduction
        # happens once per tile at the end — per-step (1, tile) ops would
        # waste 7/8 of every vreg's sublanes. The sample-independent
        # 0.5*gamma*u^T Sig^-1 u terms arrive pre-summed over t via
        # steps_ref[0, 17] (pack_steps).
        x = jnp.broadcast_to(x0[:, None], (_ROWS, tile))
        acc8 = jnp.zeros((_ROWS, tile), dtype=jnp.float32)   # d * (Q d)
        acc3 = jnp.zeros((adim, tile), dtype=jnp.float32)    # z-cost terms
        for t in range(tau):
            z_t = z_at(t)
            row = steps[t]
            bu_t = row[0:8]          # B u_t / m
            rhs_z = row[8:8 + adim]  # scale^T (gamma Sig^-1 u_t)
            x = (jnp.dot(A, x, preferred_element_type=jnp.float32)
                 + bu_t[:, None]
                 + jnp.dot(BmS, z_t, preferred_element_type=jnp.float32))
            # action cost: 0.5*gamma*u^T S^-1 u + gamma*(S^-1 u)^T eps
            #            + 0.5*lam*(1-1/ups)*eps^T S^-1 eps, eps = scale z
            d = x - goal[:, None]
            acc8 = acc8 + d * jnp.dot(Q, d,
                                      preferred_element_type=jnp.float32)
            acc3 = acc3 + rhs_z[:, None] * z_t
            if nc_half != 0.0:
                acc3 = acc3 + nc_half * z_t * jnp.dot(
                    Mz, z_t, preferred_element_type=jnp.float32)
        # terminal cost phi(x) = state cost of the final state
        d = x - goal[:, None]
        acc8 = acc8 + d * jnp.dot(Q, d, preferred_element_type=jnp.float32)
        u_cost_total = steps[0, 17]  # sum_t 0.5 gamma u_t^T Sig^-1 u_t
        cost = (jnp.sum(acc8, axis=0, keepdims=True)
                + jnp.sum(acc3, axis=0, keepdims=True) + u_cost_total)

        # mask lanes beyond K
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        valid = (pid * tile + lane) < k_total
        zarg = jnp.where(valid, -cost / lam, NEG_BIG)

        # tile-local softmax pieces
        m_i = jnp.max(zarg)
        w = jnp.where(valid, jnp.exp(zarg - m_i), 0.0)  # [1, tile]
        l_i = jnp.sum(w)

        # online merge with the running (m, l, S)
        m_old = stats_ref[0]
        l_old = stats_ref[1]
        m_new = jnp.maximum(m_old, m_i)
        f_old = jnp.exp(m_old - m_new)
        f_new = jnp.exp(m_i - m_new)
        stats_ref[0] = m_new
        stats_ref[1] = l_old * f_old + l_i * f_new

        # weighted normals: col c of s_ref accumulates chunk c's row sums
        s_ref[:] = s_ref[:] * f_old
        for c in range(n_chunks):
            col = jnp.sum(z_scr[c] * w, axis=1, keepdims=True)  # (rows, 1)
            s_ref[:, c:c + 1] += col * f_new

        # cost stats
        stats_ref[2] = jnp.minimum(
            stats_ref[2], jnp.min(jnp.where(valid, cost, -NEG_BIG)))
        stats_ref[3] = jnp.maximum(
            stats_ref[3], jnp.max(jnp.where(valid, cost, NEG_BIG)))
        stats_ref[4] = stats_ref[4] + jnp.sum(jnp.where(valid, cost, 0.0))

    return kernel, rows, n_chunks


def pack_consts(A, B_over_m, Q, scale, inv_sigma, x0, goal):
    """Pack the constant matrices into one [48, 128] f32 VMEM array.

    Rows 0:8 A | 8:16 (B/m)@scale | 16:24 Q | 24:32 scale^T Sig^-1 scale |
    40 x0 | 41 goal. All noise-scale folding happens here (module
    docstring): the kernel only ever sees raw standard normals.
    """
    consts = jnp.zeros((48, 128), dtype=jnp.float32)

    def put(mat, row):
        mat = jnp.asarray(mat, jnp.float32)
        r, c = mat.shape
        return consts.at[row:row + r, 0:c].set(mat)

    scale = jnp.asarray(scale, jnp.float32)
    inv_sigma = jnp.asarray(inv_sigma, jnp.float32)
    consts = put(A, 0)
    consts = put(jnp.asarray(B_over_m, jnp.float32) @ scale, 8)
    consts = put(Q, 16)
    consts = put(scale.T @ inv_sigma @ scale, 24)
    consts = consts.at[40, 0:x0.shape[0]].set(jnp.asarray(x0, jnp.float32))
    consts = consts.at[41, 0:goal.shape[0]].set(jnp.asarray(goal, jnp.float32))
    return consts


def pack_steps(useq, B_over_m, scale, inv_sigma, gamma):
    """Per-step constants [tau, 128]: cols 0:8 = B u_t / m, 8:8+adim =
    scale^T (gamma Sig^-1 u_t), 16 = 0.5 gamma u_t^T Sig^-1 u_t."""
    tau, adim = useq.shape
    useq = jnp.asarray(useq, jnp.float32)
    B_over_m = jnp.asarray(B_over_m, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)[:adim, :adim]
    inv_sigma = jnp.asarray(inv_sigma, jnp.float32)[:adim, :adim]
    bu = useq @ B_over_m[:, :adim].T  # [tau, 8]
    rhs_u = gamma * (useq @ inv_sigma.T)       # gamma Sig^-1 u_t
    rhs_z = rhs_u @ scale                      # scale^T (gamma Sig^-1 u_t)
    u_cost_half = 0.5 * gamma * jnp.einsum("ti,ij,tj->t", useq, inv_sigma,
                                           useq)
    steps = jnp.zeros((tau, 128), dtype=jnp.float32)
    steps = steps.at[:, 0:bu.shape[1]].set(bu)
    steps = steps.at[:, 8:8 + adim].set(rhs_z)
    steps = steps.at[:, 16].set(u_cost_half)
    # col 17 of row 0: the horizon-summed pure-action cost (sample
    # independent) so the kernel adds it once instead of per step
    steps = steps.at[0, 17].set(jnp.sum(u_cost_half))
    return steps


def chunk_noise(z_std):
    """[tau, adim, k_pad] standard normals -> the kernel's chunked layout
    [n_chunks, adim*CH, k_pad] (parity-test helper; zero-pads tail steps)."""
    tau, adim, k_pad = z_std.shape
    ch = chunk_steps(adim)
    n_chunks = (tau + ch - 1) // ch
    z = np.zeros((n_chunks * ch, adim, k_pad), np.float32)
    z[:tau] = np.asarray(z_std, np.float32)
    return z.reshape(n_chunks, ch * adim, k_pad)


class FusedPointMassMPPI:
    """Drop-in fused solve for MPPI over PointMassModel + StaticCost.

    Used by controller.MPPI when ``kernel="pallas"``: computes the weighted
    noise + cost stats with :func:`fused_pm_solve`, then the sequence
    update/shift happens in plain XLA (ops/update.py).
    """

    def __init__(self, model, cost, k: int, tau: int, lam: float,
                 upsilon: float, sigma, tile: int = 8192,
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
        consts = pack_consts(A, B_over_m, self.cost.Q, self._scale,
                             self._inv_sigma,
                             jnp.asarray(x0, jnp.float32), cparams["goal"])
        # stash raw matrices the solve wrapper needs for steps packing /
        # un-folding (rows 32:40 Sig^-1, 44:44+adim scale)
        consts = consts.at[32:32 + self.adim, 0:self.adim].set(
            self._inv_sigma[:self.adim, :self.adim])
        consts = consts.at[44:44 + self.adim, 0:self.adim].set(
            self._scale[:self.adim, :self.adim])
        Bm = jnp.asarray(B_over_m, jnp.float32)
        return consts, Bm

    def solve(self, seed, x0, useq, mparams, cparams, z=None,
              use_prng: bool = True):
        consts, Bm = self.consts_for(mparams, cparams, x0)
        return fused_pm_solve(
            seed, consts, Bm, jnp.asarray(useq, jnp.float32), z,
            tau=self.tau, adim=self.adim, k=self.k, tile=self.tile,
            lam=self.lam, gamma=self.gamma, upsilon=self.upsilon,
            use_prng=use_prng, interpret=self.interpret,
        )


@functools.partial(
    jax.jit,
    static_argnames=("tau", "adim", "k", "tile", "lam", "gamma", "upsilon",
                     "use_prng", "interpret", "return_raw"),
)
def fused_pm_solve(seed, consts, Bm, useq, z=None, *, tau, adim, k,
                   tile, lam, gamma, upsilon, use_prng, interpret,
                   return_raw: bool = False):
    """Run the fused solve. Returns (wnoise [tau, adim], stats dict).

    consts: output of :func:`FusedPointMassMPPI.consts_for` (pack_consts +
    stashed Sig^-1 / scale rows); Bm: raw [8, 8] B/mass for per-step
    constant packing; useq: [tau, adim]; z: chunked pre-drawn normals from
    :func:`chunk_noise` when use_prng=False. The returned weighted noise is
    un-folded here: scale @ (sum_k w_k z_k) / l.

    return_raw=True instead returns the online-softmax merge pieces
    {m, l, zsum, cost_min, cost_max, cost_sum} so a mesh-sharded caller can
    merge shards with pmax/psum exactly like the kernel merges tiles
    (parallel/fused.py).
    """
    n_tiles = (k + tile - 1) // tile
    nc_half = 0.5 * lam * (1.0 - 1.0 / upsilon)
    scale = consts[44:44 + adim, 0:adim]
    inv_sigma = consts[32:40, 0:8]

    kernel, rows, n_chunks = _make_kernel(tau, adim, tile, k, lam,
                                          float(nc_half), use_prng)
    steps = pack_steps(useq, Bm, scale, inv_sigma, gamma)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((48, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tau, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), consts, steps]
    scratch_shapes = []
    if use_prng:
        scratch_shapes.append(pltpu.VMEM((n_chunks, rows, tile), jnp.float32))
    else:
        k_padded = n_tiles * tile
        assert z is not None and z.shape == (n_chunks, rows, k_padded), (
            None if z is None else z.shape, (n_chunks, rows, k_padded))
        in_specs.append(
            pl.BlockSpec((n_chunks, rows, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM))
        args.append(jnp.asarray(z, jnp.float32))

    out_shape = (
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((8,), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    S, stats = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(pltpu.InterpretParams() if interpret else False),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*args)

    l = stats[1]
    ch = chunk_steps(adim)
    zsum = S[:, :n_chunks].T.reshape(n_chunks * ch, adim)[:tau]
    if return_raw:
        return {"m": stats[0], "l": l, "zsum": zsum, "cost_min": stats[2],
                "cost_max": stats[3], "cost_sum": stats[4]}
    wnoise = (zsum @ scale.T) / l
    info = {
        "cost_min": stats[2],
        "cost_max": stats[3],
        "cost_mean": stats[4] / k,
        "nabla": l,
    }
    return wnoise, info
