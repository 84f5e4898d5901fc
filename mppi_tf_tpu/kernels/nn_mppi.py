"""Fused Pallas MPPI solve for learned NN dynamics (NNAUVModel).

SURVEY §7 names this the hard part of the kernel family ("MLP weights must
live in VMEM/SMEM; decide Pallas-matmul vs falling back to XLA fusion" —
reference model nn_model.py:54-60). Round 4 left the NN family on the XLA
path with no recorded measurement; this kernel is the measured answer
(VERDICT r4 next-step #2).

Why NOT an MXU matmul kernel: the reference MLP is 16->32->32->32->13 — a
*thin* network. On the 128x128 systolic array every layer pads its
contraction and output dims to 128, so the padded work is ~30x the true
work and the solve is bound by MXU row streaming (measured: the XLA path,
which already batches K samples as the matmul M dim, sits at ~1.3 ms for
K=65536, H=25 — right at the thin-matmul streaming bound of ~4 rows/cycle;
a Pallas matmul kernel streams the same rows and cannot beat it).

The VPU hypothesis this kernel tests: per (sample, step) the MLP is only
~3.5k multiply-adds. In the component-major folded layout (one (8, L)
block per feature/neuron, as kernels/auv_mppi.py) each weight is a
SCALAR, so the whole network becomes scalar-times-block FMA chains with
zero padding waste (~10 Gflop at K=65536, H=25 => ~1.8 ms at the
fetch-forced ILP-4 VPU rate of 5.8 Tflop/s, roofline.measure_ceilings),
plus in-kernel noise and the fused softmax. MEASURED OUTCOME on the
v5e: 2.16 ms vs the XLA path's 1.27 ms at the reference shape — the
kernel actually runs at ~83% of its VPU roofline, but that roofline is
ABOVE the XLA MXU path's thin-matmul floor: for a per-step MLP the MXU
wins even at ~30x padding, so the hypothesis fails on the bound itself
and XLA remains the NN default (`kernel='auto'` never selects this
kernel; explicit `kernel='pallas'` does). Kept as the parity-tested
record of the experiment VERDICT r4 #2 asked for — and as the only NN
path whose weights update with zero recompile (SMEM data), which the
XLA path also achieves natively (weights are jit arguments there).

Key structural differences from the point-mass/AUV kernels:

- the horizon loop is a ``lax.fori_loop`` (not unrolled): the MLP body is
  ~3.5k ops and has NO compile-time sparsity to exploit (weights are
  runtime data), so unrolling tau would explode the program for zero
  zero-elision gain. Step-dependent scalars (useq, rhs_z, schedule) are
  dynamic SMEM reads; the noise scratch uses a PER-STEP layout
  ``[tau, 48, L]`` so only the (leading) step index is dynamic;
- the MLP weights ride the SMEM dynamic array (~3.1k scalars for the
  reference 3x32 topology) with the model's X/Y normalisation FOLDED into
  the first/last layers at pack time, so a Learner weight update is pure
  data — the executable never recompiles (the MBRL train-while-control
  loop depends on this, same contract as the DMD kernel's SMEM (A, B)).

Semantics match models/nn.NNAUVModel.step + costs/static.StaticQuatCost +
ops/update.mppi_update (reference: nn_model.py:179-304,
static_cost.py:145-159, controller_base.py:299-346).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .errors import KernelUnsupportedError
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .auv_mppi import _acos
from .pm_mppi import NEG_INF, _bits_to_uniform, _freeze, _sin2pi

_SUB = 8


class _DynNN:
    """SMEM scalar-array layout. ``sizes`` is the MLP layer-size chain
    (e.g. [16, 32, 32, 32, 13])."""

    def __init__(self, tau: int, sizes, scheduled: bool = False):
        self.x0 = 0                      # 13
        self.goal = 13                   # 13
        self.useq = 26                   # tau*6
        self.rhs_z = 26 + 6 * tau        # tau*6
        self.u_half = 26 + 12 * tau      # 1
        off = self.u_half + 1
        self.w_off = []                  # per layer: (w at, b at), row-major
        for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
            self.w_off.append((off, off + fan_in * fan_out))
            off += fan_in * fan_out + fan_out
        self.size = off
        if scheduled:
            self.sched = self.size       # tau
            self.size += tau


def _fill_noise_steps(z_scr, seed_ref, pid, tau, pair_rows, L,
                      antithetic: bool):
    """Per-STEP noise layout: z_scr[t] is (48, L) — rows 8j..8j+8 hold
    action dim j (j<3 from the Box-Muller cos half, j>=3 from the sin
    half). Same batched bits->BM chain as pm_mppi._fill_noise; the layout
    differs so the rollout's fori_loop needs only the LEADING (step) index
    to be dynamic."""
    pltpu.prng_seed(seed_ref[0] + pid)
    rows_all = tau * pair_rows
    b1 = pltpu.bitcast(pltpu.prng_random_bits((rows_all, L)), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits((rows_all, L)), jnp.uint32)
    u1 = _bits_to_uniform(b1) + (2.0 ** -24)
    u2 = _bits_to_uniform(b2)  # theta = 2*pi*u2, consumed via _sin2pi
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    rc = (r * _sin2pi(u2 + 0.25)).reshape(tau, pair_rows, L)
    rs = (r * _sin2pi(u2)).reshape(tau, pair_rows, L)
    z = jnp.concatenate([rc, rs], axis=1)
    if antithetic:
        lane_i = jax.lax.broadcasted_iota(jnp.int32, z.shape, 2)
        mirrored = pltpu.roll(z, shift=L // 2, axis=2)
        z = jnp.where(lane_i < L // 2, z, -mirrored)
    z_scr[:] = z.astype(z_scr.dtype)


def chunk_noise_nn(z_std, tile: int):
    """[tau, 6, K] standard normals -> the per-step layout
    [tau, 48, n_tiles * L] (parity-test helper; see _fill_noise_steps)."""
    tau, adim, k = z_std.shape
    assert adim == 6
    L = tile // _SUB
    n_tiles = (k + tile - 1) // tile
    k_pad = n_tiles * tile
    zp = np.zeros((tau, 6, k_pad), np.float32)
    zp[..., :k] = np.asarray(z_std, np.float32)
    zf = zp.reshape(tau, 6, n_tiles, _SUB, L)
    out = np.zeros((tau, 6 * _SUB, n_tiles * L), np.float32)
    for t in range(tau):
        for j in range(6):
            for p in range(n_tiles):
                out[t, _SUB * j:_SUB * (j + 1), p * L:(p + 1) * L] = \
                    zf[t, j, p]
    return out


def _make_nn_kernel(mc, tau: int, tile: int, k_total: int, use_prng: bool,
                    mode: str = "fused"):
    """Kernel body. ``mc`` compile-time constants: sizes (MLP chain),
    scale (6x6 noise scale), Mz, Q (10x10 quat-cost), lam, nc_half,
    renorm_quat, antithetic, scheduled, compute_dtype."""
    L = tile // _SUB
    pair_rows = 3 * _SUB  # 6 dims * 8 rows / 2 (cos+sin halves)
    sizes = list(mc["sizes"])
    scheduled = bool(mc.get("scheduled", False))
    antithetic = bool(mc.get("antithetic", False))
    renorm_quat = bool(mc.get("renorm_quat", True))
    cdt = (jnp.bfloat16 if mc.get("compute_dtype") == "bfloat16"
           else jnp.float32)
    dyn = _DynNN(tau, sizes, scheduled)
    lam = float(mc["lam"])
    nc_half = float(mc["nc_half"])
    SCALE = np.asarray(mc["scale"], np.float64)
    MZ = np.asarray(mc["Mz"], np.float64)
    QC = np.asarray(mc["Q"], np.float64)

    def kernel(*refs):
        if mode == "fused":
            if use_prng:
                seed_ref, dyn_ref, s_ref, stats_ref, z_scr = refs
            else:
                seed_ref, dyn_ref, z_scr, s_ref, stats_ref = refs
        elif mode == "costs":
            if use_prng:
                seed_ref, dyn_ref, costs_ref, stats_ref, z_scr = refs
            else:
                seed_ref, dyn_ref, z_scr, costs_ref, stats_ref = refs
        else:  # "weights"
            if use_prng:
                seed_ref, nrm_ref, costs_ref, s_ref, stats_ref, z_scr = refs
            else:
                seed_ref, nrm_ref, z_scr, costs_ref, s_ref, stats_ref = refs

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            if mode in ("fused", "weights"):
                for i in range(tau * 6):
                    s_ref[i] = 0.0
            stats_ref[0] = NEG_INF
            stats_ref[1] = 0.0
            stats_ref[2] = -NEG_INF
            stats_ref[3] = NEG_INF
            stats_ref[4] = 0.0

        if use_prng:
            _fill_noise_steps(z_scr, seed_ref, pid, tau, pair_rows, L,
                              antithetic)

        def zrow_static(t, j):
            """(8, L) normals for static (t, j) — the zsum unroll."""
            return z_scr[t, _SUB * j:_SUB * (j + 1), :].astype(cdt)

        sub_i = jax.lax.broadcasted_iota(jnp.int32, (_SUB, L), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (_SUB, L), 1)
        valid = (pid * tile + sub_i * L + lane_i) < k_total

        if mode == "weights":
            # phase B: regenerate the noise, weight by the normalized
            # exponent, accumulate (l, zsum) — same semantics as
            # pm_mppi.make_weights_kernel on the per-step layout
            beta = nrm_ref[0]
            inv_dl = nrm_ref[1]
            cost = costs_ref[0]
            w_arr = jnp.where(valid, jnp.exp(-(cost - beta) * inv_dl), 0.0)
            stats_ref[1] = stats_ref[1] + jnp.sum(w_arr)
            for t in range(tau):
                for j in range(6):
                    idx = t * 6 + j
                    s_ref[idx] = s_ref[idx] + jnp.sum(
                        w_arr * zrow_static(t, j).astype(jnp.float32))
            return

        def d_(i):
            """SMEM scalar (static or traced index) at compute dtype."""
            return dyn_ref[i].astype(cdt)

        def quat_quad(x):
            """StaticQuatCost 10-dim quadratic vs the SMEM goal
            (static_cost.py:145-159; same form as kernels/auv_mppi.py).
            Evaluated in f32 at bf16: the clip/acos compares cannot
            legalize on packed bf16 vectors (see auv_mppi)."""
            if cdt != jnp.float32:
                x = [xi.astype(jnp.float32) for xi in x]
            gl = [dyn_ref[dyn.goal + i] for i in range(13)]
            dvec = [x[0] - gl[0], x[1] - gl[1], x[2] - gl[2]]
            qdot = (x[3] * gl[3] + x[4] * gl[4] + x[5] * gl[5]
                    + x[6] * gl[6])
            theta = 2.0 * _acos(jnp.clip(qdot, -1.0, 1.0))
            dvec.append(theta)
            for i in range(6):
                dvec.append(x[7 + i] - gl[7 + i])
            out = None
            for i in range(10):
                qd = None
                for j in range(10):
                    qij = float(QC[i, j])
                    if qij == 0.0:
                        continue
                    term = qij * dvec[j]
                    qd = term if qd is None else qd + term
                if qd is None:
                    continue
                term = dvec[i] * qd
                out = term if out is None else out + term
            return out if out is not None else jnp.zeros((_SUB, L), cdt)

        # ---- rollout: fori_loop over steps; carry = 13 state blocks +
        # the f32 cost accumulator --------------------------------------
        x0 = [jnp.full((_SUB, L), 1.0, cdt) * d_(dyn.x0 + i)
              for i in range(13)]
        acc0 = jnp.zeros((_SUB, L), jnp.float32)

        def step(t, carry):
            x = list(carry[:13])
            acc = carry[13]
            ct = d_(dyn.sched + t) if scheduled else None
            ct32 = dyn_ref[dyn.sched + t] if scheduled else None
            # noise for this step: dynamic LEADING index only
            zt_all = z_scr[t].astype(cdt)          # (48, L)
            z_t = [zt_all[_SUB * j:_SUB * (j + 1), :] for j in range(6)]
            # eps = (c_t) * scale @ z; applied = useq_t + eps
            u_app = []
            for j in range(6):
                sz = None
                for i in range(6):
                    s_ = float(SCALE[j, i])
                    if s_ != 0.0:
                        term = s_ * z_t[i]
                        sz = term if sz is None else sz + term
                uj = jnp.full((_SUB, L), 1.0, cdt) * d_(dyn.useq + 6 * t + j)
                if sz is not None:
                    uj = uj + (ct * sz if scheduled else sz)
                u_app.append(uj)
            # features: [x[3:13], applied_u] (position dropped — NNAUVModel
            # translation invariance, nn_model.py:289-293); X-normalisation
            # is folded into layer 1 at pack time
            h = x[3:13] + u_app
            n_layers = len(sizes) - 1
            for li, (fan_in, fan_out) in enumerate(
                    zip(sizes[:-1], sizes[1:])):
                w_at, b_at = dyn.w_off[li]
                nxt = []
                for j in range(fan_out):
                    acc_j = d_(b_at + j) * jnp.ones((_SUB, L), cdt)
                    for i in range(fan_in):
                        acc_j = acc_j + d_(w_at + i * fan_out + j) * h[i]
                    if li < n_layers - 1:
                        acc_j = jnp.maximum(acc_j, 0.0)  # ReLU
                    nxt.append(acc_j)
                h = nxt
            # delta (Y-denormalisation folded into the last layer) + state
            x = [x[i] + h[i] for i in range(13)]
            if renorm_quat:
                qn = jax.lax.rsqrt(jnp.maximum(
                    (x[3] * x[3] + x[4] * x[4] + x[5] * x[5]
                     + x[6] * x[6]).astype(jnp.float32), 1e-24)).astype(cdt)
                x = x[0:3] + [x[3] * qn, x[4] * qn, x[5] * qn,
                              x[6] * qn] + x[7:13]
            # cost: state cost of the NEXT state + action-cost z terms
            sc = quat_quad(x)
            acc = acc + sc.astype(jnp.float32)
            for j in range(6):
                acc = acc + (d_(dyn.rhs_z + 6 * t + j)
                             * z_t[j]).astype(jnp.float32)
            if nc_half != 0.0:
                quad = None
                for i in range(6):
                    mz = None
                    for j in range(6):
                        mij = float(MZ[i, j])
                        if mij == 0.0:
                            continue
                        term = mij * z_t[j]
                        mz = term if mz is None else mz + term
                    if mz is None:
                        continue
                    term = z_t[i] * mz
                    quad = term if quad is None else quad + term
                if quad is not None:
                    # nc_half * c_t in f32 (no scalar bf16 arithmetic)
                    nc = ((nc_half * ct32).astype(cdt) if scheduled
                          else nc_half)
                    acc = acc + (nc * quad).astype(jnp.float32)
            return tuple(x) + (acc,)

        out = jax.lax.fori_loop(0, tau, step, tuple(x0) + (acc0,))
        x, acc_cost = list(out[:13]), out[13]
        acc_cost = acc_cost + quat_quad(x).astype(jnp.float32)  # terminal
        acc_cost = acc_cost + dyn_ref[dyn.u_half]

        if mode == "fused":
            zarg = jnp.where(valid, -acc_cost / lam, NEG_INF)
            m_i = jnp.max(zarg)
            w_arr = jnp.where(valid, jnp.exp(zarg - m_i), 0.0)
            l_i = jnp.sum(w_arr)
            m_old = stats_ref[0]
            l_old = stats_ref[1]
            m_new = jnp.maximum(m_old, m_i)
            f_old = jnp.exp(m_old - m_new)
            f_new = jnp.exp(m_i - m_new)
            stats_ref[0] = m_new
            stats_ref[1] = l_old * f_old + l_i * f_new
            for t in range(tau):
                for j in range(6):
                    val = jnp.sum(w_arr
                                  * zrow_static(t, j).astype(jnp.float32))
                    idx = t * 6 + j
                    s_ref[idx] = s_ref[idx] * f_old + val * f_new
        else:  # "costs"
            costs_ref[0] = acc_cost

        stats_ref[2] = jnp.minimum(
            stats_ref[2], jnp.min(jnp.where(valid, acc_cost, -NEG_INF)))
        stats_ref[3] = jnp.maximum(
            stats_ref[3], jnp.max(jnp.where(valid, acc_cost, NEG_INF)))
        stats_ref[4] = stats_ref[4] + jnp.sum(
            jnp.where(valid, acc_cost, 0.0))

    return kernel, dyn


class FusedNNMPPI:
    """Fused Pallas solve for NNAUVModel + StaticQuatCost.

    Mirrors FusedPointMassMPPI's surface (``solve``/``costs_phase``/
    ``weights_phase``/``unfold_wnoise``/``with_k``); the MLP weights ride
    SMEM per solve, so Learner updates (model_params setter) reach the
    kernel as data with NO recompile.
    """

    def __init__(self, model, cost, k: int, tau: int, lam: float,
                 upsilon: float, sigma, tile: int = 4096,
                 interpret: bool = False, antithetic: bool = False,
                 schedule=None, compute_dtype: str = "float32"):
        from ..costs.static import StaticQuatCost
        from ..models.nn import NNAUVModel, NNAUVModelSpeed
        from ..ops.noise import resolve_noise_schedule

        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be 'float32' or 'bfloat16', got "
                f"{compute_dtype!r}")
        # NNAUVModelSpeed advances the pose analytically (different step
        # algebra) — not this kernel's domain
        if not isinstance(model, NNAUVModel) or isinstance(
                model, NNAUVModelSpeed):
            raise KernelUnsupportedError(
                "fused NN kernel supports NNAUVModel only")
        if type(cost) is not StaticQuatCost:
            raise KernelUnsupportedError(
                "fused NN kernel supports StaticQuatCost only")
        if model.get_action_dim() != 6:
            raise KernelUnsupportedError(
                "fused NN kernel is specialised to the 6-action AUV")
        if tile % _SUB:
            raise ValueError("tile must be a multiple of 8")
        if antithetic and (tile // _SUB) % 2:
            raise ValueError("antithetic pairing needs an even lane count "
                             "(tile multiple of 16)")
        self.model = model
        self.cost = cost
        self.k = int(k)
        self.tau = int(tau)
        self.lam = float(lam)
        self.gamma = float(cost.gamma)
        self.upsilon = float(upsilon)
        self.tile = int(tile)
        self.interpret = bool(interpret)
        self.antithetic = bool(antithetic)
        self.adim = 6
        self.sdim = 13
        sigma = np.asarray(sigma, np.float64)
        self.sigma = sigma
        self._scale = upsilon * sigma
        self._inv_sigma = np.linalg.inv(sigma)
        self._sched0 = resolve_noise_schedule(schedule, self.tau)
        self.scheduled = self._sched0 is not None
        self.compute_dtype = compute_dtype
        sizes = [model.input_dim(), *model._hidden, model.output_dim()]
        nc_half = 0.5 * self.lam * (1.0 - 1.0 / self.upsilon)
        self._mc = {
            "sizes": tuple(sizes),
            "scale": self._scale,
            "Mz": self._scale.T @ self._inv_sigma @ self._scale,
            "Q": np.asarray(cost.Q, np.float64),
            "lam": self.lam,
            "nc_half": nc_half,
            "renorm_quat": bool(model.renormalize_quat),
            "antithetic": self.antithetic,
            "scheduled": self.scheduled,
            "compute_dtype": compute_dtype,
        }
        self._jit_key = (type(self).__name__, _freeze(self._mc),
                         self.k, self.tau, self.tile, self.interpret)

    def with_k(self, k: int) -> "FusedNNMPPI":
        return type(self)(self.model, self.cost, k=k, tau=self.tau,
                          lam=self.lam, upsilon=self.upsilon,
                          sigma=self.sigma, tile=self.tile,
                          interpret=self.interpret,
                          antithetic=self.antithetic,
                          schedule=self._sched0,
                          compute_dtype=self.compute_dtype)

    def __hash__(self):
        return hash(self._jit_key)

    def __eq__(self, other):
        return (type(other) is type(self)
                and other._jit_key == self._jit_key)

    def _sched_vals(self, sched):
        if sched is None:
            return jnp.asarray(self._sched0, jnp.float32)
        return jnp.asarray(sched, jnp.float32).reshape(self.tau)

    def unfold_wnoise(self, zsum, sched=None):
        """wnoise_t = c_t * scale @ zsum_t (c_t = 1 unscheduled)."""
        scale = jnp.asarray(self._scale, jnp.float32)
        w = zsum @ scale.T
        if self.scheduled:
            w = w * self._sched_vals(sched)[:, None]
        return w

    def pack_dyn(self, mparams, cparams, x0, useq, sched=None):
        """Assemble the SMEM array: controller scalars + the MLP weights
        with X/Y normalisation FOLDED in:

            layer1:  W1' = diag(1/x_std) W1,  b1' = b1 - (x_mean/x_std) W1
            last:    Wn' = Wn diag(y_std),    bn' = bn * y_std + y_mean

        so the kernel runs the pure folded MLP on raw features and adds
        its output directly to the state (nn_model.py:215-239 algebra).
        """
        dyn = _DynNN(self.tau, list(self._mc["sizes"]), self.scheduled)
        useq = jnp.asarray(useq, jnp.float32).reshape(self.tau, 6)
        inv_sig = jnp.asarray(self._inv_sigma, jnp.float32)
        scale = jnp.asarray(self._scale, jnp.float32)
        rhs_z = (self.gamma * (useq @ inv_sig.T)) @ scale
        u_half = 0.5 * self.gamma * jnp.einsum(
            "ti,ij,tj->t", useq, inv_sig, useq)
        out = jnp.zeros((dyn.size,), jnp.float32)
        if self.scheduled:
            c = self._sched_vals(sched)
            u_half = u_half / c
            out = out.at[dyn.sched:dyn.sched + self.tau].set(c)
        out = out.at[dyn.x0:dyn.x0 + 13].set(
            jnp.asarray(x0, jnp.float32).reshape(13))
        out = out.at[dyn.goal:dyn.goal + 13].set(
            jnp.asarray(cparams["goal"], jnp.float32))
        out = out.at[dyn.useq:dyn.useq + 6 * self.tau].set(useq.reshape(-1))
        out = out.at[dyn.rhs_z:dyn.rhs_z + 6 * self.tau].set(
            rhs_z.reshape(-1))
        out = out.at[dyn.u_half].set(jnp.sum(u_half))

        x_mean = jnp.asarray(mparams["x_mean"], jnp.float32)
        x_std = jnp.asarray(mparams["x_std"], jnp.float32)
        y_mean = jnp.asarray(mparams["y_mean"], jnp.float32)
        y_std = jnp.asarray(mparams["y_std"], jnp.float32)
        net = mparams["net"]
        n_layers = len(net)
        for li, layer in enumerate(net):
            w = jnp.asarray(layer["w"], jnp.float32)
            b = jnp.asarray(layer["b"], jnp.float32)
            if li == 0:
                w = w / x_std[:, None]
                b = b - (x_mean / x_std) @ jnp.asarray(layer["w"],
                                                       jnp.float32)
            if li == n_layers - 1:
                w = w * y_std[None, :]
                b = b * y_std + y_mean
            w_at, b_at = dyn.w_off[li]
            out = out.at[w_at:w_at + w.size].set(w.reshape(-1))
            out = out.at[b_at:b_at + b.size].set(b.reshape(-1))
        return out

    def solve(self, seed, x0, useq, mparams, cparams, z=None,
              use_prng: bool = True, return_raw: bool = False,
              normalize: bool = False, sched=None):
        """One MPPI solve (same contract as FusedPointMassMPPI.solve)."""
        dyn_arr = self.pack_dyn(mparams, cparams, x0, useq, sched=sched)
        if not normalize:
            raw = _fused_nn_call(seed, dyn_arr, z, fused=self,
                                 use_prng=use_prng, return_raw=True)
            if return_raw:
                return raw
            wnoise = self.unfold_wnoise(raw["zsum"], sched) / raw["l"]
            info = {"cost_min": raw["cost_min"],
                    "cost_max": raw["cost_max"],
                    "cost_mean": raw["cost_sum"] / self.k,
                    "nabla": raw["l"]}
            return wnoise, info
        costs, stats = _fused_nn_costs(seed, dyn_arr, z, fused=self,
                                       use_prng=use_prng)
        beta, cmax = stats[2], stats[3]
        if return_raw:
            return {"costs": costs, "beta": beta, "cmax": cmax,
                    "cost_sum": stats[4]}
        zsum, l = self.weights_phase(seed, costs, beta, cmax, z=z,
                                     use_prng=use_prng)
        wnoise = self.unfold_wnoise(zsum, sched) / l
        info = {"cost_min": beta, "cost_max": cmax,
                "cost_mean": stats[4] / self.k, "nabla": l}
        return wnoise, info

    def costs_phase(self, seed, x0, useq, mparams, cparams, z=None,
                    use_prng: bool = True, sched=None):
        dyn_arr = self.pack_dyn(mparams, cparams, x0, useq, sched=sched)
        costs, stats = _fused_nn_costs(seed, dyn_arr, z, fused=self,
                                       use_prng=use_prng)
        return costs, {"cost_min": stats[2], "cost_max": stats[3],
                       "cost_sum": stats[4]}

    def weights_phase(self, seed, costs, beta, cmax, z=None,
                      use_prng: bool = True):
        denom = cmax - beta
        denom = jnp.where(denom > 0, denom, jnp.ones_like(denom))
        nrm = jnp.stack([beta, 1.0 / (denom * self.lam)]).astype(jnp.float32)
        return _fused_nn_weights(seed, nrm, costs, z, fused=self,
                                 use_prng=use_prng)


def _nn_pallas(seed, dyn_or_nrm, z, costs, *, fused, use_prng, mode):
    """Shared pallas_call assembly for the three modes."""
    tau, tile, k = fused.tau, fused.tile, fused.k
    L = tile // _SUB
    n_tiles = (k + tile - 1) // tile
    kernel, _dyn = _make_nn_kernel(fused._mc, tau, tile, k, use_prng,
                                   mode=mode)
    rows = 6 * _SUB
    zdt = (jnp.bfloat16 if fused.compute_dtype == "bfloat16"
           else jnp.float32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), dyn_or_nrm]
    scratch_shapes = []
    if use_prng:
        scratch_shapes.append(pltpu.VMEM((tau, rows, L), zdt))
    else:
        assert z is not None and z.shape == (tau, rows, n_tiles * L), (
            None if z is None else z.shape, (tau, rows, n_tiles * L))
        in_specs.append(
            pl.BlockSpec((tau, rows, L), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM))
        args.append(jnp.asarray(z, jnp.float32))
    if mode == "weights":
        in_specs.append(
            pl.BlockSpec((1, _SUB, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(costs)

    if mode == "costs":
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, _SUB, L), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, _SUB, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    else:
        out_shape = (
            jax.ShapeDtypeStruct((tau * 6,), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(pltpu.InterpretParams() if fused.interpret else False),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*args)


@functools.partial(jax.jit, static_argnames=("fused", "use_prng",
                                             "return_raw"))
def _fused_nn_call(seed, dyn_arr, z=None, *, fused: FusedNNMPPI,
                   use_prng: bool, return_raw: bool):
    S, stats = _nn_pallas(seed, dyn_arr, z, None, fused=fused,
                          use_prng=use_prng, mode="fused")
    l = stats[1]
    zsum = S.reshape(fused.tau, 6)
    if return_raw:
        return {"m": stats[0], "l": l, "zsum": zsum, "cost_min": stats[2],
                "cost_max": stats[3], "cost_sum": stats[4]}
    wnoise = fused.unfold_wnoise(zsum) / l
    info = {"cost_min": stats[2], "cost_max": stats[3],
            "cost_mean": stats[4] / fused.k, "nabla": l}
    return wnoise, info


@functools.partial(jax.jit, static_argnames=("fused", "use_prng"))
def _fused_nn_costs(seed, dyn_arr, z=None, *, fused: FusedNNMPPI,
                    use_prng: bool):
    return _nn_pallas(seed, dyn_arr, z, None, fused=fused,
                      use_prng=use_prng, mode="costs")


@functools.partial(jax.jit, static_argnames=("fused", "use_prng"))
def _fused_nn_weights(seed, nrm, costs, z=None, *, fused: FusedNNMPPI,
                      use_prng: bool):
    S, stats = _nn_pallas(seed, jnp.asarray(nrm, jnp.float32).reshape(2),
                          z, costs, fused=fused, use_prng=use_prng,
                          mode="weights")
    return S.reshape(fused.tau, 6), stats[1]
