"""Roofline / MFU accounting for the MPPI benchmark rows.

The north-star claim is "speed-of-light rollout kernels per chip"
(BASELINE.json). This module makes that claim *checkable* from the bench
artifacts (VERDICT r4 next-step #1): every TPU bench row carries

- an ANALYTIC work model of the solve (f32 FLOPs, transcendental ops,
  HBM bytes), derived from the kernel structure and the actual nonzero
  patterns of the baked matrices (zero entries generate no code in the
  fused kernels — the flop model honours that);
- MEASURED device ceilings (elementwise-FMA rate, transcendental rate,
  HBM stream bandwidth), obtained from three tiny compiled microbenchmarks
  at bench time on the same chip — so the roofline needs no hard-coded
  datasheet numbers and stays honest on any backend;
- the resulting bound classification ("transcendental" / "compute" /
  "hbm") and the fraction of that bound the measured latency achieves.

Why these three ceilings: the fused MPPI kernels are VPU programs — scalar-
coefficient FMA chains over (8, L) f32 blocks with an in-kernel Box-Muller
noise draw (log/sqrt/cos/sin per pair of normals) and one exp per sample
for the softmax. There are no MXU matmuls and almost no HBM traffic (SMEM
scalars in, SMEM scalars out; the noise never exists in HBM) — so the
speed of light is set by whichever of FMA issue, transcendental issue, or
(for the XLA paths, which DO materialise the [K, tau, aDim] noise tensor)
HBM bandwidth binds first.

The per-op transcendental ceiling is measured with exp(); on TPU the other
transcendentals (log, sqrt, cos, sin) lower through the same VPU
special-function path with similar issue rates, so one measured rate is
used for all of them (documented approximation, like the +-10% flop
model).
"""

from __future__ import annotations

import functools

import numpy as np

# FLOPs counted as: multiply = 1, add = 1 (an FMA = 2). Matches how the
# measured FMA-chain ceiling is counted, so fractions are comparable.


# ---------------------------------------------------------------------------
# measured ceilings
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def measure_ceilings(reps: int = 3):
    """Measure {vpu_flops, transcendental_per_s, hbm_bytes_per_s} on the
    default backend with three compiled microbenchmarks.

    Each microbench chains enough work into ONE dispatch that the host
    round trip (axon relay: ~22-33 ms) is amortised to <2%.
    """
    import time

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()

    # METHODOLOGY (hard-won on the relay-attached testbed): over the axon
    # relay, ``block_until_ready`` does NOT wait for device completion —
    # a 64x-bigger chained workload "finished" in the same 70 us, so any
    # timing that doesn't FETCH a value is fiction. Every microbench here
    # therefore returns a scalar reduction and the timing includes
    # ``float(...)`` (a real round trip), with enough chained work per
    # dispatch (~200-400 ms of device time on TPU) that the ~25 ms fetch
    # RTT — measured separately and subtracted — is noise.
    big = backend == "tpu"

    def timed_fetch(fn, *args):
        float(fn(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n = 1 << 20
    x0 = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32)

    # fetch-only baseline: dispatch + scalar round trip with ~zero compute
    base = timed_fetch(jax.jit(lambda x: x[0]), x0)

    # -- elementwise FMA rate -------------------------------------------
    # four INDEPENDENT chains interleaved: a single serial chain measures
    # dependency latency (1.16 Tflop/s on this v5e), not issue throughput
    # — the kernels have abundant ILP across state components, so the
    # roofline uses the ILP-4 rate
    depth = 128   # FMAs per chain per loop iteration
    iters = 4096 if big else 8

    @jax.jit
    def fma_chain(x):
        def body(_, carry):
            a, b, cc, d, c = carry
            # evolving runtime coefficient: no affine folding
            for _i in range(depth):
                a = a * c + np.float32(1e-9)
                b = b * c + np.float32(2e-9)
                cc = cc * c + np.float32(3e-9)
                d = d * c + np.float32(4e-9)
                c = c + np.float32(1e-12)
            return (a, b, cc, d, c)

        out = jax.lax.fori_loop(
            0, iters, body,
            (x, x + 0.5, x + 1.0, x + 1.5, jnp.float32(1.0000001)))
        return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[2]) \
            + jnp.sum(out[3])

    t = max(timed_fetch(fma_chain, x0) - base, 1e-9)
    vpu_flops = 2.0 * 4 * depth * iters * n / t

    # -- transcendental (exp) rate --------------------------------------
    depth_e = 128
    iters_e = 4096 if big else 8
    xe = jnp.linspace(0.1, 1.0, n, dtype=jnp.float32)

    @jax.jit
    def exp_chain(x):
        def body(_, x):
            for _i in range(depth_e):
                x = jnp.exp(-x)  # stays in (e^-1, 1): no overflow
            return x

        return jnp.sum(jax.lax.fori_loop(0, iters_e, body, x))

    t = max(timed_fetch(exp_chain, xe) - base, 1e-9)
    trans_per_s = depth_e * iters_e * n / t

    # -- HBM stream bandwidth -------------------------------------------
    nb = 1 << 26  # 256 MB f32: far beyond VMEM, forced to stream from HBM
    iters_b = 256 if big else 4
    xb = jnp.ones((nb,), jnp.float32)

    @jax.jit
    def stream(x):
        def body(_, x):
            # one elementwise pass per iteration; the fori boundary stops
            # cross-iteration fusion, so each is a full HBM read + write
            return x * np.float32(1.0000001) + np.float32(1e-9)

        return jnp.sum(jax.lax.fori_loop(0, iters_b, body, x))

    t = max(timed_fetch(stream, xb) - base, 1e-9)
    # + the final sum's read is negligible next to iters_b passes
    hbm_bytes_per_s = 2.0 * 4.0 * nb * iters_b / t

    # -- Box-Muller PAIR rate --------------------------------------------
    # one iteration = the kernel's per-pair math: log + sqrt + TWO
    # quarter-wave sin polynomials (kernels/pm_mppi._sin2pi — the builtin
    # cos/sin lower ~17x slower than log and were replaced) + the products.
    # Measured as its own ceiling because the serial log->sqrt chain sits
    # in neither the FMA nor the exp regime.
    iters_n = 2048 if big else 8
    xn = jnp.linspace(0.05, 0.95, n, dtype=jnp.float32)

    def _sin2pi(u):
        v = u - jnp.floor(u + np.float32(0.5))
        half = jnp.where(v >= 0.0, np.float32(0.5), np.float32(-0.5))
        w = jnp.where(jnp.abs(v) > np.float32(0.25), half - v, v)
        tq = w * w
        cs = (6.2831853071e+00, -4.1341702147e+01, 8.1605230507e+01,
              -7.6704495515e+01, 4.2014101088e+01, -1.4423966661e+01)
        pc = jnp.float32(cs[5])
        for k_ in (4, 3, 2, 1, 0):
            pc = pc * tq + np.float32(cs[k_])
        return w * pc

    @jax.jit
    def bm_chain(x):
        def body(_, x):
            r = jnp.sqrt(-2.0 * jnp.log(x))
            zc = r * _sin2pi(x + np.float32(0.25))
            zs = r * _sin2pi(x)
            return np.float32(0.5) + np.float32(0.1) * (zc - zs)

        return jnp.sum(jax.lax.fori_loop(0, iters_n, body, x))

    t = max(timed_fetch(bm_chain, xn) - base, 1e-9)
    bm_pairs_per_s = iters_n * n / t

    return {
        "backend": backend,
        "vpu_flops": vpu_flops,
        "transcendental_per_s": trans_per_s,
        "hbm_bytes_per_s": hbm_bytes_per_s,
        "bm_pairs_per_s": bm_pairs_per_s,
    }


# ---------------------------------------------------------------------------
# analytic work models
# ---------------------------------------------------------------------------

def _nnz(m):
    return int(np.count_nonzero(np.asarray(m)))


def noise_work(k_padded: int, tau: int, adim: int):
    """In-kernel Box-Muller work: per PAIR of normals one log, sqrt, cos,
    sin + ~10 algebraic flops. Normals drawn = k_padded * tau * adim
    (every lane of every tile draws, the solve masks pad lanes).
    Each PAIR is one unit of the MEASURED per-pair composite rate
    (``bm_pairs_per_s`` — log + sqrt + two sin polynomials), a regime
    neither the FMA nor the exp ceiling predicts."""
    normals = k_padded * tau * adim
    return {"flops": 5 * normals, "trans": 0,
            "bm_pairs": normals // 2}


def pm_work(fused, normalize: bool = False):
    """Analytic work model of one fused point-mass/LTI solve
    (kernels/pm_mppi.py), from the instance's own baked matrices.

    Per (sample, step): sparse A/Bs FMA chains (2 flops per nonzero — the
    kernel elides zeros), the drive combine (~3/state row), the quadratic
    state cost (2*nnz(Q) + 3*sdim), the action-cost z terms (2*adim +
    2*nnz(Mz) + 2*adim + 2). Terminal adds one state cost; softmax adds
    one exp + ~6 flops per sample and the weighted-z accumulation adds
    2*tau*adim per sample.
    """
    tau, sdim, adim = fused.tau, fused.sdim, fused.adim
    tile = fused.tile
    kp = ((fused.k + tile - 1) // tile) * tile
    mc = fused._mc
    if mc.get("dynamic_ab"):
        a_nnz, bs_nnz = sdim * sdim, sdim * adim  # dense SMEM chains
    else:
        a_nnz, bs_nnz = _nnz(mc["A"]), _nnz(mc["Bs"])
    if mc.get("cost_kind") == "quadratic":
        cost_flops = 2 * _nnz(mc["Q"]) + 3 * sdim
    else:  # elipse: ~12 flops + 1 sqrt (counted as transcendental below)
        cost_flops = 14
    step_flops = (2 * a_nnz + 2 * bs_nnz + 3 * sdim      # dynamics
                  + cost_flops                            # state cost
                  + 2 * adim                              # rhs_z . z
                  + 2 * _nnz(mc["Mz"]) + 2 * adim + 2)    # z^T Mz z
    per_sample = tau * step_flops + cost_flops            # + terminal
    softmax = 8 + 2 * tau * adim                          # exp arg + zsum
    nz = noise_work(kp, tau, adim)
    n_solves = 2 if normalize else 1  # two-phase regenerates the noise
    # per-sample transcendentals: the softmax exp, plus the ellipse cost's
    # per-step sqrt
    sample_trans = 1 + (tau if mc.get("cost_kind") != "quadratic" else 0)
    work = {
        "flops": kp * (per_sample + softmax) + nz["flops"] * n_solves,
        "trans": kp * sample_trans,
        "bm_pairs": nz["bm_pairs"] * n_solves,
        "hbm_bytes": (2 * 4 * kp) if normalize else 0,  # costs out + in
    }
    if normalize:
        # phase B re-weights every sample: another exp + zsum accumulate
        work["flops"] += kp * (8 + 2 * tau * adim)
        work["trans"] += kp
    return work


def auv_work(fused, normalize: bool = False):
    """Analytic work model of one fused AUV (Fossen 6-DoF) solve
    (kernels/auv_mppi.py). Hand-counted from the kernel body (+-10%):

    state_dot: rotation entries ~45, pose rates 15, quat rates 24,
    |nu|*nu 12, damping 2*(nnz(LD)+nnz(QD)) (+ forward-speed term if
    present), Coriolis M nu 72 + crosses 27 + combine 6, restoring ~20,
    rhs 18, inv_M solve 72  =>  ~311 + damping.
    Step: rk1 = state_dot + axpy(26); rk2 = 2*state_dot + 3*13 + 26.
    Plus norm_quat (~12 + 1 rsqrt), gen-force fold 2*nnz(scale) + 6,
    quat cost (~30 + acos poly 17 + 2*nnz(Q)), action-cost z terms as in
    the point-mass model.
    """
    tau = fused.tau
    tile = fused.tile
    kp = ((fused.k + tile - 1) // tile) * tile
    mc = fused._mc
    damping = 2 * (_nnz(mc["lin_damp"]) + _nnz(mc["quad_damp"]))
    if _nnz(mc["lin_damp_fwd"]):
        damping += 2 * _nnz(mc["lin_damp_fwd"]) + 6
    sdot = 311 + damping
    rk = int(mc["rk"])
    step_dyn = (sdot + 26) if rk == 1 else (2 * sdot + 39 + 26)
    gf = 2 * _nnz(mc["scale"]) + 6
    if mc.get("cost_kind") in ("static_quat", "waypoints_quat"):
        cost_flops = 30 + 17 + 2 * _nnz(mc["Q"])
        cost_trans = 0  # the acos is a polynomial (no special-fn issue)
        if mc.get("cost_kind") == "waypoints_quat":
            cost_flops *= 2  # exact two-goal blend
    else:  # elipse3d: plane rotation + tangent quat + rsqrt's
        cost_flops, cost_trans = 90, 2
    action_z = 2 * 6 + 2 * _nnz(mc["Mz"]) + 2 * 6 + 2
    per_sample = (tau * (gf + step_dyn + 13 + cost_flops + action_z)
                  + cost_flops)
    softmax = 8 + 2 * tau * 6
    nz = noise_work(kp, tau, 6)
    n_solves = 2 if normalize else 1
    work = {
        "flops": kp * (per_sample + softmax) + nz["flops"] * n_solves,
        # per sample: rsqrt in norm_quat (1/step) + the cost's own
        # transcendentals (rsqrt's; the acos is polynomial) + softmax exp
        "trans": kp * (tau * (1 + cost_trans) + 1),
        "bm_pairs": nz["bm_pairs"] * n_solves,
        "hbm_bytes": (2 * 4 * kp) if normalize else 0,
    }
    if normalize:
        work["flops"] += kp * (8 + 2 * tau * 6)
        work["trans"] += kp
    return work


def xla_solve_work(k: int, tau: int, adim: int, step_flops: int,
                   cost_flops: int, sdim: int):
    """Work model for the XLA (lax.scan) solve path: same arithmetic as
    the fused kernel PLUS the HBM traffic it cannot avoid — the
    [K, tau, aDim] noise tensor is materialised (write), read by the
    rollout, and read again by the weighted-noise contraction; the scan
    carries [K, sDim] state + [K] cost per step (read + write each)."""
    eps_bytes = 4 * k * tau * adim
    carry_bytes = 4 * k * (sdim + 1) * tau * 2
    per_sample = tau * (step_flops + cost_flops + 6 * adim) + cost_flops
    return {
        "flops": k * (per_sample + 8 + 2 * tau * adim)
        + 5 * k * tau * adim,
        "trans": k,  # softmax exp
        "bm_pairs": k * tau * adim // 2,  # RNG normals
        "hbm_bytes": 3 * eps_bytes + carry_bytes,
    }


# ---------------------------------------------------------------------------
# row annotation
# ---------------------------------------------------------------------------

def classify(work: dict, ceil: dict, measured_ms: float):
    """Given a work model, the measured ceilings and a measured latency,
    return the roofline annotation dict for a bench row's ``extra``.

    The stage bounds ADD (noise generation and the rollout are
    sequential phases of one kernel pass), so the speed-of-light is the
    SUM of the noise-stage and compute-stage times, each measured
    against its own ceiling, with HBM/transcendental as alternative
    binding resources."""
    t_flops = work["flops"] / ceil["vpu_flops"]
    t_trans = work.get("trans", 0) / ceil["transcendental_per_s"]
    t_noise = (work.get("bm_pairs", 0)
               / ceil.get("bm_pairs_per_s", float("inf")))
    t_hbm = work.get("hbm_bytes", 0) / ceil["hbm_bytes_per_s"]
    t_serial = t_flops + t_noise  # sequential stages of the same pass
    bounds = {"compute+noise": t_serial, "transcendental": t_trans,
              "hbm": t_hbm}
    bound = max(bounds, key=bounds.get)
    t_bound_ms = bounds[bound] * 1e3
    return {
        "flops": int(work["flops"]),
        "transcendentals": int(work.get("trans", 0)),
        "bm_pairs": int(work.get("bm_pairs", 0)),
        "hbm_bytes": int(work.get("hbm_bytes", 0)),
        "t_compute_ms": round(t_flops * 1e3, 4),
        "t_noise_ms": round(t_noise * 1e3, 4),
        "t_transcendental_ms": round(t_trans * 1e3, 4),
        "t_hbm_ms": round(t_hbm * 1e3, 4),
        "bound": bound,
        "sol_ms": round(t_bound_ms, 4),
        # fraction of the binding roofline achieved (1.0 = speed of light;
        # can exceed 1 only if the work model undercounts)
        "pct_of_bound": round(t_bound_ms / measured_ms, 4)
        if measured_ms > 0 else 0.0,
        "pct_vpu_peak": round(t_flops * 1e3 / measured_ms, 4)
        if measured_ms > 0 else 0.0,
    }


def nn_work(fused, normalize: bool = False):
    """Analytic work model of one fused NN solve (kernels/nn_mppi.py):
    per (sample, step) the folded MLP is sum(in*out) FMAs + ReLUs, plus
    the applied-action fold (2*nnz(scale) + 6), the quat-cost quadratic
    (~47 + 2*nnz(Q) flops, polynomial acos), the quat renorm (1 rsqrt),
    and the action-cost z terms; softmax + weighted-z as in pm_work."""
    tau = fused.tau
    tile = fused.tile
    kp = ((fused.k + tile - 1) // tile) * tile
    mc = fused._mc
    sizes = list(mc["sizes"])
    mlp = sum(2 * a * b + b for a, b in zip(sizes[:-1], sizes[1:]))
    gf = 2 * _nnz(mc["scale"]) + 6
    cost_flops = 47 + 2 * _nnz(mc["Q"])
    action_z = 2 * 6 + 2 * _nnz(mc["Mz"]) + 2 * 6 + 2
    per_sample = tau * (gf + mlp + 13 + 12 + cost_flops + action_z) \
        + cost_flops
    softmax = 8 + 2 * tau * 6
    nz = noise_work(kp, tau, 6)
    n_solves = 2 if normalize else 1
    work = {
        "flops": kp * (per_sample + softmax) + nz["flops"] * n_solves,
        "trans": kp * (tau + 1),  # rsqrt + softmax exp
        "bm_pairs": nz["bm_pairs"] * n_solves,
        "hbm_bytes": (2 * 4 * kp) if normalize else 0,
    }
    if normalize:
        work["flops"] += kp * (8 + 2 * tau * 6)
        work["trans"] += kp
    return work


def roofline_for_workload(workload: str, ctrl, measured_ms: float,
                          normalize: bool = False):
    """Annotation for a bench row given its controller. Returns None when
    no model applies (serving/cluster rows measure transport, not
    kernels)."""
    ceil = measure_ceilings()
    fused = getattr(ctrl, "_fused", None)
    if fused is not None:
        from .kernels.auv_mppi import FusedAUVMPPI
        from .kernels.nn_mppi import FusedNNMPPI

        if isinstance(fused, FusedNNMPPI):
            work = nn_work(fused, normalize)
        elif isinstance(fused, FusedAUVMPPI):
            work = auv_work(fused, normalize)
        else:
            work = pm_work(fused, normalize)
    else:
        # XLA path: coarse per-model step-flop estimates (the scan path's
        # cost is HBM-dominated, so ±2x on flops does not move the bound)
        k, tau = ctrl._k, ctrl._tau
        adim, sdim = ctrl._adim, ctrl._sdim
        name = type(ctrl._model).__name__
        step_flops = {"PointMassModel": 40, "DMDModel": 90,
                      "AUVModel": 800, "NNAUVModel": 7000,
                      "NNModel": 7000}.get(name, 2000)
        cost_flops = 40
        work = xla_solve_work(k, tau, adim, step_flops, cost_flops, sdim)
    return classify(work, ceil, measured_ms)
