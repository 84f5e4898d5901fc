"""Benchmark: MPPI replan latency / throughput on the BASELINE workload.

Workload (BASELINE.md): point_mass3d dynamics, horizon H=50, K=100,000
samples per solve, f32, single chip. The reference publishes no numbers
(BASELINE.md "published: {}"); the target is the driver's north star —
a 10 ms replan budget at K>=100k, H=50. ``vs_baseline`` is therefore
(10 ms / measured p50): >= 1.0 means the budget is met, higher is better.

Env knobs: BENCH_WORKLOAD=point_mass|auv, BENCH_KERNEL=pallas|xla,
BENCH_K / BENCH_TAU / BENCH_CHAIN, BENCH_SHARDED=1 (shard K over a mesh of
all visible devices — the multi-host harness; combine with
XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu to
exercise an N-device virtual mesh).

Methodology: the solve is chained S times inside one jitted ``lax.fori_loop``
(carrying key/state/sequence like a real receding-horizon loop) and timed
with ``block_until_ready``, so the number reflects device time rather than
per-call host dispatch. Measured: one dispatch over the axon HTTP relay
costs ~22-33 ms of RTT regardless of content (an empty 50-step fori_loop
times identically), so the chain must be long to amortize it — at
CHAIN=2000 the RTT share is ~11-16 us/solve. Single-call dispatch latency
is reported alongside in "extra".
"""

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp

    # honour an explicit CPU request: the axon sitecustomize rewrites
    # jax_platforms at interpreter start, so the env var alone is ignored
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from mppi_tf_tpu.controller.mppi import MPPI
    from mppi_tf_tpu.costs import get_cost
    from mppi_tf_tpu.models import get_model

    backend = jax.default_backend()
    # point_mass (BASELINE workload, default) or auv (rexrov2 + static_quat)
    WORKLOAD = os.environ.get("BENCH_WORKLOAD", "point_mass")
    K = int(os.environ.get("BENCH_K",
                           {"point_mass": 100_000, "nn": 16_384}.get(
                               WORKLOAD, 65_536)))
    TAU = int(os.environ.get("BENCH_TAU",
                             50 if WORKLOAD == "point_mass" else 25))
    CHAIN = int(os.environ.get("BENCH_CHAIN", 2000))
    # pallas = fused VMEM-resident kernel (TPU only); xla = lax.scan path
    KERNEL = os.environ.get("BENCH_KERNEL",
                            "pallas" if backend == "tpu" else "xla")
    # BENCH_SHARDED=1: shard K over a mesh of ALL visible devices (the
    # multi-host harness, SURVEY.md §7.8) — pmin/pmax/psum merge the shards
    SHARDED = os.environ.get("BENCH_SHARDED", "") == "1"
    n_dev = len(jax.devices())
    if SHARDED:
        K -= K % n_dev  # k must divide evenly over the mesh

    if WORKLOAD == "point_mass":
        sigma = np.diag([0.25, 0.25, 0.25])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=6, action_dim=3)
        cost = get_cost(
            {"type": "static", "diag": True,
             "goal": [1.0, 0.0, 0.5, 0.0, -0.5, 0.0],
             "Q": [5.0, 1.0, 5.0, 1.0, 5.0, 1.0]},
            lam=0.8, gamma=0.2, upsilon=1.0, sigma=sigma,
        )
        lam = 0.8
        state0 = np.zeros(6)
    elif WORKLOAD == "nn":
        # learned-dynamics workload: NNAUVModel 3x32 MLP, static_quat cost
        # (the MBRL sampling hot path; no fused kernel — XLA MXU path,
        # bf16 matmuls with f32 accumulation)
        import __graft_entry__ as g

        sigma = np.diag([1500.0] * 6)
        model = get_model({"type": "auv_nn"}, dt=0.1, action_dim=6,
                          compute_dtype=jnp.bfloat16)
        cost = get_cost(g._auv_task(), lam=0.5, gamma=0.2, upsilon=1.0,
                        sigma=sigma)
        lam = 0.5
        state0 = np.zeros(13)
        state0[6] = 1.0
        if KERNEL == "pallas":
            KERNEL = "xla"  # no fused kernel for NN dynamics (by design)
    else:
        import __graft_entry__ as g

        sigma = np.diag([1500.0] * 6)
        model = get_model(g._auv_params(), dt=0.1, action_dim=6)
        cost = get_cost(g._auv_task(), lam=0.5, gamma=0.2, upsilon=1.0,
                        sigma=sigma)
        lam = 0.5
        state0 = np.zeros(13)
        state0[6] = 1.0
    sdim = model.get_state_dim()
    adim = model.get_action_dim()

    if SHARDED:
        from mppi_tf_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev, ("k",))
        if KERNEL == "pallas":
            from mppi_tf_tpu.parallel.fused import ShardedFusedMPPI

            sctrl = ShardedFusedMPPI(model, cost, mesh, k=K, tau=TAU,
                                     lam=lam, upsilon=1.0, sigma=sigma,
                                     interpret=(backend != "tpu"))
            stride = sctrl._seed_stride
            ssolve = sctrl._solve

            def chained(key, state, useq):
                def body(i, carry):
                    state, useq = carry
                    action, useq, _info = ssolve(
                        i * stride, state, useq, sctrl._mparams,
                        sctrl._cparams)
                    state = model.step(sctrl._mparams, state[None, :],
                                       action[None, :])[0]
                    return (state, useq)

                return jax.lax.fori_loop(0, CHAIN, body, (state, useq))

            single = jax.jit(lambda key, state, useq, mp_, cp_: ssolve(
                0, state, useq, mp_, cp_))
            mp, cp = sctrl._mparams, sctrl._cparams
        else:
            from mppi_tf_tpu.parallel import ShardedMPPI

            sctrl = ShardedMPPI(model, cost, mesh, k=K, tau=TAU, lam=lam,
                                upsilon=1.0, sigma=sigma)
            ssolve = sctrl._solve
            mp, cp = sctrl._mparams, sctrl._cparams

            def chained(key, state, useq):
                def body(_, carry):
                    key, state, useq = carry
                    key, sub = jax.random.split(key)
                    action, useq, _info = ssolve(sub, state, useq, mp, cp)
                    state = model.step(mp, state[None, :],
                                       action[None, :])[0]
                    return (key, state, useq)

                return jax.lax.fori_loop(0, CHAIN, body, (key, state, useq))

            single = jax.jit(ssolve)
        ctrl = None
    else:
        # honour an explicit BENCH_KERNEL even off-TPU (pallas -> interpret
        # mode, for debugging); MPPI rejects genuinely unsupported combos
        ctrl = MPPI(model, cost, k=K, tau=TAU, lam=lam, upsilon=1.0,
                    sigma=sigma, kernel=KERNEL,
                    kernel_tile=int(os.environ.get("BENCH_TILE", 8192)))
        mp, cp = ctrl.model_params, ctrl._cparams

        solve = ctrl._solve  # pure fn: (key, state, useq, mp, cp)

    if ctrl is not None and ctrl._fused is not None:
        fused = ctrl._fused
        n_tiles = (K + fused.tile - 1) // fused.tile

        def chained(key, state, useq):
            # key is unused: the kernel seeds pltpu.prng per solve
            def body(i, carry):
                state, useq = carry
                action, shifted, _info = ctrl._fused_step(
                    i * n_tiles, state, useq, mp, cp)
                state = model.step(mp, state[None, :], action[None, :])[0]
                return (state, shifted)

            return jax.lax.fori_loop(0, CHAIN, body, (state, useq))
    elif ctrl is not None:
        def chained(key, state, useq):
            def body(_, carry):
                key, state, useq = carry
                key, sub = jax.random.split(key)
                action, useq, _info = solve(sub, state, useq, mp, cp)
                # feed the applied action through the plant: closed loop
                state = model.step(mp, state[None, :], action[None, :])[0]
                return (key, state, useq)

            return jax.lax.fori_loop(0, CHAIN, body, (key, state, useq))

    chained_jit = jax.jit(chained)

    key = jax.random.PRNGKey(0)
    state = jnp.asarray(state0, dtype=model.dtype)
    useq = jnp.zeros((TAU, adim), dtype=model.dtype)

    # compile + warmup
    out = chained_jit(key, state, useq)
    jax.block_until_ready(out)

    # timed runs
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained_jit(key, state, useq)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / CHAIN)
    per_solve = float(np.median(times))

    # single-call dispatch latency (incl. host round trip); the sharded
    # branch defined `single` above
    if ctrl is not None and ctrl._fused is not None:
        def _single(key, state, useq, mp, cp):
            return ctrl._fused.solve(0, state, useq, mp, cp, use_prng=True)
        single = jax.jit(_single)
    elif ctrl is not None:
        single = jax.jit(solve)
    r = single(key, state, useq, mp, cp)
    jax.block_until_ready(r)
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        r = single(key, state, useq, mp, cp)
        jax.block_until_ready(r)
        lat.append(time.perf_counter() - t0)
    dispatch_p50 = float(np.median(lat))

    wname = {"point_mass": "point_mass3d", "nn": "auv_nn_mlp"}.get(
        WORKLOAD, "auv_rexrov2")
    p50_ms = per_solve * 1e3
    result = {
        "metric": f"p50_replan_latency_ms@K={K},H={TAU},{wname},{backend}",
        "value": round(p50_ms, 4),
        "unit": "ms",
        "vs_baseline": round(10.0 / p50_ms, 3),
        "extra": {
            "solves_per_s": round(1.0 / per_solve, 2),
            "rollouts_per_s_per_chip": round(
                K / per_solve / (n_dev if SHARDED else 1), 0),
            "single_call_p50_ms": round(dispatch_p50 * 1e3, 3),
            "backend": backend,
            "kernel": ("pallas" if (ctrl._fused if ctrl is not None
                                    else KERNEL == "pallas") else "xla"),
            "chain": CHAIN,
            "workload": WORKLOAD,
            "sharded": SHARDED,
            "n_devices": n_dev,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
