"""Fleet MPPI: one compiled dispatch replans N independent vehicles.

Greenfield — no reference counterpart (the reference drives ONE controller
per process, scripts/main.py:94-106). Production serving on TPU wants the
whole fleet's replan as a single device program: the [n, k] rollout batch
keeps the chip saturated at sample counts where one vehicle's solve
underfills it, and the host<->device round trip (the dominant latency on a
relay-attached chip, ~22-33 ms RTT) is paid once per FLEET instead of once
per vehicle.

The implementation is pure batching over the existing solve:
``MPPI._solve`` is already a pure function of (key, state, useq, mparams,
cparams), so the fleet step is ``jit(vmap(_solve))`` with the model params
broadcast and key/state/sequence/cost-params carried per vehicle. Per-
vehicle goals live in a batched cost-params pytree (leading fleet axis), so
re-tasking any subset of the fleet never retraces.

Scale-out composes with the existing parallel/ layer along the OTHER axis:

- ``FleetMPPI(..., mesh=...)`` shards the FLEET axis across devices — each
  vehicle's solve is device-local, so this is collective-free data
  parallelism (the jit partitioner just splits the batch).
- ``parallel.ShardedMPPI`` shards ONE vehicle's SAMPLE axis with
  pmin/pmax/psum collectives when a single solve needs the whole pod.

Like every stateful controller here, the jitted step carries no host state:
``useq``/keys/goals are explicit arguments, donated and returned.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mppi import MPPI, make_prng_key


def _validated_goals(cost, goals, n: int, dtype):
    """Shape-check per-vehicle goals and run the cost's host-side
    waypoint validation BEFORE vmapping: under vmap the cost's own
    ``set_goal`` sees tracers and must skip validation, so without this
    hook a fleet re-goal (incl. serve.py's fleet set_goal op) could
    silently store e.g. a non-unit quaternion that every single-vehicle
    surface rejects (review finding)."""
    goals = np.asarray(goals, np.float64)
    if goals.shape[0] != n:
        raise ValueError(
            f"goals must carry one row per vehicle: got "
            f"{goals.shape[0]} for n={n}")
    validate = getattr(cost, "validate_waypoint", None)
    if validate is not None:
        goals = np.stack([validate(g) for g in goals])
    return jnp.asarray(goals, dtype)


class FleetMPPI:
    """Batched MPPI over ``n_vehicles`` sharing one model/cost family.

    Same per-vehicle semantics as :class:`MPPI`, kernel dispatch included:
    ``kernel='auto'`` attaches the fused Pallas solve on TPU for eligible
    model/cost pairs and the fleet step scans the vehicles through it
    (sequential TPU grid — a scan costs the same as one batched grid, with
    in-kernel PRNG and the kernel's folded constants); otherwise the
    vmapped XLA solve runs the fleet as one [n, k] batch. Options mirror
    MPPI where they are per-solve pure (normalize_cost/filter/clip/
    antithetic); observer/log mode is a single-vehicle debugging surface
    and intentionally absent. ``mesh=`` forces the XLA path (a sequential
    vehicle scan cannot split over a fleet-sharded mesh).

    ``goals``: optional [n, goal_dim] array of per-vehicle goals applied
    through ``cost.set_goal`` (defaults to the cost's own goal for every
    vehicle). ``mesh``: optional ``jax.sharding.Mesh`` whose FIRST axis
    shards the fleet (n must divide by it).
    """

    def __init__(self, model, cost, n_vehicles: int, k: int, tau: int,
                 lam: float, upsilon: float, sigma=None, goals=None,
                 init_seq=None, normalize_cost: bool = False,
                 filter_seq: bool = False, filter_window: int = 9,
                 filter_polyorder: int = 3, clip_actions: bool = False,
                 antithetic: bool = False, seed: int = 0,
                 mesh=None, prng_impl: str = "auto", kernel: str = "auto",
                 kernel_tile: Optional[int] = None, noise_schedule=None,
                 kernel_dtype: str = "float32"):
        n = int(n_vehicles)
        if n < 1:
            raise ValueError(f"n_vehicles must be >= 1, got {n}")
        if mesh is not None and kernel != "xla":
            # the fused fleet step scans vehicles SEQUENTIALLY through the
            # kernel — that cannot split over a fleet-sharded mesh, where
            # the vmapped XLA solve parallelises for free. 'auto' falls
            # back quietly; an EXPLICIT 'pallas' is rejected loudly (MPPI's
            # own contract for an unusable explicit kernel, mppi.py)
            if kernel == "pallas":
                raise ValueError(
                    "kernel='pallas' does not compose with mesh=: the "
                    "fused fleet step scans vehicles sequentially and "
                    "cannot split over a fleet-sharded mesh — use "
                    "kernel='xla' (or 'auto') with mesh, or drop mesh")
            kernel = "xla"
        # the template carries the pure solve + all validated config; its
        # own mutable state (useq/key) is unused. kernel='auto'/'pallas'
        # attaches the fused Pallas solve when the model/cost pair is
        # eligible (same rules as MPPI) — the fleet step then scans
        # vehicles through the kernel (per-vehicle SMEM dyn pack; the TPU
        # grid is sequential, so a scan loses nothing over a batched grid)
        # with in-kernel PRNG instead of the vmapped XLA solve.
        self._tpl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=upsilon,
                         sigma=sigma, normalize_cost=normalize_cost,
                         filter_seq=filter_seq, filter_window=filter_window,
                         filter_polyorder=filter_polyorder,
                         clip_actions=clip_actions, antithetic=antithetic,
                         seed=seed, kernel=kernel, kernel_tile=kernel_tile,
                         prng_impl=prng_impl, noise_schedule=noise_schedule,
                         kernel_dtype=kernel_dtype)
        self._model = model
        self._cost = cost
        self._n = n
        self._tau = int(tau)
        self._sdim = model.get_state_dim()
        self._adim = model.get_action_dim()
        self._dtype = model.dtype

        if init_seq is None:
            self._useq = jnp.zeros((n, self._tau, self._adim), self._dtype)
        else:
            init_seq = jnp.asarray(init_seq, self._dtype)
            if init_seq.shape == (self._tau, self._adim):  # shared warmstart
                init_seq = jnp.tile(init_seq[None], (n, 1, 1))
            if init_seq.shape != (n, self._tau, self._adim):
                raise ValueError(
                    f"init_seq must be [tau, aDim] or [n, tau, aDim], got "
                    f"{init_seq.shape}")
            self._useq = init_seq
        key0, self._prng_impl = make_prng_key(seed, prng_impl)
        self._keys = jax.random.split(key0, n)
        self._mparams = model.init_params()
        cp0 = cost.init_params()
        if goals is None:
            self._cparams = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x)[None], (n,) + jnp.shape(x)), cp0)
        else:
            goals = _validated_goals(cost, goals, n, self._dtype)
            self._cparams = jax.vmap(
                lambda g: cost.set_goal(cp0, g))(goals)
        self._steps = 0
        self._timing = {"total": 0.0, "calls": 0}
        self._last_info = None  # per-vehicle solve info after each next()

        self._n_tiles = 0
        if self._tpl._fused is not None:
            self._n_tiles = ((self._tpl._k + self._tpl._fused.tile - 1)
                             // self._tpl._fused.tile)
        fleet_step = self._make_solve_all()

        if mesh is None:
            self._step_jit = jax.jit(fleet_step, donate_argnums=(1, 3))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            ndev = mesh.shape[axis]
            if n % ndev != 0:
                raise ValueError(
                    f"n_vehicles={n} not divisible by mesh axis "
                    f"{axis}={ndev}")
            batched = NamedSharding(mesh, P(axis))
            rep = NamedSharding(mesh, P())
            # fleet-axis data parallelism: every batched argument splits on
            # the first (vehicle) axis, the model params replicate; each
            # vehicle's solve is device-local so NO collectives are needed
            self._step_jit = jax.jit(
                fleet_step, donate_argnums=(1, 3),
                in_shardings=(rep, batched, batched, batched, rep, batched),
                out_shardings=(batched, batched, batched, batched))
        self._mesh = mesh

    def _make_solve_all(self):
        """The whole-fleet solve, shared by the per-step jit and the
        on-device loop: (seed, keys, states, useq, mparams, cparams) ->
        (actions, new_useq, new_keys, info), with info carrying the FULL
        per-vehicle solve info ([n]-leading) on both kernel paths."""
        n = self._n
        solve = self._tpl._solve
        fused = self._tpl._fused
        sched = self._tpl._sched  # per-step noise schedule (None if unset)
        if fused is not None:
            n_tiles = self._n_tiles
            fstep = self._tpl._fused_step

            def solve_all(seed, keys, states, useq, mparams, cparams):
                # scan the vehicles through the fused kernel: the TPU grid
                # is sequential, so a scan costs the same as one batched
                # grid while reusing the single-vehicle kernel unchanged;
                # per-vehicle seed blocks keep the noise streams disjoint
                def one(_, xs):
                    v, x, u, cpv = xs
                    action, shifted, info = fstep(seed + v * n_tiles, x,
                                                  u, mparams, cpv, sched)
                    return None, (action, shifted, info)

                _, (actions, new_useq, info) = jax.lax.scan(
                    one, None,
                    (jnp.arange(n, dtype=jnp.int32), states, useq, cparams))
                return actions, new_useq, keys, info
        else:
            def solve_all(seed, keys, states, useq, mparams, cparams):
                def one(key, x, u, cp):
                    key, sub = jax.random.split(key)  # MPPI.next's order
                    action, shifted, info = solve(sub, x, u, mparams, cp,
                                                  sched)
                    return action, shifted, key, info

                return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                    keys, states, useq, cparams)

        return solve_all

    # ------------------------------------------------------------------
    # user-facing surface (the fleet analogue of MPPI.next/set_goal)
    # ------------------------------------------------------------------
    def next(self, states) -> np.ndarray:
        """Replan the whole fleet: states [n, sDim] -> actions [n, aDim].

        ONE jitted dispatch; per-vehicle nominal sequences and PRNG keys
        advance in-place (donated buffers)."""
        states = jnp.asarray(
            np.asarray(states, np.float64).reshape(self._n, self._sdim),
            self._dtype)
        # fused path: disjoint per-(step, vehicle) kernel seed blocks,
        # wrapped at 2^31 (jnp.int32 of a larger Python int RAISES, which
        # would kill a long-running serving loop); the XLA path ignores
        # the seed (keys drive its noise)
        seed = jnp.int32(
            (self._tpl._base_seed + self._steps * self._n * self._n_tiles)
            % (1 << 31))
        start = time.perf_counter()
        actions, self._useq, self._keys, info = self._step_jit(
            seed, self._keys, states, self._useq, self._mparams,
            self._cparams)
        actions = np.asarray(actions)
        self._timing["total"] += time.perf_counter() - start
        self._timing["calls"] += 1
        self._steps += 1
        self._last_info = info  # per-vehicle cost stats, [n]-leading
        return actions

    def set_goals(self, goals) -> None:
        """Re-task every vehicle: goals [n, goal_dim]. No retrace."""
        goals = _validated_goals(self._cost, goals, self._n, self._dtype)
        cp0 = self._cost.init_params()
        self._cparams = jax.vmap(lambda g: self._cost.set_goal(cp0, g))(
            goals)

    def set_vehicle_goal(self, i: int, goal) -> None:
        """Re-task vehicle ``i`` only. No retrace."""
        if not 0 <= int(i) < self._n:
            raise IndexError(f"vehicle {i} out of range [0, {self._n})")
        cp_i = jax.tree.map(lambda x: x[int(i)], self._cparams)
        cp_i = self._cost.set_goal(cp_i, goal)
        self._cparams = jax.tree.map(
            lambda full, row: full.at[int(i)].set(row), self._cparams, cp_i)

    def set_vehicle_waypoints(self, i: int, waypoints) -> None:
        """Replace vehicle ``i``'s waypoint queue (WayPointsCost fleets):
        per-vehicle missions over the same compiled step. No retrace.
        Validation (capacity, dims — add_waypoint clamps at capacity,
        which would SILENTLY drop the middle legs of an over-long
        mission) lives in controller/missions.py, shared with the
        single-vehicle mission surface."""
        from .missions import mission_params

        if not 0 <= int(i) < self._n:
            raise IndexError(f"vehicle {i} out of range [0, {self._n})")
        cp_v = jax.tree.map(lambda x: x[int(i)], self._cparams)
        cp_v = mission_params(self._cost, cp_v, waypoints)
        self._cparams = jax.tree.map(
            lambda full, row: full.at[int(i)].set(row), self._cparams,
            cp_v)

    def waypoints_remaining(self) -> np.ndarray:
        """Per-vehicle active queue lengths, [n] int array."""
        from ..costs.waypoints import WayPointsCost

        if not isinstance(self._cost, WayPointsCost):
            raise TypeError(
                f"waypoint missions need a WayPointsCost, the fleet runs "
                f"{type(self._cost).__name__}")
        return np.asarray(self._cparams["count"])

    def advance_waypoints(self, states, radius: float) -> int:
        """Per-vehicle waypoint-queue advancement (the fleet analogue of
        ClosedLoopRunner's wiring, envs/runner.py): for every vehicle whose
        state is within ``radius`` of ITS leading waypoint, pop that
        vehicle's queue. Requires a WayPointsCost; returns how many queues
        advanced. ONE vmapped dispatch + one host sync for the whole fleet
        — never retraces (ONE jitted pop; the squared radius is a traced
        argument, so any radius reuses the same executable)."""
        from ..costs.waypoints import WayPointsCost

        if not isinstance(self._cost, WayPointsCost):
            raise TypeError(
                f"advance_waypoints needs a WayPointsCost, the fleet runs "
                f"{type(self._cost).__name__}")
        pop = getattr(self, "_advance_jit", None)
        if pop is None:
            from ..envs.mjx_env import waypoint_pop_arg_fn

            # radius traced (broadcast over the fleet axis): one executable
            # for every radius value (advisor r3: per-radius cache keys)
            pop = self._advance_jit = jax.jit(
                jax.vmap(waypoint_pop_arg_fn(self._cost),
                         in_axes=(0, 0, None)))
        states = jnp.asarray(
            np.asarray(states, np.float64).reshape(self._n, self._sdim),
            self._dtype)
        r2 = jnp.asarray(float(radius) ** 2, self._dtype)
        old = np.asarray(self._cparams["count"])
        self._cparams = pop(self._cparams, states, r2)
        return int((old - np.asarray(self._cparams["count"])).sum())

    # checkpoint/resume (same .npz scheme as MPPI.save_state) -------------
    def save_state(self, path: str) -> None:
        from .state_io import cparams_entries

        np.savez(
            path,
            useq=np.asarray(self._useq),
            keys=np.asarray(jax.random.key_data(self._keys)),
            key_impl=np.str_(self._prng_impl),
            steps=self._steps,
            timing_total=self._timing["total"],
            timing_calls=self._timing["calls"],
            # per-vehicle goals / mission queues are mutable state too
            **cparams_entries(self._cparams),
        )

    def load_state(self, path: str) -> None:
        d = np.load(path)
        if d["useq"].shape != tuple(self._useq.shape):
            raise ValueError(
                f"checkpoint useq {d['useq'].shape} != fleet "
                f"{tuple(self._useq.shape)}")
        self._useq = jnp.asarray(d["useq"], self._dtype)
        self._prng_impl = str(d["key_impl"])
        self._keys = jax.random.wrap_key_data(
            jnp.asarray(d["keys"]), impl=self._prng_impl)
        self._steps = int(d["steps"])
        self._timing = {"total": float(d["timing_total"]),
                        "calls": int(d["timing_calls"])}
        from .state_io import load_cparams

        self._cparams = load_cparams(d, self._cparams)

    # on-device fleet experiment ------------------------------------------
    def build_on_device_loop(self, plant_step, steps: int,
                             substeps: int = 10,
                             waypoint_radius: Optional[float] = None):
        """All N vehicles' closed loops — solve, per-vehicle ZOH action,
        ``substeps`` plant steps — compiled into ONE ``lax.scan`` program
        (the fleet analogue of envs/mjx_env.build_on_device_loop).

        ``plant_step`` is the single-vehicle pure (x, u) -> x_next at the
        physics dt; it is vmapped over the fleet. Returns ``run(states0,
        keys=None, useq0=None, mparams=None, cparams=None, step0=None) ->
        (states [T, n, sdim], actions [T, n, adim])``; model/cost params
        default to the fleet's CURRENT values at each call (goal re-tasking
        between runs needs no retrace), and repeated runs draw fresh noise
        (keys advance through the scan; fused kernel seeds advance via a
        per-fleet step counter, overridable with ``step0``). When the fleet was built with ``mesh=``, the
        batched carries are placed with the fleet-axis sharding so the scan
        runs data-parallel across devices.

        With a WayPointsCost fleet and ``waypoint_radius`` set, each
        vehicle's queue ALSO advances inside the scan (per-vehicle pops,
        envs/mjx_env.waypoint_pop_fn) — N multi-leg missions as one device
        program; the fleet's ``_cparams`` sync to the final in-scan queues
        after each call."""
        n, tau, adim = self._n, self._tau, self._adim
        solve_all = self._make_solve_all()
        base_seed = self._tpl._base_seed
        stride = self._n * self._n_tiles  # 0 on the XLA path (seed unused)

        pop = None
        if waypoint_radius is not None:
            from ..costs.waypoints import WayPointsCost
            from ..envs.mjx_env import waypoint_pop_fn

            if not isinstance(self._cost, WayPointsCost):
                raise TypeError(
                    "waypoint_radius needs a WayPointsCost fleet, got "
                    f"{type(self._cost).__name__}")
            pop = jax.vmap(waypoint_pop_fn(self._cost, waypoint_radius))

        def control_period(carry, i):
            keys, states, useq, mp, cp = carry
            seed = jnp.int32(base_seed + i * stride)  # i32 wraps in-trace
            actions, useq, keys, _info = solve_all(seed, keys, states,
                                                   useq, mp, cp)

            def sim_body(_, s):
                return jax.vmap(plant_step)(s, actions)

            states = jax.lax.fori_loop(0, substeps, sim_body, states)
            if pop is not None:  # per-vehicle in-scan queue advancement
                cp = pop(cp, states)
            return (keys, states, useq, mp, cp), (states, actions)

        @jax.jit
        def _run(keys, states0, useq0, mp, cp, step0):
            (keys_f, _, _, _, cp_f), (states, actions) = jax.lax.scan(
                control_period, (keys, states0, useq0, mp, cp),
                step0 + jnp.arange(steps, dtype=jnp.int32))
            return states, actions, keys_f, cp_f

        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batched = NamedSharding(self._mesh, P(self._mesh.axis_names[0]))
        else:
            batched = None

        def run(states0, keys=None, useq0=None, mparams=None, cparams=None,
                step0=None):
            states0 = jnp.asarray(
                np.asarray(states0, np.float64).reshape(n, self._sdim),
                self._dtype)
            own_keys = keys is None
            keys = self._keys if own_keys else keys
            if useq0 is None:
                useq0 = jnp.zeros((n, tau, adim), self._dtype)
            mp = self._mparams if mparams is None else mparams
            own_cp = cparams is None
            cp = self._cparams if own_cp else cparams
            if step0 is None:
                # fresh noise on every run: the fused path derives kernel
                # seeds from the global step index, the XLA path advances
                # keys through the scan — both continue instead of
                # replaying run #1's stream. The fleet's OWN step counter
                # (advanced by host-side next()) is the single stream, so
                # host-driven and on-device periods never replay each
                # other's seeds (review finding on the mjx_env analogue).
                step0 = self._steps
                self._steps = (step0 + steps) % (1 << 30)
            if batched is not None:
                states0, keys, useq0, cp = jax.device_put(
                    (states0, keys, useq0, cp),
                    (batched, batched, batched,
                     jax.tree.map(lambda _: batched, cp)))
            states, actions, keys_f, cp_f = _run(keys, states0, useq0, mp,
                                                 cp, jnp.int32(step0))
            if own_keys:
                self._keys = keys_f  # the fleet's streams advance
            if pop is not None and own_cp:
                # missions continue across runs: the in-scan queue state
                # becomes the fleet's current cost params. An explicit
                # cparams override is a what-if run and must not clobber
                # the real mission state.
                self._cparams = cp_f
            return states, actions

        return run

    # accessors -----------------------------------------------------------
    @property
    def n_vehicles(self) -> int:
        return self._n

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
