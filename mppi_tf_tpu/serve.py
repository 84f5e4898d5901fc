"""Control serving: a controller (or fleet) behind a TCP endpoint.

The reference's live consumer was an external ROS node calling the
controller per tick (TODO.md:109-156 "ROS Integration"; scripts/test.py:20
imports uuv_control_msgs) — the controller process runs next(x)/save(...)
/set_goal(...) on request from the vehicle stack. This module is that
deployment surface without the ROS dependency: a newline-delimited
JSON-over-TCP protocol exposing exactly the controller API, so any
language/stack (a ROS bridge included) can drive the TPU-resident
controller remotely.

Protocol (one JSON object per line, response per request, errors never
kill the server):

    {"op": "next", "state": [...]}            -> {"action": [...], "solve_ms": t}
    {"op": "set_goal", "goal": [...]}         -> {"ok": true}
    {"op": "save", "x": [...], "u": [...],
     "x_next": [...]}                         -> {"ok": true}   (adaptive DMD
                                                 identification over the wire)
    {"op": "info"}                            -> {"k": ..., "tau": ...,
                                                 "model": ..., "kernel": ...}
    {"op": "set_waypoints",
     "waypoints": [[...], ...]}               -> {"ok": true}   (multi-leg
                                                 mission upload; WayPoints-
                                                 Cost controllers only)
    {"op": "advance_waypoints",
     "state": [...], "radius": r}             -> {"advanced": n,
                                                 "remaining": ...}
    {"op": "ping"}                            -> {"ok": true}
    anything else                             -> {"error": "..."}

A FleetMPPI serves the same way: "state" is [n, sDim], "action" comes back
[n, aDim], "set_goal" takes [n, goal_dim] (re-tasks the whole fleet), and
"set_waypoints" takes a "vehicle" index (per-vehicle mission upload;
"advance_waypoints" pops every vehicle's queue from [n, sDim] states).

The server is single-threaded over the controller by design: a controller
is stateful (nominal sequence, PRNG stream), so requests serialize through
one lock — the concurrency story is MORE vehicles per fleet or more server
processes, not racing next() calls.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time
from typing import Optional

import numpy as np


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        server: ControlServer = self.server  # type: ignore[assignment]
        for raw in self.rfile:
            raw = raw.strip()
            if not raw:
                continue
            try:
                resp = server._dispatch(json.loads(raw.decode()))
            except Exception as e:  # a bad request must not kill serving
                resp = {"error": f"{type(e).__name__}: {e}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


class ControlServer(socketserver.ThreadingTCPServer):
    """Serve one controller (MPPI / sharded / DMD / FleetMPPI) over TCP.

    ``serve_background()`` starts the accept loop in a daemon thread and
    returns (host, port) — port 0 picks a free one. Requests serialize
    through a lock (the controller is stateful); connections are handled
    concurrently, so N vehicle stacks can hold sockets open.
    """

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, controller, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self._ctrl = controller
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._started = False

    # -- protocol ---------------------------------------------------------
    def _dispatch(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True}
        if op == "info":
            c = self._ctrl
            tpl = getattr(c, "_tpl", c)  # FleetMPPI wraps a template MPPI
            return {
                "controller": type(c).__name__,
                "model": type(getattr(tpl, "_model", None)).__name__,
                "k": getattr(tpl, "_k", None),
                "tau": getattr(tpl, "_tau", None),
                "kernel": ("pallas" if getattr(tpl, "_fused", None)
                           is not None else "xla"),
                "n_vehicles": getattr(c, "n_vehicles", 1),
            }
        if op == "next":
            state = np.asarray(req["state"], np.float64)
            with self._lock:
                t0 = time.perf_counter()
                action = self._ctrl.next(state)
                ms = (time.perf_counter() - t0) * 1e3
            return {"action": np.asarray(action).tolist(),
                    "solve_ms": round(ms, 3)}
        if op == "set_goal":
            goal = np.asarray(req["goal"], np.float64)
            with self._lock:
                if hasattr(self._ctrl, "set_goals"):  # fleet controller
                    if "vehicle" in req:  # re-task ONE vehicle
                        self._ctrl.set_vehicle_goal(int(req["vehicle"]),
                                                    goal)
                    elif goal.ndim == 1:  # same goal for the whole fleet
                        self._ctrl.set_goals(
                            np.tile(goal, (self._ctrl.n_vehicles, 1)))
                    else:
                        self._ctrl.set_goals(goal)
                elif "vehicle" in req:
                    # same guard as set_waypoints (advisor r3): a client
                    # that believes it is re-tasking vehicle k of a fleet
                    # must not silently replace the single controller's
                    # goal (for a waypoint cost: its whole mission)
                    return {"error": "'vehicle' index given but the "
                                     "served controller is not a fleet"}
                else:
                    self._ctrl.set_goal(goal)
            return {"ok": True}
        if op == "set_waypoints":
            wps = req["waypoints"]
            with self._lock:
                if hasattr(self._ctrl, "set_vehicle_waypoints"):  # fleet
                    if "vehicle" not in req:
                        return {"error": "fleet set_waypoints needs a "
                                         "'vehicle' index (per-vehicle "
                                         "missions)"}
                    self._ctrl.set_vehicle_waypoints(int(req["vehicle"]),
                                                     wps)
                elif "vehicle" in req:
                    # a client that believes it is re-tasking vehicle k of
                    # a fleet must not silently replace a single
                    # controller's whole mission (advisor r3 finding)
                    return {"error": "'vehicle' index given but the "
                                     "served controller is not a fleet"}
                else:
                    self._ctrl.set_waypoints(wps)
            return {"ok": True}
        if op == "advance_waypoints":
            state = np.asarray(req["state"], np.float64)
            radius = float(req["radius"])
            with self._lock:
                adv = self._ctrl.advance_waypoints(state, radius)
                rem = self._ctrl.waypoints_remaining()
            return {"advanced": int(adv),
                    "remaining": np.asarray(rem).tolist()}
        if op == "save":
            if not hasattr(self._ctrl, "save"):
                return {"error": f"{type(self._ctrl).__name__} has no "
                                 "save() (not an adaptive/observed "
                                 "controller)"}
            with self._lock:
                self._ctrl.save(np.asarray(req["x"], np.float64),
                                np.asarray(req["u"], np.float64),
                                np.asarray(req["x_next"], np.float64))
            return {"ok": True}
        return {"error": f"unknown op {op!r}; valid: next, set_goal, "
                         "set_waypoints, advance_waypoints, save, info, "
                         "ping"}

    # -- lifecycle --------------------------------------------------------
    def serve_forever(self, *args, **kwargs):
        self._started = True
        return super().serve_forever(*args, **kwargs)

    def serve_background(self):
        """Start accepting in a daemon thread; returns (host, port)."""
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._started = True  # before start(): close() must never observe
        # a started thread without the flag (shutdown would deadlock)
        self._thread.start()
        return self.server_address

    def close(self):
        # shutdown() blocks on an Event only serve_forever() ever sets —
        # calling it before the accept loop started would deadlock forever
        if self._started:
            self.shutdown()
        self.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


class ControlClient:
    """Blocking JSON-lines client for :class:`ControlServer` — the shape a
    ROS-bridge (or any vehicle stack) would take."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._file = self._sock.makefile("rwb")

    def request(self, **req) -> dict:
        self._file.write((json.dumps(req) + "\n").encode())
        self._file.flush()
        line = self._file.readline()
        if not line:
            raise ConnectionError("server closed the connection")
        return json.loads(line.decode())

    def next(self, state) -> np.ndarray:
        resp = self.request(op="next",
                            state=np.asarray(state, np.float64).tolist())
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return np.asarray(resp["action"])

    def set_goal(self, goal) -> None:
        resp = self.request(op="set_goal",
                            goal=np.asarray(goal, np.float64).tolist())
        if "error" in resp:
            raise RuntimeError(resp["error"])

    def save(self, x, u, x_next) -> None:
        resp = self.request(
            op="save", x=np.asarray(x, np.float64).tolist(),
            u=np.asarray(u, np.float64).tolist(),
            x_next=np.asarray(x_next, np.float64).tolist())
        if "error" in resp:
            raise RuntimeError(resp["error"])

    def set_waypoints(self, waypoints, vehicle: Optional[int] = None):
        req = {"op": "set_waypoints",
               "waypoints": [np.asarray(w, np.float64).tolist()
                             for w in waypoints]}
        if vehicle is not None:
            req["vehicle"] = int(vehicle)
        resp = self.request(**req)
        if "error" in resp:
            raise RuntimeError(resp["error"])

    def advance_waypoints(self, state, radius: float) -> dict:
        resp = self.request(
            op="advance_waypoints",
            state=np.asarray(state, np.float64).tolist(),
            radius=float(radius))
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp

    def info(self) -> dict:
        return self.request(op="info")

    def close(self):
        try:
            self._file.close()
        finally:
            self._sock.close()


def main(argv=None):
    """``python -m mppi_tf_tpu.serve``: build the configured controller and
    serve it (the reference ROS node's role, config-driven)."""
    import argparse

    from .cfg import load_config
    from .controller import get_controller
    from .envs.runner import build_model_and_cost

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", required=True, help="env config (YAML/name)")
    p.add_argument("--task", required=True, help="task config")
    p.add_argument("--model", required=True, help="model config")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7117)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    env_cfg = load_config(args.config)
    task_cfg = load_config(args.task)
    model_cfg = load_config(args.model)
    model, cost, _sigma = build_model_and_cost(env_cfg, task_cfg, model_cfg)
    ctrl = get_controller(model, cost, env_cfg)
    server = ControlServer(ctrl, host=args.host, port=args.port)
    host, port = server.server_address
    print(json.dumps({"serving": f"{host}:{port}",
                      "controller": type(ctrl).__name__}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
