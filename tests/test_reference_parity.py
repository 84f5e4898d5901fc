"""Direct numeric parity against the ACTUAL reference implementation.

The reference TF2 code at /root/reference is runnable on CPU (TensorFlow is
installed), so instead of only testing against hand-derived numpy oracles,
these tests execute the reference's own graph builders and compare outputs
in float64 — the BASELINE.md north-star check ("control sequence matches
reference on point_mass3d, same noise realization, within tolerance").

The reference has stale-glue defects at HEAD (SURVEY.md §1) that the
fixtures patch around without modifying the read-only tree:
- controller_base.py:13-14 indexes GPU device [0] unconditionally -> the
  module import is wrapped with a no-GPU patch;
- PointMassModel.__init__ calls the nowhere-defined add_model_vars
  (point_mass_model.py:61) -> injected onto ModelBase;
- cpprb is imported but unused (controller_base.py:2) -> stub module.

Skipped wholesale when TF or the reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

# oracle/cluster/serve tail: excluded from the fast developer loop
# (pytest -m 'not slow'); the driver default runs everything
pytestmark = pytest.mark.slow

REF = "/root/reference/scripts"

tf = pytest.importorskip("tensorflow")

if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with the stale-glue patches."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    if "cpprb" not in sys.modules:
        stub = types.ModuleType("cpprb")
        stub.ReplayBuffer = object
        sys.modules["cpprb"] = stub
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # controller_base module-level code does
    # set_memory_growth(list_physical_devices('GPU')[0], ...) — make it a
    # no-op on CPU-only hosts.
    exp = tf.config.experimental
    orig_list, orig_set = exp.list_physical_devices, exp.set_memory_growth
    exp.list_physical_devices = lambda *a, **k: [None]
    exp.set_memory_growth = lambda *a, **k: None
    try:
        from src.controllers.controller_base import ControllerBase
        from src.costs.static_cost import StaticCost
        from src.models import model_base, point_mass_model
    finally:
        exp.list_physical_devices, exp.set_memory_growth = orig_list, orig_set

    # point_mass_model.py:61 calls the nowhere-defined add_model_vars
    if not hasattr(model_base.ModelBase, "add_model_vars"):
        model_base.ModelBase.add_model_vars = (
            lambda self, name, var: self._modelVars.__setitem__(name, var))

    return types.SimpleNamespace(
        ControllerBase=ControllerBase,
        StaticCost=StaticCost,
        PointMassModel=point_mass_model.PointMassModel,
    )


@pytest.fixture(scope="module")
def ours():
    import jax.numpy as jnp

    from mppi_tf_tpu.controller.mppi import MPPI
    from mppi_tf_tpu.costs import get_cost
    from mppi_tf_tpu.models import get_model

    return types.SimpleNamespace(MPPI=MPPI, get_cost=get_cost,
                                 get_model=get_model, jnp=jnp)


K, TAU, SDIM, ADIM = 64, 10, 6, 3
MASS, DT, LAM, GAMMA, UPSILON = 1.7, 0.1, 0.8, 0.2, 1.3
GOAL = np.array([1.0, 0.0, 0.5, 0.0, -0.5, 0.0])
QDIAG = np.array([5.0, 1.0, 5.0, 1.0, 5.0, 1.0])
SIGMA = np.diag([0.25, 0.3, 0.2])


def _ref_pair(ref):
    model = ref.PointMassModel({}, mass=MASS, dt=DT, stateDim=SDIM,
                               actionDim=ADIM)
    cost = ref.StaticCost(LAM, GAMMA, UPSILON, SIGMA,
                          GOAL.reshape(-1, 1), QDIAG, diag=True)
    return model, cost


def _our_pair(ours):
    import jax.numpy as jnp

    model = ours.get_model({"type": "point_mass", "mass": MASS}, dt=DT,
                           state_dim=SDIM, action_dim=ADIM,
                           dtype=jnp.float64)
    cost = ours.get_cost(
        {"type": "static", "diag": True, "goal": GOAL.tolist(),
         "Q": QDIAG.tolist()},
        lam=LAM, gamma=GAMMA, upsilon=UPSILON, sigma=SIGMA,
        dtype=jnp.float64)
    return model, cost


def test_point_mass_step_matches_reference(ref, ours):
    """One dynamics step == reference build_step_graph (f64 exact-ish)."""
    rng = np.random.RandomState(0)
    x = rng.randn(K, SDIM, 1)
    u = rng.randn(K, ADIM, 1)

    ref_model, _ = _ref_pair(ref)
    want = ref_model.build_step_graph(
        "t", tf.constant(x, tf.float64), tf.constant(u, tf.float64)).numpy()

    our_model, _ = _our_pair(ours)
    got = np.asarray(our_model.step(our_model.init_params(),
                                    x[:, :, 0], u[:, :, 0]))
    np.testing.assert_allclose(got, want[:, :, 0], rtol=1e-6, atol=1e-12)


def test_step_cost_matches_reference(ref, ours):
    """State + gamma/upsilon action cost == reference build_step_cost_graph."""
    rng = np.random.RandomState(1)
    x = rng.randn(K, SDIM, 1)
    u = rng.randn(ADIM, 1)  # the nominal action (un-batched, cost_base.py:63)
    eps = rng.randn(K, ADIM, 1)

    _, ref_cost = _ref_pair(ref)
    want = ref_cost.build_step_cost_graph(
        "t", tf.constant(x, tf.float64), tf.constant(u, tf.float64),
        tf.constant(eps, tf.float64)).numpy().reshape(K)

    _, our_cost = _our_pair(ours)
    cp = our_cost.init_params()
    got = np.asarray(
        our_cost.state_cost(cp, x[:, :, 0])
        + our_cost.action_cost(u.reshape(ADIM), eps[:, :, 0]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_full_update_law_matches_reference(ref, ours):
    """The whole solve with one injected noise realisation: rollout costs,
    softmax update and updated sequence match the reference's
    build_model + update chain (the §2.1 receding-horizon defect is in the
    *carry*, not in one update — a single update is well-defined)."""
    rng = np.random.RandomState(2)
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(TAU, ADIM)
    eps = np.einsum("ij,ktj->kti", UPSILON * SIGMA,
                    rng.randn(K, TAU, ADIM))

    ref_model, ref_cost = _ref_pair(ref)
    ctrl = ref.ControllerBase(
        ref_model, ref_cost, k=K, tau=TAU, sDim=SDIM, aDim=ADIM, lam=LAM,
        upsilon=UPSILON, sigma=SIGMA,
        initSeq=useq.reshape(TAU, ADIM, 1))
    costs_ref = ctrl.build_model(
        "roll", K, tf.constant(x0.reshape(SDIM, 1), tf.float64),
        tf.constant(eps.reshape(K, TAU, ADIM, 1), tf.float64),
        tf.constant(useq.reshape(TAU, ADIM, 1), tf.float64)).numpy()
    update_ref = ctrl.update(
        "up", tf.constant(costs_ref),
        tf.constant(eps.reshape(K, TAU, ADIM, 1), tf.float64)).numpy()

    import jax.numpy as jnp

    our_model, our_cost = _our_pair(ours)
    mppi = ours.MPPI(our_model, our_cost, k=K, tau=TAU, lam=LAM,
                     upsilon=UPSILON, sigma=SIGMA)
    costs_our = np.asarray(mppi._rollout(
        jnp.asarray(x0), jnp.asarray(useq), jnp.asarray(eps),
        mppi.model_params, mppi._cparams))
    np.testing.assert_allclose(costs_our, costs_ref.reshape(K), rtol=1e-6)

    _, new_useq, _info = mppi._solve_with_noise_jit(
        jnp.asarray(eps), jnp.asarray(x0), jnp.asarray(useq),
        mppi.model_params, mppi._cparams)
    # our solve returns the SHIFTED updated sequence; the reference update
    # returns the un-shifted one
    np.testing.assert_allclose(np.asarray(new_useq)[:-1],
                               update_ref[1:, :, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_useq)[-1], 0.0, atol=1e-14)


@pytest.fixture(scope="module")
def ref_auv(ref):
    """Reference AUVModel (needs extra stubs: tensorflow_graphics is
    imported but never used, auv_model.py:4; inertial moments must be
    1-element lists for its tf.concat-based matrix assembly,
    auv_model.py:274)."""
    if "tensorflow_graphics" not in sys.modules:
        sys.modules["tensorflow_graphics"] = types.ModuleType(
            "tensorflow_graphics")
    from src.models.auv_model import AUVModel

    return AUVModel


def _auv_parameters(rk):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _auv_params

    p = _auv_params()
    p.pop("type")
    p.pop("rk")
    p.update(height=1.6, length=2.5, width=1.5, rk=rk)
    p["inertial"] = {k: [v] for k, v in p["inertial"].items()}
    return p


@pytest.mark.parametrize("rk", [1, 2])
def test_auv_step_matches_reference(ref, ref_auv, ours, rk):
    """Full Fossen step (damping, Coriolis, restoring, mass solve,
    quaternion kinematics, RK integration, renormalisation) == the
    reference AUVModel.step at machine epsilon in f64."""
    import jax.numpy as jnp

    from __graft_entry__ import _auv_params

    k = 5
    ref_model = ref_auv({}, actionDim=6, dt=0.1,
                        parameters=_auv_parameters(rk))
    ref_model.set_k(k)
    rng = np.random.RandomState(0)
    x = rng.randn(k, 13, 1)
    x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=1, keepdims=True)
    u = 100 * rng.randn(k, 6, 1)
    want = ref_model.step("t", tf.constant(x, tf.float64),
                          tf.constant(u, tf.float64), rk=rk).numpy()

    our_model = ours.get_model(dict(_auv_params(), rk=rk), dt=0.1,
                               action_dim=6, dtype=jnp.float64)
    got = np.asarray(our_model.step(our_model.init_params(),
                                    jnp.asarray(x[:, :, 0]),
                                    jnp.asarray(u[:, :, 0])))
    np.testing.assert_allclose(got, want[:, :, 0], rtol=1e-12, atol=1e-14)


def test_elipse2d_cost_matches_reference(ref, ours):
    """2D ellipse state cost == the reference ElipseCost (tfg is imported
    by the module but only used by the 3D class)."""
    if "tensorflow_graphics" not in sys.modules:
        sys.modules["tensorflow_graphics"] = types.ModuleType(
            "tensorflow_graphics")
    from src.costs.elipse_cost import ElipseCost as RefElipse

    import jax.numpy as jnp

    from mppi_tf_tpu.costs.elipse import ElipseCost

    args = dict(a=2.0, b=1.5, center_x=0.3, center_y=-0.2, speed=1.2,
                m_state=4.0, m_vel=0.5)
    sig2 = np.diag([0.25, 0.3])
    ref_cost = RefElipse(LAM, GAMMA, UPSILON, sig2, **args)
    our_cost = ElipseCost(LAM, GAMMA, UPSILON, sig2, dtype=jnp.float64,
                          **args)

    rng = np.random.RandomState(3)
    s = rng.randn(32, 4, 1)
    want = ref_cost.state_cost("t", tf.constant(s, tf.float64)).numpy()
    got = np.asarray(our_cost.state_cost({}, jnp.asarray(s[:, :, 0])))
    np.testing.assert_allclose(got, want.reshape(32), rtol=1e-12)


def test_static_quat_cost_matches_reference(ref, ours):
    """13-dim quaternion-state cost == the reference StaticQuatCost
    (static_cost.py:73-159: pos error, 2*acos(q.g) angle, vel error vs a
    10x10 Q)."""
    from src.costs.static_cost import StaticQuatCost as RefSQ

    import jax.numpy as jnp

    from mppi_tf_tpu.costs.static import StaticQuatCost

    sig6 = np.diag([0.25, 0.3, 0.2, 0.1, 0.15, 0.12])
    goal = np.zeros(13)
    goal[2] = -5.0
    q = np.array([0.1, -0.2, 0.3, 0.9])
    goal[3:7] = q / np.linalg.norm(q)
    goal[8] = 0.4
    Qd = np.array([100.0, 100.0, 100.0, 10.0, 1.0, 2.0, 3.0, 1.0, 1.0, 1.0])

    ref_cost = RefSQ(LAM, GAMMA, UPSILON, sig6, goal.reshape(-1, 1), Qd,
                     diag=True)
    our_cost = StaticQuatCost(LAM, GAMMA, UPSILON, sig6, goal, Qd, diag=True,
                              dtype=jnp.float64)
    cp = our_cost.init_params()

    rng = np.random.RandomState(11)
    s = rng.randn(32, 13, 1)
    s[:, 3:7, 0] /= np.linalg.norm(s[:, 3:7, 0], axis=-1, keepdims=True)
    want = ref_cost.state_cost("t", tf.constant(s, tf.float64)).numpy()
    got = np.asarray(our_cost.state_cost(cp, jnp.asarray(s[:, :, 0])))
    np.testing.assert_allclose(got, want.reshape(32), rtol=1e-9, atol=1e-11)


def _install_tfg_stub():
    """Install a faithful tensorflow_graphics quaternion stub (xyzw).

    tfg is not installed in this image; the reference's ElipseCost3D uses
    exactly five quaternion functions (elipse_cost.py:163-225). They are
    implemented here with TF ops following the published tfg semantics —
    from_rotation_matrix delegates to scipy (an independent oracle); the
    rest are the standard published formulas. Rotation results are
    invariant to the quaternion sign convention, and relative_angle takes
    |dot|, so any valid unit quaternion for R yields identical costs.
    """
    import scipy.spatial.transform as st

    mod = sys.modules.get("tensorflow_graphics")
    if mod is None:
        mod = types.ModuleType("tensorflow_graphics")
        sys.modules["tensorflow_graphics"] = mod

    quat_ns = types.SimpleNamespace()

    def from_rotation_matrix(R):
        Rnp = np.asarray(R)
        return tf.constant(st.Rotation.from_matrix(Rnp).as_quat(),
                           tf.float64)  # scipy returns xyzw like tfg

    def multiply(q1, q2):
        q1 = tf.convert_to_tensor(q1, tf.float64)
        q2 = tf.convert_to_tensor(q2, tf.float64)
        x1, y1, z1, w1 = tf.unstack(q1, axis=-1)
        x2, y2, z2, w2 = tf.unstack(q2, axis=-1)
        return tf.stack([
            x1 * w2 + y1 * z2 - z1 * y2 + w1 * x2,
            -x1 * z2 + y1 * w2 + z1 * x2 + w1 * y2,
            x1 * y2 - y1 * x2 + z1 * w2 + w1 * z2,
            -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2,
        ], axis=-1)

    def rotate(point, q):
        point = tf.convert_to_tensor(point, tf.float64)
        q = tf.broadcast_to(tf.convert_to_tensor(q, tf.float64),
                            tf.shape(point)[:-1].shape.num_elements() * [0]
                            if False else
                            tf.concat([tf.shape(point)[:-1], [4]], axis=0))
        xyz, w = q[..., :3], q[..., 3:4]
        t = 2.0 * tf.linalg.cross(xyz, point)
        return point + w * t + tf.linalg.cross(xyz, t)

    def between_two_vectors_3d(v1, v2):
        v1 = tf.convert_to_tensor(v1, tf.float64)
        v2 = tf.convert_to_tensor(v2, tf.float64)
        v1, v2 = tf.broadcast_to(v1, tf.shape(v2)), v2
        v1n = tf.linalg.normalize(v1, axis=-1)[0]
        v2n = tf.linalg.normalize(v2, axis=-1)[0]
        w = 1.0 + tf.reduce_sum(v1n * v2n, axis=-1, keepdims=True)
        xyz = tf.linalg.cross(v1n, v2n)
        return tf.linalg.normalize(tf.concat([xyz, w], axis=-1), axis=-1)[0]

    def relative_angle(q1, q2):
        q1 = tf.linalg.normalize(q1, axis=-1)[0]
        q2 = tf.linalg.normalize(q2, axis=-1)[0]
        dot = tf.clip_by_value(tf.reduce_sum(q1 * q2, axis=-1), -1.0, 1.0)
        return 2.0 * tf.acos(tf.abs(dot))

    quat_ns.from_rotation_matrix = from_rotation_matrix
    quat_ns.multiply = multiply
    quat_ns.rotate = rotate
    quat_ns.between_two_vectors_3d = between_two_vectors_3d
    quat_ns.relative_angle = relative_angle
    mod.geometry = types.SimpleNamespace(
        transformation=types.SimpleNamespace(quaternion=quat_ns))
    return mod


def test_elipse3d_cost_matches_reference(ref, ours):
    """3D ellipse-tracking state cost == the reference ElipseCost3D run with
    a faithful tfg quaternion stub (elipse_cost.py:101-246). Center is zero:
    the reference never applies the stored center (elipse_cost.py:165-170);
    ours translates by it (documented intent fix) — parity holds where the
    semantics agree."""
    _install_tfg_stub()
    from src.costs.elipse_cost import ElipseCost3D as RefE3

    import jax.numpy as jnp

    from mppi_tf_tpu.costs.elipse import ElipseCost3D

    sig6 = np.diag([0.25, 0.3, 0.2, 0.1, 0.15, 0.12])
    normal = np.array([0.0, 1.0 / np.sqrt(2.0), 1.0 / np.sqrt(2.0)])
    a_vec = np.array([1.0, 0.0, 0.0])
    axis = np.array([2.0, 1.5])
    center = np.zeros(3)

    ref_cost = RefE3(LAM, GAMMA, UPSILON, sig6,
                     normal=normal.reshape(3, 1), aVec=a_vec.reshape(3, 1),
                     axis=axis.reshape(2, 1), center=center.reshape(3, 1),
                     speed=1.2, v_speed=0.0, mState=4.0, mVel=0.5)
    our_cost = ElipseCost3D(LAM, GAMMA, UPSILON, sig6, normal=normal,
                            aVec=a_vec, axis=axis, center=center, speed=1.2,
                            m_state=4.0, m_vel=0.5, dtype=jnp.float64)
    cp = our_cost.init_params()

    rng = np.random.RandomState(17)
    s = rng.randn(32, 13, 1)
    s[:, 3:7, 0] /= np.linalg.norm(s[:, 3:7, 0], axis=-1, keepdims=True)
    st_tf = tf.constant(s, tf.float64)
    sj = jnp.asarray(s[:, :, 0])

    # the reference's state_cost mixes ragged term shapes ([k,1,1] + [k]),
    # so compare the three error terms individually, then the composition.
    tfgq = sys.modules["tensorflow_graphics"].geometry.transformation.quaternion
    pos_pf_ref = tfgq.rotate(tf.squeeze(st_tf[:, 0:3], axis=-1), ref_cost.q)
    quat_pf_ref = tfgq.multiply(ref_cost.q, tf.squeeze(st_tf[:, 3:7], axis=-1))
    pose_pf_ref = tf.concat([tf.expand_dims(pos_pf_ref, -1),
                             tf.expand_dims(quat_pf_ref, -1)], axis=1)
    p_ref = ref_cost.position_error(
        tf.expand_dims(pos_pf_ref, -1)).numpy().reshape(32)
    o_ref = np.asarray(ref_cost.orientation_error(pose_pf_ref)).reshape(32)
    v_ref = ref_cost.velocity_error(st_tf[:, 7:13]).numpy().reshape(32)

    from mppi_tf_tpu.ops import quaternion as quatops
    qp = jnp.broadcast_to(our_cost.q_plane, (32, 4))
    pos_pf_our = quatops.rotate(sj[:, 0:3] - our_cost.center, qp)
    quat_pf_our = quatops.multiply(qp, sj[:, 3:7])
    p_our = np.asarray(our_cost.position_error(pos_pf_our))
    o_our = np.asarray(our_cost.orientation_error(pos_pf_our, quat_pf_our))
    v_our = np.asarray(our_cost.velocity_error(sj[:, 7:13]))

    np.testing.assert_allclose(p_our, p_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(o_our, o_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(v_our, v_ref, rtol=1e-8, atol=1e-10)
    got = np.asarray(our_cost.state_cost(cp, sj))
    np.testing.assert_allclose(got, 4.0 * (p_ref + o_ref) + 0.5 * v_ref,
                               rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# NN model family oracle (nn_model.py): identical weights injected into the
# reference Keras nets and our MLP pytrees, outputs compared in f64.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_nn(ref):
    """Import the reference nn_model with tfg stubbed.

    nn_model.py needs three stubs to import/run without tensorflow_graphics:
    - sys.modules['tensorflow_graphics.util.shape'] (monkeypatched at import,
      nn_model.py:10-17);
    - tfg.geometry.transformation.euler.from_quaternion (used by
      NNAUVModelSpeed.to_euler, nn_model.py:564-588) — implemented via the
      standard xyzw->RPY formula (scipy-checked elsewhere);
    - the undefined limMax/limMin module globals referenced by
      NNAUVModel.__init__ (nn_model.py:205-206, a stale-glue defect,
      SURVEY.md §1) — injected as module attributes.
    """
    mod = _install_tfg_stub()
    util = types.ModuleType("tensorflow_graphics.util")
    shape_mod = types.ModuleType("tensorflow_graphics.util.shape")
    sys.modules["tensorflow_graphics.util"] = util
    sys.modules["tensorflow_graphics.util.shape"] = shape_mod
    mod.util = util
    util.shape = shape_mod

    def from_quaternion(q):
        q = tf.convert_to_tensor(q, tf.float64)
        x, y, z, w = tf.unstack(q, axis=-1)
        roll = tf.atan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
        pitch = tf.asin(tf.clip_by_value(2.0 * (w * y - z * x), -1.0, 1.0))
        yaw = tf.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
        return tf.stack([roll, pitch, yaw], axis=-1)

    mod.geometry.transformation.euler = types.SimpleNamespace(
        from_quaternion=from_quaternion)

    from src.models import nn_model as ref_nn_mod

    # NNAUVModel.__init__ references the nowhere-defined limMax/limMin
    ref_nn_mod.limMax = tf.ones((1,), dtype=tf.float64)
    ref_nn_mod.limMin = -tf.ones((1,), dtype=tf.float64)
    ref_nn_mod.tfg = mod  # ensure the stub (module was imported earlier)
    return ref_nn_mod


def _inject_weights(ref_model, our_params):
    """Copy our MLP pytree into the reference Keras net (same [in,out]/[out]
    layout for Dense kernel/bias)."""
    flat = []
    for layer in our_params["net"]:
        flat.append(np.asarray(layer["w"], np.float64))
        flat.append(np.asarray(layer["b"], np.float64))
    ref_model.nn.set_weights(flat)


def test_nn_mlp_forward_matches_reference(ref_nn, ours):
    """The 3x32 ReLU MLP forward (nn_model.py:54-60, _predict_nn :174-175)
    with identical weights."""
    import jax.numpy as jnp

    sdim, adim = 6, 3
    # reference generic NNModel input is stateDim+actionDim-3 wide
    # (nn_model.py:56); build the layers to the same width for the check
    ref_model = ref_nn.NNModel({}, stateDim=sdim, actionDim=adim)
    rng = np.random.RandomState(5)
    width = sdim + adim - 3
    layers = []
    sizes = [width, 32, 32, 32, sdim]
    for fi, fo in zip(sizes[:-1], sizes[1:]):
        layers.append({"w": jnp.asarray(rng.randn(fi, fo)),
                       "b": jnp.asarray(rng.randn(fo))})
    _inject_weights(ref_model, {"net": layers})

    X = rng.randn(64, width)
    want = ref_model._predict_nn("nn", tf.constant(X, tf.float64)).numpy()
    from mppi_tf_tpu.models.nn import mlp_apply
    got = np.asarray(mlp_apply(layers, jnp.asarray(X)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def _random_quat_states(rng, k):
    s = rng.randn(k, 13, 1)
    s[:, 3:7, 0] /= np.linalg.norm(s[:, 3:7, 0], axis=-1, keepdims=True)
    return s


def test_nnauv_step_matches_reference(ref_nn, ours):
    """NNAUVModel.build_step_graph (nn_model.py:215-239): normalized
    position-masked features -> net -> denormalized full-state delta."""
    import jax.numpy as jnp

    from mppi_tf_tpu.models.nn import NNAUVModel

    our = NNAUVModel(action_dim=6, dtype=jnp.float64)
    p = our.init_params()
    ref_model = ref_nn.NNAUVModel({})

    rng = np.random.RandomState(7)
    xm, xs = rng.randn(16), 0.5 + rng.rand(16)
    ym, ys = rng.randn(13), 0.5 + rng.rand(13)
    ref_model.set_Xmean_Xstd(xm, xs)
    ref_model.set_Ymean_Ystd(ym, ys)
    p = our.set_normalization(p, xm, xs, ym, ys)
    _inject_weights(ref_model, p)

    k = 32
    s = _random_quat_states(rng, k)
    a = rng.randn(k, 6, 1)
    want = ref_model.build_step_graph(
        "t", tf.constant(s, tf.float64), tf.constant(a, tf.float64)).numpy()
    got = np.asarray(our.step(p, jnp.asarray(s[:, :, 0]),
                              jnp.asarray(a[:, :, 0])))
    # DOCUMENTED DEVIATION: our step renormalises the quaternion block
    # (the reference returns the raw sum, nn_model.py:303-304, letting
    # |q| drift over rollouts); compare against the reference output
    # with the same renormalisation applied
    want = np.array(want[:, :, 0])
    want[:, 3:7] /= np.linalg.norm(want[:, 3:7], axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_nnauv_prepare_training_data_matches_reference(ref_nn, ours):
    """prepare_training_data (nn_model.py:241-287): X=[state[3:],u] and the
    re-anchored delta target, both normalized."""
    import jax.numpy as jnp

    from mppi_tf_tpu.models.nn import NNAUVModel

    our = NNAUVModel(action_dim=6, dtype=jnp.float64)
    p = our.init_params()
    ref_model = ref_nn.NNAUVModel({})
    rng = np.random.RandomState(9)
    xm, xs = rng.randn(16), 0.5 + rng.rand(16)
    ym, ys = rng.randn(13), 0.5 + rng.rand(13)
    ref_model.set_Xmean_Xstd(xm, xs)
    ref_model.set_Ymean_Ystd(ym, ys)
    p = our.set_normalization(p, xm, xs, ym, ys)

    k = 32
    st = _random_quat_states(rng, k)
    st1 = _random_quat_states(rng, k)
    a = rng.randn(k, 6, 1)
    for norm in (False, True):
        Xw, Yw = ref_model.prepare_training_data(st, st1, a, norm=norm)
        Xg, Yg = our.prepare_training_data(
            p, jnp.asarray(st[:, :, 0]), jnp.asarray(st1[:, :, 0]),
            jnp.asarray(a[:, :, 0]), norm=norm)
        np.testing.assert_allclose(np.asarray(Xg), Xw.numpy(), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Yg), Yw.numpy(), rtol=1e-12,
                                   atol=1e-12)


def test_nnauv_speed_step_matches_reference(ref_nn, ours):
    """NNAUVModelSpeed.build_step_graph (nn_model.py:358-383): euler-encoded
    features -> 6-dim velocity delta; pose advanced analytically via the
    quaternion Jacobian and renormalized (:464-506).

    Position and velocity rows match the reference exactly. The quaternion
    rows are a DOCUMENTED DEVIATION: the reference's Speed-variant
    body2inertial_transform (nn_model.py:537-556) stacks the quaternion-rate
    rows in wxyz order while the state stores xyzw — inconsistent with the
    reference's own AUVModel (auv_model.py:388-398, same matrix in xyzw
    order). We follow the AUVModel convention; the quaternion rows are
    checked against a numpy mirror of that (correct) T_q instead.
    """
    import jax.numpy as jnp

    from mppi_tf_tpu.models.nn import NNAUVModelSpeed

    our = NNAUVModelSpeed(action_dim=6, dtype=jnp.float64)
    p = our.init_params()
    ref_model = ref_nn.NNAUVModelSpeed({})

    rng = np.random.RandomState(13)
    xm, xs = rng.randn(15), 0.5 + rng.rand(15)
    ym, ys = rng.randn(6), 0.5 + rng.rand(6)
    ref_model.set_Xmean_Xstd(xm, xs)
    ref_model.set_Ymean_Ystd(ym, ys)
    p = our.set_normalization(p, xm, xs, ym, ys)
    _inject_weights(ref_model, p)

    k = 32
    s = _random_quat_states(rng, k)
    a = rng.randn(k, 6, 1)
    want = ref_model.build_step_graph(
        "t", tf.constant(s, tf.float64), tf.constant(a, tf.float64)).numpy()
    got = np.asarray(our.step(p, jnp.asarray(s[:, :, 0]),
                              jnp.asarray(a[:, :, 0])))
    # position + velocities: exact oracle parity
    np.testing.assert_allclose(got[:, :3], want[:, :3, 0],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(got[:, 7:], want[:, 7:, 0],
                               rtol=1e-9, atol=1e-11)
    # quaternion: numpy mirror of the AUVModel-convention T_q (xyzw rows,
    # auv_model.py:388-398), q' = normalize(q + 0.5*T_q(q) omega dt)
    q = s[:, 3:7, 0]
    om = s[:, 10:13, 0]
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    tq = 0.5 * np.stack([
        np.stack([w, -z, y], axis=-1),
        np.stack([z, w, -x], axis=-1),
        np.stack([-y, x, w], axis=-1),
        np.stack([-x, -y, -z], axis=-1),
    ], axis=1)
    qn = q + np.einsum("kij,kj->ki", tq, om) * 0.1
    qn = qn / np.linalg.norm(qn, axis=-1, keepdims=True)
    np.testing.assert_allclose(got[:, 3:7], qn, rtol=1e-9, atol=1e-11)


def test_nnauv_speed_prepare_training_data_matches_reference(ref_nn, ours):
    """Speed variant data prep (nn_model.py:384-436): euler features, 6-dim
    velocity-delta targets."""
    import jax.numpy as jnp

    from mppi_tf_tpu.models.nn import NNAUVModelSpeed

    our = NNAUVModelSpeed(action_dim=6, dtype=jnp.float64)
    p = our.init_params()
    ref_model = ref_nn.NNAUVModelSpeed({})
    rng = np.random.RandomState(17)
    xm, xs = rng.randn(15), 0.5 + rng.rand(15)
    ym, ys = rng.randn(6), 0.5 + rng.rand(6)
    ref_model.set_Xmean_Xstd(xm, xs)
    ref_model.set_Ymean_Ystd(ym, ys)
    p = our.set_normalization(p, xm, xs, ym, ys)

    k = 32
    st = _random_quat_states(rng, k)
    st1 = _random_quat_states(rng, k)
    a = rng.randn(k, 6, 1)
    for norm in (False, True):
        Xw, Yw = ref_model.prepare_training_data(st, st1, a, norm=norm)
        Xg, Yg = our.prepare_training_data(
            p, jnp.asarray(st[:, :, 0]), jnp.asarray(st1[:, :, 0]),
            jnp.asarray(a[:, :, 0]), norm=norm)
        np.testing.assert_allclose(np.asarray(Xg), Xw.numpy(), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Yg), Yw.numpy(), rtol=1e-12,
                                   atol=1e-12)


def test_full_nn_solve_matches_reference(ref, ref_nn, ours):
    """End-to-end MBRL hot path oracle: the complete solve (rollout through
    the LEARNED NNAUVModel dynamics + StaticQuatCost, softmax update) with
    one injected noise realisation matches the reference
    ControllerBase.build_model/update composition (controller_base.py:371-498)
    with identical network weights."""
    from src.costs.static_cost import StaticQuatCost as RefSQ

    import jax.numpy as jnp

    from mppi_tf_tpu.costs.static import StaticQuatCost
    from mppi_tf_tpu.models.nn import NNAUVModel

    k, tau, sdim, adim = 32, 5, 13, 6
    lam, gamma, ups = 0.6, 0.3, 1.2
    sig6 = np.diag([0.25, 0.3, 0.2, 0.1, 0.15, 0.12])
    goal = np.zeros(13)
    goal[2] = -2.0
    goal[6] = 1.0
    Qd = np.array([10.0, 10.0, 10.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])

    rng = np.random.RandomState(23)
    xm, xs = rng.randn(16), 0.5 + rng.rand(16)
    ym, ys = 0.01 * rng.randn(13), 0.02 + 0.02 * rng.rand(13)

    our_model = NNAUVModel(action_dim=adim, dtype=jnp.float64)
    # pin the reference's raw-sum quaternion algebra for this oracle (the
    # production default renormalises — a documented deviation with its
    # own unit tests, models/nn.py renormalize_quat)
    our_model.renormalize_quat = False
    p = our_model.init_params()
    p = our_model.set_normalization(p, xm, xs, ym, ys)
    our_cost = StaticQuatCost(lam, gamma, ups, sig6, goal, Qd, diag=True,
                              dtype=jnp.float64)

    ref_model = ref_nn.NNAUVModel({})
    ref_model.set_Xmean_Xstd(xm, xs)
    ref_model.set_Ymean_Ystd(ym, ys)
    _inject_weights(ref_model, p)
    ref_cost = RefSQ(lam, gamma, ups, sig6, goal.reshape(-1, 1), Qd,
                     diag=True)

    x0 = np.zeros(sdim)
    x0[6] = 1.0
    x0[2] = -0.5
    useq = 0.05 * rng.randn(tau, adim)
    eps = np.einsum("ij,ktj->kti", ups * sig6, rng.randn(k, tau, adim))

    ctrl = ref.ControllerBase(
        ref_model, ref_cost, k=k, tau=tau, sDim=sdim, aDim=adim, lam=lam,
        upsilon=ups, sigma=sig6, initSeq=useq.reshape(tau, adim, 1))
    costs_ref = ctrl.build_model(
        "roll", k, tf.constant(x0.reshape(sdim, 1), tf.float64),
        tf.constant(eps.reshape(k, tau, adim, 1), tf.float64),
        tf.constant(useq.reshape(tau, adim, 1), tf.float64)).numpy()
    update_ref = ctrl.update(
        "up", tf.constant(costs_ref),
        tf.constant(eps.reshape(k, tau, adim, 1), tf.float64)).numpy()

    mppi = ours.MPPI(our_model, our_cost, k=k, tau=tau, lam=lam,
                     upsilon=ups, sigma=sig6)
    mppi.model_params = p
    costs_our = np.asarray(mppi._rollout(
        jnp.asarray(x0), jnp.asarray(useq), jnp.asarray(eps), p,
        mppi._cparams))
    np.testing.assert_allclose(costs_our, costs_ref.reshape(k), rtol=1e-8)

    _, new_useq, _ = mppi._solve_with_noise_jit(
        jnp.asarray(eps), jnp.asarray(x0), jnp.asarray(useq), p,
        mppi._cparams)
    np.testing.assert_allclose(np.asarray(new_useq)[:-1],
                               update_ref[1:, :, 0], rtol=1e-6, atol=1e-9)


def test_auv_closed_loop_trajectory_matches_reference(ref, ref_auv, ours):
    """Flagship closed-loop oracle: 5 control steps of the full Fossen AUV
    (rk2) + StaticQuatCost, same per-step noise realisation into the
    reference graph (C++ receding-horizon carry applied manually, see
    test_closed_loop_trajectory_matches_reference) and into MPPI; actions,
    sequences and the 13-dim quaternion state compared in f64."""
    import jax.numpy as jnp

    from __graft_entry__ import _auv_params
    from src.costs.static_cost import StaticQuatCost as RefSQ

    from mppi_tf_tpu.costs.static import StaticQuatCost

    rng = np.random.RandomState(29)
    k, tau, sdim, adim, steps = 50, 5, 13, 6, 5
    lam, gamma, ups = 0.5, 0.2, 1.0
    sig6 = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    goal = np.zeros(sdim)
    goal[2] = -2.0
    goal[6] = 1.0
    Qd = np.array([100.0, 100.0, 100.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])

    ref_model = ref_auv({}, actionDim=adim, dt=0.1,
                        parameters=_auv_parameters(2))
    # separate instance as the plant: the reference model caches the batch
    # size internally (set_k during the k=50 rollout breaks 1-batch predict)
    ref_plant = ref_auv({}, actionDim=adim, dt=0.1,
                        parameters=_auv_parameters(2))
    ref_cost = RefSQ(lam, gamma, ups, sig6, goal.reshape(-1, 1), Qd,
                     diag=True)
    ctrl_ref = ref.ControllerBase(
        ref_model, ref_cost, k=k, tau=tau, sDim=sdim, aDim=adim, lam=lam,
        upsilon=ups, sigma=sig6)
    # the AUV pads size off model._k (auv_model.py:343); _next sets it
    # before build_graph (controller_base.py:239 set_k) — but set_k assumes
    # a tf.Variable while ModelBase.__init__ stores a plain int
    # (model_base.py:28, another stale-glue defect): assign directly
    ref_model._k = k

    our_model = ours.get_model(dict(_auv_params(), rk=2), dt=0.1,
                               action_dim=adim, dtype=jnp.float64)
    our_cost = StaticQuatCost(lam, gamma, ups, sig6, goal, Qd, diag=True,
                              dtype=jnp.float64)
    mppi = ours.MPPI(our_model, our_cost, k=k, tau=tau, lam=lam,
                     upsilon=ups, sigma=sig6)
    mp, cp = mppi.model_params, mppi._cparams

    x_ref = np.zeros(sdim)
    x_ref[6] = 1.0
    x_ref[0] = 0.3
    x_our = jnp.asarray(x_ref)
    U_ref = np.zeros((tau, adim, 1))
    U_our = jnp.zeros((tau, adim))

    for step in range(steps):
        eps = np.einsum("ij,ktj->kti", ups * sig6, rng.randn(k, tau, adim))

        ctrl_ref._actionSeq = tf.constant(U_ref, tf.float64)
        costs = ctrl_ref.build_model(
            "roll", k, tf.constant(x_ref.reshape(sdim, 1), tf.float64),
            tf.constant(eps.reshape(k, tau, adim, 1), tf.float64),
            tf.constant(U_ref, tf.float64))
        updated = ctrl_ref.update(
            "up", costs, tf.constant(eps.reshape(k, tau, adim, 1),
                                     tf.float64))
        a_ref = ctrl_ref.get_next("n", updated, 1).numpy()[0, :, 0]
        U_ref = ctrl_ref.shift(
            "s", updated, ctrl_ref.init_zeros("z", 1), 1).numpy()
        x_ref = ref_plant.predict(
            tf.constant(x_ref.reshape(1, sdim, 1), tf.float64),
            tf.constant(a_ref.reshape(1, adim, 1), tf.float64)
        ).numpy().reshape(sdim)

        a_our, U_our, _ = mppi._solve_with_noise_jit(
            jnp.asarray(eps), x_our, U_our, mp, cp)
        x_our = our_model.predict(mp, x_our, a_our)

        np.testing.assert_allclose(np.asarray(a_our), a_ref, rtol=1e-6,
                                   atol=1e-10, err_msg=f"step {step} action")
        np.testing.assert_allclose(np.asarray(U_our), U_ref[:, :, 0],
                                   rtol=1e-6, atol=1e-10,
                                   err_msg=f"step {step} sequence")
        np.testing.assert_allclose(np.asarray(x_our), x_ref, rtol=1e-6,
                                   atol=1e-10, err_msg=f"step {step} state")


def test_closed_loop_trajectory_matches_reference(ref, ours):
    """Multi-step closed-loop oracle (VERDICT r1 item 7): 10 control steps
    on point_mass3d with the SAME noise realisation injected per step into
    both the reference graph and MPPI, comparing the full action and U
    trajectories in f64.

    The reference Python controller loses its update (the shifted sequence
    never writes back to self._actionSeq, controller_base.py:339-341 vs
    :452); the correct receding-horizon carry is the C++ one
    (m_U = out_tensor[0], controller_base.cpp:135-153), applied here
    manually around the reference's own build_model/update/shift graphs.
    """
    import jax.numpy as jnp

    rng = np.random.RandomState(23)
    steps = 10

    ref_model, ref_cost = _ref_pair(ref)
    ctrl_ref = ref.ControllerBase(
        ref_model, ref_cost, k=K, tau=TAU, sDim=SDIM, aDim=ADIM, lam=LAM,
        upsilon=UPSILON, sigma=SIGMA)

    our_model, our_cost = _our_pair(ours)
    mppi = ours.MPPI(our_model, our_cost, k=K, tau=TAU, lam=LAM,
                     upsilon=UPSILON, sigma=SIGMA)
    mp, cp = mppi.model_params, mppi._cparams

    x_ref = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    x_our = jnp.asarray(x_ref)
    U_ref = np.zeros((TAU, ADIM, 1))
    U_our = jnp.zeros((TAU, ADIM))

    for step in range(steps):
        eps = np.einsum("ij,ktj->kti", UPSILON * SIGMA,
                        rng.randn(K, TAU, ADIM))

        # --- reference step with the C++ carry applied manually --------
        # the reference update() adds the weighted noise to the CAPTURED
        # self._actionSeq (controller_base.py:452) — the very attribute its
        # own build_graph never writes back (the §2.1 defect). The C++ carry
        # is: feed the shifted sequence back in before each solve.
        ctrl_ref._actionSeq = tf.constant(U_ref, tf.float64)
        costs = ctrl_ref.build_model(
            "roll", K, tf.constant(x_ref.reshape(SDIM, 1), tf.float64),
            tf.constant(eps.reshape(K, TAU, ADIM, 1), tf.float64),
            tf.constant(U_ref, tf.float64))
        updated = ctrl_ref.update(
            "up", costs, tf.constant(eps.reshape(K, TAU, ADIM, 1),
                                     tf.float64))
        a_ref = ctrl_ref.get_next("n", updated, 1).numpy()[0, :, 0]
        U_ref = ctrl_ref.shift(
            "s", updated, ctrl_ref.init_zeros("z", 1), 1).numpy()
        x_ref = ref_model.predict(
            tf.constant(x_ref.reshape(1, SDIM, 1), tf.float64),
            tf.constant(a_ref.reshape(1, ADIM, 1), tf.float64)
        ).numpy().reshape(SDIM)

        # --- ours: one injected-noise solve + plant step ----------------
        a_our, U_our, _ = mppi._solve_with_noise_jit(
            jnp.asarray(eps), x_our, U_our, mp, cp)
        x_our = our_model.predict(mp, x_our, a_our)

        np.testing.assert_allclose(np.asarray(a_our), a_ref, rtol=1e-6,
                                   atol=1e-12, err_msg=f"step {step} action")
        np.testing.assert_allclose(np.asarray(U_our), U_ref[:, :, 0],
                                   rtol=1e-6, atol=1e-12,
                                   err_msg=f"step {step} sequence")
        np.testing.assert_allclose(np.asarray(x_our), x_ref, rtol=1e-6,
                                   atol=1e-12, err_msg=f"step {step} state")
