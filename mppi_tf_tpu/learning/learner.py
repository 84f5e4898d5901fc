"""Model-learning loop: replay buffer -> normalization -> Adam training,
with k-fold cross-validation, hyperparameter grid search, and open-loop
rollout validation.

Reference: scripts/src/learners/learner_base.py — add_rb/stats/train_all/
train/_train_step (:57-81, 146-153, 324-358, 469-496), k_fold_validation
(:155-209), grid_search (:83-144), validate (:218-322), augment_data
(:450-467), per-layer gradient/weight logging (:510-552).

TPU-first differences:
- the train step is one jitted function over explicit param pytrees; Adam is
  optax;
- k-fold trains ALL folds simultaneously with ``vmap`` over a stacked
  params pytree — k small MLPs become one batched MLP, keeping the MXU busy
  instead of looping k sequential graphs like the reference (:190-203);
- data augmentation draws from an explicit PRNG key;
- checkpoints are Orbax/npz (checkpoint.py) instead of Keras SavedModel.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.rollout import rollout_trajectory
from .replay import ReplayBuffer


class Learner:
    """Trains a learned dynamics model from stored transitions."""

    def __init__(
        self,
        model,
        filename: Optional[str] = None,
        buffer_size: int = 264,
        num_epochs: int = 100,
        batch_size: int = -1,
        learning_rate: float = 1e-3,
        augment_sigma: float = 0.001,
        log: bool = False,
        log_path: Optional[str] = None,
        observer=None,
        seed: int = 0,
    ):
        self.model = model
        self.s_dim = model.get_state_dim()
        self.a_dim = model.get_action_dim()
        # dispatch on model family: NN models train network weights against
        # normalized delta targets; analytic models (point-mass, AUV) train
        # their physical parameters (mass, inertia) against raw next-state
        # targets — the reference gives every model the same Adam handle
        # (model_base.py:30-39; mass-convergence test scripts/test.py:220)
        self._is_nn = hasattr(model, "predict_nn")
        self.rb = ReplayBuffer(buffer_size, self.s_dim, self.a_dim)
        self.num_epochs = int(num_epochs)
        self.batch_size = int(batch_size)
        self.learning_rate = float(learning_rate)
        self.sigma = float(augment_sigma)
        self.params = model.init_params()
        self._key = jax.random.PRNGKey(seed)
        self.log = log
        self.observer = observer
        if log and observer is None:
            from ..observer import Observer

            self.observer = Observer(log_path=log_path)
        self.logdir = self.observer.get_logdir() if self.observer else (
            log_path or "logs")
        if filename is not None:
            self.load_rb(filename)
        self._step_cache = {}

    # ------------------------------------------------------------------
    # replay buffer surface (learner_base.py:54-64)
    # ------------------------------------------------------------------
    def add_rb(self, x, u, x_next):
        self.rb.add(x, u, x_next)

    def rb_trans(self):
        return self.rb.get_all_transitions()

    def load_rb(self, filename):
        self.rb.load_transitions(filename)

    def save_rb(self, filename):
        self.rb.save_transitions(filename)

    # ------------------------------------------------------------------
    # normalization stats (learner_base.py:69-81)
    # ------------------------------------------------------------------
    def stats(self):
        """Set the model's X/Y normalizers from the full buffer.

        No-op for analytic models — they predict in physical units and have
        no normalization layer (reference only NN models carry X/Y stats,
        nn_model.py:65-99)."""
        if not self._is_nn:
            return
        data = self.rb_trans()
        X, Y = self._prepare(data, norm=False)
        eps = 1e-8
        self.params = self.model.set_normalization(
            self.params,
            x_mean=np.mean(X, axis=0), x_std=np.std(X, axis=0) + eps,
            y_mean=np.mean(Y, axis=0), y_std=np.std(Y, axis=0) + eps,
        )

    def _prepare(self, data, norm=True):
        dt = self.model.dtype
        obs = jnp.asarray(data["obs"], dtype=dt)
        nxt = jnp.asarray(data["next_obs"], dtype=dt)
        act = jnp.asarray(data["act"], dtype=dt)
        if not self._is_nn:
            # analytic models: inputs are raw (state, action) pairs packed
            # along the feature axis, target is the raw next state
            return jnp.concatenate([obs, act], axis=-1), nxt
        return self.model.prepare_training_data(self.params, obs, nxt, act,
                                                norm=norm)

    # ------------------------------------------------------------------
    # training (learner_base.py:146-153, 324-358, 469-496)
    # ------------------------------------------------------------------
    def _loss(self, net, X, Y):
        p = self.model.with_trainable(self.params, net)
        if self._is_nn:
            pred = self.model.predict_nn(p, X, training=True)
        else:
            x, u = X[..., : self.s_dim], X[..., self.s_dim:]
            pred = self.model.step(p, x, u)
        return jnp.mean((pred - Y) ** 2)

    def _make_step(self, lr: float):
        if lr in self._step_cache:
            return self._step_cache[lr]
        opt = optax.adam(lr)

        @jax.jit
        def step(net, opt_state, X, Y):
            loss, grads = jax.value_and_grad(self._loss)(net, X, Y)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(net, updates), opt_state, loss, grads

        self._step_cache[lr] = (opt, step)
        return opt, step

    def train_all(self, learning_rate: Optional[float] = None,
                  batch_size: Optional[int] = None,
                  epoch: Optional[int] = None, val=None, augment=True):
        """Full-buffer training. Reference: learner_base.py:146-153.

        ``batch_size`` is accepted for signature parity but unused — the
        reference trains full-batch too (its batchSize is plumbed through
        grid_search as the sentinel -1 and never consumed by train(),
        learner_base.py:92, 324-335).
        """
        # explicit None checks: epoch=0 must mean "no epochs", not the
        # default (a falsy-zero `or` fallback silently retrained)
        lr = learning_rate if learning_rate is not None \
            else self.learning_rate
        epochs = epoch if epoch is not None else self.num_epochs
        data = self.rb_trans()
        X, Y = self._prepare(data)
        return self.train(X, Y, epoch=epochs, learning_rate=lr, val=val,
                          augment=augment)

    def train(self, X, Y, epoch=1, learning_rate=None, augment=False,
              val=None):
        """Epoch loop with optional Gaussian augmentation and periodic
        rollout validation. Reference: learner_base.py:324-358."""
        lr = learning_rate if learning_rate is not None \
            else self.learning_rate
        opt, step = self._make_step(lr)
        net = self.model.trainable(self.params)
        opt_state = opt.init(net)
        last_loss = None
        for e in range(epoch):
            if augment:
                self._key, sub = jax.random.split(self._key)
                Xe, Ye = self.augment_data(sub, X, Y, sigma=self.sigma)
            else:
                Xe, Ye = X, Y
            net, opt_state, loss, grads = step(net, opt_state, Xe, Ye)
            last_loss = float(loss)
            if self.observer:
                self.observer.scalar("Train/loss_norm", last_loss, e)
                self._log_grad_weights(grads, net, e)
            if val is not None and e % 10 == 0 and self.observer:
                # the full reference validation catalogue
                # (learner_base.py:339-357): train-set loss, total
                # rollout error, per-dimension and per-step splits,
                # transition error and its per-dimension split. Without
                # an observer there is nowhere to report to, so the
                # validation pass is skipped entirely.
                self.params = self.model.with_trainable(self.params, net)
                err, trans, err_split, trans_split, err_step = \
                    self.validate(val[1], val[0], transition=True,
                                  split=True, per_step=True)
                self.observer.scalar("Val/rollout_mse", float(err), e)
                self.observer.scalar(
                    "Val/train_set", float(self._loss(net, X, Y)), e)
                self.observer.scalar("Val/transition", float(trans), e)
                self._log_split("Val/split", np.asarray(err_split), e)
                self._log_split("Val/transition_split",
                                np.asarray(trans_split), e)
                self.observer.histogram("Val/step_mse",
                                        np.asarray(err_step), e)
        self.params = self.model.with_trainable(self.params, net)
        return last_loss

    def augment_data(self, key, X, Y, samples: int = 5, sigma: float = 0.001):
        """x5 Gaussian input-noise augmentation. Reference: learner_base.py:450-467."""
        Xa = jnp.repeat(X, samples, axis=0)
        Ya = jnp.repeat(Y, samples, axis=0)
        noise = sigma * jax.random.normal(key, Xa.shape, dtype=Xa.dtype)
        return Xa + noise, Ya

    # ------------------------------------------------------------------
    # k-fold cross-validation — vmapped over folds (learner_base.py:155-209)
    # ------------------------------------------------------------------
    def k_fold_validation(self, k: int = 10, learning_rate=None,
                          epoch: Optional[int] = None, val=None, seed=0,
                          fresh_init: bool = True):
        """Train k fold models in parallel; returns per-fold test losses.

        The reference loops k sequential models (:190-203); here the fold
        axis is a vmap over stacked parameter pytrees — one batched
        computation per epoch. ``fresh_init`` gives each fold an independent
        random init like the reference's ``copy_model``
        (scripts/src/model.py:70-78), so the fold variance reflects init
        sensitivity; ``False`` shares the learner's current init across folds.
        """
        lr = learning_rate if learning_rate is not None \
            else self.learning_rate
        epochs = epoch if epoch is not None else self.num_epochs
        data = self.rb_trans()
        X, Y = self._prepare(data)
        X, Y = np.asarray(X), np.asarray(Y)
        n = X.shape[0]
        if n < k:
            raise ValueError(f"need >= {k} transitions for {k}-fold, have {n}")

        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        folds = np.array_split(perm, k)
        # equal-size fold views (truncate to the smallest) so the vmapped
        # arrays are rectangular
        test_size = min(len(f) for f in folds)
        train_size = n - test_size
        Xtr = np.stack([np.delete(X, f[:test_size], axis=0)[:train_size]
                        for f in folds])
        Ytr = np.stack([np.delete(Y, f[:test_size], axis=0)[:train_size]
                        for f in folds])
        Xte = np.stack([X[f[:test_size]] for f in folds])
        Yte = np.stack([Y[f[:test_size]] for f in folds])

        if fresh_init:
            keys = jax.random.split(jax.random.PRNGKey(seed), k)
            inits = [self.model.trainable_init(kk) for kk in keys]
            nets = jax.tree.map(lambda *xs: jnp.stack(xs), *inits)
        else:
            net0 = self.model.trainable(self.params)
            nets = jax.tree.map(
                lambda p: jnp.broadcast_to(p, (k,) + p.shape), net0)
        opt = optax.adam(lr)
        opt_states = jax.vmap(opt.init)(nets)

        def one_step(net, opt_state, X, Y):
            loss, grads = jax.value_and_grad(self._loss)(net, X, Y)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(net, updates), opt_state, loss

        vstep = jax.jit(jax.vmap(one_step))

        def eval_loss(net, X, Y):
            return self._loss(net, X, Y)

        veval = jax.jit(jax.vmap(eval_loss))

        dt = self.model.dtype
        Xtr, Ytr = jnp.asarray(Xtr, dt), jnp.asarray(Ytr, dt)
        Xte, Yte = jnp.asarray(Xte, dt), jnp.asarray(Yte, dt)
        train_losses = test_losses = None
        for e in range(epochs):
            nets, opt_states, train_losses = vstep(nets, opt_states, Xtr, Ytr)
            test_losses = veval(nets, Xte, Yte)
            if self.observer:
                self.observer.histogram("KFold/train", np.asarray(train_losses), e)
                self.observer.histogram("KFold/test", np.asarray(test_losses), e)
        return np.asarray(train_losses), np.asarray(test_losses)

    # ------------------------------------------------------------------
    # grid search (learner_base.py:83-144)
    # ------------------------------------------------------------------
    def grid_search(self, trajs, action_seqs, learning_rates=None,
                    sigmas=None, epochs=(100,), k: int = 2):
        """Sweep lr x sigma (augmentation noise), k-fold + full train each,
        score by rollout validation error; returns the best setting.

        Reference: learner_base.py:83-144 (nested lr/sigma/batch loops).
        """
        learning_rates = learning_rates if learning_rates is not None \
            else np.linspace(1e-4, 1e-1, 5)
        sigmas = sigmas if sigmas is not None else np.linspace(0.01, 0.001, 3)
        init_sigma = self.sigma
        # stats() FIRST, then snapshot: the per-combo resets must restore
        # params that CARRY the dataset normalizers (review finding: a
        # pre-stats snapshot made every combo train with identity
        # normalizers, a different pipeline than post-grid training)
        self.stats()
        base_params = self.params
        results = []
        try:
            for e in epochs:
                for lr in learning_rates:
                    for s in sigmas:
                        self.sigma = float(s)
                        self.params = base_params
                        _ftr, fte = self.k_fold_validation(
                            k=k, learning_rate=float(lr), epoch=int(e))
                        self.params = base_params
                        self.train_all(learning_rate=float(lr), epoch=int(e))
                        err = float(self.validate(action_seqs, trajs))
                        results.append({
                            "lr": float(lr), "sigma": float(s),
                            "epochs": int(e), "val_error": err,
                            # final-epoch mean held-out fold loss — the
                            # k-fold pass is recorded, not dead compute
                            "kfold_test_loss": float(
                                np.mean(np.asarray(fte)[..., -1])),
                        })
        finally:
            # a sweep must not leak its last combo into subsequent
            # training; normalizers (data-derived, combo-independent) stay
            self.params = base_params
            self.sigma = init_sigma
        best = min(results, key=lambda r: r["val_error"])
        return best, results

    # ------------------------------------------------------------------
    # validation (learner_base.py:218-322)
    # ------------------------------------------------------------------
    def validate(self, action_seqs, gt_trajs, transition: bool = False,
                 split: bool = False, per_step: bool = False):
        """Open-loop rollout MSE against ground-truth trajectories.

        action_seqs: [k, tau, aDim]; gt_trajs: [k, tau, sDim].
        Returns err (and transition/split errors when requested), matching
        the reference's flag combinatorics (learner_base.py:298-322);
        ``per_step`` appends the [tau] per-step rollout error (the error
        growth along the horizon) as the last output.
        """
        dt = self.model.dtype
        action_seqs = jnp.asarray(action_seqs, dt)
        gt = jnp.asarray(gt_trajs, dt)
        x0 = gt[:, 0]
        traj = rollout_trajectory(
            lambda x, u: self.model.step(self.params, x, u),
            x0, action_seqs[:, :-1])
        err_split = jnp.mean((traj - gt) ** 2, axis=(0, 1))
        err = jnp.mean(err_split)
        outs = [err]
        if transition:
            k, tau = gt.shape[0], gt.shape[1]
            states = gt[:, :-1].reshape((-1, self.s_dim))
            nexts = gt[:, 1:].reshape((-1, self.s_dim))
            acts = action_seqs[:, :-1].reshape((-1, self.a_dim))
            if self._is_nn:
                Xn, Yn = self.model.prepare_training_data(
                    self.params, states, nexts, acts)
                pred = self.model.predict_nn(self.params, Xn)
            else:
                Yn = nexts
                pred = self.model.step(self.params, states, acts)
            trans_split = jnp.mean((pred - Yn) ** 2, axis=0)
            outs.append(jnp.mean(trans_split))
            if split:
                outs.extend([err_split, trans_split])
        elif split:
            outs.append(err_split)
        if per_step:
            outs.append(jnp.mean((traj - gt) ** 2, axis=(0, 2)))
        return outs[0] if len(outs) == 1 else tuple(outs)

    # ------------------------------------------------------------------
    # checkpointing (learner_base.py:66-67; nn_model.py:137-142)
    # ------------------------------------------------------------------
    def save_params(self, step: int):
        from .checkpoint import save_checkpoint

        path = os.path.join(self.logdir, f"weights_step{step}")
        save_checkpoint(path, self.params)
        return path

    def load_params(self, path: str):
        from .checkpoint import load_checkpoint

        self.params = load_checkpoint(path, like=self.params)

    # ------------------------------------------------------------------
    _SPLIT_NAMES = {
        6: ["vx", "vy", "vz", "p", "q", "r"],
        12: ["x", "y", "z", "roll", "pitch", "yaw",
             "vx", "vy", "vz", "p", "q", "r"],
        13: ["x", "y", "z", "qx", "qy", "qz", "qw",
             "vx", "vy", "vz", "p", "q", "r"],
    }

    def _log_split(self, scope: str, tensor, step: int):
        """Per-dimension scalars, named by the reference's axis convention
        for the 6/12/13-dim AUV layouts (learner_base.py:534-552), generic
        ``d{i}`` otherwise (the reference errors out on other dims; here
        every model family gets its split)."""
        tensor = np.asarray(tensor).reshape(-1)
        names = self._SPLIT_NAMES.get(
            tensor.shape[0],
            [f"d{i}" for i in range(tensor.shape[0])])
        for i, axs in enumerate(names):
            self.observer.scalar(f"{scope}-{axs}", float(tensor[i]), step)

    def _log_grad_weights(self, grads, net, step: int):
        """Per-leaf grad/weight histograms, keyed by pytree path — works for
        NN layer lists and analytic physical-param dicts alike.
        Reference: learner_base.py:510-528."""
        for (path, g), (_, w) in zip(
                jax.tree_util.tree_flatten_with_path(grads)[0],
                jax.tree_util.tree_flatten_with_path(net)[0]):
            name = jax.tree_util.keystr(path)
            self.observer.histogram(f"grad{name}", np.asarray(g).ravel(), step)
            self.observer.histogram(f"weights{name}", np.asarray(w).ravel(),
                                    step)
