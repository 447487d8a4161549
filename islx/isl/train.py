"""Training for the ISL translator head — data-parallel + tensor-parallel.

The reference repo ships NO training code (the keras head was trained in an
external notebook; SURVEY.md §0); islx closes that gap with a jitted optax
train step sharded over a (data, model) mesh: windows are sharded along
``data``, the head's LSTM/dense kernels along ``model``
(islx.parallel.mesh.translator_param_spec), gradients are psum-reduced by XLA
from the sharding annotations alone.

Loss: categorical cross-entropy on the softmax output — the keras head's
compile-time loss equivalent.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from islx.core.config import TranslatorConfig
from islx.models import translator as T
from islx.parallel import mesh as M

BN_KEYS = ("mean", "var")  # running stats: updated by EMA, not by gradients


class TrainState(NamedTuple):
    params: T.Params
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


def loss_fn(params: T.Params, x: jax.Array, y: jax.Array, rng,
            cfg: TranslatorConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """x [B,20,156], y [B] int labels -> (mean CE loss, metrics)."""
    probs = T.forward(params, x, train=True, rng=rng, cfg=cfg)
    logp = jnp.log(jnp.maximum(probs, 1e-12))
    ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
    acc = (jnp.argmax(probs, -1) == y).astype(jnp.float32)
    return ce.mean(), {"loss": ce.mean(), "accuracy": acc.mean()}


def _apply_updates_keeping_bn_stats(params, updates):
    """BN running mean/var are not trained; zero their gradient updates."""
    out = {}
    for name, entry in params.items():
        out[name] = {}
        for key, v in entry.items():
            u = updates[name][key]
            if name.startswith("bn") and key in BN_KEYS:
                u = jnp.zeros_like(u)
            out[name][key] = v + u
    return out


def _update_bn_stats(params, x, cfg, momentum: float = 0.99):
    """EMA update of EVERY BatchNorm's running mean/var from the batch's
    train-mode activations (T.batch_stats), so inference normalization
    matches what training saw."""
    stats = T.batch_stats(params, x, cfg)
    p = dict(params)
    for name, (mean, var) in stats.items():
        bn = dict(p[name])
        bn["mean"] = momentum * bn["mean"] + (1 - momentum) * mean
        bn["var"] = momentum * bn["var"] + (1 - momentum) * var
        p[name] = bn
    return p


def make_train_step(optimizer: optax.GradientTransformation,
                    cfg: TranslatorConfig = TranslatorConfig(),
                    mesh=None):
    """Build a jitted (optionally mesh-sharded) train step.

    Returns step(state, x, y, rng) -> (state, metrics). With a mesh, x/y are
    expected sharded along the data axis and params per
    islx.parallel.mesh.translator_param_spec.
    """

    def step(state: TrainState, x, y, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, x, y, rng, cfg)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _apply_updates_keeping_bn_stats(state.params, updates)
        params = _update_bn_stats(params, x, cfg)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step)

    data_sh = M.batch_sharding(mesh)
    rep = M.replicated(mesh)
    return jax.jit(step, in_shardings=(None, data_sh, data_sh, rep),
                   out_shardings=None)


def init_state(cfg: TranslatorConfig = TranslatorConfig(),
               optimizer: Optional[optax.GradientTransformation] = None,
               key: Optional[jax.Array] = None) -> Tuple[TrainState,
                                                         optax.GradientTransformation]:
    optimizer = optimizer or make_optimizer()
    params = T.init_params(cfg, key)
    return TrainState(params, optimizer.init(params), jnp.int32(0)), optimizer


def fit(x: np.ndarray, y: np.ndarray, epochs: int = 10, batch_size: int = 32,
        lr: float = 1e-3, cfg: TranslatorConfig = TranslatorConfig(),
        mesh=None, seed: int = 0, verbose: bool = True,
        checkpoint_dir: Optional[str] = None) -> T.Params:
    """Simple host training loop over a (windows, labels) dataset.

    With ``checkpoint_dir``, the TrainState is saved each epoch and training
    resumes from the latest checkpoint on restart (crash-safe, SURVEY §5
    checkpoint/resume).
    """
    import os

    from islx.core import checkpoint as ckpt

    opt = make_optimizer(lr)
    state, _ = init_state(cfg, opt, jax.random.PRNGKey(seed))
    start_epoch = 0
    if checkpoint_dir:
        latest = os.path.join(checkpoint_dir, "latest")
        meta_p = os.path.join(checkpoint_dir, "meta.json")
        if ckpt.exists(latest) and os.path.exists(meta_p):
            import json

            with open(meta_p) as f:
                start_epoch = json.load(f)["epoch"] + 1
            state = ckpt.load_pytree(latest, like=state)
            state = TrainState(*state) if not isinstance(state, TrainState) \
                else state
    if mesh is not None:
        sharded = M.shard_translator_params(state.params, mesh)
        if start_epoch == 0:
            opt_state = opt.init(sharded)
        else:
            # resumed: keep the loaded Adam moments, placed to match the
            # param shardings (mu/nu mirror the param tree; scalars replicate)
            shardings = M.translator_param_shardings(state.params, mesh)

            def place(path_tree, value_tree):
                return jax.tree_util.tree_map(
                    lambda v, s: jax.device_put(v, s), value_tree, path_tree)

            loaded = state.opt_state
            placed = []
            for part in loaded:
                if hasattr(part, "mu"):
                    placed.append(part._replace(
                        mu=place(shardings, part.mu),
                        nu=place(shardings, part.nu)))
                else:
                    placed.append(part)
            opt_state = type(loaded)(placed) if isinstance(loaded, list) \
                else tuple(placed)
        state = TrainState(sharded, opt_state, state.step)
    step = make_train_step(opt, cfg, mesh)
    rng = jax.random.PRNGKey(seed + 1)
    n = x.shape[0]
    order = np.arange(n)
    rs = np.random.RandomState(seed)
    for epoch in range(start_epoch, epochs):
        rs.shuffle(order)
        tot_loss, tot_acc, batches = 0.0, 0.0, 0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(x[idx], jnp.float32),
                                  jnp.asarray(y[idx]), sub)
            tot_loss += float(metrics["loss"])
            tot_acc += float(metrics["accuracy"])
            batches += 1
        if verbose and batches:
            print(f"epoch {epoch}: loss {tot_loss / batches:.4f} "
                  f"acc {tot_acc / batches:.4f}")
        if checkpoint_dir:
            import json

            os.makedirs(checkpoint_dir, exist_ok=True)
            ckpt.save_pytree(os.path.join(checkpoint_dir, "latest"), state)
            with open(os.path.join(checkpoint_dir, "meta.json"), "w") as f:
                json.dump({"epoch": epoch}, f)
    return state.params
