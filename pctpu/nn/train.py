"""Jitted training harness: train state, schedules, train/eval steps,
data-parallel sharding over a device mesh.

Replaces the reference's two trainers (Lightning harness
`Classification_ModelNet40/pointnet2/train.py:29-55` +
`pointnet2_ssg_cls.py:125-194`, and the hand-rolled
`Final_Project/pointnet2/train.py:22-266`) with one functional step:

  * lr schedule: lr * lr_decay^floor(step*bs/decay_step), floored at lr_clip
    (`pointnet2_ssg_cls.py:161-172`)
  * BN-momentum schedule: bnm * bnm_decay^floor(step*bs/decay_step), floored
    at bnm_clip (`:174-186`) — fed through the model's runtime-momentum BN.
  * data parallelism: batch axis sharded over Mesh('data') with parameters
    replicated; XLA inserts the gradient psum (the TPU-native counterpart of
    the reference's nn.DataParallel / Lightning 'dp', SURVEY.md §2.2).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from pctpu.models.pointnet2 import MODEL_REGISTRY
from pctpu.nn.config import TrainConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def schedule_factor(cfg: TrainConfig, step: jax.Array) -> jax.Array:
    """Shared decay exponent: floor(step * batch_size / decay_step)."""
    return jnp.floor(step * cfg.batch_size / cfg.decay_step)


def lr_schedule(cfg: TrainConfig, step: jax.Array) -> jax.Array:
    return jnp.maximum(cfg.lr * cfg.lr_decay ** schedule_factor(cfg, step),
                       cfg.lr_clip)


def bn_momentum_schedule(cfg: TrainConfig, step: jax.Array) -> jax.Array:
    return jnp.maximum(
        cfg.bn_momentum * cfg.bnm_decay ** schedule_factor(cfg, step),
        cfg.bnm_clip)


def build_model(cfg: TrainConfig):
    cls = MODEL_REGISTRY[cfg.model]
    kwargs = dict(num_classes=cfg.num_classes, use_xyz=cfg.use_xyz)
    if "grouping" in cls.__dataclass_fields__:
        kwargs["grouping"] = cfg.grouping
    if "dtype" in cls.__dataclass_fields__:
        kwargs["dtype"] = jnp.dtype(cfg.compute_dtype)
    return cls(**kwargs)


def make_optimizer(cfg: TrainConfig):
    tx = [optax.scale_by_adam()]
    if cfg.weight_decay:
        tx.append(optax.add_decayed_weights(cfg.weight_decay))
    tx.append(optax.scale_by_learning_rate(
        lambda step: lr_schedule(cfg, step)))
    chain = optax.chain(*tx)
    if cfg.grad_clip:
        chain = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), chain)
    return chain


def create_train_state(cfg: TrainConfig, rng: jax.Array,
                       sample_input: jax.Array) -> Tuple[Any, TrainState]:
    model = build_model(cfg)
    variables = model.init(
        {"params": rng, "dropout": rng}, sample_input, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return model, TrainState(params, batch_stats, opt_state, jnp.int32(0))


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax CE. Works for [B,C] + [B] and [B,N,C] + [B,N]
    (the reference's F.cross_entropy usage in both cls and semseg)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def make_train_step(model, cfg: TrainConfig, tx=None):
    if tx is None:
        tx = make_optimizer(cfg)

    def train_step(state: TrainState, pc: jax.Array, labels: jax.Array,
                   rng: jax.Array):
        bnm = bn_momentum_schedule(cfg, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pc, train=True, bn_momentum=bnm,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = cross_entropy(out, labels)
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
        metrics = {"loss": loss, "acc": accuracy(logits, labels),
                   "lr": lr_schedule(cfg, state.step)}
        return new_state, metrics

    return train_step


def make_eval_step(model):
    def eval_step(state: TrainState, pc: jax.Array, labels: jax.Array):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pc, train=False)
        return {"loss": cross_entropy(logits, labels),
                "acc": accuracy(logits, labels),
                "logits": logits}
    return eval_step


# --- data parallelism --------------------------------------------------------

def make_data_parallel_train_step(model, cfg: TrainConfig, mesh,
                                  data_axis: str = "data"):
    """Shard batch over `mesh`'s data axis, replicate parameters. The
    returned step is jitted with explicit shardings; XLA emits the gradient
    all-reduce over ICI."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    step = make_train_step(model, cfg)
    return jax.jit(
        step,
        in_shardings=(repl, data_sh, data_sh, repl),
        out_shardings=(repl, repl),
    )
